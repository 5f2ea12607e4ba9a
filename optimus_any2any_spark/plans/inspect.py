"""Plan-quality inspection: the "would this survive 100×?" checklist.

``plan_report`` distills ``explain("formatted")`` into the properties
that matter at scale:

- are filters pushed into the scan (``PushedFilters``)?
- is the scan column-pruned (``ReadSchema`` vs table width)?
- how many exchanges (shuffles/broadcasts) does the plan contain?
- which join strategies were chosen?
- does whole-stage codegen cover the hot path?

Used by tests to pin plan shape (a regression that turns a broadcast
join into a cross join or drops pushdown fails CI, not production).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    num_exchanges: int = 0
    num_broadcast_joins: int = 0
    num_sortmerge_joins: int = 0
    num_shuffle_hash_joins: int = 0
    num_nested_loop_joins: int = 0
    num_codegen_stages: int = 0
    text: str = ""

    @property
    def has_pushdown(self) -> bool:
        return any(f.strip() for f in self.pushed_filters)

    def scan_columns(self) -> list[list[str]]:
        return [
            [c.split(":")[0] for c in s.split(",") if c]
            for s in self.read_schemas
        ]

    def scan_locations(self) -> list[str]:
        """File-scan locations (one entry per parquet/file scan node)."""
        return re.findall(r"Location: \w+ \[([^\]]*)\]", self.text)


def explain_formatted(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def plan_report(df: DataFrame) -> PlanReport:
    text = explain_formatted(df)
    # codegen stage markers (`*(n)`) only appear in simple mode under AQE
    simple = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    return PlanReport(
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        read_schemas=re.findall(r"ReadSchema: struct<([^>]*)>", text),
        num_exchanges=text.count("Exchange"),
        num_broadcast_joins=text.count("BroadcastHashJoin"),
        num_sortmerge_joins=text.count("SortMergeJoin"),
        num_shuffle_hash_joins=text.count("ShuffledHashJoin"),
        num_nested_loop_joins=text.count("BroadcastNestedLoopJoin"),
        num_codegen_stages=len(
            set(re.findall(r"\*\((\d+)\)", text + simple))
        ),
        text=text,
    )
