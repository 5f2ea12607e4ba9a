"""Query registry: every engine capability exposed as a named query.

Each :class:`Query` pairs a PySpark implementation with (when
SQL-expressible) a DuckDB oracle — the driver's correctness gate runs
both at sf0.01 and hash-compares values, so Spark and oracle must agree
*bit-exactly* after column-name alignment. Parity rules used throughout:

- Sums of doubles are order-dependent in IEEE arithmetic, so every
  aggregated double goes through an exact DECIMAL(18,s) accumulation and
  is cast back to DOUBLE (see :func:`optimus_any2any_spark.queries.util.dsum`).
- Every top-k has a total deterministic ORDER BY (tie-broken by a key).
- Timestamp semantics pinned to UTC on the Spark side.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    # non-empty marks a deliberate exact/oracle-only baseline that is
    # NOT the scale path (e.g. an O(n²) verifier for an approximate
    # operator) — bench output and the README inventory surface it
    scale_note: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    bench: bool = False,
    scale_note: str = "",
):
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(
            name=name,
            spark=fn,
            oracle=oracle,
            doc=doc,
            bench=bench,
            scale_note=scale_note,
        )
        return fn

    return deco


def _driver_verified_rounds() -> dict[str, int]:
    """Latest driver round in which each query had a fully-green
    CORRECTNESS row (rows + schema + value-hash all matched)."""
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    latest: dict[str, int] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            report = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, row in report.items():
            if isinstance(row, dict) and all(
                row.get(k) for k in ("rows_match", "schema_match", "hash_match")
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _rotation_order(
    names: list[str], latest_verified: dict[str, int]
) -> list[str]:
    """Report-window rotation: never-verified queries first, then
    ascending by the round they were LAST verified in — once every
    query has been green at least once, the window re-checks the
    stalest verifications (whose implementations may have churned
    since) instead of pinning the same leading block forever.
    Registration order breaks ties, and Python's stable sort keeps it.
    """
    return sorted(names, key=lambda n: latest_verified.get(n, 0))


def all_queries() -> dict[str, Query]:
    # Import side-effect modules that populate REGISTRY.  Order matters:
    # the driver's CORRECTNESS report records at most ~50 entries in
    # registration order, so the registry is emitted in rotation order
    # (see _rotation_order) to spread driver verification across rounds
    # by verification age.
    from optimus_any2any_spark.queries import (  # noqa: F401
        llm_ops,
        pipeline_semantics,
        temporal_sketch,
        relational,
        relational_ext,
        relational_tpch2,
        lakehouse,
        tokenizer,
        classifier,
    )

    latest = _driver_verified_rounds()
    return {n: REGISTRY[n] for n in _rotation_order(list(REGISTRY), latest)}
