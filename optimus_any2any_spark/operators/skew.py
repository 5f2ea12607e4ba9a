"""Skew-mitigation operators.

At 100 TB a handful of hot keys (one viral user, one default partition
value) dominate a shuffle and stall the stage on one task. Two
mitigations used here:

- AQE skew-join splitting is ON session-wide
  (``spark.sql.adaptive.skewJoin.enabled`` — session.py) and handles
  join-side skew at runtime.
- :func:`salted_agg` handles *aggregation* skew explicitly: keys are
  salted into N subkeys, partially aggregated, then merged — a two-stage
  shuffle whose first stage spreads each hot key over N tasks. Results
  are identical to the plain aggregation (the DuckDB oracle for
  q_salted_user_counts is the PLAIN GROUP BY — determinism survives the
  rewrite because the merged aggregates are associative/exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output column → (merge_fn_name, partial_expr) where
    merge_fn is "sum"/"min"/"max" (associative merges). Example::

        salted_agg(events, ["user_id"], {
            "n_events": ("sum", F.count(F.lit(1))),
            "total_value": ("sum", F.sum(F.col("value").cast("decimal(18,6)"))),
        })

    Stage 1 groups by (key, salt) — hot keys spread over
    ``salt_buckets`` tasks; stage 2 merges per key. The salt derives
    from a random-per-row int: correctness never depends on WHICH salt a
    row gets, only that the merge functions are associative.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (_, expr) in aggs.items()]
    )
    merges = []
    for name, (merge, _) in aggs.items():
        col = F.col(f"__p_{name}")
        if merge == "sum":
            merges.append(F.sum(col).alias(name))
        elif merge == "min":
            merges.append(F.min(col).alias(name))
        elif merge == "max":
            merges.append(F.max(col).alias(name))
        else:
            raise ValueError(f"non-associative merge: {merge}")
    return partial.groupBy(*key_cols).agg(*merges)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-proof inner equi-join: salt the big side, replicate the
    small side across all salts, join on (key, salt).

    AQE's skew-join splitting handles sort-merge skew at runtime, but
    only after a skewed shuffle materializes and only for joins AQE can
    split. This rewrite prevents the skew by construction: a hot key's
    rows spread over ``salt_buckets`` tasks, each joining against its
    own replica of the small side's matching row. Row multiplicity is
    unchanged (each big row carries exactly one salt; each (key, salt)
    matches exactly one replica), so results are identical to the plain
    join on any partitioning.

    Cost: the small side shuffles ``salt_buckets``× — use only when the
    small side is modest and the big side's key histogram is pathological
    (the 100 TB "one viral user" case).
    """
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_big.join(replicated, [on, "__salt"])
    return out.drop("__salt")
