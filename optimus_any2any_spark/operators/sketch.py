"""Deterministic cardinality sketches.

KMV (k-minimum-values) distinct-count estimation: hash every key to
(0,1] with portable md5, keep the k smallest hashes per group, estimate
|D| ≈ (k-1) / h_(k). Unlike HLL (engine-specific register layouts,
``approx_count_distinct`` is not reproducible across engines), KMV with
an md5 hash is bit-deterministic everywhere — Spark, DuckDB, Python —
so the sketch itself is oracle-checkable, mergeable (union = keep k
smallest of the union), and stable across partitionings.

Scale shape: the inner distinct is one shuffle on (group, key); the
per-group top-k is a window over at most |D| rows; sketch size is O(k)
per group, so merging sketches across 1000 executors moves k·groups
values, not the key universe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HASH_SPACE = float(1 << 32)


def unit_hash(col: Column) -> Column:
    """md5 → first 8 hex digits → uniform double in (0, 1]."""
    return (
        (F.conv(F.substring(F.md5(col.cast("string").cast("binary")), 1, 8), 16, 10)
         .cast("double") + 1.0)
        / HASH_SPACE
    )


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 32,
) -> DataFrame:
    """Per-group KMV distinct-count estimate next to the exact count.

    Returns ``group_cols + (n_exact, kmv_estimate)`` where the estimate
    is ``(k-1)/h_k`` rounded to 4 decimals (exact count when the group
    has fewer than k distinct keys).
    """
    hashed = (
        df.select(*group_cols, F.col(key_col).alias("__key"))
        .distinct()
        .withColumn("__h", unit_hash(F.col("__key")))
    )
    # Two-stage top-k: stage 1 finds the k smallest per (group, salt)
    # so no single window partition ever sees the whole key universe;
    # stage 2 ranks the ≤ 16k survivors per group. The k-th smallest is
    # identical to a single global window, but every partition is
    # bounded — the 1000-executor shape.
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy("__h", "__key")
    survivors = (
        hashed.withColumn(
            "__salt",
            F.conv(F.substring(F.md5(F.col("__key").cast("string").cast("binary")), 9, 2), 16, 10)
            .cast("int") % 16,
        )
        .withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
    )
    w = Window.partitionBy(*group_cols).orderBy("__h", "__key")
    ranked = survivors.withColumn("__rn", F.row_number().over(w))
    n_exact = hashed.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        ranked.groupBy(*group_cols)
        .agg(F.max(F.when(F.col("__rn") == k, F.col("__h"))).alias("__hk"))
        .join(n_exact, group_cols)
        .select(
            *group_cols,
            F.col("n_exact"),
            F.round(
                F.when(
                    F.col("__hk").isNotNull(), (k - 1) / F.col("__hk")
                ).otherwise(F.col("n_exact").cast("double")),
                4,
            ).alias("kmv_estimate"),
        )
    )
