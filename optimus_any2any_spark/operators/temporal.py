"""Temporal join operators Spark lacks as built-ins: as-of join and
bucketed range join.

Both are expressed as compositions of shuffle-friendly primitives
(union + window, bucket equi-join) instead of the naive inequality
join, which Spark would execute as a broadcast-nested-loop / cartesian
— unusable at 100 TB.

As-of join strategy (the kdb/Timescale/Flink temporal-join shape):
tag both sides, union, sort within the key partition by (ts, side),
and carry the last-seen right-side payload forward with
``last(..., ignorenulls)``. One shuffle on the join key; cost is
O(n log n_partition) regardless of time-range density, where a range
join's candidate set explodes with density.

Bucketed range join strategy: quantize timestamps to fixed-width
buckets, equi-join on (key, bucket ± spill), then apply the exact
range predicate. The inequality never reaches the join operator, so
Catalyst plans a hash join; candidate fan-out is bounded by bucket
width, not data volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` and the same ``on`` key.

    Returns every left column plus ``<right_ts><suffix>`` and
    ``<payload><suffix>`` for each payload column (NULL when no prior
    right row exists). Ties on timestamp resolve right-row-first, so a
    right row at exactly ``left_ts`` matches (>= semantics, same as
    DuckDB/pandas ASOF). The matched right row is carried as ONE struct,
    so all payload columns come from the SAME right row even when some
    payload values are NULL. NULL join keys never match (join
    semantics); among right rows tied on (key, ts) the greatest payload
    tuple wins — deterministic on any partitioning.
    """
    lcols = left.columns
    rstruct = F.struct(
        F.col(right_ts).alias("rts"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(
            right.select(rstruct.alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    # NULL-key right rows can never match any left row (NULL = NULL is
    # not true in join semantics) — drop them; NULL-key left rows then
    # share a partition containing no right rows and yield NULL.
    r = right.filter(F.col(on).isNotNull()).select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("__l"),
        rstruct.alias("__r"),
    )
    # side 0 (right) sorts before side 1 (left) at equal ts → >= matching;
    # __r as the final key makes right-side ties deterministic.
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", "__r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l.unionByName(r)
        .withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    return carried.select(
        *[F.col("__l")[c].alias(c) for c in lcols],
        F.col("__last_r")["rts"].alias(f"{right_ts}{suffix}"),
        *[F.col("__last_r")[c].alias(f"{c}{suffix}") for c in payload_cols],
    )


def bucketed_range_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """Count right rows with ``left_ts - window <= right_ts < left_ts``
    per left row, as a bucket equi-join (never an inequality join).

    Buckets are ``window_seconds`` wide; a right row can only match
    left rows in its own or the next bucket, so the join key is
    (key, bucket) with a 2-way bucket spill on the left side.
    """
    # cast tolerates TIMESTAMP_NTZ parquet columns (session tz is UTC,
    # so the cast is value-preserving); unix_timestamp rejects NTZ input.
    bucket = lambda ts: F.floor(  # noqa: E731
        F.unix_timestamp(F.col(ts).cast("timestamp")) / window_seconds
    )
    # a generated row id keeps duplicate left rows distinct through the
    # groupBy (grouping on left columns alone would merge them and sum
    # their counts); it is internal and dropped before returning.
    l = left.withColumn("__rowid", F.monotonically_increasing_id()).withColumn(
        "__b", bucket(left_ts)
    )
    # left probes its own bucket and the previous one
    probes = l.select(
        "__rowid",
        *left.columns,
        F.explode(F.array(F.col("__b"), F.col("__b") - 1)).alias("__jb"),
    )
    r = right.select(
        F.col(on).alias("__rk"),
        F.col(right_ts).alias("__rts"),
        bucket(right_ts).alias("__jb"),
    )
    # the exact range predicate lives IN the join condition: a left
    # join keeps unmatched probes as NULL rows (count 0), whereas a
    # post-join filter would drop left rows whose candidates all miss.
    joined = probes.join(
        r,
        (probes[on] == r.__rk)
        & (probes.__jb == r.__jb)
        & (r.__rts < probes[left_ts])
        & (
            r.__rts
            >= probes[left_ts] - F.expr(f"INTERVAL {window_seconds} SECONDS")
        ),
        "left",
    )
    return (
        joined.groupBy("__rowid", *left.columns)
        .agg(F.count("__rts").alias(count_alias))
        .drop("__rowid")
    )
