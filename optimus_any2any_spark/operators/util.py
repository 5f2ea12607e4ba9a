"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def ensure_parallelism(df: DataFrame, key: Column | str | None = None) -> DataFrame:
    """Repartition up to the cluster's core count when the input has
    fewer partitions.

    CPU-heavy per-row operators (shingling, per-token hashing, vector
    math) are bottlenecked by input parallelism, and a small dimension
    table often arrives as ONE parquet file = one partition = one core.
    At real scale inputs already have thousands of partitions and this
    is a no-op — the check is on partition count, not data size, so no
    job is triggered.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        # JVM-side RDD handle: skips df.rdd's javaToPython conversion
        # chain (a per-call Python-serializer plan build); no job runs
        # either way, this just drops the wrapper cost.
        nparts = df._jdf.rdd().getNumPartitions()
    except Exception:
        nparts = df.rdd.getNumPartitions()
    if nparts >= target:
        return df
    return df.repartition(target, key) if key is not None else df.repartition(target)
