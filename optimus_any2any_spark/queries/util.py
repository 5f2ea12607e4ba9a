"""Shared helpers for oracle-parity query construction."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from optimus_any2any_spark.tables import read_table


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def ts_micros(col: Column | str) -> Column:
    """Microseconds-since-epoch of a timestamp column, tolerant of both
    TIMESTAMP and TIMESTAMP_NTZ physical types.

    Parquet files written without ``isAdjustedToUTC`` read back as
    TIMESTAMP_NTZ under Spark 4's default inference, and ``unix_micros``
    rejects that type. The session timezone is pinned to UTC
    (session.SCALE_CONF), so casting NTZ→TIMESTAMP is value-preserving
    and the cast is a no-op for already-TIMESTAMP inputs.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def dsum(col: Column, scale: int = 6) -> Column:
    """Exact (order-independent) sum of a double column, as double.

    ``SUM(double)`` is non-deterministic across partitionings because IEEE
    addition is not associative; accumulating in DECIMAL is exact, so the
    result is identical regardless of partition count and matches the
    DuckDB oracle's ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``
    bit-for-bit. The per-row double→decimal cast is deterministic on both
    engines (round-half-up at scale ``s``).

    CAUTION — rounding the result to FEWER digits than ``scale``:
    ``round(dsum(x), k)`` with k < scale rounds a DOUBLE, and Spark
    rounds the double's shortest decimal string (BigDecimal.valueOf)
    while DuckDB rounds its binary value — they disagree exactly on
    .5-boundary sums (hit in mix_dsir_importance at sf0.1). Round the
    DECIMAL before the double cast instead:
    ``F.round(F.sum(x.cast("decimal(18,s)")), k).cast("double")`` with
    the oracle's ``CAST(round(SUM(CAST(x AS DECIMAL(18,s))), k) AS
    DOUBLE)`` — decimal rounding is exact in both engines. Rounding at
    k == scale is safe (the cast double's shortest string IS the
    decimal).
    """
    return F.sum(col.cast(T.DecimalType(18, scale))).cast("double")


def davg(col: Column, scale: int = 6) -> Column:
    """Exact-sum-based average (double), matching
    ``CAST(SUM(CAST(x AS DECIMAL)) AS DOUBLE) / COUNT(x)`` in the oracle."""
    return dsum(col, scale) / F.count(col)


def o_dsum(expr: str, scale: int = 6) -> str:
    """Oracle-side SQL for :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def o_davg(expr: str, scale: int = 6) -> str:
    return f"{o_dsum(expr, scale)} / COUNT({expr})"
