"""Test-table loading helpers (driver testdata, TESTDATA.md).

Tables are plain parquet; at 100 TB these reads become partitioned /
bucketed table scans, and everything downstream (predicate pushdown,
column pruning) is unchanged because all queries go through the
DataFrame API.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: Dimension tables small enough to broadcast at any realistic scale
#: (region/nation are bounded by geography; supplier/customer/part are
#: broadcastable at test SFs but shuffle-join at 100 TB — AQE decides).
ALWAYS_BROADCAST = {"region", "nation"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing parquet TIMESTAMP(NANOS).

    Spark 4 has no TIMESTAMP_NS type (PARQUET_TYPE_ILLEGAL without the
    legacy conf); we read nanos as long and truncate to microseconds with
    exact integer division — the same ns→us truncation DuckDB applies —
    so both engines see identical TIMESTAMP values.
    """
    # Runtime-settable confs the driver's session may not carry: nanos
    # parquet timestamps (Spark 4 rejects them otherwise) and UTC
    # session time so timestamp functions match the naive DuckDB oracle.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view (for spark.sql-style queries)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
