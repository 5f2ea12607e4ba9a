"""Driver-local lookup DataFrames without a Spark job.

``spark.createDataFrame(list)`` in PySpark always parallelizes the rows
into a ``defaultParallelism``-sliced Python RDD — so every broadcast
join against a tiny metadata lookup (a basename→sequence table, a
partition-tuple→pid table) pays a full job whose EVERY task launches a
Python worker just to ship a handful of rows (measured: 0.8–2 s per
lookup when several broadcast builds queue concurrently on ``local[32]``).

``local_rows_df`` builds the same rows as a Catalyst ``LocalRelation``
via an inline ``VALUES`` table instead: the broadcast build collects
driver-locally, ZERO jobs, zero Python workers. String values are
hex-escaped (``CAST(X'…' AS STRING)``) so no quoting/escaping rule of
the SQL parser can mangle a path. Falls back to ``createDataFrame``
for row counts or value types where the SQL-literal route would be
worse or lossy (the caller's semantics never change).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Above this many rows the generated SQL text (and its parse time)
#: outgrows the job the fallback pays; real metadata lookups are
#: O(touched files) and stay far below it.
_MAX_SQL_ROWS = 20_000


def _sql_literal(v, dt: T.DataType) -> str | None:
    """SQL literal producing exactly ``v`` typed ``dt``; None = give up."""
    if v is None:
        return f"CAST(NULL AS {dt.simpleString()})"
    if isinstance(dt, T.StringType):
        if not isinstance(v, str):
            return None
        if v == "":
            return "CAST('' AS STRING)"
        return f"CAST(X'{v.encode('utf-8').hex()}' AS STRING)"
    if isinstance(dt, T.LongType):
        if isinstance(v, bool) or not isinstance(v, int):
            return None
        return f"{v}L"
    if isinstance(dt, T.IntegerType):
        if isinstance(v, bool) or not isinstance(v, int):
            return None
        return f"CAST({v} AS INT)"
    if isinstance(dt, T.BooleanType):
        if not isinstance(v, bool):
            return None
        return "true" if v else "false"
    if isinstance(dt, T.DoubleType):
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            return None
        f = float(v)
        if math.isnan(f):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(f):
            s = "Infinity" if f > 0 else "-Infinity"
            return f"CAST('{s}' AS DOUBLE)"
        # repr() is the shortest round-trip form; Double.parseDouble
        # reads it back to the identical IEEE-754 value
        return f"CAST('{f!r}' AS DOUBLE)"
    if isinstance(dt, T.BinaryType):
        if not isinstance(v, (bytes, bytearray)):
            return None
        return f"X'{bytes(v).hex()}'"
    return None


def local_rows_df(
    spark: SparkSession, rows: list, schema
) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` as a LocalRelation.

    ``rows`` is a list of tuples; ``schema`` a DDL string or
    StructType of scalar fields. Any unsupported type/value falls back
    to the plain (RDD-backed) path transparently.
    """
    if isinstance(schema, str):
        struct = T._parse_datatype_string(schema)
    else:
        struct = schema
    if (
        not isinstance(struct, T.StructType)
        or not rows
        or len(rows) > _MAX_SQL_ROWS
    ):
        return spark.createDataFrame(rows, schema)
    dts = [f.dataType for f in struct.fields]
    names = list(struct.fieldNames())
    vals: list[str] = []
    for r in rows:
        if len(r) != len(dts):
            return spark.createDataFrame(rows, schema)
        lits = []
        for v, f in zip(r, struct.fields):
            s = _sql_literal(v, f.dataType)
            if s is None:
                return spark.createDataFrame(rows, schema)
            if f.nullable and v is not None:
                # match createDataFrame's nullability: a bare literal
                # infers non-nullable, which would make the produced
                # schema differ from the fallback path's
                s = f"IF(true, {s}, NULL)"
            lits.append(s)
        vals.append("(" + ",".join(lits) + ")")
    df = spark.sql(f"SELECT * FROM VALUES {','.join(vals)}")
    return df.toDF(*names)
