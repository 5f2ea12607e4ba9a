"""Warehouse sink edge: schema coercion + APPEND/REPLACE load methods.

Reference: the MaxCompute sink fetches the destination table schema and
coerces every record into it (ext/maxcompute/util.go:436-454
``createRecord``, :457-662 ``createData``), with: case-insensitive
column matching (:428-434), empty string → NULL (:589-591), decimal from
string, and a multi-format temporal fallback chain (``parseTime``
:665-710, formats at :22). REPLACE load = write temp table + INSERT
OVERWRITE + drop (sink.go:52-59,194-235) — which is exactly Spark's
``mode("overwrite")`` atomic swap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# parseTime fallback chain (ext/maxcompute/util.go:22): RFC3339,
# timestamp, datetime, date, then two non-standard ISO forms.
TIME_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyy-MM-dd",
    "yyyy-MM-dd'T'HH:mm:ss.SSSZ",
    "yyyy-MM-dd HH:mm:ss zzz",
]


def parse_time(col: Column) -> Column:
    """Multi-format temporal coercion (first format that parses wins)."""
    attempts = [F.try_to_timestamp(col, F.lit(fmt)) for fmt in TIME_FORMATS]
    return F.coalesce(*attempts)


def _coerce(col: Column, target: T.DataType, source: T.DataType) -> Column:
    empty_is_null = F.when(col.cast("string") == "", F.lit(None))
    if isinstance(target, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        if isinstance(source, T.StringType):
            parsed = empty_is_null.otherwise(parse_time(col))
        else:
            parsed = col.cast("timestamp")
        if isinstance(target, T.DateType):
            return parsed.cast("date")
        return parsed.cast(target)
    if isinstance(target, T.DecimalType) and isinstance(source, T.StringType):
        # decimal carried as string in flight (util.go:308-313 → :544-561)
        return empty_is_null.otherwise(col.cast(target))
    if isinstance(source, T.StringType) and isinstance(
        target, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                 T.FloatType, T.DoubleType, T.BooleanType)
    ):
        return empty_is_null.otherwise(col.cast(target))
    return col.cast(target)


def coerce_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project df into the target schema: case-insensitive column match,
    §1.3 type coercions, missing columns → NULL, extras dropped."""
    by_lower = {c.lower(): c for c in df.columns}
    source_types = {f.name: f.dataType for f in df.schema.fields}
    out: list[Column] = []
    for field in target.fields:
        src = by_lower.get(field.name.lower())
        if src is None:
            out.append(F.lit(None).cast(field.dataType).alias(field.name))
        else:
            out.append(
                _coerce(F.col(f"`{src}`"), field.dataType, source_types[src]).alias(
                    field.name
                )
            )
    return df.select(*out)


def write_table(
    df: DataFrame, table: str, load_method: str = "APPEND", coerce: bool = True
) -> None:
    """APPEND/REPLACE to a catalog table with sink-edge coercion.

    REPLACE ≙ the reference's temp-table + INSERT OVERWRITE + drop
    (atomic swap) — natively ``mode("overwrite")`` here.
    """
    spark = df.sparkSession
    if coerce and spark.catalog.tableExists(table):
        target = spark.table(table).schema
        df = coerce_to_schema(df, target)
    mode = "overwrite" if load_method.upper() == "REPLACE" else "append"
    df.write.mode(mode).saveAsTable(table)
