"""local_rows_df: LocalRelation lookup frames (zero-job broadcasts).

The optimization swaps RDD-backed createDataFrame lookup tables for
inline-VALUES LocalRelations; these tests pin (a) plan shape — the
result IS a LocalRelation, so broadcast builds run no job — and
(b) exact schema/value equivalence with the createDataFrame path,
including nullability, empty strings, non-ASCII/quote-laden strings,
NaN doubles and typed NULLs, plus the transparent fallback for types
the SQL-literal route does not cover.
"""

from __future__ import annotations

import math

from pyspark.sql import types as T

from optimus_any2any_spark.localrel import _MAX_SQL_ROWS, local_rows_df


def _optimized_head(df) -> str:
    return (
        df._jdf.queryExecution().optimizedPlan().toString().splitlines()[0]
    )


def test_local_relation_plan_and_equivalence(spark):
    rows = [
        ("a'b\\c;d.parquet", "x/y z--.parquet", 3),
        ("", None, 0),
        ("héllo ☃", "p", -7),
    ]
    ddl = "__bn string, __orig string, __dseq long"
    a = local_rows_df(spark, rows, ddl)
    b = spark.createDataFrame(rows, ddl)
    assert "LocalRelation" in _optimized_head(a)
    assert a.schema == b.schema
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect())
    )


def test_type_matrix(spark):
    rows = [
        (1, 2.5, True, b"\x00\xff", None),
        (None, float("nan"), None, None, "s"),
        (-(2**31) + 1, float("-inf"), False, b"", ""),
    ]
    ddl = "i int, d double, b boolean, bin binary, s string"
    a = local_rows_df(spark, rows, ddl)
    b = spark.createDataFrame(rows, ddl)
    assert "LocalRelation" in _optimized_head(a)
    assert a.schema == b.schema
    av = sorted(a.collect(), key=str)
    bv = sorted(b.collect(), key=str)
    for ra, rb in zip(av, bv):
        for x, y in zip(ra, rb):
            if isinstance(x, float) and math.isnan(x):
                assert math.isnan(y)
            else:
                assert x == y


def test_fallback_on_unsupported_type(spark):
    schema = T.StructType(
        [
            T.StructField(
                "m", T.MapType(T.StringType(), T.LongType()), True
            )
        ]
    )
    df = local_rows_df(spark, [({"k": 1},)], schema)
    assert "LocalRelation" not in _optimized_head(df)
    assert df.collect()[0][0] == {"k": 1}


def test_fallback_on_value_type_mismatch(spark):
    # an int where the schema says string: local_rows_df must not
    # silently stringify — it falls back, and whatever createDataFrame
    # does (raise or coerce) rules
    df = local_rows_df(spark, [(1,)], "s string")
    assert "LocalRelation" not in _optimized_head(df)


def test_fallback_above_row_cap(spark):
    rows = [(i,) for i in range(_MAX_SQL_ROWS + 1)]
    df = local_rows_df(spark, rows, "x long")
    assert "LocalRelation" not in _optimized_head(df)
    assert df.count() == _MAX_SQL_ROWS + 1


def test_broadcast_join_result_matches(spark):
    from pyspark.sql import functions as F

    lk = local_rows_df(
        spark,
        [("f1", 10), ("f2", 20)],
        "__bn string, seq long",
    )
    big = spark.range(100).select(
        F.concat(F.lit("f"), (F.col("id") % 3 + 1).cast("string")).alias(
            "__bn"
        )
    )
    j = big.join(F.broadcast(lk), "__bn", "inner")
    got = j.groupBy("__bn").count().collect()
    assert {(r["__bn"], r["count"]) for r in got} == {
        ("f1", 34),
        ("f2", 33),
    }
