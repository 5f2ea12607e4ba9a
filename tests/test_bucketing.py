"""Bucketed co-located joins: pre-shuffling on the join key at write
time so repeated joins read-side need NO exchange (SURVEY.md
'Partitioning & shuffle' — the 100 TB strategy for fact-fact joins)."""

from __future__ import annotations

import pytest

from optimus_any2any_spark.plans import plan_report


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # spark.sql.warehouse.dir is static — tables land in the session's
    # default warehouse (./spark-warehouse, gitignored)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            spark.table("b_lineitem").l_orderkey
            == spark.table("b_orders").o_orderkey,
        )
        r = plan_report(j)
        # both sides pre-bucketed on the join key: sort-merge join with
        # ZERO exchanges
        assert r.num_sortmerge_joins >= 1, r.text
        assert r.num_exchanges == 0, r.text
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
