"""tables.read_table schema cache: identical results, signature
invalidation, and the structural win (no inference job on a hit)."""

from __future__ import annotations

import os
import time

from optimus_any2any_spark import tables
from optimus_any2any_spark.tables import (
    _SCHEMA_CACHE,
    _content_signature,
    read_table,
    table_path,
)

SF = "/root/testdata/sf0.001"


def test_cache_hit_identical_schema_and_rows(spark):
    _SCHEMA_CACHE.clear()
    cold = read_table(spark, SF, "orders")
    cold_rows = sorted(
        cold.limit(50).collect(), key=lambda r: r["o_orderkey"]
    )
    key = (
        os.path.abspath(table_path(SF, "orders")),
        _content_signature(table_path(SF, "orders")),
    )
    assert key in _SCHEMA_CACHE  # inference populated the cache
    warm = read_table(spark, SF, "orders")
    assert warm.schema == cold.schema
    warm_rows = sorted(
        warm.limit(50).collect(), key=lambda r: r["o_orderkey"]
    )
    assert warm_rows == cold_rows


def test_events_nanos_normalization_survives_cache(spark):
    _SCHEMA_CACHE.clear()
    cold = read_table(spark, SF, "events")
    warm = read_table(spark, SF, "events")
    assert warm.schema == cold.schema
    # whatever normalization the cold path applied (nanos→timestamp at
    # SFs whose events carry TIMESTAMP(NANOS), NTZ passthrough
    # otherwise), the warm path must be bit-identical
    assert dict(warm.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    assert warm.selectExpr("max(ts)").collect() == cold.selectExpr(
        "max(ts)"
    ).collect()


def test_signature_invalidates_on_rewrite(spark, tmp_path):
    sf = str(tmp_path)
    p = table_path(sf, "orders")
    spark.range(5).selectExpr("id AS a").coalesce(1).write.parquet(p)
    first = read_table(spark, sf, "orders")
    assert first.columns == ["a"]
    # rewrite the same path with a DIFFERENT schema; bump mtime past
    # filesystem timestamp granularity so the signature must change
    time.sleep(0.02)
    spark.range(5).selectExpr(
        "id AS a", "id * 2 AS b"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    second = read_table(spark, sf, "orders")
    assert second.columns == ["a", "b"]
    assert second.count() == 5


def test_hit_skips_the_inference_job(spark):
    _SCHEMA_CACHE.clear()
    sc = spark.sparkContext
    read_table(spark, SF, "documents")  # cold: inference job allowed

    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    sc.setJobGroup("schema-cache-hit", "warm read_table")
    try:
        df = read_table(spark, SF, "documents")  # plan only, no action
        assert df.schema is not None
        hit_jobs = set(tracker.getJobIdsForGroup("schema-cache-hit") or [])
    finally:
        sc.setJobGroup(None, None)
    assert not hit_jobs - before  # no Spark job ran for the warm read


def test_unstatable_path_bypasses_cache(spark):
    assert _content_signature("/nonexistent/nowhere.parquet") is None


def test_cache_key_distinguishes_sf_dirs(spark):
    _SCHEMA_CACHE.clear()
    a = read_table(spark, "/root/testdata/sf0.001", "nation")
    b = read_table(spark, "/root/testdata/sf0.01", "nation")
    assert a.schema == b.schema
    keys = {k[0] for k in _SCHEMA_CACHE}
    assert len(keys) == 2
