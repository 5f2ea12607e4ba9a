"""Unit tests for as-of join, bucketed range count, and the KMV sketch
— edge cases the sf0.01 oracle gate can't isolate: empty right side,
exact-timestamp ties, window boundary inclusion/exclusion, groups
smaller than k."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from optimus_any2any_spark.operators.sketch import kmv_distinct
from optimus_any2any_spark.operators.temporal import asof_join, bucketed_range_count


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def make(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


class TestAsofJoin:
    def test_basic_backward_match(self, spark):
        left = make(spark, [(1, 10, ts("2024-01-01T10:00:00"))], ["id", "k", "ts"])
        right = make(
            spark,
            [
                (100, 10, ts("2024-01-01T09:00:00")),
                (101, 10, ts("2024-01-01T09:30:00")),
                (102, 10, ts("2024-01-01T11:00:00")),  # future: excluded
            ],
            ["rid", "k", "rts"],
        )
        out = asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", payload_cols=["rid"]
        ).collect()
        assert len(out) == 1
        assert out[0]["rts_asof"] == ts("2024-01-01T09:30:00")
        assert out[0]["rid_asof"] == 101

    def test_no_prior_row_gives_null(self, spark):
        left = make(spark, [(1, 10, ts("2024-01-01T08:00:00"))], ["id", "k", "ts"])
        right = make(spark, [(100, 10, ts("2024-01-01T09:00:00"))], ["rid", "k", "rts"])
        out = asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", payload_cols=["rid"]
        ).collect()
        assert out[0]["rts_asof"] is None and out[0]["rid_asof"] is None

    def test_equal_timestamp_matches(self, spark):
        # >= semantics: a right row at exactly left_ts matches
        t = ts("2024-01-01T10:00:00")
        left = make(spark, [(1, 10, t)], ["id", "k", "ts"])
        right = make(spark, [(100, 10, t)], ["rid", "k", "rts"])
        out = asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", payload_cols=["rid"]
        ).collect()
        assert out[0]["rid_asof"] == 100

    def test_null_payload_not_torn(self, spark):
        # all payload columns must come from the SAME matched right row:
        # a NULL payload in the latest right row must NOT fall back to
        # an older row's value (per-column last(ignorenulls) bug)
        left = make(spark, [(1, 10, ts("2024-01-01T10:00:00"))], ["id", "k", "ts"])
        right = spark.createDataFrame(
            [
                (100, 10, ts("2024-01-01T09:00:00"), 5.0),
                (101, 10, ts("2024-01-01T09:30:00"), None),
            ],
            "rid long, k long, rts timestamp, price double",
        )
        out = asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            payload_cols=["rid", "price"],
        ).collect()
        assert out[0]["rid_asof"] == 101
        assert out[0]["price_asof"] is None  # from rid=101, not rid=100

    def test_null_keys_never_match(self, spark):
        left = spark.createDataFrame(
            [(1, None, ts("2024-01-01T10:00:00"))], "id long, k long, ts timestamp"
        )
        right = spark.createDataFrame(
            [(100, None, ts("2024-01-01T09:00:00"))],
            "rid long, k long, rts timestamp",
        )
        out = asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", payload_cols=["rid"]
        ).collect()
        assert len(out) == 1 and out[0]["rid_asof"] is None

    def test_right_tie_is_deterministic(self, spark):
        # two right rows at the identical (key, ts): the greatest
        # payload tuple wins, on any partitioning
        t = ts("2024-01-01T09:00:00")
        left = make(spark, [(1, 10, ts("2024-01-01T10:00:00"))], ["id", "k", "ts"])
        for n_parts in (1, 4):
            right = make(
                spark, [(100, 10, t), (101, 10, t)], ["rid", "k", "rts"]
            ).repartition(n_parts)
            out = asof_join(
                left, right, on="k", left_ts="ts", right_ts="rts",
                payload_cols=["rid"],
            ).collect()
            assert out[0]["rid_asof"] == 101, f"n_parts={n_parts}"

    def test_keys_do_not_leak(self, spark):
        left = make(spark, [(1, 10, ts("2024-01-01T10:00:00"))], ["id", "k", "ts"])
        right = make(spark, [(100, 99, ts("2024-01-01T09:00:00"))], ["rid", "k", "rts"])
        out = asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", payload_cols=["rid"]
        ).collect()
        assert out[0]["rid_asof"] is None


class TestBucketedRangeCount:
    def test_window_boundaries(self, spark):
        p = ts("2024-01-01T10:00:00")
        left = make(spark, [(1, 10, p)], ["id", "k", "ts"])
        right = make(
            spark,
            [
                (10, p - dt.timedelta(seconds=3600)),  # == lower bound: included
                (10, p - dt.timedelta(seconds=3601)),  # below: excluded
                (10, p - dt.timedelta(seconds=1)),     # inside
                (10, p),                                # == left ts: excluded (<)
            ],
            ["k", "rts"],
        )
        out = bucketed_range_count(
            left, right, on="k", left_ts="ts", right_ts="rts", window_seconds=3600
        ).collect()
        assert out[0]["n_in_range"] == 2

    def test_left_rows_with_no_candidates_kept(self, spark):
        left = make(spark, [(1, 10, ts("2024-01-01T10:00:00"))], ["id", "k", "ts"])
        right = make(spark, [(99, ts("2024-01-01T09:30:00"))], ["k", "rts"])
        out = bucketed_range_count(
            left, right, on="k", left_ts="ts", right_ts="rts", window_seconds=3600
        ).collect()
        assert len(out) == 1 and out[0]["n_in_range"] == 0

    def test_duplicate_left_rows_stay_distinct(self, spark):
        # two identical left rows must each get their own count row,
        # not merge into one row with a doubled count
        p = ts("2024-01-01T10:00:00")
        left = make(spark, [(10, p), (10, p)], ["k", "ts"])
        right = make(spark, [(10, p - dt.timedelta(seconds=30))], ["k", "rts"])
        out = bucketed_range_count(
            left, right, on="k", left_ts="ts", right_ts="rts", window_seconds=3600
        ).collect()
        assert sorted(r["n_in_range"] for r in out) == [1, 1]

    def test_cross_bucket_match(self, spark):
        # right row in the previous bucket must still be found
        left = make(spark, [(1, 10, ts("2024-01-01T10:00:05"))], ["id", "k", "ts"])
        right = make(spark, [(10, ts("2024-01-01T09:59:55"))], ["k", "rts"])
        out = bucketed_range_count(
            left, right, on="k", left_ts="ts", right_ts="rts", window_seconds=60
        ).collect()
        assert out[0]["n_in_range"] == 1


class TestKMV:
    def test_small_group_is_exact(self, spark):
        df = make(spark, [("a", i) for i in range(10)], ["g", "key"])
        out = kmv_distinct(df, "key", ["g"], k=32).collect()
        assert out[0]["n_exact"] == 10
        assert out[0]["kmv_estimate"] == 10.0

    def test_estimate_within_tolerance(self, spark):
        df = make(spark, [("a", i) for i in range(2000)], ["g", "key"])
        out = kmv_distinct(df, "key", ["g"], k=64).collect()
        est = out[0]["kmv_estimate"]
        assert out[0]["n_exact"] == 2000
        # KMV stderr ≈ 1/sqrt(k-2) ≈ 12.7%; allow 4 sigma
        assert abs(est - 2000) / 2000 < 0.51, est

    def test_duplicates_do_not_inflate(self, spark):
        rows = [("a", i % 50) for i in range(1000)]
        df = make(spark, rows, ["g", "key"])
        out = kmv_distinct(df, "key", ["g"], k=16).collect()
        assert out[0]["n_exact"] == 50
