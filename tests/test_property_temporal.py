"""Property-based tests (hypothesis): the as-of join and bucketed range
count against independent naive implementations on randomized event
sets — catches boundary/tie/ordering bugs the fixed oracles can't."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from optimus_any2any_spark.operators.temporal import asof_join, bucketed_range_count

BASE = dt.datetime(2024, 1, 1)

# (key, seconds-offset) event sets; collisions and boundary multiples of
# the 60 s bucket width are likely by construction
left_events = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 300)),
    min_size=1,
    max_size=12,
    unique=True,
)
right_events = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 300)),
    min_size=0,
    max_size=12,
    unique=True,
)


def mk_left(spark, evs):
    rows = [(i, k, BASE + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(evs)]
    return rows, spark.createDataFrame(rows, ["id", "k", "ts"])


def mk_right(spark, evs):
    rows = [
        (100 + i, k, BASE + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(evs)
    ]
    df = (
        spark.createDataFrame(rows, ["rid", "k", "rts"])
        if rows
        else spark.createDataFrame([], "rid long, k long, rts timestamp")
    )
    return rows, df


class TestAsofProperty:
    @given(l=left_events, r=right_events)
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def test_matches_naive_asof(self, spark, l, r):
        lrows, ldf = mk_left(spark, l)
        rrows, rdf = mk_right(spark, r)
        out = {
            row["id"]: row["rts_asof"]
            for row in asof_join(
                ldf, rdf, on="k", left_ts="ts", right_ts="rts", payload_cols=["rid"]
            ).collect()
        }
        for lid, lk, lts in lrows:
            prior = [rts for (_, rk, rts) in rrows if rk == lk and rts <= lts]
            expect = max(prior) if prior else None
            assert out[lid] == expect, (lid, lk, lts)


class TestRangeCountProperty:
    @given(l=left_events, r=right_events)
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def test_matches_naive_count(self, spark, l, r):
        window = 60
        lrows, ldf = mk_left(spark, l)
        rrows, rdf = mk_right(spark, r)
        rdf = rdf.select("k", "rts")
        out = {
            row["id"]: row["n_in_range"]
            for row in bucketed_range_count(
                ldf, rdf, on="k", left_ts="ts", right_ts="rts", window_seconds=window
            ).collect()
        }
        for lid, lk, lts in lrows:
            lo = lts - dt.timedelta(seconds=window)
            expect = sum(
                1 for (_, rk, rts) in rrows if rk == lk and lo <= rts < lts
            )
            assert out[lid] == expect, (lid, lk, lts)
