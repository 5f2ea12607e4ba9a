"""Span-level exact dedup and hashed linear quality scoring."""

from __future__ import annotations

from pyspark.sql import functions as F

from optimus_any2any_spark.operators.dedup import span_exact_stats
from optimus_any2any_spark.operators.text import hashed_linear_score
from optimus_any2any_spark.plans import plan_report
from optimus_any2any_spark.queries import all_queries
from tests.conftest import SF_DIR


class TestSpanExact:
    def test_cross_doc_span_marked_in_both(self, spark):
        shared = "one two three four five six"
        df = spark.createDataFrame(
            [
                (1, shared + " tail a b c"),
                (2, "head x y z " + shared),
                (3, "totally different words here seven eight nine ten"),
            ],
            "doc_id int, text string",
        )
        out = {r.doc_id: r for r in span_exact_stats(df, n=6).collect()}
        assert set(out) == {1, 2}  # doc 3 has no duplicated span
        assert out[1].dup_spans >= 1 and out[2].dup_spans >= 1

    def test_within_doc_repeat_counts_occurrences(self, spark):
        # the same 6-gram occurs twice INSIDE one doc: both occurrences
        # are duplicated spans (multiplicity semantics, unlike shingles)
        text = "a b c d e f " + "a b c d e f"
        df = spark.createDataFrame([(1, text)], "doc_id int, text string")
        row = span_exact_stats(df, n=6).collect()[0]
        # 12 tokens -> 7 positions; positions 1 and 7 share the gram
        assert row.n_spans == 7 and row.dup_spans == 2
        assert abs(row.dup_frac - round(2 / 7, 4)) < 1e-9
        assert not row.flagged  # 2/7 < 0.5

    def test_short_doc_yields_no_spans(self, spark):
        df = spark.createDataFrame(
            [(1, "too short"), (2, "also very short text")],
            "doc_id int, text string",
        )
        assert span_exact_stats(df, n=6).count() == 0


class TestHashedLinearScore:
    def test_deterministic_and_bounded(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha beta gamma")],
            "doc_id int, text string",
        )
        n, w, s = hashed_linear_score(F.col("text"))
        rows = df.select("doc_id", n.alias("n"), w.alias("w"), s.alias("s")).collect()
        assert rows[0].w == rows[1].w and rows[0].s == rows[1].s
        assert -1.0 <= rows[0].s <= 1.0
        assert rows[0].n == 3

    def test_zero_shuffle_plan(self, spark):
        q = all_queries()["text_quality_linear"]
        r = plan_report(q.spark(spark, SF_DIR))
        # pure per-row fold + global sort for the ORDER BY: no joins at
        # all, and the only exchange is the output ordering
        assert r.num_sortmerge_joins == 0
        assert r.num_broadcast_joins == 0
        assert "mapInPandas" not in r.text.lower()


class TestEventsFunnel:
    def test_ordering_and_window_semantics(self, spark):
        from datetime import datetime as dt

        from optimus_any2any_spark.queries import all_queries

        rows = [
            # u1: full chain within windows
            (1, dt(2024, 1, 1, 0, 0), 1, "view"),
            (2, dt(2024, 1, 1, 1, 0), 1, "click"),
            (3, dt(2024, 1, 1, 2, 0), 1, "purchase"),
            # u2: click BEFORE first view — chain stops at view
            (4, dt(2024, 1, 2, 0, 0), 2, "click"),
            (5, dt(2024, 1, 2, 1, 0), 2, "view"),
            # u3: click > 24h after view — out of window
            (6, dt(2024, 1, 3, 0, 0), 3, "view"),
            (7, dt(2024, 1, 4, 0, 1), 3, "click"),
            # u4: purchase without view — never enters the funnel
            (8, dt(2024, 1, 5, 0, 0), 4, "purchase"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        ).withColumn("value", F.lit(0.0))
        # `load` resolves read_table through queries.util's namespace
        import optimus_any2any_spark.queries.util as U

        orig = U.read_table
        try:
            U.read_table = lambda spark_, sf_, name_: df
            out = {r.step: r for r in
                   all_queries()["q_events_funnel"].spark(spark, "ignored").collect()}
        finally:
            U.read_table = orig
        assert out[1].users == 3      # u1, u2, u3 reach 'view'
        assert out[2].users == 1      # only u1's click follows its view in-window
        assert out[3].users == 1
        assert abs(out[2].conv_from_first - round(1 / 3, 4)) < 1e-9


class TestCDCChunkDedup:
    def test_insertion_resync_beats_fixed_windows(self, spark):
        from optimus_any2any_spark.operators.dedup import (
            cdc_chunk_dedup,
            passage_dedup,
        )

        # doc 1 = doc 0 with ONE word inserted up front. CDC boundaries
        # travel with the content, so after the insertion point doc 1's
        # chunks re-align with doc 0's and dedup removes them; fixed
        # windows shift by one word and share (almost) nothing.
        base = " ".join(f"w{i}" for i in range(400))
        rows = [(0, base), (1, "INSERTED " + base)]
        df = spark.createDataFrame(rows, "doc_id long, text string")

        cdc = {r.doc_id: r for r in cdc_chunk_dedup(df).collect()}
        assert cdc[0].n_chunks_kept == cdc[0].n_chunks  # first doc intact
        # the near-copy must lose the bulk of its chunks to resync
        assert cdc[1].n_chunks_kept <= cdc[1].n_chunks // 4
        assert cdc[1].clean_text.startswith("INSERTED")

        fixed = {
            r.doc_id: r
            for r in passage_dedup(df, chunk_words=8).collect()
        }
        # fixed windows misalign: doc 1 keeps (nearly) everything —
        # the failure mode CDC exists to fix
        assert fixed[1].n_chunks_kept > cdc[1].n_chunks_kept * 4

    def test_chunk_partition_invariance(self, spark):
        from optimus_any2any_spark.operators.dedup import cdc_chunk_dedup

        rows = [(i, " ".join(f"t{j % 13}x{(i * j) % 7}" for j in range(60)))
                for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(cdc_chunk_dedup(df.repartition(1)).collect())
        b = sorted(cdc_chunk_dedup(df.repartition(7)).collect())
        assert a == b

    def test_reassembly_preserves_token_stream_of_kept_chunks(self, spark):
        from optimus_any2any_spark.operators.dedup import cdc_chunk_dedup

        df = spark.createDataFrame(
            [(0, "a b c d e f g h i j")], "doc_id long, text string"
        )
        row = cdc_chunk_dedup(df).collect()[0]
        # single unique doc: nothing to drop, text reassembles exactly
        assert row.clean_text == "a b c d e f g h i j"
        assert row.n_chunks == row.n_chunks_kept
