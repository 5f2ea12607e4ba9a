"""Distributed BPE training/encoding (operators/tokenizer.py):
hand-computed merge sequences, greedy-overlap semantics, tie-breaks,
and encode/train consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from optimus_any2any_spark.operators.tokenizer import (
    bpe_encode,
    bpe_merge_steps,
    bpe_word_counts,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestWordCounts:
    def test_lower_whitespace_alpha_filter(self, spark):
        wc = {
            r.w: r.cnt
            for r in bpe_word_counts(
                _docs(spark, ["Low low  lower", "low 42 x-y", None])
            ).collect()
        }
        assert wc == {"low": 3, "lower": 1}


class TestMergeSteps:
    def test_hand_computed_merges(self, spark):
        # classic BPE toy corpus: low x5, lower x2, newest x6, widest x3
        texts = (
            ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        )
        got = [
            (r.step, r.left_sym, r.right_sym, r.merged, r.pair_count)
            for r in bpe_merge_steps(
                _docs(spark, [" ".join(texts)]), n_merges=3
            ).collect()
        ]
        # pair counts round 1: es 9 (newest+widest), st 9, we 8 ...
        # tie es/st at 9 → lexicographic picks (e,s); then (es,t) at 9;
        # then (est) absorbed, next best: lo 7 (low+lower)
        assert got == [
            (1, "e", "s", "es", 9),
            (2, "es", "t", "est", 9),
            (3, "l", "o", "lo", 7),
        ]

    def test_greedy_overlap_first_pair_wins(self, spark):
        # "aaaa" → pairs (a,a) x3 → merge 1 gives "aa aa" (greedy
        # left-to-right, NOT "a aa a"); merge 2 then pairs (aa,aa)
        got = [
            (r.step, r.merged, r.pair_count)
            for r in bpe_merge_steps(
                _docs(spark, ["aaaa aaaa"]), n_merges=2
            ).collect()
        ]
        assert got[0] == (1, "aa", 6)  # 3 adjacent pairs x 2 words
        assert got[1] == (2, "aaaa", 2)

    def test_empty_corpus_yields_no_merges(self, spark):
        out = bpe_merge_steps(_docs(spark, ["", "   ", None]), n_merges=3)
        assert out.count() == 0
        assert out.columns == [
            "step", "left_sym", "right_sym", "merged", "pair_count",
        ]


class TestEncode:
    def test_encode_applies_merges_in_order(self, spark):
        enc = bpe_encode(
            _docs(spark, ["table cable"]),
            [("t", "a"), ("b", "l"), ("ta", "bl")],
        ).collect()[0]
        # table → <ta><bl><e> (ta+bl merged, then joined) → tabl, e
        assert enc.bpe_tokens == ["tabl", "e", "c", "a", "bl", "e"]
        assert enc.bpe_token_count == 6

    def test_encode_strips_non_alpha_and_splits_words(self, spark):
        enc = bpe_encode(
            _docs(spark, ["To be!  or not?"]), [("o", "r")]
        ).collect()[0]
        assert enc.bpe_tokens == [
            "t", "o", "b", "e", "or", "n", "o", "t",
        ]

    def test_trained_merges_compress_training_corpus(self, spark):
        docs = _docs(spark, ["low low lower newest newest widest"] * 4)
        merges = [
            (r.left_sym, r.right_sym)
            for r in bpe_merge_steps(docs, n_merges=3).collect()
        ]
        enc = bpe_encode(docs, merges)
        raw_chars = enc.select(
            F.sum(F.length(F.regexp_replace("text", r"[^a-z]", "")))
        ).collect()[0][0]
        total = enc.select(F.sum("bpe_token_count")).collect()[0][0]
        assert total < raw_chars  # merges actually compress


class TestBoundedStorage:
    def test_deep_merge_run_does_not_pin_lineage(self, spark):
        # r4 leak: every merge step persisted a new vocabulary frame
        # without unpersisting the previous — 50 merges pinned 50
        # cached lineage snapshots (30k at a real vocabulary size).
        # Now at most the persisted base survives a deep run, and the
        # trainer unpersists even that on exit.
        jsc = spark.sparkContext._jsc.sc()
        before = jsc.getPersistentRDDs().size()
        rows = bpe_merge_steps(
            _docs(spark, ["the quick brown fox jumps over the lazy dog",
                          "pack my box with five dozen liquor jugs"] * 5),
            n_merges=50,
        ).collect()
        after = jsc.getPersistentRDDs().size()
        assert after - before <= 1
        assert len(rows) > 10  # a genuinely deep run
        assert [r.step for r in rows] == list(range(1, len(rows) + 1))
