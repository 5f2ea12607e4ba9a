"""Property tests: n-gram repetition stats vs a naive Python
implementation over generated token streams."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

token = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
doc = st.lists(token, min_size=0, max_size=12).map(" ".join)
docs = st.lists(doc, min_size=1, max_size=6)


def naive_2gram_stats(text: str):
    toks = text.split()
    grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    if not grams:
        return None
    c = Counter(grams)
    return (len(grams), len(c), max(c.values()))


class TestNgramRowsProperties:
    @given(ds=docs)
    @settings(max_examples=15, deadline=None)
    def test_occurrence_stats_match_naive(self, ds, spark):
        from optimus_any2any_spark.operators.text import ngram_rows

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(ds)], "doc_id long, text string"
        )
        occ = ngram_rows(df, n=2)
        # same two-level aggregation path text_repetition_filter uses
        stats = {
            r["id"]: (r["total"], r["nd"], r["mx"])
            for r in occ.groupBy("id", "gram")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("id")
            .agg(
                F.sum("c").alias("total"),
                F.count(F.lit(1)).alias("nd"),
                F.max("c").alias("mx"),
            )
            .collect()
        }
        for i, t in enumerate(ds):
            expect = naive_2gram_stats(t)
            if expect is None:
                assert i not in stats
            else:
                assert stats[i] == expect


class TestShingleFreqCap:
    def test_hot_shingle_capped_pairs_bounded(self, spark):
        """A shingle shared by all docs creates n^2 candidates uncapped;
        the freq cap drops it while true near-dups still verify."""
        from optimus_any2any_spark.operators import dedup as D

        docs = [(i, f"unique{i} alpha beta common tail end") for i in range(20)]
        # every doc shares shingles from "alpha beta common tail end";
        # docs 0/1 additionally share everything except the unique token.
        docs[1] = (1, "unique0 alpha beta common tail end")  # exact dup of 0
        df = spark.createDataFrame(docs, "doc_id long, text string")
        sh = D.shingles(df)

        uncapped = D.jaccard_pairs(sh, threshold=0.1, max_shingle_freq=None)
        capped = D.jaccard_pairs(sh, threshold=0.1, max_shingle_freq=5)
        n_uncapped, n_capped = uncapped.count(), capped.count()
        # uncapped: every pair shares the common shingles -> full n^2/2
        assert n_uncapped == 20 * 19 // 2
        # capped: the >5-freq shingles vanish; only the exact-dup pair
        # (sharing the unique0-prefixed low-freq shingles) survives
        assert n_capped == 1
        row = capped.collect()[0]
        assert (row["doc_a"], row["doc_b"]) == (0, 1)
        assert row["jaccard"] == 1.0


class TestPassageDedupEdges:
    def test_first_occurrence_and_rebuild(self, spark):
        from optimus_any2any_spark.operators.dedup import passage_dedup

        rows = [
            (1, "a b c d e f"),    # two clean chunks at cw=3
            (2, "a b c x y z"),    # chunk 0 duplicates doc 1's chunk 0
            (3, "a b c d e f"),    # fully duplicate doc -> removed
            (4, "a b c a b c g"),  # within-doc repeat + partial tail
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            r["doc_id"]: r for r in passage_dedup(df, chunk_words=3).collect()
        }
        assert out[1]["clean_text"] == "a b c d e f"
        assert out[1]["n_chunks_kept"] == 2
        assert out[2]["clean_text"] == "x y z"
        assert 3 not in out, "fully-duplicated doc must vanish"
        # both "a b c" occurrences in doc 4 lose to doc 1's chunk 0;
        # the partial tail survives
        assert out[4]["clean_text"] == "g"


def _passage_model(rows, cw):
    """Pure-Python reference: global first-occurrence by (doc, pos),
    docs rebuilt from surviving chunks, empty docs dropped."""
    chunks_by_doc = {}
    for doc_id, text in rows:
        toks = text.split()
        chunks_by_doc[doc_id] = [
            " ".join(toks[i : i + cw]) for i in range(0, len(toks), cw)
        ]
    first = {}
    for doc_id in sorted(chunks_by_doc):
        for idx, ch in enumerate(chunks_by_doc[doc_id]):
            first.setdefault(ch, (doc_id, idx))
    out = {}
    for doc_id, chunks in chunks_by_doc.items():
        kept = [
            ch
            for idx, ch in enumerate(chunks)
            if first[ch] == (doc_id, idx)
        ]
        if kept:
            out[doc_id] = (" ".join(kept), len(kept))
    return out


class TestPassageDedupProperties:
    @given(ds=docs)
    @settings(max_examples=15, deadline=None)
    def test_matches_python_model(self, ds, spark):
        from optimus_any2any_spark.operators.dedup import passage_dedup

        rows = [(i, t) for i, t in enumerate(ds) if t.strip()]
        if not rows:
            return
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["clean_text"], r["n_chunks_kept"])
            for r in passage_dedup(df, chunk_words=3).collect()
        }
        assert got == _passage_model(rows, 3)


class TestHammingPigeonhole:
    def test_full_recall_within_cutoff(self, spark):
        """Pigeonhole guarantee is exact, not probabilistic: every pair
        within Hamming<=3 of a 32-bit signature must be emitted, and no
        pair beyond the cutoff may appear."""
        from optimus_any2any_spark.operators.dedup import (
            simhash_hamming_pairs,
        )

        base = 0b1011_0010_1110_0001_0101_1100_0011_1010
        rows = [(0, base)]
        # ids 1..3: flip 1..3 scattered bits (within cutoff vs id 0)
        flips = [
            [3],
            [1, 17],
            [2, 9, 30],
        ]
        for i, bits in enumerate(flips, start=1):
            v = base
            for b in bits:
                v ^= 1 << b
            rows.append((i, v))
        # id 4: flip 4 bits spread across all four 8-bit bands so no
        # band matches id 0 (hamming 4 — must NOT pair with id 0)
        v = base
        for b in (0, 8, 16, 24):
            v ^= 1 << b
        rows.append((4, v))
        sigs = spark.createDataFrame(rows, "doc_id long, simhash long")
        got = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in simhash_hamming_pairs(sigs, max_hamming=3).collect()
        }
        assert got[(0, 1)] == 1 and got[(0, 2)] == 2 and got[(0, 3)] == 3
        assert (0, 4) not in got
        # pairs among the flipped variants are also within <=6 of each
        # other; only those <=3 may appear — spot-check symmetry bound
        for (a, b), h in got.items():
            assert h <= 3 and a < b
