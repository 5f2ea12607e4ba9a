"""Partitioning-invariance: the engine's core claim (README "Design
rules", docs/SCALE.md) is that every query produces IDENTICAL values on
any partitioning — the property that makes results reproducible when
the same job runs on 4 local cores or 1000 executors. Verified by
hashing results under different shuffle-partition counts."""

from __future__ import annotations

import hashlib

import pytest

from optimus_any2any_spark.queries import all_queries
from tests.conftest import SF_DIR

# queries spanning every mechanism with determinism risk: IEEE double
# aggregation, window ties, hash bucketing, top-k, sampling, window
# frames, self-joins
PROBES = [
    "q01_pricing_summary",     # decimal-accumulated double sums
    "dedup_minhash_lsh",       # md5 bucketing + broadcast verify
    "kmv_distinct_users",      # salted two-stage top-k
    "asof_click_attribution",  # union+window with tie-breaks
    "ann_ivf_topk",            # persisted index + rounded similarity ranking
    "sample_stratified",       # seeded-hash sampling
    "q_events_moving_avg",     # window frames over doubles
    "dedup_passage",           # global first-occurrence window + rebuild
    "sample_temperature_lang", # per-lang running sum + fp budget alloc
    "shard_balanced_assignment",  # global size-rank round-robin
    "dedup_cdc_chunks",        # content-cut prefix sums + min-struct
    "dedup_semantic_trained",  # Lloyd rounds + pairwise cosine ties
    "text_bigram_logprob",     # decimal log-prob sums, model broadcasts
    "mix_dsir_importance",     # hashed-bucket ratios + decimal rollup
    "embedding_covariance",    # decimal product sums, cell shuffle
    "multimodal_jpeg_roundtrip",  # codec determinism through Arrow
    "tokenizer_bpe_merges",    # iterative argmax + broadcast replace
    "classifier_perceptron_train",  # integer epochs, batch updates
    "delta_merge_upsert",      # copy-on-write rewrite + decimal rollup
    "iceberg_merge_upsert",    # snapshot merge, Avro manifest replay
    "delta_cdf_read",          # change-set extraction + semi joins
]


def result_hash(df) -> str:
    rows = df.toPandas()
    rows = rows[sorted(rows.columns)]
    rows = rows.sort_values(by=list(rows.columns), na_position="last", kind="mergesort")
    payload = rows.to_csv(index=False, float_format="%.12g").encode()
    return hashlib.md5(payload).hexdigest()


@pytest.mark.parametrize("name", PROBES)
def test_result_invariant_under_partitioning(name, spark):
    q = all_queries()[name]
    baseline = None
    for parts in ("3", "17"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            h = result_hash(q.spark(spark, SF_DIR))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
        if baseline is None:
            baseline = h
        else:
            assert h == baseline, f"{name}: result depends on partition count"
