"""Persisted IVF index: build-once/query-many must return exactly the
in-session ivf_topk result, and probing must be partition-pruned."""

from __future__ import annotations

from optimus_any2any_spark.operators.similarity import (
    build_ivf_index,
    ivf_topk,
    ivf_topk_from_index,
)
from optimus_any2any_spark.queries.util import load
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(
        (r["vec_id"], r["neighbor_id"], r["cosine_sim"], r["rank"])
        for r in df.collect()
    )


class TestIvfIndexPersistence:
    def test_index_query_matches_in_session(self, spark, tmp_path):
        emb = load(spark, SF_DIR, "embeddings")
        path = str(tmp_path / "ivf")
        build_ivf_index(emb, path)
        spark.catalog.clearCache()
        from_index = _rows(ivf_topk_from_index(spark, path, k=5))
        in_session = _rows(ivf_topk(emb, k=5, persist_index=False))
        assert from_index == in_session
        assert len(from_index) > 0

    def test_index_is_cell_partitioned(self, spark, tmp_path):
        import os

        emb = load(spark, SF_DIR, "embeddings")
        path = str(tmp_path / "ivf")
        build_ivf_index(emb, path, n_cells=8)
        cells = [d for d in os.listdir(path) if d.startswith("centroid_id=")]
        assert len(cells) == 8
