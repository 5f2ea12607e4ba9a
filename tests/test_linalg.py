"""Embedding covariance + ZCA whitening (operators/linalg.py)."""

from __future__ import annotations

import numpy as np

from optimus_any2any_spark.operators.linalg import (
    embedding_mean_cov,
    whiten_embeddings,
)


def _vecs(spark, n=40, d=4, seed=9):
    rng = np.random.default_rng(seed)
    # anisotropic: correlated dims so whitening actually does work
    a = rng.normal(size=(d, d))
    x = rng.normal(size=(n, d)) @ a
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        x,
    )


class TestCovariance:
    def test_matches_numpy_population_covariance(self, spark):
        df, x = _vecs(spark)
        got = {
            (r.i, r.j): r.cov for r in embedding_mean_cov(df).collect()
        }
        ref = np.cov(x, rowvar=False, bias=True)
        for (i, j), c in got.items():
            assert abs(c - ref[i, j]) < 1e-6, (i, j)
        assert len(got) == 4 * 5 // 2

    def test_partition_invariance(self, spark):
        df, _ = _vecs(spark)
        a = sorted(embedding_mean_cov(df.repartition(1)).collect())
        b = sorted(embedding_mean_cov(df.repartition(7)).collect())
        assert a == b


class TestWhitening:
    def test_whitened_covariance_is_identity(self, spark):
        df, _ = _vecs(spark)
        w = whiten_embeddings(df, eps=1e-9)
        out = np.stack(
            [np.array(r.whitened) for r in w.orderBy("id").collect()]
        )
        cov = np.cov(out, rowvar=False, bias=True)
        assert np.abs(cov - np.eye(out.shape[1])).max() < 1e-6

    def test_whitening_is_invertible_information_preserving(self, spark):
        df, x = _vecs(spark)
        out = {
            r.id: np.array(r.whitened)
            for r in whiten_embeddings(df, eps=1e-9).collect()
        }
        # distinct inputs stay distinct (full-rank transform)
        mat = np.stack([out[i] for i in range(len(out))])
        assert np.linalg.matrix_rank(mat) == x.shape[1]
