"""Distributed embedding linear algebra: corpus covariance + ZCA
whitening.

Retrieval stacks whiten embedding spaces before indexing (Su et al.
2021, "Whitening Sentence Representations", arXiv:2103.15316; the same
preprocessing FAISS documents as OPQ's first step): decorrelated,
unit-variance dimensions make inner-product search and SQ8
quantization behave. The two halves split cleanly by scale:

- **Covariance is corpus-scale** and must be a tree-aggregate: each
  row contributes its d(d+1)/2 upper-triangle products, map-side
  combine collapses every partition to at most d(d+1)/2 cells, and the
  only shuffle is cell-keyed (d=64 → 2080 rows). Sums accumulate in
  DECIMAL(38,12) so the matrix is bit-identical on any partitioning —
  the oracle gate runs the same arithmetic in DuckDB.
- **The eigendecomposition is d×d** — driver-side numpy on a 64×64
  symmetric matrix, the textbook "small model, big data" split (same
  shape as FAISS training its rotation on a sample). The whitening
  matrix then BROADCASTS back (inside the Arrow closure) and the
  transform is one vectorized numpy matmul per batch.

Verification exploits the defining identity instead of chasing
eigenvector sign conventions: cov(whiten(X)) = I, so the whitened
covariance rounded to 3dp is oracle-checkable as a literal identity
matrix — float error is ~1e-10 against a 5e-4 rounding budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from optimus_any2any_spark.operators.util import ensure_parallelism

_DEC = "decimal(38,12)"


def embedding_mean_cov(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Upper-triangle covariance cells ``(i, j, mean_i, mean_j, cov)``
    (0-based, i ≤ j) of the embedding corpus.

    cov = (Σ x_i·x_j − Σx_i · Σx_j / n) / n — population covariance,
    sums DECIMAL-exact, the final arithmetic in double with one
    round(6). One corpus scan, one cell-keyed shuffle of ≤ d(d+1)/2
    partial rows per partition.
    """
    base = ensure_parallelism(df, F.col(id_col)).select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")
    )
    xi = base.select(F.posexplode("v").alias("i", "xi"), F.col("v"))
    cells = xi.select(
        "i",
        "xi",
        F.posexplode("v").alias("j", "xj"),
    ).filter(F.col("i") <= F.col("j"))
    agg = cells.groupBy("i", "j").agg(
        F.sum(F.col("xi").cast(_DEC)).alias("sx"),
        F.sum(F.col("xj").cast(_DEC)).alias("sy"),
        F.sum((F.col("xi") * F.col("xj")).cast(_DEC)).alias("sxy"),
        F.count(F.lit(1)).alias("n"),
    )
    # + 0.0 folds IEEE -0.0 (a tiny negative rounded to zero) into +0.0
    # so the bit pattern matches engines that keep the sign.
    return agg.select(
        "i",
        "j",
        (F.round(F.col("sx").cast("double") / F.col("n"), 6) + F.lit(0.0)).alias(
            "mean_i"
        ),
        (F.round(F.col("sy").cast("double") / F.col("n"), 6) + F.lit(0.0)).alias(
            "mean_j"
        ),
        (
            F.round(
                (
                    F.col("sxy").cast("double")
                    - F.col("sx").cast("double")
                    * F.col("sy").cast("double")
                    / F.col("n")
                )
                / F.col("n"),
                6,
            )
            + F.lit(0.0)
        ).alias("cov"),
    )


def _collect_mean_cov(df: DataFrame, id_col: str, vec_col: str):
    """Driver-side (mean, cov) numpy matrices from UNROUNDED decimal
    sums — d + d(d+1)/2 rows collected, never corpus rows."""
    import numpy as np

    base = ensure_parallelism(df, F.col(id_col)).select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")
    )
    xi = base.select(F.posexplode("v").alias("i", "xi"), F.col("v"))
    cells = xi.select("i", "xi", F.posexplode("v").alias("j", "xj")).filter(
        F.col("i") <= F.col("j")
    )
    rows = (
        cells.groupBy("i", "j")
        .agg(
            F.sum(F.col("xi").cast(_DEC)).alias("sx"),
            F.sum(F.col("xj").cast(_DEC)).alias("sy"),
            F.sum((F.col("xi") * F.col("xj")).cast(_DEC)).alias("sxy"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    if not rows:  # empty corpus: 0-dim model, caller emits no rows
        import numpy as _np

        return _np.zeros(0), _np.zeros((0, 0))
    d = max(r["j"] for r in rows) + 1
    mean = np.zeros(d)
    cov = np.zeros((d, d))
    for r in rows:
        i, j, n = r["i"], r["j"], r["n"]
        sx, sy, sxy = float(r["sx"]), float(r["sy"]), float(r["sxy"])
        cov[i, j] = cov[j, i] = (sxy - sx * sy / n) / n
        if i == j:
            mean[i] = sx / n
    return mean, cov


def whiten_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 1e-6,
) -> DataFrame:
    """ZCA whitening: x' = W (x − μ) with W = U diag(1/√(λ+eps)) Uᵀ
    from the corpus covariance eigendecomposition. Returns
    ``(id, whitened: array<double>)``.

    The d×d eigh runs once on the driver; the corpus transform is a
    single numpy matmul per Arrow batch (the d×d matrix and mean ride
    the closure — data, not module references, so workers need no
    package install). Output covariance is the identity, which is how
    the oracle gate verifies the whole chain.
    """
    import numpy as np

    mean, cov = _collect_mean_cov(df, id_col, vec_col)

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("whitened", T.ArrayType(T.DoubleType())),
        ]
    )
    if mean.size == 0:
        return df.sparkSession.createDataFrame([], schema)
    lam, u = np.linalg.eigh(cov)
    w_mat = (u * (1.0 / np.sqrt(lam + eps))) @ u.T
    mean_c, w_c = mean.copy(), w_mat.copy()

    def run(batches):
        import numpy as _np
        import pandas as pd

        for pdf in batches:
            x = _np.stack(pdf["v"].map(_np.asarray).to_numpy())
            out = (x - mean_c) @ w_c.T
            yield pd.DataFrame(
                {"id": pdf["id"], "whitened": list(out)}
            )

    # null vectors contribute nothing to the model (the explode drops
    # them) and cannot be transformed — excluded from the output too
    base = ensure_parallelism(
        df.filter(F.col(vec_col).isNotNull()), F.col(id_col)
    ).select(
        F.col(id_col).cast("long").alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    return base.mapInPandas(run, schema=schema)
