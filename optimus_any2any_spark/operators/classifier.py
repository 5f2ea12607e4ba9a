"""Trained text classifier: distributed batch perceptron, all-integer.

The missing piece between the stand-in linear scorer
(``text.hashed_linear_score``) and a production fastText-style quality
filter is TRAINING. This trains a binary classifier over hashed
bag-of-words features with the batch (parallel) perceptron:

    w_0 = 0
    epoch t: misclassified_i ⇔ y_i · (w_{t-1} · x_i) ≤ 0
             w_t = w_{t-1} + Σ_{misclassified} y_i · x_i

Every quantity is an INTEGER (counts, ±1 labels, integer weights), so
the whole training trajectory is exact in both Spark and DuckDB and
the iterative trainer hash-verifies against an unrolled SQL oracle —
the same trick as the BPE trainer, where determinism comes from
choosing update rules with no floating-point accumulation. Batch
(not online) updates make the result partition-order independent,
which is what a distributed trainer needs anyway.

Feature hashing matches ``hashed_linear_score``: 28-bit md5 prefix
mod ``n_buckets`` — both engines compute it digit-by-digit exactly.

Scale shape: the corpus-scale work is ONE pass building the hashed
feature table (doc_id, bucket, cnt) — persisted, since every epoch
re-reads it. Per epoch: one broadcast join against the D-row weight
vector + one doc-keyed aggregation for margins, one bucket-keyed
aggregation for the gradient (map-side combined; D buckets). Epochs
are few and the weight vector rides a broadcast, never a collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from optimus_any2any_spark.operators.text import tokens


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label: F.Column | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """(id, y, bucket, cnt) hashed token counts — the one corpus-scale
    pass of training."""
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        (label if label is not None else F.lit(1)).alias("y"),
        F.explode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias(
            "t"
        ),
    ).filter(F.col("t") != "")
    bucket = (
        F.conv(F.substring(F.md5(F.col("t").cast("binary")), 1, 7), 16, 10)
        .cast("long") % n_buckets
    )
    return (
        tok.select("doc_id", "y", bucket.alias("h"))
        .groupBy("doc_id", "y", "h")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def perceptron_train(
    df: DataFrame,
    label: F.Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    epochs: int = 3,
) -> DataFrame:
    """Train the batch perceptron; returns the final weight vector as
    a (bucket, weight) table ordered by bucket — the model artifact a
    scoring pass broadcasts. ``label`` must evaluate to ±1."""
    spark = df.sparkSession
    # feat is re-read per epoch keyed by doc_id (margins aggregation +
    # misclassified semi-join), so persist it hash-partitioned on
    # doc_id: every epoch's doc-keyed operator then reuses the cached
    # partitioning instead of exchanging feat again. The repartition
    # moves the already-aggregated (doc, y, h, cnt) rows, not the
    # token stream.
    feat = (
        hashed_features(df, text_col, id_col, label, n_buckets)
        .repartition(F.col("doc_id"))
        .persist()
    )
    if epochs <= 0:
        return spark.createDataFrame([], "h long, w long").select(
            F.col("h").alias("bucket"), F.col("w").alias("weight")
        )
    # Epoch 1 runs against w=0: every margin is 0, so every doc is
    # misclassified and the update is the plain feature aggregate —
    # the same constant-fold the SQL oracle's w1 CTE expresses. This
    # drops a broadcast build, a doc-keyed aggregation and a full
    # semi-join from the first epoch with a bit-identical trajectory.
    w = (
        feat.groupBy("h")
        .agg(F.sum(F.col("y") * F.col("cnt")).alias("w"))
        .filter(F.col("w") != 0)
        .persist()
    )
    for _ in range(epochs - 1):
        # every doc in the training set HAS feature rows (docs are
        # derived from feat), so margins carry y directly — no
        # doc-roster join, one doc-keyed aggregation per epoch
        margins = (
            feat.join(F.broadcast(w), "h", "left")
            .groupBy("doc_id", "y")
            .agg(
                F.sum(
                    F.col("cnt") * F.coalesce(F.col("w"), F.lit(0))
                ).alias("s")
            )
        )
        miscl = margins.filter(
            F.col("y") * F.col("s") <= 0
        ).select("doc_id")
        grad = (
            feat.join(miscl, "doc_id", "left_semi")
            .groupBy("h")
            .agg(F.sum(F.col("y") * F.col("cnt")).alias("w"))
        )
        w = (
            w.unionByName(grad)
            .groupBy("h")
            .agg(F.sum("w").alias("w"))
            .filter(F.col("w") != 0)
            .persist()
        )
    return w.select(
        F.col("h").alias("bucket"), F.col("w").alias("weight")
    ).orderBy("bucket")


def perceptron_confusion(
    df: DataFrame,
    label: F.Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    epochs: int = 3,
) -> DataFrame:
    """Confusion counts of the trained model on its training set
    (y, pred, n_docs) — the sanity report a training pipeline logs.
    Prediction is sign(w·x) with 0 counted as -1 (no-feature and
    zero-margin docs predict negative, in both engines)."""
    w = perceptron_train(df, label, text_col, id_col, n_buckets, epochs)
    feat = hashed_features(df, text_col, id_col, label, n_buckets)
    margins = (
        feat.join(
            F.broadcast(w.withColumnRenamed("bucket", "h")), "h", "left"
        )
        .groupBy("doc_id", "y")
        .agg(
            F.sum(
                F.col("cnt") * F.coalesce(F.col("weight"), F.lit(0))
            ).alias("s")
        )
    )
    return (
        margins.select(
            "y",
            F.when(F.col("s") > 0, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("pred"),
        )
        .groupBy("y", "pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("y", "pred")
    )
