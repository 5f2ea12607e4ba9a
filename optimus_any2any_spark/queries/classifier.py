"""Trained-classifier queries: the batch perceptron's full training
trajectory hash-verified against an unrolled SQL oracle.

All-integer updates (counts × ±1 labels) make the iterative trainer
bit-exact in both engines — the same determinism trick as the BPE
trainer. Beyond-reference (the reference has no ML surface);
SURVEY.md §7 LLM-pipeline layer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from optimus_any2any_spark.queries import register
from optimus_any2any_spark.queries.util import load

_N_BUCKETS = 64

_O_FEAT = r"""
    tok AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
             unnest(string_split_regex(trim(coalesce(text, '')),
                                       '\s+')) AS t
      FROM documents
    ),
    feat AS (
      SELECT doc_id, y,
             (list_reduce(
                list_transform(range(1, 8),
                  p -> CAST(strpos('0123456789abcdef',
                                   substr(md5(t), p, 1)) - 1 AS BIGINT)),
                (a, b) -> a * 16 + b) % 64) AS h,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok WHERE t <> ''
      GROUP BY doc_id, y, h
    ),
    docs AS (SELECT DISTINCT doc_id, y FROM feat),
    w1 AS (
      SELECT h, CAST(SUM(y * cnt) AS BIGINT) AS w FROM feat GROUP BY h
    )
"""


def _o_epoch(i: int) -> str:
    prev = f"w{i - 1}"
    return f"""
    m{i} AS (
      SELECT d.doc_id FROM docs d
      LEFT JOIN (
        SELECT f.doc_id, SUM(f.cnt * w.w) AS s
        FROM feat f JOIN {prev} w ON f.h = w.h
        GROUP BY f.doc_id
      ) s ON d.doc_id = s.doc_id
      WHERE d.y * COALESCE(s.s, 0) <= 0
    ),
    w{i} AS (
      SELECT h, CAST(SUM(w) AS BIGINT) AS w FROM (
        SELECT h, w FROM {prev}
        UNION ALL
        SELECT f.h, CAST(f.y * f.cnt AS BIGINT) AS w
        FROM feat f JOIN m{i} ON f.doc_id = m{i}.doc_id
      ) GROUP BY h
    )
    """


def _label():
    # built lazily: constructing a Column needs an active SparkContext,
    # and this module imports at registry-load time
    return F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(-1))


@register(
    "classifier_perceptron_train",
    oracle="WITH "
    + _O_FEAT
    + ","
    + ",".join(_o_epoch(i) for i in (2, 3))
    + """
    SELECT h AS bucket, w AS weight
    FROM w3 WHERE w <> 0 ORDER BY bucket
    """,
    doc="Distributed batch-perceptron training "
    "(operators/classifier.py): hashed bag-of-words features (28-bit "
    "md5 bucket mod 64), labels ±1 from the lang column (en vs rest), "
    "three epochs of w += sum over misclassified of y*x — every "
    "quantity an integer, so the full training trajectory "
    "hash-matches the 3-epoch-unrolled SQL oracle. One corpus pass "
    "builds the persisted feature table; each epoch is a broadcast "
    "join against the 64-row weight vector plus two aggregations. "
    "Beyond-reference.",
    bench=True,
)
def classifier_perceptron_train(spark, sf_dir):
    from optimus_any2any_spark.operators.classifier import perceptron_train
    from optimus_any2any_spark.operators.util import ensure_parallelism

    d = ensure_parallelism(load(spark, sf_dir, "documents"), "doc_id")
    return perceptron_train(
        d, _label(), n_buckets=_N_BUCKETS, epochs=3
    )


@register(
    "classifier_perceptron_eval",
    oracle="WITH "
    + _O_FEAT
    + ","
    + ",".join(_o_epoch(i) for i in (2, 3))
    + """
    , final_margin AS (
      SELECT d.doc_id, d.y, COALESCE(s.s, 0) AS s
      FROM docs d
      LEFT JOIN (
        SELECT f.doc_id, SUM(f.cnt * w.w) AS s
        FROM feat f JOIN w3 w ON f.h = w.h
        GROUP BY f.doc_id
      ) s ON d.doc_id = s.doc_id
    )
    SELECT y,
           CASE WHEN s > 0 THEN 1 ELSE -1 END AS pred,
           COUNT(*) AS n_docs
    FROM final_margin
    GROUP BY y, pred ORDER BY y, pred
    """,
    doc="Training-set confusion matrix of the trained perceptron "
    "(operators/classifier.py perceptron_confusion): predictions are "
    "sign(w·x) with zero margins negative — the sanity report a "
    "training pipeline logs, exact in both engines because the model "
    "is integer. On the driver's synthetic corpus the text is "
    "lang-independent, so the fitted model settles on the majority "
    "class — the gate verifies the training TRAJECTORY, not accuracy "
    "on unlearnable labels (tests/test_classifier.py shows perfect "
    "fit on a separable corpus).",
)
def classifier_perceptron_eval(spark, sf_dir):
    from optimus_any2any_spark.operators.classifier import (
        perceptron_confusion,
    )
    from optimus_any2any_spark.operators.util import ensure_parallelism

    d = ensure_parallelism(load(spark, sf_dir, "documents"), "doc_id")
    return perceptron_confusion(
        d, _label(), n_buckets=_N_BUCKETS, epochs=3
    )
