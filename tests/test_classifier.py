"""Batch perceptron (operators/classifier.py): separable-corpus
convergence, partition invariance, empty/degenerate inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from optimus_any2any_spark.operators.classifier import (
    hashed_features,
    perceptron_confusion,
    perceptron_train,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


_LABEL = None  # built per test: Columns need a live session


def _label():
    return F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(-1))


class TestTraining:
    def test_separable_corpus_classified_perfectly(self, spark):
        # two disjoint vocabularies → linearly separable → the
        # perceptron must fit the training set exactly
        rows = [(i, "good solid fine", "en") for i in range(5)] + [
            (i + 10, "schlecht kaputt falsch", "de") for i in range(5)
        ]
        conf = {
            (r.y, r.pred): r.n_docs
            for r in perceptron_confusion(
                _docs(spark, rows), _label(), epochs=3
            ).collect()
        }
        assert conf == {(1, 1): 5, (-1, -1): 5}

    def test_weights_partition_invariant(self, spark):
        rows = [
            (i, f"tok{i % 7} tok{(i * 3) % 11} filler",
             "en" if i % 2 else "fr")
            for i in range(40)
        ]
        d1 = _docs(spark, rows).repartition(1)
        d8 = _docs(spark, rows).repartition(8)
        w1 = [(r.bucket, r.weight) for r in perceptron_train(
            d1, _label(), epochs=3).collect()]
        w8 = [(r.bucket, r.weight) for r in perceptron_train(
            d8, _label(), epochs=3).collect()]
        assert w1 == w8 and len(w1) > 0

    def test_empty_and_null_text_docs_ignored(self, spark):
        rows = [(1, "hello world", "en"), (2, "", "de"), (3, None, "fr")]
        feat = hashed_features(
            _docs(spark, rows), label=_label()
        )
        assert feat.filter(F.col("doc_id") != 1).count() == 0
        conf = perceptron_confusion(
            _docs(spark, rows), _label(), epochs=2
        ).collect()
        # only doc 1 has features; featureless docs drop out of the
        # training set entirely
        assert sum(r.n_docs for r in conf) == 1

    def test_empty_corpus_yields_empty_model(self, spark):
        d = _docs(spark, [])
        w = perceptron_train(d, _label(), epochs=2)
        assert w.count() == 0
        assert w.columns == ["bucket", "weight"]
