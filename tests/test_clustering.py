"""Distributed k-means (operators/clustering.py): semantics, partition
invariance, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from optimus_any2any_spark.operators.clustering import (
    kmeans_assign,
    kmeans_cluster_profile,
)
from optimus_any2any_spark.plans import plan_report
from optimus_any2any_spark.queries import all_queries
from tests.conftest import SF_DIR


def _blobs(spark):
    """Two well-separated direction blobs on the unit circle axes."""
    rows = []
    for i in range(20):
        rows.append((i, [10.0 + (i % 5) * 0.01, 0.1 * (i % 3)]))
    for i in range(20, 40):
        rows.append((i, [0.1 * (i % 3), 10.0 + (i % 5) * 0.01]))
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


class TestKMeansSemantics:
    def test_separated_blobs_land_in_distinct_clusters(self, spark):
        out = kmeans_assign(_blobs(spark), k=2, iterations=3).collect()
        by_cluster = {}
        for r in out:
            by_cluster.setdefault(r.cluster, set()).add(r.vec_id)
        assert len(by_cluster) == 2
        groups = sorted(by_cluster.values(), key=min)
        assert groups[0] == set(range(20))
        assert groups[1] == set(range(20, 40))

    def test_assignment_total_and_unique(self, spark):
        out = kmeans_assign(_blobs(spark), k=4, iterations=2)
        assert out.count() == 40
        assert out.select("vec_id").distinct().count() == 40

    def test_partition_layout_invariance(self, spark):
        """DECIMAL means + rounded sims: 1 partition and 7 partitions
        must produce byte-identical assignments."""
        df = _blobs(spark)
        a = sorted(
            kmeans_assign(df.repartition(1), k=3, iterations=2).collect()
        )
        b = sorted(
            kmeans_assign(df.repartition(7), k=3, iterations=2).collect()
        )
        assert a == b

    def test_profile_majority_label(self, spark):
        df = _blobs(spark).withColumn(
            "label",
            F.when(F.col("vec_id") < 20, F.lit("x")).otherwise(F.lit("y")),
        )
        prof = kmeans_cluster_profile(
            df, label_col="label", k=2, iterations=3
        ).collect()
        assert {r.majority_label for r in prof} == {"x", "y"}
        for r in prof:
            assert r.majority_count == 20 and r.size == 20
            assert r.min_sim <= r.mean_sim


class TestKMeansPlan:
    def test_no_corpus_sortmerge_join_and_pruned_scan(self, spark):
        """Assignment must stay a broadcast of the k-row centroid table;
        a SortMergeJoin would mean the corpus is being shuffled to meet
        the centroids. The embeddings scan must not read `label`."""
        q = all_queries()["embedding_kmeans"]
        r = plan_report(q.spark(spark, SF_DIR))
        assert r.num_sortmerge_joins == 0, r.text
        for cols in r.scan_columns():
            assert "label" not in cols


class TestTrainedIVF:
    def test_trained_ivf_matches_shape_and_ranks(self, spark):
        from optimus_any2any_spark.operators.clustering import (
            kmeans_centroids,
        )
        from optimus_any2any_spark.operators.similarity import (
            ivf_topk_with_centroids,
        )

        df = _blobs(spark)
        cent = kmeans_centroids(df, k=2, rounds=2)
        out = ivf_topk_with_centroids(df, cent, k=3, nprobe=1)
        rows = out.collect()
        assert rows and all(1 <= r.rank <= 3 for r in rows)
        # with nprobe=1 over two tight blobs, every neighbor stays in
        # the query's own blob
        for r in rows:
            same_blob = (r.vec_id < 20) == (r.neighbor_id < 20)
            assert same_blob, r

    def test_trained_ivf_plan_quantizer_broadcast_candidates_equi(
        self, spark
    ):
        q = all_queries()["ann_ivf_trained_topk"]
        r = plan_report(q.spark(spark, SF_DIR))
        # quantizer scoring is a condition-free broadcast of the k-row
        # centroid table; the cell-local candidate join is an EQUI-join
        # (sort-merge/hash is fine — it shuffles only cell-bounded
        # rows). A corpus-scale self-join would surface as a
        # CartesianProduct or a conditioned nested loop.
        assert "CartesianProduct" not in r.text, r.text
        assert "BroadcastNestedLoopJoin Inner" not in r.text, r.text


class TestSemDeDup:
    def test_near_duplicate_pair_prunes_farther_from_centroid(self, spark):
        from optimus_any2any_spark.operators.clustering import semdedup_trained

        # two blobs; inside blob one, vectors 0 and 1 are near-identical
        # (cos ~1) while the rest point off-axis enough to stay under
        # eps; the survivor of (0,1) must be the one with LOWER
        # centroid similarity (the paper keeps the outlier)
        rows = [(0, [10.0, 0.0]), (1, [10.0, 0.05])]
        for i in range(2, 8):
            rows.append((i, [10.0, float(i)]))
        for i in range(8, 16):
            rows.append((i, [0.1, 10.0 + i * 0.1]))
        df = spark.createDataFrame(
            rows, "vec_id int, embedding array<double>"
        )
        out = {
            r.vec_id: r
            for r in semdedup_trained(df, k=2, iterations=3, eps=0.999).collect()
        }
        assert len(out) == 16
        # pair (0,1): the member with LOWER centroid sim survives
        pair = [out[0], out[1]]
        assert sorted(p.keep for p in pair) == [False, True]
        kept = next(p for p in pair if p.keep)
        dropped = next(p for p in pair if not p.keep)
        assert kept.centroid_sim <= dropped.centroid_sim
        assert kept.dup_neighbors == 1 and dropped.dup_neighbors == 1
        # 2..7 point off-axis enough to stay under eps: no neighbors
        for i in range(2, 8):
            assert out[i].keep and out[i].dup_neighbors == 0
        # 8..15 are near-parallel: one all-duplicates group; centroid
        # sims tie at 1.0 so the smallest id survives the tie-break
        for i in range(8, 16):
            assert out[i].dup_neighbors == 7
            assert out[i].keep == (i == 8)

    def test_semdedup_partition_invariance(self, spark):
        from optimus_any2any_spark.operators.clustering import semdedup_trained

        df = _blobs(spark)
        a = sorted(semdedup_trained(df.repartition(1), k=2, iterations=2).collect())
        b = sorted(semdedup_trained(df.repartition(7), k=2, iterations=2).collect())
        assert a == b

    def test_semdedup_plan_cached_assignment_equi_pairwise(self, spark):
        # the assignment feeds three consumers: it must be read from
        # cache (one k-means execution, one corpus scan at runtime),
        # and the pairwise stage must be an EQUI-join on the cluster
        # key (AQE-splittable), never a cartesian over the corpus
        q = all_queries()["dedup_semantic_trained"]
        r = plan_report(q.spark(spark, SF_DIR))
        assert "InMemory" in r.text, r.text
        assert r.num_sortmerge_joins >= 1, r.text
        assert "CartesianProduct" not in r.text, r.text
        assert "Python" not in r.text, r.text
        spark.catalog.clearCache()
