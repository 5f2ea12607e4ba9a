"""Distributed k-means (Lloyd's) over embedding columns.

The IVF quantizer (:mod:`operators.similarity`) uses deterministic seed
centroids with NO refinement — good enough for cell routing, but a real
coarse quantizer (FAISS trains one with k-means) wants Lloyd rounds.
This module is that trainer, shaped for a 1000-executor cluster:

- **Assignment is map-only.** Centroids are a k-row table broadcast to
  every task; each vector scores k cosine similarities and keeps the
  argmax. No shuffle of the corpus, ever.
- **Recompute is a tree-aggregate.** The only shuffled data per round
  is k·dim partial-sum cells (``groupBy(cluster, pos)`` after a
  ``posexplode``) — index-scale, not corpus-scale. Map-side combine
  collapses each partition to at most k·dim rows before the exchange.
- **Determinism = engine portability.** Seeds are the k vectors with
  the smallest ``md5(id)`` (no RNG state); element means accumulate in
  DECIMAL(38,12) (exact, associative — partition count cannot change
  the result) and divide once in double; similarities round to 6
  decimals with cluster-index tie-breaks. The same rounds produce the
  same bytes in DuckDB, which is how the oracle gate verifies this
  genuinely iterative operator.

Reference scope note: the reference engine (goto/optimus-any2any) has
no ML trainer — this is part of the LLM-data-pipeline layer
(embedding-space clustering for SemDeDup-style curation, Abbas et al.
2023, arXiv:2303.09540 §3, which prescribes k-means as the bucketing
step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from optimus_any2any_spark.operators.similarity import _dot, _norm
from optimus_any2any_spark.operators.util import ensure_parallelism


def _seed_centroids(base: DataFrame, k: int) -> DataFrame:
    """k deterministic seed centroids: the vectors with the smallest
    md5(id), numbered 0..k-1 in that order. TakeOrderedAndProject picks
    them distributed; the k survivors are then numbered by
    ``posexplode(array_sort(collect_list(...)))`` — a k-row aggregate,
    no window at all. (A ``partitionBy(lit(0))`` window was tried
    first, but Catalyst constant-folds the literal partition key away
    and WindowExec still logs its single-partition warning.)
    """
    seeds = (
        base.withColumn("h", F.md5(F.col("id").cast("string").cast("binary")))
        .orderBy("h", "id")
        .limit(k)
    )
    packed = seeds.agg(
        F.array_sort(F.collect_list(F.struct("h", "id", "v"))).alias("a")
    )
    return packed.select(
        F.posexplode("a").alias("cluster", "s")
    ).select("cluster", F.col("s.v").alias("cv"))


def _with_norm(cent: DataFrame) -> DataFrame:
    return cent.select(
        "cluster", "cv", _norm(F.col("cv")).alias("cnrm")
    )


def _assign(base: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k-row centroid table,
    score cosine, keep the argmax (rounded sim + cluster tie-break)."""
    scored = base.crossJoin(F.broadcast(_with_norm(cent))).select(
        "id",
        "v",
        "nrm",
        "cluster",
        F.round(
            _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")), 6
        ).alias("sim"),
    )
    w = Window.partitionBy("id").orderBy(F.col("sim").desc(), F.col("cluster"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )


def _recompute(assigned: DataFrame) -> DataFrame:
    """New centroids = element-wise mean of each cluster's members.

    DECIMAL(38,12) partial sums make the mean independent of partition
    layout (IEEE double addition is not associative; decimal addition
    is); the single double division afterwards is deterministic. The
    shuffle moves only (cluster, pos) cells — k·dim rows after map-side
    combine.
    """
    cells = assigned.select("cluster", F.posexplode("v").alias("pos", "val"))
    sums = cells.groupBy("cluster", "pos").agg(
        F.sum(F.col("val").cast("decimal(38,12)")).alias("s"),
        F.count(F.lit(1)).alias("c"),
    )
    means = sums.select(
        "cluster",
        "pos",
        (F.col("s").cast("double") / F.col("c")).alias("mv"),
    )
    return means.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mv"))),
            lambda s: s["mv"],
        ).alias("cv")
    )


def kmeans_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
    keep_vector: bool = False,
) -> DataFrame:
    """Run ``iterations`` Lloyd rounds; return the final assignment as
    ``(vec_id, cluster, centroid_sim)`` — plus the normalized vector
    and its norm (``v``, ``nrm``) when ``keep_vector`` is set, for
    consumers that go on to compare cluster members pairwise
    (:func:`semdedup_trained`) without re-reading the corpus.

    A cluster that loses all members simply stops competing (its
    centroid row disappears from the recompute) — the deterministic
    analogue of FAISS's empty-cell handling, identical in the SQL
    oracle via plain inner-join semantics.
    """
    df = ensure_parallelism(df, F.col(id_col))
    base = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn("nrm", _norm(F.col("v")))
    cent = _seed_centroids(base, k)
    assigned = None
    for i in range(iterations):
        assigned = _assign(base, cent)
        if i + 1 < iterations:
            # k-row centroid tables: localCheckpoint would be overkill,
            # but cutting lineage keeps the broadcast plan flat
            cent = _recompute(assigned)
    cols = [
        F.col("id").alias(id_col),
        F.col("cluster").cast("int").alias("cluster"),
        F.col("sim").alias("centroid_sim"),
    ]
    if keep_vector:
        cols += [F.col("v"), F.col("nrm")]
    return assigned.select(*cols)


def semdedup_trained(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
    eps: float = 0.4,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 §3): semantic
    near-duplicate pruning in embedding space. Documents are bucketed
    by k-means, members of the same cluster are compared pairwise, and
    within every duplicate pair (cosine ≥ ``eps``) the member with the
    LOWER centroid similarity survives — the paper keeps the example
    farthest from the centroid to preserve diversity. The rule is
    applied per edge (a doc dies if ANY eps-neighbor beats it), the
    deterministic one-hop greedy the paper's released implementation
    uses; no transitive closure.

    Returns ``(id, cluster, centroid_sim, dup_neighbors, keep)`` for
    every input document.

    Scale shape (100 TB): the pairwise stage is an equi-join on the
    cluster id — the ONLY corpus-scale shuffle beyond the k-means
    rollups — so per-task work is bounded by max-cluster-size², the
    same O(|corpus|²/k) budget the paper pays; k is chosen ∝ corpus
    size (the paper uses 50k clusters for LAION-440M) precisely to
    bound it, and a skewed hot cluster is a JOIN, which AQE skew-split
    can divide (unlike a window). The survivor rule is per-edge, so
    the verdict rollup is a map-side-combinable ``groupBy(id)`` —
    no sort, no window, no driver collect.
    """
    # The assignment feeds THREE consumers (both sides of the pairwise
    # self-join plus the final verdict join). Without materialization,
    # Catalyst re-expands the whole k-means lineage per consumer —
    # observed: 15 corpus scans, 3x the Lloyd rounds. Persist
    # (MEMORY_AND_DISK) caps it at one.
    a = kmeans_assign(
        df, id_col, vec_col, k, iterations, keep_vector=True
    ).persist()
    x, y = a.alias("x"), a.alias("y")
    pairs = x.join(
        y,
        (F.col("x.cluster") == F.col("y.cluster"))
        & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
    ).select(
        F.col(f"x.{id_col}").alias("ia"),
        F.col(f"y.{id_col}").alias("ib"),
        F.col("x.centroid_sim").alias("sa"),
        F.col("y.centroid_sim").alias("sb"),
        F.round(
            _dot(F.col("x.v"), F.col("y.v"))
            / (F.col("x.nrm") * F.col("y.nrm")),
            6,
        ).alias("cos"),
    ).filter(F.col("cos") >= eps)
    edges = pairs.select(
        F.col("ia").alias("id"),
        F.col("ib").alias("nb_id"),
        F.col("sa").alias("my_sim"),
        F.col("sb").alias("nb_sim"),
    ).unionAll(
        pairs.select(
            F.col("ib").alias("id"),
            F.col("ia").alias("nb_id"),
            F.col("sb").alias("my_sim"),
            F.col("sa").alias("nb_sim"),
        )
    )
    verdicts = edges.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("dup_neighbors"),
        F.bool_or(
            (F.col("nb_sim") < F.col("my_sim"))
            | (
                (F.col("nb_sim") == F.col("my_sim"))
                & (F.col("nb_id") < F.col("id"))
            )
        ).alias("removed"),
    )
    return a.join(
        verdicts, a[id_col] == verdicts["id"], "left"
    ).select(
        a[id_col],
        "cluster",
        "centroid_sim",
        F.coalesce(F.col("dup_neighbors"), F.lit(0)).alias("dup_neighbors"),
        (~F.coalesce(F.col("removed"), F.lit(False))).alias("keep"),
    )


def kmeans_cluster_profile(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str | None = None,
    k: int = 8,
    iterations: int = 2,
) -> DataFrame:
    """Per-cluster corpus curation stats over the final assignment:
    size, mean/min centroid similarity (cluster tightness — SemDeDup
    prunes loose clusters first), and optionally majority label purity.

    One extra k-row aggregate on top of :func:`kmeans_assign` — the
    corpus is touched once.
    """
    # the assignment feeds the stats aggregate AND the majority-label
    # rollup — persist, or the Lloyd rounds run once per consumer
    assigned = kmeans_assign(df, id_col, vec_col, k, iterations).persist()
    if label_col is not None:
        assigned = assigned.join(
            df.select(F.col(id_col), F.col(label_col).alias("lbl")), id_col
        )
    aggs = [
        F.count(F.lit(1)).alias("size"),
        F.round(
            F.sum(F.col("centroid_sim").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_sim"),
        F.min("centroid_sim").alias("min_sim"),
    ]
    out = assigned.groupBy("cluster").agg(*aggs)
    if label_col is not None:
        # majority label per cluster: count per (cluster,label), pick
        # max with label tie-break — k·|labels| rows, trivially small
        lc = assigned.groupBy("cluster", "lbl").count()
        w = Window.partitionBy("cluster").orderBy(
            F.col("count").desc(), F.col("lbl")
        )
        top = lc.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") == 1
        ).select("cluster", F.col("lbl").alias("majority_label"),
                 F.col("count").alias("majority_count"))
        out = out.join(top, "cluster")
    return out


def kmeans_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    rounds: int = 1,
) -> DataFrame:
    """Train centroids only: ``rounds`` Lloyd refinements over the
    deterministic seeds, returning the k-row ``(cluster, cv)`` table.
    This is the trainer a real IVF coarse quantizer wants (FAISS trains
    its quantizer with exactly this loop) — feed the result to
    :func:`..similarity.ivf_topk_with_centroids`."""
    df = ensure_parallelism(df, F.col(id_col))
    base = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn("nrm", _norm(F.col("v")))
    cent = _seed_centroids(base, k)
    for _ in range(rounds):
        cent = _recompute(_assign(base, cent))
    return cent
