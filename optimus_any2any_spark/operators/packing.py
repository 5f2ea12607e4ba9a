"""Sequence packing: lay documents end-to-end into fixed-size token
windows (the "concat-and-chunk" pretraining data layout).

Given a per-document token count and a deterministic document order,
every document gets its global token offset, the context-window id its
first token lands in, the offset within that window, and whether it
straddles a window boundary. Downstream a packer shuffles on
``chunk_id`` to materialize one training sequence per window.

Scale shape: the global running sum is a **two-phase distributed prefix
sum**, not a single-partition window. Documents are range-partitioned
by the order key; each partition computes a local cumulative sum
(a window partitioned by ``spark_partition_id()`` — Catalyst cannot
prove the pid distribution, so this costs one more linear hash
exchange); per-partition totals (one row per partition) are collected
and turned into exclusive offsets broadcast back as a literal map.
Two O(corpus) linear shuffles total, zero single-task bottlenecks —
vs. the naive global Window which serializes the corpus through one
task. Same machinery as the engine's exact ``record_index``
(metadata.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_global_cumsum(
    df: DataFrame,
    value_col: str,
    order_by: list[str],
    out_col: str = "cumsum",
) -> DataFrame:
    """Inclusive running sum of ``value_col`` over the total order
    ``order_by``, computed as a distributed two-phase prefix sum."""
    # no sortWithinPartitions here: the Window below sorts by
    # (__pid, order_by) itself, so a pre-sort would just be a second
    # local sort of the same data
    df = df.repartitionByRange(*order_by)
    marked = df.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__csum",
        F.sum(value_col).over(
            Window.partitionBy("__pid")
            .orderBy(*order_by)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    totals = {
        r["__pid"]: r["t"]
        for r in marked.groupBy("__pid")
        .agg(F.sum(value_col).alias("t"))
        .collect()
    }
    if not totals:
        return df.withColumn(out_col, F.lit(0).cast("long"))
    offsets: dict[int, int] = {}
    acc = 0
    for p in sorted(totals):
        offsets[p] = acc
        acc += totals[p] or 0
    mapping = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    return marked.withColumn(
        out_col, (F.col("__csum") + mapping[F.col("__pid")]).cast("long")
    ).drop("__pid", "__csum")


def pack_concat_chunks(
    df: DataFrame,
    token_col: str,
    window_tokens: int = 4096,
    order_by: list[str] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each document its place in the concat-and-chunk layout.

    Returns (id_col, n_tokens, global_offset, chunk_id,
    offset_in_chunk, spans_boundary): ``global_offset`` is the position
    of the document's first token in the concatenated corpus stream,
    ``chunk_id = global_offset // window_tokens``, and
    ``spans_boundary`` marks documents whose tokens cross into the next
    window (their tail belongs to chunk_id + 1...).
    """
    order = order_by or [id_col]
    out = with_global_cumsum(df, token_col, order, out_col="__gend")
    gstart = F.col("__gend") - F.col(token_col)
    return out.select(
        F.col(id_col),
        F.col(token_col).cast("long").alias("n_tokens"),
        gstart.cast("long").alias("global_offset"),
        F.floor(gstart / window_tokens).cast("long").alias("chunk_id"),
        (gstart % window_tokens).cast("long").alias("offset_in_chunk"),
        (
            (F.col(token_col) > 0)
            & (
                F.floor(gstart / window_tokens)
                != F.floor((F.col("__gend") - 1) / window_tokens)
            )
        ).alias("spans_boundary"),
    )


def pack_bins_nfd(
    df: DataFrame,
    id_col: str = "doc_id",
    ntok_col: str = "n_tokens",
    capacity: int = 512,
    n_chunks: int = 8,
) -> DataFrame:
    """Next-fit-decreasing bin packing for UNSPLITTABLE documents —
    the "example packing" layout (SFT/multipack): each bin is one
    context window, a document never straddles bins, and a document
    that does not fit the current bin's remaining space closes it.
    Decreasing order keeps big documents together so small ones fill
    the tail, the standard waste-reduction for greedy packers.

    Distributed shape: docs rank globally by (tokens DESC, id) via the
    shuffle-free offset rank (``metadata.with_record_index_and_total``
    — range partition + per-partition offsets, no global window), the
    rank splits into ``n_chunks`` contiguous ranges with closed-form
    boundaries (rank*P//N), and the inherently SEQUENTIAL next-fit
    scan runs per chunk inside one Arrow batch (``applyInPandas`` —
    state is two integers, never corpus-sized). Bins never cross
    chunks, so parallelism costs at most one partially-filled bin per
    chunk — waste bounded by P·capacity tokens corpus-wide, the
    explicit price of parallelizing a sequential packer. At 100 TB
    grow P with the cluster; determinism holds because chunk
    boundaries and the in-chunk scan order are exact functions of the
    rank.

    Oversize documents (tokens > capacity) get a bin of their own
    (fill > capacity — visible downstream, never silently truncated).

    Returns ``(id, n_tokens, rank, chunk, bin)`` where bin =
    chunk * 1_000_000 + local bin index.
    """
    from pyspark.sql import types as T

    from optimus_any2any_spark.metadata import with_record_index_and_total

    base = df.select(F.col(id_col).alias("id"), F.col(ntok_col).alias("n"))
    ranked, total = with_record_index_and_total(
        base, col="rank", order_by=[F.desc("n"), F.asc("id")]
    )
    if total == 0:
        return ranked.select(
            F.col("id"),
            F.col("n").cast("long").alias("n_tokens"),
            F.col("rank").cast("long"),
            F.lit(0).cast("int").alias("chunk"),
            F.lit(0).cast("long").alias("bin"),
        ).limit(0)
    ranked = ranked.withColumn(
        "chunk", (F.col("rank") * n_chunks / F.lit(total)).cast("int")
    )
    cap = capacity

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("rank", T.LongType()),
            T.StructField("chunk", T.IntegerType()),
            T.StructField("bin", T.LongType()),
        ]
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("rank")
        bins = []
        bin_local, fill = 0, 0
        for n in pdf["n"]:
            if fill > 0 and fill + n > cap:
                bin_local += 1
                fill = n
            else:
                fill += n
            bins.append(bin_local)
        chunk = int(pdf["chunk"].iloc[0])
        return pd.DataFrame(
            {
                "id": pdf["id"].astype("int64"),
                "n_tokens": pdf["n"].astype("int64"),
                "rank": pdf["rank"].astype("int64"),
                "chunk": chunk,
                "bin": [chunk * 1_000_000 + b for b in bins],
            }
        )

    return ranked.groupBy("chunk").applyInPandas(pack, schema=schema)
