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
