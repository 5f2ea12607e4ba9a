"""Metadata-column conventions (the engine's "hidden columns").

The reference threads per-record metadata through the pipeline as
``__METADATA__*``-prefixed JSON keys (docs/rfc_007, rfc_009):
``record_index`` (internal/component/common/source.go:89),
``filename`` (ext/file/source.go:99), ``connector_batch_index``
(internal/component/common/connector.go:91), and strips the prefix at
sinks (internal/component/common/common.go:281). Here they are ordinary
DataFrame columns with the same reserved prefix.

Scale note: the reference's record_index is a single-process global
counter. The distributed equivalent used here is the two-pass
partition-offset pattern — per-partition positions plus an exclusive
prefix sum of partition counts — which is exact, stays JVM-side, and
never funnels data through one partition (unlike a global window).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

METADATA_PREFIX = "__METADATA__"

RECORD_INDEX = f"{METADATA_PREFIX}record_index"
FILENAME = f"{METADATA_PREFIX}filename"
BATCH_INDEX = f"{METADATA_PREFIX}connector_batch_index"
RECORD_TOTAL_COUNT = f"{METADATA_PREFIX}record_total_count"


def metadata_columns(df: DataFrame, prefix: str = METADATA_PREFIX) -> list[str]:
    return [c for c in df.columns if c.startswith(prefix)]


def data_columns(df: DataFrame, prefix: str = METADATA_PREFIX) -> list[str]:
    return [c for c in df.columns if not c.startswith(prefix)]


def strip_metadata(df: DataFrame, prefix: str = METADATA_PREFIX) -> DataFrame:
    """Drop all metadata columns (reference: RecordWithoutMetadata,
    internal/component/common/common.go:281)."""
    meta = metadata_columns(df, prefix)
    return df.drop(*meta) if meta else df


def add_metadata_prefix(df: DataFrame, prefix: str = METADATA_PREFIX) -> DataFrame:
    """Prefix every column (reference: RecordWithMetadata,
    internal/component/common/common.go:267-279 — used for MC pre-query
    'specialized metadata records', rfc_009)."""
    return df.toDF(*[c if c.startswith(prefix) else prefix + c for c in df.columns])


def with_filename(df: DataFrame, col: str = FILENAME) -> DataFrame:
    """Source-file column (reference: ext/file/source.go:99 et al.)."""
    return df.withColumn(col, F.input_file_name())


def with_record_index(
    df: DataFrame,
    col: str = RECORD_INDEX,
    order_by: list | None = None,
) -> DataFrame:
    """Global sequential row index, exact and distributed.

    With ``order_by``, indices follow that total order (requires a
    range-partitioning sort shuffle). Without it, indices follow the
    current partition order — the distributed analogue of the
    reference's arrival-order counter.
    """
    return with_record_index_and_total(df, col, order_by)[0]


def with_record_index_and_total(
    df: DataFrame,
    col: str = RECORD_INDEX,
    order_by: list | None = None,
) -> tuple[DataFrame, int]:
    """:func:`with_record_index` plus the exact total row count, free:
    the per-partition stats job this operator already runs to compute
    offsets knows the total, so rank-dependent operators (ntile-exact
    binning, LPT shard deals) get N without a second scan or a 1-row
    crossJoin. ``order_by`` entries may be column names or Column
    expressions (``F.desc(...)`` works)."""
    if order_by:
        df = df.repartitionByRange(*order_by).sortWithinPartitions(*order_by)
        # PIN the layout: repartitionByRange SAMPLES its boundaries per
        # execution, and this operator reads the layout twice (the
        # stats job below + the final plan). Without a checkpoint the
        # second execution can re-sample different boundaries, moving
        # rows across partitions after their offsets were computed —
        # duplicate/gapped indices (seen at sf0.1; sf0.01 was too small
        # to shift). localCheckpoint materializes the sorted layout
        # once; losing an executor then fails the job instead of
        # silently recomputing a DIFFERENT layout — for an index
        # operator, failing loudly beats wrong indices. The unordered
        # path keeps its zero-materialization plan (a deterministic
        # scan lineage reads identically twice).
        df = df.localCheckpoint(eager=False)
    # Shuffle-free position: monotonically_increasing_id puts the
    # partition id in the high bits and a CONSECUTIVE record number in
    # the low bits, so within a partition (mid - min(mid)) IS the row
    # position — no Window (which would hash-exchange every row on
    # __pid and sort it), no data shuffle at all. One tiny aggregate
    # job collects per-partition (count, min, max); the max-min+1 == n
    # check *verifies* consecutiveness and falls back to the sorted
    # Window path if a future Spark changes the id layout.
    marked = df.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__mid", F.monotonically_increasing_id()
    )
    stats = (
        marked.groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("__mid").alias("mn"),
            F.max("__mid").alias("mx"),
        )
        .collect()
    )
    if not stats:  # empty input: no offsets to compute
        return df.withColumn(col, F.lit(0).cast("long")), 0
    consecutive = all(r["mx"] - r["mn"] + 1 == r["n"] for r in stats)
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(stats, key=lambda r: r["__pid"]):
        offsets[r["__pid"]] = acc
        acc += r["n"]
    off_map = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    if consecutive:
        mins = {r["__pid"]: r["mn"] for r in stats}
        min_map = F.create_map(*[F.lit(x) for kv in mins.items() for x in kv])
        pos = F.col("__mid") - min_map[F.col("__pid")]
    else:  # pragma: no cover — defensive fallback
        pos = (
            F.row_number().over(
                Window.partitionBy("__pid").orderBy("__mid")
            )
            - 1
        )
    return (
        marked.withColumn(
            col, (pos + off_map[F.col("__pid")]).cast("long")
        ).drop("__pid", "__mid"),
        acc,
    )


def with_record_total_count(df: DataFrame, col: str = RECORD_TOTAL_COUNT) -> DataFrame:
    """Total-row-count metadata column (reference: MC source injects
    __METADATA__record_total_count, ext/maxcompute/client_reader.go:166).
    One count job, then a literal column — no per-row window."""
    total = df.count()
    return df.withColumn(col, F.lit(total).cast("long"))


def with_batch_index(
    df: DataFrame,
    batch_size: int = 512,
    col: str = BATCH_INDEX,
    index_col: str = RECORD_INDEX,
) -> DataFrame:
    """connector_batch_index = record_index / batch_size (reference:
    internal/component/common/connector.go:91; default size
    internal/config/config.go:20)."""
    if index_col not in df.columns:
        df = with_record_index(df, col=index_col)
    return df.withColumn(col, (F.col(index_col) / batch_size).cast("long"))


def is_specialized_metadata_filter(df: DataFrame, prefix: str = METADATA_PREFIX) -> Column:
    """Predicate: row is a 'specialized metadata record' — every
    non-null field is metadata (reference: IsSpecializedMetadataRecord,
    internal/component/common/common.go:261; docs/rfc_009). In columnar
    form: all data columns are null and ≥1 metadata column is set."""
    data = data_columns(df, prefix)
    meta = metadata_columns(df, prefix)
    cond = F.lit(True)
    for c in data:
        cond = cond & F.col(c).isNull()
    has_meta = F.lit(False)
    for c in meta:
        has_meta = has_meta | F.col(c).isNotNull()
    return cond & has_meta


def split_specialized_metadata(
    df: DataFrame, prefix: str = METADATA_PREFIX
) -> tuple[DataFrame, DataFrame]:
    """(data_records, specialized_metadata_records) — sinks consume the
    latter as configuration, never write them (reference:
    ext/file/sink.go:78-81 skip; connector forwards unbatched,
    internal/component/common/connector.go:79-88)."""
    pred = is_specialized_metadata_filter(df, prefix)
    return df.filter(~pred), df.filter(pred)
