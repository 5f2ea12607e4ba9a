"""File-level MERGE upsert committing the open Delta log protocol.

VERDICT r3 item 4's documented end state: the copy-on-write MERGE that
``manifest_table.py`` proves out against a hand-rolled JSON manifest,
re-targeted at a REAL table format — the Delta Lake transaction log
(delta.io protocol; no delta-spark jar exists in this environment, so
the commits are written directly, and ``sources/delta.py`` replays
them). The reference has no MERGE at all (its warehouse sink is
APPEND/REPLACE only, ext/maxcompute/sink.go:171), so this whole layer
is beyond-reference — SURVEY.md §7.

Protocol mapping (manifest concept → Delta action):

========================  =====================================
manifest ``files`` entry  ``add`` action with ``stats`` JSON
                          (numRecords/minValues/maxValues/
                          nullCount — Delta's data-skipping form)
superseded file           ``remove`` tombstone (kept in the log;
                          the file itself is garbage until VACUUM)
``batch_id`` idempotence  ``txn`` action (appId, version) — the
                          protocol's SetTransaction, exactly the
                          transactional-sink pattern real Delta
                          streaming writers use
manifest rewrite          one ``%020d.json`` commit, temp+rename
bounded replay            parquet checkpoint + ``_last_checkpoint``
                          every ``checkpoint_interval`` commits
==========================================================

MERGE(batch) — copy-on-write at FILE granularity, same algorithm as
``manifest_table.merge_batch``:

1. idempotence: if the log's ``txn`` state already covers
   (app_id, batch_id), return without touching anything;
2. reduce the batch to its latest row per key (ts tiebreak);
3. prune: parse each live ``add``'s stats and mark it *affected* only
   if a batch key can fall inside [minValues, maxValues] (exact
   membership when the distinct batch keys fit on the driver, range
   overlap otherwise). Files without usable stats are conservatively
   affected; files outside the footprint are neither read nor
   rewritten — their add actions simply stay live;
4. read ONLY affected files, null-safe anti-join on the batch keys,
   union the batch, range-repartition on the key and write new
   immutable files with fresh stats;
5. commit = one JSON log entry (txn + adds + removes) written to a
   temp name and renamed — the atomic step. A crash before the rename
   leaves orphan parquet files and an unchanged table; ``vacuum_delta``
   sweeps them.

At 100 TB: per-merge IO is proportional to the update FOOTPRINT, never
the table; checkpoints keep log replay O(files) instead of O(history);
stats-pruned reads (``read_delta(key_range=...)``) skip the same files
Delta's data skipping would. Single-writer per table path (a streaming
query IS single-writer); this local-fs implementation notes where a
real deployment swaps in the Hadoop FileSystem API (rename-atomicity
on object stores is the log store's problem, per the Delta paper
§3.2 — Armbrust et al., VLDB 2020).
"""

from __future__ import annotations

from optimus_any2any_spark.localrel import local_rows_df

import glob as _glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from optimus_any2any_spark.formats.footer_stats import (
    footer_file_stats,
    norm_float_zero,
    kind_of_spark_type,
)
from optimus_any2any_spark.sources.delta import _log_dir, replay_log
from optimus_any2any_spark.streaming.manifest_table import (
    _MAX_DRIVER_KEYS,
    _affected,
)

DEFAULT_APP_ID = "optimus-any2any-merge"


def _phys_of(meta: dict | None):
    """Logical→physical translation for column-mapped tables.

    Returns ``(phys, mapped, pfields)``: ``phys`` translates a
    top-level logical column name to the physical parquet name
    (identity on unmapped tables), ``mapped`` says whether the table
    declares ``delta.columnMapping.mode``, and ``pfields`` maps each
    logical top-level name to its full PHYSICAL StructField (physical
    names at every nesting level — None when unmapped). Writers run
    their INTERNAL algebra on logical names and translate only at the
    storage boundary: parquet reads/writes, add-action stats keys, and
    partitionValues keys are physical; everything else (windows,
    joins, CDF schemas as the reader surfaces them) stays logical.
    Struct casts are positional in Spark, so one cast per column
    renames all nesting levels in either direction."""
    from optimus_any2any_spark.sources.delta import (
        column_mapping,
        physical_fields,
    )

    cmap = column_mapping(meta) if meta else None
    if not cmap:
        return (lambda c: c), False, None
    return (lambda c: cmap.get(c, c)), True, physical_fields(meta)


def _phys_schema(schema: T.StructType, pfields) -> T.StructType:
    return T.StructType([pfields[f.name] for f in schema.fields])


def _mint_mapped_field(fjson: dict, next_id: list[int]) -> dict:
    """A Spark field-JSON with fresh ``delta.columnMapping.id`` /
    ``physicalName: col-<uuid>`` metadata minted at EVERY nesting
    level — the metadata delta-spark stamps on a mergeSchema-added
    column of a mapped table. ``next_id`` is a one-cell counter so
    nested struct fields consume consecutive ids."""
    import uuid

    def walk_type(t):
        if isinstance(t, dict):
            k = t.get("type")
            if k == "struct":
                return {
                    "type": "struct",
                    "fields": [walk_field(f) for f in t["fields"]],
                }
            if k == "array":
                return {**t, "elementType": walk_type(t["elementType"])}
            if k == "map":
                return {
                    **t,
                    "keyType": walk_type(t["keyType"]),
                    "valueType": walk_type(t["valueType"]),
                }
        return t

    def walk_field(f):
        # the field's own id is assigned BEFORE descending into its
        # type (nested struct fields consume the ids after it)
        next_id[0] += 1
        fid = next_id[0]
        return {
            **f,
            "type": walk_type(f["type"]),
            "metadata": {
                **(f.get("metadata") or {}),
                "delta.columnMapping.id": fid,
                "delta.columnMapping.physicalName": f"col-{uuid.uuid4()}",
            },
        }

    return walk_field(fjson)


def _evolve_mapped_meta(
    meta: dict, new_fields: list[T.StructField]
) -> dict:
    """The evolved metaData action for appending ``new_fields`` to a
    column-mapped table: each new column (and every nested struct
    field inside it) gets a fresh column id above
    ``delta.columnMapping.maxColumnId`` and a ``col-<uuid>`` physical
    name, and the configuration's maxColumnId advances — the
    bookkeeping real delta-spark performs on mergeSchema over a
    mapped table (Delta PROTOCOL.md §Column Mapping: writers must
    never reuse ids, so the counter only moves forward). Existing
    fields keep their metadata untouched; replay picks the LAST
    metaData, so time travel to older versions keeps the old schema."""
    sjson = json.loads(meta["schemaString"])
    conf = dict(meta.get("configuration") or {})
    declared = conf.get("delta.columnMapping.maxColumnId")

    def max_id(t, cur):
        if isinstance(t, dict):
            if t.get("type") == "struct":
                for f in t["fields"]:
                    md = f.get("metadata") or {}
                    cur = max(cur, int(md.get("delta.columnMapping.id", 0)))
                    cur = max_id(f["type"], cur)
            elif t.get("type") == "array":
                cur = max_id(t["elementType"], cur)
            elif t.get("type") == "map":
                cur = max_id(t["keyType"], cur)
                cur = max_id(t["valueType"], cur)
        return cur

    next_id = [max(int(declared or 0), max_id(sjson, 0))]
    minted = [
        _mint_mapped_field(f.jsonValue(), next_id) for f in new_fields
    ]
    conf["delta.columnMapping.maxColumnId"] = str(next_id[0])
    out = dict(meta)
    out["schemaString"] = json.dumps(
        {"type": "struct", "fields": sjson["fields"] + minted}
    )
    out["configuration"] = conf
    return out


def _to_phys(
    df: DataFrame, cols: list[str], pfields, keep=()
) -> DataFrame:
    """Cast logical columns to their physical fields (names at every
    nesting level — the storage boundary before a parquet write);
    ``keep`` columns pass through."""
    return df.select(
        *[
            F.col("`" + c + "`")
            .cast(pfields[c].dataType)
            .alias(pfields[c].name)
            for c in cols
        ],
        *[F.col(k) for k in keep],
    )


def _file_token(table_path: str) -> str:
    """8-hex table-unique fragment in new data-file names: keeps a
    SHALLOW CLONE's writes from ever colliding with the source's
    (absolute-path) file basenames — the readers' DV anti-joins and
    pid-routing joins key files by basename, and their collision
    guards would otherwise refuse the first post-clone rewrite."""
    import uuid

    return uuid.uuid5(uuid.NAMESPACE_URL, table_path).hex[:8]


def _read_files_dv_aware(
    spark: SparkSession,
    table_path: str,
    data_schema: T.StructType,
    paths: list[str],
    live: dict[str, dict],
    basename_col: str | None = None,
    pfields=None,
    row_tracking: tuple | None = None,
) -> DataFrame:
    """Read the given live files with each file's deletion-vector rows
    DROPPED — the read half of copy-on-write over a merge-on-read
    table. A live add carrying a DV means the raw parquet rows are not
    all live; rewriting from raw parquet would resurrect the deleted
    rows, so every CoW writer (merge / delete / optimize) reads
    through this. The vectors decode on executors (one Arrow-batched
    anti-join total, the same plan as ``read_delta``); plain tables
    take the schema'd parquet scan untouched. ``basename_col`` names
    an extra column carrying each row's source-file basename (for the
    callers' pid routing joins).

    ``row_tracking=(rid_phys, rcv_phys)`` (the table's materialized
    column names) appends ``__rt_id`` / ``__rt_cv``: each row's stable
    row id and commit version, ``coalesce(materialized column,
    add.baseRowId + position)`` / ``coalesce(..., add.
    defaultRowCommitVersion)`` per PROTOCOL.md Row Tracking — one
    broadcast over the file lookup, zero extra jobs."""
    from optimus_any2any_spark.sources.delta import (
        _dv_descriptor_rows,
        dv_positions_df,
    )

    read_schema = (
        _phys_schema(data_schema, pfields) if pfields is not None
        else data_schema
    )
    if row_tracking is not None:
        rid, rcv = row_tracking
        # files REWRITTEN under row tracking carry the materialized
        # columns; fresh appends do not and read them as null (Spark
        # null-fills requested columns absent from a parquet file)
        read_schema = T.StructType(
            list(read_schema.fields)
            + [
                T.StructField(rid, T.LongType(), True),
                T.StructField(rcv, T.LongType(), True),
            ]
        )
    df = spark.read.schema(read_schema).parquet(
        *[os.path.join(table_path, p) for p in paths]
    )
    if pfields is not None:
        # mapped tables: parquet carries physical names (all nesting
        # levels) — cast back to the logical schema the caller's
        # algebra runs on. Row-tracking materialized columns are NOT
        # part of the logical schema, so column mapping never applies
        # to them: their configured names ARE the parquet names, and
        # they pass through the logical re-select verbatim.
        df = df.select(
            *[
                F.col("`" + pfields[f.name].name + "`")
                .cast(f.dataType)
                .alias(f.name)
                for f in data_schema.fields
            ],
            *(
                [
                    F.col("`" + row_tracking[0] + "`"),
                    F.col("`" + row_tracking[1] + "`"),
                ]
                if row_tracking is not None
                else []
            ),
            F.col("_metadata").alias("_metadata"),
        )
    bn = F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1)
    dv_sub = {p: live[p] for p in paths if live[p].get("deletionVector")}
    if row_tracking is not None:
        rid, rcv = row_tracking
        # basename + position captured ONCE, before any join
        df = df.select(
            "*",
            bn.alias("__dv_bn"),
            F.col("_metadata.row_index").alias("__dv_pos"),
        )
        if pfields is not None:
            # the mapped re-select materialized _metadata as a plain
            # struct column — drop it now that bn/pos are captured
            df = df.drop("_metadata")
        rt_rows = []
        for p in paths:
            a = live[p]
            if (
                a.get("baseRowId") is None
                or a.get("defaultRowCommitVersion") is None
            ):
                raise NotImplementedError(
                    "delta row tracking: live file "
                    f"{p!r} carries no baseRowId — backfill of "
                    "pre-enablement files is beyond this writer"
                )
            rt_rows.append(
                (
                    p.rsplit("/", 1)[-1],
                    int(a["baseRowId"]),
                    int(a["defaultRowCommitVersion"]),
                )
            )
        lk = local_rows_df(spark, 
            rt_rows, "__dv_bn string, __rt_base long, __rt_dcv long"
        )
        df = (
            df.join(F.broadcast(lk), "__dv_bn", "inner")
            .withColumn(
                "__rt_id",
                F.coalesce(
                    F.col("`" + rid + "`"),
                    F.col("__rt_base") + F.col("__dv_pos"),
                ),
            )
            .withColumn(
                "__rt_cv",
                F.coalesce(
                    F.col("`" + rcv + "`"), F.col("__rt_dcv")
                ),
            )
            .drop(rid, rcv, "__rt_base", "__rt_dcv")
        )
        if dv_sub:
            deleted = dv_positions_df(
                spark,
                _dv_descriptor_rows(
                    table_path, {p: live[p] for p in paths}
                ),
            )
            df = df.join(
                deleted, ["__dv_bn", "__dv_pos"], "left_anti"
            )
        df = df.drop("__dv_pos")
        if basename_col:
            return df.withColumnRenamed("__dv_bn", basename_col)
        return df.drop("__dv_bn")
    if not dv_sub:
        if basename_col:
            df = df.select("*", bn.alias(basename_col))
        return df.drop("_metadata") if pfields is not None else df
    # the basename must be captured BEFORE the anti-join —
    # input_file_name()/metadata columns are unreliable once the rows
    # have crossed an exchange
    df = df.select(
        "*",
        bn.alias("__dv_bn"),
        F.col("_metadata.row_index").alias("__dv_pos"),
    )
    if pfields is not None:
        df = df.drop("_metadata")
    # guard over the FULL read set (not just the DV'd subset): the
    # helper only emits rows for DV-carrying adds, but its basename-
    # collision check must span every file in this read — a DV'd file
    # and a plain file sharing a basename would cross-apply deletions
    deleted = dv_positions_df(
        spark,
        _dv_descriptor_rows(table_path, {p: live[p] for p in paths}),
    )
    df = df.join(deleted, ["__dv_bn", "__dv_pos"], "left_anti").drop(
        "__dv_pos"
    )
    if basename_col:
        return df.withColumnRenamed("__dv_bn", basename_col)
    return df.drop("__dv_bn")


def _row_tracking_of(meta: dict | None) -> tuple[str, str] | None:
    """The table's materialized row-tracking column names
    ``(rowId, rowCommitVersion)``, or None when row tracking is off
    (PROTOCOL.md Row Tracking; delta-spark stores the physical names
    in the table configuration at enablement)."""
    if not meta:
        return None
    conf = meta.get("configuration") or {}
    if (conf.get("delta.enableRowTracking") or "").lower() != "true":
        return None
    rid = conf.get("delta.rowTracking.materializedRowIdColumnName")
    rcv = conf.get(
        "delta.rowTracking.materializedRowCommitVersionColumnName"
    )
    if not rid or not rcv:
        raise NotImplementedError(
            "delta row tracking: enabled without materialized column "
            "names in the table configuration — beyond this writer"
        )
    return rid, rcv


def _rt_high_watermark(state: dict) -> int:
    """The row-id high watermark from the ``delta.rowTracking``
    domain metadata (-1 on a fresh table)."""
    cfg = (state.get("domains") or {}).get("delta.rowTracking")
    if cfg is None:
        raise ValueError(
            "delta row tracking: enabled table without the "
            "delta.rowTracking domain metadata — corrupt enablement"
        )
    return int(json.loads(cfg)["rowIdHighWaterMark"])


def _rt_domain_action(hwm: int) -> dict:
    return {
        "domainMetadata": {
            "domain": "delta.rowTracking",
            "configuration": json.dumps({"rowIdHighWaterMark": hwm}),
            "removed": False,
        }
    }


# Writer-feature sets implied by the legacy (pre-table-features)
# protocol versions — when a protocol upgrades to reader 3 / writer 7,
# the spec requires every feature the OLD version numbers implied to be
# listed explicitly, or external writers silently stop enforcing them.
_LEGACY_WRITER_FEATURES = {
    2: ["appendOnly", "invariants"],
    3: ["checkConstraints"],
    4: ["changeDataFeed", "generatedColumns"],
    5: ["columnMapping"],
    6: ["identityColumns"],
}
_LEGACY_READER_FEATURES = {2: ["columnMapping"]}


def _merged_protocol(
    existing: dict | None,
    reader_features: list[str],
    writer_features: list[str],
) -> dict | None:
    """The protocol action for a commit that needs ``reader_features``/
    ``writer_features``: existing versions are raised (never lowered)
    to 3/7, existing features — including those IMPLIED by legacy
    version numbers — are unioned in, and ``None`` means the table's
    protocol already covers the need (emit nothing). Overwriting with
    a fixed protocol would silently drop features like timestampNtz or
    v2Checkpoint that another writer had declared."""
    existing = existing or {"minReaderVersion": 1, "minWriterVersion": 2}
    old_r = int(existing.get("minReaderVersion", 1))
    old_w = int(existing.get("minWriterVersion", 2))
    r_feats = set(existing.get("readerFeatures") or [])
    w_feats = set(existing.get("writerFeatures") or [])
    if old_r < 3:
        for v, feats in _LEGACY_READER_FEATURES.items():
            if old_r >= v:
                r_feats.update(feats)
    if old_w < 7:
        for v, feats in _LEGACY_WRITER_FEATURES.items():
            if old_w >= v:
                w_feats.update(feats)
    new_r_feats = r_feats | set(reader_features)
    new_w_feats = w_feats | set(writer_features)
    new = {
        "minReaderVersion": max(old_r, 3),
        "minWriterVersion": max(old_w, 7),
        "readerFeatures": sorted(new_r_feats),
        "writerFeatures": sorted(new_w_feats),
    }
    unchanged = (
        old_r == new["minReaderVersion"]
        and old_w == new["minWriterVersion"]
        and set(existing.get("readerFeatures") or []) == new_r_feats
        and set(existing.get("writerFeatures") or []) == new_w_feats
    )
    return None if unchanged else new


def _check_append_only(meta: dict | None, verb: str) -> None:
    """``delta.appendOnly=true`` (the appendOnly writer feature):
    writers may only ADD data — a data-changing remove (delete, DV
    delete, merge rewriting affected files) violates the table's own
    contract and must refuse. ``dataChange: false`` rewrites
    (OPTIMIZE, PURGE) stay allowed, as in delta-spark."""
    if meta is None:
        return
    if (meta.get("configuration") or {}).get(
        "delta.appendOnly"
    ) == "true":
        raise ValueError(
            f"delta {verb}: table is appendOnly "
            "(delta.appendOnly=true) — data-changing removes are "
            "forbidden by the table's own configuration"
        )


def _remove_action(path: str, add: dict, data_change: bool) -> dict:
    """The remove tombstone for a live add — carrying the add's
    deletionVector descriptor when it has one, because Delta
    reconciliation keys file actions by (path, DV uniqueId): a bare
    path-only remove does NOT cancel a DV-carrying add, and external
    readers would keep both versions live (duplicate/resurrected
    rows)."""
    rm: dict = {
        "path": path,
        "deletionTimestamp": 0,
        "dataChange": data_change,
    }
    if add.get("deletionVector"):
        rm["deletionVector"] = add["deletionVector"]
        rm["extendedFileMetadata"] = True
        if add.get("partitionValues") is not None:
            rm["partitionValues"] = add["partitionValues"]
        if add.get("size") is not None:
            rm["size"] = add["size"]
    return rm


def _entry_from_add(path: str, add: dict, key_col: str) -> dict:
    """Map a Delta add action to the manifest-table pruning entry shape
    so ``_affected`` (the shared file-pruning rule) applies verbatim."""
    raw = add.get("stats")
    try:
        st = json.loads(raw) if isinstance(raw, str) else (raw or {})
    except ValueError:
        st = {}
    n = st.get("numRecords")
    fmin = (st.get("minValues") or {}).get(key_col)
    fmax = (st.get("maxValues") or {}).get(key_col)
    nulls = (st.get("nullCount") or {}).get(key_col)

    def _scalar(x):
        return isinstance(x, (str, int, float)) and not isinstance(x, bool)

    has_stats = n is not None
    # a key absent from minValues proves "all null" ONLY when the
    # nullCount says so explicitly — stats written by another writer
    # (or an OPTIMIZE that indexed different columns) may simply not
    # cover the key, and treating that as prunable silently skips
    # live rows on the next merge/delete
    all_null = (
        has_stats and nulls is not None and int(nulls) == int(n)
    )
    prunable = has_stats and (
        (fmin is None and fmax is None and all_null)
        or (_scalar(fmin) and _scalar(fmax))
    )
    return {
        "path": path,
        "rows": int(n) if has_stats else -1,  # -1 ⇒ never the rows==0 skip
        "min_key": fmin,
        "max_key": fmax,
        "has_null_key": bool(nulls and int(nulls) > 0),
        "prunable": prunable,
    }


def _stats_json(rows: int, key_col: str, kmin, kmax, n_null: int) -> str:
    st: dict = {"numRecords": rows, "minValues": {}, "maxValues": {},
                "nullCount": {key_col: n_null}}
    if kmin is not None:
        st["minValues"][key_col] = kmin
        st["maxValues"][key_col] = kmax
    return json.dumps(st, default=str)


_MAX_STAT_COLS = 8  # real Delta records the first 32; 8 keeps the
#                     footer scan cheap while covering typical filters


def _collect_file_stats(
    spark: SparkSession,
    table_path: str,
    new_rel: list[str],
    key_col: str,
    data_schema: T.StructType,
    lead_cols: list[str] | None = None,
) -> dict[str, dict]:
    """Per-file stats for the merge key PLUS the leading data columns
    (capped) — Delta's per-column minValues/maxValues/nullCount, which
    is what makes ``read_delta(key_range=...)`` skip files on ANY
    recorded column, not just the merge key.

    Fast path: parquet FOOTER statistics via pyarrow, driver-side —
    zero data I/O over files this commit just wrote (re-reading every
    byte of merge output for stats would double write-path I/O at
    100 TB merge throughput). Falls back to one grouped Spark
    aggregate whenever any footer value is not provably identical
    (``formats/footer_stats.py`` documents the exactness contract)."""
    orderable = (
        T.NumericType, T.StringType, T.DateType, T.TimestampType,
        T.TimestampNTZType, T.BooleanType,
    )
    # lead_cols (the ZORDER BY set) jump the cap queue: z-ordering a
    # column is useless unless its min/max are recorded per file
    lead = [key_col] + [
        c for c in (lead_cols or []) if c != key_col
    ]
    stat_cols = lead + [
        f.name
        for f in data_schema.fields
        if f.name not in lead and isinstance(f.dataType, orderable)
    ][: max(0, _MAX_STAT_COLS - len(lead))]
    type_of = {f.name: f.dataType for f in data_schema.fields}
    ft = footer_file_stats(
        [os.path.join(table_path, r) for r in new_rel],
        stat_cols,
        {c: kind_of_spark_type(type_of[c]) for c in stat_cols if c in type_of}
        if all(c in type_of for c in stat_cols)
        else {},
        session_tz=spark.conf.get("spark.sql.session.timeZone", "UTC"),
    )
    if ft is not None:
        return {
            name: {
                "numRecords": s["rows"],
                "minValues": s["min"],
                "maxValues": s["max"],
                "nullCount": s["nulls"],
            }
            for name, s in ft.items()
        }
    aggs = [F.count(F.lit(1)).alias("rows")]
    for c in stat_cols:
        aggs += [
            F.min(c).alias(f"__mn_{c}"),
            F.max(c).alias(f"__mx_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
        ]
    per_file = (
        # explicit schema: the files were written with data_schema this
        # commit — inferring it back costs one extra footer-reading job
        # per fallback trigger
        spark.read.schema(data_schema)
        .parquet(*[os.path.join(table_path, r) for r in new_rel])
        .select(*stat_cols)
        .withColumn("__f", F.input_file_name())
        .groupBy("__f")
        .agg(*aggs)
        .collect()
    )
    out: dict[str, dict] = {}
    for r in per_file:
        st: dict = {
            "numRecords": int(r["rows"]),
            "minValues": {},
            "maxValues": {},
            "nullCount": {},
        }
        for c in stat_cols:
            mn, mx = (
                norm_float_zero(r[f"__mn_{c}"]),
                norm_float_zero(r[f"__mx_{c}"]),
            )
            if mn is not None:
                st["minValues"][c] = mn
                st["maxValues"][c] = mx
            st["nullCount"][c] = int(r[f"__nn_{c}"])
        out[r["__f"].rsplit("/", 1)[-1]] = st
    return out


def _posix_put_if_absent(tmp: str, final: str) -> bool:
    """POSIX put-if-absent: hard-link ``tmp`` to ``final``; returns
    False when ``final`` already exists (the loser of a race).
    ``os.link`` (not rename) is the primitive — it FAILS if the target
    exists, so two writers racing for the same version cannot both
    win (the Delta paper's mutual-exclusion requirement on the log
    store; rename-with-overwrite would silently drop one commit)."""
    try:
        os.link(tmp, final)
        return True
    except FileExistsError:
        return False


# The log-store seam (Delta paper §3.2): local/NFS deployments use the
# POSIX hard-link; an object-store deployment swaps in a conditional
# PUT (S3 If-None-Match, GCS x-goog-if-generation-match: 0, ABFS ETag)
# via set_log_store(). The contract: atomically create ``final`` with
# ``tmp``'s bytes IFF it does not exist, returning the win/lose bool.
_put_if_absent = _posix_put_if_absent


def set_log_store(put_if_absent) -> None:
    """Inject the commit primitive (object-store conditional-PUT or a
    test double). Pass ``None`` to restore the POSIX default."""
    global _put_if_absent
    _put_if_absent = put_if_absent or _posix_put_if_absent


# The data-store seam: every DATA byte this module publishes under the
# table root — parquet data files, deletion-vector ``.bin`` blobs, cdc
# files — goes through ONE injectable primitive: "upload local ``src``
# to ``dst``". Data names are writer-unique (version + sequence or a
# uuid), so no conditional PUT is needed: a file only becomes live
# when the log commit referencing it wins, which is the log store's
# job. Object-store deployments swap in their uploader via
# set_data_store(); the POSIX default is an atomic rename.
def _posix_put_data(src: str, dst: str) -> None:
    os.replace(src, dst)


_put_data = _posix_put_data


def set_data_store(put_data) -> None:
    """Inject the data-file publisher (object-store upload or a test
    double); ``put_data(src_local_path, dst_path)`` must make ``dst``
    readable with ``src``'s bytes (and may remove ``src``). Pass
    ``None`` to restore the POSIX rename."""
    global _put_data
    _put_data = put_data or _posix_put_data


def _commit(
    log: str,
    version: int,
    actions: list[dict],
    operation: str | None = None,
    operation_params: dict | None = None,
) -> None:
    """The atomic step: put-if-absent of one JSON log entry. The temp
    name is writer-unique (pid + a random suffix) — a shared name like
    ``final + '.tmp'`` would let the LOSER of a version race reopen
    and truncate the very inode the winner just committed.

    ``operation`` prepends a ``commitInfo`` action (the protocol's
    provenance record, what DESCRIBE HISTORY surfaces): the operation
    name, delta-spark-shaped operationParameters, a wall-clock
    timestamp, and the engine tag."""
    import time as _time
    import uuid

    os.makedirs(log, exist_ok=True)
    final = os.path.join(log, "%020d.json" % version)
    tmp = f"{final}.{os.getpid()}-{uuid.uuid4().hex[:8]}.tmp"
    if operation is not None:
        actions = [
            {
                "commitInfo": {
                    "timestamp": int(_time.time() * 1000),
                    "operation": operation,
                    "operationParameters": operation_params or {},
                    "engineInfo": "optimus-any2any-spark",
                }
            }
        ] + list(actions)
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a, default=str) + "\n")
    try:
        if not _put_if_absent(tmp, final):
            raise IOError(
                f"delta: commit {version} already exists — lost the "
                "race to a concurrent writer; replay the log and retry"
            )
    finally:
        os.unlink(tmp)


def _write_checkpoint(
    spark: SparkSession,
    table_path: str,
    version: int,
    max_actions_per_part: int = 100_000,
) -> None:
    """Materialize the snapshot as a parquet checkpoint so future
    replays read one parquet file + the JSON tail, not all history.
    Past ``max_actions_per_part`` actions the checkpoint splits into
    the protocol's multi-part form
    (``%020d.checkpoint.%010d.%010d.parquet`` + ``parts`` in
    ``_last_checkpoint``) — a million-file table cannot round-trip one
    giant driver-side parquet, and the reader already handles parts.
    Single-writer note: tombstones already applied to the live set are
    dropped (real Delta retains them for VACUUM retention windows;
    ``vacuum_delta`` here works from the live set directly)."""
    state = replay_log(spark, table_path)
    rows = [
        json.dumps({"protocol": state.get("protocol")
                    or {"minReaderVersion": 1, "minWriterVersion": 2}}),
        json.dumps({"metaData": state["meta"]}, default=str),
    ]
    rows += [
        json.dumps({"txn": {"appId": a, "version": v}})
        for a, v in sorted(state["txns"].items())
    ]
    rows += [
        # domain metadata survives checkpoints (row tracking keeps
        # its high watermark here — dropping it would reset row ids)
        json.dumps(
            {
                "domainMetadata": {
                    "domain": d,
                    "configuration": cfg,
                    "removed": False,
                }
            }
        )
        for d, cfg in sorted((state.get("domains") or {}).items())
    ]
    rows += [
        json.dumps({"add": add}, default=str)
        for _, add in sorted(state["live"].items())
    ]
    log = _log_dir(table_path)
    n_parts = max(1, -(-len(rows) // max_actions_per_part))
    chunk = -(-len(rows) // n_parts)
    # one schema inferred over ALL actions, shared by every part — a
    # per-part inference would give parts disjoint schemas (protocol/
    # metaData rows vs add rows) and a parts read drops the columns
    # missing from the first file
    full_schema = spark.read.json(
        spark.sparkContext.parallelize(rows, 1)
    ).schema
    for i in range(n_parts):
        part_rows = rows[i * chunk:(i + 1) * chunk]
        cp_df = spark.read.schema(full_schema).json(
            spark.sparkContext.parallelize(part_rows, 1)
        )
        if n_parts == 1:
            cp_path = os.path.join(
                log, "%020d.checkpoint.parquet" % version
            )
        else:
            cp_path = os.path.join(
                log,
                "%020d.checkpoint.%010d.%010d.parquet"
                % (version, i + 1, n_parts),
            )
        tmp = cp_path + ".d"
        cp_df.coalesce(1).write.mode("overwrite").parquet(tmp)
        _put_data(
            _glob.glob(os.path.join(tmp, "part-*.parquet"))[0], cp_path
        )
        shutil.rmtree(tmp)
    last = os.path.join(log, "_last_checkpoint")
    tmp_last = last + ".tmp"
    meta = {"version": version, "size": len(rows)}
    if n_parts > 1:
        meta["parts"] = n_parts
    with open(tmp_last, "w") as f:
        f.write(json.dumps(meta))
    # _last_checkpoint is an OVERWRITE pointer (the spec's one
    # non-conditional log write) — published through the data seam
    _put_data(tmp_last, last)


def create_delta_table(
    spark: SparkSession,
    table_path: str,
    schema_ddl: str,
    partition_by: list[str] | None = None,
    generated: dict[str, str] | None = None,
    identity: dict[str, dict] | None = None,
    configuration: dict[str, str] | None = None,
    row_tracking: bool = False,
) -> int:
    """CREATE TABLE as a data-free commit 0 (protocol + metaData
    only) — the surface that lets a table declare GENERATED columns
    (``generated={col: sql_expr}`` records
    ``delta.generationExpression`` in the field metadata and stamps
    legacy ``minWriterVersion`` 4, the generatedColumns writer
    feature) or arbitrary configuration (``delta.appendOnly``,
    ``delta.constraints.*``, CDF) before the first data arrives.
    Subsequent merges/appends COMPUTE absent generated columns from
    their expressions and refuse provided values that diverge
    (``apply_generated_columns``); partitioning a table on a generated
    date column is the classic shape — writers then get partition
    pruning for free without trusting the producer to send the
    column."""
    import uuid

    if os.path.isdir(_log_dir(table_path)):
        raise ValueError(
            f"delta create: table already exists at {table_path}"
        )
    schema = T.StructType.fromDDL(schema_ddl)
    generated = generated or {}
    identity = identity or {}
    missing = [
        c
        for c in list(generated) + list(identity)
        if c not in schema.fieldNames()
    ]
    if missing:
        raise ValueError(
            f"delta create: generated/identity columns {missing} not "
            "in schema"
        )
    both = set(generated) & set(identity)
    if both:
        raise ValueError(
            f"delta create: columns {sorted(both)} cannot be both "
            "generated and identity"
        )
    for c in identity:
        if not isinstance(schema[c].dataType, T.LongType):
            raise ValueError(
                f"delta create: identity column {c!r} must be BIGINT "
                "(delta-spark restriction)"
            )
    fields = []
    for f in schema.fields:
        d = f.jsonValue()
        if f.name in generated:
            md = dict(d.get("metadata") or {})
            md["delta.generationExpression"] = generated[f.name]
            d["metadata"] = md
        if f.name in identity:
            spec = identity[f.name]
            md = dict(d.get("metadata") or {})
            md["delta.identity.start"] = int(spec.get("start", 1))
            md["delta.identity.step"] = int(spec.get("step", 1))
            md["delta.identity.allowExplicitInsert"] = bool(
                spec.get("allow_explicit", False)
            )
            d["metadata"] = md
        fields.append(d)
    schema_json = json.dumps({"type": "struct", "fields": fields})
    part_cols = list(partition_by or [])
    bad = [c for c in part_cols if c not in schema.fieldNames()]
    if bad:
        raise ValueError(
            f"delta create: partition columns {bad} not in schema"
        )
    conf = dict(configuration or {})
    protocol: dict = {
        "minReaderVersion": 1,
        # legacy writer-version ladder: 6 implies
        # identityColumns, 4 implies generatedColumns
        "minWriterVersion": (
            6 if identity else 4 if generated else 2
        ),
    }
    actions: list[dict] = []
    if row_tracking:
        # ROW TRACKING (PROTOCOL.md "Row Tracking"): writer feature +
        # domainMetadata support; fresh row ids derive from
        # add.baseRowId + position, stable ids from the MATERIALIZED
        # columns rewrites carry (their PHYSICAL parquet names live in
        # the table configuration, delta-spark's shape); the high
        # watermark rides the delta.rowTracking domain
        protocol = {
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": sorted(
                {"rowTracking", "domainMetadata"}
                | ({"identityColumns"} if identity else set())
                | ({"generatedColumns"} if generated else set())
            ),
        }
        conf["delta.enableRowTracking"] = "true"
        suffix = str(
            uuid.uuid5(uuid.NAMESPACE_URL, f"{table_path}|rowid")
        )
        conf["delta.rowTracking.materializedRowIdColumnName"] = (
            f"_row-id-col-{suffix}"
        )
        conf[
            "delta.rowTracking.materializedRowCommitVersionColumnName"
        ] = f"_row-commit-version-col-{suffix}"
        actions.append(
            {
                "domainMetadata": {
                    "domain": "delta.rowTracking",
                    "configuration": json.dumps(
                        {"rowIdHighWaterMark": -1}
                    ),
                    "removed": False,
                }
            }
        )
    actions = [
        {"protocol": protocol},
        {
            "metaData": {
                "id": str(uuid.uuid5(uuid.NAMESPACE_URL, table_path)),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_json,
                "partitionColumns": part_cols,
                "configuration": conf,
            }
        },
    ] + actions
    _commit(
        _log_dir(table_path), 0, actions, operation="CREATE TABLE"
    )
    return 0


def set_delta_constraint(
    spark: SparkSession, table_path: str, name: str, expr: str
) -> int:
    """ALTER TABLE ADD CONSTRAINT ... CHECK (expr): validates the
    EXISTING rows first (delta-spark refuses to add a constraint the
    table already violates), then commits a metaData re-statement
    carrying ``delta.constraints.<name>`` plus the protocol upgrade
    declaring the ``checkConstraints`` writer feature (merged, never
    overwritten — other declared features survive). Every subsequent
    merge/append validates its added rows against the expression
    (PROTOCOL.md "CHECK Constraints"). Returns the committed
    version."""
    from optimus_any2any_spark.sources.delta import (
        check_delta_constraints,
        read_delta,
        table_constraints,
    )

    state = replay_log(spark, table_path)
    if state["meta"] is None:
        raise ValueError(f"delta constraint: no table at {table_path}")
    if name in table_constraints(state["meta"]):
        raise ValueError(
            f"delta constraint: {name!r} already exists (drop it first)"
        )
    probe_meta = {
        "configuration": {f"delta.constraints.{name}": expr}
    }
    check_delta_constraints(
        probe_meta, read_delta(spark, table_path), "add constraint"
    )
    meta = dict(state["meta"])
    conf = dict(meta.get("configuration") or {})
    conf[f"delta.constraints.{name}"] = expr
    meta["configuration"] = conf
    actions: list[dict] = []
    proto = _merged_protocol(
        state.get("protocol"), [], ["checkConstraints"]
    )
    if proto is not None:
        actions.append({"protocol": proto})
    actions.append({"metaData": meta})
    version = state["version"] + 1
    _commit(
        _log_dir(table_path), version, actions,
        operation="ADD CONSTRAINT", operation_params={"name": name},
    )
    return version


def drop_delta_constraint(
    spark: SparkSession, table_path: str, name: str
) -> int:
    """ALTER TABLE DROP CONSTRAINT: re-states metaData without the
    named ``delta.constraints.`` entry. Raises when the constraint
    does not exist (delta-spark's default; there is no IF EXISTS
    here)."""
    state = replay_log(spark, table_path)
    if state["meta"] is None:
        raise ValueError(f"delta constraint: no table at {table_path}")
    key = f"delta.constraints.{name}"
    conf = dict((state["meta"].get("configuration") or {}))
    if key not in conf:
        raise ValueError(
            f"delta constraint: {name!r} does not exist on the table"
        )
    del conf[key]
    meta = dict(state["meta"])
    meta["configuration"] = conf
    version = state["version"] + 1
    _commit(
        _log_dir(table_path), version, [{"metaData": meta}],
        operation="DROP CONSTRAINT", operation_params={"name": name},
    )
    return version


def restore_delta(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    timestamp=None,
) -> int:
    """RESTORE TABLE ... TO VERSION AS OF: commit the adds/removes
    that make the CURRENT state equal the table as of ``version`` —
    Delta's time-travel write. History is preserved (the restore is a
    new commit on top; the restored-over commits remain time-travelable
    until vacuum). Refuses when a needed historical file was already
    vacuumed — restoring to silently-missing data would corrupt the
    table. The metaData in force at the target version is re-stated
    when it differs (schema rollback travels with the restore).

    ``timestamp=`` is RESTORE ... TO TIMESTAMP AS OF: resolves to the
    latest commit at-or-before the timestamp (same rule as the
    time-travel read) — mutually exclusive with ``version``."""
    if timestamp is not None:
        if version is not None:
            raise ValueError(
                "delta restore: version and timestamp are mutually "
                "exclusive"
            )
        from optimus_any2any_spark.sources.delta import (
            resolve_delta_timestamp,
        )

        version = resolve_delta_timestamp(table_path, timestamp)
    if version is None:
        raise ValueError(
            "delta restore: a version or timestamp is required"
        )
    state_now = replay_log(spark, table_path)
    if state_now["meta"] is None:
        raise ValueError(f"delta restore: no table at {table_path}")
    if version > state_now["version"] or version < 0:
        raise ValueError(
            f"delta restore: version {version} not in history "
            f"(current is {state_now['version']})"
        )
    _check_append_only(state_now["meta"], "restore")
    state_then = replay_log(spark, table_path, version=version)
    new_version = state_now["version"] + 1

    then_live = state_then["live"]
    now_live = state_now["live"]
    from optimus_any2any_spark.sources.delta import dv_unique_id

    def _key(p, a):
        return (p, dv_unique_id(a))

    then_keys = {_key(p, a) for p, a in then_live.items()}
    now_keys = {_key(p, a) for p, a in now_live.items()}
    actions: list[dict] = []
    missing = []
    for p, a in sorted(then_live.items()):
        if _key(p, a) in now_keys:
            continue
        full = os.path.join(table_path, p)
        if not os.path.exists(full):
            missing.append(p)
            continue
        dv = a.get("deletionVector") or {}
        if dv.get("storageType") == "u":
            # the re-added file's vector blob must still exist too
            from optimus_any2any_spark.sources.delta import (
                _dv_descriptor_rows,
            )

            rows = _dv_descriptor_rows(table_path, {p: a})
            if rows and rows[0][3] and not os.path.exists(rows[0][3]):
                missing.append(f"{p} (deletion vector)")
                continue
        add = dict(a)
        add["dataChange"] = True
        actions.append({"add": add})
    if missing:
        raise ValueError(
            "delta restore: files of version "
            f"{version} were vacuumed: {missing[:5]} — the restore "
            "would resurrect a table with silent holes"
        )
    for p, a in sorted(now_live.items()):
        if _key(p, a) not in then_keys:
            actions.append(
                {"remove": _remove_action(p, a, data_change=True)}
            )
    if json.dumps(state_then["meta"], sort_keys=True) != json.dumps(
        state_now["meta"], sort_keys=True
    ):
        actions.append({"metaData": state_then["meta"]})
    if not actions:
        return state_now["version"]  # already identical: no-op
    _commit(
        _log_dir(table_path), new_version, actions,
        operation="RESTORE",
        operation_params={"version": str(version)},
    )
    return new_version


def write_checkpoint_v2(
    spark: SparkSession,
    table_path: str,
    sidecar_threshold: int = 10_000,
) -> str:
    """Write a V2-SPEC checkpoint of the current snapshot: a
    uuid-named ``<version>.checkpoint.<uuid>.parquet`` whose rows are
    the non-file actions plus ONE ``checkpointMetadata`` marker, with
    the file actions split into ``_delta_log/_sidecars/<uuid>.parquet``
    sidecar files (referenced by ``sidecar`` actions) once the table
    exceeds ``sidecar_threshold`` adds — the layout that lets a
    million-file table's checkpoint parallelize instead of funneling
    through one driver-side parquet. Upgrades the protocol with the
    ``v2Checkpoint`` reader+writer feature in its own commit first
    (the spec requires tables to DECLARE the feature before any reader
    can be expected to resolve uuid-named checkpoints). Returns the
    checkpoint file's log-relative name. The classic writer
    (``_write_checkpoint``) remains the default on merge's
    ``checkpoint_interval`` — v2 is the opt-in for metadata-scale
    tables."""
    import uuid as _uuid

    state = replay_log(spark, table_path)
    if state["meta"] is None:
        raise ValueError(f"delta checkpoint: no table at {table_path}")
    proto = _merged_protocol(
        state.get("protocol"), ["v2Checkpoint"], ["v2Checkpoint"]
    )
    version = state["version"]
    if proto is not None:
        # feature declaration is a COMMIT; the checkpoint then
        # describes the state as of that commit
        version += 1
        _commit(_log_dir(table_path), version, [{"protocol": proto}])
        state = replay_log(spark, table_path)

    log = _log_dir(table_path)
    top_rows = [
        json.dumps({"checkpointMetadata": {"version": version}}),
        json.dumps({"protocol": state.get("protocol")}),
        json.dumps({"metaData": state["meta"]}, default=str),
    ] + [
        json.dumps({"txn": {"appId": a, "version": v}})
        for a, v in sorted(state["txns"].items())
    ]
    add_rows = [
        json.dumps({"add": add}, default=str)
        for _, add in sorted(state["live"].items())
    ]

    def _rows_to_parquet(rows: list[str], dest: str) -> None:
        schema = spark.read.json(
            spark.sparkContext.parallelize(rows, 1)
        ).schema
        df = spark.read.schema(schema).json(
            spark.sparkContext.parallelize(rows, 1)
        )
        tmp = dest + ".d"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        _put_data(
            _glob.glob(os.path.join(tmp, "part-*.parquet"))[0], dest
        )
        shutil.rmtree(tmp)

    if len(add_rows) > sidecar_threshold:
        os.makedirs(os.path.join(log, "_sidecars"), exist_ok=True)
        n_parts = -(-len(add_rows) // sidecar_threshold)
        chunk = -(-len(add_rows) // n_parts)
        for i in range(n_parts):
            sc_name = f"{_uuid.uuid4()}.parquet"
            sc_path = os.path.join(log, "_sidecars", sc_name)
            _rows_to_parquet(
                add_rows[i * chunk:(i + 1) * chunk], sc_path
            )
            top_rows.append(
                json.dumps(
                    {
                        "sidecar": {
                            "path": sc_name,
                            "sizeInBytes": os.path.getsize(sc_path),
                            "modificationTime": 0,
                        }
                    }
                )
            )
    else:
        top_rows += add_rows

    cp_name = f"%020d.checkpoint.{_uuid.uuid4()}.parquet" % version
    _rows_to_parquet(top_rows, os.path.join(log, cp_name))
    last = os.path.join(log, "_last_checkpoint")
    tmp_last = last + ".tmp"
    with open(tmp_last, "w") as f:
        f.write(json.dumps({"version": version, "size": len(top_rows)}))
    _put_data(tmp_last, last)
    return cp_name


def vacuum_delta(spark: SparkSession, table_path: str) -> list[str]:
    """Delete data files the current snapshot does not reference —
    tombstoned files and crash orphans. Returns the deleted names.
    Real Delta gates this on a tombstone-age retention window to
    protect concurrent readers; under the single-writer-single-reader
    session model here the live set is the whole truth."""
    from optimus_any2any_spark.sources.delta import _dv_descriptor_rows

    state = replay_log(spark, table_path)
    live = set(state["live"])
    # DV .bin files still referenced by a live add's descriptor stay;
    # vectors consumed by a later merge/delete/purge are garbage like
    # the parquet files they annotated
    # only consult the descriptor helper when some live add actually
    # carries a vector: its basename-collision guard exists for the
    # row-index JOIN, and vacuum of a DV-less table must not trip it
    ref_bins: set[str] = set()
    if any(a.get("deletionVector") for a in state["live"].values()):
        ref_bins = {
            os.path.abspath(r[3])
            for r in _dv_descriptor_rows(table_path, state["live"])
            if r[3]
        }
    gone = []
    for name in sorted(os.listdir(table_path)):
        full = os.path.join(table_path, name)
        if not os.path.isfile(full):
            continue
        if name.endswith(".parquet") and name not in live:
            os.remove(full)
            gone.append(name)
        elif (
            name.startswith("deletion_vector_")
            and name.endswith(".bin")
            and os.path.abspath(full) not in ref_bins
        ):
            os.remove(full)
            gone.append(name)
    return gone


def _with_zorder_value(
    cur: DataFrame, zorder_by: list[str], data_schema: T.StructType
) -> DataFrame:
    """Append a ``__zv`` Morton (Z-curve) key: per column, the value
    maps to a QUANTILE bucket (one ``approxQuantile`` sample job for
    ALL columns — never a global sort per dimension), and the bucket
    ids' bits interleave into one long. Range-partitioning the write
    on ``__zv`` then gives every output file a compact hyper-rectangle
    of the value space, so a filter on ANY z-ordered column (not just
    the leading one — linear clustering's blind spot) prunes ~N^(1-1/d)
    of N files via the ordinary min/max stats. The whole computation
    is Column arithmetic inside codegen; nulls sort to bucket 0.

    Total bit budget 12 (4096 z-cells), split evenly — beyond ~4
    columns the curve degrades like real Z-ORDER does, which is the
    honest behavior to inherit."""
    ncols = len(zorder_by)
    bits = max(1, 12 // ncols)
    n_buckets = 1 << bits
    type_of = {f.name: f.dataType for f in data_schema.fields}

    def _as_double(c: str):
        dt = type_of[c]
        if isinstance(dt, T.NumericType):
            return F.col(c).cast("double")
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            return F.col(c).cast("double")
        if isinstance(dt, T.DateType):
            return F.col(c).cast("timestamp").cast("double")
        raise NotImplementedError(
            f"delta optimize: ZORDER BY over {dt.simpleString()} "
            f"column {c!r} is beyond this writer (numeric / "
            "timestamp / date only)"
        )

    qcols = [f"__zq{i}" for i in range(ncols)]
    zsrc = cur.select(
        *[_as_double(c).alias(q) for c, q in zip(zorder_by, qcols)]
    )
    probs = [i / n_buckets for i in range(1, n_buckets)]
    all_bounds = zsrc.approxQuantile(qcols, probs, 0.001)
    zdf = cur
    for c, q, bounds in zip(zorder_by, qcols, all_bounds):
        zdf = zdf.withColumn(q, _as_double(c))
        # drop duplicate quantiles (skewed data); the bucket id is the
        # count of distinct bounds strictly below the value. Built as
        # ONE aggregate over an array literal instead of a chain of
        # n_buckets when()/otherwise() Columns: the old shape cost ~4
        # py4j round-trips per bound (~2,000 per ZORDER call, ~0.4 s of
        # pure driver latency) and produced an expression tree whose
        # analysis cost scaled with the bucket count. Null values yield
        # null comparisons -> IF takes the else branch -> bucket 0,
        # exactly as the when-chain did.
        dedup: list[float] = []
        for bd in bounds:
            if not dedup or bd != dedup[-1]:
                dedup.append(bd)
        if dedup:
            b = F.aggregate(
                F.lit(dedup),
                F.lit(0),
                lambda acc, x: acc
                + F.when(F.col(q) > x, 1).otherwise(0),
            )
        else:
            b = F.lit(0)
        zdf = zdf.withColumn(q, b.cast("long"))
    zv = F.lit(0).cast("long")
    for bit in range(bits):
        for j, q in enumerate(qcols):
            zv = zv.bitwiseOR(
                F.shiftleft(
                    F.shiftright(F.col(q), bit).bitwiseAND(F.lit(1)),
                    bit * ncols + j,
                )
            )
    return zdf.withColumn("__zv", zv).drop(*qcols)


def compact_delta(
    spark: SparkSession,
    table_path: str,
    target_rows_per_file: int = 1_000_000,
    key_col: str | None = None,
    zorder_by: list[str] | None = None,
) -> int | None:
    """OPTIMIZE: rewrite small files into ``target_rows_per_file``-
    sized ones, per partition, committing adds+removes with
    ``dataChange: false`` — so streaming/CDF readers skip the commit
    entirely (the protocol's compaction contract) while snapshot
    readers see fewer, larger files. Returns the committed version, or
    None when no partition had at least two undersized files (nothing
    to do ⇒ no commit, no version burn). The rewritten bytes become
    garbage for ``vacuum_delta``; time travel before the compaction
    still sees the small files.

    ``zorder_by=[col, ...]`` is OPTIMIZE ... ZORDER BY: EVERY live
    file rewrites (re-clustering is the point — real Delta does the
    same), routed by a Morton key over quantile buckets of the named
    columns (:func:`_with_zorder_value`) so each output file covers a
    compact hyper-rectangle and min/max stats prune on ANY z-ordered
    dimension. commitInfo records ``zOrderBy``, the delta-spark
    operationParameters shape."""
    state = replay_log(spark, table_path)
    if state["meta"] is None:
        return None
    phys, mapped, pfields = _phys_of(state["meta"])
    rt = _row_tracking_of(state["meta"])
    schema = T.StructType.fromJson(
        json.loads(state["meta"]["schemaString"])
    )
    part_cols = state["meta"].get("partitionColumns") or []
    data_schema = T.StructType(
        [f for f in schema.fields if f.name not in part_cols]
    )
    if zorder_by:
        names = {f.name for f in data_schema.fields}
        for c in zorder_by:
            if c in part_cols:
                raise ValueError(
                    f"delta optimize: ZORDER BY partition column "
                    f"{c!r} is meaningless — files never span "
                    "partitions"
                )
            if c not in names:
                raise ValueError(
                    f"delta optimize: unknown ZORDER column {c!r}"
                )
    groups: dict[tuple, list[tuple[str, dict]]] = {}
    for p, a in sorted(state["live"].items()):
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(phys(c)) for c in part_cols)
        try:
            n = json.loads(a.get("stats") or "{}").get("numRecords")
        except ValueError:
            n = None
        # ZORDER rewrites every live file — re-clustering is the point
        if zorder_by or n is None or n < target_rows_per_file:
            groups.setdefault(key, []).append((p, a))
    version = state["version"] + 1
    actions: list[dict] = []
    file_seq = 0
    # lead stats (and re-clustering) with the caller's merge key when
    # given, else the first data column
    stat_col = key_col or (
        data_schema.fields[0].name if data_schema.fields else None
    )
    # keep only partitions with >= 2 undersized files; everything else
    # is already optimal. From here the whole compaction is FOUR jobs
    # (count, range sample, write, stats) regardless of how many files
    # or partitions are being compacted — the old shape ran a count +
    # write per partition and a stats aggregate PER FILE.
    ptuples = sorted(
        (
            k
            for k, fs in groups.items()
            if len(fs) >= (1 if zorder_by else 2)
        ),
        key=str,
    )
    if not ptuples:
        return None
    pid_of = {pt: i for i, pt in enumerate(ptuples)}
    src: list[tuple[str, int]] = [
        (p, pid_of[pt]) for pt in ptuples for p, _ in groups[pt]
    ]
    for p, _pid in src:
        actions.append(
            {
                "remove": _remove_action(
                    p, state["live"][p], data_change=False
                )
            }
        )
    single = len(ptuples) == 1
    cur = _read_files_dv_aware(
        spark, table_path, data_schema, [p for p, _ in src],
        state["live"], basename_col=None if single else "__rel",
        pfields=pfields,
        row_tracking=rt,
    )
    if rt is not None:
        # OPTIMIZE preserves lineage: the rewritten files carry every
        # row's id AND commit version materialized (a rewrite is not
        # an update — both survive byte-for-byte)
        cur = cur.withColumnRenamed(
            "__rt_id", rt[0]
        ).withColumnRenamed("__rt_cv", rt[1])
    if single:
        cur = cur.withColumn("__pid", F.lit(0).cast("int"))
    else:
        bn_src = [(p.rsplit("/", 1)[-1], pid) for p, pid in src]
        if len({b for b, _ in bn_src}) != len(bn_src):
            raise NotImplementedError(
                "delta optimize: compacted files share a basename — "
                "the pid routing join would misattribute rows"
            )
        rel_pid = local_rows_df(spark, 
            bn_src,
            T.StructType(
                [
                    T.StructField("__rel", T.StringType(), False),
                    T.StructField("__pid", T.IntegerType(), False),
                ]
            ),
        )
        cur = cur.join(F.broadcast(rel_pid), "__rel", "inner").drop(
            "__rel"
        )
    if zorder_by:
        cur = _with_zorder_value(cur, zorder_by, data_schema)
    total = cur.count()
    n_files = max(1, -(-total // target_rows_per_file))
    tmp = os.path.join(table_path, f"_tmp-compact-v{version}")
    # re-cluster while compacting: range-partitioning on (__pid, the
    # leading stat column) keeps post-OPTIMIZE file ranges mostly
    # disjoint within each partition, so data skipping stays sharp
    # (the linear cousin of Delta's Z-ORDER-on-OPTIMIZE). File sizes
    # are approximate when a range partition spans a __pid boundary.
    new_files: list[tuple[str, dict]] = []  # (rel, partitionValues)
    data_cols = [f.name for f in data_schema.fields]
    if single:
        out_df = cur.drop("__pid")
        if zorder_by:
            out_df = out_df.repartitionByRange(
                n_files, F.col("__zv")
            ).sortWithinPartitions("__zv")
        elif stat_col is not None:
            out_df = out_df.repartitionByRange(n_files, F.col(stat_col))
        else:
            out_df = out_df.coalesce(n_files)
        if mapped:
            keep_ = ("__zv",) if zorder_by else ()
            if rt is not None:
                keep_ = keep_ + rt
            out_df = _to_phys(out_df, data_cols, pfields, keep=keep_)
        if zorder_by:
            out_df = out_df.drop("__zv")
        out_df.write.mode("overwrite").parquet(tmp)
        pv = {phys(c): v for c, v in zip(part_cols, ptuples[0])}
        for part in sorted(
            _glob.glob(os.path.join(tmp, "part-*.parquet"))
        ):
            rel = (f"part-{version:05d}-{file_seq:04d}-"
                    f"{_file_token(table_path)}-compact.parquet")
            file_seq += 1
            _put_data(part, os.path.join(table_path, rel))
            new_files.append((rel, pv))
    else:
        if zorder_by:
            range_cols = [F.col("__pid"), F.col("__zv")]
        else:
            range_cols = [F.col("__pid")] + (
                [F.col(stat_col)] if stat_col is not None else []
            )
        out_df = cur.repartitionByRange(n_files, *range_cols)
        if zorder_by:
            out_df = out_df.sortWithinPartitions("__pid", "__zv")
        if mapped:
            keep_ = ("__pid", "__zv") if zorder_by else ("__pid",)
            if rt is not None:
                keep_ = keep_ + rt
            out_df = _to_phys(out_df, data_cols, pfields, keep=keep_)
        if zorder_by:
            out_df = out_df.drop("__zv")
        (
            out_df.write.partitionBy("__pid")
            .mode("overwrite")
            .parquet(tmp)
        )
        for pdir in sorted(_glob.glob(os.path.join(tmp, "__pid=*"))):
            pid = int(os.path.basename(pdir).split("=", 1)[1])
            pv = {phys(c): v for c, v in zip(part_cols, ptuples[pid])}
            for part in sorted(
                _glob.glob(os.path.join(pdir, "part-*.parquet"))
            ):
                rel = (f"part-{version:05d}-{file_seq:04d}-"
                    f"{_file_token(table_path)}-compact.parquet")
                file_seq += 1
                _put_data(part, os.path.join(table_path, rel))
                new_files.append((rel, pv))
    shutil.rmtree(tmp)
    if not new_files:
        return None
    # ONE grouped stats job over ALL compacted output (merge-key +
    # leading columns, same shape the merge path records) — NOT a
    # per-file aggregate loop; and full per-column stats mean a later
    # merge/delete can still prune (and never mis-prunes) on ANY
    # recorded column, the ADVICE-r4 post-OPTIMIZE correctness trap
    by_name = (
        _collect_file_stats(
            spark, table_path, [r for r, _ in new_files],
            phys(stat_col),
            _phys_schema(data_schema, pfields) if mapped else data_schema,
            lead_cols=[phys(c) for c in zorder_by or []],
        )
        if stat_col is not None
        else {}
    )
    rt_base = _rt_high_watermark(state) + 1 if rt is not None else None
    for rel, pv in new_files:
        full = os.path.join(table_path, rel)
        st = by_name.get(rel)
        if stat_col is not None and st is None:
            os.remove(full)  # empty part: not worth an add action
            continue
        add = {
            "path": rel,
            "partitionValues": pv,
            "size": os.path.getsize(full),
            "modificationTime": 0,
            "dataChange": False,
        }
        if st is not None:
            add["stats"] = json.dumps(st, default=str)
        if rt is not None and st is not None:
            add["baseRowId"] = rt_base
            add["defaultRowCommitVersion"] = version
            rt_base += int(st["numRecords"])
        actions.append({"add": add})
    if rt is not None:
        actions.append(_rt_domain_action(rt_base - 1))
    _commit(
        _log_dir(table_path), version, actions,
        operation="OPTIMIZE",
        operation_params=(
            {"zOrderBy": json.dumps(list(zorder_by))}
            if zorder_by
            else None
        ),
    )
    return version


def _validate_merge_clauses(
    when_matched: list | None,
    when_not_matched_by_source: list | None,
    key_col: str,
    when_not_matched: list | None = None,
) -> None:
    """Shape-check conditional-MERGE clause lists: each clause is
    ``("update", condition_sql_or_None, {col: value_sql})`` or
    ``("delete", condition_sql_or_None)``, evaluated in declaration
    order, first match wins (delta-spark's builder semantics).
    Assignments may not touch the merge key — key rewrites would break
    the key-pruning contract (and real Delta refuses them on the
    matched side for the same reason). ``when_not_matched`` takes
    ``("insert", condition_sql_or_None, {col: value_sql} | None)``
    clauses only (None values = insertAll); unmatched source rows that
    match no insert clause are NOT inserted."""
    for cl in when_not_matched or []:
        if not cl or cl[0] != "insert":
            raise ValueError(
                "delta merge: when_not_matched clause kind must be "
                f"'insert', got {cl!r}"
            )
        if len(cl) not in (2, 3) or (
            len(cl) == 3
            and cl[2] is not None
            and (not isinstance(cl[2], dict) or not cl[2])
        ):
            raise ValueError(
                "delta merge: when_not_matched insert clause needs "
                "('insert', condition|None[, {col: value_sql}|None])"
            )
    for label, clauses in (
        ("when_matched", when_matched),
        ("when_not_matched_by_source", when_not_matched_by_source),
    ):
        for cl in clauses or []:
            if not cl or cl[0] not in ("update", "delete"):
                raise ValueError(
                    f"delta merge: {label} clause kind must be "
                    f"'update' or 'delete', got {cl!r}"
                )
            if cl[0] == "update":
                if len(cl) != 3 or not isinstance(cl[2], dict) or not cl[2]:
                    raise ValueError(
                        f"delta merge: {label} update clause needs "
                        "('update', condition|None, {col: value_sql})"
                    )
                if key_col in cl[2]:
                    raise ValueError(
                        "delta merge: UPDATE SET may not assign the "
                        f"merge key {key_col!r}"
                    )
            elif len(cl) != 2:
                raise ValueError(
                    f"delta merge: {label} delete clause needs "
                    "('delete', condition|None)"
                )


def _apply_insert_clauses(
    inserts: DataFrame,
    data_cols: list[str],
    dtype_of: dict,
    when_not_matched: list,
) -> DataFrame:
    """Conditional insert clauses (delta-spark's
    whenNotMatchedInsert(cond, values)): the FIRST matching clause
    supplies the inserted values — ``{col: value_sql}`` assignments
    over the source row (``s.<col>``), unspecified columns null, a
    ``None`` value set meaning insertAll. Source rows matching no
    clause are NOT inserted. ``inserts`` carries ``data_cols`` +
    ``__pid``."""
    nmc = list(when_not_matched)
    s_ins = inserts.alias("s")
    ichain = None
    for i, cl in enumerate(nmc, start=1):
        cond = F.expr(cl[1]) if cl[1] is not None else F.lit(True)
        ichain = (
            F.when(cond, F.lit(i))
            if ichain is None
            else ichain.when(cond, F.lit(i))
        )
    iidx = ichain.otherwise(F.lit(0)) if ichain is not None else F.lit(0)
    ivals: list[Column] = []
    for c in data_cols:
        v = None
        for i, cl in enumerate(nmc, start=1):
            vset = cl[2] if len(cl) == 3 else None
            if vset is None:
                term_val: Column = F.col(f"s.{c}")
            elif c in vset:
                term_val = F.expr(vset[c]).cast(dtype_of[c])
            else:
                term_val = F.lit(None).cast(dtype_of[c])
            term = (iidx == i, term_val)
            v = F.when(*term) if v is None else v.when(*term)
        ivals.append(
            (v if v is not None
             else F.lit(None).cast(dtype_of[c])).alias(c)
        )
    return s_ins.filter(iidx != 0).select(*ivals, F.col("s.__pid"))


def _apply_merge_clauses(
    cur: DataFrame,
    latest_p: DataFrame,
    key_col: str,
    data_cols: list[str],
    when_matched: list | None,
    when_not_matched_by_source: list | None,
    want_changes: bool = False,
    when_not_matched: list | None = None,
    carry_cols: tuple | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """Conditional-MERGE row algebra (delta-spark's
    whenMatchedUpdate / whenMatchedDelete /
    whenNotMatchedBySourceUpdate / whenNotMatchedBySourceDelete):

    ONE left-outer join target←source decides matched-ness; a CASE
    chain computes the FIRST clause (declaration order) whose
    condition holds for each row; delete-clause rows drop, update
    clauses apply their ``{col: value_sql}`` assignments (conditions
    and values see ``t.<col>`` = target row and ``s.<col>`` = source
    row; on the not-matched-by-source side every ``s.`` read is
    null), unmatched-clause rows pass through unchanged, and source
    rows matching NO target row insert (whenNotMatchedInsertAll —
    the engine's standing upsert insert side). Still one shuffle
    join + one write: the clause algebra is pure Column CASE work on
    top of the existing single-job merge plan.

    ``want_changes=True`` additionally returns the Change Data Feed
    row set (``_change_type`` ∈ update_preimage / update_postimage /
    delete / insert; pass-through rows emit nothing) — the joined
    frame is checkpointed once so the derived frames share one
    evaluation instead of re-running the join per change type.

    ``carry_cols=(id_col, version_col)`` threads ROW TRACKING / ROW
    LINEAGE through the algebra: both live on ``cur``; kept target
    rows carry the id verbatim (updates too — the lineage contract),
    the version column nulls on update-clause rows (deriving to the
    new add's commit version / data sequence) and carries otherwise,
    and insert rows get null ids (fresh from the new files'
    reservations). CDF rows stay lineage-free."""
    wm = list(when_matched or [])
    nm = list(when_not_matched_by_source or [])
    t = cur.alias("t")
    s = latest_p.withColumn("__s_m", F.lit(1)).alias("s")
    on = F.col(f"t.{key_col}").eqNullSafe(F.col(f"s.{key_col}")) & (
        F.col("t.__pid") == F.col("s.__pid")
    )
    j = t.join(s, on, "left")
    matched = F.col("s.__s_m").isNotNull()

    def _first_match_idx(clauses: list, side: Column) -> Column:
        chain = None
        for i, cl in enumerate(clauses, start=1):
            cond = side & (
                F.expr(cl[1]) if cl[1] is not None else F.lit(True)
            )
            chain = (
                F.when(cond, F.lit(i))
                if chain is None
                else chain.when(cond, F.lit(i))
            )
        return chain.otherwise(F.lit(0)) if chain is not None else F.lit(0)

    midx = _first_match_idx(wm, matched)
    nidx = _first_match_idx(nm, ~matched)

    vals: list[Column] = []
    for c in data_cols:
        v = None
        for idx_col, clauses in ((midx, wm), (nidx, nm)):
            for i, cl in enumerate(clauses, start=1):
                if cl[0] == "update" and c in cl[2]:
                    term_cond = idx_col == i
                    term_val = F.expr(cl[2][c]).cast(
                        cur.schema[c].dataType
                    )
                    v = (
                        F.when(term_cond, term_val)
                        if v is None
                        else v.when(term_cond, term_val)
                    )
        col = (
            v.otherwise(F.col(f"t.{c}")) if v is not None
            else F.col(f"t.{c}")
        )
        vals.append(col.alias(c))

    drop_m = [i for i, cl in enumerate(wm, start=1) if cl[0] == "delete"]
    drop_n = [i for i, cl in enumerate(nm, start=1) if cl[0] == "delete"]
    upd_m = [i for i, cl in enumerate(wm, start=1) if cl[0] == "update"]
    upd_n = [i for i, cl in enumerate(nm, start=1) if cl[0] == "update"]
    keep = F.lit(True)
    if drop_m:
        keep = keep & ~midx.isin(drop_m)
    if drop_n:
        keep = keep & ~nidx.isin(drop_n)
    upd = F.lit(False)
    if upd_m:
        upd = upd | midx.isin(upd_m)
    if upd_n:
        upd = upd | nidx.isin(upd_n)

    carry_sel: list[Column] = []
    if carry_cols is not None:
        id_c, cv_c = carry_cols
        carry_sel = [
            F.col(f"t.{id_c}").alias(id_c),
            F.when(upd, F.lit(None).cast("long"))
            .otherwise(F.col(f"t.{cv_c}"))
            .alias(cv_c),
        ]
    base = j.select(
        *vals,  # post-clause values under the data_col names
        F.col("t.__pid").alias("__pid"),
        *carry_sel,
        *[F.col(f"t.{c}").alias(f"__old_{c}") for c in data_cols],
        keep.alias("__keep"),
        upd.alias("__upd"),
    )
    if want_changes:
        # four consumers below — evaluate the join once
        base = base.localCheckpoint(eager=False)
    target_rows = base.filter(F.col("__keep")).select(
        *data_cols, "__pid",
        *([carry_cols[0], carry_cols[1]] if carry_cols else []),
    )

    inserts = (
        latest_p.alias("b")
        .join(
            cur.select(
                F.col(key_col).alias("__tk"),
                F.col("__pid").alias("__tpid"),
            ),
            F.col(f"b.{key_col}").eqNullSafe(F.col("__tk"))
            & (F.col("b.__pid") == F.col("__tpid")),
            "left_anti",
        )
    )
    if when_not_matched is not None:
        inserts = _apply_insert_clauses(
            inserts, data_cols,
            {c: cur.schema[c].dataType for c in data_cols},
            when_not_matched,
        )
    if carry_cols is not None:
        inserts = inserts.withColumn(
            carry_cols[0], F.lit(None).cast("long")
        ).withColumn(carry_cols[1], F.lit(None).cast("long"))
    out = target_rows.unionByName(inserts)
    if not want_changes:
        return out, None
    old_sel = [F.col(f"__old_{c}").alias(c) for c in data_cols]
    pre = (
        base.filter(F.col("__upd"))
        .select(*old_sel, "__pid")
        .withColumn("_change_type", F.lit("update_preimage"))
    )
    post = (
        base.filter(F.col("__upd"))
        .select(*data_cols, "__pid")
        .withColumn("_change_type", F.lit("update_postimage"))
    )
    dele = (
        base.filter(~F.col("__keep"))
        .select(*old_sel, "__pid")
        .withColumn("_change_type", F.lit("delete"))
    )
    ins_c = inserts
    if carry_cols is not None:  # CDF rows are logical
        ins_c = ins_c.drop(*carry_cols)
    ins_c = ins_c.withColumn("_change_type", F.lit("insert"))
    changes = (
        pre.unionByName(post).unionByName(dele).unionByName(ins_c)
    )
    return out, changes


def merge_delta_batch(
    spark: SparkSession,
    batch: DataFrame,
    table_path: str,
    key_col: str,
    ts_col: str,
    app_id: str = DEFAULT_APP_ID,
    batch_id: int | None = None,
    target_rows_per_file: int = 1_000_000,
    checkpoint_interval: int = 10,
    change_data: bool = False,
    partition_by: list[str] | None = None,
    merge_schema: bool = False,
    when_matched: list | None = None,
    when_not_matched_by_source: list | None = None,
    when_not_matched: list | None = None,
) -> int:
    """One file-level MERGE commit against a Delta table; returns the
    committed (or already-current, on an idempotent skip) version.

    ``change_data=True`` additionally writes this commit's row-level
    changes (``_change_type`` ∈ insert / update_preimage /
    update_postimage) under ``_change_data/`` and records them as
    ``cdc`` actions — the Delta Change Data Feed protocol shape — so
    incremental consumers read O(changes) per commit instead of
    diffing snapshots (``sources.delta.read_delta_cdf``).

    ``partition_by`` (first commit only) creates a PARTITIONED table;
    later merges read it from the log. Partitioned-merge semantics are
    partition-scoped: a batch row upserts the row with the same key IN
    ITS OWN PARTITION — the date-partitioned 100 TB shape, where
    partition pruning happens before key-stats pruning, and a merge's
    IO footprint is O(affected files in touched partitions), never the
    table. A key that migrates partitions is two logical rows under
    this contract (document shared with the reference-free manifest
    table); cross-partition key moves need the full-join MERGE real
    Delta runs, which is exactly the shuffle this merge exists to
    avoid.

    ``merge_schema=True`` is Delta's mergeSchema: batch columns not in
    the table are APPENDED to the schema (this commit carries the new
    metaData action; existing files read the new columns as null), and
    table columns missing from the batch are null-filled. Without it,
    any column mismatch raises.

    ``when_matched`` / ``when_not_matched_by_source`` (VERDICT r9
    item 5) switch the matched/unmatched-target row algebra from the
    default latest-wins upsert to delta-spark's conditional clause
    builder: ordered lists of ``("update", cond_sql|None, {col:
    value_sql})`` / ``("delete", cond_sql|None)``; conditions and
    values reference ``t.<col>`` (target row) and ``s.<col>`` (source
    row), first matching clause wins, no-clause rows pass through
    UNCHANGED (not upserted), and unmatched source rows always insert
    (whenNotMatchedInsertAll). ``when_not_matched_by_source`` scans
    every live row by definition — on a partitioned table that means
    every live FILE participates (the full scan is inherent to the
    clause, exactly as delta-spark runs it): files route to their own
    partition's pid, and live partitions the batch does not touch
    mint fresh pids whose typed values cast from the log's
    partitionValues strings (the reader's own typing rule).
    ``merge_schema=True`` composes with clauses: the batch evolves
    first, so clause conditions/values may reference the new columns
    on both sides (pre-evolution target rows read them as null).
    ``change_data=True``
    composes: update-clause rows emit update_preimage/postimage,
    delete-clause rows emit delete, inserts emit insert, pass-through
    rows emit nothing. The commitInfo records the clause predicates
    in operationParameters."""
    from pyspark.sql.window import Window

    conditional = bool(
        when_matched or when_not_matched_by_source
        or when_not_matched is not None
    )
    if conditional:
        _validate_merge_clauses(
            when_matched, when_not_matched_by_source, key_col,
            when_not_matched=when_not_matched,
        )

    exists = os.path.isdir(_log_dir(table_path))
    state = replay_log(spark, table_path) if exists else {
        "meta": None, "live": {}, "txns": {}, "version": -1,
    }
    phys, mapped, pfields = _phys_of(state["meta"])
    rt = _row_tracking_of(state["meta"])
    version = state["version"] + 1
    if (
        batch_id is not None
        and state["txns"].get(app_id) is not None
        and batch_id <= state["txns"][app_id]
    ):
        return state["version"]  # redelivery of an applied batch: no-op

    evolved = False
    meta_restate = False
    if state["meta"] is not None:
        # generated columns: compute the absent ones from their
        # generation expressions, validate the provided ones;
        # identity columns: assign from the high watermark (the
        # advanced watermark re-states metaData in this commit)
        from optimus_any2any_spark.sources.delta import (
            apply_generated_columns,
            apply_identity_columns,
        )

        batch = apply_generated_columns(state["meta"], batch, "merge")
        batch, id_meta = apply_identity_columns(
            state["meta"], batch, "merge"
        )
        if id_meta is not None:
            state = dict(state)
            state["meta"] = id_meta
            meta_restate = True
        schema = T.StructType.fromJson(
            json.loads(state["meta"]["schemaString"])
        )
        part_cols = list(state["meta"].get("partitionColumns") or [])
        if set(schema.fieldNames()) != set(batch.columns):
            if not merge_schema:
                raise ValueError(
                    "delta merge: batch columns "
                    f"{sorted(batch.columns)} != table schema "
                    f"{sorted(schema.fieldNames())} "
                    "(pass merge_schema=True to evolve)"
                )
            table_cols = set(schema.fieldNames())
            extra = [c for c in batch.columns if c not in table_cols]
            missing = [
                c for c in schema.fieldNames() if c not in batch.columns
            ]
            if any(c in part_cols for c in missing):
                raise ValueError(
                    "delta merge: batch must carry the partition "
                    f"columns {part_cols}"
                )
            if extra:
                if mapped:
                    # mint physicalName/column-id metadata for the new
                    # columns and advance maxColumnId; the evolved
                    # metaData rides this commit, and phys/pfields are
                    # rebuilt so the write lands under the fresh
                    # physical names (pre-evolution files null-fill
                    # the new physical columns on read)
                    state = dict(state)
                    state["meta"] = _evolve_mapped_meta(
                        state["meta"], [batch.schema[c] for c in extra]
                    )
                    phys, mapped, pfields = _phys_of(state["meta"])
                else:
                    # append the new field JSON to the EXISTING
                    # schemaString verbatim — rebuilding from the
                    # batch schema would silently drop the old
                    # fields' metadata (generation expressions,
                    # identity watermarks, constraints context)
                    state = dict(state)
                    meta2 = dict(state["meta"])
                    old_fields = json.loads(
                        meta2["schemaString"]
                    )["fields"]
                    meta2["schemaString"] = json.dumps(
                        {
                            "type": "struct",
                            "fields": old_fields
                            + [
                                batch.schema[c].jsonValue()
                                for c in extra
                            ],
                        }
                    )
                    state["meta"] = meta2
                schema = T.StructType(
                    list(schema.fields)
                    + [batch.schema[c] for c in extra]
                )
                evolved = True
            for c in missing:
                batch = batch.withColumn(
                    c, F.lit(None).cast(schema[c].dataType)
                )
        batch = batch.select(*schema.fieldNames())
    else:
        part_cols = list(partition_by or [])
        missing = [c for c in part_cols if c not in batch.columns]
        if missing:
            raise ValueError(
                f"delta merge: partition columns {missing} not in batch"
            )
    if key_col in part_cols:
        raise ValueError(
            "delta merge: the merge key cannot be a partition column "
            "(every key group would be a one-row partition)"
        )
    w = Window.partitionBy(key_col, *part_cols).orderBy(
        F.col(ts_col).desc()
    )
    latest = (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .localCheckpoint(eager=False)
    )
    # the grouped key-stats aggregate doubles as the checkpoint's
    # materializer AND yields n_total (sum of per-partition n) — the
    # old shape ran a separate full count job first. Exact key LISTS
    # (the sharper per-partition file pruner) are recovered by one
    # extra collect only when the batch fits the driver cap, where
    # that collect is cheap; an over-cap backfill commit saves a
    # whole pass. (Iceberg twin: merge_iceberg_batch.)
    # CHECK-constraint violation counts ride the SAME aggregate (rows
    # the merge ADDS must satisfy them; rows re-written from affected
    # files already did) — the old standalone check paid a second full
    # batch pass whenever the table declared constraints.
    from optimus_any2any_spark.sources.delta import (
        constraint_violation_aggs,
        raise_constraint_violations,
    )

    ck_names, ck_aggs = (
        constraint_violation_aggs(state["meta"])
        if state["meta"] is not None
        else ([], [])
    )
    gstats = (
        latest.groupBy(*part_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(key_col).alias("kmin"),
            F.max(key_col).alias("kmax"),
            F.max(F.col(key_col).isNull().cast("int")).alias(
                "null_key"
            ),
            *ck_aggs,
        )
        .collect()
    )
    n_total = sum(int(r["n"]) for r in gstats)
    if n_total > 0 and ck_names:
        raise_constraint_violations(
            state["meta"],
            ck_names,
            [
                sum(int(r[f"__ck{i}"] or 0) for r in gstats)
                for i in range(len(ck_names))
            ],
            "merge",
        )
    if n_total == 0 and not when_not_matched_by_source:
        # (an EMPTY source with when_not_matched_by_source is still a
        # full clause evaluation: every live row is unmatched)
        if not evolved:
            return state["version"]
        # A widening merge whose batch has zero rows is still a legal
        # schema-change commit (delta-spark withSchemaEvolution()
        # parity): commit the evolved metaData with no file actions so
        # the table gains the new columns even on an empty batch.
        # state["meta"] already carries the evolved schemaString
        # (minted columnMapping metadata on mapped tables, verbatim
        # old-field JSON + new fields otherwise).
        actions: list[dict] = [{"metaData": dict(state["meta"])}]
        if batch_id is not None:
            actions.append(
                {"txn": {"appId": app_id, "version": batch_id}}
            )
        _commit(
            _log_dir(table_path), version, actions,
            operation="MERGE", operation_params={'key': key_col},
        )
        if checkpoint_interval and version > 0 and (
            version % checkpoint_interval == 0
        ):
            _write_checkpoint(spark, table_path, version)
        return version
    data_cols = [c for c in latest.columns if c not in part_cols]
    data_schema = T.StructType(
        [f for f in latest.schema.fields if f.name not in part_cols]
    )

    # ---- single-job partitioned merge -------------------------------
    # Per-partition batch key stats come from ONE job for ALL touched
    # partitions; file pruning is pure driver metadata work; then ONE
    # anti-join + ONE partitionBy write (on a surrogate __pid column,
    # so partition VALUES never round-trip through directory-name
    # string encoding) covers every partition. The old shape ran one
    # write job (+ collects) per partition — fine for a late-data
    # trickle, a driver bottleneck for a backfill touching thousands
    # of partitions.
    if n_total <= _MAX_DRIVER_KEYS:
        # ``latest`` is one row per (key, partition) by construction,
        # so this collect IS the distinct key set, split per partition
        krows = latest.select(*part_cols, key_col).collect()
        grouped: dict[tuple, list] = {}
        for r in krows:
            grouped.setdefault(
                tuple(r[c] for c in part_cols), []
            ).append(r[key_col])
        pstats: dict[tuple, dict] = {}
        for pt, vals in grouped.items():
            nn = sorted(v for v in vals if v is not None)
            pstats[pt] = {
                "n": len(vals),
                "keys": nn,
                "kmin": nn[0] if nn else None,
                "kmax": nn[-1] if nn else None,
                "has_null": len(nn) < len(vals),
            }
    else:  # too many keys for the driver: reuse the grouped aggregate
        pstats = {
            tuple(r[c] for c in part_cols): {
                "n": r["n"],
                "keys": None,
                "kmin": r["kmin"],
                "kmax": r["kmax"],
                "has_null": bool(r["null_key"]),
            }
            for r in gstats
            if r["n"]
        }

    if when_not_matched_by_source and not pstats and not part_cols:
        # empty source, unpartitioned: the clause pass still needs
        # the one () partition to route through (a partitioned empty
        # source routes through minted live-partition pids below)
        pstats = {
            (): {"n": 0, "keys": [], "kmin": None, "kmax": None,
                 "has_null": False}
        }
    ptuples = sorted(pstats, key=str)
    pid_of = {pt: i for i, pt in enumerate(ptuples)}
    # partitionValues (and stats) in add actions are keyed by PHYSICAL
    # names on mapped tables — identity otherwise
    pv_str_of = {
        pt: {
            phys(c): (None if v is None else str(v))
            for c, v in zip(part_cols, pt)
        }
        for pt in ptuples
    }

    # partition pruning FIRST (exact partitionValues match), then
    # key-stats pruning inside each partition — all driver-side
    live_by_pv: dict[tuple, list[tuple[str, dict]]] = {}
    for p, a in sorted(state["live"].items()):
        apv = a.get("partitionValues") or {}
        live_by_pv.setdefault(
            tuple(apv.get(phys(c)) for c in part_cols), []
        ).append((p, a))
    hit_by_pid: dict[int, list[dict]] = {}
    hit_paths: list[str] = []
    for pt in ptuples:
        st = pstats[pt]
        pv_key = tuple(pv_str_of[pt].get(phys(c)) for c in part_cols)
        entries = [
            _entry_from_add(p, a, phys(key_col))
            for p, a in live_by_pv.get(pv_key, [])
        ]
        hit, _miss = _affected(
            entries, st["keys"], st["kmin"], st["kmax"], st["has_null"]
        )
        if hit:
            hit_by_pid[pid_of[pt]] = hit
            hit_paths.extend(e["path"] for e in hit)
    # the write loop keys partitionValues by pid (minted NMBS pids
    # have no typed batch tuple)
    pv_of_pid: dict[int, dict] = {
        pid_of[pt]: pv_str_of[pt] for pt in ptuples
    }
    minted: list[tuple[tuple, int]] = []  # (pv string tuple, pid)
    if when_not_matched_by_source and state["live"]:
        # the clause touches every live row by definition: no file is
        # prunable (key stats say nothing about NOT-matched rows).
        # Each file routes to ITS OWN partition's pid; live partitions
        # the batch does not touch mint fresh pids.
        pid_by_str = {
            tuple(pv_str_of[pt].get(phys(c)) for c in part_cols):
                pid_of[pt]
            for pt in ptuples
        }
        next_pid = len(ptuples)
        hit_by_pid = {}
        hit_paths = []
        for pv_key, pairs in sorted(live_by_pv.items(), key=str):
            pid = pid_by_str.get(pv_key)
            if pid is None:
                pid = next_pid
                next_pid += 1
                minted.append((pv_key, pid))
                pv_of_pid[pid] = {
                    phys(c): v for c, v in zip(part_cols, pv_key)
                }
            entries = [
                _entry_from_add(p, a, phys(key_col)) for p, a in pairs
            ]
            hit_by_pid[pid] = entries
            hit_paths.extend(e["path"] for e in entries)

    # attach __pid to batch rows. A batch touching ONE partition
    # (including every unpartitioned merge) needs no routing at all —
    # constant pid, no broadcast join, and (below) a plain write
    # instead of the dynamic-partition write with its per-task sort
    # (~1s on the benched sf0.1 merge).
    single = len(ptuples) + len(minted) == 1
    if part_cols:
        pid_schema = T.StructType(
            [latest.schema[c] for c in part_cols]
            + [T.StructField("__pid", T.IntegerType(), False)]
        )
        pid_df = local_rows_df(spark, 
            [pt + (pid_of[pt],) for pt in ptuples], pid_schema
        )
    else:
        pid_df = None
    # constraint re-attachment needs partition values for EVERY pid;
    # minted pids type their values by casting the log's
    # partitionValues strings — the reader's own typing rule. Batch
    # pids keep their exact typed values (pid_df), so batch-row
    # routing never rides a string round-trip.
    pid_df_all = pid_df
    if minted and part_cols:
        mint_schema = T.StructType(
            [T.StructField(c, T.StringType(), True) for c in part_cols]
            + [T.StructField("__pid", T.IntegerType(), False)]
        )
        mint_df = local_rows_df(spark, 
            [pv + (pid,) for pv, pid in minted], mint_schema
        ).select(
            *[
                F.col(c).cast(latest.schema[c].dataType).alias(c)
                for c in part_cols
            ],
            "__pid",
        )
        pid_df_all = pid_df.unionByName(mint_df)
    if single or not part_cols:
        latest_p = latest.select(*data_cols).withColumn(
            "__pid", F.lit(0).cast("int")
        )
    else:
        pcond = None
        for c in part_cols:
            e = F.col(f"b.{c}").eqNullSafe(F.col(f"pd.{c}"))
            pcond = e if pcond is None else (pcond & e)
        latest_p = (
            latest.alias("b")
            .join(F.broadcast(pid_df.alias("pd")), pcond, "inner")
            .select(
                *[F.col(f"b.{c}") for c in data_cols], F.col("pd.__pid")
            )
        )

    merged = latest_p
    total_hit_rows = 0
    pre = None
    cond_changes = None
    if hit_paths:
        # an insert-only merge is an append; touching existing keys
        # rewrites files (data-changing removes) — appendOnly forbids
        _check_append_only(state["meta"], "merge")
        rel_pid_rows = [
            (e["path"], pid)
            for pid, hits in sorted(hit_by_pid.items())
            for e in hits
        ]
        bn_pid_rows = [
            (p.rsplit("/", 1)[-1], pid) for p, pid in rel_pid_rows
        ]
        if len({b for b, _ in bn_pid_rows}) != len(bn_pid_rows):
            raise NotImplementedError(
                "delta merge: affected files share a basename — the "
                "pid routing join would misattribute rows"
            )
        rel_pid = local_rows_df(spark, 
            bn_pid_rows,
            T.StructType(
                [
                    T.StructField("__rel", T.StringType(), False),
                    T.StructField("__pid", T.IntegerType(), False),
                ]
            ),
        )
        # explicit schema: pre-evolution files read new columns
        # as null (Delta mergeSchema read semantics); files carrying
        # deletion vectors read through the DV anti-join so the merge
        # consumes the vectors instead of resurrecting deleted rows
        cur = _read_files_dv_aware(
            spark, table_path, data_schema,
            [r for r, _ in rel_pid_rows], state["live"],
            basename_col=None if single else "__rel",
            pfields=pfields,
            row_tracking=rt,
        )
        if single:
            cur = cur.withColumn("__pid", F.lit(0).cast("int"))
        else:
            cur = cur.join(
                F.broadcast(rel_pid), "__rel", "inner"
            ).drop("__rel")
        bk = latest_p.select(
            F.col(key_col).alias("__bk"), F.col("__pid").alias("__bpid")
        )
        touch = F.col(f"cur.{key_col}").eqNullSafe(F.col("__bk")) & (
            F.col("cur.__pid") == F.col("__bpid")
        )
        if rt is not None and not conditional:
            # row tracking's UPDATE contract: a batch row replacing a
            # matched target row KEEPS that row's id (and takes this
            # commit's version — a null materialized cv derives from
            # the new add's defaultRowCommitVersion); unmatched batch
            # rows insert with null id (fresh from baseRowId + pos).
            # (The CONDITIONAL path carries lineage inside the clause
            # algebra itself — carry_cols below.)
            cur_ids = cur.select(
                F.col(key_col).alias("__ck"),
                F.col("__pid").alias("__cpid"),
                F.col("__rt_id").alias("__rt_prev"),
            )
            m2 = F.col(f"b.{key_col}").eqNullSafe(F.col("__ck")) & (
                F.col("b.__pid") == F.col("__cpid")
            )
            latest_p = (
                latest_p.alias("b")
                .join(cur_ids, m2, "left")
                .select(
                    *[F.col(f"b.{c}") for c in data_cols],
                    F.col("b.__pid"),
                    F.col("__rt_prev").alias("__rt_id"),
                    F.lit(None).cast("long").alias("__rt_cv"),
                )
            )
        if conditional:
            merged, cond_changes = _apply_merge_clauses(
                cur, latest_p, key_col, data_cols,
                when_matched, when_not_matched_by_source,
                want_changes=change_data,
                when_not_matched=when_not_matched,
                carry_cols=(
                    ("__rt_id", "__rt_cv") if rt is not None else None
                ),
            )
            # UPDATE SET mints NEW values — constraints must gate them
            # too (pass-through and insert rows re-check for free;
            # zero jobs when no constraints are declared). Partition
            # columns re-attach from the pid lookup so constraints
            # referencing them resolve.
            from optimus_any2any_spark.sources.delta import (
                check_delta_constraints as _ck,
            )

            merged_ck = merged
            if pid_df_all is not None:
                merged_ck = merged.join(
                    F.broadcast(pid_df_all), "__pid"
                )
            _ck(state["meta"], merged_ck.drop("__pid"), "merge")
        else:
            merged = (
                cur.alias("cur")
                .join(bk, touch, "left_anti")
                .unionByName(latest_p)
            )
        total_hit_rows = sum(
            max(e["rows"], 0)
            for hits in hit_by_pid.values()
            for e in hits
        )
        hit_paths = sorted(set(hit_paths))
        if change_data:
            # preimages: current rows whose (key, partition) the batch
            # touches — checkpointed once, consumed twice below (row-
            # tracking columns stay out of the CDF row set: CDF rows
            # are logical)
            pre_src = cur
            if rt is not None:
                pre_src = cur.drop("__rt_id", "__rt_cv")
            pre = (
                pre_src.alias("cur")
                .join(bk, touch, "inner")
                .drop("__bk", "__bpid")
                .localCheckpoint(eager=False)
            )

    if conditional and when_not_matched is not None and not hit_paths:
        # no affected files: every batch row is unmatched — the
        # insert clauses still decide which rows (and values) land
        merged = _apply_insert_clauses(
            latest_p, data_cols,
            {f.name: f.dataType for f in data_schema.fields},
            when_not_matched,
        )
        if change_data:
            cond_changes = merged.withColumn(
                "_change_type", F.lit("insert")
            )

    new_adds: list[dict] = []  # (rel, partitionValues) pending stats
    file_seq = 0
    n_rows = n_total + total_hit_rows
    n_files = max(1, -(-n_rows // target_rows_per_file))
    tmp = os.path.join(table_path, f"_tmp-merge-v{version}")
    if rt is not None:
        if "__rt_id" not in merged.columns:
            # insert-only merge (no affected files): every row is
            # fresh — null materialized values derive from the new
            # adds' baseRowId + position
            merged = merged.withColumn(
                "__rt_id", F.lit(None).cast("long")
            ).withColumn("__rt_cv", F.lit(None).cast("long"))
        merged = merged.withColumnRenamed(
            "__rt_id", rt[0]
        ).withColumnRenamed("__rt_cv", rt[1])
    if single:
        out_df = merged.drop("__pid").repartitionByRange(
            n_files, F.col(key_col)
        )
        if mapped:
            out_df = _to_phys(
                out_df, data_cols, pfields,
                keep=rt if rt is not None else (),
            )
        out_df.write.mode("overwrite").parquet(tmp)
        pv = pv_of_pid[0]
        for part in sorted(
            _glob.glob(os.path.join(tmp, "part-*.parquet"))
        ):
            rel = (f"part-{version:05d}-{file_seq:04d}-"
                    f"{_file_token(table_path)}-merge.parquet")
            file_seq += 1
            _put_data(part, os.path.join(table_path, rel))
            new_adds.append({"path": rel, "partitionValues": pv})
    else:
        out_df = merged.repartitionByRange(
            n_files, F.col("__pid"), F.col(key_col)
        )
        if mapped:
            out_df = _to_phys(
                out_df, data_cols, pfields,
                keep=("__pid", *rt) if rt is not None else ("__pid",),
            )
        (
            out_df.write.partitionBy("__pid")
            .mode("overwrite")
            .parquet(tmp)
        )
        for pdir in sorted(_glob.glob(os.path.join(tmp, "__pid=*"))):
            pid = int(os.path.basename(pdir).split("=", 1)[1])
            pv = pv_of_pid[pid]
            for part in sorted(
                _glob.glob(os.path.join(pdir, "part-*.parquet"))
            ):
                rel = (f"part-{version:05d}-{file_seq:04d}-"
                    f"{_file_token(table_path)}-merge.parquet")
                file_seq += 1
                _put_data(part, os.path.join(table_path, rel))
                new_adds.append({"path": rel, "partitionValues": pv})
    shutil.rmtree(tmp)

    cdc_rel: list[str] = []
    if change_data:
        if cond_changes is not None:
            # conditional clauses: the CDF row set came out of the
            # clause algebra itself (pre/post images for update-clause
            # rows, delete rows, inserts; pass-through rows silent)
            changes = cond_changes
        elif pre is not None:
            # marker column makes "matched" null-key-safe: eqNullSafe
            # joins null==null but the joined key itself is null there
            pk = (
                pre.select(
                    F.col(key_col).alias("__pk"),
                    F.col("__pid").alias("__ppid"),
                )
                .distinct()
                .withColumn("__m", F.lit(1))
            )
            matched = F.col(f"b.{key_col}").eqNullSafe(
                F.col("__pk")
            ) & (F.col("b.__pid") == F.col("__ppid"))
            post = (
                latest_p.alias("b")
                .join(pk, matched, "left")
                .select(
                    *[F.col(f"b.{c}") for c in data_cols],
                    F.col("b.__pid"),
                    F.when(
                        F.col("__m").isNotNull(),
                        F.lit("update_postimage"),
                    )
                    .otherwise(F.lit("insert"))
                    .alias("_change_type"),
                )
            )
            changes = pre.withColumn(
                "_change_type", F.lit("update_preimage")
            ).unionByName(post)
        else:
            changes = latest_p.withColumn(
                "_change_type", F.lit("insert")
            )
        # re-attach the typed partition columns from the pid lookup
        if pid_df_all is not None:
            changes = changes.join(F.broadcast(pid_df_all), "__pid")
        changes_all = changes.select(*latest.columns, "_change_type")
        if mapped:  # cdc parquet carries physical names, like data
            changes_all = _to_phys(
                changes_all, list(latest.columns), pfields,
                keep=("_change_type",),
            )
        cdc_tmp = os.path.join(table_path, f"_tmp-cdc-v{version}")
        changes_all.write.mode("overwrite").parquet(cdc_tmp)
        os.makedirs(
            os.path.join(table_path, "_change_data"), exist_ok=True
        )
        for i, part in enumerate(
            sorted(_glob.glob(os.path.join(cdc_tmp, "part-*.parquet")))
        ):
            rel = f"_change_data/cdc-{version:05d}-{i:04d}.parquet"
            _put_data(part, os.path.join(table_path, rel))
            cdc_rel.append(rel)
        shutil.rmtree(cdc_tmp)

    # stats-scan ONLY the new files' key column (footer-cheap read)
    new_rel = [a["path"] for a in new_adds]
    by_name = {}
    if new_rel:
        by_name = _collect_file_stats(
            spark, table_path, new_rel, phys(key_col),
            _phys_schema(data_schema, pfields) if mapped else data_schema,
        )

    actions: list[dict] = []
    if version == 0:
        import uuid

        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid5(uuid.NAMESPACE_URL, table_path)),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": latest.schema.json(),
                    "partitionColumns": part_cols,
                    "configuration": {},
                }
            }
        )
    elif evolved or meta_restate:
        # schema evolution / identity-watermark advance: this commit
        # re-states metaData; replay picks the LAST metaData, so older
        # versions time-travel with their original schema.
        # state["meta"] carries the correct schemaString in every
        # branch (minted columnMapping metadata on mapped tables,
        # old-field JSON preserved verbatim otherwise — a Spark-schema
        # rebuild would DROP field metadata like generation
        # expressions and identity watermarks).
        actions.append({"metaData": dict(state["meta"])})
    if batch_id is not None:
        actions.append({"txn": {"appId": app_id, "version": batch_id}})
    rt_base = _rt_high_watermark(state) + 1 if rt is not None else None
    for pending in new_adds:
        rel = pending["path"]
        r = by_name.get(rel)
        if r is None:  # empty part file: not worth an add action
            os.remove(os.path.join(table_path, rel))
            continue
        add = {
            "path": rel,
            "partitionValues": pending["partitionValues"],
            "size": os.path.getsize(os.path.join(table_path, rel)),
            "modificationTime": 0,
            "dataChange": True,
            "stats": json.dumps(r, default=str),
        }
        if rt is not None:
            # fresh-id reservation: each add covers record_count ids
            # from the watermark (rows with materialized ids leave
            # theirs unused — the spec only needs uniqueness)
            add["baseRowId"] = rt_base
            add["defaultRowCommitVersion"] = version
            rt_base += int(r["numRecords"])
        actions.append({"add": add})
    if rt is not None:
        actions.append(_rt_domain_action(rt_base - 1))
    for path in hit_paths:
        actions.append(
            {
                "remove": _remove_action(
                    path, state["live"][path], data_change=True
                )
            }
        )
    for rel in cdc_rel:
        full = os.path.join(table_path, rel)
        if os.path.getsize(full) == 0:
            os.remove(full)
            continue
        actions.append(
            {
                "cdc": {
                    "path": rel,
                    "partitionValues": {},
                    "size": os.path.getsize(full),
                    "dataChange": False,
                }
            }
        )
    op_params: dict = {"key": key_col}
    if when_matched:
        # commitInfo records the clause predicates (delta-spark puts
        # matchedPredicates/notMatchedBySourcePredicates in
        # operationParameters the same way)
        op_params["matchedPredicates"] = json.dumps(
            [
                {"predicate": cl[1] or "true", "actionType": cl[0]}
                for cl in when_matched
            ]
        )
    if when_not_matched is not None:
        op_params["notMatchedPredicates"] = json.dumps(
            [
                {"predicate": cl[1] or "true", "actionType": cl[0]}
                for cl in when_not_matched
            ]
        )
    if when_not_matched_by_source:
        op_params["notMatchedBySourcePredicates"] = json.dumps(
            [
                {"predicate": cl[1] or "true", "actionType": cl[0]}
                for cl in when_not_matched_by_source
            ]
        )
    _commit(
        _log_dir(table_path), version, actions,
        operation="MERGE", operation_params=op_params,
    )
    if checkpoint_interval and version > 0 and (
        version % checkpoint_interval == 0
    ):
        _write_checkpoint(spark, table_path, version)
    return version


def delete_delta_where(
    spark: SparkSession,
    table_path: str,
    where: str,
    change_data: bool = False,
    target_rows_per_file: int = 1_000_000,
) -> int | None:
    """``DELETE FROM t WHERE <predicate>`` — predicate DML, the other
    half of Delta's row-level surface next to key erasure
    (``delete_delta_keys``) and MERGE. Two-phase copy-on-write, the
    same shape real engines run for arbitrary predicates: ONE scan
    finds the files that contain matching rows (per-file match
    counts — an untouched file is never rewritten), then only those
    files rewrite without their matching rows (null predicates keep
    the row, SQL three-valued DELETE semantics). The predicate sees
    data AND partition columns (partition values re-attach typed from
    the log). Returns the committed version, or None when nothing
    matched (no version burned). ``change_data=True`` records the
    deleted rows as CDF ``delete`` entries."""
    return _dml_where(
        spark, table_path, where, None, change_data,
        target_rows_per_file,
    )


def update_delta_where(
    spark: SparkSession,
    table_path: str,
    set: dict,
    where: str | None = None,
    change_data: bool = False,
    target_rows_per_file: int = 1_000_000,
) -> int | None:
    """``UPDATE t SET col = expr[, ...] WHERE <predicate>`` —
    predicate UPDATE over the same two-phase copy-on-write plan as
    :func:`delete_delta_where` (scan for touched files, rewrite only
    those; rows whose predicate is false or null pass through
    unchanged). Assignments may not touch partition columns (row
    migration — use MERGE), generated columns (their values are
    derived), or identity columns. CHECK constraints gate the updated
    rows. ``change_data=True`` records update_preimage/postimage CDF
    rows."""
    if not set or not isinstance(set, dict):
        raise ValueError("delta update: SET needs {col: value_sql}")
    return _dml_where(
        spark, table_path, where, dict(set), change_data,
        target_rows_per_file,
    )


def _dml_where(
    spark: SparkSession,
    table_path: str,
    where: str | None,
    set_exprs: dict | None,
    change_data: bool,
    target_rows_per_file: int,
) -> int | None:
    """Shared core of DELETE WHERE / UPDATE WHERE (``set_exprs`` None
    means delete). See the public wrappers for semantics."""
    if not os.path.isdir(_log_dir(table_path)):
        raise ValueError(f"delta dml: no table at {table_path}")
    state = replay_log(spark, table_path)
    phys, mapped, pfields = _phys_of(state["meta"])
    rt = _row_tracking_of(state["meta"])
    live = state["live"]
    if not live:
        return None
    schema = T.StructType.fromJson(
        json.loads(state["meta"]["schemaString"])
    )
    part_cols = list(state["meta"].get("partitionColumns") or [])
    data_schema = T.StructType(
        [f for f in schema.fields if f.name not in part_cols]
    )
    data_cols = [f.name for f in data_schema.fields]
    _check_append_only(state["meta"], "update" if set_exprs else "delete")
    if set_exprs:
        fields_meta = {
            f["name"]: f.get("metadata") or {}
            for f in json.loads(state["meta"]["schemaString"])["fields"]
        }
        for c in set_exprs:
            if c in part_cols:
                raise ValueError(
                    f"delta update: SET may not assign partition "
                    f"column {c!r} (row migration — use MERGE)"
                )
            if c not in data_cols:
                raise ValueError(f"delta update: unknown column {c!r}")
            md_ = fields_meta.get(c) or {}
            if "delta.generationExpression" in md_:
                raise ValueError(
                    f"delta update: {c!r} is a generated column — its "
                    "value is derived, not assignable"
                )
            if any(k.startswith("delta.identity.") for k in md_):
                raise ValueError(
                    f"delta update: {c!r} is an identity column"
                )

    pred = F.expr(where) if where else F.lit(True)
    hit = F.coalesce(pred, F.lit(False))  # null predicate: row keeps

    # typed partition values + routing pid per file basename (Delta
    # partitionValues are strings keyed by physical names)
    type_of = {f.name: f.dataType for f in schema.fields}
    pv_of = {
        p.rsplit("/", 1)[-1]: tuple(
            (a.get("partitionValues") or {}).get(phys(c))
            for c in part_cols
        )
        for p, a in live.items()
    }
    if len(pv_of) != len(live):
        raise NotImplementedError(
            "delta dml: live files share a basename — the routing "
            "join would misattribute rows"
        )

    def _read(paths: list[str]):
        cur = _read_files_dv_aware(
            spark, table_path, data_schema, paths, live,
            basename_col="__bn", pfields=pfields,
            row_tracking=rt,
        )
        if part_cols:
            lk = local_rows_df(spark, 
                [
                    (bn,) + pv_of[bn]
                    for bn in sorted(
                        p.rsplit("/", 1)[-1] for p in paths
                    )
                ],
                T.StructType(
                    [T.StructField("__bn", T.StringType(), False)]
                    + [
                        T.StructField(c, T.StringType(), True)
                        for c in part_cols
                    ]
                ),
            )
            for c in part_cols:
                lk = lk.withColumn(c, F.col(c).cast(type_of[c]))
            cur = cur.join(F.broadcast(lk), "__bn")
        return cur

    # ---- phase 1: which files contain matching rows? (one scan) ----
    all_paths = sorted(live)
    per_file = (
        _read(all_paths)
        .groupBy("__bn")
        .agg(F.sum(hit.cast("long")).alias("__hits"))
        .collect()
    )
    touched_bn = sorted(
        r["__bn"] for r in per_file if int(r["__hits"] or 0) > 0
    )
    if not touched_bn:
        return None  # nothing matched: no version burned
    bn_to_path = {p.rsplit("/", 1)[-1]: p for p in live}
    touched = [bn_to_path[bn] for bn in touched_bn]

    version = state["version"] + 1
    ptuples = sorted({pv_of[bn] for bn in touched_bn}, key=str)
    pid_of = {pt: i for i, pt in enumerate(ptuples)}
    single = len(ptuples) == 1

    # ---- phase 2: rewrite ONLY the touched files ----
    cur = _read(touched)
    if set_exprs is None:
        out = cur.filter(~hit)
    else:
        out = cur.select(
            *[
                F.when(hit, F.expr(set_exprs[c]).cast(type_of[c]))
                .otherwise(F.col(c))
                .alias(c)
                if c in set_exprs
                else F.col(c)
                for c in data_cols
            ],
            *[F.col(c) for c in ["__bn"] + part_cols],
            *(
                [
                    # row tracking's UPDATE contract: the row KEEPS
                    # its id; a null materialized commit version
                    # derives from this add's defaultRowCommitVersion
                    F.col("__rt_id"),
                    F.when(hit, F.lit(None).cast("long"))
                    .otherwise(F.col("__rt_cv"))
                    .alias("__rt_cv"),
                ]
                if rt is not None
                else []
            ),
        )
        if state["meta"] is not None:
            from optimus_any2any_spark.sources.delta import (
                check_delta_constraints,
            )

            check_delta_constraints(
                state["meta"], out.drop("__bn"), "update"
            )

    pre = None
    if change_data:
        pre_src = cur
        if rt is not None:  # CDF rows are logical — no lineage cols
            pre_src = cur.drop("__rt_id", "__rt_cv")
        pre = pre_src.filter(hit).localCheckpoint(eager=False)

    if rt is not None:
        out = out.withColumnRenamed(
            "__rt_id", rt[0]
        ).withColumnRenamed("__rt_cv", rt[1])

    # route rows back to their files' partitions and write
    total_rows = sum(
        max(
            _entry_from_add(
                bn_to_path[bn], live[bn_to_path[bn]],
                phys(data_cols[0]),
            )["rows"],
            0,
        )
        for bn in touched_bn
    )
    n_files = max(1, -(-total_rows // target_rows_per_file))
    if single:
        body = out.drop("__bn", *part_cols).repartitionByRange(
            n_files, F.col(data_cols[0])
        )
        if mapped:
            body = _to_phys(
                body, data_cols, pfields,
                keep=rt if rt is not None else (),
            )
    else:
        pid_lk = local_rows_df(spark, 
            [(bn, pid_of[pv_of[bn]]) for bn in touched_bn],
            T.StructType(
                [
                    T.StructField("__bn", T.StringType(), False),
                    T.StructField("__pid", T.IntegerType(), False),
                ]
            ),
        )
        body = (
            out.drop(*part_cols)
            .join(F.broadcast(pid_lk), "__bn")
            .drop("__bn")
            .repartitionByRange(
                n_files, F.col("__pid"), F.col(data_cols[0])
            )
        )
        if mapped:
            body = _to_phys(
                body, data_cols, pfields,
                keep=("__pid", *rt) if rt is not None else ("__pid",),
            )

    tmp = os.path.join(table_path, f"_tmp-dml-v{version}")
    op = "UPDATE" if set_exprs else "DELETE"
    tag = op.lower()
    new_files: list[tuple[str, dict]] = []
    file_seq = 0
    if single:
        body.write.mode("overwrite").parquet(tmp)
        pv = {
            phys(c): v for c, v in zip(part_cols, ptuples[0])
        }
        for part in sorted(
            _glob.glob(os.path.join(tmp, "part-*.parquet"))
        ):
            rel = (f"part-{version:05d}-{file_seq:04d}-"
                f"{_file_token(table_path)}-{tag}.parquet")
            file_seq += 1
            _put_data(part, os.path.join(table_path, rel))
            new_files.append((rel, pv))
    else:
        body.write.partitionBy("__pid").mode("overwrite").parquet(tmp)
        for pdir in sorted(_glob.glob(os.path.join(tmp, "__pid=*"))):
            pid = int(os.path.basename(pdir).split("=", 1)[1])
            pv = {
                phys(c): v
                for c, v in zip(part_cols, ptuples[pid])
            }
            for part in sorted(
                _glob.glob(os.path.join(pdir, "part-*.parquet"))
            ):
                rel = (
                    f"part-{version:05d}-{file_seq:04d}-{tag}.parquet"
                )
                file_seq += 1
                _put_data(part, os.path.join(table_path, rel))
                new_files.append((rel, pv))
    shutil.rmtree(tmp)

    cdc_rel: list[str] = []
    if change_data and pre is not None:
        if set_exprs is None:
            changes = pre.drop("__bn").withColumn(
                "_change_type", F.lit("delete")
            )
        else:
            pre_rows = pre.drop("__bn").withColumn(
                "_change_type", F.lit("update_preimage")
            )
            post_rows = pre.select(
                *[
                    F.when(
                        hit, F.expr(set_exprs[c]).cast(type_of[c])
                    )
                    .otherwise(F.col(c))
                    .alias(c)
                    if c in set_exprs
                    else F.col(c)
                    for c in data_cols
                ],
                *[F.col(c) for c in part_cols],
            ).withColumn("_change_type", F.lit("update_postimage"))
            changes = pre_rows.unionByName(post_rows)
        changes_all = changes.select(
            *[f.name for f in schema.fields], "_change_type"
        )
        if mapped:
            changes_all = _to_phys(
                changes_all, [f.name for f in schema.fields], pfields,
                keep=("_change_type",),
            )
        cdc_tmp = os.path.join(table_path, f"_tmp-cdc-v{version}")
        changes_all.write.mode("overwrite").parquet(cdc_tmp)
        os.makedirs(
            os.path.join(table_path, "_change_data"), exist_ok=True
        )
        for i, part in enumerate(
            sorted(_glob.glob(os.path.join(cdc_tmp, "part-*.parquet")))
        ):
            rel = f"_change_data/cdc-{version:05d}-{i:04d}.parquet"
            _put_data(part, os.path.join(table_path, rel))
            cdc_rel.append(rel)
        shutil.rmtree(cdc_tmp)

    by_name = _collect_file_stats(
        spark, table_path, [r for r, _ in new_files],
        phys(data_cols[0]),
        _phys_schema(data_schema, pfields) if mapped else data_schema,
    ) if new_files else {}
    actions: list[dict] = []
    rt_base = _rt_high_watermark(state) + 1 if rt is not None else None
    for rel, pv in new_files:
        full = os.path.join(table_path, rel)
        st = by_name.get(rel)
        if st is None:  # every row of this part matched a DELETE
            os.remove(full)
            continue
        add = {
            "path": rel,
            "partitionValues": pv,
            "size": os.path.getsize(full),
            "modificationTime": 0,
            "dataChange": True,
            "stats": json.dumps(st, default=str),
        }
        if rt is not None:
            add["baseRowId"] = rt_base
            add["defaultRowCommitVersion"] = version
            rt_base += int(st["numRecords"])
        actions.append({"add": add})
    if rt is not None:
        actions.append(_rt_domain_action(rt_base - 1))
    for p in touched:
        actions.append(
            {"remove": _remove_action(p, live[p], data_change=True)}
        )
    for rel in cdc_rel:
        full = os.path.join(table_path, rel)
        if os.path.getsize(full) == 0:
            os.remove(full)
            continue
        actions.append(
            {
                "cdc": {
                    "path": rel,
                    "partitionValues": {},
                    "size": os.path.getsize(full),
                    "dataChange": False,
                }
            }
        )
    _commit(
        _log_dir(table_path), version, actions,
        operation=op,
        operation_params={"predicate": where or "true"},
    )
    return version


def enable_delta_row_tracking(
    spark: SparkSession, table_path: str
) -> int:
    """Enable ROW TRACKING on an EXISTING table — the BACKFILL the
    merge reader used to refuse (PROTOCOL.md Row Tracking; delta-spark
    ``ALTER TABLE ... SET TBLPROPERTIES('delta.enableRowTracking' =
    'true')`` plus its backfill job). Done the protocol's cheap way:
    ONE metadata commit that upgrades the protocol to v7
    (rowTracking + domainMetadata writer features), records the
    materialized column names in the configuration, and RE-COMMITS
    every live add action with a fresh ``baseRowId`` reservation and
    ``defaultRowCommitVersion`` = the backfill version
    (``dataChange: false`` — zero data IO; ids derive from baseRowId +
    position exactly like fresh writes). Reservation sizes come from
    each add's ``stats.numRecords``, falling back to a driver-side
    parquet footer read. Idempotent: an already-enabled table returns
    its current version."""
    import uuid as _uuid

    state = replay_log(spark, table_path)
    if state["meta"] is None:
        raise ValueError(
            f"delta row tracking: no table at {table_path}"
        )
    if _row_tracking_of(state["meta"]) is not None:
        return state["version"]
    version = state["version"] + 1
    meta2 = dict(state["meta"])
    conf = dict(meta2.get("configuration") or {})
    conf["delta.enableRowTracking"] = "true"
    suffix = str(
        _uuid.uuid5(_uuid.NAMESPACE_URL, f"{table_path}|rowid")
    )
    conf["delta.rowTracking.materializedRowIdColumnName"] = (
        f"_row-id-col-{suffix}"
    )
    conf[
        "delta.rowTracking.materializedRowCommitVersionColumnName"
    ] = f"_row-commit-version-col-{suffix}"
    meta2["configuration"] = conf
    prev_protocol = state.get("protocol") or {
        "minReaderVersion": 1,
        "minWriterVersion": 2,
    }
    features = set(prev_protocol.get("writerFeatures") or [])
    # A legacy-versioned protocol (minWriterVersion 2-6) implies writer
    # features by NUMBER; the v7 upgrade must list them explicitly or
    # external writers silently stop enforcing appendOnly/invariants/
    # checkConstraints/CDF/generated/identity on this table.
    old_w = int(prev_protocol.get("minWriterVersion", 2))
    if old_w < 7:
        for v, feats in _LEGACY_WRITER_FEATURES.items():
            if old_w >= v:
                features.update(feats)
    features |= {"rowTracking", "domainMetadata"}
    old_r = int(prev_protocol.get("minReaderVersion", 1))
    protocol = {
        "minReaderVersion": old_r,
        "minWriterVersion": 7,
        "writerFeatures": sorted(features),
    }
    if old_r >= 3:
        # readerFeatures is REQUIRED at reader >= 3 — dropping it
        # (e.g. a deletionVectors table's) would let external readers
        # resurrect DV-deleted rows
        protocol["readerFeatures"] = sorted(
            set(prev_protocol.get("readerFeatures") or [])
        )
    actions: list[dict] = [
        {"protocol": protocol},
        {"metaData": meta2},
    ]
    base = 0
    for p, a in sorted(state["live"].items()):
        n = None
        st = a.get("stats")
        if st:
            try:
                n = int(json.loads(st).get("numRecords"))
            except (ValueError, TypeError):
                n = None
        if n is None:
            import pyarrow.parquet as _pq

            n = int(
                _pq.read_metadata(
                    os.path.join(table_path, p)
                ).num_rows
            )
        a2 = dict(a)
        a2["baseRowId"] = base
        a2["defaultRowCommitVersion"] = version
        a2["dataChange"] = False
        base += n
        actions.append({"add": a2})
    actions.append(_rt_domain_action(base - 1))
    _commit(
        _log_dir(table_path), version, actions,
        operation="ROW TRACKING BACKFILL",
    )
    return version


def convert_parquet_to_delta(
    spark: SparkSession,
    directory: str,
    partition_by: list[str] | None = None,
) -> int:
    """CONVERT TO DELTA (delta-spark's in-place migration): commit 0
    written INTO the existing parquet directory registers every data
    file as an add action — zero data movement, footer-read record
    counts, zero Spark jobs beyond one schema inference. The 100 TB
    migration story: a parquet lake becomes a Delta table as
    driver-side metadata work, and every writer here (merge, DML,
    OPTIMIZE, DV deletes) then applies.

    ``partition_by`` names the hive-partition directory levels in
    nesting order (``col=value`` components); values parse from the
    directory names into partitionValues strings exactly as Delta
    stores them (``__HIVE_DEFAULT_PARTITION__`` → null), and readers
    re-type them from the schema — the same typing rule as every
    partitioned write. Entries may carry an explicit type
    (``"part string"`` — delta-spark's ``PARTITIONED BY (part
    STRING)``), which overrides Spark's directory-name type
    inference; a bare name keeps the inferred type."""
    import urllib.parse as _up
    import uuid as _uuid_mod

    import pyarrow.parquet as _pq

    if os.path.isdir(_log_dir(directory)):
        raise ValueError(
            f"delta convert: {directory} is already a Delta table"
        )
    part_cols: list[str] = []
    part_types: dict[str, T.DataType] = {}
    for item in partition_by or []:
        bits = item.split()
        part_cols.append(bits[0])
        if len(bits) > 1:
            part_types[bits[0]] = T.StructType.fromDDL(
                item
            ).fields[0].dataType
    files: list[tuple[str, dict]] = []
    for root, _dirs, names in sorted(os.walk(directory)):
        rel_root = os.path.relpath(root, directory)
        comps = [] if rel_root == "." else rel_root.split(os.sep)
        pv: dict[str, str | None] = {}
        for c in comps:
            if "=" in c:
                k, v = c.split("=", 1)
                pv[k] = (
                    None
                    if v == "__HIVE_DEFAULT_PARTITION__"
                    else _up.unquote(v)
                )
        for n in sorted(names):
            if not n.endswith(".parquet"):
                continue
            rel = n if rel_root == "." else f"{rel_root}/{n}"
            files.append((rel, pv))
    # Spark's partitioned writes reuse one task's file name across
    # partition directories, so hive layouts routinely repeat
    # basenames — and this engine's DV/pid joins key files by
    # basename. De-collide IN PLACE: an os.rename inside the same
    # directory is metadata-only (still zero data copy), prefixing a
    # short hash of the partition path.
    seen: dict[str, int] = {}
    for rel, _pv in files:
        bn = rel.rsplit("/", 1)[-1]
        seen[bn] = seen.get(bn, 0) + 1
    renamed: list[tuple[str, dict]] = []
    for rel, pv in files:
        bn = rel.rsplit("/", 1)[-1]
        if seen[bn] > 1 and "/" in rel:
            sub = rel.rsplit("/", 1)[0]
            tok = _uuid_mod.uuid5(
                _uuid_mod.NAMESPACE_URL, sub
            ).hex[:8]
            new_rel = f"{sub}/{tok}-{bn}"
            os.rename(
                os.path.join(directory, rel),
                os.path.join(directory, new_rel),
            )
            renamed.append((new_rel, pv))
        else:
            renamed.append((rel, pv))
    files = renamed
    if not files:
        raise ValueError(
            f"delta convert: no parquet files under {directory}"
        )
    bad = [
        pv for _r, pv in files if sorted(pv) != sorted(part_cols)
    ]
    if bad:
        raise ValueError(
            "delta convert: directory layout does not match "
            f"partition_by={part_cols} (found partition keys "
            f"{sorted(set(k for pv in bad for k in pv))})"
        )
    schema = spark.read.parquet(directory).schema
    if part_types:
        # explicit partition types override directory-name inference
        # (delta-spark requires the explicit schema for this reason)
        schema = T.StructType(
            [
                T.StructField(
                    f.name, part_types.get(f.name, f.dataType),
                    f.nullable,
                )
                for f in schema.fields
            ]
        )
    missing = [c for c in part_cols if c not in schema.fieldNames()]
    if missing:
        raise ValueError(
            f"delta convert: partition columns {missing} not "
            "discovered in the directory layout"
        )
    import uuid as _uuid

    actions: list[dict] = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": str(
                    _uuid.uuid5(
                        _uuid.NAMESPACE_URL, f"{directory}|convert"
                    )
                ),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": part_cols,
                "configuration": {},
            }
        },
    ]
    for rel, pv in files:
        full = os.path.join(directory, rel)
        n = int(_pq.read_metadata(full).num_rows)
        if n == 0:
            continue  # a rowless file adds nothing (and stays put)
        actions.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": dict(pv),
                    "size": os.path.getsize(full),
                    "modificationTime": 0,
                    "dataChange": True,
                    "stats": json.dumps({"numRecords": n}),
                }
            }
        )
    _commit(
        _log_dir(directory), 0, actions,
        operation="CONVERT",
        operation_params={"partitionBy": json.dumps(part_cols)},
    )
    return 0


def shallow_clone_delta(
    spark: SparkSession,
    source_path: str,
    target_path: str,
    version: int | None = None,
) -> int:
    """SHALLOW CLONE (delta-spark ``CREATE TABLE ... SHALLOW CLONE``):
    a NEW table whose commit 0 re-states the source snapshot's live
    adds with ABSOLUTE paths into the source directory — zero data
    copy. Later writes land in the clone's own directory (file names
    carry a table-unique token, so they never collide with source
    basenames) and never touch the source; VACUUM only scans the
    clone's directory, so source files are structurally out of reach.
    The metaData copies schema/partitioning/configuration under a
    FRESH table id; the protocol and the ``delta.rowTracking`` domain
    (watermark) carry, so row ids stay stable across the clone
    boundary. DV descriptors convert to absolute ``p``-storage form.
    Time travel on the clone starts at the clone (version 0), exactly
    like delta-spark. ``version=`` clones a historical source
    snapshot (CLONE ... VERSION AS OF)."""
    import uuid as _uuid

    from optimus_any2any_spark.formats.roaring import z85_decode

    state = replay_log(spark, source_path, version=version)
    if state["meta"] is None:
        raise ValueError(
            f"delta clone: no table at {source_path}"
        )
    if os.path.isdir(_log_dir(target_path)):
        raise ValueError(
            f"delta clone: table already exists at {target_path}"
        )
    src_abs = os.path.abspath(source_path)
    meta2 = dict(state["meta"])
    meta2["id"] = str(
        _uuid.uuid5(_uuid.NAMESPACE_URL, f"{target_path}|clone")
    )
    actions: list[dict] = [
        {
            "protocol": state.get("protocol")
            or {"minReaderVersion": 1, "minWriterVersion": 2}
        },
        {"metaData": meta2},
    ]
    for p, a in sorted(state["live"].items()):
        a2 = dict(a)
        a2["path"] = (
            p if p.startswith("/") else os.path.join(src_abs, p)
        )
        a2["dataChange"] = True
        dv = a2.get("deletionVector")
        if dv:
            st_ = dv["storageType"]
            if st_ == "u":
                enc = dv["pathOrInlineDv"]
                prefix, uid_txt = enc[:-20], enc[-20:]
                uid = _uuid.UUID(bytes=z85_decode(uid_txt))
                rel = f"deletion_vector_{uid}.bin"
                fpath = (
                    os.path.join(src_abs, prefix, rel)
                    if prefix
                    else os.path.join(src_abs, rel)
                )
                a2["deletionVector"] = {
                    **dv, "storageType": "p", "pathOrInlineDv": fpath,
                }
            elif st_ == "p" and not dv["pathOrInlineDv"].startswith(
                ("/", "file://")
            ):
                a2["deletionVector"] = {
                    **dv,
                    "pathOrInlineDv": os.path.join(
                        src_abs, dv["pathOrInlineDv"]
                    ),
                }
            # inline ('i') descriptors carry their bytes — verbatim
        actions.append({"add": a2})
    for dom, conf in sorted((state.get("domains") or {}).items()):
        actions.append(
            {
                "domainMetadata": {
                    "domain": dom,
                    "configuration": conf,
                    "removed": False,
                }
            }
        )
    os.makedirs(target_path, exist_ok=True)
    _commit(
        _log_dir(target_path), 0, actions,
        operation="CLONE",
        operation_params={
            "source": src_abs,
            "sourceVersion": str(state["version"]),
        },
    )
    return 0


def purge_deletion_vectors(
    spark: SparkSession,
    table_path: str,
    target_rows_per_file: int = 1_000_000,
    key_col: str | None = None,
) -> int | None:
    """REORG ... APPLY (PURGE): rewrite every DV'd file WITHOUT its
    deleted rows and drop the vectors — the operation that converts
    merge-on-read debt back into clean copy-on-write files, and the
    bulk form of paying that debt down (MERGE/DELETE/OPTIMIZE also
    work over DV'd tables directly, consuming vectors as they touch
    each file — purge clears ALL of them at once). ``dataChange: false``
    (like OPTIMIZE): streaming/CDF readers skip the commit. Returns
    the committed version, or None when no live file carries a vector.

    One read of the DV'd files (+ the executor-side vector decode),
    one anti-join, one write split per partition tuple, one grouped
    stats pass — constant jobs in files and partitions."""
    from optimus_any2any_spark.sources.delta import (
        _dv_descriptor_rows,
        dv_positions_df,
    )

    state = replay_log(spark, table_path)
    if state["meta"] is None:
        return None
    phys, mapped, pfields = _phys_of(state["meta"])
    dv_adds = {
        p: a
        for p, a in state["live"].items()
        if a.get("deletionVector")
    }
    if not dv_adds:
        return None
    version = state["version"] + 1
    schema = T.StructType.fromJson(
        json.loads(state["meta"]["schemaString"])
    )
    part_cols = state["meta"].get("partitionColumns") or []
    data_schema = T.StructType(
        [f for f in schema.fields if f.name not in part_cols]
    )
    stat_col = key_col or (
        data_schema.fields[0].name if data_schema.fields else None
    )

    ptuples = sorted(
        {
            tuple(
                (a.get("partitionValues") or {}).get(phys(c))
                for c in part_cols
            )
            for a in dv_adds.values()
        },
        key=str,
    )
    pid_of = {pt: i for i, pt in enumerate(ptuples)}
    single = len(ptuples) == 1
    bn_pid = [
        (
            p.rsplit("/", 1)[-1],
            pid_of[
                tuple(
                    (a.get("partitionValues") or {}).get(phys(c))
                    for c in part_cols
                )
            ],
        )
        for p, a in sorted(dv_adds.items())
    ]

    rt = _row_tracking_of(state["meta"])
    read_schema = (
        _phys_schema(data_schema, pfields) if mapped else data_schema
    )
    if rt is not None:
        read_schema = T.StructType(
            list(read_schema.fields)
            + [
                T.StructField(rt[0], T.LongType(), True),
                T.StructField(rt[1], T.LongType(), True),
            ]
        )
    cur = (
        spark.read.schema(read_schema)
        .parquet(*[os.path.join(table_path, p) for p in dv_adds])
        .select(
            *[
                F.col(
                    "`"
                    + (pfields[f.name].name if mapped else f.name)
                    + "`"
                ).cast(f.dataType).alias(f.name)
                for f in data_schema.fields
            ],
            *(
                [F.col("`" + rt[0] + "`"), F.col("`" + rt[1] + "`")]
                if rt is not None
                else []
            ),
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("__dv_bn"),
            F.col("_metadata.row_index").alias("__dv_pos"),
        )
    )
    deleted = dv_positions_df(
        spark, _dv_descriptor_rows(table_path, dv_adds)
    )
    kept = cur.join(deleted, ["__dv_bn", "__dv_pos"], "left_anti")
    if rt is not None:
        # the purge rewrite must not re-mint ids: every surviving row
        # materializes its id and commit version
        rt_rows = []
        for p, a in sorted(dv_adds.items()):
            if (
                a.get("baseRowId") is None
                or a.get("defaultRowCommitVersion") is None
            ):
                raise NotImplementedError(
                    "delta row tracking: live file "
                    f"{p!r} carries no baseRowId — backfill of "
                    "pre-enablement files is beyond this writer"
                )
            rt_rows.append(
                (
                    p.rsplit("/", 1)[-1],
                    int(a["baseRowId"]),
                    int(a["defaultRowCommitVersion"]),
                )
            )
        rlk = local_rows_df(spark, 
            rt_rows, "__dv_bn string, __rt_base long, __rt_dcv long"
        )
        kept = (
            kept.join(F.broadcast(rlk), "__dv_bn")
            .withColumn(
                rt[0],
                F.coalesce(
                    F.col("`" + rt[0] + "`"),
                    F.col("__rt_base") + F.col("__dv_pos"),
                ),
            )
            .withColumn(
                rt[1],
                F.coalesce(
                    F.col("`" + rt[1] + "`"), F.col("__rt_dcv")
                ),
            )
            .drop("__rt_base", "__rt_dcv")
        )
    if single:
        kept = kept.drop("__dv_pos", "__dv_bn")
    else:
        pid_lk = local_rows_df(spark, 
            bn_pid,
            T.StructType(
                [
                    T.StructField("__dv_bn", T.StringType(), False),
                    T.StructField("__pid", T.IntegerType(), False),
                ]
            ),
        )
        kept = (
            kept.drop("__dv_pos")
            .join(F.broadcast(pid_lk), "__dv_bn", "inner")
            .drop("__dv_bn")
        )

    total_rows = sum(
        max(_entry_from_add(p, a, phys(stat_col) if stat_col else "")
            ["rows"], 0)
        for p, a in dv_adds.items()
    )
    n_files = max(1, -(-total_rows // target_rows_per_file))
    tmp = os.path.join(table_path, f"_tmp-purge-v{version}")
    new_files: list[tuple[str, dict]] = []
    file_seq = 0
    data_cols = [f.name for f in data_schema.fields]
    if single:
        out_df = (
            kept.repartitionByRange(n_files, F.col(stat_col))
            if stat_col is not None
            else kept.coalesce(n_files)
        )
        if mapped:
            out_df = _to_phys(
                out_df, data_cols, pfields,
                keep=rt if rt is not None else (),
            )
        out_df.write.mode("overwrite").parquet(tmp)
        pv = next(
            iter(dv_adds.values())
        ).get("partitionValues") or {}
        for part in sorted(
            _glob.glob(os.path.join(tmp, "part-*.parquet"))
        ):
            rel = (f"part-{version:05d}-{file_seq:04d}-"
                    f"{_file_token(table_path)}-purge.parquet")
            file_seq += 1
            _put_data(part, os.path.join(table_path, rel))
            new_files.append((rel, pv))
    else:
        pv_of_pid = {
            pid_of[pt]: {
                phys(c): v for c, v in zip(part_cols, pt)
            }
            for pt in ptuples
        }
        range_cols = [F.col("__pid")] + (
            [F.col(stat_col)] if stat_col is not None else []
        )
        out_df = kept.repartitionByRange(n_files, *range_cols)
        if mapped:
            out_df = _to_phys(
                out_df, data_cols, pfields,
                keep=("__pid", *rt) if rt is not None else ("__pid",),
            )
        (
            out_df.write.partitionBy("__pid")
            .mode("overwrite")
            .parquet(tmp)
        )
        for pdir in sorted(_glob.glob(os.path.join(tmp, "__pid=*"))):
            pid = int(os.path.basename(pdir).split("=", 1)[1])
            for part in sorted(
                _glob.glob(os.path.join(pdir, "part-*.parquet"))
            ):
                rel = (f"part-{version:05d}-{file_seq:04d}-"
                    f"{_file_token(table_path)}-purge.parquet")
                file_seq += 1
                _put_data(part, os.path.join(table_path, rel))
                new_files.append((rel, pv_of_pid[pid]))
    shutil.rmtree(tmp)

    actions: list[dict] = []
    by_name = (
        _collect_file_stats(
            spark, table_path, [r for r, _ in new_files],
            phys(stat_col),
            _phys_schema(data_schema, pfields) if mapped else data_schema,
        )
        if (stat_col is not None and new_files)
        else {}
    )
    rt_base = _rt_high_watermark(state) + 1 if rt is not None else None
    for rel, pv in new_files:
        full = os.path.join(table_path, rel)
        st = by_name.get(rel)
        if stat_col is not None and st is None:
            os.remove(full)  # fully-deleted content: no replacement
            continue
        add = {
            "path": rel,
            "partitionValues": pv,
            "size": os.path.getsize(full),
            "modificationTime": 0,
            "dataChange": False,
        }
        if st is not None:
            add["stats"] = json.dumps(st, default=str)
            if rt is not None:
                add["baseRowId"] = rt_base
                add["defaultRowCommitVersion"] = version
                rt_base += int(st["numRecords"])
        actions.append({"add": add})
    if rt is not None:
        actions.append(_rt_domain_action(rt_base - 1))
    for p in sorted(dv_adds):
        actions.append(
            {"remove": _remove_action(p, dv_adds[p], data_change=False)}
        )
    _commit(
        _log_dir(table_path), version, actions,
        operation="REORG", operation_params={"applyPurge": "true"},
    )
    return version


def _delete_via_dv(
    spark, table_path, key_col, kdf, state, hits, version,
    app_id, batch_id, change_data, part_cols, data_schema, type_of,
    schema, phys=None, mapped=False, pfields=None, n_keys=None,
):
    """Merge-on-read DELETE: matching row positions per affected file
    become deletion vectors; files are RE-ADDED with DV descriptors,
    never rewritten. One scan of the affected files (with Spark's
    ``_metadata.row_index``); the Roaring blobs are ENCODED ON
    EXECUTORS (``applyInPandas`` over the per-file position groups, so
    no position list ever crosses to the driver) and only the
    already-compressed blobs — bounded by ~rows_per_file/8 bytes each
    — are collected to assemble the commit's single ``.bin``. Each
    re-added file's PRIOR (path, DV) version gets a remove action in
    the same commit: Delta reconciliation keys file actions by
    (path, DV uniqueId), so without the remove external readers would
    keep both versions live."""
    import uuid as _uuid

    import pandas  # noqa: F401  (pandas_udf annotation resolution)
    from pyspark import cloudpickle as _cp

    from optimus_any2any_spark.formats import roaring as _roaring
    from optimus_any2any_spark.formats.roaring import (
        dv_file_write,
        z85_encode,
    )
    from optimus_any2any_spark.sources.delta import (
        _dv_descriptor_rows,
        dv_positions_df,
    )

    hit_paths = [p for p, _ in hits]
    # everything downstream keys by file BASENAME (what
    # _metadata.file_path yields); map back to the log's path strings,
    # which may carry subdirectories on external tables — and refuse a
    # basename collision rather than cross-apply deletions
    path_of = {p.rsplit("/", 1)[-1]: p for p in hit_paths}
    if len(path_of) != len(hit_paths):
        raise NotImplementedError(
            "delta delete: affected files share a basename — the "
            "deletion-vector row-index join would cross-apply deletions"
        )
    pv_of = {
        bn: (state["live"][p].get("partitionValues") or {})
        for bn, p in path_of.items()
    }

    # existing vectors on the affected files decode on EXECUTORS (the
    # same Arrow path the reader uses) — never as driver position lists
    prior_rows = _dv_descriptor_rows(
        table_path,
        {
            p: state["live"][p]
            for p in hit_paths
            if state["live"][p].get("deletionVector")
        },
    )
    prior_df = (
        dv_positions_df(spark, prior_rows)
        .withColumnRenamed("__dv_bn", "__bn")
        .withColumnRenamed("__dv_pos", "__pos")
        if prior_rows
        else None
    )

    if phys is None:
        phys = lambda c: c  # noqa: E731
    read_schema = (
        _phys_schema(data_schema, pfields) if mapped else data_schema
    )
    cur = (
        spark.read.schema(read_schema)
        .parquet(*[os.path.join(table_path, p) for p in hit_paths])
        .select(
            *[
                F.col(
                    "`"
                    + (pfields[f.name].name if mapped else f.name)
                    + "`"
                ).cast(f.dataType).alias(f.name)
                for f in data_schema.fields
            ],
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("__bn"),
            F.col("_metadata.row_index").alias("__pos"),
        )
    )
    nk = kdf.select(F.col(key_col).alias("__nk"))
    # the caller already knows the distinct key count — re-counting
    # kdf here was a whole redundant job per DV delete commit
    if n_keys is None:
        n_keys = kdf.count()
    matched = cur.join(
        F.broadcast(nk) if n_keys <= _MAX_DRIVER_KEYS else nk,
        F.col(key_col).eqNullSafe(F.col("__nk")),
        "inner",
    ).drop("__nk")
    # drop rows an EXISTING vector already deleted (re-deleting them
    # would double-report in the CDF and inflate cardinality)
    if prior_df is not None:
        matched = matched.join(prior_df, ["__bn", "__pos"], "left_anti")
    matched = matched.persist()
    try:
        # merged position set per touched file = new matches ∪ the
        # file's prior vector (files with a vector but NO new match
        # keep their old DV untouched — semi-join restricts the union)
        positions = matched.select("__bn", "__pos")
        if prior_df is not None:
            touched_bns = matched.select("__bn").distinct()
            positions = positions.unionByName(
                prior_df.join(
                    F.broadcast(touched_bns), "__bn", "left_semi"
                )
            )

        _cp.register_pickle_by_value(_roaring)
        dv_blob = _roaring.dv_blob

        # encode placement is a latency/scale trade with the SAME
        # one-shuffle plan either way: small deletes collect raw
        # positions and encode on the driver — no Python-worker spin-up
        # on the common interactive path; big deletes encode per file
        # on EXECUTORS via applyInPandas so only pre-compressed blobs
        # (≤ ~rows_per_file/8 bytes each) ever cross to the driver,
        # which is what removed the old 5M-row cap. ONE bounded probe
        # decides the placement AND fetches the positions when they
        # fit: limit(cap+1) short-circuits, so the driver holds at most
        # cap+1 (bn, pos) rows — the old shape ran a full
        # matched.count() job first and then re-fetched the same rows.
        # Arrow toPandas, not collect(): the pickled-row path
        # materializes a Row object per position (measured ~0.5 s of
        # pure driver CPU at ~70k positions).
        pos_pdf = positions.limit(_MAX_DRIVER_KEYS + 1).toPandas()
        if len(pos_pdf) <= _MAX_DRIVER_KEYS:
            per_file = []
            for bn, grp in pos_pdf.groupby("__bn", sort=False):
                ps = sorted(set(int(p) for p in grp["__pos"]))
                per_file.append(
                    {
                        "__bn": bn,
                        "__blob": dv_blob(ps),
                        "__card": len(ps),
                    }
                )
        else:

            def _encode_file_dv(pdf):
                import pandas as _pd

                poss = sorted(set(int(x) for x in pdf["__pos"]))
                return _pd.DataFrame(
                    {
                        "__bn": [pdf["__bn"].iloc[0]],
                        "__blob": [dv_blob(poss)],
                        "__card": [len(poss)],
                    }
                )

            per_file = (
                positions.groupBy("__bn")
                .applyInPandas(
                    _encode_file_dv,
                    "__bn string, __blob binary, __card long",
                )
                .collect()
            )
        if not per_file:
            return state["version"]  # stats false-positive: no-op
        per_file.sort(key=lambda r: r["__bn"])

        uid = _uuid.uuid4()
        bin_rel = f"deletion_vector_{uid}.bin"
        blobs = [bytes(r["__blob"]) for r in per_file]
        order = [(r["__bn"], int(r["__card"])) for r in per_file]
        # write the blob file locally, then publish through the
        # data-store seam (object-store parity with the parquet puts)
        bin_tmp = os.path.join(
            table_path, f"_tmp-{bin_rel}.{os.getpid()}"
        )
        offsets = dv_file_write(bin_tmp, blobs)
        _put_data(bin_tmp, os.path.join(table_path, bin_rel))
        if os.path.exists(bin_tmp):  # a copying store leaves the src
            os.unlink(bin_tmp)

        actions: list[dict] = []
        proto = _merged_protocol(
            state.get("protocol"),
            ["deletionVectors"],
            ["deletionVectors"],
        )
        if proto is not None:
            actions.append({"protocol": proto})
        if batch_id is not None:
            actions.append(
                {"txn": {"appId": app_id, "version": batch_id}}
            )
        for (bn, card), blob, off in zip(order, blobs, offsets):
            old = state["live"][path_of[bn]]
            actions.append(
                {
                    "remove": _remove_action(
                        old["path"], old, data_change=True
                    )
                }
            )
            add = dict(old)
            add["dataChange"] = True
            add["deletionVector"] = {
                "storageType": "u",
                "pathOrInlineDv": z85_encode(uid.bytes),
                "offset": off,
                "sizeInBytes": len(blob),
                "cardinality": card,
            }
            actions.append({"add": add})

        cdc_rel: list[str] = []
        if change_data:
            deleted = matched.drop("__pos")
            if part_cols:
                pv_rows = [
                    (bn,) + tuple(
                        pv_of[bn].get(phys(c)) for c in part_cols
                    )
                    for bn in pv_of
                ]
                pvdf = local_rows_df(spark, 
                    pv_rows,
                    T.StructType(
                        [T.StructField("__bn", T.StringType(), False)]
                        + [
                            T.StructField(c, T.StringType(), True)
                            for c in part_cols
                        ]
                    ),
                ).select(
                    "__bn",
                    *[
                        F.col(c).cast(type_of[c]).alias(c)
                        for c in part_cols
                    ],
                )
                deleted = deleted.join(F.broadcast(pvdf), "__bn")
            changes_all = deleted.withColumn(
                "_change_type", F.lit("delete")
            ).select(*schema.fieldNames(), "_change_type")
            if mapped:  # cdc parquet carries physical names
                changes_all = _to_phys(
                    changes_all, list(schema.fieldNames()), pfields,
                    keep=("_change_type",),
                )
            cdc_tmp = os.path.join(table_path, f"_tmp-cdc-v{version}")
            changes_all.write.mode("overwrite").parquet(cdc_tmp)
            os.makedirs(
                os.path.join(table_path, "_change_data"), exist_ok=True
            )
            for i, part in enumerate(
                sorted(
                    _glob.glob(os.path.join(cdc_tmp, "part-*.parquet"))
                )
            ):
                rel = f"_change_data/cdc-{version:05d}-{i:04d}.parquet"
                _put_data(part, os.path.join(table_path, rel))
                cdc_rel.append(rel)
            shutil.rmtree(cdc_tmp)
        for rel in cdc_rel:
            full = os.path.join(table_path, rel)
            actions.append(
                {
                    "cdc": {
                        "path": rel,
                        "partitionValues": {},
                        "size": os.path.getsize(full),
                        "dataChange": False,
                    }
                }
            )
        _commit(
            _log_dir(table_path), version, actions,
            operation="DELETE", operation_params={"mode": "deletion-vectors"},
        )
        return version
    finally:
        matched.unpersist()


def delete_delta_keys(
    spark: SparkSession,
    table_path: str,
    key_col: str,
    keys: DataFrame,
    app_id: str = DEFAULT_APP_ID,
    batch_id: int | None = None,
    change_data: bool = False,
    target_rows_per_file: int = 1_000_000,
    use_deletion_vectors: bool = False,
) -> int:
    """DELETE by key — the third verb of the CRUD story (merge covers
    insert/update). Affected files are pruned exactly like a merge
    (partition group, then key stats).

    Default (copy-on-write): each affected file is rewritten without
    the matching rows; a file whose every row matched simply gets no
    replacement.

    ``use_deletion_vectors=True`` (merge-on-read): NO file is
    rewritten — the matching ROW POSITIONS per file are serialized as
    Delta deletion vectors (RoaringBitmapArray blobs in one ``.bin``
    per commit) and each file is re-added with its DV descriptor,
    upgrading the protocol to readerVersion 3 + deletionVectors. Write
    amplification drops from O(affected file bytes) to O(deleted row
    indexes) — the GDPR-erasure shape at 100 TB. A file that already
    carries a DV has its positions MERGED (the update form real
    writers commit).

    ``change_data=True`` records the removed rows as ``delete`` CDF
    entries either way. Returns the committed version (or the current
    one when nothing matched — no-op deletes burn no version)."""
    state = replay_log(spark, table_path)
    if state["meta"] is None:
        raise ValueError(f"delta delete: no table at {table_path}")
    _check_append_only(state["meta"], "delete")
    phys, mapped, pfields = _phys_of(state["meta"])
    version = state["version"] + 1
    if (
        batch_id is not None
        and state["txns"].get(app_id) is not None
        and batch_id <= state["txns"][app_id]
    ):
        return state["version"]
    schema = T.StructType.fromJson(
        json.loads(state["meta"]["schemaString"])
    )
    part_cols = state["meta"].get("partitionColumns") or []
    data_schema = T.StructType(
        [f for f in schema.fields if f.name not in part_cols]
    )
    type_of = {f.name: f.dataType for f in schema.fields}
    kdf = keys.select(key_col).distinct().localCheckpoint(eager=False)
    # One bounded probe replaces the stats aggregate + full collect:
    # limit(cap+1) tells us in a single job whether the distinct key
    # set fits on the driver, and when it does the rows ARE the key
    # list (n / null-flag derived locally; _affected's key_list branch
    # never reads kmin/kmax). Only an over-cap key set pays the stats
    # aggregate, whose collected bytes stay O(1).
    probe = kdf.limit(_MAX_DRIVER_KEYS + 1).collect()
    n_keys = len(probe)
    if n_keys == 0:
        return state["version"]
    key_list = None
    kmin = kmax = None
    if n_keys <= _MAX_DRIVER_KEYS:
        has_null = any(r[0] is None for r in probe)
        key_list = sorted(r[0] for r in probe if r[0] is not None)
    else:
        kstats = kdf.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(key_col).alias("kmin"),
            F.max(key_col).alias("kmax"),
            F.max(F.col(key_col).isNull().cast("int")).alias(
                "null_key"
            ),
        ).collect()[0]
        n_keys = kstats["n"]
        has_null = bool(kstats["null_key"])
        kmin, kmax = kstats["kmin"], kstats["kmax"]

    # ---- single-job partitioned delete ------------------------------
    # DELETE keys are not partition-scoped, so pruning is a flat pass
    # over the live files (driver metadata, zero jobs); the rewrite is
    # then ONE anti-join + ONE partitionBy("__pid") write covering
    # every touched partition — the output file's partitionValues are
    # carried VERBATIM from its source file's add action, so no value
    # ever round-trips through a directory-name string encoding.
    hits: list[tuple[str, tuple]] = []  # (path, pv tuple)
    hit_rows_total = 0
    for p, a in sorted(state["live"].items()):
        pv = a.get("partitionValues") or {}
        pt = tuple(pv.get(phys(c)) for c in part_cols)
        e = _entry_from_add(p, a, phys(key_col))
        h, _miss = _affected([e], key_list, kmin, kmax, has_null)
        if h:
            hits.append((p, pt))
            hit_rows_total += max(e["rows"], 0)
    if not hits:
        return state["version"]  # no file matched: nothing to commit

    if use_deletion_vectors:
        return _delete_via_dv(
            spark, table_path, key_col, kdf, state, hits, version,
            app_id, batch_id, change_data, part_cols, data_schema,
            type_of, schema, phys, mapped, pfields, n_keys=n_keys,
        )

    ptuples = sorted({pt for _, pt in hits}, key=str)
    pid_of = {pt: i for i, pt in enumerate(ptuples)}
    hit_paths = [p for p, _ in hits]
    single = len(ptuples) == 1
    rt = _row_tracking_of(state["meta"])
    cur = _read_files_dv_aware(
        spark, table_path, data_schema, hit_paths, state["live"],
        basename_col=None if single else "__rel",
        pfields=pfields,
        row_tracking=rt,
    )
    if single:
        cur = cur.withColumn("__pid", F.lit(0).cast("int")).alias("cur")
    else:
        bn_pid_rows = [
            (p.rsplit("/", 1)[-1], pid_of[pt]) for p, pt in hits
        ]
        if len({b for b, _ in bn_pid_rows}) != len(bn_pid_rows):
            raise NotImplementedError(
                "delta delete: affected files share a basename — the "
                "pid routing join would misattribute rows"
            )
        rel_pid = local_rows_df(spark, 
            bn_pid_rows,
            T.StructType(
                [
                    T.StructField("__rel", T.StringType(), False),
                    T.StructField("__pid", T.IntegerType(), False),
                ]
            ),
        )
        cur = (
            cur.join(F.broadcast(rel_pid), "__rel", "inner")
            .drop("__rel")
            .alias("cur")
        )
    nk = kdf.alias("nk")
    match = F.col(f"cur.{key_col}").eqNullSafe(F.col(f"nk.{key_col}"))
    keep = cur.join(nk, match, "left_anti")
    if rt is not None:
        # survivors keep id AND commit version (a delete rewrite is
        # not an update of the surviving rows)
        keep = keep.withColumnRenamed(
            "__rt_id", rt[0]
        ).withColumnRenamed("__rt_cv", rt[1])

    actions: list[dict] = []
    new_adds: list[dict] = []
    file_seq = 0
    n_files = max(1, -(-hit_rows_total // target_rows_per_file))
    tmp = os.path.join(table_path, f"_tmp-delete-v{version}")
    data_cols = [f.name for f in data_schema.fields]
    if single:
        out_df = keep.drop("__pid").repartitionByRange(
            n_files, F.col(key_col)
        )
        if mapped:
            out_df = _to_phys(
                out_df, data_cols, pfields,
                keep=rt if rt is not None else (),
            )
        out_df.write.mode("overwrite").parquet(tmp)
        pv = {phys(c): v for c, v in zip(part_cols, ptuples[0])}
        for part in sorted(
            _glob.glob(os.path.join(tmp, "part-*.parquet"))
        ):
            rel = (f"part-{version:05d}-{file_seq:04d}-"
                    f"{_file_token(table_path)}-delete.parquet")
            file_seq += 1
            _put_data(part, os.path.join(table_path, rel))
            new_adds.append({"path": rel, "partitionValues": pv})
    else:
        out_df = keep.repartitionByRange(
            n_files, F.col("__pid"), F.col(key_col)
        )
        if mapped:
            out_df = _to_phys(
                out_df, data_cols, pfields,
                keep=("__pid", *rt) if rt is not None else ("__pid",),
            )
        (
            out_df.write.partitionBy("__pid")
            .mode("overwrite")
            .parquet(tmp)
        )
        for pdir in sorted(_glob.glob(os.path.join(tmp, "__pid=*"))):
            pid = int(os.path.basename(pdir).split("=", 1)[1])
            pv = {phys(c): v for c, v in zip(part_cols, ptuples[pid])}
            for part in sorted(
                _glob.glob(os.path.join(pdir, "part-*.parquet"))
            ):
                rel = (f"part-{version:05d}-{file_seq:04d}-"
                    f"{_file_token(table_path)}-delete.parquet")
                file_seq += 1
                _put_data(part, os.path.join(table_path, rel))
                new_adds.append({"path": rel, "partitionValues": pv})
    shutil.rmtree(tmp)

    cdc_rel: list[str] = []
    if change_data:
        deleted = cur.join(nk, match, "left_semi").withColumn(
            "_change_type", F.lit("delete")
        )
        # typed partition columns come from casting the verbatim
        # partitionValues strings through the table schema (the same
        # rule the snapshot reader applies)
        if part_cols:
            pid_typed = local_rows_df(spark, 
                [(pid_of[pt],) + pt for pt in ptuples],
                T.StructType(
                    [T.StructField("__pid", T.IntegerType(), False)]
                    + [
                        T.StructField(c, T.StringType(), True)
                        for c in part_cols
                    ]
                ),
            ).select(
                "__pid",
                *[
                    F.col(c).cast(type_of[c]).alias(c)
                    for c in part_cols
                ],
            )
            deleted = deleted.join(F.broadcast(pid_typed), "__pid")
        changes_all = deleted.select(*schema.fieldNames(), "_change_type")
        if mapped:  # cdc parquet carries physical names, like data
            changes_all = _to_phys(
                changes_all, list(schema.fieldNames()), pfields,
                keep=("_change_type",),
            )
        cdc_tmp = os.path.join(table_path, f"_tmp-cdc-v{version}")
        changes_all.write.mode("overwrite").parquet(cdc_tmp)
        os.makedirs(os.path.join(table_path, "_change_data"), exist_ok=True)
        for i, part in enumerate(
            sorted(_glob.glob(os.path.join(cdc_tmp, "part-*.parquet")))
        ):
            rel = f"_change_data/cdc-{version:05d}-{i:04d}.parquet"
            _put_data(part, os.path.join(table_path, rel))
            cdc_rel.append(rel)
        shutil.rmtree(cdc_tmp)

    new_rel = [a["path"] for a in new_adds]
    by_name = {}
    if new_rel:
        by_name = _collect_file_stats(
            spark, table_path, new_rel, phys(key_col),
            _phys_schema(data_schema, pfields) if mapped else data_schema,
        )
    if batch_id is not None:
        actions.append({"txn": {"appId": app_id, "version": batch_id}})
    rt_base = _rt_high_watermark(state) + 1 if rt is not None else None
    for pending in new_adds:
        rel = pending["path"]
        r = by_name.get(rel)
        if r is None:  # all rows of the source files matched: no add
            os.remove(os.path.join(table_path, rel))
            continue
        add = {
            "path": rel,
            "partitionValues": pending["partitionValues"],
            "size": os.path.getsize(os.path.join(table_path, rel)),
            "modificationTime": 0,
            "dataChange": True,
            "stats": json.dumps(r, default=str),
        }
        if rt is not None:
            add["baseRowId"] = rt_base
            add["defaultRowCommitVersion"] = version
            rt_base += int(r["numRecords"])
        actions.append({"add": add})
    if rt is not None:
        actions.append(_rt_domain_action(rt_base - 1))
    for path in hit_paths:
        actions.append(
            {
                "remove": _remove_action(
                    path, state["live"][path], data_change=True
                )
            }
        )
    for rel in cdc_rel:
        full = os.path.join(table_path, rel)
        actions.append(
            {
                "cdc": {
                    "path": rel,
                    "partitionValues": {},
                    "size": os.path.getsize(full),
                    "dataChange": False,
                }
            }
        )
    _commit(
        _log_dir(table_path), version, actions,
        operation="DELETE", operation_params={"mode": "copy-on-write"},
    )
    return version


def upsert_to_delta_table(
    stream: DataFrame,
    path: str,
    key_col: str,
    ts_col: str,
    checkpoint: str,
    app_id: str = DEFAULT_APP_ID,
    target_rows_per_file: int = 1_000_000,
    partition_by: list[str] | None = None,
    change_data: bool = False,
    merge_schema: bool = False,
):
    """Streaming wrapper: file-level Delta MERGE per micro-batch, with
    the log's txn action making foreachBatch redelivery exactly-once —
    the same transactional-sink idempotence real Delta streaming
    writers implement. ``partition_by``/``change_data``/
    ``merge_schema`` pass through to every micro-batch merge, so a
    stream can feed a partitioned table, emit CDF, or absorb schema
    drift."""

    def merge(batch: DataFrame, batch_id: int):
        merge_delta_batch(
            batch.sparkSession,
            batch,
            path,
            key_col,
            ts_col,
            app_id=app_id,
            batch_id=batch_id,
            target_rows_per_file=target_rows_per_file,
            partition_by=partition_by,
            change_data=change_data,
            merge_schema=merge_schema,
        )

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
