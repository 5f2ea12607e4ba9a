"""File-level MERGE upsert committing Apache Iceberg snapshots.

The third target of the engine's copy-on-write MERGE core (after the
JSON-manifest table and the Delta log): each merge appends an Iceberg
snapshot in the v1 HadoopCatalog layout (iceberg.apache.org/spec) —
read by :mod:`optimus_any2any_spark.sources.iceberg` and by any real
Iceberg client that can open v1 tables. The reference engine has no
MERGE (warehouse sink is APPEND/REPLACE only, ext/maxcompute/
sink.go:171); SURVEY.md §7.

Iceberg mapping of the shared algorithm:

=========================  ====================================
affected-file pruning      per-entry ``lower_bounds`` /
                           ``upper_bounds`` on the merge key —
                           the spec's field-id-keyed bounds maps
                           in single-value serialization
                           (Appendix D: int/long/double LE bytes,
                           string UTF-8)
untouched file carry-over  TWO granularities: a prior manifest
                           with no affected files carries over
                           VERBATIM in the new manifest list
                           (zero IO); a touched manifest is
                           rewritten with surviving entries as
                           ``status=EXISTING`` still pointing at
                           the same data files
superseded file            dropped from the rewritten manifest
                           (older snapshots still reference it —
                           that is what makes time travel work)
idempotence                ``optimus-app-id``/``optimus-batch-id``
                           in the snapshot summary (Iceberg's
                           summary is the spec's home for writer
                           metadata)
commit                     new ``v<N>.metadata.json`` +
                           ``version-hint.text`` rename
=========================  ====================================

At 100 TB the two-level carry-over is the point: merge IO is
O(affected data files) and merge *metadata* IO is O(affected
manifests), which is how Iceberg keeps planning cheap on million-file
tables. Single writer per table path, as with the other two targets.
"""

from __future__ import annotations

from optimus_any2any_spark.localrel import local_rows_df

import glob as _glob
import json
import os
import shutil
import struct
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from optimus_any2any_spark.formats.avrobin import (
    read_container,
    write_container,
)
from optimus_any2any_spark.formats.footer_stats import (
    footer_file_stats,
    kind_of_iceberg_type,
    norm_float_zero,
)
from optimus_any2any_spark.sources.iceberg import (
    _localize,
    decode_bound,
    encode_bound,
    _meta_dir,
    _preserve_manifest_lineage as _ice_preserve_manifest_lineage,
    _refuse_unpublished_branches,
    _puffin_dv_ref,
    advance_main_ref,
    append_snapshot_log,
    iceberg_spark_schema,
    load_table_metadata,
    snapshot_timestamp_ms,
    write_iceberg_commit,
)
# One positional-delete file per commit is the normal erasure shape;
# past this many deleted positions the writer range-splits into one
# spec-sorted file per file_path range so no single task funnels a
# mass delete (the spec allows many delete files per commit).
_MAX_DELETE_FILE_ROWS = 5_000_000

from optimus_any2any_spark.streaming.manifest_table import (
    _MAX_DRIVER_KEYS,
    _affected,
)

DEFAULT_APP_ID = "optimus-any2any-merge"

_ST_EXISTING, _ST_ADDED, _ST_DELETED = 0, 1, 2

# manifest-entry schema with the spec's bounds maps (Avro encodes
# Iceberg's map<int, bytes> as an array of key/value records)
_BOUNDS = [
    "null",
    {
        "type": "array",
        "items": {
            "type": "record",
            "name": "kv",
            "fields": [
                {"name": "key", "type": "int"},
                {"name": "value", "type": "bytes"},
            ],
        },
    },
]

MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"],
         "default": None, "field-id": 1},
        # v2: an entry's own data-sequence number. Survivor entries
        # re-listed under a NEW manifest must carry their ORIGINAL
        # sequence explicitly — inheriting the new manifest's would
        # let them escape still-applicable delete files.
        {"name": "sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 3},
        {
            "name": "data_file",
            "field-id": 2,
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "file_path", "type": "string",
                     "field-id": 100},
                    {"name": "file_format", "type": "string",
                     "field-id": 101},
                    {"name": "partition",
                     "type": {"type": "record", "name": "r102",
                              "fields": []},
                     "field-id": 102},
                    {"name": "record_count", "type": "long",
                     "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long",
                     "field-id": 104},
                    {"name": "null_value_counts", "type": _BOUNDS,
                     "default": None, "field-id": 110},
                    {"name": "lower_bounds", "type": _BOUNDS,
                     "default": None, "field-id": 125},
                    {"name": "upper_bounds", "type": _BOUNDS,
                     "default": None, "field-id": 128},
                    # the sort order the file was written under
                    # (spec data_file field 140)
                    {"name": "sort_order_id", "type": ["null", "int"],
                     "default": None, "field-id": 140},
                    # v3 row lineage (spec data_file field 142)
                    {"name": "first_row_id", "type": ["null", "long"],
                     "default": None, "field-id": 142},
                ],
            },
        },
    ],
}

MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517, "default": 0},
        {"name": "added_snapshot_id", "type": ["null", "long"],
         "default": None, "field-id": 503},
        # v2: data-sequence number inherited by the manifest's entries
        # (a merge's new files must outrank earlier equality deletes)
        {"name": "sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 515},
        # v3 row lineage: preserved manifest-level assignment (see
        # sources.iceberg._preserve_manifest_lineage)
        {"name": "added_rows_count", "type": ["null", "long"],
         "default": None, "field-id": 512},
        {"name": "existing_rows_count", "type": ["null", "long"],
         "default": None, "field-id": 513},
        {"name": "first_row_id", "type": ["null", "long"],
         "default": None, "field-id": 520},
    ],
}


# identity-partition tuple values ride in the manifest entry's
# ``partition`` record (spec: one field per partition field); only
# these primitive types are supported as partition sources
_AVRO_PRIM = {
    "int": "int",
    "long": "long",
    "string": "string",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
}


def manifest_entry_schema(part_fields: list[tuple[str, str]]) -> dict:
    """MANIFEST_ENTRY_SCHEMA with the partition record populated for an
    identity-partitioned table — ``part_fields`` is [(name, iceberg
    primitive type)] in spec order."""
    import copy

    if not part_fields:
        return MANIFEST_ENTRY_SCHEMA
    sch = copy.deepcopy(MANIFEST_ENTRY_SCHEMA)
    data_file = next(
        f for f in sch["fields"] if f["name"] == "data_file"
    )
    part = next(
        f for f in data_file["type"]["fields"] if f["name"] == "partition"
    )
    part["type"]["fields"] = [
        {
            "name": n,
            "type": ["null", _AVRO_PRIM[t]],
            "default": None,
            "field-id": 1000 + i,
        }
        for i, (n, t) in enumerate(part_fields)
    ]
    return sch


# ---------------------------------------------------------------------------
# single-value serialization (spec Appendix D) for bounds

# encode_bound / decode_bound moved to sources/iceberg.py (the manifest
# pruning that uses them must run inside the pure-python data-source
# runner); re-exported here for the writers and every existing caller.


def _per_file_key_stats(
    spark: SparkSession,
    table_path: str,
    new_rel: list[str],
    key_col: str | None,
    ice_t: str | None,
) -> dict[str, dict]:
    """Per-basename ``{"rows", "min_key", "max_key", "n_null"}`` over
    just-written data files, for manifest ``record_count`` /
    ``lower_bounds`` / ``upper_bounds`` / ``null_value_counts``.

    Fast path reads parquet FOOTER statistics driver-side (zero data
    I/O — re-scanning merge output for stats would double write-path
    I/O at scale; exactness contract in ``formats/footer_stats.py``);
    fallback is ONE grouped Spark aggregate over all files. Zero-row
    files are absent from the result either way (callers delete them).
    """
    ft = footer_file_stats(
        [os.path.join(table_path, p) for p in new_rel],
        [key_col] if key_col is not None else [],
        {key_col: kind_of_iceberg_type(ice_t)} if key_col is not None else {},
        session_tz=spark.conf.get("spark.sql.session.timeZone", "UTC"),
    )
    if ft is not None:
        return {
            name: {
                "rows": s["rows"],
                "min_key": s["min"].get(key_col),
                "max_key": s["max"].get(key_col),
                "n_null": s["nulls"].get(key_col, 0),
            }
            for name, s in ft.items()
        }
    reader = spark.read.parquet(
        *[os.path.join(table_path, p) for p in new_rel]
    )
    if key_col is not None:
        rows = (
            reader.select(key_col)
            .withColumn("__f", F.input_file_name())
            .groupBy("__f")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.min(key_col).alias("min_key"),
                F.max(key_col).alias("max_key"),
                F.sum(F.col(key_col).isNull().cast("long")).alias("n_null"),
            )
            .collect()
        )
    else:
        rows = (
            reader.withColumn("__f", F.input_file_name())
            .groupBy("__f")
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        )
    return {
        r["__f"].rsplit("/", 1)[-1]: {
            "rows": int(r["rows"]),
            "min_key": norm_float_zero(r["min_key"])
            if key_col is not None
            else None,
            "max_key": norm_float_zero(r["max_key"])
            if key_col is not None
            else None,
            "n_null": int(r["n_null"]) if key_col is not None else 0,
        }
        for r in rows
    }


def _kvmap(pairs) -> dict[int, bytes]:
    return {p["key"]: p["value"] for p in pairs or []}


def _key_field(meta: dict, key_col: str) -> tuple[int, str]:
    """(field-id, iceberg type) of the merge key in the current schema."""
    sch = meta.get("schemas", [meta.get("schema")])
    cur = None
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        cur = next(
            (s for s in meta["schemas"] if s.get("schema-id") == sid),
            meta["schemas"][0],
        )
    else:
        cur = meta["schema"]
    del sch
    for f in cur["fields"]:
        if f["name"] == key_col:
            t = f["type"]
            return int(f["id"]), t if isinstance(t, str) else "complex"
    raise ValueError(f"iceberg merge: no column {key_col!r} in schema")


def _entry_to_prune_shape(e: dict, fid: int, ice_t: str) -> dict:
    df = e["data_file"]
    lo = decode_bound(ice_t, _kvmap(df.get("lower_bounds")).get(fid))
    hi = decode_bound(ice_t, _kvmap(df.get("upper_bounds")).get(fid))
    nulls = _kvmap(df.get("null_value_counts")).get(fid)
    n_null = (
        struct.unpack("<q", nulls)[0]
        if isinstance(nulls, bytes) and len(nulls) == 8
        else None
    )
    has_bounds = lo is not None and hi is not None
    all_null = (
        n_null is not None and n_null == df["record_count"]
    )
    return {
        "path": df["file_path"],
        "rows": int(df["record_count"]),
        "min_key": lo,
        "max_key": hi,
        "has_null_key": bool(n_null) if n_null is not None else True,
        # prunable iff bounds decode OR the file is provably all-null
        "prunable": has_bounds or all_null,
        "__entry": e,
    }


def _stamp_parent_snapshot(new_snap: dict, meta: dict) -> None:
    """Spec: every snapshot records its ``parent-snapshot-id``. The
    pointer is what lets readers window history by ANCESTRY
    (multi-branch WAP — iceberg_main_chain) instead of list position;
    call with the PRE-commit metadata, before the main ref advances."""
    cur = meta.get("current-snapshot-id")
    if cur is not None and cur != -1:
        new_snap["parent-snapshot-id"] = cur


def _parse_pspec(
    default_spec: dict | None, by_id: dict, verb: str
) -> list[dict]:
    """Partition spec → computed-value descriptors
    ``{name, transform, src, src_type, res_type}`` (spec §Partition
    Transforms; unknown transforms and unsupported source types raise,
    never mis-partition)."""
    from optimus_any2any_spark.sources.iceberg_transforms import (
        normalize_transform,
        partition_field_name,
        result_type,
        validate_source,
    )

    pspec: list[dict] = []
    if not (default_spec and default_spec.get("fields")):
        return pspec
    for pf in default_spec["fields"]:
        tr = normalize_transform(str(pf.get("transform") or ""))
        src = by_id.get(int(pf["source-id"]))
        if src is None:
            raise ValueError(
                f"iceberg {verb}: partition source-id "
                f"{pf['source-id']} not in the current schema"
            )
        t = src["type"]
        if not isinstance(t, str):
            raise NotImplementedError(
                f"iceberg {verb}: partition source type {t!r} is "
                "beyond this writer"
            )
        if tr == "identity":
            if t not in _AVRO_PRIM and t not in (
                "date", "timestamp", "timestamptz"
            ):
                raise NotImplementedError(
                    f"iceberg {verb}: partition source type {t!r} "
                    "is beyond the identity writer"
                )
            res_t = t
        else:
            res_t = result_type(tr, t)  # unknown transform raises
            validate_source(tr, t)
        pspec.append(
            {
                "name": pf.get("name")
                or partition_field_name(tr, src["name"]),
                "transform": tr,
                "src": src["name"],
                "src_type": t,
                "res_type": res_t,
            }
        )
    return pspec


def _current_schema_fields(meta: dict) -> dict[int, dict]:
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        cur = next(
            (sc for sc in meta["schemas"] if sc.get("schema-id") == sid),
            meta["schemas"][0],
        )
    else:
        cur = meta["schema"]
    return {int(f["id"]): f for f in cur["fields"]}


def merge_iceberg_batch(
    spark: SparkSession,
    batch: DataFrame,
    table_path: str,
    key_col: str,
    ts_col: str,
    app_id: str = DEFAULT_APP_ID,
    batch_id: int | None = None,
    target_rows_per_file: int = 1_000_000,
    partition_by: list[str] | None = None,
    when_matched: list | None = None,
    when_not_matched: list | None = None,
    when_not_matched_by_source: list | None = None,
    merge_schema: bool = False,
) -> int:
    """One file-level MERGE commit as a new Iceberg snapshot; returns
    the committed (or already-current, on an idempotent skip) metadata
    version.

    ``merge_schema=True`` is the Delta mergeSchema twin, done the
    Iceberg way (spec §Schema Evolution): batch columns not in the
    table APPEND as optional fields with fresh column ids
    (``last-column-id`` advances), recorded as a NEW schema in
    ``schemas`` with a fresh ``schema-id`` that becomes
    ``current-schema-id`` — pre-evolution data files read the new
    columns as null. Table columns missing from the batch null-fill.
    Without it, any column mismatch raises. A widening merge whose
    batch deduplicates to zero rows still commits the evolved schema
    as a data-free metadata version (ALTER TABLE ADD COLUMN).

    ``partition_by`` (first commit only) creates an IDENTITY-
    partitioned table; later merges read the spec from the metadata.
    Partitioned-merge semantics are partition-scoped — a batch row
    upserts the row with the same key IN ITS OWN PARTITION, the same
    contract as ``merge_delta_batch`` — and the whole merge is a
    constant number of Spark jobs however many partitions the batch
    touches: one grouped key-stats pass, driver-side manifest pruning
    (partition-tuple match first, Appendix-D key bounds inside), one
    anti-join + one partitionBy("__pid") write (Iceberg data files
    physically CONTAIN their partition source columns, so the
    surrogate pid only routes rows to files — nothing is stripped),
    one grouped stats pass over the new files. Non-identity transforms
    (``bucket[N]``/``truncate[W]``/``year|month|day|hour``, spec
    §Partition Transforms) partition-scope the merge through the same
    shape: the transforms are pure functions, computed once per row as
    ``__pv*`` columns (``sources/iceberg_transforms.py``), and the
    manifest partition tuples carry the TRANSFORMED values keyed by
    the spec's field names. Unknown transforms and non-primitive
    partition sources are rejected, not mis-read."""
    from pyspark.sql.window import Window

    md = _meta_dir(table_path)
    hint = os.path.join(md, "version-hint.text")
    exists = os.path.exists(hint)
    if not exists:
        # first commit: bootstrap an EMPTY table (with the identity
        # spec when partitioned) and merge into it
        write_iceberg_commit(
            batch.limit(0), table_path, partition_by=partition_by
        )
    prev_version = int(open(hint).read().strip())
    meta = load_table_metadata(table_path, version=prev_version)
    # ROW LINEAGE composes with the CoW merge the same way it does
    # with compaction: affected files read WITH their lineage
    # (materialized-or-derived), carried rows MATERIALIZE id+sequence
    # into the rewrite, batch rows replacing a matched key KEEP that
    # row's id (the spec's update contract), inserts derive fresh ids
    # from the new entries' first_row_id
    _refuse_unpublished_branches(meta)
    lineage = meta.get("next-row-id") is not None
    specs = meta.get("partition-specs") or []
    default_spec = next(
        (s for s in specs if s.get("spec-id") == meta.get(
            "default-spec-id", 0)),
        None,
    )
    schema = iceberg_spark_schema(meta)
    cur_schema = None
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        cur_schema = next(
            (sc for sc in meta["schemas"] if sc.get("schema-id") == sid),
            meta["schemas"][0],
        )
    else:
        cur_schema = meta["schema"]
    by_id = {int(f["id"]): f for f in cur_schema["fields"]}

    from optimus_any2any_spark.sources.iceberg_transforms import (
        avro_type_of_result,
        spark_type_of_result,
        transform_column,
    )

    # partition spec → one computed partition-VALUE column per field.
    # The spec's transforms are pure functions (bucket = Appendix-B
    # murmur3, truncate = floor, day/hour/month/year = epoch units),
    # so a days(ts)-partitioned table merges through exactly the same
    # single-job __pid shape as an identity one — the transform just
    # decides which rows share a tuple.
    pspec = _parse_pspec(default_spec, by_id, "merge")
    part_names = [p["name"] for p in pspec]
    # conditional clause surface (VERDICT r9 item 5's Delta twin —
    # the row algebra is format-agnostic and shared with
    # streaming/delta_table.py): ordered ("update"|"delete", cond,
    # set) matched / not-matched-by-source clauses plus ("insert",
    # cond, values) not-matched clauses; first match wins, t./s.
    # references; unmatched source rows insert-all unless
    # when_not_matched says otherwise. Snapshot summary records the
    # predicates.
    conditional = bool(
        when_matched or when_not_matched_by_source
        or when_not_matched is not None
    )
    if conditional:
        from optimus_any2any_spark.streaming.delta_table import (
            _validate_merge_clauses,
        )

        _validate_merge_clauses(
            when_matched, when_not_matched_by_source, key_col,
            when_not_matched=when_not_matched,
        )
        if pspec:
            # a clause assigning a partition SOURCE column would put
            # rewritten rows in files whose manifest tuple disagrees
            # with their contents — refuse, like the Delta twin's
            # partition-column rule
            srcs = {pp["src"] for pp in pspec}
            for cls in (when_matched or []) + (when_not_matched or []):
                vset = cls[2] if len(cls) == 3 else None
                if vset and srcs & set(vset):
                    raise ValueError(
                        "iceberg merge: clause assignments may not "
                        f"touch partition source columns {sorted(srcs)}"
                    )
    part_fields = [
        (p["name"], avro_type_of_result(p["res_type"])) for p in pspec
    ]
    if any(
        p["transform"] == "identity" and p["src"] == key_col
        for p in pspec
    ):
        # identity only: bucket(key)/truncate(key) give each key ONE
        # partition, so partition-scoped merge == global merge there
        raise ValueError(
            "iceberg merge: the merge key cannot be an identity "
            "partition column"
        )
    pv_cols = [f"__pv{i}" for i in range(len(pspec))]

    def _with_pvs(frame):
        for i, p in enumerate(pspec):
            frame = frame.withColumn(
                pv_cols[i],
                transform_column(
                    p["transform"], F.col(p["src"]), p["src_type"]
                ),
            )
        return frame

    # idempotence via the last snapshot's summary
    snaps = meta.get("snapshots") or []
    if batch_id is not None:
        for s in reversed(snaps):
            summ = s.get("summary") or {}
            if summ.get("optimus-app-id") == app_id:
                last = summ.get("optimus-batch-id")
                if last is not None and batch_id <= int(last):
                    return prev_version
                break

    evolved = False
    if set(schema.fieldNames()) != set(batch.columns):
        if not merge_schema:
            raise ValueError(
                f"iceberg merge: batch columns {sorted(batch.columns)}"
                f" != table schema {sorted(schema.fieldNames())} "
                "(pass merge_schema=True to evolve)"
            )
        table_cols = set(schema.fieldNames())
        extra = [c for c in batch.columns if c not in table_cols]
        if lineage and any(
            c in ("_row_id", "_last_updated_sequence_number")
            for c in extra
        ):
            raise NotImplementedError(
                "iceberg merge: merge_schema would shadow the "
                "reserved lineage column names — beyond this writer"
            )
        missing = [
            c for c in schema.fieldNames() if c not in batch.columns
        ]
        if key_col in missing or any(
            p["src"] in missing for p in pspec
        ):
            raise ValueError(
                "iceberg merge: batch must carry the merge key and "
                "every partition source column"
            )
        if extra:
            from optimus_any2any_spark.sources.iceberg import (
                _spark_type_to_iceberg,
            )

            last_id = int(
                meta.get("last-column-id")
                or (max(by_id) if by_id else 0)
            )
            new_fields = []
            for c in extra:
                last_id += 1
                new_fields.append(
                    {
                        "id": last_id,
                        "name": c,
                        "required": False,
                        "type": _spark_type_to_iceberg(
                            batch.schema[c].dataType
                        ),
                    }
                )
            old_schemas = list(
                meta.get("schemas")
                or ([meta["schema"]] if meta.get("schema") else [])
            )
            new_sid = (
                max(
                    int(s.get("schema-id", 0)) for s in old_schemas
                )
                + 1
                if old_schemas
                else 1
            )
            new_schema = {
                "type": "struct",
                "schema-id": new_sid,
                "fields": list(cur_schema["fields"]) + new_fields,
            }
            meta = dict(meta)
            meta["schemas"] = old_schemas + [new_schema]
            meta["current-schema-id"] = new_sid
            if "schema" in meta:  # v1 mirror
                meta["schema"] = new_schema
            meta["last-column-id"] = last_id
            schema = iceberg_spark_schema(meta)
            cur_schema = new_schema
            by_id = {int(f["id"]): f for f in cur_schema["fields"]}
            evolved = True
        for c in missing:
            batch = batch.withColumn(
                c, F.lit(None).cast(schema[c].dataType)
            )
    batch = batch.select(*schema.fieldNames())
    fid, ice_t = _key_field(meta, key_col)

    # the dedupe window and every partition-scoped step below key on
    # the TRANSFORMED partition values (__pv*), computed once here and
    # pinned by the checkpoint — identity specs make them plain copies
    w = Window.partitionBy(key_col, *pv_cols).orderBy(
        F.col(ts_col).desc()
    )
    latest = (
        _with_pvs(batch)
        .withColumn("__rn", F.row_number().over(w))
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
    # whole pass.
    gstats = (
        latest.groupBy(*pv_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(key_col).alias("kmin"),
            F.max(key_col).alias("kmax"),
            F.max(F.col(key_col).isNull().cast("int")).alias(
                "null_key"
            ),
        )
        .collect()
    )
    n_total = sum(int(r["n"]) for r in gstats)
    if n_total == 0 and not when_not_matched_by_source:
        # (an EMPTY source with when_not_matched_by_source is still a
        # full clause evaluation: every live row is unmatched)
        if not evolved:
            return prev_version
        # a widening merge whose batch dedupes to zero rows is still
        # a legal schema-change commit: a data-free metadata version
        # carrying the evolved schemas (ALTER TABLE ADD COLUMN — the
        # same no-snapshot shape as set_iceberg_partition_spec)
        version = prev_version + 1
        meta = dict(meta)
        meta["last-updated-ms"] = snapshot_timestamp_ms(meta)
        path = os.path.join(md, f"v{version}.metadata.json")
        tmpp = path + ".tmp"
        with open(tmpp, "w") as f:
            f.write(json.dumps(meta, indent=2))
        os.replace(tmpp, path)
        tmph = hint + ".tmp"
        with open(tmph, "w") as f:
            f.write(str(version))
        os.replace(tmph, hint)
        return version

    # per-partition batch key stats: ONE job for ALL touched
    # partitions (mirrors merge_delta_batch)
    if n_total <= _MAX_DRIVER_KEYS:
        krows = latest.select(*pv_cols, key_col).collect()
        grouped: dict[tuple, list] = {}
        for r in krows:
            grouped.setdefault(
                tuple(r[c] for c in pv_cols), []
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
    else:
        pstats = {
            tuple(r[c] for c in pv_cols): {
                "n": r["n"],
                "keys": None,
                "kmin": r["kmin"],
                "kmax": r["kmax"],
                "has_null": bool(r["null_key"]),
            }
            for r in gstats
            if r["n"]
        }
    if when_not_matched_by_source and not pstats and not pspec:
        # empty source, unpartitioned: the clause pass still routes
        # through the one () partition (partitioned tables mint their
        # pids from the affected rows' transform tuples below)
        pstats = {
            (): {"n": 0, "keys": [], "kmin": None, "kmax": None,
                 "has_null": False}
        }
    ptuples = sorted(pstats, key=str)
    pid_of = {pt: i for i, pt in enumerate(ptuples)}

    # PARTITION EVOLUTION (spec "Partition Evolution", VERDICT r9
    # item 6): manifests written under a NON-default spec id prune by
    # key bounds ONLY (their partition tuples are in another spec's
    # coordinates — tuple-matching them against the batch's
    # current-spec tuples would silently mis-prune live files), and
    # their untouched entries re-list under their OWN spec id, one
    # extra manifest per old spec. Rewritten rows always land under
    # the CURRENT default spec — the format's evolution contract.
    default_sid = int(meta.get("default-spec-id", 0))
    specs_by_id = {int(s["spec-id"]): s for s in specs} or {
        0: {"spec-id": 0, "fields": meta.get("partition-spec") or []}
    }
    g_keys: list | None = []
    for _st in pstats.values():
        if _st["keys"] is None:
            g_keys = None
            break
        g_keys.extend(_st["keys"])
    _gmins = [
        _st["kmin"] for _st in pstats.values() if _st["kmin"] is not None
    ]
    _gmaxs = [
        _st["kmax"] for _st in pstats.values() if _st["kmax"] is not None
    ]
    gstats = {
        "n": sum(_st["n"] for _st in pstats.values()),
        "keys": sorted(g_keys) if g_keys is not None else None,
        "kmin": min(_gmins) if _gmins else None,
        "kmax": max(_gmaxs) if _gmaxs else None,
        "has_null": any(_st["has_null"] for _st in pstats.values()),
    }

    # current snapshot's manifests, each with its entries
    cur_snap_id = meta.get("current-snapshot-id")
    manifests: list[dict] = []
    if cur_snap_id not in (None, -1) and snaps:
        snap = next(s for s in snaps if s["snapshot-id"] == cur_snap_id)
        _, manifests = read_container(
            _localize(table_path, snap["manifest-list"])
        )

    def _eff_seq(e: dict, m: dict) -> int:
        # v2 sequence inheritance: the entry's own number when
        # present, else the manifest-list row's, else 0 (v1)
        s = e.get("sequence_number")
        if s is None:
            s = m.get("sequence_number")
        return int(s) if s is not None else 0

    carried: list[dict] = []   # manifest-list rows carried verbatim
    # delete manifests carry forward UNLESS this rewrite retires them
    # (every remaining data file outranking a delete file means it can
    # never apply again — carrying it would cost a dead anti-join on
    # every future read); decided after the walk, like compaction
    del_manifests: list[tuple[dict, int, bool]] = []
    hit_entries: list[dict] = []
    hit_seqs: list[int] = []   # effective data-sequence per hit entry
    hit_sids: list[int] = []   # manifest spec id per hit entry (the
    # identity-constant projection keys off it — migrated hive files
    # carry their partition column only in the manifest tuple)
    has_foreign_hit = False    # any hit under a non-default spec
    survivors: list[tuple[dict, int]] = []  # (entry, its spec id)
    untouched_seqs: list[int] = []  # live data entries NOT rewritten
    pos_del: list[dict] = []   # live positional/equality delete files:
    eq_del: list[dict] = []    # they gate the affected-file read below
    _pf_cache: dict = {}       # one Puffin footer parse per DV file
    for m in manifests:
        if int(m.get("content") or 0) == 1:
            _, dentries = read_container(
                _localize(table_path, m["manifest_path"])
            )
            dmax = 0
            has_pos = False
            for e in dentries:
                if int(e.get("status") or 0) == _ST_DELETED:
                    continue
                df_ = e["data_file"]
                ent = {
                    "path": _localize(table_path, df_["file_path"]),
                    "orig": df_["file_path"],
                    "seq": _eff_seq(e, m),
                    "equality_ids": list(df_.get("equality_ids") or []),
                }
                dmax = max(dmax, ent["seq"])
                if (
                    df_.get("referenced_data_file") is not None
                    or df_.get("content_offset") is not None
                    or df_.get("content_size_in_bytes") is not None
                ):
                    # v3 deletion vector: the affected-file read
                    # applies it like positional delete rows
                    ent["dv"] = _puffin_dv_ref(
                        table_path, df_, _pf_cache
                    )
                    has_pos = True
                    pos_del.append(ent)
                elif int(df_.get("content") or 0) == 2 or ent[
                    "equality_ids"
                ]:
                    eq_del.append(ent)
                else:
                    has_pos = True
                    pos_del.append(ent)
            del_manifests.append((m, dmax, has_pos))
            continue
        mpath = _localize(table_path, m["manifest_path"])
        _, entries = read_container(mpath)
        msid = int(m.get("partition_spec_id") or 0)
        foreign_spec = msid != default_sid
        if foreign_spec and msid not in specs_by_id:
            raise ValueError(
                f"iceberg merge: manifest {m['manifest_path']!r} "
                f"carries spec id {msid} which is not in the table's "
                "partition-specs — refusing to rewrite"
            )
        live = [
            e for e in entries if int(e.get("status") or 0) != _ST_DELETED
        ]
        hits: list[dict] = []
        misses: list[dict] = []
        for e in live:
            if when_not_matched_by_source:
                # the clause touches every live row by definition:
                # no file is prunable
                hits.append({"__entry": e})
                continue
            # partition-tuple pruning FIRST: a file in a partition the
            # batch does not touch survives without a bounds check —
            # but only for entries under the CURRENT spec; an old-spec
            # tuple says nothing, so those prune on key bounds against
            # the WHOLE batch
            if foreign_spec:
                st = gstats
            elif pspec:
                pdict = e["data_file"].get("partition") or {}
                pt = tuple(pdict.get(n) for n in part_names)
                st = pstats.get(pt)
                if st is None:
                    misses.append({"__entry": e})
                    continue
            else:
                st = pstats[()]
            shaped = _entry_to_prune_shape(e, fid, ice_t)
            h, _m = _affected(
                [shaped], st["keys"], st["kmin"], st["kmax"],
                st["has_null"],
            )
            (hits if h else misses).append({"__entry": e})
        for mi in misses:
            untouched_seqs.append(_eff_seq(mi["__entry"], m))
        if not hits:
            carried.append(m)  # whole manifest untouched: zero IO
        else:
            for hh in hits:
                hit_entries.append(hh["__entry"])
                hit_seqs.append(_eff_seq(hh["__entry"], m))
                hit_sids.append(msid)
                if foreign_spec:
                    has_foreign_hit = True
            for mi in misses:
                # survivors re-list under the NEW manifest: their
                # ORIGINAL sequence must ride along explicitly, or
                # they would inherit the new (higher) sequence and
                # escape delete files that still apply to them —
                # keyed by their manifest's spec id so old-spec
                # entries re-serialize under their own spec
                e2 = dict(mi["__entry"])
                e2["sequence_number"] = _eff_seq(mi["__entry"], m)
                survivors.append((e2, msid))

    if lineage:
        # inheritance-reliant tables: resolve the ids BEFORE any entry
        # re-lists under a new manifest (reader-identical walk)
        _resolve_entry_lineage(
            table_path, meta,
            hit_entries + [e2 for e2, _sid in survivors],
        )

    version = prev_version + 1
    snapshot_id = version
    fmt = int(meta.get("format-version", 1))
    seq = max(
        int(meta.get("last-sequence-number", 0)), prev_version
    ) + 1

    # retire delete manifests nothing can match anymore (equality
    # gates strictly-lower data sequences; positional lower-or-equal)
    min_data_seq = min([seq] + untouched_seqs)
    for m, dmax, has_pos in del_manifests:
        dead = min_data_seq > dmax if has_pos else min_data_seq >= dmax
        if not dead:
            carried.append(m)

    # attach __pid to batch rows (broadcast partition-tuple lookup);
    # Iceberg data files keep ALL columns, so __pid only routes rows.
    # PARTITION EVOLUTION: rows in old-spec hit files may land in
    # CURRENT-spec partitions the batch does not touch, so the pid set
    # must extend to every tuple those rows produce — one distinct
    # aggregate over the affected rows, run ONLY when a non-default
    # spec was actually hit (zero extra jobs on non-evolved tables).
    def _read_hit_files():
        from optimus_any2any_spark.sources.iceberg import (
            read_entries_with_deletes as _rewd,
        )

        files = [
            {
                "path": _localize(
                    table_path, e["data_file"]["file_path"]
                ),
                "orig": e["data_file"]["file_path"],
                "seq": s,
                "equality_ids": [],
                "partition": dict(
                    e["data_file"].get("partition") or {}
                ),
                "spec_id": sid,
            }
            for e, s, sid in zip(hit_entries, hit_seqs, hit_sids)
        ]
        if not lineage:
            return _rewd(
                spark, meta, schema, files, pos_del, eq_del
            )
        # row lineage: affected rows read WITH their id + sequence
        # (materialized-or-derived, same coalesce as the lineage read)
        for e in hit_entries:
            if e["data_file"].get("first_row_id") is None:
                raise NotImplementedError(
                    "iceberg merge: row-lineage rewrite over a data "
                    "file whose first_row_id is unassignable even by "
                    "inheritance — "
                    f"{e['data_file']['file_path']!r}"
                )
        ext = T.StructType(
            list(schema.fields)
            + [
                T.StructField("_row_id", T.LongType(), True),
                T.StructField(
                    "_last_updated_sequence_number", T.LongType(),
                    True,
                ),
            ]
        )
        out = _rewd(
            spark, meta, ext, files, pos_del, eq_del,
            position_cols=("__rl_fp", "__rl_pos"),
        )
        rl = local_rows_df(spark, 
            [
                (
                    e["data_file"]["file_path"],
                    int(e["data_file"]["first_row_id"]),
                    int(s),
                )
                for e, s in zip(hit_entries, hit_seqs)
            ],
            "__rl_fp string, __rl_first long, __rl_seq long",
        )
        return (
            out.join(F.broadcast(rl), "__rl_fp")
            .withColumn(
                "_row_id",
                F.coalesce(
                    F.col("_row_id"),
                    F.col("__rl_first") + F.col("__rl_pos"),
                ),
            )
            .withColumn(
                "_last_updated_sequence_number",
                F.coalesce(
                    F.col("_last_updated_sequence_number"),
                    F.col("__rl_seq"),
                ),
            )
            .drop("__rl_fp", "__rl_pos", "__rl_first", "__rl_seq")
        )

    cur0 = None
    if pspec and hit_entries and (
        has_foreign_hit or when_not_matched_by_source
    ):
        # when_not_matched_by_source touches every live row, so rows
        # may land in current-spec partitions the batch does not
        # touch — the same pid-space extension partition evolution
        # needs (one distinct aggregate over the affected rows)
        cur0 = _read_hit_files()
        for r in _with_pvs(cur0).select(*pv_cols).distinct().collect():
            pt = tuple(r[c] for c in pv_cols)
            if pt not in pid_of:
                pstats[pt] = {
                    "n": 0, "keys": [], "kmin": None, "kmax": None,
                    "has_null": False,
                }
        ptuples = sorted(pstats, key=str)
        pid_of = {pt: i for i, pt in enumerate(ptuples)}

    # One touched partition (incl. every unpartitioned merge) skips
    # the routing AND the dynamic-partition write below.
    single = len(ptuples) == 1
    if pspec and not single:
        pid_ddl = ", ".join(
            f"{pv_cols[i]} {spark_type_of_result(pspec[i]['res_type'])}"
            for i in range(len(pspec))
        )
        pid_df = local_rows_df(spark, 
            [pt + (pid_of[pt],) for pt in ptuples],
            f"{pid_ddl}, __pid int",
        )
        pcond = None
        for c in pv_cols:
            e = F.col(f"b.{c}").eqNullSafe(F.col(f"pd.{c}"))
            pcond = e if pcond is None else (pcond & e)

        def _with_pid(frame):
            # frame must carry the __pv* columns; the select drops
            # them — data files keep exactly the table schema (plus
            # the materialized lineage columns when present)
            extra = [
                c
                for c in ("_row_id", "_last_updated_sequence_number")
                if c in frame.columns
            ]
            return (
                frame.alias("b")
                .join(F.broadcast(pid_df.alias("pd")), pcond, "inner")
                .select(
                    *[F.col(f"b.{c}") for c in schema.fieldNames()],
                    *[F.col(f"b.{c}") for c in extra],
                    F.col("pd.__pid"),
                )
            )

        latest_p = _with_pid(latest)
    else:
        _with_pid = None
        latest_p = latest.drop(*pv_cols).withColumn(
            "__pid", F.lit(0).cast("int")
        )

    merged = latest_p
    hit_rows = 0
    if hit_entries:
        # affected files read WITH any delete files applied (sequence-
        # gated, same plan as read_iceberg) — a copy-on-write rewrite
        # must never resurrect rows a delete had already removed
        # (cur0 is the same frame, already built for the evolved-table
        # pid extension above)
        cur = cur0 if cur0 is not None else _read_hit_files()
        cur_p = (
            _with_pid(_with_pvs(cur))
            if _with_pid is not None
            else cur.withColumn("__pid", F.lit(0).cast("int"))
        )
        if conditional:
            from optimus_any2any_spark.streaming.delta_table import (
                _apply_merge_clauses,
            )

            merged, _ = _apply_merge_clauses(
                cur_p, latest_p, key_col, list(schema.fieldNames()),
                when_matched, when_not_matched_by_source,
                when_not_matched=when_not_matched,
                carry_cols=(
                    ("_row_id", "_last_updated_sequence_number")
                    if lineage
                    else None
                ),
            )
        else:
            bk = latest_p.select(
                F.col(key_col).alias("__bk"),
                F.col("__pid").alias("__bpid"),
            )
            batch_side = latest_p
            if lineage:
                # the update contract: a batch row replacing a
                # matched target row KEEPS that row's id; its
                # sequence derives fresh (null materialized → the
                # new file's data sequence). Unmatched rows insert
                # with null id (fresh from first_row_id + position).
                cur_ids = cur_p.select(
                    F.col(key_col).alias("__ck"),
                    F.col("__pid").alias("__cpid"),
                    F.col("_row_id").alias("__rl_prev"),
                )
                m2 = F.col(f"b.{key_col}").eqNullSafe(
                    F.col("__ck")
                ) & (F.col("b.__pid") == F.col("__cpid"))
                batch_side = (
                    latest_p.alias("b")
                    .join(cur_ids, m2, "left")
                    .select(
                        *[
                            F.col(f"b.{c}")
                            for c in schema.fieldNames()
                        ],
                        F.col("__rl_prev").alias("_row_id"),
                        F.lit(None)
                        .cast("long")
                        .alias("_last_updated_sequence_number"),
                        F.col("b.__pid"),
                    )
                )
            merged = (
                cur_p.alias("cur")
                .join(
                    bk,
                    F.col(f"cur.{key_col}").eqNullSafe(F.col("__bk"))
                    & (F.col("cur.__pid") == F.col("__bpid")),
                    "left_anti",
                )
                .unionByName(batch_side)
            )
        hit_rows = sum(
            int(e["data_file"]["record_count"]) for e in hit_entries
        )

    if conditional and when_not_matched is not None and not hit_entries:
        # no affected files: every batch row is unmatched — the
        # insert clauses still decide which rows (and values) land
        from optimus_any2any_spark.streaming.delta_table import (
            _apply_insert_clauses,
        )

        merged = _apply_insert_clauses(
            latest_p, list(schema.fieldNames()),
            {f.name: f.dataType for f in schema.fields},
            when_not_matched,
        )

    n_rows = n_total + hit_rows
    n_files = max(1, -(-n_rows // target_rows_per_file))
    tmp = os.path.join(table_path, f"_tmp-icemerge-v{version}")
    os.makedirs(os.path.join(table_path, "data"), exist_ok=True)
    new_rel: list[str] = []
    pt_of_rel: dict[str, tuple] = {}
    file_seq = 0
    if single:
        (
            merged.drop("__pid")
            .repartitionByRange(n_files, F.col(key_col))
            .write.mode("overwrite")
            .parquet(tmp)
        )
        for part in sorted(
            _glob.glob(os.path.join(tmp, "part-*.parquet"))
        ):
            rel = f"data/{version:05d}-{file_seq:04d}-merge.parquet"
            file_seq += 1
            os.replace(part, os.path.join(table_path, rel))
            new_rel.append(rel)
            pt_of_rel[rel] = ptuples[0]
    else:
        (
            merged.repartitionByRange(
                n_files, F.col("__pid"), F.col(key_col)
            )
            .write.partitionBy("__pid")
            .mode("overwrite")
            .parquet(tmp)
        )
        for pdir in sorted(_glob.glob(os.path.join(tmp, "__pid=*"))):
            pid = int(os.path.basename(pdir).split("=", 1)[1])
            for part in sorted(
                _glob.glob(os.path.join(pdir, "part-*.parquet"))
            ):
                rel = f"data/{version:05d}-{file_seq:04d}-merge.parquet"
                file_seq += 1
                os.replace(part, os.path.join(table_path, rel))
                new_rel.append(rel)
                pt_of_rel[rel] = ptuples[pid]
    shutil.rmtree(tmp)

    per_file = (
        _per_file_key_stats(spark, table_path, new_rel, key_col, ice_t)
        if new_rel
        else {}
    )

    def _bounds_kv(val) -> list | None:
        b = encode_bound(ice_t, val)
        return [{"key": fid, "value": b}] if b is not None else None

    new_entries = []
    lin_next = int(meta["next-row-id"]) if lineage else None
    lin_base = lin_next
    for rel in new_rel:
        r = per_file.get(rel.rsplit("/", 1)[-1])
        if r is None:  # empty part
            os.remove(os.path.join(table_path, rel))
            continue
        pt = pt_of_rel[rel]
        dfe = {
            "file_path": rel,
            "file_format": "PARQUET",
            "partition": {
                n: v for n, v in zip(part_names, pt)
            },
            "record_count": int(r["rows"]),
            "file_size_in_bytes": os.path.getsize(
                os.path.join(table_path, rel)
            ),
            "null_value_counts": [
                {"key": fid,
                 "value": struct.pack("<q", int(r["n_null"]))}
            ],
            "lower_bounds": _bounds_kv(r["min_key"]),
            "upper_bounds": _bounds_kv(r["max_key"]),
        }
        if lineage:
            dfe["first_row_id"] = lin_next
            lin_next += int(r["rows"])
        new_entries.append(
            {
                "status": _ST_ADDED,
                "snapshot_id": snapshot_id,
                "data_file": dfe,
            }
        )
    # survivors keep their entries, re-marked EXISTING under this
    # commit: same-spec ones ride the new manifest; old-spec ones go
    # into ONE extra manifest per spec id, serialized under THAT
    # spec's partition record schema and list-stamped with its id —
    # the format's mixed-spec representation (partition evolution)
    foreign_by_sid: dict[int, list[dict]] = {}
    for e, sid in survivors:
        e = dict(e)
        e["status"] = _ST_EXISTING
        if sid == default_sid:
            new_entries.append(e)
        else:
            foreign_by_sid.setdefault(sid, []).append(e)

    manifest_rel = (
        "metadata/"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'{table_path}|mm{version}')}"
        "-m0.avro"
    )
    write_container(
        os.path.join(table_path, manifest_rel),
        manifest_entry_schema(part_fields),
        new_entries,
    )
    foreign_ml_rows: list[dict] = []
    for sid in sorted(foreign_by_sid):
        old_pspec = _parse_pspec(specs_by_id[sid], by_id, "merge")
        old_fields = [
            (p["name"], avro_type_of_result(p["res_type"]))
            for p in old_pspec
        ]
        f_rel = (
            "metadata/"
            f"{uuid.uuid5(uuid.NAMESPACE_URL, f'{table_path}|mm{version}s{sid}')}"
            f"-m0-s{sid}.avro"
        )
        write_container(
            os.path.join(table_path, f_rel),
            manifest_entry_schema(old_fields),
            foreign_by_sid[sid],
        )
        foreign_ml_rows.append(
            {
                "manifest_path": f_rel,
                "manifest_length": os.path.getsize(
                    os.path.join(table_path, f_rel)
                ),
                "partition_spec_id": sid,
                "content": 0,
                "added_snapshot_id": snapshot_id,
                # entries carry their ORIGINAL sequence explicitly
                "sequence_number": seq,
            }
        )
    for r in carried:
        r.setdefault("sequence_number", None)
    _ice_preserve_manifest_lineage(table_path, meta, carried)
    ml_rows = list(carried) + foreign_ml_rows + [
        {
            "manifest_path": manifest_rel,
            "manifest_length": os.path.getsize(
                os.path.join(table_path, manifest_rel)
            ),
            "partition_spec_id": int(meta.get("default-spec-id", 0)),
            "content": 0,
            "added_snapshot_id": snapshot_id,
            # the new files inherit this: it outranks every existing
            # delete file, so consumed deletes stop applying to them
            "sequence_number": seq,
        }
    ]
    ml_rel = (
        "metadata/"
        f"snap-{snapshot_id}-1-"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'{table_path}|mml{version}')}.avro"
    )
    write_container(
        os.path.join(table_path, ml_rel), MANIFEST_FILE_SCHEMA, ml_rows
    )

    summary = {"operation": "overwrite"}
    for nm_, cls_ in (
        ("matched-predicates", when_matched),
        ("not-matched-predicates", when_not_matched),
        ("not-matched-by-source-predicates", when_not_matched_by_source),
    ):
        if cls_:
            summary[nm_] = json.dumps(
                [
                    {"predicate": c_[1] or "true", "actionType": c_[0]}
                    for c_ in cls_
                ]
            )
    if batch_id is not None:
        summary["optimus-app-id"] = app_id
        summary["optimus-batch-id"] = str(batch_id)
    meta = dict(meta)
    ts_ms = snapshot_timestamp_ms(meta)
    new_snap = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": ts_ms,
        "manifest-list": ml_rel,
        "summary": summary,
    }
    _stamp_parent_snapshot(new_snap, meta)
    if fmt >= 2:
        new_snap["sequence-number"] = seq
        meta["last-sequence-number"] = seq
    if lineage:
        new_snap["first-row-id"] = lin_base
        meta["next-row-id"] = lin_next
    meta["snapshots"] = snaps + [new_snap]
    append_snapshot_log(meta, meta, ts_ms, snapshot_id)
    advance_main_ref(meta, snapshot_id)
    meta["current-snapshot-id"] = snapshot_id
    path = os.path.join(md, f"v{version}.metadata.json")
    tmpp = path + ".tmp"
    with open(tmpp, "w") as f:
        f.write(json.dumps(meta, indent=2))
    os.replace(tmpp, path)
    tmph = hint + ".tmp"
    with open(tmph, "w") as f:
        f.write(str(version))
    os.replace(tmph, hint)  # the atomic step: the hint names the table
    return version


def delete_iceberg_keys(
    spark: SparkSession,
    table_path: str,
    key_col: str,
    keys: DataFrame,
    app_id: str = DEFAULT_APP_ID,
    batch_id: int | None = None,
) -> int:
    """MERGE-ON-READ DELETE by key: commit ONE equality-delete file
    (the distinct key set, written distributed — never collected) and
    a delete manifest; no data file is read or rewritten. The snapshot
    reader applies it as a sequence-gated anti-join, so rows appended
    AFTER this commit with the same keys stay alive — write
    amplification is O(distinct keys), the Iceberg-native GDPR-erasure
    shape. Upgrades the table metadata to format-version 2. Returns
    the committed metadata version (unchanged on a no-op or an
    idempotent redelivery).

    The copy-on-write alternative for Iceberg is ``merge_iceberg_batch``
    (rewrite the affected files); it composes with this one — a later
    merge reads its affected files with the deletes applied, stamps a
    higher data-sequence number on the rewrite, and carries the delete
    manifests forward for the files it did not touch."""
    md = _meta_dir(table_path)
    hint = os.path.join(md, "version-hint.text")
    if not os.path.exists(hint):
        raise ValueError(f"iceberg delete: no table at {table_path}")
    prev_version = int(open(hint).read().strip())
    meta = load_table_metadata(table_path, version=prev_version)
    _refuse_unpublished_branches(meta)
    snaps = meta.get("snapshots") or []
    if batch_id is not None:
        for sn in reversed(snaps):
            summ = sn.get("summary") or {}
            if summ.get("optimus-app-id") == app_id:
                last = summ.get("optimus-batch-id")
                if last is not None and batch_id <= int(last):
                    return prev_version
                break
    fid, _ice_t = _key_field(meta, key_col)
    schema = iceberg_spark_schema(meta)
    kdf = keys.select(
        F.col(key_col).cast(schema[key_col].dataType).alias(key_col)
    ).distinct()
    version = prev_version + 1
    snapshot_id = version
    seq = version

    os.makedirs(os.path.join(table_path, "data"), exist_ok=True)
    tmp = os.path.join(table_path, f"_tmp-eqdel-v{version}")
    # Write amplification is O(distinct keys), so one file is the
    # normal erasure shape — but a mass key erasure funnelling every
    # key through a single coalesce(1) task would bottleneck exactly
    # like the positional writer used to (VERDICT r9 item 4). The spec
    # allows many equality-delete files per commit: past
    # _MAX_DELETE_FILE_ROWS the key set is range-partitioned and each
    # range lands as its own content=2 entry; the anti-join reader
    # consumes any number of them.
    kdf = kdf.localCheckpoint(eager=False)
    n_keys = int(kdf.count())
    if n_keys == 0:
        return prev_version
    n_files = max(1, -(-n_keys // _MAX_DELETE_FILE_ROWS))
    out = (
        kdf.coalesce(1)
        if n_files == 1
        else kdf.repartitionByRange(n_files, key_col)
    ).sortWithinPartitions(key_col)
    out.write.mode("overwrite").parquet(tmp)
    parts = sorted(_glob.glob(os.path.join(tmp, "part-*.parquet")))
    eq_rels: list[str] = []
    for i, part in enumerate(parts):
        rel = (
            f"data/{version:05d}-delete-eq.parquet"
            if len(parts) == 1
            else f"data/{version:05d}-delete-eq-{i:04d}.parquet"
        )
        os.replace(part, os.path.join(table_path, rel))
        eq_rels.append(rel)
    shutil.rmtree(tmp)

    entry_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"],
             "default": None, "field-id": 1},
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int",
                         "field-id": 134},
                        {"name": "file_path", "type": "string",
                         "field-id": 100},
                        {"name": "file_format", "type": "string",
                         "field-id": 101},
                        {"name": "partition",
                         "type": {"type": "record", "name": "r102",
                                  "fields": []},
                         "field-id": 102},
                        {"name": "record_count", "type": "long",
                         "field-id": 103},
                        {"name": "file_size_in_bytes", "type": "long",
                         "field-id": 104},
                        {"name": "equality_ids",
                         "type": ["null",
                                  {"type": "array", "items": "int"}],
                         "default": None, "field-id": 135},
                    ],
                },
            },
        ],
    }
    manifest_rel = (
        "metadata/"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'{table_path}|ed{version}')}"
        "-m0.avro"
    )
    import pyarrow.parquet as _pq

    eq_entries = []
    for rel in eq_rels:
        full = os.path.join(table_path, rel)
        rc = int(_pq.read_metadata(full).num_rows)  # footer, no job
        if rc == 0:  # an empty range split: not worth an entry
            os.remove(full)
            continue
        eq_entries.append(
            {
                "status": _ST_ADDED,
                "snapshot_id": snapshot_id,
                "data_file": {
                    "content": 2,  # EQUALITY_DELETES
                    "file_path": rel,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": rc,
                    "file_size_in_bytes": os.path.getsize(full),
                    "equality_ids": [fid],
                },
            }
        )
    write_container(
        os.path.join(table_path, manifest_rel),
        entry_schema,
        eq_entries,
    )
    prior_manifests: list[dict] = []
    cur_snap_id = meta.get("current-snapshot-id")
    if cur_snap_id not in (None, -1) and snaps:
        snap = next(
            sn for sn in snaps if sn["snapshot-id"] == cur_snap_id
        )
        _, prior_manifests = read_container(
            _localize(table_path, snap["manifest-list"])
        )
    for r in prior_manifests:
        r.setdefault("sequence_number", None)
    _ice_preserve_manifest_lineage(table_path, meta, prior_manifests)
    ml_rel = (
        "metadata/"
        f"snap-{snapshot_id}-1-"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'{table_path}|edl{version}')}.avro"
    )
    write_container(
        os.path.join(table_path, ml_rel),
        MANIFEST_FILE_SCHEMA,
        prior_manifests
        + [
            {
                "manifest_path": manifest_rel,
                "manifest_length": os.path.getsize(
                    os.path.join(table_path, manifest_rel)
                ),
                "partition_spec_id": _global_delete_spec_id(meta),
                "content": 1,  # DELETES
                "added_snapshot_id": snapshot_id,
                "sequence_number": seq,
            }
        ],
    )
    summary = {"operation": "delete"}
    if batch_id is not None:
        summary["optimus-app-id"] = app_id
        summary["optimus-batch-id"] = str(batch_id)
    meta = dict(meta)
    # row-level deletes need format-v2 features, but a v3-tagged table
    # (readable when it uses only v2 features) must NOT be silently
    # downgraded by a DELETE (ADVICE r8)
    meta["format-version"] = max(2, int(meta.get("format-version", 1)))
    meta["last-sequence-number"] = seq
    ts_ms = snapshot_timestamp_ms(meta)
    eq_snap = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": ts_ms,
        "sequence-number": seq,
        "manifest-list": ml_rel,
        "summary": summary,
    }
    _stamp_parent_snapshot(eq_snap, meta)
    if meta.get("next-row-id") is not None:
        # row-lineage tables: deletes assign no rows
        eq_snap["first-row-id"] = int(meta["next-row-id"])
    meta["snapshots"] = snaps + [eq_snap]
    append_snapshot_log(meta, meta, ts_ms, snapshot_id)
    advance_main_ref(meta, snapshot_id)
    meta["current-snapshot-id"] = snapshot_id
    path = os.path.join(md, f"v{version}.metadata.json")
    tmpp = path + ".tmp"
    with open(tmpp, "w") as f:
        f.write(json.dumps(meta, indent=2))
    os.replace(tmpp, path)
    tmph = hint + ".tmp"
    with open(tmph, "w") as f:
        f.write(str(version))
    os.replace(tmph, hint)
    return version


def delete_iceberg_positions(
    spark: SparkSession,
    table_path: str,
    key_col: str,
    keys: DataFrame,
    app_id: str = DEFAULT_APP_ID,
    batch_id: int | None = None,
    use_deletion_vectors: bool = False,
) -> int:
    """MERGE-ON-READ DELETE writing a POSITIONAL delete file (spec
    content=1): locate the matching rows' ``(data-file path, row
    position)`` identities and commit them as one sorted delete
    parquet + delete manifest — no data file is rewritten. This is the
    Iceberg twin of the Delta deletion-vector DELETE
    (streaming/delta_table.py ``use_deletion_vectors=True``), closing
    VERDICT-r7 item 2: write amplification is O(deleted positions).

    Shape: bounds-prune the data entries on the key (Appendix-D
    lower/upper bounds — only files that can hold a key are scanned),
    read the affected files through the merge-on-read path (existing
    positional/equality deletes APPLIED, so already-deleted rows are
    never re-listed), semi-join the keys, and project
    ``(_metadata-derived file path, row_index)``. One scan + one
    semi-join + one small write — constant jobs in file count.

    The delete file's rows are ``(file_path, pos)`` sorted by file
    then position as the spec requires (field-ids 2147483546 /
    2147483545); its manifest-list row stamps this commit's sequence
    number, and the reader's ``pseq >= dseq`` gate applies it to every
    current data file while rows appended AFTER this commit stay
    alive. Compaction (``compact_iceberg``) consumes and retires the
    file like any fixture-written positional delete."""
    from optimus_any2any_spark.sources.iceberg import (
        _DELETE_ENTRY_SCHEMA,
        _MANIFEST_FILE_SCHEMA,
        _prune_by_bounds,
        _snapshot_entries,
        read_entries_with_deletes,
    )

    md = _meta_dir(table_path)
    hint = os.path.join(md, "version-hint.text")
    if not os.path.exists(hint):
        raise ValueError(f"iceberg delete: no table at {table_path}")
    prev_version = int(open(hint).read().strip())
    meta = load_table_metadata(table_path, version=prev_version)
    _refuse_unpublished_branches(meta)
    snaps = meta.get("snapshots") or []
    if batch_id is not None:
        for sn in reversed(snaps):
            summ = sn.get("summary") or {}
            if summ.get("optimus-app-id") == app_id:
                last = summ.get("optimus-batch-id")
                if last is not None and batch_id <= int(last):
                    return prev_version
                break
    schema = iceberg_spark_schema(meta)
    kdf = (
        keys.select(
            F.col(key_col).cast(schema[key_col].dataType).alias(key_col)
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    # One bounded probe replaces the stats aggregate in the common
    # driver-sized case: limit(cap+1) both answers "does the distinct
    # key set fit" and, when it does, yields the rows to derive
    # n/kmin/kmax locally (NaN ordered greatest, exactly Spark's
    # float ordering). Only an over-cap key set pays the aggregate.
    probe = kdf.limit(_MAX_DRIVER_KEYS + 1).collect()
    n_keys = len(probe)
    if n_keys == 0:
        return prev_version
    if n_keys <= _MAX_DRIVER_KEYS:
        nonnull = [r[0] for r in probe if r[0] is not None]
        ordk = lambda v: (isinstance(v, float) and v != v, v)  # noqa: E731
        kmin = min(nonnull, key=ordk) if nonnull else None
        kmax = max(nonnull, key=ordk) if nonnull else None
    else:
        krow = kdf.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(key_col).alias("kmin"),
            F.max(key_col).alias("kmax"),
        ).collect()[0]
        n_keys = krow["n"]
        kmin, kmax = krow["kmin"], krow["kmax"]

    data, pos_del, eq_del = _snapshot_entries(table_path, meta)
    if kmin is not None:
        data = _prune_by_bounds(meta, data, key_col, kmin, kmax)
    if not data:
        return prev_version
    # guarded names: the table schema may itself have file_path/pos
    cur = read_entries_with_deletes(
        spark, meta, schema, data, pos_del, eq_del,
        position_cols=("__del_fp", "__del_pos"),
    )
    matching = (
        cur.join(F.broadcast(kdf), key_col, "left_semi")
        if n_keys <= _MAX_DRIVER_KEYS
        else cur.join(kdf, key_col, "left_semi")
    ).select(
        F.col("__del_fp").alias("file_path"),
        F.col("__del_pos").alias("pos"),
    )

    version = prev_version + 1
    snapshot_id = version
    seq = version
    os.makedirs(os.path.join(table_path, "data"), exist_ok=True)
    tmp = os.path.join(table_path, f"_tmp-posdel-v{version}")
    # The spec requires delete rows sorted by (file_path, pos) WITHIN
    # each delete file; one file per commit is the normal erasure
    # shape, but a mass delete funnelling every position through the
    # single coalesce(1) task would bottleneck at 100 TB. The spec
    # allows many delete files per commit, so past
    # _MAX_DELETE_FILE_ROWS the positions are range-partitioned by
    # (file_path, pos) — each range lands as its own spec-sorted
    # parquet; reader and compaction consume any number of content=1
    # entries (VERDICT r8 item 7). sortWithinPartitions (not a global
    # orderBy feeding coalesce) makes the per-file sort a guarantee
    # rather than an artifact of coalesce's partition-order concat
    # (ADVICE r8).
    matching = matching.localCheckpoint(eager=False)
    n_pos = matching.count()
    if n_pos == 0:  # no row matched: burn no version
        return prev_version
    if use_deletion_vectors:
        # FORMAT-V3 DELETION VECTORS: one Roaring bitmap per
        # referenced data file, framed as deletion-vector-v1 blobs in
        # ONE Puffin sidecar (formats/puffin.py) — the true v3 twin
        # of the Delta DV delete. The per-file encode runs on
        # EXECUTORS (applyInPandas); only the compressed blobs (one
        # row per DV'd FILE) cross to the driver for the sidecar
        # write. Requires format-version 3 metadata — the reader side
        # shipped first (_puffin_dv_ref), so self-written DVs
        # round-trip through merge/compaction like fixture ones.
        entries, rels = _write_dv_delete_files(
            spark, table_path, matching, version, snapshot_id, seq
        )
        shutil.rmtree(tmp, ignore_errors=True)
        fmt_floor = 3
    else:
        entries, rels = _write_pos_delete_files(
            spark, table_path, matching, n_pos, version, snapshot_id,
            tmp,
        )
        fmt_floor = 2
    manifest_rel = (
        "metadata/"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'{table_path}|pd{version}')}"
        "-m0.avro"
    )
    write_container(
        os.path.join(table_path, manifest_rel),
        _DELETE_ENTRY_SCHEMA,
        entries,
    )
    return _commit_delete_manifest(
        spark, table_path, meta, snaps, manifest_rel, version,
        snapshot_id, seq, app_id, batch_id, fmt_floor,
    )


def _write_pos_delete_files(
    spark, table_path, matching, n_pos, version, snapshot_id, tmp
):
    """The delete-parquet form: spec-sorted (file_path, pos) rows,
    range-split past _MAX_DELETE_FILE_ROWS."""
    n_files = max(1, -(-n_pos // _MAX_DELETE_FILE_ROWS))
    out = (
        matching.coalesce(1)
        if n_files == 1
        else matching.repartitionByRange(n_files, "file_path", "pos")
    ).sortWithinPartitions("file_path", "pos")
    out.write.mode("overwrite").parquet(tmp)
    parts = sorted(_glob.glob(os.path.join(tmp, "part-*.parquet")))
    rels: list[str] = []
    for i, part in enumerate(parts):
        rel = (
            f"data/{version:05d}-delete-pos.parquet"
            if len(parts) == 1
            else f"data/{version:05d}-delete-pos-{i:04d}.parquet"
        )
        os.replace(part, os.path.join(table_path, rel))
        rels.append(rel)
    shutil.rmtree(tmp)

    import pyarrow.parquet as _pq

    entries = []
    for rel in rels:
        full = os.path.join(table_path, rel)
        rc = int(_pq.read_metadata(full).num_rows)
        if rc == 0:  # an empty range split: not worth an entry
            os.remove(full)
            continue
        entries.append(
            {
                "status": _ST_ADDED,
                "snapshot_id": snapshot_id,
                "data_file": {
                    "content": 1,  # POSITION_DELETES
                    "file_path": rel,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": rc,
                    "file_size_in_bytes": os.path.getsize(full),
                    "equality_ids": None,
                },
            }
        )
    return entries, rels


def _write_dv_delete_files(
    spark, table_path, matching, version, snapshot_id, seq
):
    """The v3 deletion-vector form: per referenced data file, the
    deleted positions encode as one Roaring portable64 bitmap framed
    as a deletion-vector-v1 blob (formats/puffin.py), all blobs in
    ONE Puffin sidecar. Encode runs on executors; the driver only
    sees (file_path, compressed blob, cardinality) — one row per
    DV'd file."""
    import pandas  # noqa: F401  (annotation resolution)

    globals().setdefault("pandas", pandas)
    from pyspark import cloudpickle as _cp

    from optimus_any2any_spark.formats import puffin as _puffin
    from optimus_any2any_spark.formats import roaring as _roaring

    _cp.register_pickle_by_value(_roaring)
    _cp.register_pickle_by_value(_puffin)
    dv_puffin_blob = _puffin.dv_puffin_blob

    def _encode(pdf: pandas.DataFrame) -> pandas.DataFrame:
        import pandas as _pd

        positions = sorted(int(v) for v in pdf["pos"])
        return _pd.DataFrame(
            {
                "file_path": [pdf["file_path"].iloc[0]],
                "blob": [dv_puffin_blob(positions)],
                "cardinality": [len(set(positions))],
            }
        )

    enc_rows = sorted(
        matching.groupBy("file_path")
        .applyInPandas(
            _encode, "file_path string, blob binary, cardinality long"
        )
        .collect(),
        key=lambda r: r["file_path"],
    )
    from optimus_any2any_spark.formats.puffin import DV_V1, write_puffin

    rel = f"data/{version:05d}-delete-dv.puffin"
    blob_meta = write_puffin(
        os.path.join(table_path, rel),
        [
            (
                bytes(r["blob"]),
                {
                    "type": DV_V1,
                    "fields": [],
                    "snapshot-id": snapshot_id,
                    "sequence-number": seq,
                    "properties": {
                        "referenced-data-file": r["file_path"],
                        "cardinality": str(int(r["cardinality"])),
                    },
                },
            )
            for r in enc_rows
        ],
    )
    fsize = os.path.getsize(os.path.join(table_path, rel))
    entries = [
        {
            "status": _ST_ADDED,
            "snapshot_id": snapshot_id,
            "data_file": {
                "content": 1,  # POSITION_DELETES (vector form)
                "file_path": rel,
                "file_format": "PUFFIN",
                "partition": {},
                "record_count": int(bm["properties"]["cardinality"]),
                "file_size_in_bytes": fsize,
                "equality_ids": None,
                "referenced_data_file": bm["properties"][
                    "referenced-data-file"
                ],
                "content_offset": bm["offset"],
                "content_size_in_bytes": bm["length"],
            },
        }
        for bm in blob_meta
    ]
    return entries, [rel]


def _global_delete_spec_id(meta: dict) -> int:
    """The spec id a GLOBAL delete manifest must reference. Delete
    files written here carry an EMPTY partition record, which per the
    format is only legal under an UNPARTITIONED spec — on a
    partitioned table the writer appends one to ``partition-specs``
    (mutating ``meta``, which the delete commit re-serializes anyway)
    rather than mis-stamping the partitioned default (the spec's
    "global deletes are written as delete files with an unpartitioned
    spec" rule)."""
    specs = list(meta.get("partition-specs") or [])
    if not specs:
        legacy = meta.get("partition-spec") or []
        if not legacy:
            return int(meta.get("default-spec-id", 0))
        specs = [{"spec-id": 0, "fields": legacy}]
        meta["partition-specs"] = specs
    for sp in specs:
        if not (sp.get("fields") or []):
            return int(sp["spec-id"])
    new_sid = max(int(sp["spec-id"]) for sp in specs) + 1
    meta["partition-specs"] = specs + [{"spec-id": new_sid,
                                        "fields": []}]
    return new_sid


def _resolve_entry_lineage(
    table_path: str, meta: dict, entries: list[dict]
) -> None:
    """Materialize inherited ``first_row_id`` on RAW manifest entries
    (data files only) before a rewrite re-lists them: under the NEW
    manifest a null would mis-inherit from the new snapshot's
    first-row-id, shifting every derived row id. One reader-identical
    metadata walk (sources.iceberg._snapshot_entries resolves the
    spec's inheritance) fills the values in place; entries that stay
    null afterwards are genuinely unassignable and the callers'
    guards refuse by name."""
    missing = [
        e
        for e in entries
        if int(e["data_file"].get("content") or 0) == 0
        and e["data_file"].get("first_row_id") is None
    ]
    if not missing:
        return
    from optimus_any2any_spark.sources.iceberg import (
        _snapshot_entries,
    )

    data, _pd, _ed = _snapshot_entries(table_path, meta)
    by_path = {d["orig"]: d.get("first_row_id") for d in data}
    for e in missing:
        fri = by_path.get(e["data_file"]["file_path"])
        if fri is not None:
            e["data_file"]["first_row_id"] = int(fri)


def _commit_delete_manifest(
    spark, table_path, meta, snaps, manifest_rel, version, snapshot_id,
    seq, app_id, batch_id, fmt_floor,
    extra_ml_rows: list | None = None,
    extra_summary: dict | None = None,
    operation: str = "delete",
    first_row_id: int | None = None,
    next_row_id: int | None = None,
):
    """Shared tail of the merge-on-read DELETE writers: the new
    manifest-list row, the snapshot (real timestamp + snapshot-log +
    main-ref advance), and the version/hint commit. ``extra_ml_rows``
    lets a caller land ADDITIONAL manifests (the MoR UPDATE's new-data
    manifest) in the same snapshot; ``extra_summary`` merges
    caller keys (predicates) into the snapshot summary."""
    from optimus_any2any_spark.sources.iceberg import (
        _MANIFEST_FILE_SCHEMA,
        _preserve_manifest_lineage,
    )

    _refuse_unpublished_branches(meta)
    md = _meta_dir(table_path)
    hint = os.path.join(md, "version-hint.text")
    prior_manifests: list[dict] = []
    cur_snap_id = meta.get("current-snapshot-id")
    if cur_snap_id not in (None, -1) and snaps:
        snap = next(
            sn for sn in snaps if sn["snapshot-id"] == cur_snap_id
        )
        _, prior_manifests = read_container(
            _localize(table_path, snap["manifest-list"])
        )
    for r in prior_manifests:
        r.setdefault("sequence_number", None)
    _preserve_manifest_lineage(table_path, meta, prior_manifests)
    ml_rel = (
        "metadata/"
        f"snap-{snapshot_id}-1-"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'{table_path}|pdl{version}')}.avro"
    )
    write_container(
        os.path.join(table_path, ml_rel),
        _MANIFEST_FILE_SCHEMA,
        prior_manifests
        + list(extra_ml_rows or [])
        + [
            {
                "manifest_path": manifest_rel,
                "manifest_length": os.path.getsize(
                    os.path.join(table_path, manifest_rel)
                ),
                "partition_spec_id": _global_delete_spec_id(meta),
                "content": 1,  # DELETES
                "added_snapshot_id": snapshot_id,
                "sequence_number": seq,
            }
        ],
    )
    summary = {"operation": operation}
    if extra_summary:
        summary.update(extra_summary)
    if batch_id is not None:
        summary["optimus-app-id"] = app_id
        summary["optimus-batch-id"] = str(batch_id)
    meta = dict(meta)
    # row-level deletes need format-v2 features (v3 for deletion
    # vectors), but a higher-tagged table must NOT be silently
    # downgraded by a DELETE (ADVICE r8)
    meta["format-version"] = max(
        fmt_floor, int(meta.get("format-version", 1))
    )
    meta["last-sequence-number"] = seq
    ts_ms = snapshot_timestamp_ms(meta)
    new_snap = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": ts_ms,
        "sequence-number": seq,
        "manifest-list": ml_rel,
        "summary": summary,
    }
    _stamp_parent_snapshot(new_snap, meta)
    if meta.get("next-row-id") is not None:
        # row-lineage tables: every snapshot stamps its first-row-id;
        # pure deletes assign no rows (first = next, unchanged), the
        # MoR UPDATE's insert half advances next-row-id
        new_snap["first-row-id"] = (
            int(first_row_id)
            if first_row_id is not None
            else int(meta["next-row-id"])
        )
        if next_row_id is not None:
            meta["next-row-id"] = int(next_row_id)
    meta["snapshots"] = snaps + [new_snap]
    append_snapshot_log(meta, meta, ts_ms, snapshot_id)
    advance_main_ref(meta, snapshot_id)
    meta["current-snapshot-id"] = snapshot_id
    path = os.path.join(md, f"v{version}.metadata.json")
    tmpp = path + ".tmp"
    with open(tmpp, "w") as f:
        f.write(json.dumps(meta, indent=2))
    os.replace(tmpp, path)
    tmph = hint + ".tmp"
    with open(tmph, "w") as f:
        f.write(str(version))
    os.replace(tmph, hint)
    return version


def delete_iceberg_where(
    spark: SparkSession,
    table_path: str,
    where: str,
    use_deletion_vectors: bool = False,
) -> int | None:
    """``DELETE FROM t WHERE <predicate>`` — predicate DML, the
    Iceberg twin of ``delete_delta_where`` expressed the
    Iceberg-native way: MERGE-ON-READ. One scan evaluates the
    predicate over the live rows (prior positional/equality deletes
    applied, so an already-deleted row is never re-deleted) and the
    matching rows' ``(data-file path, position)`` identities commit
    as positional-delete files (spec content=1) — or format-v3
    deletion vectors with ``use_deletion_vectors=True`` — without
    rewriting a single data byte. Write amplification is O(matched
    rows); an untouched data file is never read twice because the
    positions come from the same scan that evaluated the predicate.
    Null predicates keep the row (SQL three-valued DELETE). Returns
    the committed metadata version, or None when nothing matched (no
    version burned). The snapshot summary records the predicate."""
    from optimus_any2any_spark.sources.iceberg import (
        _DELETE_ENTRY_SCHEMA,
        _snapshot_entries,
        read_entries_with_deletes,
    )

    md = _meta_dir(table_path)
    hint = os.path.join(md, "version-hint.text")
    if not os.path.exists(hint):
        raise ValueError(f"iceberg delete: no table at {table_path}")
    prev_version = int(open(hint).read().strip())
    meta = load_table_metadata(table_path, version=prev_version)
    schema = iceberg_spark_schema(meta)
    data, pos_del, eq_del = _snapshot_entries(table_path, meta)
    if not data:
        return None
    cur = read_entries_with_deletes(
        spark, meta, schema, data, pos_del, eq_del,
        position_cols=("__del_fp", "__del_pos"),
    )
    hit = F.coalesce(F.expr(where), F.lit(False))
    matching = (
        cur.filter(hit)
        .select(
            F.col("__del_fp").alias("file_path"),
            F.col("__del_pos").alias("pos"),
        )
        .localCheckpoint(eager=False)
    )
    n_pos = matching.count()
    if n_pos == 0:
        return None
    snaps = meta.get("snapshots") or []
    version = prev_version + 1
    snapshot_id = version
    seq = version
    os.makedirs(os.path.join(table_path, "data"), exist_ok=True)
    tmp = os.path.join(table_path, f"_tmp-delwhere-v{version}")
    if use_deletion_vectors:
        entries, _rels = _write_dv_delete_files(
            spark, table_path, matching, version, snapshot_id, seq
        )
        fmt_floor = 3
    else:
        entries, _rels = _write_pos_delete_files(
            spark, table_path, matching, n_pos, version, snapshot_id,
            tmp,
        )
        fmt_floor = 2
    manifest_rel = (
        "metadata/"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'{table_path}|dw{version}')}"
        "-m0.avro"
    )
    write_container(
        os.path.join(table_path, manifest_rel),
        _DELETE_ENTRY_SCHEMA,
        entries,
    )
    return _commit_delete_manifest(
        spark, table_path, meta, snaps, manifest_rel, version,
        snapshot_id, seq, DEFAULT_APP_ID, None, fmt_floor,
        extra_summary={"predicate": where},
    )


def update_iceberg_where(
    spark: SparkSession,
    table_path: str,
    set: dict,
    where: str | None = None,
    use_deletion_vectors: bool = False,
    target_rows_per_file: int = 1_000_000,
) -> int | None:
    """``UPDATE t SET col = expr[, ...] WHERE <predicate>`` — the
    Iceberg twin of ``update_delta_where``, expressed as the spec's
    merge-on-read UPDATE: ONE snapshot that (a) positional-deletes the
    matched rows from their current files and (b) appends new data
    files holding the updated rows. No unmatched byte rewrites; write
    amplification is O(matched rows) on both sides. One scan feeds
    both halves (the matched frame is checkpointed once). SET
    expressions all read the PRE-update row (a single projection), and
    rows whose predicate is false or null pass through untouched
    because their files are not rewritten at all — merge-on-read makes
    the Delta twin's "untouched files carry over byte-identical"
    property trivially true for MATCHED files too.

    Partition handling falls out of the delete+append shape: appended
    rows recompute their partition tuple from the UPDATED values under
    the DEFAULT spec, so assigning a partition source column performs
    row migration natively (the Delta twin must refuse that — its
    copy-on-write rewrite pins rows to their files' partitions).
    Returns the committed version, or None when nothing matched."""
    from optimus_any2any_spark.sources.iceberg import (
        _DELETE_ENTRY_SCHEMA,
        _snapshot_entries,
        read_entries_with_deletes,
    )
    from optimus_any2any_spark.sources.iceberg_transforms import (
        avro_type_of_result,
        spark_type_of_result,
        transform_column,
    )

    if not set or not isinstance(set, dict):
        raise ValueError("iceberg update: SET needs {col: value_sql}")
    md = _meta_dir(table_path)
    hint = os.path.join(md, "version-hint.text")
    if not os.path.exists(hint):
        raise ValueError(f"iceberg update: no table at {table_path}")
    prev_version = int(open(hint).read().strip())
    meta = load_table_metadata(table_path, version=prev_version)
    schema = iceberg_spark_schema(meta)
    for c in set:
        if c not in schema.fieldNames():
            raise ValueError(f"iceberg update: unknown column {c!r}")
    by_id = _current_schema_fields(meta)
    specs = meta.get("partition-specs") or []
    default_sid = int(meta.get("default-spec-id", 0))
    default_spec = next(
        (s for s in specs if int(s.get("spec-id", 0)) == default_sid),
        None,
    )
    if default_spec is None and meta.get("partition-spec"):
        default_spec = {"spec-id": 0,
                        "fields": meta["partition-spec"]}
    pspec = _parse_pspec(default_spec, by_id, "update")
    part_names = [p["name"] for p in pspec]
    part_fields = [
        (p["name"], avro_type_of_result(p["res_type"])) for p in pspec
    ]

    data, pos_del, eq_del = _snapshot_entries(table_path, meta)
    if not data:
        return None
    cur = read_entries_with_deletes(
        spark, meta, schema, data, pos_del, eq_del,
        position_cols=("__del_fp", "__del_pos"),
    )
    pred = F.expr(where) if where else F.lit(True)
    hit = F.coalesce(pred, F.lit(False))
    matched = cur.filter(hit).localCheckpoint(eager=False)
    n_upd = matched.count()
    if n_upd == 0:
        return None

    snaps = meta.get("snapshots") or []
    version = prev_version + 1
    snapshot_id = version
    seq = version
    os.makedirs(os.path.join(table_path, "data"), exist_ok=True)

    # ---- delete half: the matched rows' current identities ----
    positions = matched.select(
        F.col("__del_fp").alias("file_path"),
        F.col("__del_pos").alias("pos"),
    )
    tmp_d = os.path.join(table_path, f"_tmp-updwhere-del-v{version}")
    if use_deletion_vectors:
        del_entries, _rels = _write_dv_delete_files(
            spark, table_path, positions, version, snapshot_id, seq
        )
        fmt_floor = 3
    else:
        del_entries, _rels = _write_pos_delete_files(
            spark, table_path, positions, n_upd, version, snapshot_id,
            tmp_d,
        )
        fmt_floor = 2
    del_manifest_rel = (
        "metadata/"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'{table_path}|uw{version}')}"
        "-m0.avro"
    )
    write_container(
        os.path.join(table_path, del_manifest_rel),
        _DELETE_ENTRY_SCHEMA,
        del_entries,
    )

    # ---- append half: the updated rows, routed by their (possibly
    # new) partition tuple under the default spec ----
    type_of = {f.name: f.dataType for f in schema.fields}
    updated = matched.select(
        *[
            F.expr(set[c]).cast(type_of[c]).alias(c)
            if c in set
            else F.col(c)
            for c in schema.fieldNames()
        ]
    )
    pv_cols = [f"__pv{i}" for i in range(len(pspec))]
    upd_pv = updated
    for i, p in enumerate(pspec):
        upd_pv = upd_pv.withColumn(
            pv_cols[i],
            transform_column(p["transform"], F.col(p["src"]),
                             p["src_type"]),
        )
    if pspec:
        ptuples = sorted(
            (
                tuple(r[c] for c in pv_cols)
                for r in upd_pv.select(*pv_cols).distinct().collect()
            ),
            key=str,
        )
    else:
        ptuples = [()]
    single = len(ptuples) == 1
    first_col = schema.fieldNames()[0]
    n_files = max(1, -(-n_upd // target_rows_per_file))
    tmp = os.path.join(table_path, f"_tmp-updwhere-v{version}")
    new_rel: list[str] = []
    pt_of_rel: dict[str, tuple] = {}
    file_seq = 0
    if single:
        (
            upd_pv.drop(*pv_cols)
            .repartitionByRange(n_files, F.col(first_col))
            .write.mode("overwrite")
            .parquet(tmp)
        )
        for part in sorted(
            _glob.glob(os.path.join(tmp, "part-*.parquet"))
        ):
            rel = f"data/{version:05d}-{file_seq:04d}-update.parquet"
            file_seq += 1
            os.replace(part, os.path.join(table_path, rel))
            new_rel.append(rel)
            pt_of_rel[rel] = ptuples[0]
    else:
        pid_of = {pt: i for i, pt in enumerate(ptuples)}
        pid_ddl = ", ".join(
            f"{pv_cols[i]} {spark_type_of_result(pspec[i]['res_type'])}"
            for i in range(len(pspec))
        )
        pid_df = local_rows_df(spark, 
            [pt + (pid_of[pt],) for pt in ptuples],
            f"{pid_ddl}, __pid int",
        )
        pcond = None
        for c in pv_cols:
            e = F.col(f"b.{c}").eqNullSafe(F.col(f"pd.{c}"))
            pcond = e if pcond is None else (pcond & e)
        routed = (
            upd_pv.alias("b")
            .join(F.broadcast(pid_df.alias("pd")), pcond, "inner")
            .select(
                *[F.col(f"b.{c}") for c in schema.fieldNames()],
                F.col("pd.__pid"),
            )
        )
        (
            routed.repartitionByRange(
                n_files, F.col("__pid"), F.col(first_col)
            )
            .write.partitionBy("__pid")
            .mode("overwrite")
            .parquet(tmp)
        )
        for pdir in sorted(_glob.glob(os.path.join(tmp, "__pid=*"))):
            pid = int(os.path.basename(pdir).split("=", 1)[1])
            for part in sorted(
                _glob.glob(os.path.join(pdir, "part-*.parquet"))
            ):
                rel = (
                    f"data/{version:05d}-{file_seq:04d}-update.parquet"
                )
                file_seq += 1
                os.replace(part, os.path.join(table_path, rel))
                new_rel.append(rel)
                pt_of_rel[rel] = ptuples[pid]
    shutil.rmtree(tmp)

    per_file = (
        _per_file_key_stats(spark, table_path, new_rel, None, None)
        if new_rel
        else {}
    )
    # v3 row lineage: delete+insert UPDATE legitimately mints fresh
    # row ids for the re-appended rows (the spec's lineage contract
    # for MoR updates); survivors' ids never move because their
    # files and positions are untouched
    lineage = meta.get("next-row-id") is not None
    row_base = int(meta["next-row-id"]) if lineage else None
    nxt_row = row_base
    new_entries = []
    for rel in new_rel:
        r = per_file.get(rel.rsplit("/", 1)[-1])
        if r is None:  # empty part
            os.remove(os.path.join(table_path, rel))
            continue
        pt = pt_of_rel[rel]
        dfe = {
            "file_path": rel,
            "file_format": "PARQUET",
            "partition": {
                n: v for n, v in zip(part_names, pt)
            },
            "record_count": int(r["rows"]),
            "file_size_in_bytes": os.path.getsize(
                os.path.join(table_path, rel)
            ),
            "null_value_counts": None,
            "lower_bounds": None,
            "upper_bounds": None,
        }
        if lineage:
            dfe["first_row_id"] = nxt_row
            nxt_row += int(r["rows"])
        new_entries.append(
            {
                "status": _ST_ADDED,
                "snapshot_id": snapshot_id,
                "data_file": dfe,
            }
        )
    data_manifest_rel = (
        "metadata/"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'{table_path}|uwd{version}')}"
        "-m1.avro"
    )
    write_container(
        os.path.join(table_path, data_manifest_rel),
        manifest_entry_schema(part_fields),
        new_entries,
    )
    data_ml_row = {
        "manifest_path": data_manifest_rel,
        "manifest_length": os.path.getsize(
            os.path.join(table_path, data_manifest_rel)
        ),
        "partition_spec_id": default_sid,
        "content": 0,
        "added_snapshot_id": snapshot_id,
        # new files inherit this commit's sequence: the delete half
        # (same seq) never touches them because its rows reference
        # only the OLD file paths
        "sequence_number": seq,
    }
    return _commit_delete_manifest(
        spark, table_path, meta, snaps, del_manifest_rel, version,
        snapshot_id, seq, DEFAULT_APP_ID, None, fmt_floor,
        extra_ml_rows=[data_ml_row],
        extra_summary={
            "predicate": where or "true",
            "updated-columns": json.dumps(sorted(set)),
        },
        operation="overwrite",
        first_row_id=row_base,
        next_row_id=nxt_row,
    )


def _per_file_multi_stats(
    spark: SparkSession,
    table_path: str,
    new_rel: list[str],
    cols: list[tuple[str, str]],  # (name, iceberg type)
) -> dict[str, dict]:
    """Per-basename ``{"rows", cols: {name: (min, max, nulls)}}`` over
    just-written files for SEVERAL stat columns (the ZORDER set needs
    bounds on every dimension or the clustering cannot prune). Footer
    fast path, one grouped Spark aggregate as the fallback."""
    ft = footer_file_stats(
        [os.path.join(table_path, p) for p in new_rel],
        [n for n, _ in cols],
        {n: kind_of_iceberg_type(t) for n, t in cols},
        session_tz=spark.conf.get("spark.sql.session.timeZone", "UTC"),
    )
    if ft is not None:
        return {
            name: {
                "rows": s["rows"],
                "cols": {
                    n: (
                        s["min"].get(n),
                        s["max"].get(n),
                        s["nulls"].get(n, 0),
                    )
                    for n, _ in cols
                },
            }
            for name, s in ft.items()
        }
    aggs = [F.count(F.lit(1)).alias("rows")]
    for n, _ in cols:
        aggs += [
            F.min(n).alias(f"__mn_{n}"),
            F.max(n).alias(f"__mx_{n}"),
            F.sum(F.col(n).isNull().cast("long")).alias(f"__nn_{n}"),
        ]
    rows = (
        spark.read.parquet(
            *[os.path.join(table_path, p) for p in new_rel]
        )
        .select(*[n for n, _ in cols])
        .withColumn("__f", F.input_file_name())
        .groupBy("__f")
        .agg(*aggs)
        .collect()
    )
    return {
        r["__f"].rsplit("/", 1)[-1]: {
            "rows": int(r["rows"]),
            "cols": {
                n: (
                    norm_float_zero(r[f"__mn_{n}"]),
                    norm_float_zero(r[f"__mx_{n}"]),
                    int(r[f"__nn_{n}"]),
                )
                for n, _ in cols
            },
        }
        for r in rows
    }


def compact_iceberg(
    spark: SparkSession,
    table_path: str,
    target_rows_per_file: int = 1_000_000,
    key_col: str | None = None,
    zorder_by: list[str] | None = None,
) -> int | None:
    """Iceberg compaction (the spec's ``rewrite_data_files`` /
    OPTIMIZE): per partition, rewrite groups of ≥2 undersized live
    data files into ``target_rows_per_file``-sized ones and commit a
    ``replace`` snapshot. Row-level deletes COMPOSE: compacted files
    are read with their positional/equality deletes applied (the same
    sequence-gated anti-joins the reader runs) and the rewrite's
    higher data-sequence number retires the consumed deletes for those
    files; delete manifests carry forward verbatim for everything
    untouched, and survivor entries keep their ORIGINAL sequence
    numbers. One read + one ``partitionBy(__pid)`` write + one grouped
    stats pass — constant Spark jobs in files and partitions, the
    shape of ``compact_delta``. ``key_col`` leads the re-cluster sort
    and the recorded bounds so post-compaction merges keep pruning.
    Returns the committed version, or None when no partition had two
    undersized files.

    ``zorder_by=[col, ...]`` is the ZORDER strategy of Iceberg's
    ``rewrite_data_files``: EVERY live default-spec file rewrites
    (partition evolution still carries old-spec manifests whole),
    routed on the shared Morton key over quantile buckets
    (``streaming/delta_table._with_zorder_value`` — the row algebra
    is format-agnostic), and the manifest entries record Appendix-D
    lower/upper bounds for EVERY z-ordered column so
    ``read_iceberg(key_range=...)`` prunes on any of them. Identity
    partition sources refuse (files never span identity partitions);
    transform sources (days/bucket/truncate) z-order fine — the
    within-partition residual is exactly what the curve tightens.
    The snapshot summary records ``zorder-by``."""
    from optimus_any2any_spark.sources.iceberg import (
        read_entries_with_deletes,
    )
    from optimus_any2any_spark.sources.iceberg_transforms import (
        avro_type_of_result,
    )

    md = _meta_dir(table_path)
    hint = os.path.join(md, "version-hint.text")
    if not os.path.exists(hint):
        raise ValueError(f"iceberg optimize: no table at {table_path}")
    prev_version = int(open(hint).read().strip())
    meta = load_table_metadata(table_path, version=prev_version)
    # row-lineage tables compact WITH lineage preservation: carried
    # rows' _row_id / _last_updated_sequence_number MATERIALIZE as
    # physical columns in the rewritten files (the spec's rewrite
    # contract) — the lineage read coalesces them over the derived
    # first_row_id + position values
    _refuse_unpublished_branches(meta)
    lineage = meta.get("next-row-id") is not None
    schema = iceberg_spark_schema(meta)
    by_id = _current_schema_fields(meta)
    specs = meta.get("partition-specs") or []
    default_spec = next(
        (s for s in specs if s.get("spec-id") == meta.get(
            "default-spec-id", 0)),
        None,
    )
    pspec = _parse_pspec(default_spec, by_id, "optimize")
    part_names = [p["name"] for p in pspec]
    part_fields = [
        (p["name"], avro_type_of_result(p["res_type"])) for p in pspec
    ]
    fid = ice_t = None
    if key_col is not None:
        fid, ice_t = _key_field(meta, key_col)
    stat_fields: list[tuple[str, int, str]] = []
    if zorder_by:
        names = set(schema.fieldNames())
        for c in zorder_by:
            if c not in names:
                raise ValueError(
                    f"iceberg optimize: unknown ZORDER column {c!r}"
                )
            for pp in pspec:
                if pp["transform"] == "identity" and pp["src"] == c:
                    raise ValueError(
                        f"iceberg optimize: ZORDER BY identity "
                        f"partition source {c!r} is meaningless — "
                        "files never span identity partitions"
                    )
        seen: set[str] = set()
        for c in ([key_col] if key_col else []) + list(zorder_by):
            if c in seen:
                continue
            seen.add(c)
            c_fid, c_it = _key_field(meta, c)
            stat_fields.append((c, c_fid, c_it))

    snaps = meta.get("snapshots") or []
    cur_snap_id = meta.get("current-snapshot-id")
    manifests: list[dict] = []
    if cur_snap_id not in (None, -1) and snaps:
        snap = next(s for s in snaps if s["snapshot-id"] == cur_snap_id)
        _, manifests = read_container(
            _localize(table_path, snap["manifest-list"])
        )

    def _eff_seq(e: dict, m: dict) -> int:
        s = e.get("sequence_number")
        if s is None:
            s = m.get("sequence_number")
        return int(s) if s is not None else 0

    # first pass: which (partition tuple) groups have >=2 undersized
    # live data files
    sizes: dict[tuple, int] = {}
    walked: list[tuple[dict, list[dict]]] = []  # (ml row, entries)
    pos_del: list[dict] = []
    eq_del: list[dict] = []
    _pf_cache: dict = {}  # one Puffin footer parse per DV file
    for m in manifests:
        _, entries = read_container(
            _localize(table_path, m["manifest_path"])
        )
        walked.append((m, entries))
        for e in entries:
            if int(e.get("status") or 0) == _ST_DELETED:
                continue
            df_ = e["data_file"]
            if int(m.get("content") or 0) == 1 or int(
                df_.get("content") or 0
            ) in (1, 2):
                ent = {
                    "path": _localize(table_path, df_["file_path"]),
                    "orig": df_["file_path"],
                    "seq": _eff_seq(e, m),
                    "equality_ids": list(df_.get("equality_ids") or []),
                }
                if (
                    df_.get("referenced_data_file") is not None
                    or df_.get("content_offset") is not None
                    or df_.get("content_size_in_bytes") is not None
                ):
                    ent["dv"] = _puffin_dv_ref(
                        table_path, df_, _pf_cache
                    )
                    pos_del.append(ent)
                elif int(df_.get("content") or 0) == 2 or ent[
                    "equality_ids"
                ]:
                    eq_del.append(ent)
                else:
                    pos_del.append(ent)
                continue
            # ZORDER rewrites every live default-spec file —
            # re-clustering is the point (rewrite_data_files zorder)
            if zorder_by or (
                int(df_.get("record_count") or 0) < target_rows_per_file
            ):
                pdict = df_.get("partition") or {}
                pt = tuple(pdict.get(n) for n in part_names)
                sizes[pt] = sizes.get(pt, 0) + 1
    todo = {
        pt
        for pt, n in sizes.items()
        if n >= (1 if zorder_by else 2)
    }
    if not todo:
        return None

    ptuples = sorted(todo, key=str)
    pid_of = {pt: i for i, pt in enumerate(ptuples)}
    single = len(ptuples) == 1

    carried: list[dict] = []
    # delete manifests carry forward UNLESS the rewrite retires them:
    # after compaction every remaining data file may outrank a delete
    # file, at which point carrying it means one dead anti-join on
    # every future read — record (row, max seq, kinds) to decide below
    del_manifests: list[tuple[dict, int, bool]] = []
    hit_entries: list[dict] = []
    hit_seqs: list[int] = []
    hit_sids: list[int] = []
    hit_pids: list[int] = []
    survivors: list[dict] = []
    untouched_seqs: list[int] = []  # live data entries NOT rewritten
    total_rows = 0
    for m, entries in walked:
        if int(m.get("content") or 0) == 1:
            dmax = 0
            has_pos = False
            for e in entries:
                if int(e.get("status") or 0) == _ST_DELETED:
                    continue
                dmax = max(dmax, _eff_seq(e, m))
                df_ = e["data_file"]
                if not (
                    int(df_.get("content") or 0) == 2
                    or df_.get("equality_ids")
                ):
                    has_pos = True
            del_manifests.append((m, dmax, has_pos))
            continue
        if int(m.get("partition_spec_id") or 0) != int(
            meta.get("default-spec-id", 0)
        ):
            # partition evolution: an old-spec file's tuple is in
            # another spec's coordinates — tuple-matching it against
            # the current spec's bins would misroute rows into wrong
            # partitions. Old-spec manifests carry whole (their seqs
            # still gate delete-manifest retirement); a MERGE rewrite
            # migrates their files to the current spec.
            for e in entries:
                if int(e.get("status") or 0) != _ST_DELETED:
                    untouched_seqs.append(_eff_seq(e, m))
            carried.append(m)
            continue
        hits: list[tuple[dict, int]] = []
        misses: list[dict] = []
        for e in entries:
            if int(e.get("status") or 0) == _ST_DELETED:
                continue
            df_ = e["data_file"]
            pdict = df_.get("partition") or {}
            pt = tuple(pdict.get(n) for n in part_names)
            if pt in todo and (
                zorder_by
                or int(df_.get("record_count") or 0)
                < target_rows_per_file
            ):
                hits.append((e, pid_of[pt]))
            else:
                misses.append(e)
                untouched_seqs.append(_eff_seq(e, m))
        if not hits:
            carried.append(m)
        else:
            for e, pid in hits:
                hit_entries.append(e)
                hit_seqs.append(_eff_seq(e, m))
                hit_sids.append(int(m.get("partition_spec_id") or 0))
                hit_pids.append(pid)
                total_rows += int(e["data_file"]["record_count"])
            for e in misses:
                e2 = dict(e)
                e2["sequence_number"] = _eff_seq(e, m)
                survivors.append(e2)

    if lineage:
        _resolve_entry_lineage(
            table_path, meta, hit_entries + survivors
        )

    version = prev_version + 1
    snapshot_id = version
    fmt = int(meta.get("format-version", 1))
    seq = max(
        int(meta.get("last-sequence-number", 0)), prev_version
    ) + 1

    # a delete file gates data files with a LOWER sequence (equality:
    # strictly lower; positional: lower-or-equal). After this commit
    # the lowest data sequence is min(survivor seqs, the new seq) —
    # any delete manifest that can no longer apply to ANYTHING is
    # dropped here instead of anti-joining every future read
    min_data_seq = min([seq] + untouched_seqs)
    for m, dmax, has_pos in del_manifests:
        dead = (
            min_data_seq > dmax if has_pos else min_data_seq >= dmax
        )
        if not dead:
            carried.append(m)

    # read the compacted files (deletes applied) and route rows back
    # to their partition by source FILE — no transform recompute
    # needed, a file belongs to exactly one partition tuple
    read_schema = schema
    if lineage:
        for e in hit_entries:
            if e["data_file"].get("first_row_id") is None:
                raise NotImplementedError(
                    "iceberg optimize: row-lineage compaction over a "
                    "data file whose first_row_id is unassignable "
                    "even by inheritance — "
                    f"{e['data_file']['file_path']!r}"
                )
        read_schema = T.StructType(
            list(schema.fields)
            + [
                T.StructField("_row_id", T.LongType(), True),
                T.StructField(
                    "_last_updated_sequence_number", T.LongType(),
                    True,
                ),
            ]
        )
    cur = read_entries_with_deletes(
        spark,
        meta,
        read_schema,
        [
            {
                "path": _localize(table_path, e["data_file"]["file_path"]),
                "orig": e["data_file"]["file_path"],
                "seq": s,
                "equality_ids": [],
                "partition": dict(
                    e["data_file"].get("partition") or {}
                ),
                "spec_id": sid,
            }
            for e, s, sid in zip(hit_entries, hit_seqs, hit_sids)
        ],
        pos_del,
        eq_del,
        basename_col=None if single else "__bn",
        position_cols=("__rl_fp", "__rl_pos") if lineage else None,
    )
    if lineage:
        rl_lk = local_rows_df(spark, 
            [
                (
                    e["data_file"]["file_path"],
                    int(e["data_file"]["first_row_id"]),
                    int(s),
                )
                for e, s in zip(hit_entries, hit_seqs)
            ],
            "__rl_fp string, __rl_first long, __rl_seq long",
        )
        cur = (
            cur.join(F.broadcast(rl_lk), "__rl_fp", "inner")
            .withColumn(
                "_row_id",
                F.coalesce(
                    F.col("_row_id"),
                    F.col("__rl_first") + F.col("__rl_pos"),
                ),
            )
            .withColumn(
                "_last_updated_sequence_number",
                F.coalesce(
                    F.col("_last_updated_sequence_number"),
                    F.col("__rl_seq"),
                ),
            )
            .drop("__rl_fp", "__rl_pos", "__rl_first", "__rl_seq")
        )
    bn_pid = [
        (e["data_file"]["file_path"].rsplit("/", 1)[-1], pid)
        for e, pid in zip(hit_entries, hit_pids)
    ]
    if len({b for b, _ in bn_pid}) != len(bn_pid):
        raise NotImplementedError(
            "iceberg optimize: compacted files share a basename"
        )
    n_files = max(1, -(-max(total_rows, 1) // target_rows_per_file))
    tmp = os.path.join(table_path, f"_tmp-icecompact-v{version}")
    os.makedirs(os.path.join(table_path, "data"), exist_ok=True)
    new_rel: list[str] = []
    pt_of_rel: dict[str, tuple] = {}
    file_seq = 0
    if zorder_by:
        from optimus_any2any_spark.streaming.delta_table import (
            _with_zorder_value,
        )

        cur = _with_zorder_value(cur, zorder_by, schema)
        sort_cols = [F.col("__zv")]
    else:
        sort_cols = [F.col(key_col)] if key_col is not None else []
    if single:
        out_df = cur
        if sort_cols:
            out_df = out_df.repartitionByRange(n_files, *sort_cols)
        else:
            out_df = out_df.coalesce(n_files)
        if zorder_by:
            out_df = out_df.sortWithinPartitions("__zv").drop("__zv")
        elif key_col is not None:
            # the declared sort order must be TRUE within each file,
            # not an artifact of range-partition concatenation
            out_df = out_df.sortWithinPartitions(key_col)
        out_df.write.mode("overwrite").parquet(tmp)
        for part in sorted(
            _glob.glob(os.path.join(tmp, "part-*.parquet"))
        ):
            rel = f"data/{version:05d}-{file_seq:04d}-compact.parquet"
            file_seq += 1
            os.replace(part, os.path.join(table_path, rel))
            new_rel.append(rel)
            pt_of_rel[rel] = ptuples[0]
    else:
        pid_lk = local_rows_df(spark, 
            bn_pid, "__bn string, __pid int"
        )
        cur = cur.join(F.broadcast(pid_lk), "__bn", "inner").drop(
            "__bn"
        )
        out_df = cur.repartitionByRange(
            n_files, F.col("__pid"), *sort_cols
        )
        if zorder_by:
            out_df = out_df.sortWithinPartitions(
                "__pid", "__zv"
            ).drop("__zv")
        elif key_col is not None:
            out_df = out_df.sortWithinPartitions("__pid", key_col)
        (
            out_df
            .write.partitionBy("__pid")
            .mode("overwrite")
            .parquet(tmp)
        )
        for pdir in sorted(_glob.glob(os.path.join(tmp, "__pid=*"))):
            pid = int(os.path.basename(pdir).split("=", 1)[1])
            for part in sorted(
                _glob.glob(os.path.join(pdir, "part-*.parquet"))
            ):
                rel = (
                    f"data/{version:05d}-{file_seq:04d}-compact.parquet"
                )
                file_seq += 1
                os.replace(part, os.path.join(table_path, rel))
                new_rel.append(rel)
                pt_of_rel[rel] = ptuples[pid]
    shutil.rmtree(tmp)

    if not new_rel:
        per_file = {}
    elif zorder_by:
        # bounds for EVERY z-ordered column — without them the curve
        # cannot prune anything
        per_file = _per_file_multi_stats(
            spark, table_path, new_rel,
            [(n, it_) for n, _f, it_ in stat_fields],
        )
    else:
        per_file = _per_file_key_stats(
            spark, table_path, new_rel, key_col,
            ice_t if key_col is not None else None,
        )

    # declared SORT ORDER (spec §Sort Orders): a key_col compaction
    # writes files truly sorted by the key, so the table declares
    # (or reuses) the matching identity-asc order and the new entries
    # stamp its id — real clients can then plan merge-sorted reads
    sort_oid = None
    if key_col is not None and not zorder_by:
        orders = list(
            meta.get("sort-orders") or [{"order-id": 0, "fields": []}]
        )
        want = [
            {
                "transform": "identity",
                "source-id": fid,
                "direction": "asc",
                "null-order": "nulls-first",
            }
        ]
        ex = next(
            (o for o in orders if o.get("fields") == want), None
        )
        if ex is None:
            sort_oid = max(int(o["order-id"]) for o in orders) + 1
            orders = orders + [
                {"order-id": sort_oid, "fields": want}
            ]
        else:
            sort_oid = int(ex["order-id"])
        meta["sort-orders"] = orders
        meta["default-sort-order-id"] = sort_oid

    new_entries = []
    lin_next = int(meta["next-row-id"]) if lineage else None
    lin_base = lin_next
    for rel in new_rel:
        r = per_file.get(rel.rsplit("/", 1)[-1])
        if r is None or int(r["rows"]) == 0:
            os.remove(os.path.join(table_path, rel))
            continue
        df_entry = {
            "file_path": rel,
            "file_format": "PARQUET",
            "partition": {
                n: v for n, v in zip(part_names, pt_of_rel[rel])
            },
            "record_count": int(r["rows"]),
            "file_size_in_bytes": os.path.getsize(
                os.path.join(table_path, rel)
            ),
        }
        if lineage:
            # spec formality: every row of a rewritten file carries a
            # materialized _row_id, so these fresh ids go unused —
            # but entries must still be assigned (and the lineage
            # reader requires explicit values)
            df_entry["first_row_id"] = lin_next
            lin_next += int(r["rows"])
        if zorder_by:
            nvc, lb, ub = [], [], []
            for n, c_fid, c_it in stat_fields:
                mn, mx, nn = r["cols"][n]
                nvc.append(
                    {"key": c_fid, "value": struct.pack("<q", int(nn))}
                )
                b_lo = encode_bound(c_it, mn)
                b_hi = encode_bound(c_it, mx)
                if b_lo is not None:
                    lb.append({"key": c_fid, "value": b_lo})
                if b_hi is not None:
                    ub.append({"key": c_fid, "value": b_hi})
            df_entry["null_value_counts"] = nvc
            df_entry["lower_bounds"] = lb or None
            df_entry["upper_bounds"] = ub or None
        elif key_col is not None:
            b_lo = encode_bound(ice_t, r["min_key"])
            b_hi = encode_bound(ice_t, r["max_key"])
            df_entry["null_value_counts"] = [
                {"key": fid, "value": struct.pack("<q", int(r["n_null"]))}
            ]
            df_entry["lower_bounds"] = (
                [{"key": fid, "value": b_lo}] if b_lo is not None else None
            )
            df_entry["upper_bounds"] = (
                [{"key": fid, "value": b_hi}] if b_hi is not None else None
            )
            df_entry["sort_order_id"] = sort_oid
        new_entries.append(
            {
                "status": _ST_ADDED,
                "snapshot_id": snapshot_id,
                "data_file": df_entry,
            }
        )
    for e in survivors:
        e = dict(e)
        e["status"] = _ST_EXISTING
        new_entries.append(e)

    manifest_rel = (
        "metadata/"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'{table_path}|mc{version}')}"
        "-m0.avro"
    )
    write_container(
        os.path.join(table_path, manifest_rel),
        manifest_entry_schema(part_fields),
        new_entries,
    )
    for r in carried:
        r.setdefault("sequence_number", None)
    _ice_preserve_manifest_lineage(table_path, meta, carried)
    ml_rows = list(carried) + [
        {
            "manifest_path": manifest_rel,
            "manifest_length": os.path.getsize(
                os.path.join(table_path, manifest_rel)
            ),
            "partition_spec_id": int(meta.get("default-spec-id", 0)),
            "content": 0,
            "added_snapshot_id": snapshot_id,
            "sequence_number": seq,
        }
    ]
    ml_rel = (
        "metadata/"
        f"snap-{snapshot_id}-1-"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'{table_path}|mcl{version}')}"
        ".avro"
    )
    write_container(
        os.path.join(table_path, ml_rel), MANIFEST_FILE_SCHEMA, ml_rows
    )
    meta = dict(meta)
    ts_ms = snapshot_timestamp_ms(meta)
    new_snap = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": ts_ms,
        "manifest-list": ml_rel,
        "summary": (
            {"operation": "replace",
             "zorder-by": json.dumps(list(zorder_by))}
            if zorder_by
            else {"operation": "replace"}
        ),
    }
    _stamp_parent_snapshot(new_snap, meta)
    if fmt >= 2:
        new_snap["sequence-number"] = seq
        meta["last-sequence-number"] = seq
    if lineage:
        new_snap["first-row-id"] = lin_base
        meta["next-row-id"] = lin_next
    meta["snapshots"] = snaps + [new_snap]
    append_snapshot_log(meta, meta, ts_ms, snapshot_id)
    advance_main_ref(meta, snapshot_id)
    meta["current-snapshot-id"] = snapshot_id
    path = os.path.join(md, f"v{version}.metadata.json")
    tmpp = path + ".tmp"
    with open(tmpp, "w") as f:
        f.write(json.dumps(meta, indent=2))
    os.replace(tmpp, path)
    tmph = hint + ".tmp"
    with open(tmph, "w") as f:
        f.write(str(version))
    os.replace(tmph, hint)
    return version


def rewrite_iceberg_manifests(
    spark: SparkSession,
    table_path: str,
    min_manifests: int = 2,
) -> int | None:
    """``rewrite_manifests`` (Iceberg's manifest compaction): merge
    the current snapshot's DATA manifests into ONE manifest per
    partition spec — pure driver metadata work, zero data IO. On a
    long-lived table every commit adds a manifest, and planning cost
    is O(manifests) avro opens; after the rewrite it is O(specs).
    Entries re-list with status EXISTING, their ORIGINAL data
    sequence numbers EXPLICIT (v2 inheritance would otherwise
    re-stamp them under the new snapshot and un-gate older delete
    files), their original snapshot ids kept, and row-lineage
    first_row_id resolved/preserved. Delete manifests carry verbatim.
    The commit is a ``replace`` snapshot with no data change — the
    changelog and the streams emit NOTHING for it. Returns the new
    metadata version, or None when fewer than ``min_manifests`` data
    manifests exist (nothing to gain ⇒ no version burn)."""
    md = _meta_dir(table_path)
    hint = os.path.join(md, "version-hint.text")
    if not os.path.exists(hint):
        raise ValueError(
            f"iceberg rewrite_manifests: no table at {table_path}"
        )
    prev_version = int(open(hint).read().strip())
    meta = load_table_metadata(table_path, version=prev_version)
    _refuse_unpublished_branches(meta)
    snaps = meta.get("snapshots") or []
    cur_id = meta.get("current-snapshot-id")
    if cur_id in (None, -1) or not snaps:
        return None
    cur = next(s for s in snaps if s["snapshot-id"] == cur_id)
    _, manifests = read_container(
        _localize(table_path, cur["manifest-list"])
    )
    data_rows = [
        m for m in manifests if int(m.get("content") or 0) == 0
    ]
    if len(data_rows) < min_manifests:
        return None
    other_rows = [
        m for m in manifests if int(m.get("content") or 0) != 0
    ]
    version = prev_version + 1
    snapshot_id = version
    fmt = int(meta.get("format-version", 1))
    seq = max(
        int(meta.get("last-sequence-number", 0)), prev_version
    ) + 1
    lineage = meta.get("next-row-id") is not None

    def _eff_seq(e: dict, m: dict) -> int:
        s = e.get("sequence_number")
        if s is None:
            s = m.get("sequence_number")
        return int(s) if s is not None else 0

    # group by spec id: a manifest serializes ONE partition spec
    by_spec: dict[int, list[tuple[dict, dict, dict]]] = {}
    schema_of_spec: dict[int, dict] = {}
    for m in data_rows:
        sid = int(m.get("partition_spec_id") or 0)
        esch, entries = read_container(
            _localize(table_path, m["manifest_path"])
        )
        schema_of_spec.setdefault(sid, esch)
        for e in entries:
            if int(e.get("status") or 0) == 2:  # DELETED
                continue
            by_spec.setdefault(sid, []).append((e, m, esch))
    new_rows: list[dict] = []
    for sid, triples in sorted(by_spec.items()):
        merged = []
        for e, m, _esch in triples:
            e2 = dict(e)
            e2["status"] = 0  # EXISTING: explicit seq, kept snapshot
            e2["sequence_number"] = _eff_seq(e, m)
            merged.append(e2)
        if lineage:
            _resolve_entry_lineage(table_path, meta, merged)
        esch = json.loads(json.dumps(schema_of_spec[sid]))
        names = {f["name"] for f in esch["fields"]}
        if "sequence_number" not in names:
            esch["fields"].append(
                {"name": "sequence_number",
                 "type": ["null", "long"],
                 "default": None, "field-id": 3}
            )
        if lineage:
            # the resolved ids must SERIALIZE — a null under the new
            # manifest would mis-inherit from this snapshot's base
            dft = next(
                f for f in esch["fields"] if f["name"] == "data_file"
            )["type"]
            df_names = {f["name"] for f in dft["fields"]}
            if "first_row_id" not in df_names:
                dft["fields"].append(
                    {"name": "first_row_id",
                     "type": ["null", "long"],
                     "default": None, "field-id": 142}
                )
        rel = (
            "metadata/"
            f"{uuid.uuid5(uuid.NAMESPACE_URL, f'{table_path}|rm{version}s{sid}')}"
            f"-m0.avro"
        )
        write_container(os.path.join(table_path, rel), esch, merged)
        new_rows.append(
            {
                "manifest_path": rel,
                "manifest_length": os.path.getsize(
                    os.path.join(table_path, rel)
                ),
                "partition_spec_id": sid,
                "content": 0,
                "added_snapshot_id": snapshot_id,
                # entries carry their seqs explicitly; nothing inherits
                "sequence_number": None,
                "added_rows_count": 0,
                "existing_rows_count": sum(
                    int(e["data_file"].get("record_count") or 0)
                    for e in merged
                ),
                "first_row_id": None,
            }
        )
    for r in other_rows:
        r.setdefault("sequence_number", None)
    ml_rel = (
        "metadata/"
        f"snap-{snapshot_id}-1-"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'{table_path}|rml{version}')}"
        ".avro"
    )
    write_container(
        os.path.join(table_path, ml_rel),
        MANIFEST_FILE_SCHEMA,
        new_rows + other_rows,
    )
    meta = dict(meta)
    ts_ms = snapshot_timestamp_ms(meta)
    new_snap = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": ts_ms,
        "manifest-list": ml_rel,
        "parent-snapshot-id": cur_id,
        "summary": {
            "operation": "replace",
            "rewritten-manifests": str(len(data_rows)),
            "added-manifests": str(len(new_rows)),
        },
    }
    if fmt >= 2:
        new_snap["sequence-number"] = seq
        meta["last-sequence-number"] = seq
    if lineage:
        # no rows added: the id space does not move
        new_snap["first-row-id"] = int(meta["next-row-id"])
    meta["snapshots"] = snaps + [new_snap]
    append_snapshot_log(meta, meta, ts_ms, snapshot_id)
    advance_main_ref(meta, snapshot_id)
    meta["current-snapshot-id"] = snapshot_id
    path = os.path.join(md, f"v{version}.metadata.json")
    tmpp = path + ".tmp"
    with open(tmpp, "w") as f:
        f.write(json.dumps(meta, indent=2))
    os.replace(tmpp, path)
    tmph = hint + ".tmp"
    with open(tmph, "w") as f:
        f.write(str(version))
    os.replace(tmph, hint)
    return version


def expire_iceberg_snapshots(
    spark: SparkSession,
    table_path: str,
    keep_last: int = 1,
    older_than=None,
    now_ms: int | None = None,
) -> list[str]:
    """``expire_snapshots``: drop all but the newest ``keep_last``
    snapshots from the table metadata and DELETE every file (manifest
    list, manifest, data / delete file) referenced ONLY by the expired
    snapshots — the maintenance op that bounds metadata growth and
    reclaims compacted/rewritten bytes, the Iceberg twin of
    ``vacuum_delta``. Time travel to an expired snapshot then raises
    (its metadata row is gone), exactly like the spec's expiration;
    expired snapshots' ``snapshot-log`` entries are removed too, so
    timestamp travel never resolves to missing data. Returns the
    table-relative paths removed. Driver metadata work only — no
    Spark job.

    ``older_than`` (epoch-ms / ISO string / datetime) switches to
    AGE-based expiration — Iceberg's ``expireOlderThan`` composed with
    ``retainLast``: only snapshots whose ``timestamp-ms`` is strictly
    before the cutoff expire, and the newest ``keep_last`` are always
    retained regardless of age.

    Refs carrying the spec's ``max-ref-age-ms`` (``set_iceberg_ref``)
    age out FIRST: a non-main ref whose pointed-at snapshot is older
    than its limit (vs ``now_ms``, default wall clock) is dropped in
    the same expiration commit, releasing its snapshots to the
    ordinary retention rules — Iceberg's bounded-life tags."""
    if keep_last < 1:
        raise ValueError("iceberg expire: keep_last must be >= 1")
    md = _meta_dir(table_path)
    hint = os.path.join(md, "version-hint.text")
    if not os.path.exists(hint):
        raise ValueError(f"iceberg expire: no table at {table_path}")
    prev_version = int(open(hint).read().strip())
    meta = load_table_metadata(table_path, version=prev_version)
    snaps = meta.get("snapshots") or []
    # snapshots referenced by a tag or branch are PROTECTED (spec
    # "Snapshot References": expiration respects refs until dropped).
    # For a BRANCH the protection extends to its whole unpublished
    # ancestor closure (commits staged off main): expiring a mid-chain
    # branch snapshot would break the publish fast-forward walk.
    # Main-chain ancestors stay expirable under normal retention.
    from optimus_any2any_spark.sources.iceberg import (
        iceberg_main_chain,
    )

    by_sid = {s["snapshot-id"]: s for s in snaps}
    _chain_ids = [
        s["snapshot-id"] for s in iceberg_main_chain(meta)
    ]
    main_ids = set(_chain_ids)
    # max-ref-age-ms: aged-out non-main refs drop BEFORE protection,
    # so their snapshots fall through to the ordinary retention rules
    live_refs = dict(meta.get("refs") or {})
    aged_out: list[str] = []
    if any(
        r.get("max-ref-age-ms") is not None
        for n, r in live_refs.items()
        if n != "main"
    ):
        if now_ms is None:
            import time as _time

            now_ms = int(_time.time() * 1000)
        for name, r in list(live_refs.items()):
            mra = r.get("max-ref-age-ms")
            if name == "main" or mra is None:
                continue
            head = by_sid.get(int(r["snapshot-id"]))
            ts = int((head or {}).get("timestamp-ms") or 0)
            if int(now_ms) - ts > int(mra):
                aged_out.append(name)
                del live_refs[name]
    protected: set[int] = set()
    for r in live_refs.values():
        sid = int(r["snapshot-id"])
        protected.add(sid)
        while (
            sid in by_sid
            and sid not in main_ids
        ):
            protected.add(sid)
            sid = by_sid[sid].get("parent-snapshot-id")
            if sid is None:
                break
            sid = int(sid)
    # retention counts on MAIN history: the newest keep_last
    # main-chain snapshots stay; branch-staged snapshots don't consume
    # retention slots (they're ref-protected above) and orphans from
    # dropped branches are plain expiry candidates
    retain = set(_chain_ids[-keep_last:])
    candidates = [
        s
        for s in snaps
        if s["snapshot-id"] not in retain
        and s["snapshot-id"] not in protected
    ]
    if older_than is not None:
        from optimus_any2any_spark.sources.delta import _to_epoch_millis

        cutoff = _to_epoch_millis(older_than)
        expired = [
            s
            for s in candidates
            if int(s.get("timestamp-ms") or 0) < cutoff
        ]
    else:
        expired = candidates
    if not expired and not aged_out:
        return []
    if not expired:
        # only refs aged out this run: persist the ref drop as its
        # own metadata version (no files to delete)
        meta = dict(meta)
        meta["refs"] = live_refs
        version = prev_version + 1
        path = os.path.join(md, f"v{version}.metadata.json")
        tmpp = path + ".tmp"
        with open(tmpp, "w") as f:
            f.write(json.dumps(meta, indent=2))
        os.replace(tmpp, path)
        tmph = hint + ".tmp"
        with open(tmph, "w") as f:
            f.write(str(version))
        os.replace(tmph, hint)
        return []
    expired_ids = {s["snapshot-id"] for s in expired}
    keep = [s for s in snaps if s["snapshot-id"] not in expired_ids]
    cur_id = meta.get("current-snapshot-id")
    if cur_id not in {s["snapshot-id"] for s in keep}:
        raise ValueError(
            "iceberg expire: keep_last would expire the CURRENT "
            "snapshot"
        )

    def _refs(snapshot: dict) -> set[str]:
        out: set[str] = set()
        ml = snapshot.get("manifest-list")
        if ml is None:
            for p in snapshot.get("manifests", []):
                out.add(p)
            manifests = [
                {"manifest_path": p} for p in snapshot.get("manifests", [])
            ]
        else:
            out.add(ml)
            _, manifests = read_container(_localize(table_path, ml))
        for m in manifests:
            mp = m["manifest_path"]
            out.add(mp)
            _, entries = read_container(_localize(table_path, mp))
            for e in entries:
                if int(e.get("status") or 0) == _ST_DELETED:
                    continue
                out.add(e["data_file"]["file_path"])
        return out

    # compute EVERY reference set before deleting anything — expired
    # snapshots may share manifests, and reading one after its file
    # was removed for a sibling would crash mid-expire
    kept_refs: set[str] = set()
    for s in keep:
        kept_refs |= _refs(s)
    expired_refs: set[str] = set()
    for s in expired:
        expired_refs |= _refs(s)
    gone: list[str] = []
    for ref in sorted(expired_refs - kept_refs):
        full = _localize(table_path, ref)
        if os.path.exists(full):
            os.remove(full)
            gone.append(ref)
    meta = dict(meta)
    meta["snapshots"] = keep
    if aged_out:
        meta["refs"] = live_refs
    kept_ids = {s["snapshot-id"] for s in keep}
    if meta.get("snapshot-log"):
        meta["snapshot-log"] = [
            e
            for e in meta["snapshot-log"]
            if e.get("snapshot-id") in kept_ids
        ]
    version = prev_version + 1
    path = os.path.join(md, f"v{version}.metadata.json")
    tmpp = path + ".tmp"
    with open(tmpp, "w") as f:
        f.write(json.dumps(meta, indent=2))
    os.replace(tmpp, path)
    tmph = hint + ".tmp"
    with open(tmph, "w") as f:
        f.write(str(version))
    os.replace(tmph, hint)
    return gone


def remove_iceberg_orphan_files(
    spark: SparkSession,
    table_path: str,
    older_than=None,
    dry_run: bool = False,
) -> list[str]:
    """``remove_orphan_files`` (VERDICT r12 item 6): delete files
    under the TABLE LOCATION that no table metadata references —
    crashed writes, abandoned ``_tmp-ice-*`` staging, files whose
    commit never landed. ``expire_iceberg_snapshots`` removes what
    expired snapshots referenced; this sweeps what NOTHING ever
    referenced. Returns the removed (or, with ``dry_run=True``, the
    would-be-removed) table-relative paths. Driver metadata work
    only — no Spark job.

    Safety discipline (the add_files twin rules):
    - The reference set unions EVERY on-disk metadata version's
      snapshot walk (manifest lists → manifests → all entries,
      deleted-status included) — anything any retained metadata can
      reach survives, branches and tags included.
    - Metadata control files (``*.metadata.json``,
      ``version-hint.text``) are never candidates.
    - Files OUTSIDE the table location are never touched — a
      hive-registered (add_files) absolute-path file lives in the
      source lake and is structurally out of scope.
    - ``older_than`` (epoch-ms / ISO string / datetime; default
      3 days ago) is the grace period: younger files are presumed
      in-flight writes and kept — Spark's procedure ships the same
      default for the same reason.
    """
    import time as _time

    md = _meta_dir(table_path)
    hint = os.path.join(md, "version-hint.text")
    if not os.path.exists(hint):
        raise ValueError(
            f"iceberg remove_orphan_files: no table at {table_path}"
        )
    if older_than is None:
        cutoff_ms = (_time.time() - 3 * 86400) * 1000.0
    else:
        from optimus_any2any_spark.sources.delta import _to_epoch_millis

        cutoff_ms = float(_to_epoch_millis(older_than))

    def _norm(ref: str) -> str:
        return os.path.realpath(_localize_path(table_path, ref))

    referenced: set[str] = set()
    for mpath in sorted(_glob.glob(os.path.join(md, "v*.metadata.json"))):
        referenced.add(os.path.realpath(mpath))
        try:
            meta = json.loads(open(mpath).read())
        except (OSError, ValueError):
            continue  # unreadable old metadata: protect only itself
        for snap in meta.get("snapshots") or []:
            ml = snap.get("manifest-list")
            if ml is None:
                manifests = [
                    {"manifest_path": p}
                    for p in snap.get("manifests", [])
                ]
            else:
                referenced.add(_norm(ml))
                try:
                    _, manifests = read_container(
                        _localize(table_path, ml)
                    )
                except OSError:
                    continue  # expired manifest list: nothing to walk
            for m in manifests:
                mp = m["manifest_path"]
                referenced.add(_norm(mp))
                try:
                    _, entries = read_container(
                        _localize(table_path, mp)
                    )
                except OSError:
                    continue
                for e in entries:
                    # ALL statuses: a deleted-status entry's file may
                    # be live under an older snapshot — never a
                    # candidate for the orphan sweep
                    referenced.add(_norm(e["data_file"]["file_path"]))
    referenced.add(os.path.realpath(hint))

    root = os.path.realpath(table_path)
    orphans: list[str] = []
    for dirpath, _dirs, names in sorted(os.walk(root)):
        for n in sorted(names):
            full = os.path.realpath(os.path.join(dirpath, n))
            if full in referenced:
                continue
            if n == "version-hint.text" or n.endswith(".metadata.json"):
                continue  # control files are never orphans
            if os.path.getmtime(full) * 1000.0 >= cutoff_ms:
                continue  # inside the grace period: presumed in-flight
            orphans.append(os.path.relpath(full, root))
    if not dry_run:
        for rel in orphans:
            os.remove(os.path.join(root, rel))
        # abandoned staging dirs left empty by the sweep go too
        for dirpath, dirs, names in sorted(
            os.walk(root, topdown=False)
        ):
            if (
                dirpath != root
                and not dirs
                and not names
                and os.path.basename(dirpath) not in ("data", "metadata")
            ):
                os.rmdir(dirpath)
    return orphans


def _localize_path(table_path: str, ref: str) -> str:
    """_localize, then strip any file:// scheme — orphan-sweep
    comparisons are realpath-based."""
    p = _localize(table_path, ref)
    return p[7:] if p.startswith("file://") else p


def set_iceberg_partition_spec(
    spark: SparkSession,
    table_path: str,
    partition_by: list[str],
) -> int:
    """ALTER TABLE ... partition evolution (spec "Partition
    Evolution", VERDICT r9 item 6): append a NEW partition spec and
    make it the default — a data-free metadata version, no snapshot.

    Existing data files keep their ORIGINAL spec: reads are unaffected
    (Iceberg data files physically carry the partition source
    columns, and this engine's reader prunes by field-id-keyed key
    bounds, not directory layout), and the next merge writes new and
    rewritten files under the NEW spec while re-listing untouched
    files under their own spec id — the manifest-list rows keep one
    ``partition_spec_id`` per manifest, exactly how the format
    represents a mixed-spec table.

    ``partition_by`` takes the same DDL items as table creation
    (``k``, ``days(ts)``, ``bucket(16, k)``, ``truncate(3, v)``); an
    empty list evolves to the UNPARTITIONED spec. Partition field ids
    stay unique ACROSS specs (fresh ids past every existing one, from
    1000)."""
    from optimus_any2any_spark.sources.iceberg_transforms import (
        parse_spec_item,
        partition_field_name,
    )

    md = _meta_dir(table_path)
    hint = os.path.join(md, "version-hint.text")
    if not os.path.exists(hint):
        raise ValueError(
            f"iceberg partition spec: no table at {table_path}"
        )
    prev_version = int(open(hint).read().strip())
    meta = load_table_metadata(table_path, version=prev_version)
    cur = (
        meta.get("schemas", [meta.get("schema")])[0]
        if "schemas" not in meta
        else next(
            s
            for s in meta["schemas"]
            if s.get("schema-id") == meta.get("current-schema-id", 0)
        )
    )
    name_to_id = {f["name"]: int(f["id"]) for f in cur["fields"]}
    parsed = [parse_spec_item(s) for s in partition_by]
    for _, src in parsed:
        if src not in name_to_id:
            raise ValueError(
                f"iceberg partition spec: no column {src!r} in schema"
            )
    specs = list(meta.get("partition-specs") or [])
    if not specs:  # legacy single-spec metadata: lift it to the list
        specs = [{"spec-id": 0, "fields": meta.get("partition-spec")
                  or []}]
    next_sid = max(int(s["spec-id"]) for s in specs) + 1
    next_fid = max(
        [999]
        + [
            int(f.get("field-id") or 999)
            for s in specs
            for f in s.get("fields") or []
        ]
    ) + 1
    new_spec = {
        "spec-id": next_sid,
        "fields": [
            {
                "name": partition_field_name(tr, src),
                "transform": tr,
                "source-id": name_to_id[src],
                "field-id": next_fid + i,
            }
            for i, (tr, src) in enumerate(parsed)
        ],
    }
    meta = dict(meta)
    meta["partition-specs"] = specs + [new_spec]
    meta["default-spec-id"] = next_sid
    meta.pop("partition-spec", None)  # the legacy field can only
    #                                   describe ONE spec — drop it
    version = prev_version + 1
    path = os.path.join(md, f"v{version}.metadata.json")
    tmpp = path + ".tmp"
    with open(tmpp, "w") as f:
        f.write(json.dumps(meta, indent=2))
    os.replace(tmpp, path)
    tmph = hint + ".tmp"
    with open(tmph, "w") as f:
        f.write(str(version))
    os.replace(tmph, hint)
    return version


def set_iceberg_ref(
    spark: SparkSession,
    table_path: str,
    name: str,
    snapshot_id: int | None = None,
    ref_type: str = "tag",
    max_ref_age_ms: int | None = None,
) -> int:
    """CREATE TAG / CREATE BRANCH (spec "Snapshot References"): record
    ``refs[name] = {snapshot-id, type}`` in the table metadata as a
    data-free metadata version. ``snapshot_id`` defaults to the
    CURRENT snapshot. Ref'd snapshots are protected from
    ``expire_iceberg_snapshots`` until the ref is dropped — the
    retention contract that makes tags a durable audit surface.
    Writers keep ``refs.main`` in step with ``current-snapshot-id``
    (``advance_main_ref``).

    ``max_ref_age_ms`` stores the spec's ``max-ref-age-ms``: during
    snapshot expiration, a non-main ref older than this (measured
    from the timestamp of the snapshot it points to) is DROPPED and
    its snapshots become ordinary expiry candidates — bounded-life
    tags (`RETAIN n DAYS`) without a manual drop step."""
    if ref_type not in ("tag", "branch"):
        raise ValueError(
            f"iceberg ref: type must be tag or branch, not {ref_type!r}"
        )
    md = _meta_dir(table_path)
    hint = os.path.join(md, "version-hint.text")
    if not os.path.exists(hint):
        raise ValueError(f"iceberg ref: no table at {table_path}")
    prev_version = int(open(hint).read().strip())
    meta = load_table_metadata(table_path, version=prev_version)
    snaps = {s["snapshot-id"] for s in meta.get("snapshots") or []}
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
        if snapshot_id in (None, -1):
            raise ValueError("iceberg ref: table has no snapshots")
    if snapshot_id not in snaps:
        raise ValueError(
            f"iceberg ref: snapshot {snapshot_id} is not in the table "
            "metadata (expired or never existed)"
        )
    meta = dict(meta)
    refs = dict(meta.get("refs") or {})
    ref: dict = {"snapshot-id": int(snapshot_id), "type": ref_type}
    if max_ref_age_ms is not None:
        if int(max_ref_age_ms) <= 0:
            raise ValueError(
                "iceberg ref: max_ref_age_ms must be positive"
            )
        ref["max-ref-age-ms"] = int(max_ref_age_ms)
    refs[name] = ref
    meta["refs"] = refs
    version = prev_version + 1
    path = os.path.join(md, f"v{version}.metadata.json")
    tmpp = path + ".tmp"
    with open(tmpp, "w") as f:
        f.write(json.dumps(meta, indent=2))
    os.replace(tmpp, path)
    tmph = hint + ".tmp"
    with open(tmph, "w") as f:
        f.write(str(version))
    os.replace(tmph, hint)
    return version


def publish_iceberg_branch(
    spark: SparkSession,
    table_path: str,
    branch: str,
    drop_branch: bool = False,
) -> int:
    """The PUBLISH half of WAP (Iceberg ``fast_forward``): advance
    ``current-snapshot-id`` / ``refs.main`` to the branch head as a
    data-free metadata version — the audited snapshots become main
    history atomically. Fast-forward only: the current main head must
    be an ancestor of the branch head (walked via
    ``parent-snapshot-id``); anything else is a divergent history
    this writer refuses rather than merges. ``drop_branch=True``
    also removes the branch ref (the classic wap-branch cleanup).
    Publishing a branch already at main is a no-op (no version
    burn)."""
    md = _meta_dir(table_path)
    hint = os.path.join(md, "version-hint.text")
    if not os.path.exists(hint):
        raise ValueError(f"iceberg publish: no table at {table_path}")
    prev_version = int(open(hint).read().strip())
    meta = load_table_metadata(table_path, version=prev_version)
    refs = dict(meta.get("refs") or {})
    r = refs.get(branch)
    if r is None or (r.get("type") or "branch") != "branch":
        raise ValueError(
            f"iceberg publish: no branch {branch!r} "
            f"(known refs: {sorted(refs) or 'none'})"
        )
    # single-flight: publishing THIS branch while another holds
    # unpublished commits would bake the other branch's un-audited
    # snapshots into the positional stream history
    _refuse_unpublished_branches(meta, allow=branch)
    head = int(r["snapshot-id"])
    cur = meta.get("current-snapshot-id")
    if cur == -1:
        cur = None
    if head == cur and not drop_branch:
        return prev_version
    by_id = {
        s["snapshot-id"]: s for s in meta.get("snapshots") or []
    }
    if head != cur:
        sid, seen = head, set()
        while (
            sid is not None and sid != cur and sid not in seen
        ):
            seen.add(sid)
            sid = by_id.get(sid, {}).get("parent-snapshot-id")
        if sid != cur:
            raise ValueError(
                "iceberg publish: not a fast-forward — main is not "
                f"an ancestor of branch {branch!r} head {head}"
            )
    meta = dict(meta)
    if head != cur:
        meta["current-snapshot-id"] = head
        ts_ms = snapshot_timestamp_ms(meta)
        meta["last-updated-ms"] = ts_ms
        append_snapshot_log(
            meta, {"snapshot-log": meta.get("snapshot-log")},
            ts_ms, head,
        )
        advance_main_ref(meta, head)
        refs = dict(meta.get("refs") or refs)
    if drop_branch:
        refs.pop(branch, None)
    meta["refs"] = refs
    version = prev_version + 1
    path = os.path.join(md, f"v{version}.metadata.json")
    tmpp = path + ".tmp"
    with open(tmpp, "w") as f:
        f.write(json.dumps(meta, indent=2))
    os.replace(tmpp, path)
    tmph = hint + ".tmp"
    with open(tmph, "w") as f:
        f.write(str(version))
    os.replace(tmph, hint)
    return version


def drop_iceberg_ref(
    spark: SparkSession, table_path: str, name: str
) -> int:
    """DROP TAG / DROP BRANCH: remove ``refs[name]``; the snapshot it
    protected becomes expirable again. Raises on an unknown ref."""
    md = _meta_dir(table_path)
    hint = os.path.join(md, "version-hint.text")
    if not os.path.exists(hint):
        raise ValueError(f"iceberg ref: no table at {table_path}")
    prev_version = int(open(hint).read().strip())
    meta = load_table_metadata(table_path, version=prev_version)
    refs = dict(meta.get("refs") or {})
    if name not in refs:
        raise ValueError(f"iceberg ref: unknown ref {name!r}")
    del refs[name]
    meta = dict(meta)
    meta["refs"] = refs
    version = prev_version + 1
    path = os.path.join(md, f"v{version}.metadata.json")
    tmpp = path + ".tmp"
    with open(tmpp, "w") as f:
        f.write(json.dumps(meta, indent=2))
    os.replace(tmpp, path)
    tmph = hint + ".tmp"
    with open(tmph, "w") as f:
        f.write(str(version))
    os.replace(tmph, hint)
    return version


def rollback_iceberg(
    spark: SparkSession, table_path: str, snapshot_id: int
) -> int:
    """Roll the table back to ``snapshot_id`` as a NEW snapshot — the
    Iceberg twin of ``restore_delta`` (spec ``rollback_to_snapshot``
    surfaced as a commit, so the rollback itself is in the history and
    the rolled-over snapshots stay time-travelable until expiration).

    The new snapshot re-references the target's manifest list
    VERBATIM: every data/delete file keeps its ORIGINAL data-sequence
    number via the manifest-list rows, so merge-on-read ordering is
    untouched — only the current-snapshot pointer moves, through a
    history-preserving commit with ``parent-snapshot-id`` set to the
    snapshot being rolled back from. The commit's own sequence number
    still advances (v2 requires commit sequence monotonicity).

    Refuses when the target snapshot is no longer in the metadata or
    its manifest list was deleted (``expire_iceberg_snapshots`` ran) —
    the twin of ``restore_delta``'s vacuumed-file refusal: rolling
    back to silently-missing data would corrupt the table."""
    md = _meta_dir(table_path)
    hint = os.path.join(md, "version-hint.text")
    if not os.path.exists(hint):
        raise ValueError(f"iceberg rollback: no table at {table_path}")
    prev_version = int(open(hint).read().strip())
    meta = load_table_metadata(table_path, version=prev_version)
    snaps = meta.get("snapshots") or []
    target = next(
        (s for s in snaps if s["snapshot-id"] == snapshot_id), None
    )
    if target is None:
        raise ValueError(
            f"iceberg rollback: snapshot {snapshot_id} is not in the "
            "table metadata (expired or never existed)"
        )
    cur_id = meta.get("current-snapshot-id")
    if snapshot_id == cur_id:
        return prev_version  # already current: no-op
    ml = target.get("manifest-list")
    if ml is not None and not os.path.exists(
        _localize(table_path, ml)
    ):
        raise ValueError(
            f"iceberg rollback: snapshot {snapshot_id}'s manifest "
            "list is gone (expired) — cannot roll back to missing data"
        )
    version = prev_version + 1
    new_snap_id = version
    seq = int(meta.get("last-sequence-number") or 0) + 1
    ts_ms = snapshot_timestamp_ms(meta)
    snap = {
        "snapshot-id": new_snap_id,
        "timestamp-ms": ts_ms,
        "sequence-number": seq,
        "summary": {
            "operation": "rollback",
            "rolled-back-to": str(snapshot_id),
        },
    }
    # omit the key entirely for a None/-1 head: an explicit null
    # parent would demote a heuristic-governed table to list-order
    # history (_chain_authoritative)
    _stamp_parent_snapshot(snap, meta)
    if ml is not None:
        snap["manifest-list"] = ml
    else:  # v1 inline-manifests form
        snap["manifests"] = list(target.get("manifests") or [])
    meta = dict(meta)
    if meta.get("format-version", 1) >= 2:
        meta["last-sequence-number"] = seq
    meta["snapshots"] = snaps + [snap]
    append_snapshot_log(meta, meta, ts_ms, new_snap_id)
    advance_main_ref(meta, new_snap_id)
    meta["current-snapshot-id"] = new_snap_id
    path = os.path.join(md, f"v{version}.metadata.json")
    tmpp = path + ".tmp"
    with open(tmpp, "w") as f:
        f.write(json.dumps(meta, indent=2))
    os.replace(tmpp, path)
    tmph = hint + ".tmp"
    with open(tmph, "w") as f:
        f.write(str(version))
    os.replace(tmph, hint)
    return version


def upsert_to_iceberg_table(
    stream: DataFrame,
    path: str,
    key_col: str,
    ts_col: str,
    checkpoint: str,
    app_id: str = DEFAULT_APP_ID,
    target_rows_per_file: int = 1_000_000,
):
    """Streaming wrapper: Iceberg-snapshot MERGE per micro-batch, with
    summary-recorded batch ids making redelivery exactly-once."""

    def merge(batch: DataFrame, batch_id: int):
        merge_iceberg_batch(
            batch.sparkSession,
            batch,
            path,
            key_col,
            ts_col,
            app_id=app_id,
            batch_id=batch_id,
            target_rows_per_file=target_rows_per_file,
        )

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
