"""Apache Iceberg table READER — the open spec, no iceberg-spark jar.

An Iceberg table (iceberg.apache.org/spec) is parquet data files plus
a ``metadata/`` directory: ``v<N>.metadata.json`` (schemas, partition
specs, snapshot list, current snapshot id; ``version-hint.text`` names
the latest N in the HadoopCatalog layout), a *manifest list* Avro file
per snapshot, and *manifest* Avro files listing data files with per-
file stats. Reconstructing a snapshot is: metadata JSON → manifest
list → manifests → data-file entries with ``status != DELETED``. The
Avro layer is :mod:`optimus_any2any_spark.formats.avrobin` (stdlib
codec, JVM-cross-checked); data files are read by Spark as parquet.

Scope (spec-honest): format versions 1 and 2, INCLUDING v2 row-level
deletes on the snapshot-read path — positional delete files apply as
an anti-join on ``(file, row position)`` via Spark's
``_metadata.file_path``/``row_index`` hidden columns, equality delete
files as null-safe anti-joins over their ``equality_ids`` columns,
both gated on the spec's data-sequence-number ordering (a row
re-inserted after a delete stays alive). The APPEND-tail surfaces
(``read_iceberg_appends``, the ``iceberg_tail`` stream) still reject
delete manifests — an append stream cannot express removals. A
format-version 3 table READS when it uses only v2-compatible
features, and Puffin DELETION VECTORS (the v3 merge-on-read form)
decode through the same seq-gated anti-join as delete-parquet rows
(:mod:`..formats.puffin`); the remaining v3 constructs (row lineage,
column defaults, encryption, new types, non-DV Puffin blob types)
guard-raise by name — never mis-read (docs/ICEBERG_V3.md). Unlike Delta, Iceberg
data files physically contain their partition columns, so no
literal-column reattachment is needed.

Scale shape: metadata decode is driver-side over KB–MB Avro manifests
(every Iceberg client starts there; the manifest list exists precisely
so a reader opens O(manifests touched), not O(history)); the data read
is one ``spark.read.parquet`` over the surviving file set.

The fixture writer (``write_iceberg_commit``) emits append-only
snapshots in the v1 layout so the reader is exercised against real
bytes end-to-end; it is a test/fixture surface, not the engine's write
path (MERGE targets the Delta log — streaming/delta_table.py).
"""

from __future__ import annotations

from optimus_any2any_spark.localrel import local_rows_df

import glob as _glob
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from optimus_any2any_spark.formats.puffin import (
    DV_V1,
    read_puffin_footer,
)
from optimus_any2any_spark.formats.avrobin import (
    read_container,
    write_container,
)

_STATUS_DELETED = 2


def _meta_dir(table_path: str) -> str:
    return os.path.join(table_path, "metadata")


def _localize(table_path: str, uri: str) -> str:
    """Manifest/data paths in real tables are absolute URIs; strip the
    scheme and, for relocated tables, re-anchor at the local root."""
    p = uri
    if "://" in p:
        p = p.split("://", 1)[1]
        # file://host/path → /path ; s3://bucket/key → /bucket/key-ish:
        # re-anchoring below handles both
        if not p.startswith("/"):
            p = "/" + p
    if not os.path.isabs(p):
        return os.path.join(table_path, p)  # table-relative (fixtures)
    if os.path.exists(p):
        return p
    # re-anchor: find the table-relative suffix (…/data/x, …/metadata/x)
    for marker in ("/data/", "/metadata/"):
        if marker in p:
            cand = os.path.join(
                table_path, marker.strip("/"), p.split(marker, 1)[1]
            )
            if os.path.exists(cand):
                return cand
    return p


# The clock seam: every snapshot this engine commits stamps a real
# ``timestamp-ms`` from here (and appends a ``snapshot-log`` entry),
# so age-based expiration and TIMESTAMP AS OF travel work on
# self-written tables. Fixtures inject a fixed or stepping clock for
# deterministic metadata — the same injection pattern as the Delta
# log/data-store seams (streaming/delta_table.py set_log_store).
def _default_clock() -> int:
    import time

    return int(time.time() * 1000)


_clock = _default_clock


def set_clock(clock) -> None:
    """Inject the commit-timestamp source: a zero-arg callable
    returning epoch milliseconds. Pass ``None`` to restore wall
    time."""
    global _clock
    _clock = clock or _default_clock


def snapshot_timestamp_ms(meta: dict | None) -> int:
    """The next snapshot's ``timestamp-ms``: the injected clock,
    floored at the newest existing snapshot's stamp so the snapshot
    log stays chronological even under a fixed test clock or a
    wall-clock step backwards."""
    ts = int(_clock())
    prev = 0
    for s in (meta or {}).get("snapshots") or []:
        prev = max(prev, int(s.get("timestamp-ms") or 0))
    return max(ts, prev)


def append_snapshot_log(
    meta: dict, prev: dict | None, ts_ms: int, snapshot_id: int
) -> None:
    """Append this commit's ``snapshot-log`` entry (spec: the
    chronological ``{timestamp-ms, snapshot-id}`` list timestamp
    travel resolves against) onto ``meta``, carrying ``prev``'s log
    forward."""
    meta["snapshot-log"] = list((prev or {}).get("snapshot-log") or []) + [
        {"timestamp-ms": ts_ms, "snapshot-id": snapshot_id}
    ]


def advance_main_ref(meta: dict, snapshot_id: int) -> None:
    """Keep the ``main`` branch ref in step with
    ``current-snapshot-id`` when the table carries a refs map —
    Iceberg writes ``refs.main`` on every commit, and a stale main
    would make branch reads diverge from the current snapshot."""
    refs = meta.get("refs")
    if refs and "main" in refs:
        refs = dict(refs)
        refs["main"] = dict(refs["main"])
        refs["main"]["snapshot-id"] = snapshot_id
        meta["refs"] = refs


def resolve_iceberg_ref(meta: dict, name: str) -> int:
    """Snapshot ref (spec "Snapshot References": the metadata ``refs``
    map of named tags and branches) → snapshot-id. Raises on an
    unknown ref, like Iceberg's VERSION AS OF a missing branch/tag."""
    refs = meta.get("refs") or {}
    r = refs.get(name)
    if r is None:
        raise ValueError(
            f"iceberg: unknown ref {name!r} "
            f"(known: {sorted(refs) or 'none'})"
        )
    return int(r["snapshot-id"])


def resolve_iceberg_timestamp(meta: dict, timestamp) -> int:
    """TIMESTAMP AS OF → snapshot-id: the LATEST snapshot-log entry
    whose ``timestamp-ms <= timestamp`` — Iceberg's
    ``SnapshotUtil.snapshotIdAsOfTime`` rule, which clamps to the
    current snapshot past the end of history but raises before the
    first ("Cannot find a snapshot older than ..."). Accepts epoch
    millis, an ISO string, or a datetime. Externally-written metadata
    without a ``snapshot-log`` resolves against the snapshots' own
    ``timestamp-ms`` stamps in list order."""
    from optimus_any2any_spark.sources.delta import _to_epoch_millis

    millis = _to_epoch_millis(timestamp)
    log = meta.get("snapshot-log") or [
        {
            "timestamp-ms": int(s.get("timestamp-ms") or 0),
            "snapshot-id": s["snapshot-id"],
        }
        for s in meta.get("snapshots") or []
    ]
    if not log:
        raise ValueError("iceberg: table has no snapshots to travel to")
    best = None
    for e in log:
        if int(e["timestamp-ms"]) <= millis:
            best = e["snapshot-id"]
    if best is None:
        raise ValueError(
            f"iceberg: cannot find a snapshot older than {timestamp!r} "
            f"(first snapshot at epoch-ms {log[0]['timestamp-ms']})"
        )
    return int(best)


def load_table_metadata(table_path: str, version: int | None = None) -> dict:
    md = _meta_dir(table_path)
    if version is None:
        hint = os.path.join(md, "version-hint.text")
        if os.path.exists(hint):
            version = int(open(hint).read().strip())
        else:
            vs = [
                int(os.path.basename(f)[1:-len(".metadata.json")])
                for f in _glob.glob(os.path.join(md, "v*.metadata.json"))
            ]
            if not vs:
                raise ValueError(f"iceberg: no metadata under {table_path}")
            version = max(vs)
    path = os.path.join(md, f"v{version}.metadata.json")
    with open(path) as f:
        meta = json.loads(f.read())
    _refuse_v3_constructs(meta)
    return meta


def _refuse_v3_constructs(meta: dict) -> None:
    """Format-version 3 scoping (docs/ICEBERG_V3.md): v3 tables that
    use only v2-compatible features READ normally — the version number
    alone is not a reason to refuse (plenty of v3 tables are just v2
    tables after a format bump). Actual v3 constructs guard-raise BY
    NAME, never mis-read:

    - table encryption (``encryption-keys``),
    - column default values on NESTED fields or of unsupported value
      types (top-level primitive ``initial-default``/``write-default``
      — boolean/int/long/float/double/string/date/decimal — are READ:
      the reader fills ``initial-default`` for files that physically
      lack the column, and appends fill ``write-default`` when the df
      omits it; row lineage is FULLY read too, explicit per-entry
      first_row_id and the spec's manifest-level inheritance rule
      both resolve in _snapshot_entries),
    - new v3 types (``timestamp_ns``, ``variant``, ``geometry``…)
      raise from the type mapper with the type name.

    Puffin DELETION VECTORS are NO LONGER refused: entries carrying
    ``referenced_data_file``/``content_offset`` decode through
    :func:`_puffin_dv_ref` + the merge-on-read anti-join. Non-DV
    Puffin blob types and non-Puffin referenced entries still refuse
    by name there."""
    fmt = int(meta.get("format-version", 1))
    if fmt > 3:
        raise NotImplementedError(
            f"iceberg: format-version {meta['format-version']} > 3"
        )
    if fmt < 3:
        return
    # row lineage (next-row-id / first_row_id) NO LONGER refuses:
    # plain reads ignore it safely (data files are unaffected), and
    # read_iceberg(row_lineage=True) synthesizes _row_id /
    # _last_updated_sequence_number per the spec — including tables
    # whose entries rely on manifest-level first_row_id INHERITANCE
    # (null per-entry values resolve in _snapshot_entries from the
    # snapshot's first-row-id + manifest row counts). Only a lineage
    # read under a snapshot with NO first-row-id still refuses.
    if meta.get("encryption-keys"):
        raise NotImplementedError(
            "iceberg v3: table encryption is beyond this reader"
        )
    schemas = meta.get("schemas") or (
        [meta["schema"]] if meta.get("schema") else []
    )
    for s in schemas:
        _validate_default_values(s.get("fields") or [])


def _default_value_of(ice_t, raw):
    """Parse a JSON single-value serialized default (spec Appendix D)
    into the Python value the Spark row machinery consumes. Supported:
    the primitive types whose serialization is unambiguous; everything
    else (uuid, binary/fixed, timestamps, nested types) refuses BY
    NAME — a misparsed default would silently corrupt every
    pre-evolution row."""
    import datetime as _dt
    import decimal as _dec

    if ice_t == "boolean":
        if not isinstance(raw, bool):
            raise NotImplementedError(
                f"iceberg v3: boolean default {raw!r} is not a JSON "
                "boolean"
            )
        return raw
    if ice_t in ("int", "long"):
        if isinstance(raw, bool) or not isinstance(raw, int):
            raise NotImplementedError(
                f"iceberg v3: {ice_t} default {raw!r} is not a JSON "
                "integer"
            )
        return int(raw)
    if ice_t in ("float", "double"):
        if isinstance(raw, bool) or not isinstance(raw, (int, float)):
            raise NotImplementedError(
                f"iceberg v3: {ice_t} default {raw!r} is not a JSON "
                "number"
            )
        return float(raw)
    if ice_t == "string":
        if not isinstance(raw, str):
            raise NotImplementedError(
                f"iceberg v3: string default {raw!r} is not a JSON "
                "string"
            )
        return raw
    if ice_t == "date":
        try:
            return _dt.date.fromisoformat(raw)
        except (TypeError, ValueError):
            raise NotImplementedError(
                f"iceberg v3: date default {raw!r} is not an ISO "
                "date string"
            ) from None
    if isinstance(ice_t, str) and ice_t.startswith("decimal("):
        try:
            return _dec.Decimal(str(raw))
        except _dec.InvalidOperation:
            raise NotImplementedError(
                f"iceberg v3: decimal default {raw!r} does not parse"
            ) from None
    raise NotImplementedError(
        f"iceberg v3: default values for type {ice_t!r} are beyond "
        "this reader"
    )


def _validate_default_values(fields: list) -> None:
    """Top-level primitive defaults must PARSE at metadata-load time
    (so a read never half-applies them); defaults on struct fields
    nested anywhere in the schema — any depth of struct/list/map
    nesting — still refuse by name instead of silently null-filling
    (ADVICE r8)."""
    for f in fields:
        for key in ("initial-default", "write-default"):
            if f.get(key) is not None:
                _default_value_of(f.get("type"), f[key])
        _refuse_default_values_in_type(f.get("type"))


def _refuse_nested_default_values(fields: list) -> None:
    for f in fields:
        if (
            f.get("initial-default") is not None
            or f.get("write-default") is not None
        ):
            raise NotImplementedError(
                "iceberg v3: column default values on NESTED field "
                f"{f.get('name')!r} are beyond this reader"
            )
        _refuse_default_values_in_type(f.get("type"))


def _refuse_default_values_in_type(t) -> None:
    if not isinstance(t, dict):
        return
    kind = t.get("type")
    if kind == "struct":
        _refuse_nested_default_values(t.get("fields") or [])
    elif kind == "list":
        _refuse_default_values_in_type(t.get("element"))
    elif kind == "map":
        _refuse_default_values_in_type(t.get("key"))
        _refuse_default_values_in_type(t.get("value"))


def _current_schema(meta: dict) -> dict:
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        for s in meta["schemas"]:
            if s.get("schema-id") == sid:
                return s
        return meta["schemas"][0]
    return meta["schema"]


_PRIM_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "string": T.StringType(),
    "uuid": T.StringType(),
    "binary": T.BinaryType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
}


def _iceberg_type_to_spark(t) -> T.DataType:
    if isinstance(t, str):
        if t in _PRIM_TO_SPARK:
            return _PRIM_TO_SPARK[t]
        if t.startswith("decimal("):
            p, s = t[len("decimal("):-1].split(",")
            return T.DecimalType(int(p), int(s))
        if t.startswith("fixed["):
            return T.BinaryType()
        raise NotImplementedError(f"iceberg: type {t!r}")
    k = t["type"]
    if k == "struct":
        return T.StructType(
            [
                T.StructField(
                    f["name"],
                    _iceberg_type_to_spark(f["type"]),
                    not f.get("required", False),
                )
                for f in t["fields"]
            ]
        )
    if k == "list":
        return T.ArrayType(
            _iceberg_type_to_spark(t["element"]),
            not t.get("element-required", False),
        )
    if k == "map":
        return T.MapType(
            _iceberg_type_to_spark(t["key"]),
            _iceberg_type_to_spark(t["value"]),
            not t.get("value-required", False),
        )
    raise NotImplementedError(f"iceberg: type {k!r}")


def iceberg_spark_schema(meta: dict) -> T.StructType:
    sch = _current_schema(meta)
    return _iceberg_type_to_spark(
        {"type": "struct", "fields": sch["fields"]}
    )


def snapshot_data_files(
    table_path: str, meta: dict, snapshot_id: int | None = None
) -> list[str]:
    """Live data-file paths of a snapshot (status != DELETED), with
    row-level deletes rejected, not ignored."""
    snaps = meta.get("snapshots") or []
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
    if snapshot_id is None or snapshot_id == -1 or not snaps:
        return []
    snap = next(
        (s for s in snaps if s["snapshot-id"] == snapshot_id), None
    )
    if snap is None:
        raise ValueError(
            f"iceberg: snapshot {snapshot_id} not in table metadata"
        )
    if "manifest-list" in snap:
        _, manifests = read_container(
            _localize(table_path, snap["manifest-list"])
        )
    else:  # v1 inline manifest path list
        manifests = [
            {"manifest_path": p, "content": 0}
            for p in snap.get("manifests", [])
        ]
    out: list[str] = []
    for m in manifests:
        if int(m.get("content") or 0) == 1:
            raise NotImplementedError(
                "iceberg: delete manifests (row-level deletes) are "
                "beyond this reader — refusing to resurrect rows"
            )
        _, entries = read_container(
            _localize(table_path, m["manifest_path"])
        )
        for e in entries:
            if int(e.get("status") or 0) == _STATUS_DELETED:
                continue
            df = e["data_file"]
            if int(df.get("content") or 0) != 0:
                raise NotImplementedError(
                    "iceberg: delete data files are beyond this reader"
                )
            out.append(_localize(table_path, df["file_path"]))
    return out


def _snapshot_entries(
    table_path: str, meta: dict, snapshot_id: int | None = None
) -> tuple[list[dict], list[dict], list[dict]]:
    """Full entry walk of a snapshot: ``(data, pos_deletes,
    eq_deletes)`` — each entry ``{"path": localized, "orig":
    manifest file_path string, "seq": sequence number,
    "equality_ids": [...]}``. Sequence numbers follow v2 inheritance:
    the entry's own ``sequence_number`` when present, else the
    manifest-list row's, else 0 (v1 tables carry none and every file
    shares seq 0 — correct, since v1 has no row-level deletes)."""
    snaps = meta.get("snapshots") or []
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
    if snapshot_id is None or snapshot_id == -1 or not snaps:
        return [], [], []
    snap = next(
        (s for s in snaps if s["snapshot-id"] == snapshot_id), None
    )
    if snap is None:
        raise ValueError(
            f"iceberg: snapshot {snapshot_id} not in table metadata"
        )
    if "manifest-list" in snap:
        _, manifests = read_container(
            _localize(table_path, snap["manifest-list"])
        )
    else:
        manifests = [
            {"manifest_path": p, "content": 0}
            for p in snap.get("manifests", [])
        ]
    data: list[dict] = []
    pos_del: list[dict] = []
    eq_del: list[dict] = []
    _puffin_footers: dict = {}  # one footer parse per Puffin file
    # v3 row-lineage first_row_id INHERITANCE (spec "Row Lineage"):
    # a data manifest with null first_row_id is assigned the
    # snapshot's first-row-id plus the added+existing row counts of
    # the preceding null-first_row_id data manifests in list order;
    # a data file entry with null first_row_id is assigned the
    # manifest's first_row_id plus the record_count of the preceding
    # null-first_row_id entries in that manifest. Counts come from
    # the manifest-list row when present, else are recomputed from
    # the entries (added_rows_count + existing_rows_count is exactly
    # the non-deleted record_count total).
    _sfri = snap.get("first-row-id")
    rl_running = int(_sfri) if _sfri is not None else None
    for m in manifests:
        m_seq = m.get("sequence_number")
        is_data_manifest = int(m.get("content") or 0) == 0
        m_first = m.get("first_row_id")
        if (
            is_data_manifest
            and m_first is None
            and rl_running is not None
        ):
            m_first = rl_running
        rl_ent_acc = 0   # ids consumed by assigned entries
        rl_live_rows = 0  # added+existing record_count (counts fallback)
        _, entries = read_container(
            _localize(table_path, m["manifest_path"])
        )
        for e in entries:
            if int(e.get("status") or 0) == _STATUS_DELETED:
                continue
            df_ = e["data_file"]
            if is_data_manifest and int(df_.get("content") or 0) == 0:
                rl_live_rows += int(df_.get("record_count") or 0)
            seq = e.get("sequence_number")
            if seq is None:
                seq = m_seq if m_seq is not None else 0
            ent = {
                "path": _localize(table_path, df_["file_path"]),
                "orig": df_["file_path"],
                "seq": int(seq),
                "equality_ids": list(df_.get("equality_ids") or []),
                # Appendix-D bounds + null counts, kept for the
                # key_range data-skipping read (field-id keyed)
                "lower_bounds": df_.get("lower_bounds"),
                "upper_bounds": df_.get("upper_bounds"),
                "null_value_counts": df_.get("null_value_counts"),
                "record_count": df_.get("record_count"),
                # v3 row lineage: _row_id = first_row_id + position
                "first_row_id": df_.get("first_row_id"),
                # identity-constant projection + partition pruning:
                # the manifest partition tuple, keyed by partition
                # field name, under the manifest's spec
                "partition": dict(df_.get("partition") or {}),
                "spec_id": m.get("partition_spec_id"),
            }
            content = int(df_.get("content") or 0)
            if (
                ent["first_row_id"] is None
                and content == 0
                and is_data_manifest
                and m_first is not None
            ):
                ent["first_row_id"] = m_first + rl_ent_acc
                rl_ent_acc += int(df_.get("record_count") or 0)
            if int(m.get("content") or 0) == 1 or content in (1, 2):
                # delete manifest / delete data file
                if (
                    df_.get("referenced_data_file") is not None
                    or df_.get("content_offset") is not None
                    or df_.get("content_size_in_bytes") is not None
                ):
                    # v3 deletion vector: positions live in a Puffin
                    # blob slice, not delete-parquet rows — reading
                    # the entry as a (file_path, pos) parquet would
                    # silently delete nothing. Known deletion-vector
                    # blobs decode through the merge-on-read path;
                    # anything else refuses by name.
                    ent["dv"] = _puffin_dv_ref(
                        table_path, df_, _puffin_footers
                    )
                    pos_del.append(ent)
                elif content == 2 or ent["equality_ids"]:
                    eq_del.append(ent)
                else:
                    pos_del.append(ent)
            else:
                data.append(ent)
        if (
            is_data_manifest
            and m.get("first_row_id") is None
            and rl_running is not None
        ):
            a = m.get("added_rows_count")
            x = m.get("existing_rows_count")
            rl_running += (
                int(a) + int(x)
                if a is not None and x is not None
                else rl_live_rows
            )
    return data, pos_del, eq_del


def _puffin_dv_ref(
    table_path: str, df_: dict, footer_cache: dict
) -> dict:
    """Validate a v3 deletion-vector manifest entry against its Puffin
    footer and return the ``{referenced, offset, size}`` slice the
    reader's executor-side decode consumes. Non-Puffin referenced
    entries and unknown Puffin blob types refuse by name — a DV the
    reader cannot decode must never silently delete nothing."""
    fmt_name = str(df_.get("file_format") or "").upper()
    rel = df_.get("file_path")
    if fmt_name != "PUFFIN" and not str(rel).endswith(".puffin"):
        raise NotImplementedError(
            "iceberg v3: deletion vectors (Puffin delete blobs) in "
            f"format {fmt_name!r} are beyond this reader — delete "
            f"file {rel!r}"
        )
    referenced = df_.get("referenced_data_file")
    offset = df_.get("content_offset")
    size = df_.get("content_size_in_bytes")
    if referenced is None or offset is None or size is None:
        raise NotImplementedError(
            "iceberg v3: Puffin deletion vector entry missing "
            "referenced_data_file/content_offset/"
            f"content_size_in_bytes — delete file {rel!r}"
        )
    path = _localize(table_path, rel)
    if path not in footer_cache:
        footer_cache[path] = read_puffin_footer(path)
    blob = next(
        (
            b
            for b in footer_cache[path].get("blobs") or []
            if int(b.get("offset")) == int(offset)
        ),
        None,
    )
    if blob is None:
        raise ValueError(
            f"iceberg v3: no Puffin blob at offset {offset} in {rel!r}"
        )
    if blob.get("type") != DV_V1:
        raise NotImplementedError(
            f"iceberg v3: Puffin blob type {blob.get('type')!r} is "
            f"beyond this reader — delete file {rel!r}"
        )
    return {
        "referenced": referenced,
        "offset": int(offset),
        "size": int(size),
    }


def _basename(p: str) -> str:
    return p.rsplit("/", 1)[-1]


def _puffin_dv_positions_df(spark: SparkSession, dv_del: list[dict]):
    """Deleted ``(file_path, pos, __pseq)`` rows from v3
    deletion-vector entries: each referenced data file's Puffin blob
    slice decodes on EXECUTORS through an Arrow-batched pandas UDF
    (the Delta DV pattern, sources/delta.py ``dv_positions_df``)."""
    import pandas  # noqa: F401  (annotation resolution)
    from pyspark.sql.functions import pandas_udf

    # get_type_hints resolves annotations from MODULE globals (the
    # `from __future__ import annotations` stringification), so pandas
    # must be visible there
    globals().setdefault("pandas", pandas)

    rows = [
        (
            d["dv"]["referenced"],
            d["path"],
            d["dv"]["offset"],
            d["dv"]["size"],
            d["seq"],
        )
        for d in dv_del
    ]
    ddf = local_rows_df(spark,
        rows,
        "file_path string, __ppath string, __off long, __size long, "
        "__pseq long",
    )
    # one decode task per descriptor row spins one Python worker per
    # vector; slice by compressed-blob bytes (~1 MB per task) instead,
    # keeping executor parallelism for big vector sets while a
    # metadata-scale set decodes in one task (Delta twin in
    # sources/delta.py dv_positions_df).
    total_sz = sum(int(r[3]) for r in rows)
    ddf = ddf.coalesce(
        max(1, min(len(rows), total_sz // (1 << 20) + 1))
    )

    # ship the codec modules BY VALUE: python workers do not have the
    # repo on PYTHONPATH (the same gotcha as the streaming sources)
    from pyspark import cloudpickle as _cp

    from optimus_any2any_spark.formats import puffin as _puffin
    from optimus_any2any_spark.formats import roaring as _roaring

    _cp.register_pickle_by_value(_roaring)
    _cp.register_pickle_by_value(_puffin)
    read_puffin_blob = _puffin.read_puffin_blob
    dv_puffin_blob_decode = _puffin.dv_puffin_blob_decode

    @pandas_udf("array<long>")
    def _decode(
        ppath: pandas.Series, off: pandas.Series, size: pandas.Series
    ) -> pandas.Series:
        import pandas as _pd

        return _pd.Series(
            [
                dv_puffin_blob_decode(
                    read_puffin_blob(
                        ppath.iloc[i],
                        int(off.iloc[i]),
                        int(size.iloc[i]),
                    )
                )
                for i in range(len(ppath))
            ]
        )

    from pyspark.sql import functions as F

    return ddf.select(
        "file_path",
        F.explode(_decode("__ppath", "__off", "__size")).alias("pos"),
        "__pseq",
    )


def read_iceberg(
    spark: SparkSession,
    table_path: str,
    snapshot_id: int | None = None,
    key_range: tuple | None = None,
    as_of_timestamp=None,
    ref: str | None = None,
    row_lineage: bool = False,
) -> DataFrame:
    """Snapshot read of an Iceberg table; ``snapshot_id`` time-travels
    to any retained snapshot (the spec's SNAPSHOT AS OF), and
    ``as_of_timestamp`` (epoch-ms / ISO string / datetime) resolves
    through the metadata's ``snapshot-log`` to the latest snapshot at
    or before that time — Iceberg's TIMESTAMP AS OF
    (``SnapshotUtil.snapshotIdAsOfTime``; clamps to current past the
    end of history, raises before the first snapshot). ``ref`` reads
    a named TAG or BRANCH from the metadata ``refs`` map (the spec's
    VERSION AS OF 'name'). The three selectors are mutually
    exclusive.

    ``key_range=(col, lo, hi)`` applies the range predicate AND skips
    data files whose Appendix-D ``lower_bounds``/``upper_bounds`` for
    that column prove no row can match — Iceberg's manifest-level data
    skipping, the twin of ``read_delta(key_range=...)``. Files without
    recorded bounds are read (and still filtered); all-null files skip
    via ``null_value_counts`` (a range predicate never matches null).

    v2 MERGE-ON-READ: positional and equality delete files apply as
    anti-joins — positional deletes match ``(file, row position)``
    via Spark's ``_metadata.file_path``/``row_index`` hidden columns
    (a delete applies when its sequence number >= the data file's);
    equality deletes null-safe-match their equality columns (apply
    when seq > the data file's). The sequence comparison is what keeps
    a row RE-INSERTED after a delete alive — ignoring it would
    over-delete. File identity joins on basenames (unique per table
    in both this writer's and real writers' uuid naming).

    ``row_lineage=True`` (v3 ROW LINEAGE) appends ``_row_id`` and
    ``_last_updated_sequence_number``: each data file's manifest
    entry carries its ``first_row_id`` and rows derive
    ``first_row_id + position`` — stable across MERGE-ON-READ deletes
    (positions never move) and minted fresh by delete+insert updates,
    exactly the spec's lineage contract. Requires ``next-row-id`` in
    the table metadata; entries relying on manifest-level
    inheritance refuse by name."""
    from pyspark.sql import functions as F

    meta = load_table_metadata(table_path)
    if (
        sum(
            x is not None
            for x in (snapshot_id, as_of_timestamp, ref)
        )
        > 1
    ):
        raise ValueError(
            "iceberg read: snapshot_id / as_of_timestamp / ref are "
            "mutually exclusive"
        )
    if ref is not None:
        snapshot_id = resolve_iceberg_ref(meta, ref)
    if as_of_timestamp is not None:
        snapshot_id = resolve_iceberg_timestamp(meta, as_of_timestamp)
    schema = iceberg_spark_schema(meta)
    data, pos_del, eq_del = _snapshot_entries(
        table_path, meta, snapshot_id
    )
    if key_range is not None:
        col, lo, hi = key_range
        data = _prune_by_bounds(meta, data, col, lo, hi)
    if row_lineage:
        # v3 ROW LINEAGE: _row_id = the file's first_row_id + the
        # row's raw parquet position; _last_updated_sequence_number =
        # the file's data sequence. Both derive from the SAME
        # (basename → lineage) broadcast the position read already
        # pays — zero extra jobs.
        if meta.get("next-row-id") is None:
            raise ValueError(
                "iceberg read: row_lineage=True on a table without "
                "next-row-id — not a row-lineage table"
            )
        if any(
            f.name in ("_row_id", "_last_updated_sequence_number")
            for f in schema.fields
        ):
            raise NotImplementedError(
                "iceberg v3: table schema shadows the reserved "
                "lineage column names — beyond this reader"
            )
        missing = [
            d["orig"] for d in data if d.get("first_row_id") is None
        ]
        if missing:
            # inheritance (_snapshot_entries) already resolved every
            # null it could — a residue means the snapshot itself
            # lacks first-row-id, so ids are unassignable
            raise NotImplementedError(
                "iceberg v3: data files without first_row_id under a "
                "snapshot that declares no first-row-id — row ids "
                f"are unassignable for {missing[:3]}"
            )
        # files REWRITTEN by maintenance carry MATERIALIZED lineage
        # columns (the spec's preservation mechanism); files that
        # never were read them as null through the extended schema
        # (Spark null-fills requested columns absent from a parquet
        # file) and fall back to first_row_id + position
        from pyspark.sql import types as T

        ext_schema = T.StructType(
            list(schema.fields)
            + [
                T.StructField("_row_id", T.LongType(), True),
                T.StructField(
                    "_last_updated_sequence_number", T.LongType(), True
                ),
            ]
        )
        out = read_entries_with_deletes(
            spark, meta, ext_schema, data, pos_del, eq_del,
            position_cols=("__rl_fp", "__rl_pos"),
        )
        if data:
            lk = local_rows_df(spark, 
                [
                    (d["orig"], int(d["first_row_id"]), int(d["seq"]))
                    for d in data
                ],
                "__rl_fp string, __rl_first long, __rl_seq long",
            )
            out = out.join(F.broadcast(lk), "__rl_fp", "inner")
        else:
            out = out.withColumn(
                "__rl_first", F.lit(None).cast("long")
            ).withColumn("__rl_seq", F.lit(None).cast("long"))
        out = out.select(
            *schema.fieldNames(),
            F.coalesce(
                F.col("_row_id"),
                F.col("__rl_first") + F.col("__rl_pos"),
            ).alias("_row_id"),
            F.coalesce(
                F.col("_last_updated_sequence_number"),
                F.col("__rl_seq"),
            ).alias("_last_updated_sequence_number"),
        )
        if key_range is not None:
            col, lo, hi = key_range
            out = out.filter(
                (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
            )
        return out
    if key_range is not None:
        col, lo, hi = key_range
        out = read_entries_with_deletes(
            spark, meta, schema, data, pos_del, eq_del
        )
        return out.filter(
            (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
        )
    return read_entries_with_deletes(
        spark, meta, schema, data, pos_del, eq_del
    )


def read_iceberg_metadata(
    spark: SparkSession, table_path: str, kind: str
) -> DataFrame:
    """Iceberg METADATA tables (the spec's inspection surface —
    ``SELECT * FROM tbl.snapshots`` etc.) as DataFrames:

    - ``snapshots``: committed_at (ms), snapshot_id, parent_id,
      operation, manifest_list;
    - ``history``: made_current_at (ms), snapshot_id, parent_id,
      is_current_ancestor — from the metadata ``snapshot-log``;
    - ``refs``: name, type, snapshot_id;
    - ``manifests``: path, length, partition_spec_id, content,
      added_snapshot_id;
    - ``files``: content, file_path, file_format, record_count,
      file_size_in_bytes (current snapshot; delete files included
      with their spec content codes);
    - ``partitions``: per live partition tuple (values rendered as
      strings, identity constants decoded first), spec_id, data
      record/file totals and gating position/equality delete-file
      counts — the skew/compaction inspection surface;
    - ``entries``: the live manifest entries of the current snapshot
      (content code, file path, effective sequence number, record
      count, partition tuple as strings) — the debugging surface for
      delete-gating questions ("which files does this delete still
      gate?"), one row per live entry.

    All driver-side metadata decode (KB–MB of JSON/Avro — the same
    scale every Iceberg client pays), emitted as a DataFrame so the
    inspection composes with the relational surface."""
    meta = load_table_metadata(table_path)
    snaps = meta.get("snapshots") or []
    by_id = {s["snapshot-id"]: s for s in snaps}
    if kind == "snapshots":
        return local_rows_df(spark, 
            [
                (
                    int(s.get("timestamp-ms") or 0),
                    int(s["snapshot-id"]),
                    (
                        None
                        if s.get("parent-snapshot-id") is None
                        else int(s["parent-snapshot-id"])
                    ),
                    (s.get("summary") or {}).get("operation"),
                    s.get("manifest-list"),
                )
                for s in snaps
            ],
            "committed_at long, snapshot_id long, parent_id long, "
            "operation string, manifest_list string",
        )
    if kind == "history":
        cur = meta.get("current-snapshot-id")
        # ancestors of the current snapshot via parent links
        ancestors: set[int] = set()
        sid = cur
        while sid in by_id:
            ancestors.add(sid)
            sid = by_id[sid].get("parent-snapshot-id")
        log = meta.get("snapshot-log") or [
            {
                "timestamp-ms": int(s.get("timestamp-ms") or 0),
                "snapshot-id": s["snapshot-id"],
            }
            for s in snaps
        ]
        return local_rows_df(spark, 
            [
                (
                    int(e["timestamp-ms"]),
                    int(e["snapshot-id"]),
                    (
                        None
                        if by_id.get(e["snapshot-id"], {}).get(
                            "parent-snapshot-id"
                        )
                        is None
                        else int(
                            by_id[e["snapshot-id"]][
                                "parent-snapshot-id"
                            ]
                        )
                    ),
                    e["snapshot-id"] in ancestors,
                )
                for e in log
            ],
            "made_current_at long, snapshot_id long, parent_id long, "
            "is_current_ancestor boolean",
        )
    if kind == "refs":
        return local_rows_df(spark, 
            [
                (name, r.get("type"), int(r["snapshot-id"]))
                for name, r in sorted(
                    (meta.get("refs") or {}).items()
                )
            ],
            "name string, type string, snapshot_id long",
        )
    if kind == "manifests":
        rows = []
        cur_id = meta.get("current-snapshot-id")
        snap = by_id.get(cur_id)
        manifests = []
        if snap is not None:
            ml = snap.get("manifest-list")
            if ml is not None:
                _, manifests = read_container(_localize(table_path, ml))
            else:
                manifests = [
                    {"manifest_path": p}
                    for p in snap.get("manifests", [])
                ]
        for m in manifests:
            rows.append(
                (
                    m.get("manifest_path"),
                    (
                        None
                        if m.get("manifest_length") is None
                        else int(m["manifest_length"])
                    ),
                    int(m.get("partition_spec_id") or 0),
                    int(m.get("content") or 0),
                    (
                        None
                        if m.get("added_snapshot_id") is None
                        else int(m["added_snapshot_id"])
                    ),
                )
            )
        return local_rows_df(spark, 
            rows,
            "path string, length long, partition_spec_id int, "
            "content int, added_snapshot_id long",
        )
    if kind == "files":
        data, pos_del, eq_del = _snapshot_entries(table_path, meta)
        rows = []
        for content, ents in ((0, data), (1, pos_del), (2, eq_del)):
            for e in ents:
                c = content
                if content == 1 and e.get("equality_ids"):
                    c = 2
                rows.append(
                    (
                        c,
                        e["orig"],
                        (
                            None
                            if e.get("record_count") is None
                            else int(e["record_count"])
                        ),
                    )
                )
        return local_rows_df(spark, 
            rows, "content int, file_path string, record_count long"
        )
    if kind == "partitions":
        # the spec's partitions inspection table: per live partition
        # tuple, data file/record totals plus gating delete-file
        # counts — the skew/compaction surface (a 100 TB table's hot
        # partitions show up here before they show up as stragglers).
        # Values render as strings keyed by partition field name
        # (identity constants decode first, so dt=2026-01-01 prints
        # as the date, not int days); the unpartitioned table is one
        # row with an empty map.
        data, pos_del, eq_del = _snapshot_entries(table_path, meta)
        id_specs = _identity_spec_fields(meta)
        typed = {
            sid: {name: ice_t for name, _src, ice_t in fields}
            for sid, fields in id_specs.items()
        }

        def _pkey(e: dict) -> tuple[int, tuple]:
            sid = e.get("spec_id")
            if sid is None:
                sid = int(meta.get("default-spec-id", 0))
            sid = int(sid)
            p = e.get("partition") or {}
            tmap = typed.get(sid, {})
            vals = []
            for name in sorted(p):
                v = p[name]
                if name in tmap:
                    v = _decode_partition_const(tmap[name], v)
                vals.append(
                    (name, None if v is None else str(v))
                )
            return sid, tuple(vals)

        agg: dict[tuple, list[int]] = {}
        for e in data:
            k = _pkey(e)
            a = agg.setdefault(k, [0, 0, 0, 0])
            a[0] += int(e.get("record_count") or 0)
            a[1] += 1
        for e in pos_del:
            agg.setdefault(_pkey(e), [0, 0, 0, 0])[2] += 1
        for e in eq_del:
            agg.setdefault(_pkey(e), [0, 0, 0, 0])[3] += 1
        rows = [
            (
                dict(vals),
                sid,
                a[0],
                a[1],
                a[2],
                a[3],
            )
            for (sid, vals), a in sorted(
                agg.items(),
                # nulls first within a field, stable across specs
                key=lambda kv: (
                    kv[0][0],
                    tuple(
                        (n, v is not None, v or "")
                        for n, v in kv[0][1]
                    ),
                ),
            )
        ]
        return local_rows_df(spark, 
            rows,
            "partition map<string,string>, spec_id int, "
            "record_count long, file_count long, "
            "position_delete_file_count long, "
            "equality_delete_file_count long",
        )
    if kind == "entries":
        data, pos_del, eq_del = _snapshot_entries(table_path, meta)
        id_specs = _identity_spec_fields(meta)
        typed = {
            sid: {name: ice_t for name, _src, ice_t in fields}
            for sid, fields in id_specs.items()
        }

        def _pstr(e: dict) -> dict:
            sid = e.get("spec_id")
            if sid is None:
                sid = int(meta.get("default-spec-id", 0))
            tmap = typed.get(int(sid), {})
            out = {}
            for name, v in sorted((e.get("partition") or {}).items()):
                if name in tmap:
                    v = _decode_partition_const(tmap[name], v)
                out[name] = None if v is None else str(v)
            return out

        rows = []
        for content, ents in ((0, data), (1, pos_del), (2, eq_del)):
            for e in ents:
                c = content
                if content == 1 and e.get("equality_ids"):
                    c = 2
                rows.append(
                    (
                        c,
                        e["orig"],
                        int(e["seq"]),
                        (
                            None
                            if e.get("record_count") is None
                            else int(e["record_count"])
                        ),
                        _pstr(e),
                    )
                )
        return local_rows_df(spark, 
            rows,
            "content int, file_path string, sequence_number long, "
            "record_count long, partition map<string,string>",
        )
    raise ValueError(
        f"iceberg metadata table: unknown kind {kind!r} (snapshots / "
        "history / refs / manifests / files / partitions / entries)"
    )


def encode_bound(iceberg_type: str, v) -> bytes | None:
    """Appendix-D single-value bound serialization (shared with the
    writers in streaming/iceberg_table, which re-exports these —
    defined HERE so manifest pruning works inside the pure-python
    data-source runner without a by-name runtime import)."""
    import struct

    if v is None:
        return None
    if iceberg_type == "int":
        return struct.pack("<i", v)
    if iceberg_type == "long":
        return struct.pack("<q", v)
    if iceberg_type == "double":
        return struct.pack("<d", float(v))
    if iceberg_type == "float":
        return struct.pack("<f", float(v))
    if iceberg_type == "string":
        return str(v).encode()
    return None  # unbounded type: no stats, conservatively affected


def decode_bound(iceberg_type: str, b: bytes | None):
    import struct

    if b is None:
        return None
    if iceberg_type == "int":
        return struct.unpack("<i", b)[0]
    if iceberg_type == "long":
        return struct.unpack("<q", b)[0]
    if iceberg_type == "double":
        return struct.unpack("<d", b)[0]
    if iceberg_type == "float":
        return struct.unpack("<f", b)[0]
    if iceberg_type == "string":
        return b.decode()
    return None


# identity partition source types whose manifest-tuple values this
# reader can turn into the Spark column value. The Avro container
# decodes logical types as their PHYSICAL representation (date as int
# days, timestamps as long micros, decimal as big-endian unscaled
# bytes) — _decode_partition_const converts. Types outside this set
# (uuid, fixed, binary, time) are skipped entirely: their files keep
# their stored column values (value-identical per the projection
# rule), which is also the pre-substitution behavior.
_CONST_RAW = {"int", "long", "string", "double", "float", "boolean"}


def _decodable_partition_type(ice_t: str) -> bool:
    return (
        ice_t in _CONST_RAW
        or ice_t in (
            "date", "timestamp", "timestamptz",
            "timestamp_ns", "timestamptz_ns",
        )
        or ice_t.startswith("decimal(")
    )


def _decode_partition_const(ice_t: str, v):
    """Manifest partition tuple value → the Python value Spark's row
    construction expects for the column's read type (spec: Column
    Projection; Avro logical-type physical forms)."""
    import datetime as _dt
    import decimal as _dec

    if v is None or ice_t in _CONST_RAW:
        return v
    if ice_t == "date":
        return _dt.date(1970, 1, 1) + _dt.timedelta(days=int(v))
    if ice_t == "timestamptz":
        return _dt.datetime(
            1970, 1, 1, tzinfo=_dt.timezone.utc
        ) + _dt.timedelta(microseconds=int(v))
    if ice_t == "timestamp":
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(
            microseconds=int(v)
        )
    if ice_t == "timestamp_ns":  # v3 tz-LESS; Spark stores micros
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(
            microseconds=int(v) // 1000
        )
    if ice_t == "timestamptz_ns":  # v3 instant variant
        return _dt.datetime(
            1970, 1, 1, tzinfo=_dt.timezone.utc
        ) + _dt.timedelta(microseconds=int(v) // 1000)
    if ice_t.startswith("decimal("):
        scale = int(ice_t[:-1].split(",")[1])
        unscaled = (
            int.from_bytes(v, "big", signed=True)
            if isinstance(v, (bytes, bytearray))
            else int(v)
        )
        return _dec.Decimal(unscaled).scaleb(-scale)
    raise NotImplementedError(
        f"iceberg: identity partition constant of type {ice_t!r}"
    )


def _identity_spec_fields(
    meta: dict,
) -> dict[int, list[tuple[str, str, str]]]:
    """Per partition-spec-id, the IDENTITY fields as ``(partition
    field name, source column name, iceberg type)`` triples — the
    spec's Column Projection constants map: for an identity partition
    field, a row's source-column value IS the manifest entry's
    partition tuple value. That rule is what makes hive-layout files
    registered by ``add_iceberg_files`` readable (the partition
    column lives in the directory name, not the file), and it is
    value-identical for files that do carry the column (a file under
    partition ``p`` contains exactly ``p``'s rows). Non-identity
    fields, fields whose source column left the current schema, and
    source types without a partition-constant decoding contribute
    nothing (their files' stored values remain authoritative)."""
    by_id = {
        int(f["id"]): f for f in _current_schema(meta)["fields"]
    }
    out: dict[int, list[tuple[str, str, str]]] = {}
    for spec in meta.get("partition-specs") or []:
        fields: list[tuple[str, str, str]] = []
        for pf in spec.get("fields") or []:
            if str(pf.get("transform") or "") != "identity":
                continue
            src = by_id.get(int(pf["source-id"]))
            if (
                src is None
                or not isinstance(src["type"], str)
                or not _decodable_partition_type(src["type"])
            ):
                continue
            fields.append(
                (pf.get("name") or src["name"], src["name"],
                 src["type"])
            )
        out[int(spec.get("spec-id") or 0)] = fields
    return out


def _entry_identity_consts(
    meta: dict, id_specs: dict[int, list[tuple[str, str, str]]],
    ent: dict
) -> dict[str, object]:
    """One data entry's identity constants: ``{source column:
    decoded partition value}`` under the entry's manifest spec
    (default spec when the manifest-list row carries none — the v1
    fallback)."""
    p = ent.get("partition") or {}
    if not p:
        return {}
    sid = ent.get("spec_id")
    if sid is None:
        sid = int(meta.get("default-spec-id", 0))
    return {
        src: _decode_partition_const(ice_t, p[name])
        for name, src, ice_t in id_specs.get(int(sid), [])
        if name in p
    }


def _identity_consts_by_basename(
    meta: dict, data: list[dict]
) -> dict[str, dict[str, object]]:
    """Basename-keyed identity constants over a data entry set; empty
    when no entry carries identity partition values (the common
    unpartitioned case — zero plan impact there)."""
    id_specs = _identity_spec_fields(meta)
    if not any(id_specs.values()):
        return {}
    out: dict[str, dict[str, object]] = {}
    for d in data:
        m = _entry_identity_consts(meta, id_specs, d)
        if m:
            out[_basename(d["orig"])] = m
    return out


def _reader_default_fills(meta: dict) -> dict[str, object]:
    """Current-schema top-level ``initial-default`` values, parsed —
    the fill the spec mandates for rows in files written BEFORE the
    column existed. Empty below format v3 (defaults are a v3
    construct)."""
    if int(meta.get("format-version", 1)) < 3:
        return {}
    out: dict[str, object] = {}
    for f in _current_schema(meta)["fields"]:
        if f.get("initial-default") is not None:
            out[f["name"]] = _default_value_of(
                f["type"], f["initial-default"]
            )
    return out


# footer column-name cache for the default-fill check: iceberg data
# files are immutable (writers never rewrite a path in place), so one
# footer read per path per process suffices — the changelog walks
# overlapping entry sets up to 3x per snapshot and would otherwise
# re-fetch the same footers every call. Bounded LRU, same discipline
# as the jq/template compile caches.
_FOOTER_NAMES_CACHE: "OrderedDict[tuple, frozenset]" = (
    __import__("collections").OrderedDict()
)
_FOOTER_NAMES_CAP = 65536


def _footer_column_names(path: str) -> frozenset | None:
    """Top-level column names of one parquet footer, or None when the
    file is unreadable (the data read will raise with the real
    error). Cached per (path, size, mtime) — a same-path rebuild
    (fixtures rmtree + recreate deterministic file names) must never
    serve the old footer's shape; the stat is ~100× cheaper than the
    footer read it saves."""
    import os as _os

    try:
        st = _os.stat(path)
    except OSError:
        return None
    key = (path, st.st_size, st.st_mtime_ns)
    c = _FOOTER_NAMES_CACHE
    if key in c:
        c.move_to_end(key)
        return c[key]
    import pyarrow.parquet as _pq

    try:
        names = frozenset(_pq.read_schema(path).names)
    except (OSError, ValueError):
        # ValueError covers pyarrow's ArrowInvalid (corrupt footer):
        # defer to the executor data read for the real error.
        # Transient: do NOT cache unreadable.
        return None
    c[key] = names
    if len(c) > _FOOTER_NAMES_CAP:
        c.popitem(last=False)
    return names


def _projection_consts(
    meta: dict, data: list[dict]
) -> dict[str, dict[str, object]]:
    """Per-basename constants the read must project over the raw
    parquet columns: identity partition values (always authoritative)
    plus ``initial-default`` fills for files whose FOOTER schema lacks
    a defaulted column. The footer check is a metadata-only read and
    runs only on default-carrying (v3) tables — a file that contains
    the column keeps its stored values, nulls included (the spec
    fills ONLY missing columns)."""
    consts = _identity_consts_by_basename(meta, data)
    fills = _reader_default_fills(meta)
    if fills:
        for d in data:
            names = _footer_column_names(d["path"])
            if names is None:
                continue  # unreadable file: the data read will raise
            missing = {
                c: v for c, v in fills.items() if c not in names
            }
            if missing:
                m = consts.setdefault(_basename(d["orig"]), {})
                for c, v in missing.items():
                    # identity constants outrank defaults (a
                    # partition value IS the column value)
                    m.setdefault(c, v)
    return consts


def _substitute_identity_consts(
    spark: SparkSession,
    df: DataFrame,
    consts: dict[str, dict[str, object]],
    data: list[dict],
    schema,
    bn_col: str,
) -> DataFrame:
    """Apply the identity-constant projection: replace each identity
    partition source column with the row's file-level partition value
    through ONE broadcast join keyed on ``bn_col`` (the lookup is
    O(files) — a few MB even at 100 TB file counts). Files without a
    constant for a column (older unpartitioned spec) keep their file
    values via a per-column presence flag, so a null partition value
    substitutes as a real null rather than falling through."""
    from pyspark.sql import functions as F

    cols = sorted(
        {
            c
            for m in consts.values()
            for c in m
            if c in schema.fieldNames()
        }
    )
    if not cols:
        return df
    ftypes = {f.name: f.dataType for f in schema.fields}
    lk_fields = [T.StructField(bn_col, T.StringType(), False)]
    for c in cols:
        lk_fields.append(T.StructField(f"__pc_{c}", ftypes[c], True))
        lk_fields.append(
            T.StructField(f"__pcs_{c}", T.BooleanType(), False)
        )
    rows = []
    seen: set[str] = set()
    for d in data:
        bn = _basename(d["orig"])
        if bn in seen:
            continue
        seen.add(bn)
        m = consts.get(bn, {})
        row: list[object] = [bn]
        for c in cols:
            row.append(m.get(c))
            row.append(c in m)
        rows.append(tuple(row))
    lk = local_rows_df(spark, rows, T.StructType(lk_fields))
    out = df.join(F.broadcast(lk), bn_col, "left")
    for c in cols:
        out = out.withColumn(
            c,
            F.when(
                F.col(f"__pcs_{c}"), F.col(f"__pc_{c}")
            ).otherwise(F.col(c)),
        )
    return out.drop(
        *[f"__pc_{c}" for c in cols], *[f"__pcs_{c}" for c in cols]
    )


def _prune_by_bounds(
    meta: dict, data: list[dict], col: str, lo, hi
) -> list[dict]:
    """Drop data entries whose Appendix-D bounds PROVE the range
    predicate cannot match (or that are provably all-null for the
    column — a range predicate never matches null). Entries without
    decodable bounds are conservatively kept.

    When ``col`` is an IDENTITY partition source, the entry's
    partition tuple value is authoritative (every row in the file has
    exactly that value — the Column Projection constant), so it
    decides inclusion outright: this is Iceberg's partition pruning,
    and the only pruning available for hive-migrated files, which
    carry no per-column bounds at all."""
    id_specs = _identity_spec_fields(meta)
    field = next(
        (
            f
            for f in _current_schema(meta)["fields"]
            if f["name"] == col
        ),
        None,
    )
    if field is None or not isinstance(field["type"], str):
        return data
    fid, ice_t = int(field["id"]), field["type"]

    def _kv(pairs, key):
        for p in pairs or []:
            if int(p["key"]) == key:
                return p["value"]
        return None

    kept: list[dict] = []
    for d in data:
        consts = _entry_identity_consts(meta, id_specs, d)
        if col in consts:
            v = consts[col]
            if v is None:
                continue  # null partition: range never matches
            try:
                if v < lo or v > hi:
                    continue  # whole file provably outside the range
            except TypeError:
                pass  # incomparable types: keep conservatively
            kept.append(d)
            continue
        nulls = _kv(d.get("null_value_counts"), fid)
        n = d.get("record_count")
        if (
            nulls is not None
            and n is not None
            and len(nulls) == 8
            and int.from_bytes(nulls, "little") == int(n)
        ):
            continue  # provably all-null: range never matches
        blo = _kv(d.get("lower_bounds"), fid)
        bhi = _kv(d.get("upper_bounds"), fid)
        if blo is not None and bhi is not None:
            try:
                vlo, vhi = decode_bound(ice_t, blo), decode_bound(
                    ice_t, bhi
                )
            except Exception:
                kept.append(d)
                continue
            if vlo is not None and vhi is not None and (
                vlo > hi or vhi < lo
            ):
                continue  # provably disjoint
        kept.append(d)
    return kept


def _pos_delete_rows_df(spark: SparkSession, pos_del: list[dict]):
    """Every ``(file_path, pos, __pseq)`` row the given positional-
    delete entries assert — parquet pos-delete files (spec field ids
    2147483546/2147483545, delete-file sequence attached via a
    broadcast basename lookup) unioned with v3 deletion vectors (the
    Puffin blob slices decode on EXECUTORS via an Arrow-batched pandas
    UDF — the descriptor frame is O(DV'd files), the exploded
    positions are the only data moved). Returns None when there are
    no positional deletes."""
    from pyspark.sql import functions as F

    dv_del = [d for d in pos_del if d.get("dv")]
    pq_del = [d for d in pos_del if not d.get("dv")]
    pdel = None
    if pq_del:
        pd_schema = T.StructType(
            [
                T.StructField("file_path", T.StringType(), True),
                T.StructField("pos", T.LongType(), True),
            ]
        )
        pdel = (
            spark.read.schema(pd_schema)
            .parquet(*[d["path"] for d in pq_del])
            .select(
                "*",
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ).alias("__dbn"),
            )
        )
        plk = local_rows_df(spark, 
            [(_basename(d["orig"]), d["seq"]) for d in pq_del],
            "__dbn string, __pseq long",
        )
        pdel = pdel.join(F.broadcast(plk), "__dbn", "inner").drop("__dbn")
    if dv_del:
        dvdf = _puffin_dv_positions_df(spark, dv_del)
        pdel = dvdf if pdel is None else pdel.unionByName(dvdf)
    return pdel


def read_entries_with_deletes(
    spark: SparkSession,
    meta: dict,
    schema,
    data: list[dict],
    pos_del: list[dict],
    eq_del: list[dict],
    basename_col: str | None = None,
    position_cols: tuple[str, str] | None = None,
) -> DataFrame:
    """The merge-on-read core of :func:`read_iceberg`, reusable over a
    SUBSET of a snapshot's data entries: read the given data files and
    anti-join away the rows the given positional/equality delete files
    erase, sequence-gated per the spec. The copy-on-write merge reads
    its affected files through this so a rewrite never resurrects
    rows a delete had already removed. ``basename_col`` names an extra
    output column carrying each row's source-file basename (captured
    BEFORE any join — metadata columns are unreliable once rows cross
    an exchange), for callers routing rows back to per-file
    partitions (compaction). ``position_cols=(path_col, pos_col)``
    appends each surviving row's manifest-listed data-file path and
    raw parquet row position — the identity a positional-delete
    WRITER needs (``delete_iceberg_positions``)."""
    from pyspark.sql import functions as F

    if not data:
        out = spark.createDataFrame([], schema)
        if basename_col:
            out = out.withColumn(basename_col, F.lit(None).cast("string"))
        if position_cols:
            out = out.withColumn(
                position_cols[0], F.lit(None).cast("string")
            ).withColumn(position_cols[1], F.lit(None).cast("long"))
        return out
    consts = _projection_consts(meta, data)
    if not pos_del and not eq_del and not position_cols:
        out = spark.read.schema(schema).parquet(
            *[d["path"] for d in data]
        )
        if basename_col or consts:
            bn = basename_col or "__bn"
            out = out.select(
                "*",
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ).alias(bn),
            )
            if consts:
                out = _substitute_identity_consts(
                    spark, out, consts, data, schema, bn
                )
            if not basename_col:
                out = out.drop(bn)
        return out
    df = (
        spark.read.schema(schema)
        .parquet(*[d["path"] for d in data])
        .select(
            "*",
            F.col("_metadata.file_path").alias("__fp"),
            F.col("_metadata.row_index").alias("__pos"),
        )
        .withColumn(
            "__bn", F.element_at(F.split(F.col("__fp"), "/"), -1)
        )
        .drop("__fp")
    )
    if consts:
        df = _substitute_identity_consts(
            spark, df, consts, data, schema, "__bn"
        )
    lk = local_rows_df(spark, 
        [(_basename(d["orig"]), d["orig"], d["seq"]) for d in data],
        "__bn string, __orig string, __dseq long",
    )
    df = df.join(F.broadcast(lk), "__bn", "inner")
    if not basename_col:
        df = df.drop("__bn")

    pdel = _pos_delete_rows_df(spark, pos_del)
    if pdel is not None:
        df = df.alias("d").join(
            pdel.alias("x"),
            (F.col("d.__orig") == F.col("x.file_path"))
            & (F.col("d.__pos") == F.col("x.pos"))
            & (F.col("x.__pseq") >= F.col("d.__dseq")),
            "left_anti",
        )

    if eq_del:
        by_id = {
            int(f["id"]): f["name"]
            for f in _current_schema(meta)["fields"]
        }
        # group equality-delete files by their equality column set —
        # each set is one anti-join
        sets: dict[tuple, list[dict]] = {}
        for d in eq_del:
            ids = tuple(sorted(d["equality_ids"]))
            if not ids:
                raise NotImplementedError(
                    "iceberg: equality delete file without "
                    "equality_ids"
                )
            sets.setdefault(ids, []).append(d)
        for ids, dels in sorted(sets.items()):
            try:
                cols = [by_id[i] for i in ids]
            except KeyError as e:
                raise NotImplementedError(
                    f"iceberg: equality delete on unknown field id {e}"
                ) from None
            eq_schema = T.StructType(
                [
                    T.StructField(
                        c, schema[c].dataType, True
                    )
                    for c in cols
                ]
            )
            edel = (
                spark.read.schema(eq_schema)
                .parquet(*[d["path"] for d in dels])
                .select(
                    *[F.col(c).alias(f"__eq_{c}") for c in cols],
                    F.element_at(
                        F.split(F.col("_metadata.file_path"), "/"), -1
                    ).alias("__ebn"),
                )
            )
            elk = local_rows_df(spark, 
                [(_basename(d["orig"]), d["seq"]) for d in dels],
                "__ebn string, __eseq long",
            )
            edel = edel.join(
                F.broadcast(elk), "__ebn", "inner"
            ).drop("__ebn")
            cond = F.col("__eseq") > F.col("d.__dseq")
            for c in cols:
                cond = cond & F.col(f"d.{c}").eqNullSafe(
                    F.col(f"__eq_{c}")
                )
            df = df.alias("d").join(edel, cond, "left_anti")

    out_cols = list(schema.fieldNames())
    if basename_col:
        # __bn was captured straight off the scan, before any join
        df = df.withColumn(basename_col, F.col("__bn"))
        out_cols.append(basename_col)
    if position_cols:
        df = df.withColumn(
            position_cols[0], F.col("__orig")
        ).withColumn(position_cols[1], F.col("__pos"))
        out_cols.extend(position_cols)
    return df.drop("__pos", "__orig", "__dseq", "__bn").select(
        *out_cols
    )


def read_iceberg_appends(
    spark: SparkSession,
    table_path: str,
    from_snapshot_id: int | None,
    to_snapshot_id: int,
) -> DataFrame:
    """Rows APPENDED by snapshots after ``from_snapshot_id`` up to and
    including ``to_snapshot_id`` — Iceberg's incremental append scan
    (the spec's ``incremental read``): per snapshot, the manifest
    entries with ``status == ADDED`` and that snapshot's id. A
    snapshot whose summary says ``overwrite`` (a merge) rewrote rows
    and is NOT an append stream, so it raises — the same honesty rule
    as ``read_delta_appends``. ``from_snapshot_id=None`` starts from
    the beginning of history."""
    from pyspark.sql import functions as F

    meta = load_table_metadata(table_path)
    schema = iceberg_spark_schema(meta)
    snaps = meta.get("snapshots") or []
    ids = [s["snapshot-id"] for s in snaps]
    if to_snapshot_id not in ids:
        raise ValueError(
            f"iceberg: snapshot {to_snapshot_id} not in table metadata"
        )
    # ancestry window, not list slice: unpublished WAP-branch
    # snapshots interleave the list but are not appends to main
    chain = iceberg_main_chain(meta, to_snapshot_id)
    cids = [s["snapshot-id"] for s in chain]
    start = 0
    if from_snapshot_id is not None:
        if from_snapshot_id not in cids:
            if from_snapshot_id in ids:
                raise ValueError(
                    f"iceberg: snapshot {from_snapshot_id} is not an "
                    f"ancestor of {to_snapshot_id} — no linear "
                    "append window between them"
                )
            raise ValueError(
                f"iceberg: snapshot {from_snapshot_id} not in table "
                "metadata"
            )
        start = cids.index(from_snapshot_id) + 1
    window = chain[start:]
    files: list[dict] = []
    for snap in window:
        op = (snap.get("summary") or {}).get("operation", "append")
        if op not in ("append",):
            raise ValueError(
                f"iceberg: snapshot {snap['snapshot-id']} is "
                f"{op!r}, not an append — no incremental append scan"
            )
        _, manifests = read_container(
            _localize(table_path, snap["manifest-list"])
        )
        for m in manifests:
            _, entries = read_container(
                _localize(table_path, m["manifest_path"])
            )
            for e in entries:
                if (
                    int(e.get("status") or 0) == 1  # ADDED
                    and e.get("snapshot_id") == snap["snapshot-id"]
                ):
                    df_ = e["data_file"]
                    files.append(
                        {
                            "path": _localize(
                                table_path, df_["file_path"]
                            ),
                            "orig": df_["file_path"],
                            "partition": dict(
                                df_.get("partition") or {}
                            ),
                            "spec_id": m.get("partition_spec_id"),
                        }
                    )
    if not files:
        return spark.createDataFrame([], schema)
    out = spark.read.schema(schema).parquet(
        *[d["path"] for d in files]
    )
    consts = _projection_consts(meta, files)
    if consts:
        out = out.select(
            "*",
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("__bn"),
        )
        out = _substitute_identity_consts(
            spark, out, consts, files, schema, "__bn"
        ).drop("__bn")
    return out


def _delete_entry_key(ent: dict) -> tuple:
    """Identity of a delete entry across snapshots: file path + seq,
    plus the blob offset for Puffin DVs (one sidecar can carry many
    blobs)."""
    dv = ent.get("dv")
    return (ent["orig"], ent["seq"], dv["offset"] if dv else None)


def _pos_delete_referenced_paths(
    pos_entries: list[dict],
) -> set[str] | None:
    """The data-file paths a set of positional-delete entries can
    touch: DV entries name theirs in the manifest; delete-parquet
    entries are read driver-side from their (small) files' file_path
    column. Returns None when any file cannot be enumerated (caller
    falls back to all-files-conservative)."""
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow is baked in
        return None
    refs: set[str] = set()
    for ent in pos_entries:
        dv = ent.get("dv")
        if dv:
            refs.add(dv["referenced"])
            continue
        path = ent["path"]
        local = path[7:] if path.startswith("file://") else path
        try:
            col = pq.read_table(local, columns=["file_path"])
        except Exception:
            return None
        refs.update(str(v) for v in col.column(0).to_pylist())
    return refs


# changelog windows cut lineage (localCheckpoint) once this many
# unioned pieces accumulate — each snapshot contributes at most two
_CHANGELOG_CHECKPOINT_EVERY = 16


def _eq_delete_key_ranges(
    eq_entries: list[dict], cols: list[str]
) -> list[dict | None]:
    """Per equality-delete entry, the key range its parquet FOOTER
    stats prove it can touch: ``{col: (min, max) | None}`` (None =
    no provable bound for that column → full range). Footer-only
    reads, no Spark job. An unreadable footer yields ``None`` for the
    whole entry (conservative: touches everything). Parquet truncated
    binary stats remain valid bounds (min truncated down, max
    incremented up), so pruning against them never loses a match."""
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow is baked in
        return [None] * len(eq_entries)
    out: list[dict | None] = []
    for ent in eq_entries:
        path = ent["path"]
        local = path[7:] if path.startswith("file://") else path
        try:
            md = pq.read_metadata(local)
        except Exception:
            out.append(None)
            continue
        names = list(md.schema.names)
        ranges: dict = {}
        for c in cols:
            if c not in names:
                ranges[c] = None
                continue
            ci = names.index(c)
            lo = hi = None
            ok = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            ranges[c] = (lo, hi) if ok and lo is not None else None
        out.append(ranges)
    return out


def _prune_eq_candidates(
    meta: dict, survivors: list[dict], new_eq: list[dict]
) -> list[dict]:
    """The surviving prior data files a set of NEW equality-delete
    files can actually shrink: sequence-gated (a delete applies only
    when its seq > the data file's) and bounds-pruned — a data file
    whose Appendix-D bounds for the equality columns are provably
    disjoint from every new delete file's footer-stat key range
    cannot lose a row. Undecodable bounds on either side keep the
    file (conservative). This is what makes the changelog's
    equality-delete branch O(files the keys touch), not O(table)."""
    fields = {
        f["name"]: f for f in _current_schema(meta)["fields"]
    }
    by_id = {int(f["id"]): f["name"] for f in fields.values()}

    # group the new delete entries by equality column set; resolve
    # each set's footer key ranges once
    groups: dict[tuple, list[dict]] = {}
    for e in new_eq:
        groups.setdefault(tuple(sorted(e["equality_ids"])), []).append(e)
    ranged: list[tuple[list[str], list[dict], list[dict | None]]] = []
    for ids, ents in groups.items():
        try:
            cols = [by_id[i] for i in ids]
        except KeyError:
            # unknown equality field: cannot reason about bounds
            return list(survivors)
        ranged.append((cols, ents, _eq_delete_key_ranges(ents, cols)))

    def _kv(pairs, key):
        for p in pairs or []:
            if int(p["key"]) == key:
                return p["value"]
        return None

    def _file_bounds(d: dict, col: str):
        f = fields.get(col)
        if f is None or not isinstance(f["type"], str):
            return None
        blo = _kv(d.get("lower_bounds"), int(f["id"]))
        bhi = _kv(d.get("upper_bounds"), int(f["id"]))
        if blo is None or bhi is None:
            return None
        try:
            vlo = decode_bound(f["type"], blo)
            vhi = decode_bound(f["type"], bhi)
        except Exception:
            return None
        if vlo is None or vhi is None:
            return None
        return (vlo, vhi)

    kept: list[dict] = []
    for d in survivors:
        touched = False
        for cols, ents, rngs in ranged:
            for ent, rng in zip(ents, rngs):
                if ent["seq"] <= d["seq"]:
                    continue  # sequence-gated: cannot apply
                if rng is None:
                    touched = True
                    break
                overlap = True
                for c in cols:
                    kr = rng.get(c)
                    fb = _file_bounds(d, c)
                    if kr is None or fb is None:
                        continue  # no provable bound: may overlap
                    try:
                        if kr[0] > fb[1] or kr[1] < fb[0]:
                            overlap = False
                            break
                    except TypeError:
                        continue  # incomparable types: keep
                if overlap:
                    touched = True
                    break
            if touched:
                break
        if touched:
            kept.append(d)
    return kept


def _eq_deleted_rows(
    spark: SparkSession,
    meta: dict,
    schema,
    candidates: list[dict],
    prev_pos: list[dict],
    prev_eq: list[dict],
    new_eq: list[dict],
) -> DataFrame | None:
    """Rows the NEW equality-delete files erase, computed DIRECTLY: the
    prior-state before-image of the candidate files (prior deletes
    applied — already-deleted rows never re-report) semi-joined
    against the new delete files' key sets, sequence-gated
    (``eseq > dseq``). One scan of the candidate files per equality
    column set — no full-table before/after ``exceptAll``. With
    several column sets, each set consumes the rows the earlier sets
    did not match, so a row matching two sets reports once."""
    from pyspark.sql import functions as F

    if not candidates or not new_eq:
        return None
    before = read_entries_with_deletes(
        spark,
        meta,
        schema,
        candidates,
        prev_pos,
        prev_eq,
        position_cols=("__cl_path", "__cl_pos"),
    ).drop("__cl_pos")
    slk = local_rows_df(spark, 
        [(d["orig"], d["seq"]) for d in candidates],
        "__cl_path string, __cl_dseq long",
    )
    before = before.join(F.broadcast(slk), "__cl_path", "inner").drop(
        "__cl_path"
    )
    return _eq_deleted_from_before(spark, meta, schema, before, new_eq)


def _eq_deleted_from_before(
    spark: SparkSession,
    meta: dict,
    schema,
    before: DataFrame,
    new_eq: list[dict],
) -> DataFrame:
    """The equality-delete semi-join core of :func:`_eq_deleted_rows`,
    over an already-built before-image carrying ``__cl_dseq`` (each
    row's data-file sequence) — reusable for rows whose before-image
    the positional branch already read."""
    from pyspark.sql import functions as F

    by_id = {
        int(f["id"]): f["name"] for f in _current_schema(meta)["fields"]
    }
    sets: dict[tuple, list[dict]] = {}
    for d in new_eq:
        ids = tuple(sorted(d["equality_ids"]))
        if not ids:
            raise NotImplementedError(
                "iceberg changelog: equality delete file without "
                "equality_ids"
            )
        sets.setdefault(ids, []).append(d)

    pieces: list[DataFrame] = []
    remaining = before
    items = sorted(sets.items())
    for si, (ids, dels) in enumerate(items):
        try:
            cols = [by_id[i] for i in ids]
        except KeyError as e:
            raise NotImplementedError(
                f"iceberg changelog: equality delete on unknown "
                f"field id {e}"
            ) from None
        eq_schema = T.StructType(
            [T.StructField(c, schema[c].dataType, True) for c in cols]
        )
        edel = (
            spark.read.schema(eq_schema)
            .parquet(*[d["path"] for d in dels])
            .select(
                *[F.col(c).alias(f"__eq_{c}") for c in cols],
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ).alias("__ebn"),
            )
        )
        elk = local_rows_df(spark, 
            [(_basename(d["orig"]), d["seq"]) for d in dels],
            "__ebn string, __eseq long",
        )
        edel = edel.join(F.broadcast(elk), "__ebn", "inner").drop(
            "__ebn"
        )
        cond = F.col("__eseq") > F.col("d.__cl_dseq")
        for c in cols:
            cond = cond & F.col(f"d.{c}").eqNullSafe(
                F.col(f"__eq_{c}")
            )
        pieces.append(
            remaining.alias("d").join(edel, cond, "left_semi")
        )
        if si + 1 < len(items):
            remaining = remaining.alias("d").join(
                edel, cond, "left_anti"
            )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.select(*schema.fieldNames())


def read_iceberg_changes(
    spark: SparkSession,
    table_path: str,
    from_snapshot_id: int | None = None,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Changelog scan — the row-level changes each snapshot after
    ``from_snapshot_id`` (exclusive; None = beginning of history) up
    to ``to_snapshot_id`` (inclusive; None = current) made to the
    table, as Iceberg's ``create_changelog_view`` emits them: the
    table columns plus ``_change_type`` (``INSERT`` / ``DELETE`` —
    an update appears as its DELETE pre-image + INSERT post-image),
    ``_change_ordinal`` (the snapshot's position in the window) and
    ``_commit_snapshot_id``. This is the Iceberg twin of Delta CDF
    (``read_delta_cdf``) computed the Iceberg way: there are no
    change files — changes derive from the MANIFEST DIFF between each
    snapshot and its predecessor, so only added/removed/delete-
    affected files are ever read:

    - ``append`` snapshots read just their added data files (with any
      same-snapshot deletes applied) as INSERTs.
    - ``delete`` snapshots (merge-on-read DML) evaluate only the NEW
      delete files against the prior state — positional/DV deletes
      prune to their referenced data files; equality deletes
      sequence-gate + bounds-prune candidate files against the delete
      files' footer key ranges and semi-join the keys directly (no
      full-table before/after); already-deleted rows never re-report
      (the before-image applies the prior deletes).
    - ``overwrite`` / ``rollback`` snapshots NET the two sides
      (``exceptAll`` both ways), so a copy-on-write rewrite that
      carries 990 of 1000 rows unchanged reports only the 10 real
      updates — carried rows cancel, matching the changelog
      procedure's update carve-out.
    - ``replace`` (compaction) snapshots are physical rewrites with
      no logical change and emit nothing.

    At 100 TB the manifest diff is the point: changelog IO is
    O(changed files per snapshot), never O(table)."""
    from pyspark.sql import functions as F

    meta = load_table_metadata(table_path)
    schema = iceberg_spark_schema(meta)
    snaps = meta.get("snapshots") or []
    ids = [s["snapshot-id"] for s in snaps]
    if to_snapshot_id is None:
        to_snapshot_id = meta.get("current-snapshot-id")
    if to_snapshot_id not in ids:
        raise ValueError(
            f"iceberg: snapshot {to_snapshot_id} not in table metadata"
        )
    # history = the main-ancestry chain ending at `to`, NOT list
    # order: snapshots staged on unpublished WAP branches live in the
    # list but are not changes until published
    chain = iceberg_main_chain(meta, to_snapshot_id)
    cids = [s["snapshot-id"] for s in chain]
    start = 0
    if from_snapshot_id is not None:
        if from_snapshot_id not in cids:
            if from_snapshot_id in ids:
                raise ValueError(
                    f"iceberg: snapshot {from_snapshot_id} is not an "
                    f"ancestor of {to_snapshot_id} — no linear "
                    "changelog window between them"
                )
            raise ValueError(
                f"iceberg: snapshot {from_snapshot_id} not in table "
                "metadata"
            )
        start = cids.index(from_snapshot_id) + 1
    window = chain[start:]

    def _tag(df: DataFrame, change: str, ordinal: int, sid: int):
        return df.select(
            *schema.fieldNames(),
            F.lit(change).alias("_change_type"),
            F.lit(ordinal).cast("int").alias("_change_ordinal"),
            F.lit(sid).cast("long").alias("_commit_snapshot_id"),
        )

    pieces: list[DataFrame] = []
    prev_id = cids[start - 1] if start > 0 else None
    prev_state = (
        _snapshot_entries(table_path, meta, prev_id)
        if prev_id is not None
        else ([], [], [])
    )
    for ordinal, snap in enumerate(window):
        s_id = snap["snapshot-id"]
        op = (snap.get("summary") or {}).get("operation", "append")
        cur_state = _snapshot_entries(table_path, meta, s_id)
        if op == "replace":
            # compaction: a physical rewrite, zero logical change
            prev_state = cur_state
            continue
        if op not in ("append", "delete", "overwrite", "rollback"):
            raise NotImplementedError(
                f"iceberg changelog: snapshot {s_id} operation "
                f"{op!r} is beyond this reader"
            )
        prev_d, prev_p, prev_e = prev_state
        cur_d, cur_p, cur_e = cur_state
        prev_orig = {e["orig"] for e in prev_d}
        cur_orig = {e["orig"] for e in cur_d}
        added_data = [e for e in cur_d if e["orig"] not in prev_orig]
        removed_data = [e for e in prev_d if e["orig"] not in cur_orig]
        prev_dkeys = {_delete_entry_key(e) for e in prev_p + prev_e}
        new_pos = [
            e for e in cur_p if _delete_entry_key(e) not in prev_dkeys
        ]
        new_eq = [
            e for e in cur_e if _delete_entry_key(e) not in prev_dkeys
        ]

        ins = (
            read_entries_with_deletes(
                spark, meta, schema, added_data, cur_p, cur_e
            )
            if added_data
            else None
        )

        # the files whose VISIBLE rows can have shrunk: removed files,
        # plus surviving files a new positional delete references
        # (equality deletes are evaluated DIRECTLY below — never via a
        # full-table before/after)
        # surviving files a new positional/DV delete references: their
        # erased rows are identified DIRECTLY by (path, pos) — one
        # read of the prior state semi-joined against the new delete
        # rows, never a before/after exceptAll (which read the same
        # files twice and paid two whole-row aggregation shuffles)
        pos_hit: list[dict] = []
        if new_pos:
            refs = _pos_delete_referenced_paths(new_pos)
            if refs is None:
                pos_hit = [
                    e for e in prev_d if e["orig"] in cur_orig
                ]
            else:
                pos_hit = [
                    e
                    for e in prev_d
                    if e["orig"] in cur_orig and e["orig"] in refs
                ]
        dels = None
        if removed_data:
            # files the snapshot removed outright: every visible prior
            # row is a delete pre-image (overwrite netting below
            # cancels the carried ones against the added files)
            dels = read_entries_with_deletes(
                spark, meta, schema, removed_data, prev_p, prev_e
            )
        rem_before = None  # pos-hit rows that survived the new deletes
        if pos_hit:
            before = read_entries_with_deletes(
                spark,
                meta,
                schema,
                pos_hit,
                prev_p,
                prev_e,
                position_cols=("__cl_path", "__cl_pos"),
            )
            slk = local_rows_df(spark, 
                [(d["orig"], d["seq"]) for d in pos_hit],
                "__cl_path string, __cl_dseq long",
            )
            before = before.join(
                F.broadcast(slk), "__cl_path", "inner"
            )
            pos_rows = _pos_delete_rows_df(spark, new_pos)
            cond = (
                (F.col("d.__cl_path") == F.col("x.file_path"))
                & (F.col("d.__cl_pos") == F.col("x.pos"))
                & (F.col("x.__pseq") >= F.col("d.__cl_dseq"))
            )
            hit_rows = before.alias("d").join(
                pos_rows.alias("x"), cond, "left_semi"
            )
            hit_rows = hit_rows.select(*schema.fieldNames())
            dels = (
                hit_rows
                if dels is None
                else dels.unionByName(hit_rows)
            )
            if new_eq:
                # rows the pos deletes did NOT erase are still
                # equality-delete candidates (their before-image is
                # already in hand — no second read)
                rem_before = (
                    before.alias("d")
                    .join(pos_rows.alias("x"), cond, "left_anti")
                    .drop("__cl_path", "__cl_pos")
                )
        if new_eq:
            # new equality deletes: evaluate the keys directly against
            # the prior state — candidate files are sequence-gated and
            # bounds-pruned against the delete files' footer key
            # ranges, then a seq-gated semi-join emits the erased
            # rows. IO stays O(files the keys touch), never O(table).
            # Files in `pos_hit` are covered via rem_before above.
            pos_hit_orig = {e["orig"] for e in pos_hit}
            survivors = [
                e
                for e in prev_d
                if e["orig"] in cur_orig
                and e["orig"] not in pos_hit_orig
            ]
            cand = _prune_eq_candidates(meta, survivors, new_eq)
            eq_dels = _eq_deleted_rows(
                spark, meta, schema, cand, prev_p, prev_e, new_eq
            )
            if rem_before is not None:
                eq_rem = _eq_deleted_from_before(
                    spark, meta, schema, rem_before, new_eq
                )
                eq_dels = (
                    eq_rem
                    if eq_dels is None
                    else eq_dels.unionByName(eq_rem)
                )
            if eq_dels is not None:
                dels = (
                    eq_dels
                    if dels is None
                    else dels.unionByName(eq_dels)
                )

        if op in ("overwrite", "rollback") and ins is not None \
                and dels is not None:
            # net the rewrite: rows a copy-on-write carried over
            # appear on both sides and cancel; real updates survive
            # as DELETE pre-image + INSERT post-image. Computed as ONE
            # signed-count aggregation rather than exceptAll both ways:
            # Catalyst rewrites each exceptAll to union+aggregate+
            # generate, so the pair evaluated the ins and dels subtrees
            # (full file reads + delete anti-joins) TWICE each; the
            # fused form reads each side once and one hash aggregate
            # yields both directions (net>0 = surviving INSERT copies,
            # net<0 = surviving DELETE copies — exactly the multiset
            # differences exceptAll defines).
            cols = schema.fieldNames()
            u = ins.select(
                *cols, F.lit(1).alias("__sgn")
            ).unionByName(
                dels.select(*cols, F.lit(-1).alias("__sgn"))
            )
            net = (
                u.groupBy(*cols)
                .agg(F.sum("__sgn").alias("__net"))
                .filter(F.col("__net") != 0)
            )
            pieces.append(
                net.select(
                    *cols,
                    F.when(F.col("__net") > 0, F.lit("INSERT"))
                    .otherwise(F.lit("DELETE"))
                    .alias("_change_type"),
                    F.lit(ordinal).cast("int").alias("_change_ordinal"),
                    F.lit(s_id).cast("long").alias(
                        "_commit_snapshot_id"
                    ),
                    F.explode(
                        F.array_repeat(
                            F.lit(1),
                            F.abs(F.col("__net")).cast("int"),
                        )
                    ).alias("__rep"),
                ).drop("__rep")
            )
            ins = dels = None
        if ins is not None:
            pieces.append(_tag(ins, "INSERT", ordinal, s_id))
        if dels is not None:
            pieces.append(_tag(dels, "DELETE", ordinal, s_id))
        # bound plan growth: a long-history window otherwise builds one
        # giant union/exceptAll chain whose analysis cost is linear in
        # snapshot count — cut lineage every K pieces so a
        # thousand-commit table stays plannable
        if len(pieces) >= _CHANGELOG_CHECKPOINT_EVERY:
            merged = pieces[0]
            for p in pieces[1:]:
                merged = merged.unionByName(p)
            pieces = [merged.localCheckpoint(eager=False)]
        prev_state = cur_state
        prev_id = s_id

    if not pieces:
        empty = spark.createDataFrame([], schema)
        return _tag(empty, "INSERT", 0, 0).limit(0)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Fixture writer: append-only v1 snapshots so the reader sees real bytes.

_MANIFEST_ENTRY_SCHEMA = {
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
                    # v3 row lineage: the id of the file's first row
                    # (spec data_file field 142); rows derive
                    # _row_id = first_row_id + position
                    {"name": "first_row_id", "type": ["null", "long"],
                     "default": None, "field-id": 142},
                ],
            },
        },
    ],
}

_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517,
         "default": 0},
        {"name": "added_snapshot_id", "type": ["null", "long"],
         "default": None, "field-id": 503},
        # v2: data-sequence number, inherited by the manifest's entries
        {"name": "sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 515},
        # v3 row lineage: the starting _row_id for rows added by this
        # manifest's ADDED files (null = inherit from the snapshot);
        # the row counts drive the manifest-level inheritance walk
        {"name": "added_rows_count", "type": ["null", "long"],
         "default": None, "field-id": 512},
        {"name": "existing_rows_count", "type": ["null", "long"],
         "default": None, "field-id": 513},
        {"name": "first_row_id", "type": ["null", "long"],
         "default": None, "field-id": 520},
    ],
}


def _preserve_manifest_lineage(
    table_path: str,
    prev_meta: dict,
    prior_manifests: list[dict],
    base_sid: int | None = None,
) -> None:
    """Spec v3 preservation rule (Row Lineage): a manifest row
    re-emitted into a NEW manifest list must carry its ASSIGNED
    ``first_row_id`` explicitly — inheritance is only defined under
    the snapshot that ADDED the manifest, so a null cannot survive
    into a later list without shifting every derived row id. Resolves
    in place (walking the previous snapshot's inheritance exactly like
    ``_snapshot_entries``); a no-op on non-lineage tables."""
    if prev_meta.get("next-row-id") is None:
        return
    sid = (
        base_sid if base_sid is not None
        else prev_meta.get("current-snapshot-id")
    )
    snap = next(
        (
            s
            for s in prev_meta.get("snapshots") or []
            if s["snapshot-id"] == sid
        ),
        None,
    )
    first = snap.get("first-row-id") if snap else None
    running = int(first) if first is not None else None
    for m in prior_manifests:
        if int(m.get("content") or 0) != 0:
            continue
        if m.get("first_row_id") is not None or running is None:
            continue
        m["first_row_id"] = running
        a = m.get("added_rows_count")
        x = m.get("existing_rows_count")
        if a is not None and x is not None:
            running += int(a) + int(x)
        else:
            _, entries = read_container(
                _localize(table_path, m["manifest_path"])
            )
            running += sum(
                int(e["data_file"].get("record_count") or 0)
                for e in entries
                if int(e.get("status") or 0) != _STATUS_DELETED
                and int(e["data_file"].get("content") or 0) == 0
            )

# delete-manifest entries (v2): data_file carries content (1 =
# position deletes, 2 = equality deletes) and equality_ids
_DELETE_ENTRY_SCHEMA = {
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
                    {"name": "content", "type": "int", "field-id": 134},
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
                    # v3 deletion-vector reference (null on v2
                    # delete-parquet entries)
                    {"name": "referenced_data_file",
                     "type": ["null", "string"],
                     "default": None, "field-id": 143},
                    {"name": "content_offset",
                     "type": ["null", "long"],
                     "default": None, "field-id": 144},
                    {"name": "content_size_in_bytes",
                     "type": ["null", "long"],
                     "default": None, "field-id": 145},
                ],
            },
        },
    ],
}


def make_lineage_inherited(table_path: str) -> None:
    """FIXTURE TRANSFORMER: rewrite a row-lineage table this module's
    writer produced into the INHERITANCE-RELIANT layout foreign v3
    writers (iceberg-java) produce — data-file entries carry NULL
    ``first_row_id``, and each snapshot's manifest list carries an
    EXPLICIT (preserved) ``first_row_id`` for manifests added by
    earlier snapshots and NULL plus ``added_rows_count`` /
    ``existing_rows_count`` for the manifests that snapshot added.
    Reading the result exercises the spec's first_row_id inheritance
    rule (Iceberg spec v3, Row Lineage) end-to-end; the derived ids
    must equal the pre-transformation explicit ones."""
    from optimus_any2any_spark.formats.avrobin import write_container

    meta = load_table_metadata(table_path)
    if meta.get("next-row-id") is None:
        raise ValueError(
            "make_lineage_inherited: not a row-lineage table "
            "(no next-row-id)"
        )
    mls = [
        (s, _localize(table_path, s["manifest-list"]))
        for s in meta.get("snapshots") or []
        if s.get("manifest-list")
    ]
    # pass 1: record each data manifest's ASSIGNED first_row_id (the
    # min of its explicit entry values — this writer assigns them
    # contiguously in entry order) and its added-row total, then null
    # the entries so readers must re-derive by inheritance.
    assigned: dict[str, int] = {}
    added_rows: dict[str, int] = {}
    seen: set[str] = set()
    for _s, ml_path in mls:
        _, manifests = read_container(ml_path)
        for m in manifests:
            mp = m["manifest_path"]
            if int(m.get("content") or 0) != 0 or mp in seen:
                continue
            seen.add(mp)
            local = _localize(table_path, mp)
            schema, entries = read_container(local)
            firsts, rows = [], 0
            for e in entries:
                if int(e.get("status") or 0) == _STATUS_DELETED:
                    continue
                df_ = e["data_file"]
                if int(df_.get("content") or 0) != 0:
                    continue
                rows += int(df_.get("record_count") or 0)
                if df_.get("first_row_id") is not None:
                    firsts.append(int(df_["first_row_id"]))
                df_["first_row_id"] = None
            if not firsts:
                continue
            assigned[mp] = min(firsts)
            added_rows[mp] = rows
            write_container(local, schema, entries)
    # pass 2: manifest lists — a manifest the snapshot itself added
    # goes NULL (readers inherit from the snapshot's first-row-id),
    # a prior manifest keeps its assigned value explicitly (the
    # spec's preservation rule for rewritten manifest lists).
    for s, ml_path in mls:
        schema, manifests = read_container(ml_path)
        names = {f["name"] for f in schema["fields"]}
        for nm, fid in (
            ("added_rows_count", 512),
            ("existing_rows_count", 513),
            ("first_row_id", 520),
        ):
            if nm not in names:
                schema["fields"].append(
                    {"name": nm, "type": ["null", "long"],
                     "default": None, "field-id": fid}
                )
        for m in manifests:
            mp = m["manifest_path"]
            m.setdefault("added_rows_count", None)
            m.setdefault("existing_rows_count", None)
            m.setdefault("first_row_id", None)
            if int(m.get("content") or 0) != 0 or mp not in assigned:
                continue
            if m.get("added_snapshot_id") == s["snapshot-id"]:
                m["first_row_id"] = None
                m["added_rows_count"] = added_rows[mp]
                m["existing_rows_count"] = 0
            else:
                m["first_row_id"] = assigned[mp]
        write_container(ml_path, schema, manifests)


def write_iceberg_delete_commit(
    spark: SparkSession,
    table_path: str,
    pos_deletes: list[tuple[str, int]] | None = None,
    eq_deletes: tuple[list[str], list[tuple]] | None = None,
    dv_deletes: dict[str, list[int]] | None = None,
) -> int:
    """Append one ROW-LEVEL-DELETE snapshot (fixture surface, like
    ``write_iceberg_commit``): positional deletes are ``(data-file
    path as listed in the manifests, row position)`` rows in a delete
    parquet; equality deletes are rows over the named columns with the
    spec's ``equality_ids``. The commit stamps a data-sequence number
    on its manifest-list row (v2 inheritance), and upgrades the table
    metadata to format-version 2 — exercising ``read_iceberg``'s
    merge-on-read path against real table bytes.

    ``dv_deletes`` maps a data file's manifest-listed path to its
    deleted row positions, written as format-v3 DELETION VECTORS: one
    Puffin file carrying one ``deletion-vector-v1`` blob per
    referenced file, manifest entries with ``referenced_data_file`` /
    ``content_offset`` / ``content_size_in_bytes``, and the table
    metadata tagged format-version 3 (VERDICT r8 item 9)."""
    from pyspark.sql import functions as F  # noqa: F401

    md = _meta_dir(table_path)
    hint = os.path.join(md, "version-hint.text")
    prev_version = int(open(hint).read().strip())
    prev = load_table_metadata(table_path, version=prev_version)
    _refuse_unpublished_branches(prev)
    version = prev_version + 1
    snapshot_id = version
    seq = version

    entries = []
    os.makedirs(os.path.join(table_path, "data"), exist_ok=True)
    if pos_deletes:
        pdf = local_rows_df(spark, 
            list(pos_deletes), "file_path string, pos long"
        ).orderBy("file_path", "pos")
        tmp = os.path.join(table_path, f"_tmp-del-v{version}")
        pdf.coalesce(1).write.mode("overwrite").parquet(tmp)
        rel = f"data/{version:05d}-delete-pos.parquet"
        os.replace(
            _glob.glob(os.path.join(tmp, "part-*.parquet"))[0],
            os.path.join(table_path, rel),
        )
        shutil.rmtree(tmp)
        entries.append(
            {
                "status": 1,
                "snapshot_id": snapshot_id,
                "data_file": {
                    "content": 1,
                    "file_path": rel,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": len(pos_deletes),
                    "file_size_in_bytes": os.path.getsize(
                        os.path.join(table_path, rel)
                    ),
                    "equality_ids": None,
                },
            }
        )
    if eq_deletes:
        cols, rows = eq_deletes
        sch = _current_schema(prev)
        id_of = {f["name"]: int(f["id"]) for f in sch["fields"]}
        missing = [c for c in cols if c not in id_of]
        if missing:
            raise ValueError(
                f"iceberg delete fixture: columns {missing} not in "
                "the schema"
            )
        spark_schema = iceberg_spark_schema(prev)
        edf = local_rows_df(spark, 
            list(rows),
            T.StructType(
                [
                    T.StructField(c, spark_schema[c].dataType, True)
                    for c in cols
                ]
            ),
        )
        tmp = os.path.join(table_path, f"_tmp-edel-v{version}")
        edf.coalesce(1).write.mode("overwrite").parquet(tmp)
        rel = f"data/{version:05d}-delete-eq.parquet"
        os.replace(
            _glob.glob(os.path.join(tmp, "part-*.parquet"))[0],
            os.path.join(table_path, rel),
        )
        shutil.rmtree(tmp)
        entries.append(
            {
                "status": 1,
                "snapshot_id": snapshot_id,
                "data_file": {
                    "content": 2,
                    "file_path": rel,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": len(rows),
                    "file_size_in_bytes": os.path.getsize(
                        os.path.join(table_path, rel)
                    ),
                    "equality_ids": [id_of[c] for c in cols],
                },
            }
        )
    if dv_deletes:
        from optimus_any2any_spark.formats.puffin import (
            DV_V1,
            dv_puffin_blob,
            write_puffin,
        )

        rel = f"data/{version:05d}-delete-dv.puffin"
        blobs = [
            (
                dv_puffin_blob(positions),
                {
                    "type": DV_V1,
                    "fields": [],
                    "snapshot-id": snapshot_id,
                    "sequence-number": seq,
                    "properties": {
                        "referenced-data-file": ref,
                        "cardinality": str(len(set(positions))),
                    },
                },
            )
            for ref, positions in sorted(dv_deletes.items())
        ]
        rows = write_puffin(os.path.join(table_path, rel), blobs)
        fsize = os.path.getsize(os.path.join(table_path, rel))
        for row in rows:
            entries.append(
                {
                    "status": 1,
                    "snapshot_id": snapshot_id,
                    "data_file": {
                        "content": 1,
                        "file_path": rel,
                        "file_format": "PUFFIN",
                        "partition": {},
                        "record_count": int(
                            row["properties"]["cardinality"]
                        ),
                        "file_size_in_bytes": fsize,
                        "equality_ids": None,
                        "referenced_data_file": row["properties"][
                            "referenced-data-file"
                        ],
                        "content_offset": row["offset"],
                        "content_size_in_bytes": row["length"],
                    },
                }
            )
    if not entries:
        return prev_version

    manifest_rel = (
        f"metadata/{uuid.uuid5(uuid.NAMESPACE_URL, f'{table_path}|dm{version}')}"
        "-m0.avro"
    )
    write_container(
        os.path.join(table_path, manifest_rel),
        _DELETE_ENTRY_SCHEMA,
        entries,
    )
    prior_manifests: list[dict] = []
    if prev.get("current-snapshot-id") not in (None, -1):
        snap = next(
            sn
            for sn in prev["snapshots"]
            if sn["snapshot-id"] == prev["current-snapshot-id"]
        )
        _, prior_manifests = read_container(
            _localize(table_path, snap["manifest-list"])
        )
    for r in prior_manifests:
        r.setdefault("sequence_number", None)
    _preserve_manifest_lineage(table_path, prev, prior_manifests)
    ml_rel = (
        f"metadata/snap-{snapshot_id}-1-"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'{table_path}|dml{version}')}.avro"
    )
    write_container(
        os.path.join(table_path, ml_rel),
        _MANIFEST_FILE_SCHEMA,
        prior_manifests
        + [
            {
                "manifest_path": manifest_rel,
                "manifest_length": os.path.getsize(
                    os.path.join(table_path, manifest_rel)
                ),
                "partition_spec_id": 0,
                "content": 1,
                "added_snapshot_id": snapshot_id,
                "sequence_number": seq,
            }
        ],
    )
    meta = dict(prev)
    # row-level deletes need v2; deletion vectors are a v3 construct
    meta["format-version"] = max(
        3 if dv_deletes else 2, int(prev.get("format-version", 1))
    )
    meta["last-sequence-number"] = seq
    ts_ms = snapshot_timestamp_ms(prev)
    meta["snapshots"] = (prev.get("snapshots") or []) + [
        {
            "snapshot-id": snapshot_id,
            "timestamp-ms": ts_ms,
            "sequence-number": seq,
            "manifest-list": ml_rel,
            "summary": {"operation": "delete"},
        }
    ]
    append_snapshot_log(meta, prev, ts_ms, snapshot_id)
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


def _spark_type_to_iceberg(dt: T.DataType) -> str:
    m = {
        T.BooleanType(): "boolean",
        T.IntegerType(): "int",
        T.LongType(): "long",
        T.FloatType(): "float",
        T.DoubleType(): "double",
        T.DateType(): "date",
        T.StringType(): "string",
        T.BinaryType(): "binary",
        T.TimestampType(): "timestamptz",
        T.TimestampNTZType(): "timestamp",
    }
    if dt in m:
        return m[dt]
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    raise NotImplementedError(f"iceberg fixture writer: type {dt}")


def _chain_authoritative(meta: dict) -> bool:
    """True when EVERY snapshot except the list head carries a
    ``parent-snapshot-id`` — then the parent walk is the table's real
    history and list order is just storage. Legacy tables written
    before parent stamping (their merge/DML snapshots carry no
    pointer) are NOT authoritative: for them list order remains
    history and the WAP discipline stays single-flight.

    Tables CREATED by this writer carry ``optimus.parent-stamped``
    in their properties and are authoritative by construction — the
    structural heuristic below cannot tell a legitimate second
    genesis (the first MAIN commit after a branch-first bootstrap,
    which per spec has no parent) from a legacy unstamped snapshot,
    and would demote such a table to list-order history, leaking the
    unpublished branch into changelog/stream windows."""
    props = meta.get("properties") or {}
    if str(props.get("optimus.parent-stamped", "")).lower() == "true":
        return True
    snaps = meta.get("snapshots") or []
    return all(
        s.get("parent-snapshot-id") is not None for s in snaps[1:]
    )


def iceberg_main_chain(
    meta: dict, head: int | None = None
) -> list[dict]:
    """The snapshots that ARE history up to ``head`` (default: the
    main head), oldest→newest. On an authoritative table this is the
    ``parent-snapshot-id`` ancestor walk — snapshots staged on
    unpublished WAP branches (or orphaned by a dropped branch) are in
    the LIST but not on the chain, and every changelog/stream/appends
    window must skip them. The walk ends at the genesis or at a
    parent expired out of the metadata (history before that point is
    gone — same contract as snapshot expiration). Legacy tables fall
    back to the list prefix ending at ``head``, which under their
    single-flight discipline is identical."""
    snaps = meta.get("snapshots") or []
    if head is None:
        head = meta.get("current-snapshot-id")
    if head is None or head == -1 or not snaps:
        return []
    by_id = {s["snapshot-id"]: s for s in snaps}
    if head not in by_id:
        raise ValueError(
            f"iceberg: snapshot {head} not in table metadata"
        )
    if not _chain_authoritative(meta):
        ids = [s["snapshot-id"] for s in snaps]
        return snaps[: ids.index(head) + 1]
    chain: list[dict] = []
    sid, seen = head, set()
    while sid is not None and sid in by_id and sid not in seen:
        seen.add(sid)
        chain.append(by_id[sid])
        sid = by_id[sid].get("parent-snapshot-id")
    return list(reversed(chain))


def _refuse_unpublished_branches(
    meta: dict | None, allow: str | None = None
) -> None:
    """WAP staging discipline. On an AUTHORITATIVE table (every
    snapshot parent-stamped) this is a no-op: readers window by the
    main-ancestry chain, so any number of branches can stage
    concurrently and main can advance while they do — nothing
    unpublished ever reaches a stream. On a LEGACY table (pre-stamp
    merge snapshots, where list order is history) the single-flight
    rule stands: while a branch ref points at commits main has not
    published, a main-advancing write or a second branch would leak
    into stream history. ``allow`` names the one branch being written
    or published. Refuse by name; publish_iceberg_branch (or
    drop_iceberg_ref) clears it."""
    if not meta:
        return
    if _chain_authoritative(meta):
        return
    refs = meta.get("refs") or {}
    cur = meta.get("current-snapshot-id")
    ids = [s["snapshot-id"] for s in meta.get("snapshots") or []]
    cpos = ids.index(cur) if cur in ids else -1
    for name, r in refs.items():
        if name == "main" or (r.get("type") or "branch") != "branch":
            continue
        if allow is not None and name == allow:
            continue
        sid = r.get("snapshot-id")
        if sid in ids and ids.index(sid) > cpos:
            raise ValueError(
                f"iceberg: branch {name!r} has unpublished commits — "
                "publish_iceberg_branch (or drop_iceberg_ref) before "
                "writing to main or another branch"
            )


def _apply_write_defaults(df: DataFrame, prev: dict) -> DataFrame:
    """v3 ``write-default``: a df omitting a defaulted column appends
    with the default MATERIALIZED (the spec's writer contract — the
    new files physically contain the value, so readers never confuse
    it with ``initial-default``, which fills only pre-evolution
    files). Columns the df does supply pass through untouched."""
    from pyspark.sql import functions as F

    cur = _current_schema(prev)
    missing = [
        f
        for f in cur["fields"]
        if f.get("write-default") is not None
        and f["name"] not in df.columns
    ]
    if not missing:
        return df
    for f in missing:
        v = _default_value_of(f["type"], f["write-default"])
        df = df.withColumn(
            f["name"],
            F.lit(v).cast(_iceberg_type_to_spark(f["type"])),
        )
    order = [
        f["name"] for f in cur["fields"] if f["name"] in df.columns
    ]
    extras = [c for c in df.columns if c not in order]
    return df.select(*order, *extras)


def _hive_partition_values(
    path: str, part_fields: list[tuple[str, str, str]]
) -> dict[str, object]:
    """Identity partition values of one hive-layout file, derived from
    its ``src=value`` directory segments (Spark's ``add_files``
    procedure does the same walk). ``__HIVE_DEFAULT_PARTITION__`` is
    hive's null marker; values are percent-decoded (hive escapes
    ``/``, ``=`` etc. in partition values) and parsed to the source
    column's Iceberg type — unparseable values refuse rather than
    registering a tuple that disagrees with the path."""
    from urllib.parse import unquote

    segs: dict[str, str] = {}
    for seg in os.path.dirname(os.path.abspath(path)).split(os.sep):
        if "=" in seg:
            k, _, v = seg.partition("=")
            segs[k] = unquote(v)
    out: dict[str, object] = {}
    for pname, src, t in part_fields:
        if src not in segs:
            raise ValueError(
                f"iceberg add_files: file {path!r} has no "
                f"'{src}=...' path segment for the table's identity "
                "partition field"
            )
        raw = segs[src]
        if raw == "__HIVE_DEFAULT_PARTITION__":
            out[pname] = None
            continue
        try:
            if t in ("int", "long"):
                out[pname] = int(raw)
            elif t in ("float", "double"):
                out[pname] = float(raw)
            elif t == "boolean":
                if raw.lower() not in ("true", "false"):
                    raise ValueError(raw)
                out[pname] = raw.lower() == "true"
            elif t == "date":
                import datetime as _dt

                out[pname] = (
                    _dt.date.fromisoformat(raw)
                    - _dt.date(1970, 1, 1)
                ).days  # Avro physical form: int days-from-epoch
            elif t in ("timestamp", "timestamptz"):
                import datetime as _dt

                # Spark hive layouts render timestamps as
                # 'yyyy-MM-dd HH:mm:ss[.ffffff]' (tz-free wall
                # clock; the UTC-pinned session makes timestamptz
                # values UTC instants). Physical form: long micros.
                dt = _dt.datetime.fromisoformat(raw)
                if dt.tzinfo is not None:
                    dt = dt.astimezone(_dt.timezone.utc).replace(
                        tzinfo=None
                    )
                d = dt - _dt.datetime(1970, 1, 1)
                out[pname] = (
                    d.days * 86_400_000_000
                    + d.seconds * 1_000_000
                    + d.microseconds
                )  # exact integer micros, no float round-trip
            else:
                out[pname] = raw
        except ValueError:
            raise ValueError(
                f"iceberg add_files: cannot parse path value "
                f"{src}={raw!r} as iceberg {t}"
            ) from None
    return out


def write_iceberg_commit(
    df: DataFrame,
    table_path: str,
    partition_by: list[str] | None = None,
    row_lineage: bool = False,
    branch: str | None = None,
    add_files: list[str] | None = None,
    add_partition_schema: list[str] | None = None,
) -> int:
    """Append one snapshot in the v1 HadoopCatalog layout; returns the
    new metadata version. Unpartitioned data, append-only — enough
    surface to exercise every branch of the reader against real table
    bytes. ``partition_by`` (empty first commit only) declares an
    IDENTITY partition spec in the table metadata — the bootstrap for
    ``merge_iceberg_batch``'s partitioned tables, which write the
    actual partition-grouped files and manifest partition tuples.

    ``row_lineage=True`` (or appending to a table that already
    carries ``next-row-id``) maintains v3 ROW LINEAGE: every added
    data entry gets an explicit ``first_row_id`` (this snapshot's
    ``first-row-id`` plus the running record count of the files
    before it), the metadata's ``next-row-id`` advances by the total
    added records, and the format version floors at 3. Row-id
    assignment is pure driver bookkeeping over the record counts the
    commit already collects — zero extra jobs.

    ``branch="name"`` is the WRITE half of WAP (write-audit-publish,
    Iceberg's spark.wap.branch): the snapshot appends on top of the
    BRANCH head (created from the main head on first use), the
    ``refs`` map advances the branch, and ``current-snapshot-id`` /
    ``refs.main`` stay put — main readers see nothing until
    ``publish_iceberg_branch`` fast-forwards. While a branch has
    unpublished commits, main-advancing writers refuse by name
    (single-flight WAP discipline keeps the snapshot list a linear
    history, which the changelog/stream readers rely on)."""
    from optimus_any2any_spark.sources.iceberg_transforms import (
        parse_spec_item,
        partition_field_name,
    )

    spark = df.sparkSession
    parsed_spec: list[tuple[str, str]] = []
    if add_partition_schema and add_files is None:
        raise ValueError(
            "iceberg commit: add_partition_schema only applies to "
            "add_files registration"
        )
    if partition_by:
        if not df.isEmpty():
            raise NotImplementedError(
                "iceberg fixture writer: partition_by is the empty-"
                "table bootstrap only; data commits into a partitioned "
                "table go through merge_iceberg_batch"
            )
        # items are bare columns (identity) or the DDL transform
        # forms: days(ts), hours(ts), bucket(16, k), truncate(3, v)
        parsed_spec = [parse_spec_item(s) for s in partition_by]
        missing = [
            src for _, src in parsed_spec if src not in df.columns
        ]
        if missing:
            raise ValueError(
                f"iceberg fixture writer: partition columns {missing} "
                "not in the schema"
            )
    md = _meta_dir(table_path)
    os.makedirs(os.path.join(table_path, "data"), exist_ok=True)
    os.makedirs(md, exist_ok=True)
    hint = os.path.join(md, "version-hint.text")
    prev_version = (
        int(open(hint).read().strip()) if os.path.exists(hint) else 0
    )
    prev = (
        load_table_metadata(table_path, version=prev_version)
        if prev_version
        else None
    )
    if prev is not None and add_files is None:
        # v3 write-default: fill columns the df omits BEFORE the data
        # write, so the new files physically carry the value
        df = _apply_write_defaults(df, prev)
    version = prev_version + 1
    snapshot_id = version  # deterministic, unique per commit
    # v2 tables (anything that has taken a row-level delete) must NOT
    # be silently downgraded by an append: preserve the format
    # version, keep the sequence chain monotone, and stamp the new
    # snapshot's sequence-number so it outranks existing deletes
    # (v2 sequence inheritance — a re-inserted row stays alive)
    fmt = int(prev.get("format-version", 1)) if prev else 1
    seq = (
        max(int(prev.get("last-sequence-number", 0)), prev_version) + 1
        if prev is not None
        else version
    )

    # 1. data files. ``add_files`` is the METADATA-ONLY registration
    # path (Spark's add_files procedure / the migration story at
    # scale): existing parquet files enter the table as absolute-path
    # entries with footer-read record counts — zero data movement,
    # zero Spark jobs.
    add_part_fields: list[tuple[str, str, str]] = []  # (pname, src, type)
    if add_files is not None:
        import pyarrow.parquet as _pq

        from optimus_any2any_spark.streaming.iceberg_table import (
            _AVRO_PRIM,
        )

        if partition_by:
            raise NotImplementedError(
                "iceberg add_files: partition_by is the empty-df "
                "bootstrap — declare hive partition columns with "
                "add_partition_schema instead"
            )
        if prev is not None:
            if add_partition_schema:
                raise ValueError(
                    "iceberg add_files: add_partition_schema is the "
                    "fresh-table bootstrap only — an existing table "
                    "already declares its spec"
                )
            dspec = next(
                (
                    s
                    for s in prev.get("partition-specs") or []
                    if s.get("spec-id")
                    == int(prev.get("default-spec-id", 0))
                ),
                None,
            )
            if dspec and dspec.get("fields"):
                # partitioned registration: values derive from the
                # files' hive path segments, so only IDENTITY fields
                # (whose value IS the path value) are derivable
                by_fid = {
                    int(f["id"]): f
                    for f in _current_schema(prev)["fields"]
                }
                for pf in dspec["fields"]:
                    tr = str(pf.get("transform") or "")
                    if tr != "identity":
                        raise NotImplementedError(
                            "iceberg add_files: partition transform "
                            f"{tr!r} cannot be derived from a hive "
                            "path — identity specs only"
                        )
                    src = by_fid.get(int(pf["source-id"]))
                    if (
                        src is None
                        or not isinstance(src["type"], str)
                        or (
                            src["type"] not in _AVRO_PRIM
                            and src["type"]
                            not in ("date", "timestamp", "timestamptz")
                        )
                    ):
                        raise NotImplementedError(
                            "iceberg add_files: partition source "
                            f"type {(src or {}).get('type')!r} is "
                            "beyond the identity registration"
                        )
                    add_part_fields.append(
                        (
                            pf.get("name") or src["name"],
                            src["name"],
                            src["type"],
                        )
                    )
        elif add_partition_schema:
            # fresh-table bootstrap of an identity-partitioned table
            # from a hive layout: '"col type"' items, like
            # convert_parquet_to_delta's partition schema
            for item in add_partition_schema:
                toks = item.strip().split()
                if len(toks) != 2:
                    raise ValueError(
                        "iceberg add_files: add_partition_schema "
                        f"item {item!r} is not 'name type'"
                    )
                nm, t = toks
                if t not in _AVRO_PRIM and t not in (
                    "date", "timestamp", "timestamptz"
                ):
                    raise NotImplementedError(
                        "iceberg add_files: partition type "
                        f"{t!r} is beyond the identity registration "
                        f"({sorted(_AVRO_PRIM) + ['date', 'timestamp', 'timestamptz']})"
                    )
                add_part_fields.append((nm, nm, t))
        data_rel = []
        counts = {}
        add_pvals: dict[str, dict[str, object]] = {}  # basename → tuple
        # collision guard spans the files ALREADY in the table too:
        # stats/delete joins key files by basename, so a second
        # add_files call bringing a same-named file from another
        # directory would cross-apply deletions
        seen_bn: set[str] = set()
        if prev is not None:
            pdata, _ppd, _ped = _snapshot_entries(table_path, prev)
            seen_bn.update(
                d["orig"].rsplit("/", 1)[-1] for d in pdata
            )
        for f in add_files:
            ap = os.path.abspath(f)
            bn = os.path.basename(ap)
            if bn in seen_bn:
                raise NotImplementedError(
                    "iceberg add_files: the basename "
                    f"{bn!r} is already registered (or repeated in "
                    "this call) — stats/delete joins key by basename"
                )
            seen_bn.add(bn)
            data_rel.append(ap)
            counts[bn] = int(_pq.read_metadata(ap).num_rows)
            if add_part_fields:
                add_pvals[bn] = _hive_partition_values(
                    ap, add_part_fields
                )
    else:
        tmp = os.path.join(table_path, f"_tmp-ice-v{version}")
        df.write.mode("overwrite").parquet(tmp)
        data_rel = []
        for i, part in enumerate(
            sorted(_glob.glob(os.path.join(tmp, "part-*.parquet")))
        ):
            rel = f"data/{version:05d}-{i:04d}.parquet"
            os.replace(part, os.path.join(table_path, rel))
            data_rel.append(rel)
        shutil.rmtree(tmp)
        # per-file row counts come from the parquet FOOTERS (pyarrow,
        # driver-side, O(footer) I/O) — the old shape re-read every
        # just-written file through Spark (a schema-INFERENCE job plus
        # a full groupBy(input_file_name) scan, i.e. O(written bytes)
        # of extra read per commit; the add_files branch above always
        # used footers). Only record_count feeds the manifest entries.
        import pyarrow.parquet as _wpq

        counts = {
            os.path.basename(r): int(
                _wpq.read_metadata(
                    os.path.join(table_path, r)
                ).num_rows
            )
            for r in data_rel
        }
    # an empty frame (e.g. the partitioned-table bootstrap) still
    # writes one zero-row part file — drop it rather than listing a
    # rowless entry in the manifest
    empty = [r for r in data_rel if counts[os.path.basename(r)] == 0]
    for r in empty:
        if add_files is None:  # registered foreign files are NOT ours
            os.remove(os.path.join(table_path, r))
    data_rel = [r for r in data_rel if r not in empty]

    # 2. manifest for this snapshot's added files
    lineage = row_lineage or (
        prev is not None and prev.get("next-row-id") is not None
    )
    snap_first_row = None
    first_row_base = None
    if lineage:
        if prev is not None and prev.get("next-row-id") is None:
            # v3 UPGRADE of a table that already holds rows: this
            # snapshot assigns ids to EVERY existing row via the
            # spec's inheritance walk (the prior manifests, still
            # null, consume 0..E-1 in manifest-list order under this
            # snapshot's first-row-id = 0), so the NEW files' explicit
            # ids must start at E — starting them at 0 would collide
            # with the inherited ids.
            data0, _pd0, _ed0 = _snapshot_entries(table_path, prev)
            existing_rows = sum(
                int(d.get("record_count") or 0) for d in data0
            )
            snap_first_row = 0
            first_row_base = existing_rows
        else:
            snap_first_row = (
                int(prev.get("next-row-id", 0))
                if prev is not None
                else 0
            )
            first_row_base = snap_first_row
    next_row_id = first_row_base
    manifest_rel = f"metadata/{uuid.uuid5(uuid.NAMESPACE_URL, f'{table_path}|m{version}')}-m0.avro"
    entries = []
    for rel in data_rel:
        dfe = {
            "file_path": rel,
            "file_format": "PARQUET",
            "partition": (
                add_pvals.get(os.path.basename(rel), {})
                if add_part_fields
                else {}
            ),
            "record_count": int(counts[os.path.basename(rel)]),
            "file_size_in_bytes": os.path.getsize(
                os.path.join(table_path, rel)
            ),
        }
        if lineage:
            # explicit per-entry assignment (the spec allows writers
            # to skip manifest-level inheritance)
            dfe["first_row_id"] = next_row_id
            next_row_id += int(counts[os.path.basename(rel)])
        entries.append(
            {
                "status": 1,  # ADDED
                "snapshot_id": snapshot_id,
                "data_file": dfe,
            }
        )
    if add_part_fields:
        from optimus_any2any_spark.streaming.iceberg_table import (
            manifest_entry_schema,
        )

        from optimus_any2any_spark.sources.iceberg_transforms import (
            avro_type_of_result as _avro_t,
        )

        add_manifest_schema = manifest_entry_schema(
            # logical types ride as their Avro physical form (date →
            # int days, timestamps → long micros), same mapping as
            # the transform writers
            [(pn, _avro_t(t)) for pn, _src, t in add_part_fields]
        )
    else:
        add_manifest_schema = _MANIFEST_ENTRY_SCHEMA
    write_container(
        os.path.join(table_path, manifest_rel),
        add_manifest_schema,
        entries,
    )

    # 3. manifest list = BASE snapshot's manifests + the new one.
    # The base is the branch head for WAP writes, else the main head.
    base_sid = None
    if prev is not None:
        base_sid = prev.get("current-snapshot-id")
        if base_sid == -1:
            base_sid = None
        if branch is not None:
            _refuse_unpublished_branches(prev, allow=branch)
            r = (prev.get("refs") or {}).get(branch)
            if r is not None:
                if (r.get("type") or "branch") != "branch":
                    raise ValueError(
                        f"iceberg append: ref {branch!r} is a tag, "
                        "not a branch"
                    )
                base_sid = r.get("snapshot-id")
        else:
            _refuse_unpublished_branches(prev)
    prior_manifests: list[dict] = []
    if prev is not None and base_sid is not None:
        snap = next(
            s
            for s in prev["snapshots"]
            if s["snapshot-id"] == base_sid
        )
        _, prior_manifests = read_container(
            _localize(table_path, snap["manifest-list"])
        )
    ml_rel = f"metadata/snap-{snapshot_id}-1-{uuid.uuid5(uuid.NAMESPACE_URL, f'{table_path}|ml{version}')}.avro"
    new_entry = {
        "manifest_path": manifest_rel,
        "manifest_length": os.path.getsize(
            os.path.join(table_path, manifest_rel)
        ),
        # a partitioned registration's entries live under the table's
        # default spec (readers key the constants map off this id)
        "partition_spec_id": (
            int(prev.get("default-spec-id", 0))
            if prev is not None and add_part_fields
            else 0
        ),
        "content": 0,
        "added_snapshot_id": snapshot_id,
        # v2 sequence inheritance: a file appended AFTER a delete
        # outranks it (a re-inserted row must stay alive)
        "sequence_number": seq,
    }
    if lineage:
        # the manifest-level assignment, written explicitly so later
        # manifest lists can re-emit this row verbatim
        new_entry["first_row_id"] = first_row_base
        new_entry["added_rows_count"] = next_row_id - first_row_base
        new_entry["existing_rows_count"] = 0
    for r in prior_manifests:
        r.setdefault("sequence_number", None)
    if prev is not None:
        _preserve_manifest_lineage(
            table_path, prev, prior_manifests, base_sid=base_sid
        )
    write_container(
        os.path.join(table_path, ml_rel),
        _MANIFEST_FILE_SCHEMA,
        prior_manifests + [new_entry],
    )

    # 4. table metadata + version hint. An EXISTING table's schema
    # metadata (schemas, current-schema-id, last-column-id — the
    # evolved state a merge_schema merge may have committed) is
    # PRESERVED verbatim when the df matches it; rebuilding ids from
    # the df would silently regress an evolved table. A mismatched df
    # refuses — appends don't evolve schemas, merges do.
    prev_schemas = None
    if prev is not None:
        prev_cur = _current_schema(prev)
        # a partitioned registration's files carry the table schema
        # MINUS the identity partition columns (hive layout: the value
        # lives in the directory name) — a file that also contains a
        # partition column would be ambiguous and fails the same check
        _add_psrcs = {src for _pn, src, _t in add_part_fields}
        prev_fields_cmp = [
            f for f in prev_cur["fields"] if f["name"] not in _add_psrcs
        ]
        prev_names = [f["name"] for f in prev_fields_cmp]
        if prev_names != [f.name for f in df.schema.fields]:
            raise ValueError(
                "iceberg append: df columns "
                f"{[f.name for f in df.schema.fields]} != table "
                f"schema {prev_names} — appends do not evolve "
                "schemas (merge with merge_schema=True does)"
            )
        # Names matching is not enough: a type-drifted df would write
        # parquet files that silently disagree with the (preserved)
        # field types the readers trust.
        drift = []
        for f, pf in zip(df.schema.fields, prev_fields_cmp):
            try:
                got = _spark_type_to_iceberg(f.dataType)
            except NotImplementedError:
                continue  # nested type: name match is the best check
            if got != pf["type"]:
                drift.append((f.name, got, pf["type"]))
        if drift:
            raise ValueError(
                "iceberg append: df column types drifted from the "
                "table schema — "
                + ", ".join(
                    f"{n}: df={got!r} != table={want!r}"
                    for n, got, want in drift
                )
                + " (appends do not evolve schemas)"
            )
        prev_schemas = {
            "schema": prev_cur,
            "schemas": list(
                prev.get("schemas") or [prev_cur]
            ),
            "current-schema-id": int(
                prev.get("current-schema-id", 0)
            ),
            "last-column-id": int(
                prev.get("last-column-id")
                or len(prev_cur["fields"])
            ),
        }
        fields = prev_cur["fields"]
    else:
        fields = [
            {
                "id": i + 1,
                "name": f.name,
                "required": False,
                "type": _spark_type_to_iceberg(f.dataType),
            }
            for i, f in enumerate(df.schema.fields)
        ]
        if add_part_fields:
            # hive-layout bootstrap: the declared partition columns
            # join the table schema (they are real columns — their
            # values just live in the manifests, not the files)
            clash = [
                src
                for _pn, src, _t in add_part_fields
                if src in df.columns
            ]
            if clash:
                raise ValueError(
                    f"iceberg add_files: partition columns {clash} "
                    "are also present in the data files — a hive "
                    "layout keeps them in the path only"
                )
            for _pn, src, t in add_part_fields:
                fields.append(
                    {
                        "id": len(fields) + 1,
                        "name": src,
                        "required": False,
                        "type": t,
                    }
                )
            # the declared identity spec becomes spec 0 through the
            # same metadata block as the partition_by bootstrap
            parsed_spec = [
                ("identity", src) for _pn, src, _t in add_part_fields
            ]
    snapshots = (prev.get("snapshots") if prev else None) or []
    ts_ms = snapshot_timestamp_ms(prev)
    if lineage:
        fmt = max(3, fmt)  # row lineage is a v3 construct
    new_snap = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": ts_ms,
        "manifest-list": ml_rel,
        "summary": {"operation": "append"},
    }
    if prev is not None and base_sid is not None:
        # lineage pointer (publish walks it for the fast-forward
        # ancestor check)
        new_snap["parent-snapshot-id"] = base_sid
    if lineage:
        new_snap["first-row-id"] = snap_first_row
    if fmt >= 2:
        new_snap["sequence-number"] = seq
    snapshots = snapshots + [new_snap]
    meta = {
        "format-version": fmt,
        "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL, table_path)),
        "location": table_path,
        "last-updated-ms": ts_ms,
        "last-column-id": (
            prev_schemas["last-column-id"]
            if prev_schemas
            else len(fields)
        ),
        "schema": (
            prev_schemas["schema"]
            if prev_schemas
            else {"type": "struct", "schema-id": 0, "fields": fields}
        ),
        "schemas": prev_schemas["schemas"] if prev_schemas else [
            {"type": "struct", "schema-id": 0, "fields": fields}
        ],
        "current-schema-id": (
            prev_schemas["current-schema-id"] if prev_schemas else 0
        ),
        "partition-spec": [],
        # a fresh table takes the declared identity spec; appends to an
        # existing table PRESERVE its spec (this metadata dict is
        # rebuilt per commit)
        "partition-specs": (
            [
                {
                    "spec-id": 0,
                    "fields": [
                        {
                            "name": partition_field_name(tr, src),
                            "transform": tr,
                            "source-id": next(
                                f["id"]
                                for f in fields
                                if f["name"] == src
                            ),
                            "field-id": 1000 + i,
                        }
                        for i, (tr, src) in enumerate(parsed_spec)
                    ],
                }
            ]
            if parsed_spec
            else (
                prev.get("partition-specs")
                if prev is not None and prev.get("partition-specs")
                else [{"spec-id": 0, "fields": []}]
            )
        ),
        # appends preserve an evolved default spec (a fresh table's
        # declared spec is spec 0)
        "default-spec-id": (
            int(prev.get("default-spec-id", 0))
            if prev is not None and not parsed_spec
            else 0
        ),
        # spec-required sort-order metadata: order 0 = unsorted; a
        # compaction with key_col appends a real order (and preserves
        # whatever orders the table already declared)
        "sort-orders": (
            prev.get("sort-orders")
            if prev is not None and prev.get("sort-orders")
            else [{"order-id": 0, "fields": []}]
        ),
        "default-sort-order-id": (
            prev.get("default-sort-order-id", 0)
            if prev is not None
            else 0
        ),
        # tables CREATED by this writer are marked parent-stamped at
        # birth: every later snapshot records its parent (or is a
        # genuine genesis, e.g. the first main commit after a
        # branch-first bootstrap), so ancestry — never list order —
        # is history. Without the mark, a branch-first bootstrap's
        # second (main) commit has no parent and the heuristic in
        # _chain_authoritative would demote the table to list-order
        # history, leaking the unpublished branch snapshot into the
        # changelog/streams. Pre-existing tables keep whatever
        # properties they have (the heuristic governs them).
        "properties": (
            (prev.get("properties") or {})
            if prev is not None
            else {"optimus.parent-stamped": "true"}
        ),
        # a branch write leaves main (and therefore every default
        # reader) exactly where it was
        "current-snapshot-id": (
            prev.get("current-snapshot-id")
            if branch is not None and prev is not None
            else snapshot_id
        ),
        "snapshots": snapshots,
    }
    if prev and prev.get("refs"):
        meta["refs"] = prev["refs"]  # tags/branches survive appends
    if lineage:
        meta["next-row-id"] = next_row_id
    if branch is not None:
        refs = dict(meta.get("refs") or {})
        refs[branch] = {
            "snapshot-id": snapshot_id, "type": "branch",
        }
        meta["refs"] = refs
        if prev is None:
            # first commit of a fresh table straight onto a branch:
            # main has no head yet — current-snapshot-id stays unset
            meta["current-snapshot-id"] = -1
    else:
        append_snapshot_log(meta, prev, ts_ms, snapshot_id)
        advance_main_ref(meta, snapshot_id)
    if fmt >= 2:
        meta["last-sequence-number"] = seq
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


def add_iceberg_column_with_default(
    table_path: str,
    column: str,
    initial_default=None,
    write_default=None,
) -> int:
    """v3 schema evolution — ADD COLUMN with default values: appends
    the ``"name type"`` column to the current schema carrying
    ``initial-default`` (the value readers project for every
    pre-evolution row — their files lack the column) and
    ``write-default`` (the value writers materialize when an append
    omits the column). Pure metadata commit: a new schema (fresh
    schema-id, fresh field id past last-column-id), format-version
    floored at 3, zero data IO. Defaults serialize per the spec's
    JSON single-value rules (date → ISO string, decimal → string) and
    must round-trip through the reader's parser — unsupported types
    refuse by name, never half-apply."""
    import datetime as _dt
    import decimal as _dec

    toks = column.strip().split(None, 1)
    if len(toks) != 2:
        raise ValueError(
            f"iceberg add column: {column!r} is not 'name type'"
        )
    name, ice_t = toks[0], toks[1].strip()
    md = _meta_dir(table_path)
    hint = os.path.join(md, "version-hint.text")
    if not os.path.exists(hint):
        raise ValueError(f"iceberg add column: no table at {table_path}")
    prev_version = int(open(hint).read().strip())
    meta = load_table_metadata(table_path, version=prev_version)
    cur = _current_schema(meta)
    if any(f["name"] == name for f in cur["fields"]):
        raise ValueError(
            f"iceberg add column: {name!r} already in the schema"
        )

    def _ser(v):
        if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            return v.isoformat()
        if isinstance(v, _dec.Decimal):
            return str(v)
        return v

    field = {
        "id": int(meta.get("last-column-id") or len(cur["fields"])) + 1,
        "name": name,
        "required": False,
        "type": ice_t,
    }
    for key, v in (
        ("initial-default", initial_default),
        ("write-default", write_default),
    ):
        if v is not None:
            sv = _ser(v)
            _default_value_of(ice_t, sv)  # refuse-by-name gate
            field[key] = sv
    schemas = list(meta.get("schemas") or [cur])
    new_sid = max(
        [int(s.get("schema-id") or 0) for s in schemas], default=0
    ) + 1
    new_schema = {
        "type": "struct",
        "schema-id": new_sid,
        "fields": list(cur["fields"]) + [field],
    }
    meta = dict(meta)
    meta["schemas"] = schemas + [new_schema]
    meta["current-schema-id"] = new_sid
    meta["schema"] = new_schema
    meta["last-column-id"] = field["id"]
    meta["format-version"] = max(3, int(meta.get("format-version", 1)))
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


def add_iceberg_files(
    spark: SparkSession,
    table_path: str,
    files: list[str],
    partition_schema: list[str] | None = None,
) -> int:
    """Spark's ``add_files`` procedure — register EXISTING parquet
    files into an Iceberg table as one append snapshot: absolute-path
    manifest entries with footer-read record counts, zero data
    movement and zero Spark jobs. This is the migration story at
    scale: a 100 TB parquet lake enters the table as driver-side
    metadata work. The files' schema must match the table's by name
    AND type (the append guard); a fresh table bootstraps its schema
    from the files. Row lineage composes (the registered rows take
    fresh ids from next-row-id).

    PARTITIONED hive layouts (``dt=2026-01-01/part-*.parquet``)
    register too: identity partition values derive from each file's
    ``src=value`` path segments (percent-decoded,
    ``__HIVE_DEFAULT_PARTITION__`` → null) and land as
    partition-tupled manifest entries under the table's spec — the
    reader's identity-constant projection then serves the column from
    the manifest, since hive files don't physically contain it.
    ``partition_schema=['"dt string"', ...]``-style ``"name type"``
    items declare the spec when bootstrapping a FRESH table (an
    existing table's default spec governs; non-identity transforms
    refuse by name — a hive path can't encode them).

    Spark's partitioned writes reuse one task's file name across
    partition directories, so hive layouts routinely repeat
    basenames — and this engine's stats/delete joins key files by
    basename. Same-call collisions de-collide IN PLACE exactly like
    ``convert_parquet_to_delta``: an ``os.rename`` inside the same
    directory is metadata-only (still zero data copy), prefixing a
    short hash of the directory. Cross-call collisions (a copied
    export re-registered from elsewhere) still refuse — those are a
    genuine identity ambiguity, not a naming artifact."""
    if not files:
        raise ValueError("iceberg add_files: no files given")
    paths = [os.path.abspath(f) for f in files]
    n_by_bn: dict[str, int] = {}
    for p in paths:
        bn = os.path.basename(p)
        n_by_bn[bn] = n_by_bn.get(bn, 0) + 1
    renamed: list[tuple[str, str]] = []  # (new, original)
    # anything past this point can fail (a rename itself, schema
    # mismatch, cross-call basename collision, unparseable hive path
    # value) — a failed call must leave the SOURCE lake untouched, so
    # every performed rename reverts before the error propagates
    try:
        if any(c > 1 for c in n_by_bn.values()):
            decollided = []
            for p in paths:
                bn = os.path.basename(p)
                if n_by_bn[bn] > 1:
                    tok = uuid.uuid5(
                        uuid.NAMESPACE_URL, os.path.dirname(p)
                    ).hex[:8]
                    np = os.path.join(
                        os.path.dirname(p), f"{tok}-{bn}"
                    )
                    os.rename(p, np)
                    renamed.append((np, p))
                    decollided.append(np)
                else:
                    decollided.append(p)
            paths = decollided
        df = spark.read.parquet(*paths)
        return write_iceberg_commit(
            df,
            table_path,
            add_files=paths,
            add_partition_schema=partition_schema,
        )
    except BaseException:
        for np, orig in renamed:
            if os.path.exists(np) and not os.path.exists(orig):
                os.rename(np, orig)
        raise
