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

Scope (spec-honest): format versions 1 and 2 WITHOUT row-level
deletes — a snapshot that carries delete manifests or delete data
files raises ``NotImplementedError`` rather than returning resurrected
rows (the same honesty rule as the Delta reader's
``minReaderVersion > 1`` rejection). Unlike Delta, Iceberg data files
physically contain their partition columns, so no literal-column
reattachment is needed.

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

import glob as _glob
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

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
    if int(meta.get("format-version", 1)) > 2:
        raise NotImplementedError(
            f"iceberg: format-version {meta['format-version']} > 2"
        )
    return meta


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


def read_iceberg(
    spark: SparkSession,
    table_path: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Snapshot read of an Iceberg table; ``snapshot_id`` time-travels
    to any retained snapshot (the spec's SNAPSHOT AS OF)."""
    meta = load_table_metadata(table_path)
    schema = iceberg_spark_schema(meta)
    files = snapshot_data_files(table_path, meta, snapshot_id)
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)


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
    meta = load_table_metadata(table_path)
    schema = iceberg_spark_schema(meta)
    snaps = meta.get("snapshots") or []
    ids = [s["snapshot-id"] for s in snaps]
    if to_snapshot_id not in ids:
        raise ValueError(
            f"iceberg: snapshot {to_snapshot_id} not in table metadata"
        )
    start = 0
    if from_snapshot_id is not None:
        if from_snapshot_id not in ids:
            raise ValueError(
                f"iceberg: snapshot {from_snapshot_id} not in table "
                "metadata"
            )
        start = ids.index(from_snapshot_id) + 1
    window = snaps[start:ids.index(to_snapshot_id) + 1]
    files: list[str] = []
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
                    files.append(
                        _localize(table_path, e["data_file"]["file_path"])
                    )
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)


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
    ],
}


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


def write_iceberg_commit(
    df: DataFrame,
    table_path: str,
    partition_by: list[str] | None = None,
) -> int:
    """Append one snapshot in the v1 HadoopCatalog layout; returns the
    new metadata version. Unpartitioned data, append-only — enough
    surface to exercise every branch of the reader against real table
    bytes. ``partition_by`` (empty first commit only) declares an
    IDENTITY partition spec in the table metadata — the bootstrap for
    ``merge_iceberg_batch``'s partitioned tables, which write the
    actual partition-grouped files and manifest partition tuples."""
    spark = df.sparkSession
    if partition_by:
        if not df.isEmpty():
            raise NotImplementedError(
                "iceberg fixture writer: partition_by is the empty-"
                "table bootstrap only; data commits into a partitioned "
                "table go through merge_iceberg_batch"
            )
        missing = [c for c in partition_by if c not in df.columns]
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
    version = prev_version + 1
    snapshot_id = version  # deterministic, unique per commit

    # 1. data files
    tmp = os.path.join(table_path, f"_tmp-ice-v{version}")
    df.write.mode("overwrite").parquet(tmp)
    data_rel: list[str] = []
    for i, part in enumerate(
        sorted(_glob.glob(os.path.join(tmp, "part-*.parquet")))
    ):
        rel = f"data/{version:05d}-{i:04d}.parquet"
        os.replace(part, os.path.join(table_path, rel))
        data_rel.append(rel)
    shutil.rmtree(tmp)
    counts = {
        os.path.basename(r): 0 for r in data_rel
    }
    if data_rel:
        from pyspark.sql import functions as F

        for row in (
            spark.read.parquet(
                *[os.path.join(table_path, r) for r in data_rel]
            )
            .withColumn("__f", F.input_file_name())
            .groupBy("__f")
            .count()
            .collect()
        ):
            counts[row["__f"].rsplit("/", 1)[-1]] = row["count"]
    # an empty frame (e.g. the partitioned-table bootstrap) still
    # writes one zero-row part file — drop it rather than listing a
    # rowless entry in the manifest
    empty = [r for r in data_rel if counts[os.path.basename(r)] == 0]
    for r in empty:
        os.remove(os.path.join(table_path, r))
    data_rel = [r for r in data_rel if r not in empty]

    # 2. manifest for this snapshot's added files
    manifest_rel = f"metadata/{uuid.uuid5(uuid.NAMESPACE_URL, f'{table_path}|m{version}')}-m0.avro"
    entries = [
        {
            "status": 1,  # ADDED
            "snapshot_id": snapshot_id,
            "data_file": {
                "file_path": rel,
                "file_format": "PARQUET",
                "partition": {},
                "record_count": int(counts[os.path.basename(rel)]),
                "file_size_in_bytes": os.path.getsize(
                    os.path.join(table_path, rel)
                ),
            },
        }
        for rel in data_rel
    ]
    write_container(
        os.path.join(table_path, manifest_rel),
        _MANIFEST_ENTRY_SCHEMA,
        entries,
    )

    # 3. manifest list = prior snapshot's manifests + the new one
    prior_manifests: list[dict] = []
    if prev is not None and prev.get("current-snapshot-id") not in (
        None, -1,
    ):
        snap = next(
            s
            for s in prev["snapshots"]
            if s["snapshot-id"] == prev["current-snapshot-id"]
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
        "partition_spec_id": 0,
        "content": 0,
        "added_snapshot_id": snapshot_id,
    }
    write_container(
        os.path.join(table_path, ml_rel),
        _MANIFEST_FILE_SCHEMA,
        prior_manifests + [new_entry],
    )

    # 4. table metadata + version hint
    fields = [
        {
            "id": i + 1,
            "name": f.name,
            "required": False,
            "type": _spark_type_to_iceberg(f.dataType),
        }
        for i, f in enumerate(df.schema.fields)
    ]
    snapshots = (prev.get("snapshots") if prev else None) or []
    snapshots = snapshots + [
        {
            "snapshot-id": snapshot_id,
            "timestamp-ms": 0,
            "manifest-list": ml_rel,
            "summary": {"operation": "append"},
        }
    ]
    meta = {
        "format-version": 1,
        "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL, table_path)),
        "location": table_path,
        "last-updated-ms": 0,
        "last-column-id": len(fields),
        "schema": {"type": "struct", "schema-id": 0, "fields": fields},
        "schemas": [
            {"type": "struct", "schema-id": 0, "fields": fields}
        ],
        "current-schema-id": 0,
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
                            "name": c,
                            "transform": "identity",
                            "source-id": next(
                                f["id"] for f in fields if f["name"] == c
                            ),
                            "field-id": 1000 + i,
                        }
                        for i, c in enumerate(partition_by)
                    ],
                }
            ]
            if partition_by
            else (
                prev.get("partition-specs")
                if prev is not None and prev.get("partition-specs")
                else [{"spec-id": 0, "fields": []}]
            )
        ),
        "default-spec-id": 0,
        "properties": {},
        "current-snapshot-id": snapshot_id,
        "snapshots": snapshots,
    }
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
