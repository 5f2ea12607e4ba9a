"""Iceberg table as a Structured Streaming SOURCE (Python DataSource).

``spark.readStream.format("iceberg_tail")`` over an open-spec Iceberg
table: stream offsets are positions in the snapshot lineage, each
micro-batch is the files ADDED by the snapshots in the window (the
spec's incremental append scan, ``read_iceberg_appends``), and
overwrite snapshots (merges) fail the stream — the append contract,
same as the Delta twin in :mod:`.delta_stream`. Offset planning is
driver-side over metadata JSON + Avro manifests (pure python — the
stdlib Avro codec needs no SparkSession); data files are read ON
EXECUTORS with pyarrow, one input partition per file.

Registration (per session)::

    from optimus_any2any_spark.sources.iceberg_stream import (
        IcebergTailDataSource,
    )
    spark.dataSource.register(IcebergTailDataSource)
    df = (spark.readStream.format("iceberg_tail")
          .option("path", "/path/to/table").load())
"""

from __future__ import annotations

import glob as _glob
import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T

# ship this module's code with the pickle — the data-source runner
# worker has no repo on PYTHONPATH (same gotcha as delta_stream). The
# Avro codec and the iceberg reader helpers run inside that runner
# during offset planning, so their MODULES are registered by value too
# and referenced through module-level names (a runtime import-by-name
# inside the runner would fail).
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

from optimus_any2any_spark.formats import avrobin as _avro
from optimus_any2any_spark.sources import iceberg as _ice

_cloudpickle.register_pickle_by_value(_avro)
_cloudpickle.register_pickle_by_value(_ice)
_cloudpickle.register_pickle_by_value(_sys.modules[__name__])


def _load_meta(table_path: str) -> dict:
    """Latest table metadata, pure python (no SparkSession)."""
    md = os.path.join(table_path, "metadata")
    hint = os.path.join(md, "version-hint.text")
    if os.path.exists(hint):
        version = int(open(hint).read().strip())
    else:
        vs = [
            int(os.path.basename(f)[1:-len(".metadata.json")])
            for f in _glob.glob(os.path.join(md, "v*.metadata.json"))
        ]
        if not vs:
            raise ValueError(f"iceberg_tail: no metadata in {table_path}")
        version = max(vs)
    with open(os.path.join(md, f"v{version}.metadata.json")) as f:
        return json.loads(f.read())


def _added_files(table_path: str, snap: dict) -> list[str]:
    """Data files ADDED by one snapshot (spec incremental append
    scan); raises on non-append snapshots."""
    read_container = _avro.read_container
    _localize = _ice._localize

    op = (snap.get("summary") or {}).get("operation", "append")
    if op != "append":
        raise ValueError(
            f"iceberg_tail: snapshot {snap['snapshot-id']} is {op!r} — "
            "the append stream contract is broken"
        )
    files: list[str] = []
    _, manifests = read_container(
        _localize(table_path, snap["manifest-list"])
    )
    for m in manifests:
        _, entries = read_container(
            _localize(table_path, m["manifest_path"])
        )
        for e in entries:
            if (
                int(e.get("status") or 0) == 1
                and e.get("snapshot_id") == snap["snapshot-id"]
            ):
                files.append(
                    _localize(table_path, e["data_file"]["file_path"])
                )
    return files


class _IceFile(InputPartition):
    def __init__(self, path: str):
        self.path = path


class IcebergTailStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.table_path = options.get("path", "")
        if not self.table_path:
            raise ValueError("iceberg_tail: option 'path' is required")
        self.schema_ = schema
        # startingSnapshotId: consume strictly AFTER this snapshot
        # (the already-loaded-history case); default = full lineage
        start = options.get("startingsnapshotid")
        self.start_sid: int | None = None
        if start is not None:
            meta = _load_meta(self.table_path)
            ids = [
                s["snapshot-id"] for s in meta.get("snapshots") or []
            ]
            if int(start) not in ids:
                raise ValueError(
                    f"iceberg_tail: startingSnapshotId {start} not in "
                    "table lineage"
                )
            self.start_sid = int(start)

    # offsets: {"sid": S} = consumed through snapshot-id S (None =
    # nothing consumed). Snapshot-ids are STABLE across snapshot
    # expiration — a positional index ({"pos": N}, the r4 form, still
    # accepted from old checkpoints) silently re-delivers or skips
    # snapshots once history cleanup shifts positions; an id that has
    # left the lineage raises instead, matching delta_stream's
    # missing-commit error.
    def _pos_after(self, snaps: list[dict], off: dict) -> int:
        if "pos" in off:  # legacy checkpoint form
            return int(off["pos"])
        sid = off.get("sid")
        if sid is None:
            return 0
        ids = [s["snapshot-id"] for s in snaps]
        if sid not in ids:
            raise ValueError(
                f"iceberg_tail: snapshot {sid} is no longer in the "
                "table lineage (expired?) — cannot resume without a "
                "gap; restart the stream from a fresh checkpoint"
            )
        return ids.index(sid) + 1

    def initialOffset(self) -> dict:
        return {"sid": self.start_sid}

    def latestOffset(self) -> dict:
        meta = _load_meta(self.table_path)
        snaps = meta.get("snapshots") or []
        return {
            "sid": snaps[-1]["snapshot-id"] if snaps else None
        }

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        meta = _load_meta(self.table_path)
        snaps = meta.get("snapshots") or []
        window = snaps[
            self._pos_after(snaps, start):self._pos_after(snaps, end)
        ]
        out: list[InputPartition] = []
        for snap in window:
            for f in _added_files(self.table_path, snap):
                out.append(_IceFile(f))
        return out

    def read(self, partition: _IceFile) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        cols = {
            name: table.column(name).to_pylist()
            for name in table.column_names
        }
        fields = [f.name for f in self.schema_.fields]
        for i in range(table.num_rows):
            yield tuple(cols[f][i] if f in cols else None for f in fields)

    def commit(self, end: dict) -> None:
        pass


class IcebergTailDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "iceberg_tail"

    def schema(self):
        meta = _load_meta(self.options.get("path", ""))
        sch = None
        if "schemas" in meta:
            sid = meta.get("current-schema-id", 0)
            sch = next(
                (s for s in meta["schemas"] if s.get("schema-id") == sid),
                meta["schemas"][0],
            )
        else:
            sch = meta["schema"]
        return _ice._iceberg_type_to_spark(
            {"type": "struct", "fields": sch["fields"]}
        )

    def streamReader(self, schema: T.StructType):
        return IcebergTailStreamReader(schema, self.options)
