"""Iceberg-snapshot MERGE (streaming/iceberg_table.py): copy-on-write
at file AND manifest granularity, bounds-based pruning, summary
idempotence, snapshot time travel through merges."""

from __future__ import annotations

import os
import struct

import pytest

from optimus_any2any_spark.formats.avrobin import read_container
from optimus_any2any_spark.sources.iceberg import (
    _localize,
    load_table_metadata,
    read_iceberg,
)
from optimus_any2any_spark.streaming.iceberg_table import (
    decode_bound,
    encode_bound,
    merge_iceberg_batch,
    upsert_to_iceberg_table,
)


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ts long")


def _snap(spark, path, snapshot_id=None):
    return sorted(
        ((r.k, r.v) for r in read_iceberg(
            spark, path, snapshot_id=snapshot_id
        ).collect()),
        key=lambda t: (t[0] is None, t[0] if t[0] is not None else 0, t[1]),
    )


def _current_manifests(spark, t):
    meta = load_table_metadata(t)
    snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, manifests = read_container(_localize(t, snap["manifest-list"]))
    return meta, manifests


class TestBoundsCodec:
    @pytest.mark.parametrize(
        "t,v",
        [("long", -(2**40)), ("int", 123), ("double", 1.5),
         ("float", 2.0), ("string", "héllo")],
    )
    def test_round_trip(self, t, v):
        assert decode_bound(t, encode_bound(t, v)) == v

    def test_long_is_8_byte_le(self):
        assert encode_bound("long", 1) == struct.pack("<q", 1)
        assert encode_bound("string", "ab") == b"ab"


class TestMergeSemantics:
    def test_insert_then_upsert(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        merge_iceberg_batch(
            spark, _kv(spark, [(1, "a", 0), (2, "b", 0)]), t, "k", "ts"
        )
        merge_iceberg_batch(
            spark, _kv(spark, [(2, "B", 1), (3, "c", 1)]), t, "k", "ts"
        )
        assert _snap(spark, t) == [(1, "a"), (2, "B"), (3, "c")]

    def test_null_key_upsert(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        merge_iceberg_batch(
            spark, _kv(spark, [(None, "n0", 0), (1, "a", 0)]), t, "k", "ts"
        )
        merge_iceberg_batch(
            spark, _kv(spark, [(None, "n1", 1)]), t, "k", "ts"
        )
        assert _snap(spark, t) == [(1, "a"), (None, "n1")]

    def test_merge_entries_carry_bounds(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        merge_iceberg_batch(
            spark, _kv(spark, [(5, "a", 0), (9, "b", 0)]), t, "k", "ts"
        )
        _, manifests = _current_manifests(spark, t)
        _, entries = read_container(
            _localize(t, manifests[-1]["manifest_path"])
        )
        added = [e for e in entries if e["status"] == 1]
        assert added
        df = added[0]["data_file"]
        lo = {p["key"]: p["value"] for p in df["lower_bounds"]}
        hi = {p["key"]: p["value"] for p in df["upper_bounds"]}
        assert decode_bound("long", lo[1]) == 5
        assert decode_bound("long", hi[1]) == 9


class TestCopyOnWriteFootprint:
    def _seed(self, spark, t):
        merge_iceberg_batch(
            spark, _kv(spark, [(k, f"v{k}", 0) for k in range(1, 9)]),
            t, "k", "ts", target_rows_per_file=4,
        )

    def test_untouched_data_file_not_rewritten(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        self._seed(spark, t)
        data_before = {
            f: os.stat(os.path.join(t, "data", f)).st_mtime_ns
            for f in os.listdir(os.path.join(t, "data"))
        }
        merge_iceberg_batch(
            spark, _kv(spark, [(1, "A", 1)]), t, "k", "ts"
        )
        still = set(os.listdir(os.path.join(t, "data"))) & set(data_before)
        assert still  # high-range file(s) survive
        for f in still:
            assert (
                os.stat(os.path.join(t, "data", f)).st_mtime_ns
                == data_before[f]
            )
        assert _snap(spark, t)[:3] == [(1, "A"), (2, "v2"), (3, "v3")]

    def test_untouched_manifest_carried_verbatim(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        # two separate merges → two manifests with disjoint key ranges
        merge_iceberg_batch(
            spark, _kv(spark, [(1, "a", 0), (2, "b", 0)]), t, "k", "ts"
        )
        merge_iceberg_batch(
            spark, _kv(spark, [(100, "x", 0), (200, "y", 0)]), t, "k", "ts"
        )
        _, manifests_before = _current_manifests(spark, t)
        paths_before = {m["manifest_path"] for m in manifests_before}
        # touch only the low range
        merge_iceberg_batch(spark, _kv(spark, [(1, "A", 1)]), t, "k", "ts")
        _, manifests_after = _current_manifests(spark, t)
        paths_after = {m["manifest_path"] for m in manifests_after}
        carried = paths_before & paths_after
        assert carried  # the high-range manifest was NOT rewritten
        assert _snap(spark, t) == [
            (1, "A"), (2, "b"), (100, "x"), (200, "y"),
        ]

    def test_survivor_entries_keep_data_files(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        self._seed(spark, t)
        merge_iceberg_batch(spark, _kv(spark, [(1, "A", 1)]), t, "k", "ts")
        _, manifests = _current_manifests(spark, t)
        _, entries = read_container(
            _localize(t, manifests[-1]["manifest_path"])
        )
        statuses = sorted(e["status"] for e in entries)
        # at least one ADDED (rewrite) and the untouched-in-manifest
        # survivors re-listed as EXISTING
        assert 1 in statuses
        assert all(s in (0, 1) for s in statuses)


class TestIdempotence:
    def test_summary_skips_redelivered_batch(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        merge_iceberg_batch(
            spark, _kv(spark, [(1, "a", 0)]), t, "k", "ts", batch_id=0
        )
        v1 = merge_iceberg_batch(
            spark, _kv(spark, [(1, "b", 1)]), t, "k", "ts", batch_id=1
        )
        v2 = merge_iceberg_batch(
            spark, _kv(spark, [(1, "XXX", 9)]), t, "k", "ts", batch_id=1
        )
        assert v2 == v1
        assert _snap(spark, t) == [(1, "b")]


class TestTimeTravelThroughMerges:
    def test_each_merge_is_a_snapshot(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        merge_iceberg_batch(spark, _kv(spark, [(1, "a0", 0)]), t, "k", "ts")
        merge_iceberg_batch(spark, _kv(spark, [(1, "a1", 1)]), t, "k", "ts")
        meta = load_table_metadata(t)
        ids = [s["snapshot-id"] for s in meta["snapshots"]]
        # empty-table bootstrap snapshot + two merges
        assert meta["current-snapshot-id"] == ids[-1]
        assert _snap(spark, t, snapshot_id=ids[-2]) == [(1, "a0")]
        assert _snap(spark, t) == [(1, "a1")]


class TestStreamingUpsert:
    def test_streaming_merge_available_now(self, spark, tmp_path):
        import time

        t = str(tmp_path / "tbl")
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        _kv(spark, [(1, "a", 0), (2, "b", 0)]).write.parquet(src)
        stream = spark.readStream.schema(
            "k long, v string, ts long"
        ).parquet(src)
        q = upsert_to_iceberg_table(stream, t, "k", "ts", ckpt)
        q.awaitTermination(60)
        time.sleep(0.2)
        assert _snap(spark, t) == [(1, "a"), (2, "b")]
        _kv(spark, [(2, "B", 1)]).write.mode("append").parquet(src)
        q2 = upsert_to_iceberg_table(stream, t, "k", "ts", ckpt)
        q2.awaitTermination(60)
        time.sleep(0.2)
        assert _snap(spark, t) == [(1, "a"), (2, "B")]
