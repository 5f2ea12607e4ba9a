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
    compact_iceberg,
    decode_bound,
    delete_iceberg_keys,
    encode_bound,
    merge_iceberg_batch,
    set_iceberg_partition_spec,
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


def _pkv(spark, rows):
    return spark.createDataFrame(
        rows, "k long, v string, ts long, d string"
    )


def _psnap(spark, path):
    return sorted(
        ((r.k, r.v, r.d) for r in read_iceberg(spark, path).collect()),
        key=lambda t: (t[0], t[2], t[1]),
    )


class TestPartitionedMerge:
    """Identity-partitioned Iceberg MERGE: partition-scoped upsert,
    partition-tuple manifest pruning before key bounds, untouched
    manifests carried verbatim, constant job count (VERDICT r4 item 4,
    written in the single-job shape of item 2)."""

    def test_partition_scoped_upsert(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        merge_iceberg_batch(
            spark,
            _pkv(spark, [(1, "a", 0, "d1"), (1, "b", 0, "d2"),
                         (2, "c", 0, "d1")]),
            t, "k", "ts", partition_by=["d"],
        )
        # same key in two partitions: two logical rows; upsert in d1
        # must not touch d2's row
        merge_iceberg_batch(
            spark, _pkv(spark, [(1, "A", 1, "d1")]), t, "k", "ts"
        )
        assert _psnap(spark, t) == [
            (1, "A", "d1"), (1, "b", "d2"), (2, "c", "d1"),
        ]

    def test_manifest_partition_tuples_written(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        merge_iceberg_batch(
            spark,
            _pkv(spark, [(1, "a", 0, "d1"), (2, "b", 0, "d2")]),
            t, "k", "ts", partition_by=["d"],
        )
        _meta, manifests = _current_manifests(spark, t)
        pts = set()
        for m in manifests:
            _, entries = read_container(_localize(t, m["manifest_path"]))
            for e in entries:
                pts.add((e["data_file"]["partition"] or {}).get("d"))
        assert pts == {"d1", "d2"}

    def test_untouched_partition_files_not_rewritten(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        merge_iceberg_batch(
            spark,
            _pkv(spark, [(1, "a", 0, "d1"), (2, "b", 0, "d2")]),
            t, "k", "ts", partition_by=["d"],
        )
        _, m1 = _current_manifests(spark, t)
        files_before = set()
        for m in m1:
            _, entries = read_container(_localize(t, m["manifest_path"]))
            for e in entries:
                pv = (e["data_file"]["partition"] or {}).get("d")
                if pv == "d2":
                    files_before.add(e["data_file"]["file_path"])
        merge_iceberg_batch(
            spark, _pkv(spark, [(1, "A", 1, "d1")]), t, "k", "ts"
        )
        _, m2 = _current_manifests(spark, t)
        files_after = set()
        for m in m2:
            _, entries = read_container(_localize(t, m["manifest_path"]))
            for e in entries:
                pv = (e["data_file"]["partition"] or {}).get("d")
                if pv == "d2":
                    files_after.add(e["data_file"]["file_path"])
        assert files_before == files_after  # d2's data untouched
        assert _psnap(spark, t) == [(1, "A", "d1"), (2, "b", "d2")]

    def test_key_as_partition_column_rejected(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        with pytest.raises(ValueError, match="partition column"):
            merge_iceberg_batch(
                spark, _pkv(spark, [(1, "a", 0, "d1")]),
                t, "k", "ts", partition_by=["k"],
            )

    def test_unknown_transform_rejected(self, spark, tmp_path):
        import json as _json

        t = str(tmp_path / "tbl")
        merge_iceberg_batch(
            spark, _pkv(spark, [(1, "a", 0, "d1")]),
            t, "k", "ts", partition_by=["d"],
        )
        # forge an unknown transform into the spec: refuse, never
        # mis-partition
        md = os.path.join(t, "metadata")
        hint = int(open(os.path.join(md, "version-hint.text")).read())
        mp = os.path.join(md, f"v{hint}.metadata.json")
        meta = _json.loads(open(mp).read())
        meta["partition-specs"][0]["fields"][0]["transform"] = "zorder[4]"
        open(mp, "w").write(_json.dumps(meta))
        with pytest.raises(NotImplementedError, match="zorder"):
            merge_iceberg_batch(
                spark, _pkv(spark, [(2, "b", 1, "d1")]), t, "k", "ts"
            )

    def test_jobs_flat_in_partitions(self, spark, tmp_path):
        from tests.test_delta_scale import _count_jobs

        counts = {}
        for n in (4, 16):
            vals = []
            for rep in range(2):
                t = str(tmp_path / f"tbl{n}-{rep}")
                rows = [
                    (k + 100 * d, "a", 0, f"d{d:02d}")
                    for d in range(n) for k in range(3)
                ]
                merge_iceberg_batch(
                    spark, _pkv(spark, rows), t, "k", "ts",
                    partition_by=["d"],
                )
                rows2 = [
                    (k + 100 * d, "b", 1, f"d{d:02d}")
                    for d in range(n) for k in range(3)
                ]
                vals.append(_count_jobs(
                    spark,
                    lambda: merge_iceberg_batch(
                        spark, _pkv(spark, rows2), t, "k", "ts"
                    ),
                ))
            counts[n] = min(vals)
        # ±1 tolerance for async AQE/broadcast-cleanup job
        # misattribution; a per-partition regression would add ≥12
        assert counts[16] - counts[4] <= 1
        assert counts[16] <= 20


def _tkv(spark, rows):
    """k long, v string, ts long (recency), t timestamp (partition src)."""
    import datetime as _dt

    return spark.createDataFrame(
        [
            (k, v, ts, _dt.datetime.fromisoformat(iso))
            for (k, v, ts, iso) in rows
        ],
        "k long, v string, ts long, t timestamp",
    )


class TestTransformPartitionedMerge:
    """Non-identity partition transforms on the MERGE path (spec
    §Partition Transforms): days(ts)/bucket(N,c)/truncate(W,c) tables
    merge through the same single-job __pid shape — the transform just
    decides which rows share a partition tuple (VERDICT r5 item 3)."""

    def test_days_partitioned_merge(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        merge_iceberg_batch(
            spark,
            _tkv(spark, [
                (1, "a", 0, "2024-03-01T10:00:00"),
                (1, "b", 0, "2024-03-02T10:00:00"),
                (2, "c", 0, "2024-03-01T23:59:59"),
            ]),
            t, "k", "ts", partition_by=["days(t)"],
        )
        # key 1 exists on two days: partition-scoped upsert touches
        # only the 2024-03-01 row
        merge_iceberg_batch(
            spark,
            _tkv(spark, [(1, "A", 1, "2024-03-01T04:00:00")]),
            t, "k", "ts",
        )
        got = sorted(
            (r.k, r.v, str(r.t.date()))
            for r in read_iceberg(spark, t).collect()
        )
        assert got == [
            (1, "A", "2024-03-01"), (1, "b", "2024-03-02"),
            (2, "c", "2024-03-01"),
        ]

    def test_days_manifest_tuples_are_epoch_days(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        merge_iceberg_batch(
            spark,
            _tkv(spark, [(1, "a", 0, "2024-03-01T10:00:00"),
                         (2, "b", 0, "2024-03-02T10:00:00")]),
            t, "k", "ts", partition_by=["days(t)"],
        )
        import datetime as _dt

        _meta, manifests = _current_manifests(spark, t)
        days = set()
        for m in manifests:
            _, entries = read_container(_localize(t, m["manifest_path"]))
            for e in entries:
                days.add(e["data_file"]["partition"]["t_day"])
        epoch = _dt.date(1970, 1, 1)
        assert days == {
            (_dt.date(2024, 3, 1) - epoch).days,
            (_dt.date(2024, 3, 2) - epoch).days,
        }

    def test_days_untouched_day_files_carried(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        merge_iceberg_batch(
            spark,
            _tkv(spark, [(1, "a", 0, "2024-03-01T10:00:00"),
                         (2, "b", 0, "2024-03-02T10:00:00")]),
            t, "k", "ts", partition_by=["days(t)"],
        )

        def _files_of_day(day_iso):
            import datetime as _dt

            want = (_dt.date.fromisoformat(day_iso)
                    - _dt.date(1970, 1, 1)).days
            _meta, manifests = _current_manifests(spark, t)
            out = set()
            for m in manifests:
                _, entries = read_container(
                    _localize(t, m["manifest_path"])
                )
                for e in entries:
                    if e["data_file"]["partition"]["t_day"] == want:
                        out.add(e["data_file"]["file_path"])
            return out

        before = _files_of_day("2024-03-02")
        # same key as the 03-02 row, but lands on 03-01: 03-02 files
        # must survive byte-identical (carried, not rewritten)
        merge_iceberg_batch(
            spark,
            _tkv(spark, [(2, "B", 1, "2024-03-01T00:00:00")]),
            t, "k", "ts",
        )
        assert _files_of_day("2024-03-02") == before
        got = sorted(
            (r.k, r.v, str(r.t.date()))
            for r in read_iceberg(spark, t).collect()
        )
        assert got == [
            (1, "a", "2024-03-01"), (2, "B", "2024-03-01"),
            (2, "b", "2024-03-02"),
        ]

    def test_bucket_partitioned_merge(self, spark, tmp_path):
        from optimus_any2any_spark.sources.iceberg_transforms import (
            bucket_of,
        )

        t = str(tmp_path / "tbl")
        merge_iceberg_batch(
            spark,
            _pkv(spark, [(1, "a", 0, "x"), (2, "b", 0, "y"),
                         (3, "c", 0, "z")]),
            t, "k", "ts", partition_by=["bucket(4, d)"],
        )
        merge_iceberg_batch(
            spark, _pkv(spark, [(2, "B", 1, "y"), (4, "d", 1, "w")]),
            t, "k", "ts",
        )
        assert _psnap(spark, t) == [
            (1, "a", "x"), (2, "B", "y"), (3, "c", "z"), (4, "d", "w"),
        ]
        _meta, manifests = _current_manifests(spark, t)
        buckets = set()
        for m in manifests:
            _, entries = read_container(_localize(t, m["manifest_path"]))
            for e in entries:
                buckets.add(e["data_file"]["partition"]["d_bucket"])
        assert buckets <= set(range(4))
        assert bucket_of("y", "string", 4) in buckets

    def test_truncate_partitioned_merge(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        merge_iceberg_batch(
            spark,
            _pkv(spark, [(1, "a", 0, "aaX"), (2, "b", 0, "aaY"),
                         (3, "c", 0, "bbZ")]),
            t, "k", "ts", partition_by=["truncate(2, d)"],
        )
        merge_iceberg_batch(
            spark, _pkv(spark, [(1, "A", 1, "aaQ")]), t, "k", "ts",
        )
        assert _psnap(spark, t) == [
            (1, "A", "aaQ"), (2, "b", "aaY"), (3, "c", "bbZ"),
        ]
        _meta, manifests = _current_manifests(spark, t)
        prefixes = set()
        for m in manifests:
            _, entries = read_container(_localize(t, m["manifest_path"]))
            for e in entries:
                prefixes.add(e["data_file"]["partition"]["d_trunc"])
        assert prefixes == {"aa", "bb"}

    def test_days_jobs_flat_in_partitions(self, spark, tmp_path):
        from tests.test_delta_scale import _count_jobs

        counts = {}
        for n in (3, 12):
            vals = []
            # min of 3 fresh-table reps: async AQE/broadcast-cleanup
            # jobs occasionally land in the job group
            for rep in range(3):
                t = str(tmp_path / f"tbl{n}-{rep}")
                rows = [
                    (k + 100 * d, "a", 0,
                     f"2024-03-{d + 1:02d}T06:00:00")
                    for d in range(n) for k in range(3)
                ]
                merge_iceberg_batch(
                    spark, _tkv(spark, rows), t, "k", "ts",
                    partition_by=["days(t)"],
                )
                rows2 = [
                    (k + 100 * d, "b", 1,
                     f"2024-03-{d + 1:02d}T07:00:00")
                    for d in range(n) for k in range(3)
                ]
                vals.append(_count_jobs(
                    spark,
                    lambda: merge_iceberg_batch(
                        spark, _tkv(spark, rows2), t, "k", "ts"
                    ),
                ))
            counts[n] = min(vals)
        # ±1 tolerance: async AQE/broadcast-cleanup jobs land in the
        # group nondeterministically even over 3 reps; a real
        # per-partition regression would add ≥ (12-3) = 9 jobs
        assert counts[12] - counts[3] <= 1
        assert counts[12] <= 20


class TestPartitionEvolution:
    """VERDICT r9 item 6 (spec 'Partition Evolution'): evolve the
    default spec, merge across mixed-spec manifests, compact safely."""

    def _mk_day_table(self, spark, t):
        import datetime

        rows = [
            (i, f"d{i % 3}", 10 * i,
             datetime.datetime(2024, 1, 1 + i % 3), 0)
            for i in range(1, 13)
        ]
        df = spark.createDataFrame(
            rows,
            "k long, etype string, val long, ts timestamp_ntz, seq long",
        )
        merge_iceberg_batch(
            spark, df, t, "k", "seq", partition_by=["days(ts)"],
            batch_id=0,
        )
        return rows

    def test_evolve_appends_spec_and_flips_default(self, spark, tmp_path):
        t = str(tmp_path / "t")
        self._mk_day_table(spark, t)
        n_snaps = len(load_table_metadata(t).get("snapshots") or [])
        set_iceberg_partition_spec(spark, t, ["etype"])
        meta = load_table_metadata(t)
        sids = [s["spec-id"] for s in meta["partition-specs"]]
        assert sids == [0, 1]
        assert meta["default-spec-id"] == 1
        # partition field ids unique ACROSS specs (1000, then 1001)
        fids = [
            f["field-id"]
            for s in meta["partition-specs"]
            for f in s["fields"]
        ]
        assert len(fids) == len(set(fids))
        # data-free: no new snapshot
        assert len(meta.get("snapshots") or []) == n_snaps

    def test_merge_after_evolution(self, spark, tmp_path):
        import datetime

        t = str(tmp_path / "t")
        rows = self._mk_day_table(spark, t)
        set_iceberg_partition_spec(spark, t, ["etype"])
        src = spark.createDataFrame(
            [
                # k=2 lives in an OLD-spec (day) file — key pruning
                # must still find it (tuple matching would mis-prune)
                (2, "d2", 999, datetime.datetime(2024, 1, 3), 1),
                # brand-new etype: a current-spec partition the base
                # never had
                (99, "dX", 555, datetime.datetime(2024, 2, 1), 1),
            ],
            "k long, etype string, val long, ts timestamp_ntz, seq long",
        )
        merge_iceberg_batch(spark, src, t, "k", "seq", batch_id=1)
        got = sorted(
            (r.k, r.etype, r.val)
            for r in read_iceberg(spark, t).collect()
        )
        exp = sorted(
            [(k, e, v) for k, e, v, _, _ in rows if k != 2]
            + [(2, "d2", 999), (99, "dX", 555)]
        )
        assert got == exp
        # the manifest list carries BOTH spec ids: untouched old-spec
        # files re-list under spec 0, new/rewritten files under spec 1
        meta = load_table_metadata(t)
        snap = next(
            s for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _, ml = read_container(
            os.path.join(t, snap["manifest-list"])
        )
        assert sorted({m["partition_spec_id"] for m in ml}) == [0, 1]

    def test_compact_carries_old_spec_files(self, spark, tmp_path):
        t = str(tmp_path / "t")
        rows = self._mk_day_table(spark, t)
        set_iceberg_partition_spec(spark, t, ["etype"])
        compact_iceberg(spark, t, target_rows_per_file=1000)
        got = sorted(
            (r.k, r.etype, r.val)
            for r in read_iceberg(spark, t).collect()
        )
        assert got == sorted((k, e, v) for k, e, v, _, _ in rows)

    def test_delete_then_evolved_merge_keeps_seq_gating(
        self, spark, tmp_path
    ):
        import datetime

        t = str(tmp_path / "t")
        rows = self._mk_day_table(spark, t)
        delete_iceberg_keys(
            spark, t, "k", spark.createDataFrame([(5,)], "k long")
        )
        set_iceberg_partition_spec(spark, t, ["etype"])
        src = spark.createDataFrame(
            [(1, "d1", -1, datetime.datetime(2024, 1, 2), 1)],
            "k long, etype string, val long, ts timestamp_ntz, seq long",
        )
        merge_iceberg_batch(spark, src, t, "k", "seq", batch_id=1)
        got = sorted(
            (r.k, r.val) for r in read_iceberg(spark, t).collect()
        )
        # k=5 stays deleted (survivors keep their ORIGINAL sequence
        # even when re-listed under their own old spec)
        exp = sorted(
            [(k, v) for k, _, v, _, _ in rows if k not in (1, 5)]
            + [(1, -1)]
        )
        assert got == exp

    def test_merge_schema_widens_and_nullfills(self, spark, tmp_path):
        """Iceberg schema evolution on the merge path (the Delta
        mergeSchema twin): new columns append with fresh field ids
        under a new schema-id; pre-evolution files read them null;
        a narrower later batch null-fills."""
        from optimus_any2any_spark.sources.iceberg import (
            load_table_metadata,
            write_iceberg_commit,
        )

        t = str(tmp_path / "t")
        base = spark.createDataFrame(
            [(1, 10.0, 0), (2, 20.0, 0)], "k long, price double, ts long"
        )
        merge_iceberg_batch(spark, base, t, "k", "ts", batch_id=0)
        wide = spark.createDataFrame(
            [(2, 99.0, 1, "hot"), (9, 90.0, 1, "new")],
            "k long, price double, ts long, tag string",
        )
        with pytest.raises(ValueError, match="merge_schema=True"):
            merge_iceberg_batch(spark, wide, t, "k", "ts", batch_id=1)
        merge_iceberg_batch(
            spark, wide, t, "k", "ts", batch_id=1, merge_schema=True
        )
        got = sorted(
            (r.k, r.tag) for r in read_iceberg(spark, t).collect()
        )
        assert got == [(1, None), (2, "hot"), (9, "new")]
        meta = load_table_metadata(t)
        assert meta["current-schema-id"] == 1
        assert meta["last-column-id"] == 4
        assert [
            (f["id"], f["name"])
            for f in meta["schemas"][-1]["fields"]
        ] == [(1, "k"), (2, "price"), (3, "ts"), (4, "tag")]
        # narrower batch null-fills; full-schema append preserves the
        # evolved metadata; mismatched append refuses
        narrow = spark.createDataFrame(
            [(1, 11.0, 2)], "k long, price double, ts long"
        )
        merge_iceberg_batch(
            spark, narrow, t, "k", "ts", batch_id=2, merge_schema=True
        )
        app = spark.createDataFrame(
            [(50, 5.0, 3, "app")],
            "k long, price double, ts long, tag string",
        )
        write_iceberg_commit(app, t)
        meta = load_table_metadata(t)
        assert meta["current-schema-id"] == 1
        assert read_iceberg(spark, t).count() == 4
        with pytest.raises(ValueError, match="do not evolve"):
            write_iceberg_commit(narrow, t)
        # same NAMES but drifted TYPES must refuse too — else the
        # parquet silently disagrees with the table's field types
        drifted = spark.createDataFrame(
            [(51, 5, 3, "app")],
            "k long, price int, ts long, tag string",
        )
        with pytest.raises(ValueError, match="types drifted"):
            write_iceberg_commit(drifted, t)

    def test_merge_schema_empty_batch_still_evolves(
        self, spark, tmp_path
    ):
        from optimus_any2any_spark.sources.iceberg import (
            load_table_metadata,
        )

        t = str(tmp_path / "t")
        base = spark.createDataFrame(
            [(1, 10.0, 0)], "k long, price double, ts long"
        )
        merge_iceberg_batch(spark, base, t, "k", "ts", batch_id=0)
        empty = spark.createDataFrame(
            [], "k long, price double, ts long, extra long"
        )
        v = merge_iceberg_batch(
            spark, empty, t, "k", "ts", batch_id=1, merge_schema=True
        )
        meta = load_table_metadata(t)
        assert v == int(
            open(t + "/metadata/version-hint.text").read()
        )
        assert [f["name"] for f in meta["schemas"][-1]["fields"]] == [
            "k", "price", "ts", "extra",
        ]
        assert read_iceberg(spark, t).count() == 1  # data-free commit

    def test_eq_delete_after_evolve(self, spark, tmp_path):
        """VERDICT r10 item 7: a global equality delete on a table
        whose default spec evolved mid-history — the delete manifest
        stamps an appended UNPARTITIONED spec, never the partitioned
        default."""
        t = str(tmp_path / "t")
        self._mk_day_table(spark, t)
        set_iceberg_partition_spec(spark, t, ["etype"])
        delete_iceberg_keys(
            spark, t, "k",
            spark.createDataFrame([(5,), (6,)], "k long"),
        )
        got = sorted(r.k for r in read_iceberg(spark, t).collect())
        assert got == [k for k in range(1, 13) if k not in (5, 6)]

    def test_dv_delete_after_evolve_then_merge(self, spark, tmp_path):
        """DV positional deletes against old-spec files compose with
        a later merge; sequence gating keeps a re-inserted key alive
        while the delete keeps gating the older file."""
        import datetime

        from optimus_any2any_spark.streaming.iceberg_table import (
            delete_iceberg_positions,
        )

        t = str(tmp_path / "t")
        self._mk_day_table(spark, t)
        set_iceberg_partition_spec(spark, t, ["etype"])
        delete_iceberg_positions(
            spark, t, "k",
            spark.createDataFrame([(4,), (8,)], "k long"),
            use_deletion_vectors=True,
        )
        src = spark.createDataFrame(
            [(4, "d1", -4, datetime.datetime(2024, 1, 2), 1)],
            "k long, etype string, val long, ts timestamp_ntz, seq long",
        )
        merge_iceberg_batch(spark, src, t, "k", "seq", batch_id=1)
        got = sorted(
            (r.k, r.val) for r in read_iceberg(spark, t).collect()
        )
        exp = sorted(
            [(k, 10 * k) for k in range(1, 13) if k not in (4, 8)]
            + [(4, -4)]
        )
        assert got == exp

    def test_unknown_spec_id_refused(self, spark, tmp_path):
        import json as _json

        t = str(tmp_path / "t")
        self._mk_day_table(spark, t)
        set_iceberg_partition_spec(spark, t, ["etype"])
        # corrupt: drop spec 0 from the spec list
        hint = os.path.join(t, "metadata", "version-hint.text")
        v = int(open(hint).read())
        mdp = os.path.join(t, "metadata", f"v{v}.metadata.json")
        meta = _json.loads(open(mdp).read())
        meta["partition-specs"] = [
            s for s in meta["partition-specs"] if s["spec-id"] != 0
        ]
        open(mdp, "w").write(_json.dumps(meta))
        import datetime

        src = spark.createDataFrame(
            [(2, "d2", 1, datetime.datetime(2024, 1, 3), 1)],
            "k long, etype string, val long, ts timestamp_ntz, seq long",
        )
        with pytest.raises(ValueError, match="spec id 0"):
            merge_iceberg_batch(spark, src, t, "k", "seq", batch_id=1)

    def test_evolve_validates_columns(self, spark, tmp_path):
        t = str(tmp_path / "t")
        self._mk_day_table(spark, t)
        with pytest.raises(ValueError, match="no column"):
            set_iceberg_partition_spec(spark, t, ["nope"])

    def test_evolve_to_unpartitioned(self, spark, tmp_path):
        import datetime

        t = str(tmp_path / "t")
        rows = self._mk_day_table(spark, t)
        set_iceberg_partition_spec(spark, t, [])
        src = spark.createDataFrame(
            [(2, "d2", 999, datetime.datetime(2024, 1, 3), 1)],
            "k long, etype string, val long, ts timestamp_ntz, seq long",
        )
        merge_iceberg_batch(spark, src, t, "k", "seq", batch_id=1)
        got = sorted(
            (r.k, r.val) for r in read_iceberg(spark, t).collect()
        )
        exp = sorted(
            [(k, v) for k, _, v, _, _ in rows if k != 2] + [(2, 999)]
        )
        assert got == exp

    def test_set_partition_spec_rider(self, spark, tmp_path):
        from optimus_any2any_spark.config import Config
        from optimus_any2any_spark.pipeline import Pipeline

        t = str(tmp_path / "tbl")
        self._mk_day_table(spark, t)
        src = tmp_path / "in.json"
        src.write_text('{"k": 100, "etype": "dX", "val": 1, '
                       '"ts": "2024-03-01T00:00:00", "seq": 1}\n')
        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                f"ICEBERG__SINK_URI=file://{t}",
                "ICEBERG__MODE=MERGE",
                "ICEBERG__MERGE_KEY=k",
                "ICEBERG__MERGE_TS=seq",
                "ICEBERG__SET_PARTITION_SPEC=etype",
            ],
            environ={},
        )
        Pipeline(spark, "FILE", ["ICEBERG"], cfg).run()
        meta = load_table_metadata(t)
        assert meta["default-spec-id"] == 1
        assert [
            f["name"]
            for s in meta["partition-specs"]
            if s["spec-id"] == 1
            for f in s["fields"]
        ] == ["etype"]


class TestIcebergConditionalMerge:
    """The Delta conditional-clause builder's Iceberg twin — the row
    algebra is shared (streaming/delta_table._apply_merge_clauses);
    this suite pins the Iceberg-side plumbing (hit forcing for
    not-matched-by-source, summary predicates, partition guards)."""

    def _base(self, spark, t):
        df = spark.createDataFrame(
            [(1, "a", 10, 0), (2, "b", 20, 0), (3, "c", 30, 0),
             (4, "d", 40, 0)],
            "k long, name string, val long, ts long",
        )
        merge_iceberg_batch(spark, df, t, "k", "ts", batch_id=0)

    def test_full_clause_matrix(self, spark, tmp_path):
        t = str(tmp_path / "t")
        self._base(spark, t)
        src = spark.createDataFrame(
            [(1, "A", 100, 1),  # matched → update
             (3, "C", 999, 1),  # matched → delete
             (8, "x", 800, 1),  # unmatched → insert (clause matches)
             (9, "y", 5, 1)],   # unmatched → NOT inserted
            "k long, name string, val long, ts long",
        )
        merge_iceberg_batch(
            spark, src, t, "k", "ts", batch_id=1,
            when_matched=[
                ("delete", "s.val > 500"),
                ("update", None,
                 {"name": "s.name", "val": "t.val + s.val"}),
            ],
            when_not_matched=[("insert", "s.val > 500", None)],
            when_not_matched_by_source=[("delete", "t.k = 4")],
        )
        got = sorted(
            (r.k, r.name, r.val)
            for r in read_iceberg(spark, t).collect()
        )
        assert got == [(1, "A", 110), (2, "b", 20), (8, "x", 800)]
        # snapshot summary records the predicates
        import json as _json

        meta = load_table_metadata(t)
        snap = next(
            s for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        preds = _json.loads(snap["summary"]["matched-predicates"])
        assert preds[0] == {
            "predicate": "s.val > 500", "actionType": "delete",
        }

    def test_empty_source_nmbs(self, spark, tmp_path):
        t = str(tmp_path / "t")
        self._base(spark, t)
        empty = spark.createDataFrame(
            [], "k long, name string, val long, ts long"
        )
        merge_iceberg_batch(
            spark, empty, t, "k", "ts", batch_id=1,
            when_not_matched_by_source=[("delete", "t.val > 25")],
        )
        got = sorted(
            (r.k, r.val) for r in read_iceberg(spark, t).collect()
        )
        assert got == [(1, 10), (2, 20)]

    def test_partitioned_guards(self, spark, tmp_path):
        t = str(tmp_path / "t")
        base = spark.createDataFrame(
            [(1, "p1", 10, 0), (2, "p2", 20, 0)],
            "k long, pt string, val long, ts long",
        )
        merge_iceberg_batch(
            spark, base, t, "k", "ts", batch_id=0,
            partition_by=["pt"],
        )
        src = spark.createDataFrame(
            [(1, "p1", 1, 1)], "k long, pt string, val long, ts long"
        )
        with pytest.raises(ValueError, match="partition source"):
            merge_iceberg_batch(
                spark, src, t, "k", "ts",
                when_matched=[("update", None, {"pt": "'p9'"})],
            )
        # matched clauses that leave partition sources alone work
        merge_iceberg_batch(
            spark, src, t, "k", "ts", batch_id=1,
            when_matched=[("update", None, {"val": "t.val + s.val"})],
        )
        got = sorted(
            (r.k, r.pt, r.val)
            for r in read_iceberg(spark, t).collect()
        )
        assert got == [(1, "p1", 11), (2, "p2", 20)]

    def test_partitioned_nmbs_across_partitions(self, spark, tmp_path):
        """VERDICT r10 item 6 (Iceberg twin): partitioned
        not-matched-by-source reaches rows in live partitions the
        batch never touches via the pid-space extension."""
        t = str(tmp_path / "t")
        base = spark.createDataFrame(
            [(1, "p1", 10, 0), (2, "p1", 20, 0),
             (3, "p2", 30, 0), (4, "p3", 41, 0)],
            "k long, pt string, val long, ts long",
        )
        merge_iceberg_batch(
            spark, base, t, "k", "ts", batch_id=0,
            partition_by=["pt"],
        )
        src = spark.createDataFrame(
            [(1, "p1", 100, 1)], "k long, pt string, val long, ts long"
        )
        merge_iceberg_batch(
            spark, src, t, "k", "ts", batch_id=1,
            when_matched=[("update", None, {"val": "s.val"})],
            when_not_matched_by_source=[("delete", "t.val % 2 = 1")],
        )
        got = sorted(
            (r.k, r.pt, r.val)
            for r in read_iceberg(spark, t).collect()
        )
        # k=4 lives in p3, a partition the batch never touched
        assert got == [(1, "p1", 100), (2, "p1", 20), (3, "p2", 30)]

    def test_partitioned_nmbs_empty_source(self, spark, tmp_path):
        t = str(tmp_path / "t")
        base = spark.createDataFrame(
            [(1, "p1", 10, 0), (3, "p2", 30, 0)],
            "k long, pt string, val long, ts long",
        )
        merge_iceberg_batch(
            spark, base, t, "k", "ts", batch_id=0,
            partition_by=["pt"],
        )
        empty = spark.createDataFrame(
            [], "k long, pt string, val long, ts long"
        )
        merge_iceberg_batch(
            spark, empty, t, "k", "ts", batch_id=1,
            when_not_matched_by_source=[("delete", "t.val >= 30")],
        )
        got = sorted(
            (r.k, r.pt, r.val)
            for r in read_iceberg(spark, t).collect()
        )
        assert got == [(1, "p1", 10)]

    def test_insert_only_clause_no_hits(self, spark, tmp_path):
        t = str(tmp_path / "t")
        self._base(spark, t)
        src = spark.createDataFrame(
            [(100, "hi", 1, 1), (200, "lo", 2, 1)],
            "k long, name string, val long, ts long",
        )
        merge_iceberg_batch(
            spark, src, t, "k", "ts", batch_id=1,
            when_not_matched=[
                ("insert", "s.k = 100",
                 {"k": "s.k", "name": "upper(s.name)", "val": "s.val"}),
            ],
        )
        got = sorted(
            (r.k, r.name, r.val)
            for r in read_iceberg(spark, t).collect()
        )
        assert got == [
            (1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40),
            (100, "HI", 1),
        ]

    def test_sink_riders(self, spark, tmp_path):
        from optimus_any2any_spark.config import Config
        from optimus_any2any_spark.pipeline import Pipeline

        t = str(tmp_path / "tbl")
        self._base(spark, t)
        src = tmp_path / "in.json"
        src.write_text(
            '{"k": 2, "name": "DEL", "val": 999, "ts": 1}\n'
            '{"k": 50, "name": "i", "val": 5, "ts": 1}\n'
        )
        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                f"ICEBERG__SINK_URI=file://{t}",
                "ICEBERG__MODE=MERGE",
                "ICEBERG__MERGE_KEY=k",
                "ICEBERG__MERGE_TS=ts",
                'ICEBERG__WHEN_MATCHED=[["delete", "s.val > 500"]]',
            ],
            environ={},
        )
        Pipeline(spark, "FILE", ["ICEBERG"], cfg).run()
        got = sorted(
            (r.k, r.val) for r in read_iceberg(spark, t).collect()
        )
        # k=2 deleted; k=50 inserted (default insert-all)
        assert got == [(1, 10), (3, 30), (4, 40), (50, 5)]


class TestEvolvedSchemaDmlComposes:
    def test_dml_compaction_changelog_on_evolved_table(
        self, spark, tmp_path
    ):
        """After a merge_schema evolution, the whole write/read
        surface composes: UPDATE/DELETE WHERE referencing the NEW
        column, keyed compaction, and the changelog scan."""
        from optimus_any2any_spark.sources.iceberg import (
            read_iceberg_changes,
        )
        from optimus_any2any_spark.streaming.iceberg_table import (
            compact_iceberg,
            delete_iceberg_where,
            update_iceberg_where,
        )

        t = str(tmp_path / "t")
        base = spark.createDataFrame(
            [(i, 10.0 * i, 0) for i in range(1, 7)],
            "k long, price double, ts long",
        )
        merge_iceberg_batch(spark, base, t, "k", "ts", batch_id=0)
        wide = spark.createDataFrame(
            [(9, 90.0, 1, "hot")],
            "k long, price double, ts long, tag string",
        )
        merge_iceberg_batch(
            spark, wide, t, "k", "ts", batch_id=1, merge_schema=True
        )
        update_iceberg_where(
            spark, t, {"tag": "'cold'"}, where="k % 2 = 0"
        )
        delete_iceberg_where(spark, t, "tag = 'hot'")
        got = sorted(
            (r.k, r.tag) for r in read_iceberg(spark, t).collect()
        )
        assert got == [
            (1, None), (2, "cold"), (3, None),
            (4, "cold"), (5, None), (6, "cold"),
        ]
        compact_iceberg(spark, t, key_col="k")
        assert read_iceberg(spark, t).count() == 6
        ch = read_iceberg_changes(spark, t)
        assert "tag" in ch.columns and ch.count() > 0
