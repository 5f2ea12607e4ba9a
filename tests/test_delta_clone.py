"""Delta SHALLOW CLONE (delta-spark CREATE TABLE ... SHALLOW CLONE):
commit 0 re-states the source's live adds with ABSOLUTE paths — zero
data copy; later writes land in the clone's own directory (table-
token file names prevent basename collisions with source files) and
never touch the source; VACUUM only scans the clone's directory."""

from __future__ import annotations

import glob
import os

import pytest

from optimus_any2any_spark.sources.delta import (
    read_delta,
    read_delta_row_tracking,
    replay_log,
)
from optimus_any2any_spark.streaming.delta_table import (
    _write_checkpoint,
    create_delta_table,
    delete_delta_keys,
    merge_delta_batch,
    purge_deletion_vectors,
    shallow_clone_delta,
    vacuum_delta,
)


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ts long")


def _mk_src(spark, t, rows=None):
    merge_delta_batch(
        spark,
        _kv(spark, rows or [(1, "a", 0), (2, "b", 0), (3, "c", 0)]),
        t, "k", "ts", batch_id=0,
    )


def _rows(spark, t):
    return sorted((r.k, r.v) for r in read_delta(spark, t).collect())


class TestCloneBasics:
    def test_zero_copy_read_equivalence(self, spark, tmp_path):
        src = str(tmp_path / "src")
        tgt = str(tmp_path / "tgt")
        _mk_src(spark, src)
        shallow_clone_delta(spark, src, tgt)
        assert _rows(spark, tgt) == _rows(spark, src)
        # zero data copy: the clone directory holds only the log
        assert glob.glob(os.path.join(tgt, "*.parquet")) == []
        st = replay_log(spark, tgt)
        assert all(p.startswith("/") for p in st["live"])

    def test_guards(self, spark, tmp_path):
        src = str(tmp_path / "src")
        _mk_src(spark, src)
        with pytest.raises(ValueError, match="no _delta_log"):
            shallow_clone_delta(
                spark, str(tmp_path / "nope"), str(tmp_path / "t2")
            )
        tgt = str(tmp_path / "tgt")
        shallow_clone_delta(spark, src, tgt)
        with pytest.raises(ValueError, match="already exists"):
            shallow_clone_delta(spark, src, tgt)

    def test_divergence_isolation(self, spark, tmp_path):
        """Writes to either side after the clone never affect the
        other: the clone is a snapshot, not a view."""
        src = str(tmp_path / "src")
        tgt = str(tmp_path / "tgt")
        _mk_src(spark, src)
        shallow_clone_delta(spark, src, tgt)
        merge_delta_batch(
            spark, _kv(spark, [(2, "SRC", 1), (8, "s8", 1)]),
            src, "k", "ts", batch_id=1,
        )
        merge_delta_batch(
            spark, _kv(spark, [(3, "TGT", 1), (9, "t9", 1)]),
            tgt, "k", "ts", batch_id=1,
        )
        assert _rows(spark, src) == [
            (1, "a"), (2, "SRC"), (3, "c"), (8, "s8"),
        ]
        assert _rows(spark, tgt) == [
            (1, "a"), (2, "b"), (3, "TGT"), (9, "t9"),
        ]

    def test_historical_version_clone(self, spark, tmp_path):
        src = str(tmp_path / "src")
        _mk_src(spark, src)
        merge_delta_batch(
            spark, _kv(spark, [(4, "d", 1)]), src, "k", "ts",
            batch_id=1,
        )
        tgt = str(tmp_path / "tgt")
        shallow_clone_delta(spark, src, tgt, version=0)
        assert _rows(spark, tgt) == [(1, "a"), (2, "b"), (3, "c")]

    def test_vacuum_never_touches_source(self, spark, tmp_path):
        """A CoW delete on the clone tombstones ABSOLUTE source
        paths; vacuum scans only the clone directory, so the source
        bytes survive and the source table still reads fully."""
        src = str(tmp_path / "src")
        tgt = str(tmp_path / "tgt")
        _mk_src(spark, src)
        src_files = set(glob.glob(os.path.join(src, "*.parquet")))
        shallow_clone_delta(spark, src, tgt)
        delete_delta_keys(
            spark, tgt, "k", spark.createDataFrame([(2,)], "k long")
        )
        gone = vacuum_delta(spark, tgt)
        assert set(glob.glob(os.path.join(src, "*.parquet"))) == (
            src_files
        )
        assert _rows(spark, src) == [(1, "a"), (2, "b"), (3, "c")]
        assert _rows(spark, tgt) == [(1, "a"), (3, "c")]
        assert not any(g.startswith("/") for g in gone)


class TestCloneCompositions:
    def test_dv_table_clone_converts_descriptors(self, spark, tmp_path):
        src = str(tmp_path / "src")
        tgt = str(tmp_path / "tgt")
        _mk_src(spark, src)
        delete_delta_keys(
            spark, src, "k", spark.createDataFrame([(2,)], "k long"),
            use_deletion_vectors=True,
        )
        shallow_clone_delta(spark, src, tgt)
        st = replay_log(spark, tgt)
        dvs = [
            a["deletionVector"]
            for a in st["live"].values()
            if a.get("deletionVector")
        ]
        assert dvs and all(d["storageType"] == "p" for d in dvs)
        assert all(d["pathOrInlineDv"].startswith("/") for d in dvs)
        assert _rows(spark, tgt) == [(1, "a"), (3, "c")]
        # purging the clone's vectors writes into the CLONE dir
        purge_deletion_vectors(spark, tgt, key_col="k")
        assert _rows(spark, tgt) == [(1, "a"), (3, "c")]
        assert glob.glob(os.path.join(tgt, "*.parquet"))
        assert _rows(spark, src) == [(1, "a"), (3, "c")]

    def test_row_tracking_carries_across_clone(self, spark, tmp_path):
        import json as _json

        src = str(tmp_path / "src")
        tgt = str(tmp_path / "tgt")
        create_delta_table(
            spark, src, "k long, v string, ts long", row_tracking=True
        )
        _mk_src(spark, src)
        shallow_clone_delta(spark, src, tgt)
        ids = sorted(
            (r.k, r._row_id)
            for r in read_delta_row_tracking(spark, tgt).collect()
        )
        assert ids == [(1, 0), (2, 1), (3, 2)]
        st = replay_log(spark, tgt)
        hwm = int(
            _json.loads(st["domains"]["delta.rowTracking"])[
                "rowIdHighWaterMark"
            ]
        )
        assert hwm == 2
        # post-clone merge: matched keeps, insert mints ABOVE the
        # carried watermark; checkpoint round-trips the composition
        merge_delta_batch(
            spark, _kv(spark, [(2, "B", 1), (9, "z", 1)]),
            tgt, "k", "ts", batch_id=1,
        )
        after = {
            r.k: r._row_id
            for r in read_delta_row_tracking(spark, tgt).collect()
        }
        assert after[2] == 1 and after[9] > 2
        _write_checkpoint(spark, tgt, replay_log(spark, tgt)["version"])
        again = {
            r.k: r._row_id
            for r in read_delta_row_tracking(spark, tgt).collect()
        }
        assert again == after

    def test_clone_of_mapped_table(self, spark, tmp_path):
        import tests.test_delta_column_mapping as cmfix

        src = str(tmp_path / "src")
        tgt = str(tmp_path / "tgt")
        cmfix._write_mapped_table(spark, src)
        shallow_clone_delta(spark, src, tgt)
        assert _rows(spark, tgt) == [(1, "a"), (2, "b"), (3, "c")]
        merge_delta_batch(
            spark,
            spark.createDataFrame(
                [(2, "B", 1)], "k long, v string, ts long"
            ),
            tgt, "k", "ts", batch_id=1, merge_schema=True,
        )
        got = {r.k: r.v for r in read_delta(spark, tgt).collect()}
        assert got[2] == "B"
        assert _rows(spark, src) == [(1, "a"), (2, "b"), (3, "c")]
