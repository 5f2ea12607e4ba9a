"""Iceberg v2 row-level deletes on the snapshot-read path
(sources/iceberg.py): positional and equality delete files apply as
sequence-gated anti-joins (merge-on-read); a row re-inserted AFTER a
delete stays alive; the append-tail surfaces still reject deletes."""

from __future__ import annotations

import os

import pytest

from optimus_any2any_spark.sources.iceberg import (
    _snapshot_entries,
    load_table_metadata,
    read_iceberg,
    read_iceberg_appends,
    write_iceberg_commit,
    write_iceberg_delete_commit,
)


def _rows(spark, vals):
    return spark.createDataFrame(vals, "k long, v string")


def _snap(spark, t):
    return sorted((r.k, r.v) for r in read_iceberg(spark, t).collect())


def _data_paths(t):
    meta = load_table_metadata(t)
    data, _pos, _eq = _snapshot_entries(t, meta)
    return sorted(d["orig"] for d in data)


class TestPositionalDeletes:
    def test_rows_removed_by_file_and_position(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        write_iceberg_commit(
            _rows(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1), t
        )
        (path,) = _data_paths(t)
        # delete row positions 0 and 2 of the single (sorted-write)
        # data file
        write_iceberg_delete_commit(
            spark, t, pos_deletes=[(path, 0), (path, 2)]
        )
        kept = read_iceberg(spark, t).collect()
        assert len(kept) == 1

    def test_delete_only_targets_named_file(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        write_iceberg_commit(_rows(spark, [(1, "a")]).coalesce(1), t)
        write_iceberg_commit(_rows(spark, [(2, "b")]).coalesce(1), t)
        p1, p2 = _data_paths(t)
        write_iceberg_delete_commit(spark, t, pos_deletes=[(p1, 0)])
        kept = {(r.k, r.v) for r in read_iceberg(spark, t).collect()}
        assert len(kept) == 1  # only the named file's row 0 went

    def test_reinsert_after_delete_survives(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        write_iceberg_commit(_rows(spark, [(1, "old")]).coalesce(1), t)
        (path,) = _data_paths(t)
        write_iceberg_delete_commit(spark, t, pos_deletes=[(path, 0)])
        # append AFTER the delete: higher sequence number, must live
        write_iceberg_commit(_rows(spark, [(1, "new")]).coalesce(1), t)
        assert _snap(spark, t) == [(1, "new")]

    def test_time_travel_before_delete_sees_rows(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        write_iceberg_commit(
            _rows(spark, [(1, "a"), (2, "b")]).coalesce(1), t
        )
        (path,) = _data_paths(t)
        write_iceberg_delete_commit(spark, t, pos_deletes=[(path, 0)])
        assert len(read_iceberg(spark, t).collect()) == 1
        assert len(read_iceberg(spark, t, snapshot_id=1).collect()) == 2


class TestEqualityDeletes:
    def test_matching_rows_removed(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        write_iceberg_commit(
            _rows(spark, [(1, "a"), (2, "b"), (3, "a")]).coalesce(1), t
        )
        write_iceberg_delete_commit(
            spark, t, eq_deletes=(["v"], [("a",)])
        )
        assert _snap(spark, t) == [(2, "b")]

    def test_multi_column_equality(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        write_iceberg_commit(
            _rows(spark, [(1, "a"), (1, "b"), (2, "a")]).coalesce(1), t
        )
        write_iceberg_delete_commit(
            spark, t, eq_deletes=(["k", "v"], [(1, "a")])
        )
        assert _snap(spark, t) == [(1, "b"), (2, "a")]

    def test_equality_reinsert_survives(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        write_iceberg_commit(_rows(spark, [(5, "x")]).coalesce(1), t)
        write_iceberg_delete_commit(
            spark, t, eq_deletes=(["k"], [(5,)])
        )
        write_iceberg_commit(_rows(spark, [(5, "back")]).coalesce(1), t)
        assert _snap(spark, t) == [(5, "back")]

    def test_both_kinds_in_one_commit(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        write_iceberg_commit(
            _rows(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1), t
        )
        (path,) = _data_paths(t)
        write_iceberg_delete_commit(
            spark, t,
            pos_deletes=[(path, 0)],
            eq_deletes=(["v"], [("c",)]),
        )
        assert _snap(spark, t) == [(2, "b")]


class TestAppendPreservesV2Metadata:
    def test_append_after_delete_keeps_format_and_sequence(
        self, spark, tmp_path
    ):
        # ADVICE r6: an append after a row-level delete must NOT
        # downgrade the table to format-version 1 or drop the
        # sequence chain — external readers would resurrect rows
        t = str(tmp_path / "tbl")
        write_iceberg_commit(
            _rows(spark, [(1, "a"), (2, "b")]).coalesce(1), t
        )
        write_iceberg_delete_commit(
            spark, t, eq_deletes=(["k"], [(1,)])
        )
        write_iceberg_commit(_rows(spark, [(9, "z")]).coalesce(1), t)
        meta = load_table_metadata(t)
        assert int(meta["format-version"]) == 2
        snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
        cur = snaps[meta["current-snapshot-id"]]
        assert cur["sequence-number"] == meta["last-sequence-number"]
        # the append outranks the delete snapshot's sequence number
        delete_seq = next(
            s["sequence-number"]
            for s in meta["snapshots"]
            if s.get("summary", {}).get("operation") == "delete"
        )
        assert cur["sequence-number"] > delete_seq
        assert _snap(spark, t) == [(2, "b"), (9, "z")]


class TestAppendSurfacesStillReject:
    def test_appends_reader_rejects_delete_manifests(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        write_iceberg_commit(_rows(spark, [(1, "a")]).coalesce(1), t)
        (path,) = _data_paths(t)
        write_iceberg_delete_commit(spark, t, pos_deletes=[(path, 0)])
        with pytest.raises((NotImplementedError, ValueError)):
            read_iceberg_appends(spark, t, None, 2).collect()


class TestEqualityDeleteWriter:
    """delete_iceberg_keys: one distributed equality-delete file per
    commit, no data file read or rewritten, seq-gated so later appends
    with the same keys survive."""

    def test_rows_gone_files_untouched(self, spark, tmp_path):
        from optimus_any2any_spark.streaming.iceberg_table import (
            delete_iceberg_keys,
        )

        t = str(tmp_path / "tbl")
        write_iceberg_commit(
            _rows(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1), t
        )
        before = {
            p: os.path.getmtime(
                os.path.join(t, p)
            )
            for p in _data_paths(t)
        }
        delete_iceberg_keys(
            spark, t, "k", spark.createDataFrame([(2,)], "k long")
        )
        assert _snap(spark, t) == [(1, "a"), (3, "c")]
        for p, mt in before.items():
            assert os.path.getmtime(os.path.join(t, p)) == mt

    def test_later_append_with_same_key_survives(self, spark, tmp_path):
        from optimus_any2any_spark.streaming.iceberg_table import (
            delete_iceberg_keys,
        )

        t = str(tmp_path / "tbl")
        write_iceberg_commit(_rows(spark, [(5, "old")]).coalesce(1), t)
        delete_iceberg_keys(
            spark, t, "k", spark.createDataFrame([(5,)], "k long")
        )
        write_iceberg_commit(_rows(spark, [(5, "new")]).coalesce(1), t)
        assert _snap(spark, t) == [(5, "new")]

    def test_idempotent_by_batch_id(self, spark, tmp_path):
        from optimus_any2any_spark.streaming.iceberg_table import (
            delete_iceberg_keys,
        )

        t = str(tmp_path / "tbl")
        write_iceberg_commit(
            _rows(spark, [(1, "a"), (2, "b")]).coalesce(1), t
        )
        v1 = delete_iceberg_keys(
            spark, t, "k", spark.createDataFrame([(1,)], "k long"),
            batch_id=7,
        )
        v2 = delete_iceberg_keys(
            spark, t, "k", spark.createDataFrame([(2,)], "k long"),
            batch_id=7,  # redelivery: must be a no-op
        )
        assert v2 == v1
        assert _snap(spark, t) == [(2, "b")]

    def test_empty_key_set_is_noop(self, spark, tmp_path):
        from optimus_any2any_spark.streaming.iceberg_table import (
            delete_iceberg_keys,
        )

        t = str(tmp_path / "tbl")
        write_iceberg_commit(_rows(spark, [(1, "a")]).coalesce(1), t)
        v = delete_iceberg_keys(
            spark, t, "k",
            spark.createDataFrame([], "k long"),
        )
        assert v == 1
        assert _snap(spark, t) == [(1, "a")]

    def test_merge_refuses_deleted_tables(self, spark, tmp_path):
        from optimus_any2any_spark.streaming.iceberg_table import (
            delete_iceberg_keys,
            merge_iceberg_batch,
        )

        t = str(tmp_path / "tbl")
        write_iceberg_commit(
            spark.createDataFrame(
                [(1, "a", 0)], "k long, v string, ts long"
            ).coalesce(1),
            t,
        )
        delete_iceberg_keys(
            spark, t, "k", spark.createDataFrame([(1,)], "k long")
        )
        batch = spark.createDataFrame(
            [(2, "b", 0)], "k long, v string, ts long"
        )
        with pytest.raises(NotImplementedError, match="delete manifests"):
            merge_iceberg_batch(spark, batch, t, "k", "ts")
