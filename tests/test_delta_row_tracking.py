"""Delta ROW TRACKING (PROTOCOL.md Row Tracking): stable row ids
across the whole write surface — fresh rows derive baseRowId +
position, updates KEEP their row id (commit version bumps), rewrites
(OPTIMIZE, purge, CoW delete) materialize ids so they survive
byte-for-byte, and the high watermark rides the delta.rowTracking
domain metadata (checkpoint-safe)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from optimus_any2any_spark.sources.delta import (
    read_delta,
    read_delta_cdf,
    read_delta_row_tracking,
    replay_log,
)
from optimus_any2any_spark.streaming.delta_table import (
    _write_checkpoint,
    compact_delta,
    create_delta_table,
    delete_delta_keys,
    delete_delta_where,
    merge_delta_batch,
    purge_deletion_vectors,
    update_delta_where,
)


def _mk(spark, t, rows=None):
    create_delta_table(
        spark, t, "k long, v string, ts long", row_tracking=True
    )
    rows = rows or [(1, "a", 0), (2, "b", 0), (3, "c", 0)]
    df = (
        spark.createDataFrame(rows, "k long, v string, ts long")
        .repartitionByRange(1, "k")
        .sortWithinPartitions("k")
    )
    merge_delta_batch(spark, df, t, "k", "ts", batch_id=0)


def _rt(spark, t):
    return sorted(
        (r.k, r._row_id, r._row_commit_version)
        for r in read_delta_row_tracking(spark, t).collect()
    )


def _hwm(spark, t):
    st = replay_log(spark, t)
    return int(
        json.loads(st["domains"]["delta.rowTracking"])[
            "rowIdHighWaterMark"
        ]
    )


class TestAssignment:
    def test_first_merge_assigns_sequential_ids(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        assert _rt(spark, t) == [(1, 0, 1), (2, 1, 1), (3, 2, 1)]
        assert _hwm(spark, t) == 2

    def test_protocol_declares_features(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        proto = replay_log(spark, t)["protocol"]
        assert "rowTracking" in proto["writerFeatures"]
        assert "domainMetadata" in proto["writerFeatures"]
        assert proto["minWriterVersion"] == 7

    def test_update_keeps_id_bumps_commit_version(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "t")
        _mk(spark, t)
        upd = spark.createDataFrame(
            [(2, "B", 1), (9, "z", 1)], "k long, v string, ts long"
        )
        merge_delta_batch(spark, upd, t, "k", "ts", batch_id=1)
        got = _rt(spark, t)
        # carried rows keep (id, cv); the updated row keeps ITS id at
        # the new commit version; the insert takes a fresh id
        assert got[:3] == [(1, 0, 1), (2, 1, 2), (3, 2, 1)]
        k9 = got[3]
        assert k9[0] == 9 and k9[1] >= 3 and k9[2] == 2

    def test_plain_read_unaffected(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        rows = read_delta(spark, t).collect()
        assert "_row_id" not in rows[0].asDict()
        assert len(rows) == 3

    def test_non_rt_table_raises(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(1, "a", 0)], "k long, v string, ts long"
        )
        merge_delta_batch(spark, df, t, "k", "ts", batch_id=0)
        with pytest.raises(ValueError, match="row tracking"):
            read_delta_row_tracking(spark, t)

    def test_conditional_merge_carries_lineage(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        batch = spark.createDataFrame(
            [(1, "DEL", 1), (2, "UPD", 1), (9, "INS", 1)],
            "k long, v string, ts long",
        )
        merge_delta_batch(
            spark, batch, t, "k", "ts", batch_id=1,
            when_matched=[
                ("delete", "s.v = 'DEL'"),
                ("update", None, {"v": "s.v"}),
            ],
        )
        got = _rt(spark, t)
        # k=1 deleted; k=2 updated KEEPS id 1 at the new version;
        # k=3 passes through untouched... but its file was rewritten,
        # so it carries (id, cv) materialized; k=9 inserts fresh
        assert got[:2] == [(2, 1, 2), (3, 2, 1)]
        assert got[2][0] == 9 and got[2][1] >= 3 and got[2][2] == 2


class TestRewritesPreserve:
    def test_cow_delete_survivors_keep_ids(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        delete_delta_keys(
            spark, t, "k", spark.createDataFrame([(2,)], "k long")
        )
        assert _rt(spark, t) == [(1, 0, 1), (3, 2, 1)]

    def test_dv_delete_keeps_ids_without_rewrite(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        delete_delta_keys(
            spark, t, "k", spark.createDataFrame([(2,)], "k long"),
            use_deletion_vectors=True,
        )
        assert _rt(spark, t) == [(1, 0, 1), (3, 2, 1)]

    def test_purge_after_dv_preserves(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        delete_delta_keys(
            spark, t, "k", spark.createDataFrame([(2,)], "k long"),
            use_deletion_vectors=True,
        )
        purge_deletion_vectors(spark, t, key_col="k")
        assert _rt(spark, t) == [(1, 0, 1), (3, 2, 1)]

    def test_update_where_keeps_id_bumps_cv(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        v = update_delta_where(
            spark, t, {"v": "'B'"}, where="k = 2"
        )
        assert _rt(spark, t) == [(1, 0, 1), (2, 1, v), (3, 2, 1)]

    def test_delete_where_survivors_keep(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        delete_delta_where(spark, t, "k = 1")
        assert _rt(spark, t) == [(2, 1, 1), (3, 2, 1)]

    def test_optimize_preserves(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        merge_delta_batch(
            spark,
            spark.createDataFrame(
                [(4, "d", 1)], "k long, v string, ts long"
            ),
            t, "k", "ts", batch_id=1,
        )
        before = _rt(spark, t)
        assert compact_delta(spark, t, target_rows_per_file=1000)
        assert _rt(spark, t) == before

    def test_zorder_preserves(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        before = _rt(spark, t)
        assert compact_delta(
            spark, t, target_rows_per_file=2, zorder_by=["k", "ts"]
        )
        assert _rt(spark, t) == before


class TestDurability:
    def test_watermark_survives_checkpoint(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        _write_checkpoint(spark, t, replay_log(spark, t)["version"])
        assert _hwm(spark, t) == 2  # replay from the checkpoint
        merge_delta_batch(
            spark,
            spark.createDataFrame(
                [(7, "g", 1)], "k long, v string, ts long"
            ),
            t, "k", "ts", batch_id=1,
        )
        got = dict((k, rid) for k, rid, _ in _rt(spark, t))
        assert got[7] >= 3  # fresh id above the checkpointed watermark

    def test_cdf_composes_without_lineage_columns(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "t")
        create_delta_table(
            spark, t, "k long, v string, ts long", row_tracking=True
        )
        df = spark.createDataFrame(
            [(1, "a", 0), (2, "b", 0)], "k long, v string, ts long"
        )
        merge_delta_batch(
            spark, df, t, "k", "ts", batch_id=0, change_data=True
        )
        upd = spark.createDataFrame(
            [(2, "B", 1)], "k long, v string, ts long"
        )
        merge_delta_batch(
            spark, upd, t, "k", "ts", batch_id=1, change_data=True
        )
        changes = read_delta_cdf(spark, t, 0, 2)
        cols = set(changes.columns)
        assert "_change_type" in cols
        assert not any(c.startswith("_row-id") for c in cols)
        kinds = sorted(
            set(r._change_type for r in changes.collect())
        )
        assert kinds == ["insert", "update_postimage", "update_preimage"]

    def test_source_rider(self, spark, tmp_path):
        from optimus_any2any_spark.config import Config
        from optimus_any2any_spark.sources.builders import delta_source

        t = str(tmp_path / "t")
        _mk(spark, t)
        cfg = Config.from_env(
            env_args=[
                f"DELTA__SOURCE_URI=file://{t}",
                "DELTA__ROW_TRACKING=true",
            ],
            environ={},
        )
        rows = delta_source(spark, cfg).collect()
        assert sorted(r._row_id for r in rows) == [0, 1, 2]

    def test_time_travel_lineage(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        v1 = replay_log(spark, t)["version"]
        update_delta_where(spark, t, {"v": "'X'"}, where="k = 1")
        got = sorted(
            (r.k, r._row_id, r._row_commit_version)
            for r in read_delta_row_tracking(
                spark, t, version=v1
            ).collect()
        )
        assert got == [(1, 0, 1), (2, 1, 1), (3, 2, 1)]


class TestMergeSchemaComposes:
    def test_widen_keeps_ids_and_mints_fresh(self, spark, tmp_path):
        """VERDICT r10 follow-through: merge_schema on a row-tracking
        table (refusal lifted) — matched rows keep their id at the
        new version, inserts mint fresh ids from the baseRowId
        reservations, carried rows keep id AND version, and the new
        column null-fills pre-evolution rows."""
        t = str(tmp_path / "t")
        _mk(spark, t)
        before = {k: (i, cv) for k, i, cv in _rt(spark, t)}
        wide = spark.createDataFrame(
            [(2, "B", 1, "hot"), (9, "i", 1, "new")],
            "k long, v string, ts long, tag string",
        )
        merge_delta_batch(
            spark, wide, t, "k", "ts", batch_id=1, merge_schema=True
        )
        rows = {
            r.k: (r._row_id, r._row_commit_version, r.tag)
            for r in read_delta_row_tracking(spark, t).collect()
        }
        assert rows[2][0] == before[2][0]          # id kept
        assert rows[2][1] == before[2][1] + 1      # version bumped
        assert rows[2][2] == "hot"
        assert rows[1][0] == before[1][0]          # carried verbatim
        assert rows[1][2] is None                  # null-filled
        assert rows[9][0] not in {i for i, _, _ in rows.values() if False} \
            and rows[9][0] > max(i for i, _ in before.values())
        assert _hwm(spark, t) >= rows[9][0]

    def test_narrow_after_widen_nullfills(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        wide = spark.createDataFrame(
            [(2, "B", 1, "hot")],
            "k long, v string, ts long, tag string",
        )
        merge_delta_batch(
            spark, wide, t, "k", "ts", batch_id=1, merge_schema=True
        )
        narrow = spark.createDataFrame(
            [(1, "A2", 2)], "k long, v string, ts long"
        )
        merge_delta_batch(
            spark, narrow, t, "k", "ts", batch_id=2, merge_schema=True
        )
        rows = {
            r.k: (r.v, r.tag)
            for r in read_delta_row_tracking(spark, t).collect()
        }
        assert rows[1] == ("A2", None)
        assert rows[2] == ("B", "hot")


class TestBackfill:
    def test_enable_on_existing_table(self, spark, tmp_path):
        """Backfill (PROTOCOL.md Row Tracking enablement on an
        existing table): one metadata commit re-states every live add
        with a baseRowId reservation + defaultRowCommitVersion
        (dataChange false, zero data IO); ids derive immediately and
        every later writer preserves/mints as on a born-tracking
        table."""
        from optimus_any2any_spark.sources.delta import replay_log
        from optimus_any2any_spark.streaming.delta_table import (
            enable_delta_row_tracking,
        )

        t = str(tmp_path / "t")
        base = spark.createDataFrame(
            [(i, f"v{i}", 0) for i in range(1, 6)],
            "k long, v string, ts long",
        )
        merge_delta_batch(spark, base, t, "k", "ts", batch_id=0)
        v = enable_delta_row_tracking(spark, t)
        assert enable_delta_row_tracking(spark, t) == v  # idempotent
        rows = _rt(spark, t)
        assert [r[1] for r in rows] == [0, 1, 2, 3, 4]
        assert {r[2] for r in rows} == {v}
        assert _hwm(spark, t) == 4
        st = replay_log(spark, t)
        assert st["protocol"]["minWriterVersion"] == 7
        assert "rowTracking" in st["protocol"]["writerFeatures"]
        # post-backfill merge: matched keeps, insert mints fresh
        src = spark.createDataFrame(
            [(2, "V2", 1), (9, "v9", 1)], "k long, v string, ts long"
        )
        merge_delta_batch(spark, src, t, "k", "ts", batch_id=1)
        after = {k: i for k, i, _ in _rt(spark, t)}
        assert after[2] == 1 and after[9] > 4

    def test_enable_preserves_legacy_implied_features(
        self, spark, tmp_path
    ):
        """A legacy-versioned protocol (minWriterVersion 4, e.g. a
        generated-columns table) implies appendOnly/invariants/
        checkConstraints/changeDataFeed/generatedColumns by NUMBER;
        the v7 row-tracking upgrade must list them explicitly or
        external writers silently stop enforcing them
        (PROTOCOL.md: Table Features upgrade rule)."""
        from optimus_any2any_spark.streaming.delta_table import (
            enable_delta_row_tracking,
        )

        t = str(tmp_path / "t")
        create_delta_table(
            spark, t,
            "k long, v string, ts long, day string",
            generated={
                "day": (
                    "date_format(timestamp_seconds(ts), 'yyyy-MM-dd')"
                )
            },
        )
        df = spark.createDataFrame(
            [(1, "a", 0)], "k long, v string, ts long"
        )
        merge_delta_batch(spark, df, t, "k", "ts", batch_id=0)
        st0 = replay_log(spark, t)
        assert st0["protocol"]["minWriterVersion"] == 4
        enable_delta_row_tracking(spark, t)
        st = replay_log(spark, t)
        assert st["protocol"]["minWriterVersion"] == 7
        feats = set(st["protocol"]["writerFeatures"])
        assert {
            "appendOnly", "invariants", "checkConstraints",
            "changeDataFeed", "generatedColumns",
            "rowTracking", "domainMetadata",
        } <= feats
        # the generated column still enforces after the upgrade
        bad = spark.createDataFrame(
            [(2, "b", 0, "2099-01-01")],
            "k long, v string, ts long, day string",
        )
        with pytest.raises(ValueError, match="generat"):
            merge_delta_batch(spark, bad, t, "k", "ts", batch_id=1)

    def test_enable_missing_table_raises(self, spark, tmp_path):
        from optimus_any2any_spark.streaming.delta_table import (
            enable_delta_row_tracking,
        )

        with pytest.raises(ValueError, match="no _delta_log"):
            enable_delta_row_tracking(spark, str(tmp_path / "nope"))
