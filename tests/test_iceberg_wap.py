"""Iceberg WAP — write-audit-publish (spark.wap.branch +
fast_forward): branch-targeted appends stay invisible to main until
publish_iceberg_branch fast-forwards; main-advancing writers refuse
while a branch holds unpublished commits (single-flight discipline
keeps the snapshot list a linear history)."""

from __future__ import annotations

import pytest

from optimus_any2any_spark.sources.iceberg import (
    load_table_metadata,
    read_iceberg,
    read_iceberg_changes,
    write_iceberg_commit,
)
from optimus_any2any_spark.streaming.iceberg_table import (
    compact_iceberg,
    delete_iceberg_keys,
    drop_iceberg_ref,
    merge_iceberg_batch,
    publish_iceberg_branch,
)


def _rows(spark, vals):
    return spark.createDataFrame(vals, "id long, v string")


def _read(spark, t, **kw):
    return sorted(
        (r.id, r.v) for r in read_iceberg(spark, t, **kw).collect()
    )


class TestWapFlow:
    def test_branch_write_audit_publish(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        write_iceberg_commit(_rows(spark, [(1, "a"), (2, "b")]), t)
        write_iceberg_commit(
            _rows(spark, [(3, "c")]), t, branch="audit"
        )
        # main (and every default reader) sees NOTHING yet
        assert _read(spark, t) == [(1, "a"), (2, "b")]
        assert read_iceberg_changes(spark, t).count() == 2
        # the branch read sees the staged data
        assert _read(spark, t, ref="audit") == [
            (1, "a"), (2, "b"), (3, "c"),
        ]
        meta = load_table_metadata(t)
        assert meta["refs"]["audit"]["type"] == "branch"
        # publish: main fast-forwards atomically
        publish_iceberg_branch(spark, t, "audit", drop_branch=True)
        assert _read(spark, t) == [(1, "a"), (2, "b"), (3, "c")]
        assert "audit" not in (load_table_metadata(t).get("refs") or {})
        # the changelog now reports the published snapshot's inserts
        assert read_iceberg_changes(spark, t).count() == 3

    def test_branch_commits_stack(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        write_iceberg_commit(_rows(spark, [(1, "a")]), t)
        write_iceberg_commit(_rows(spark, [(2, "b")]), t, branch="w")
        write_iceberg_commit(_rows(spark, [(3, "c")]), t, branch="w")
        assert _read(spark, t) == [(1, "a")]
        assert _read(spark, t, ref="w") == [
            (1, "a"), (2, "b"), (3, "c"),
        ]
        publish_iceberg_branch(spark, t, "w")
        assert _read(spark, t) == [(1, "a"), (2, "b"), (3, "c")]
        # publish again: no-op, no version burn
        v = publish_iceberg_branch(spark, t, "w")
        assert publish_iceberg_branch(spark, t, "w") == v

    def test_main_writers_refuse_while_unpublished(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "tbl")
        write_iceberg_commit(_rows(spark, [(1, "a"), (2, "b")]), t)
        write_iceberg_commit(_rows(spark, [(3, "c")]), t, branch="w")
        with pytest.raises(ValueError, match="unpublished"):
            write_iceberg_commit(_rows(spark, [(9, "z")]), t)
        with pytest.raises(ValueError, match="unpublished"):
            merge_iceberg_batch(
                spark,
                spark.createDataFrame(
                    [(1, "A", 1)], "id long, v string, ts long"
                ),
                t, "id", "ts", batch_id=1,
            )
        with pytest.raises(ValueError, match="unpublished"):
            delete_iceberg_keys(
                spark, t, "id",
                spark.createDataFrame([(1,)], "id long"),
            )
        with pytest.raises(ValueError, match="unpublished"):
            compact_iceberg(spark, t, target_rows_per_file=10)
        # dropping the branch clears the gate
        drop_iceberg_ref(spark, t, "w")
        write_iceberg_commit(_rows(spark, [(9, "z")]), t)
        assert _read(spark, t) == [(1, "a"), (2, "b"), (9, "z")]

    def test_publish_guards(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        write_iceberg_commit(_rows(spark, [(1, "a")]), t)
        with pytest.raises(ValueError, match="no branch"):
            publish_iceberg_branch(spark, t, "nope")
        # a tag is not publishable
        from optimus_any2any_spark.streaming.iceberg_table import (
            set_iceberg_ref,
        )

        set_iceberg_ref(spark, t, "v1", ref_type="tag")
        with pytest.raises(ValueError, match="no branch"):
            publish_iceberg_branch(spark, t, "v1")

    def test_post_publish_lifecycle(self, spark, tmp_path):
        """After publish the table is an ordinary linear table: MoR
        delete, merge and the changelog all run."""
        t = str(tmp_path / "tbl")
        write_iceberg_commit(_rows(spark, [(1, "a"), (2, "b")]), t)
        write_iceberg_commit(
            _rows(spark, [(3, "c"), (4, "d")]), t, branch="w"
        )
        publish_iceberg_branch(spark, t, "w", drop_branch=True)
        delete_iceberg_keys(
            spark, t, "id", spark.createDataFrame([(2,)], "id long")
        )
        assert _read(spark, t) == [(1, "a"), (3, "c"), (4, "d")]
        ch = sorted(
            (r._change_type, r.id)
            for r in read_iceberg_changes(spark, t).collect()
        )
        assert ch == [
            ("DELETE", 2),
            ("INSERT", 1), ("INSERT", 2),
            ("INSERT", 3), ("INSERT", 4),
        ]

    def test_lineage_table_branch_write(self, spark, tmp_path):
        """Row lineage composes: branch appends consume global
        next-row-id, so published ids are unique and ordered."""
        t = str(tmp_path / "tbl")
        df1 = (
            spark.createDataFrame(
                [(1, "a", 0), (2, "b", 0)], "k long, v string, ts long"
            ).repartitionByRange(1, "k").sortWithinPartitions("k")
        )
        write_iceberg_commit(df1, t, row_lineage=True)
        df2 = (
            spark.createDataFrame(
                [(3, "c", 0)], "k long, v string, ts long"
            ).repartitionByRange(1, "k")
        )
        write_iceberg_commit(df2, t, branch="w")
        publish_iceberg_branch(spark, t, "w", drop_branch=True)
        got = sorted(
            (r.k, r._row_id)
            for r in read_iceberg(
                spark, t, row_lineage=True
            ).collect()
        )
        assert got == [(1, 0), (2, 1), (3, 2)]
        assert load_table_metadata(t)["next-row-id"] == 3


class TestWapStreams:
    def test_stream_never_leaks_unpublished(self, spark, tmp_path):
        """iceberg_tail caps its offset window at the MAIN head:
        unpublished branch snapshots are invisible to the stream and
        flow only after publish."""
        import time

        from optimus_any2any_spark.sources.iceberg_stream import (
            IcebergTailDataSource,
        )

        spark.dataSource.register(IcebergTailDataSource)
        t = str(tmp_path / "tbl")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        write_iceberg_commit(_rows(spark, [(1, "a")]), t)
        write_iceberg_commit(_rows(spark, [(2, "b")]), t, branch="w")

        def run():
            q = (
                spark.readStream.format("iceberg_tail")
                .option("path", t)
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            time.sleep(0.2)

        run()
        got = sorted(r.id for r in spark.read.parquet(out).collect())
        assert got == [1]  # the staged snapshot did NOT stream
        publish_iceberg_branch(spark, t, "w", drop_branch=True)
        run()
        got = sorted(r.id for r in spark.read.parquet(out).collect())
        assert got == [1, 2]  # delivered exactly once, after publish


class TestWapSingleFlight:
    def test_second_branch_refuses(self, spark, tmp_path):
        """Review finding: two concurrent branches would leak — the
        first publish bakes the OTHER branch's snapshots into main's
        positional history. One unpublished branch at a time."""
        t = str(tmp_path / "tbl")
        write_iceberg_commit(_rows(spark, [(1, "a")]), t)
        write_iceberg_commit(_rows(spark, [(2, "b")]), t, branch="a")
        with pytest.raises(ValueError, match="unpublished"):
            write_iceberg_commit(
                _rows(spark, [(3, "c")]), t, branch="b"
            )
        # the SAME branch keeps stacking fine
        write_iceberg_commit(_rows(spark, [(4, "d")]), t, branch="a")
        publish_iceberg_branch(spark, t, "a", drop_branch=True)
        assert _read(spark, t) == [(1, "a"), (2, "b"), (4, "d")]

    def test_fresh_table_branch_streams_nothing(self, spark, tmp_path):
        """Review finding: current-snapshot-id == -1 bypassed the
        stream's main-head cap — a fresh table whose only commits are
        on a branch must stream NOTHING before publish."""
        import time

        from optimus_any2any_spark.sources.iceberg_stream import (
            IcebergTailDataSource,
        )

        spark.dataSource.register(IcebergTailDataSource)
        t = str(tmp_path / "tbl")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        write_iceberg_commit(
            _rows(spark, [(1, "a")]), t, branch="w"
        )

        def run():
            q = (
                spark.readStream.format("iceberg_tail")
                .option("path", t)
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            time.sleep(0.2)

        run()
        import glob as _g
        import os as _os
        files = [
            f for f in _g.glob(_os.path.join(out, "*.parquet"))
            if _os.path.getsize(f) > 0
        ]
        got = (
            sorted(r.id for r in spark.read.parquet(out).collect())
            if files
            else []
        )
        assert got == []
        publish_iceberg_branch(spark, t, "w")
        run()
        got = sorted(r.id for r in spark.read.parquet(out).collect())
        assert got == [1]

    def test_tail_stream_skips_replace_snapshots(self, spark, tmp_path):
        """Review finding: the tail stream raised on 'replace'
        snapshots — a running stream crossing a compaction or
        rewrite_manifests died. It now skips them (no logical rows),
        like the changes reader."""
        import time

        from optimus_any2any_spark.sources.iceberg_stream import (
            IcebergTailDataSource,
        )
        from optimus_any2any_spark.streaming.iceberg_table import (
            compact_iceberg,
            rewrite_iceberg_manifests,
        )

        spark.dataSource.register(IcebergTailDataSource)
        t = str(tmp_path / "tbl")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        write_iceberg_commit(_rows(spark, [(1, "a")]), t)
        write_iceberg_commit(_rows(spark, [(2, "b")]), t)

        def run():
            q = (
                spark.readStream.format("iceberg_tail")
                .option("path", t)
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            time.sleep(0.2)

        run()
        assert compact_iceberg(
            spark, t, target_rows_per_file=1000, key_col="id"
        )
        assert rewrite_iceberg_manifests(spark, t, min_manifests=1)
        write_iceberg_commit(_rows(spark, [(3, "c")]), t)
        run()  # crosses the replace snapshots without dying
        got = sorted(r.id for r in spark.read.parquet(out).collect())
        assert got == [1, 2, 3]  # rewritten rows never re-deliver
