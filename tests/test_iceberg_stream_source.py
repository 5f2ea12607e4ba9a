"""Iceberg table as a readStream source (sources/iceberg_stream.py):
snapshot-ordinal offsets, incremental micro-batches, append contract."""

from __future__ import annotations

import time

import pytest

from optimus_any2any_spark.sources.iceberg import write_iceberg_commit
from optimus_any2any_spark.sources.iceberg_stream import (
    IcebergTailDataSource,
)


def _rows(spark, vals):
    return spark.createDataFrame(vals, "id long, v string")


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(IcebergTailDataSource)
    return spark


def _run_available(spark, t, ckpt, out):
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


class TestIcebergTailSource:
    def test_incremental_snapshots_across_runs(self, registered, tmp_path):
        spark = registered
        t = str(tmp_path / "tbl")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        write_iceberg_commit(_rows(spark, [(1, "a")]), t)
        write_iceberg_commit(_rows(spark, [(2, "b")]), t)
        _run_available(spark, t, ckpt, out)
        got = sorted(
            (r.id, r.v) for r in spark.read.parquet(out).collect()
        )
        assert got == [(1, "a"), (2, "b")]
        write_iceberg_commit(_rows(spark, [(3, "c")]), t)
        _run_available(spark, t, ckpt, out)
        got = sorted(
            (r.id, r.v) for r in spark.read.parquet(out).collect()
        )
        assert got == [(1, "a"), (2, "b"), (3, "c")]

    def test_starting_snapshot_skips_history(self, registered, tmp_path):
        spark = registered
        t = str(tmp_path / "tbl")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        write_iceberg_commit(_rows(spark, [(1, "a")]), t)
        write_iceberg_commit(_rows(spark, [(2, "b")]), t)
        q = (
            spark.readStream.format("iceberg_tail")
            .option("path", t)
            .option("startingSnapshotId", 1)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        import time as _t

        _t.sleep(0.2)
        got = [(r.id, r.v) for r in spark.read.parquet(out).collect()]
        assert got == [(2, "b")]

    def test_overwrite_snapshot_fails_stream(self, registered, tmp_path):
        from optimus_any2any_spark.streaming.iceberg_table import (
            merge_iceberg_batch,
        )

        spark = registered
        t = str(tmp_path / "tbl")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        kv = spark.createDataFrame([(1, "a", 0)], "k long, v string, ts long")
        merge_iceberg_batch(spark, kv, t, "k", "ts")
        kv2 = spark.createDataFrame(
            [(1, "A", 1)], "k long, v string, ts long"
        )
        merge_iceberg_batch(spark, kv2, t, "k", "ts")  # overwrite snap
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
        with pytest.raises(Exception, match="append stream contract"):
            q.awaitTermination(120)
            if q.exception() is not None:
                raise q.exception()


class TestSnapshotIdOffsets:
    """Offsets are keyed by snapshot-id, not lineage position — stable
    under snapshot expiration; an id gone from the lineage raises
    instead of silently re-delivering/skipping (ADVICE r4)."""

    def test_offsets_carry_snapshot_ids(self, registered, tmp_path):
        from optimus_any2any_spark.sources.iceberg_stream import (
            IcebergTailStreamReader,
        )

        spark = registered
        t = str(tmp_path / "tbl")
        write_iceberg_commit(_rows(spark, [(1, "a")]), t)
        write_iceberg_commit(_rows(spark, [(2, "b")]), t)
        rdr = IcebergTailStreamReader.__new__(IcebergTailStreamReader)
        rdr.table_path = t
        rdr.start_sid = None
        assert rdr.initialOffset() == {"sid": None}
        latest = rdr.latestOffset()
        assert isinstance(latest["sid"], int)
        # full window: both snapshots' files
        full = rdr.partitions({"sid": None}, latest)
        assert len(full) >= 2
        # resuming AT the latest id yields an empty window
        assert rdr.partitions(latest, latest) == []

    def test_expired_snapshot_id_raises(self, registered, tmp_path):
        from optimus_any2any_spark.sources.iceberg_stream import (
            IcebergTailStreamReader,
        )

        spark = registered
        t = str(tmp_path / "tbl")
        write_iceberg_commit(_rows(spark, [(1, "a")]), t)
        rdr = IcebergTailStreamReader.__new__(IcebergTailStreamReader)
        rdr.table_path = t
        rdr.start_sid = None
        latest = rdr.latestOffset()
        gone = {"sid": 999999999}  # never in the lineage
        with pytest.raises(ValueError, match="no longer in the table"):
            rdr.partitions(gone, latest)

    def test_legacy_positional_offsets_still_accepted(
        self, registered, tmp_path
    ):
        from optimus_any2any_spark.sources.iceberg_stream import (
            IcebergTailStreamReader,
        )

        spark = registered
        t = str(tmp_path / "tbl")
        write_iceberg_commit(_rows(spark, [(1, "a")]), t)
        write_iceberg_commit(_rows(spark, [(2, "b")]), t)
        rdr = IcebergTailStreamReader.__new__(IcebergTailStreamReader)
        rdr.table_path = t
        rdr.start_sid = None
        latest = rdr.latestOffset()
        full = rdr.partitions({"sid": None}, latest)
        part = rdr.partitions({"pos": 1}, latest)  # skip snapshot 1
        assert 0 < len(part) < len(full)
