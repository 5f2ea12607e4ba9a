"""OPTIMIZE ... ZORDER BY (streaming/delta_table.compact_delta
zorder_by=[...]): Morton-key clustering over quantile buckets, so
min/max file stats prune on ANY z-ordered dimension — the multi-
column data-skipping layout linear clustering cannot give. Rows are
preserved exactly; the commit is dataChange:false with zOrderBy in
commitInfo."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from optimus_any2any_spark.sources.delta import read_delta, replay_log
from optimus_any2any_spark.streaming.delta_table import (
    compact_delta,
    merge_delta_batch,
)

N_SIDE = 64  # 64x64 grid = 4096 rows


def _grid(spark):
    """x-major grid: the merge key k = x*N + y, so the seed layout is
    LINEAR in x (each file spans all of y) — the layout z-ordering
    exists to fix."""
    return spark.range(N_SIDE * N_SIDE).select(
        F.col("id").alias("k"),
        (F.col("id") / N_SIDE).cast("long").alias("x"),
        (F.col("id") % N_SIDE).alias("y"),
        F.lit(0).cast("long").alias("ts"),
    )


def _mk(spark, t, per_file=256):
    merge_delta_batch(
        spark, _grid(spark), t, "k", "ts", batch_id=0,
        target_rows_per_file=per_file,
    )


def _overlaps(spark, t, col, lo, hi):
    """How many live files' [min,max] stats for ``col`` intersect
    [lo, hi] — the file count a stats-pruned scan must read."""
    live = replay_log(spark, t)["live"]
    n = 0
    for a in live.values():
        st = json.loads(a.get("stats") or "{}")
        mn = st.get("minValues", {}).get(col)
        mx = st.get("maxValues", {}).get(col)
        if mn is None or mx is None:
            n += 1  # no stats: conservatively read
        elif int(mn) <= hi and int(mx) >= lo:
            n += 1
    return n


class TestZOrderCorrectness:
    def test_rows_preserved_exactly(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        before = sorted(
            (r.k, r.x, r.y) for r in read_delta(spark, t).collect()
        )
        v = compact_delta(spark, t, 256, zorder_by=["x", "y"])
        assert v is not None
        after = sorted(
            (r.k, r.x, r.y) for r in read_delta(spark, t).collect()
        )
        assert after == before

    def test_commit_is_datachange_false_with_zorderby(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "t")
        _mk(spark, t)
        v = compact_delta(spark, t, 256, zorder_by=["x", "y"])
        log = os.path.join(t, "_delta_log", f"{v:020d}.json")
        actions = [json.loads(L) for L in open(log)]
        ci = next(a["commitInfo"] for a in actions if "commitInfo" in a)
        assert ci["operation"] == "OPTIMIZE"
        assert json.loads(
            ci["operationParameters"]["zOrderBy"]
        ) == ["x", "y"]
        for a in actions:
            if "add" in a:
                assert a["add"]["dataChange"] is False
            if "remove" in a:
                assert a["remove"]["dataChange"] is False

    def test_single_file_still_rewrites(self, spark, tmp_path):
        # linear compaction skips 1-file partitions; ZORDER must not —
        # re-clustering is the point
        t = str(tmp_path / "t")
        _mk(spark, t, per_file=100_000)  # one file
        assert len(replay_log(spark, t)["live"]) == 1
        assert compact_delta(spark, t, 256, zorder_by=["x", "y"])
        assert len(replay_log(spark, t)["live"]) >= 2

    def test_range_read_after_zorder_correct(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        compact_delta(spark, t, 256, zorder_by=["x", "y"])
        got = sorted(
            r.k
            for r in read_delta(
                spark, t, key_range=("y", 3, 5)
            ).collect()
        )
        assert got == sorted(
            x * N_SIDE + y
            for x in range(N_SIDE)
            for y in range(3, 6)
        )

    def test_unknown_column_raises(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        with pytest.raises(ValueError, match="unknown ZORDER"):
            compact_delta(spark, t, 256, zorder_by=["nope"])

    def test_string_column_refuses_by_name(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(1, "a", 0), (2, "b", 0)], "k long, s string, ts long"
        )
        merge_delta_batch(spark, df, t, "k", "ts", batch_id=0)
        with pytest.raises(NotImplementedError, match="ZORDER BY"):
            compact_delta(spark, t, 256, zorder_by=["s"])

    def test_partition_column_raises(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(1, 10, "p1", 0), (2, 20, "p2", 0)],
            "k long, v long, part string, ts long",
        )
        merge_delta_batch(
            spark, df, t, "k", "ts", batch_id=0, partition_by=["part"]
        )
        with pytest.raises(ValueError, match="partition column"):
            compact_delta(spark, t, 256, zorder_by=["part"])


class TestZOrderSkipping:
    def test_zorder_beats_linear_on_the_second_dimension(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "t")
        _mk(spark, t)  # 16 files, linear in x (k = x-major)
        n_files = len(replay_log(spark, t)["live"])
        assert n_files >= 8
        # linear layout: every file spans the full y range — a y-slice
        # query must read everything
        lin_y = _overlaps(spark, t, "y", 0, N_SIDE // 8 - 1)
        assert lin_y == n_files
        compact_delta(spark, t, 256, zorder_by=["x", "y"])
        z_files = len(replay_log(spark, t)["live"])
        z_y = _overlaps(spark, t, "y", 0, N_SIDE // 8 - 1)
        # z-ordered files cover compact rectangles: the same y-slice
        # now skips most files
        assert z_y < n_files
        assert z_y <= z_files // 2
        # and the FIRST dimension still prunes too
        z_x = _overlaps(spark, t, "x", 0, N_SIDE // 8 - 1)
        assert z_x <= z_files // 2

    def test_partitioned_zorder(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = _grid(spark).withColumn(
            "part", (F.col("k") % 2).cast("string")
        )
        merge_delta_batch(
            spark, df, t, "k", "ts", batch_id=0,
            target_rows_per_file=256, partition_by=["part"],
        )
        before = sorted(
            (r.k, r.part)
            for r in read_delta(spark, t).collect()
        )
        assert compact_delta(spark, t, 256, zorder_by=["x", "y"])
        after = sorted(
            (r.k, r.part)
            for r in read_delta(spark, t).collect()
        )
        assert after == before
        z_y = _overlaps(spark, t, "y", 0, N_SIDE // 8 - 1)
        assert z_y < len(replay_log(spark, t)["live"])


class TestZOrderRider:
    def test_sink_rider(self, spark, tmp_path):
        from optimus_any2any_spark.config import Config
        from optimus_any2any_spark.pipeline import Pipeline

        t = str(tmp_path / "t")
        _mk(spark, t)
        src = tmp_path / "trigger.json"
        src.write_text('{"k": 0}\n')
        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                f"DELTA__SINK_URI=file://{t}",
                "DELTA__MODE=DELETE_WHERE",
                "DELTA__PREDICATE=k < 0",  # no-op DML, rider fires
                "DELTA__OPTIMIZE_ROWS=256",
                "DELTA__OPTIMIZE_ZORDER=x,y",
            ],
            environ={},
        )
        Pipeline(spark, "FILE", ["DELTA"], cfg).run()
        log = replay_log(spark, t)
        z_y = _overlaps(spark, t, "y", 0, N_SIDE // 8 - 1)
        assert z_y < len(log["live"])
