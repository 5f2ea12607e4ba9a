"""Iceberg rewrite_data_files ZORDER strategy (compact_iceberg
zorder_by=[...]): the shared Morton-key clustering, with Appendix-D
bounds recorded for EVERY z-ordered column so key_range reads prune
on any dimension; deletes compose (z-order reads through the
merge-on-read path); identity partition sources refuse."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from optimus_any2any_spark.sources.iceberg import (
    _snapshot_entries,
    load_table_metadata,
    read_iceberg,
)
from optimus_any2any_spark.streaming.iceberg_table import (
    _key_field,
    compact_iceberg,
    decode_bound,
    delete_iceberg_where,
    merge_iceberg_batch,
)

N_SIDE = 64


def _grid(spark):
    """x-major grid: merge key k = x*N + y → seed files are linear in
    x and span the full y range."""
    return spark.range(N_SIDE * N_SIDE).select(
        F.col("id").alias("k"),
        (F.col("id") / N_SIDE).cast("long").alias("x"),
        (F.col("id") % N_SIDE).alias("y"),
        F.lit(0).cast("long").alias("ts"),
    )


def _mk(spark, t, per_file=256):
    merge_iceberg_batch(
        spark, _grid(spark), t, "k", "ts", batch_id=0,
        target_rows_per_file=per_file,
    )


def _overlaps(spark, t, col, lo, hi):
    """Files whose recorded bounds for ``col`` intersect [lo, hi]."""
    meta = load_table_metadata(t)
    fid, ice_t = _key_field(meta, col)
    data, _, _ = _snapshot_entries(t, meta)
    n = 0
    for e in data:
        lb = {
            int(kv["key"]): kv["value"]
            for kv in (e.get("lower_bounds") or [])
        }
        ub = {
            int(kv["key"]): kv["value"]
            for kv in (e.get("upper_bounds") or [])
        }
        mn = decode_bound(ice_t, lb.get(fid))
        mx = decode_bound(ice_t, ub.get(fid))
        if mn is None or mx is None:
            n += 1  # no bounds: conservatively read
        elif mn <= hi and mx >= lo:
            n += 1
    return n


def _rows(spark, t):
    return sorted(
        (r.k, r.x, r.y) for r in read_iceberg(spark, t).collect()
    )


class TestIcebergZOrder:
    def test_rows_preserved_exactly(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        before = _rows(spark, t)
        v = compact_iceberg(spark, t, 256, zorder_by=["x", "y"])
        assert v is not None
        assert _rows(spark, t) == before

    def test_second_dimension_prunes(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        meta = load_table_metadata(t)
        data, _, _ = _snapshot_entries(t, meta)
        n_files = len(data)
        assert n_files >= 8
        compact_iceberg(spark, t, 256, zorder_by=["x", "y"])
        data, _, _ = _snapshot_entries(t, load_table_metadata(t))
        z_files = len(data)
        z_y = _overlaps(spark, t, "y", 0, N_SIDE // 8 - 1)
        z_x = _overlaps(spark, t, "x", 0, N_SIDE // 8 - 1)
        assert z_y <= z_files // 2
        assert z_x <= z_files // 2

    def test_key_range_read_after_zorder(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        compact_iceberg(spark, t, 256, zorder_by=["x", "y"])
        got = sorted(
            r.k
            for r in read_iceberg(
                spark, t, key_range=("y", 3, 5)
            ).collect()
        )
        assert got == sorted(
            x * N_SIDE + y
            for x in range(N_SIDE)
            for y in range(3, 6)
        )

    def test_deletes_compose(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        delete_iceberg_where(spark, t, "k % 5 = 0")
        compact_iceberg(spark, t, 256, zorder_by=["x", "y"])
        got = sorted(r.k for r in read_iceberg(spark, t).collect())
        assert got == [
            k for k in range(N_SIDE * N_SIDE) if k % 5 != 0
        ]
        # the rewrite retires the consumed positional deletes
        _, pos, _ = _snapshot_entries(t, load_table_metadata(t))
        assert not pos

    def test_summary_records_zorder(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        compact_iceberg(spark, t, 256, zorder_by=["x", "y"])
        snap = load_table_metadata(t)["snapshots"][-1]
        assert snap["summary"]["operation"] == "replace"
        assert json.loads(snap["summary"]["zorder-by"]) == ["x", "y"]

    def test_single_file_still_rewrites(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t, per_file=100_000)
        data, _, _ = _snapshot_entries(t, load_table_metadata(t))
        assert len(data) == 1
        assert compact_iceberg(spark, t, 256, zorder_by=["x", "y"])
        data, _, _ = _snapshot_entries(t, load_table_metadata(t))
        assert len(data) >= 2

    def test_unknown_column_raises(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _mk(spark, t)
        with pytest.raises(ValueError, match="unknown ZORDER"):
            compact_iceberg(spark, t, 256, zorder_by=["nope"])

    def test_identity_partition_source_refuses(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = _grid(spark).withColumn(
            "part", (F.col("k") % 2).cast("string")
        )
        merge_iceberg_batch(
            spark, df, t, "k", "ts", batch_id=0,
            target_rows_per_file=256, partition_by=["part"],
        )
        with pytest.raises(ValueError, match="identity partition"):
            compact_iceberg(spark, t, 256, zorder_by=["part"])

    def test_partitioned_zorder_on_data_columns(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = _grid(spark).withColumn(
            "part", (F.col("k") % 2).cast("string")
        )
        merge_iceberg_batch(
            spark, df, t, "k", "ts", batch_id=0,
            target_rows_per_file=256, partition_by=["part"],
        )
        before = sorted(
            (r.k, r.part)
            for r in read_iceberg(spark, t).collect()
        )
        assert compact_iceberg(spark, t, 256, zorder_by=["x", "y"])
        after = sorted(
            (r.k, r.part)
            for r in read_iceberg(spark, t).collect()
        )
        assert after == before

    def test_sink_rider(self, spark, tmp_path):
        from optimus_any2any_spark.config import Config
        from optimus_any2any_spark.pipeline import Pipeline

        t = str(tmp_path / "t")
        _mk(spark, t)
        src = tmp_path / "trigger.json"
        src.write_text('{"k": -1}\n')
        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                f"ICEBERG__SINK_URI=file://{t}",
                "ICEBERG__MODE=DELETE_WHERE",
                "ICEBERG__PREDICATE=k < 0",  # no-op DML, rider fires
                "ICEBERG__OPTIMIZE_ROWS=256",
                "ICEBERG__OPTIMIZE_ZORDER=x,y",
            ],
            environ={},
        )
        Pipeline(spark, "FILE", ["ICEBERG"], cfg).run()
        data, _, _ = _snapshot_entries(t, load_table_metadata(t))
        z_y = _overlaps(spark, t, "y", 0, N_SIDE // 8 - 1)
        assert z_y < len(data)
