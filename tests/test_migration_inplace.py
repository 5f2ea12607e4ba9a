"""In-place migration surfaces: CONVERT TO DELTA (delta-spark) and
Iceberg add_files — existing parquet enters the table as driver-side
metadata work (footer-read counts, zero data movement); every writer
then applies."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from optimus_any2any_spark.sources.delta import read_delta, replay_log
from optimus_any2any_spark.sources.iceberg import (
    add_iceberg_files,
    load_table_metadata,
    read_iceberg,
    write_iceberg_commit,
)
from optimus_any2any_spark.streaming.delta_table import (
    convert_parquet_to_delta,
    delete_delta_where,
    merge_delta_batch,
)
from optimus_any2any_spark.streaming.iceberg_table import (
    delete_iceberg_keys,
    merge_iceberg_batch,
)


class TestConvertToDelta:
    def test_unpartitioned_convert_and_write(self, spark, tmp_path):
        d = str(tmp_path / "lake")
        src = spark.createDataFrame(
            [(i, f"v{i}", 0) for i in range(1, 9)],
            "k long, v string, ts long",
        )
        src.repartition(3).write.parquet(d)
        before = sorted((r.k, r.v) for r in spark.read.parquet(d).collect())
        n_files = len(glob.glob(os.path.join(d, "*.parquet")))
        convert_parquet_to_delta(spark, d)
        got = sorted((r.k, r.v) for r in read_delta(spark, d).collect())
        assert got == before
        # zero data movement: the same files, now registered
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == n_files
        st = replay_log(spark, d)
        assert len(st["live"]) == n_files
        # a real writer applies immediately
        merge_delta_batch(
            spark,
            spark.createDataFrame(
                [(2, "B", 1), (99, "new", 1)],
                "k long, v string, ts long",
            ),
            d, "k", "ts", batch_id=1,
        )
        got = {r.k: r.v for r in read_delta(spark, d).collect()}
        assert got[2] == "B" and got[99] == "new" and len(got) == 9
        # time travel to the conversion snapshot
        assert read_delta(spark, d, version=0).count() == 8

    def test_partitioned_convert(self, spark, tmp_path):
        d = str(tmp_path / "lake")
        src = spark.createDataFrame(
            [(i, f"v{i}", ["a", "b", None][i % 3]) for i in range(12)],
            "k long, v string, part string",
        )
        src.write.partitionBy("part").parquet(d)
        before = sorted(
            (r.k, r.part) for r in spark.read.parquet(d).collect()
        )
        convert_parquet_to_delta(spark, d, partition_by=["part"])
        got = sorted(
            (r.k, r.part) for r in read_delta(spark, d).collect()
        )
        assert got == before
        # partition values came through the directory names (null
        # included) and the DML writers resolve them
        delete_delta_where(spark, d, "part = 'a'")
        assert sorted(
            set(
                r.part for r in read_delta(spark, d).collect()
            ),
            key=str,
        ) == [None, "b"]

    def test_guards(self, spark, tmp_path):
        d = str(tmp_path / "lake")
        spark.createDataFrame([(1,)], "k long").write.parquet(d)
        convert_parquet_to_delta(spark, d)
        with pytest.raises(ValueError, match="already a Delta table"):
            convert_parquet_to_delta(spark, d)
        with pytest.raises(ValueError, match="no parquet files"):
            convert_parquet_to_delta(
                spark, str(tmp_path / "empty" / "x")
            )
        d2 = str(tmp_path / "lake2")
        spark.createDataFrame(
            [(1, "a")], "k long, p string"
        ).write.partitionBy("p").parquet(d2)
        with pytest.raises(ValueError, match="does not match"):
            convert_parquet_to_delta(spark, d2)  # missing partition_by


class TestIcebergAddFiles:
    def test_register_then_write(self, spark, tmp_path):
        lake = str(tmp_path / "lake")
        spark.createDataFrame(
            [(i, f"v{i}", 0) for i in range(1, 7)],
            "id long, v string, ts long",
        ).repartition(2).write.parquet(lake)
        files = sorted(glob.glob(os.path.join(lake, "*.parquet")))
        t = str(tmp_path / "tbl")
        add_iceberg_files(spark, t, files)
        got = sorted(
            (r.id, r.v) for r in read_iceberg(spark, t).collect()
        )
        assert got == [(i, f"v{i}") for i in range(1, 7)]
        meta = load_table_metadata(t)
        assert meta["current-snapshot-id"] == 1
        # the registered bytes never moved
        assert sorted(
            glob.glob(os.path.join(lake, "*.parquet"))
        ) == files
        assert glob.glob(os.path.join(t, "data", "*.parquet")) == []
        # MoR delete + merge apply to registered files
        delete_iceberg_keys(
            spark, t, "id", spark.createDataFrame([(3,)], "id long")
        )
        merge_iceberg_batch(
            spark,
            spark.createDataFrame(
                [(2, "B", 1)], "id long, v string, ts long"
            ),
            t, "id", "ts", batch_id=1,
        )
        got = {r.id: r.v for r in read_iceberg(spark, t).collect()}
        assert 3 not in got and got[2] == "B" and len(got) == 5

    def test_register_into_existing_and_type_guard(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "tbl")
        write_iceberg_commit(
            spark.createDataFrame([(1, "a")], "id long, v string"), t
        )
        extra = str(tmp_path / "extra")
        spark.createDataFrame(
            [(2, "b")], "id long, v string"
        ).coalesce(1).write.parquet(extra)
        add_iceberg_files(
            spark, t, glob.glob(os.path.join(extra, "*.parquet"))
        )
        assert read_iceberg(spark, t).count() == 2
        bad = str(tmp_path / "bad")
        spark.createDataFrame(
            [(3, 9)], "id long, v int"
        ).coalesce(1).write.parquet(bad)
        with pytest.raises(ValueError, match="types drifted"):
            add_iceberg_files(
                spark, t, glob.glob(os.path.join(bad, "*.parquet"))
            )

    def test_lineage_composes(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        df = (
            spark.createDataFrame(
                [(1, "a")], "id long, v string"
            ).coalesce(1)
        )
        write_iceberg_commit(df, t, row_lineage=True)
        extra = str(tmp_path / "extra")
        spark.createDataFrame(
            [(2, "b"), (3, "c")], "id long, v string"
        ).coalesce(1).write.parquet(extra)
        add_iceberg_files(
            spark, t, glob.glob(os.path.join(extra, "*.parquet"))
        )
        got = sorted(
            (r.id, r._row_id)
            for r in read_iceberg(
                spark, t, row_lineage=True
            ).collect()
        )
        assert got[0] == (1, 0)
        assert {rid for _i, rid in got[1:]} == {1, 2}
        assert load_table_metadata(t)["next-row-id"] == 3

    def test_cross_call_basename_collision_refuses(
        self, spark, tmp_path
    ):
        """Review finding: the collision guard must span files
        ALREADY registered — two copied exports share part names."""
        import shutil

        t = str(tmp_path / "tbl")
        a = str(tmp_path / "a")
        spark.createDataFrame(
            [(1, "a")], "id long, v string"
        ).coalesce(1).write.parquet(a)
        fa = sorted(glob.glob(os.path.join(a, "*.parquet")))
        add_iceberg_files(spark, t, fa)
        b = str(tmp_path / "b")
        os.makedirs(b)
        # same basename, different directory (a copied export)
        shutil.copy(fa[0], os.path.join(b, os.path.basename(fa[0])))
        with pytest.raises(
            NotImplementedError, match="already registered"
        ):
            add_iceberg_files(
                spark, t, glob.glob(os.path.join(b, "*.parquet"))
            )
