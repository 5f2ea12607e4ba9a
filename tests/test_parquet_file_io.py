"""Parquet FILE source/sink (beyond-reference: parquet-first pipelines).

The sink writes Spark-native parquet directories (columnar parts,
committer-atomic, no driver byte movement); the source reads them with
pushdown/pruning. Templated destinations fan out in one partitionBy
job exactly like the line formats.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from optimus_any2any_spark import metadata as M
from optimus_any2any_spark.sinks.file import FileSink
from optimus_any2any_spark.sources.file import FileSource


@pytest.fixture()
def data(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5), (4, "c", None)],
        "id long, grp string, v double",
    )


def test_parquet_roundtrip_static(spark, data, tmp_path):
    dest = str(tmp_path / "out.parquet")
    res = FileSink(f"file://{dest}").write(data)
    assert res.files == {dest: 4}
    assert os.path.isdir(dest)  # Spark-native directory layout
    back = FileSource(
        spark, f"file://{dest}", add_filename=False, add_record_index=False
    ).read()
    assert back.schema == data.schema  # types survive (columnar, not text)
    assert sorted(r["id"] for r in back.collect()) == [1, 2, 3, 4]


def test_parquet_templated_fanout(spark, data, tmp_path):
    dest = str(tmp_path / "grp_[[ .grp ]].parquet")
    res = FileSink(f"file://{dest}").write(data)
    expect = {
        str(tmp_path / "grp_a.parquet"): 2,
        str(tmp_path / "grp_b.parquet"): 1,
        str(tmp_path / "grp_c.parquet"): 1,
    }
    assert res.files == expect
    a = spark.read.parquet(str(tmp_path / "grp_a.parquet"))
    assert sorted(r["id"] for r in a.collect()) == [1, 3]
    # routing column must not leak into the data
    assert "__destination__" not in a.columns


def test_parquet_sink_strips_metadata(spark, data, tmp_path):
    with_meta = M.with_record_index(M.with_filename(data))
    dest = str(tmp_path / "clean.parquet")
    FileSink(f"file://{dest}").write(with_meta)
    back = spark.read.parquet(dest)
    assert [c for c in back.columns if c.startswith(M.METADATA_PREFIX)] == []
    assert set(back.columns) == {"id", "grp", "v"}


def test_parquet_source_prunes_and_pushes_down(spark, data, tmp_path):
    dest = str(tmp_path / "scan.parquet")
    FileSink(f"file://{dest}").write(data)
    df = (
        FileSource(
            spark, f"file://{dest}", add_filename=False, add_record_index=False
        )
        .read()
        .filter(F.col("id") > 2)
        .select("id")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,2)]" in plan, plan
    assert "ReadSchema: struct<id:bigint>" in plan, plan


def test_parquet_max_records_per_file(spark, tmp_path):
    df = spark.range(100).select(F.col("id"))
    dest = str(tmp_path / "parts.parquet")
    FileSink(f"file://{dest}", max_records_per_file=25).write(df)
    parts = [p for p in os.listdir(dest) if p.startswith("part-")]
    assert len(parts) >= 4  # 100 rows / 25 per file
    assert spark.read.parquet(dest).count() == 100
