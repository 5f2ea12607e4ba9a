"""Direct (--no-pipeline) mode tests: the whole transfer stays
engine-side (reference: any2any.go:54-61; ext/direct/oss2mc.go LOAD,
ext/direct/mc2oss.go UNLOAD ≙ ordinary Spark read→write)."""

from __future__ import annotations

import json

from optimus_any2any_spark import metadata as M
from optimus_any2any_spark.config import Config
from optimus_any2any_spark.pipeline import Pipeline


def test_file_to_warehouse_direct(spark, tmp_path):
    """OSS2MC shape: object-store files LOADed into a warehouse table."""
    src = tmp_path / "in.json"
    with open(src, "w") as f:
        for i in range(5):
            f.write(json.dumps({"id": i, "v": f"x{i}"}) + "\n")
    spark.sql("DROP TABLE IF EXISTS direct_dest")
    spark.sql("CREATE TABLE direct_dest (id BIGINT, v STRING) USING parquet")
    cfg = Config.from_env(
        env_args=[
            f"FILE__SOURCE_URI=file://{src}",
            "MC__DESTINATION_TABLE_ID=direct_dest",
            "MC__LOAD_METHOD=REPLACE",
        ],
        environ={},
    )
    Pipeline(spark, "FILE", ["MC"], cfg, no_pipeline=True).run()
    got = {r["id"]: r["v"] for r in spark.table("direct_dest").collect()}
    assert got == {i: f"x{i}" for i in range(5)}
    spark.sql("DROP TABLE direct_dest")


def test_warehouse_to_file_direct(spark, tmp_path):
    """MC2OSS shape: UNLOAD a query's result to files."""
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, s string"
    ).createOrReplaceTempView("direct_src")
    out = tmp_path / "unload.csv"
    cfg = Config.from_env(
        env_args=[
            "MC__QUERY=SELECT k, upper(s) AS s_up FROM direct_src",
            f"FILE__DESTINATION_URI=file://{out}",
        ],
        environ={},
    )
    Pipeline(spark, "MC", ["FILE"], cfg, no_pipeline=True).run()
    lines = open(out).read().splitlines()
    assert lines[0] == "k,s_up"
    assert sorted(lines[1:]) == ["1,A", "2,B"]


def test_record_total_count(spark):
    df = spark.range(7).toDF("n")
    out = M.with_record_total_count(df)
    assert {r[M.RECORD_TOTAL_COUNT] for r in out.collect()} == {7}


def test_oss2mc_config_block(spark, tmp_path):
    """The reference's dedicated OSS2MC__* direct config
    (internal/config/direct_oss2mc.go): source URI, csv file format,
    static partition values, REPLACE load method."""
    src = tmp_path / "in.csv"
    src.write_text("id,v\n1,a\n2,b\n")
    spark.sql("DROP TABLE IF EXISTS direct_dest2")
    cfg = Config.from_env(
        env_args=[
            f"OSS2MC__SOURCE_URI=file://{src}",
            "OSS2MC__FILE_FORMAT=csv",
            "OSS2MC__DESTINATION_TABLE_ID=direct_dest2",
            "OSS2MC__LOAD_METHOD=REPLACE",
            "OSS2MC__PARTITION_VALUES=event_date='2024-01-01'",
        ],
        environ={},
    )
    Pipeline(spark, "OSS", ["MC"], cfg, no_pipeline=True).run()
    rows = spark.table("direct_dest2").collect()
    assert {(r["id"], r["v"], r["event_date"]) for r in rows} == {
        ("1", "a", "2024-01-01"),
        ("2", "b", "2024-01-01"),
    }
    spark.sql("DROP TABLE direct_dest2")
