"""Spark 4 Python DataSource: paged-API source (SURVEY.md §2.1 SF/GA
mapping). Pages become InputPartitions — verified by checking partition
count and content parity against a plain read."""

from __future__ import annotations

import json

import pytest

from optimus_any2any_spark.sources import paged_api


@pytest.fixture(scope="module")
def ndjson_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("api") / "records.ndjson"
    with open(p, "w") as f:
        for i in range(95):
            f.write(json.dumps({"id": i, "name": f"rec_{i}"}) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def registered(spark):
    # register() ships the source by value — works on workers that do
    # not have this package on PYTHONPATH (the driver-session contract)
    paged_api.register(spark)
    return spark


def load(spark, path, page_size=10, num_pages=12):
    return (
        spark.read.format("paged_api")
        .schema("id BIGINT, name STRING")
        .option("url", f"file://{path}")
        .option("page_size", str(page_size))
        .option("num_pages", str(num_pages))
        .load()
    )


class TestPagedApiSource:
    def test_reads_all_rows_exactly_once(self, registered, ndjson_file):
        df = load(registered, ndjson_file)
        rows = sorted(r["id"] for r in df.collect())
        assert rows == list(range(95))

    def test_pages_become_partitions(self, registered, ndjson_file):
        df = load(registered, ndjson_file, page_size=10, num_pages=12)
        assert df.rdd.getNumPartitions() == 12

    def test_overhang_pages_are_empty_not_errors(self, registered, ndjson_file):
        # 95 rows / page_size 50 → pages 2.. are past EOF
        df = load(registered, ndjson_file, page_size=50, num_pages=4)
        assert df.count() == 95

    def test_missing_fields_are_null(self, registered, tmp_path):
        p = tmp_path / "ragged.ndjson"
        p.write_text('{"id": 1}\n{"id": 2, "name": "x"}\n')
        df = load(registered, str(p), page_size=10, num_pages=1)
        got = {r["id"]: r["name"] for r in df.collect()}
        assert got == {1: None, 2: "x"}

    def test_filter_and_projection_compose(self, registered, ndjson_file):
        df = load(registered, ndjson_file).filter("id >= 90").select("name")
        assert sorted(r["name"] for r in df.collect()) == [
            f"rec_{i}" for i in range(90, 95)
        ]
