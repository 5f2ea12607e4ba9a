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


class TestLastPageChase:
    def test_rows_beyond_planned_pages_not_dropped(self, registered, tmp_path):
        """ADVICE: fixed num_pages must not silently truncate — the last
        partition chases pages until a short/empty page."""
        p = tmp_path / "big.ndjson"
        p.write_text("".join(f'{{"id": {i}, "name": "r{i}"}}\n' for i in range(57)))
        df = load(registered, str(p), page_size=10, num_pages=2)
        # planned coverage is 20 rows; chase picks up the remaining 37
        assert sorted(r["id"] for r in df.collect()) == list(range(57))
        assert df.rdd.getNumPartitions() == 2


class TestSalesforceChain:
    """NextRecordsURL protocol against a file-backed fake
    (ext/salesforce/source.go:80-148)."""

    @pytest.fixture()
    def chain_dir(self, tmp_path):
        import json as j

        d = tmp_path / "sf"
        d.mkdir()
        total, batch = 25, 10
        recs = [{"Id": i, "Name": f"acct_{i}"} for i in range(total)]
        (d / "query.json").write_text(
            j.dumps(
                {
                    "totalSize": total,
                    "done": False,
                    "nextRecordsUrl": f"file://{d}/chain-{batch}",
                    "records": recs[:batch],
                }
            )
        )
        for off in range(batch, total, batch):
            (d / f"chain-{off}").write_text(
                j.dumps({"records": recs[off : off + batch]})
            )
        return d

    def test_chain_pages_become_partitions(self, registered, chain_dir):
        df = (
            registered.read.format("sf_chain")
            .schema("Id BIGINT, Name STRING")
            .option("url", f"file://{chain_dir}/query.json")
            .load()
        )
        # discovery page + 2 computed pages
        assert df.rdd.getNumPartitions() == 3
        assert sorted(r["Id"] for r in df.collect()) == list(range(25))
        assert df.filter("Id = 13").collect()[0]["Name"] == "acct_13"

    def test_no_pagination_single_page(self, registered, tmp_path):
        import json as j

        f = tmp_path / "small.json"
        f.write_text(
            j.dumps(
                {
                    "totalSize": 2,
                    "done": True,
                    "records": [{"Id": 1, "Name": "a"}, {"Id": 2, "Name": "b"}],
                }
            )
        )
        df = (
            registered.read.format("sf_chain")
            .schema("Id BIGINT, Name STRING")
            .option("url", f"file://{f}")
            .load()
        )
        assert df.rdd.getNumPartitions() == 1
        assert df.count() == 2

    def test_through_pipeline_sf_source(self, registered, chain_dir, tmp_path):
        from optimus_any2any_spark.config import Config
        from optimus_any2any_spark.pipeline import Pipeline

        cfg = Config.from_env(
            env_args=[
                f"SF__HOST=file://{chain_dir}/query.json",
                "SF__SCHEMA=Id BIGINT, Name STRING",
            ],
            environ={},
        )
        df = Pipeline(registered, "SF", ["IO"], cfg).dataframe()
        assert df.count() == 25
