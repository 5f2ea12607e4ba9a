"""GA RunReport chain (ext/googleanalytics/source.go:55-105): the
limit/offset paging loop and header-zipped record shapes, against an
injectable Data API client."""

from __future__ import annotations

import pytest

from optimus_any2any_spark.config import Config
from optimus_any2any_spark.sources.builders import ga_records, ga_source


class FakeGAClient:
    """Serves pages of the RunReport JSON wire shape; records every
    request so paging behavior is assertable."""

    def __init__(self, rows: list[tuple[list[str], list[str]]],
                 dims: list[str], mets: list[str]):
        self.rows = rows
        self.dims = dims
        self.mets = mets
        self.requests: list[dict] = []

    def run_report(self, req: dict) -> dict:
        self.requests.append(req)
        lo = req["offset"]
        hi = lo + req["limit"]
        page = self.rows[lo:hi]
        return {
            "rowCount": len(self.rows),
            "dimensionHeaders": [{"name": d} for d in self.dims],
            "metricHeaders": [{"name": m} for m in self.mets],
            "rows": [
                {
                    "dimensionValues": [{"value": v} for v in dvals],
                    "metricValues": [{"value": v} for v in mvals],
                }
                for dvals, mvals in page
            ],
        }


@pytest.fixture
def client():
    rows = [([f"country{i}", f"city{i}"], [str(i * 10), str(i)]) for i in range(5)]
    return FakeGAClient(rows, ["country", "city"], ["sessions", "users"])


class TestGaRecords:
    def test_paging_and_record_shape(self, client):
        recs = ga_records(
            client, "123", "2024-01-01", "2024-01-31",
            ["country", "city"], ["sessions", "users"], batch_size=2,
        )
        assert len(recs) == 5
        assert recs[0] == {
            "country": "country0",
            "city": "city0",
            "sessions": "0",
            "users": "0",
        }
        # all values are strings (GetValue), never parsed numbers
        assert all(
            isinstance(v, str) for r in recs for v in r.values()
        )
        # limit/offset cursor: ceil(5/2)=3 pages, offsets 0,2,4
        assert [r["offset"] for r in client.requests] == [0, 2, 4]
        assert client.requests[0]["property"] == "properties/123"
        assert client.requests[0]["dateRanges"] == [
            {"startDate": "2024-01-01", "endDate": "2024-01-31"}
        ]

    def test_rowcount_pinned_from_first_response(self, client):
        # source.go:76-79: rowCount is read once; later responses can't
        # extend the loop
        orig = client.run_report

        def shrinking(req):
            resp = orig(req)
            if req["offset"] > 0:
                resp["rowCount"] = 999  # must be ignored after page 1
            return resp

        client.run_report = shrinking
        recs = ga_records(
            client, "p", "s", "e", ["country", "city"],
            ["sessions", "users"], batch_size=2,
        )
        assert len(recs) == 5 and len(client.requests) == 3

    def test_empty_report(self):
        empty = FakeGAClient([], ["d"], ["m"])
        assert ga_records(empty, "p", "s", "e", ["d"], ["m"]) == []
        assert len(empty.requests) == 1


class TestGaSourceBuilder:
    def test_dataframe_from_config(self, spark, client):
        cfg = Config(
            values={
                "GA__PROPERTY_ID": "123",
                "GA__START_DATE": "2024-01-01",
                "GA__END_DATE": "2024-01-31",
                "GA__DIMENSIONS": "country,city",
                "GA__METRICS": "sessions,users",
                "GA__BATCH_SIZE": "2",
                "GA__CLIENT": client,
            }
        )
        df = ga_source(spark, cfg)
        assert df.count() == 5
        assert set(df.columns) == {"country", "city", "sessions", "users"}

    def test_legacy_fetcher_seam(self, spark):
        cfg = Config(values={"GA__FETCHER": lambda: [{"x": 1}]})
        assert ga_source(spark, cfg).count() == 1

    def test_no_client_raises(self, spark):
        with pytest.raises(NotImplementedError, match="GA__CLIENT"):
            ga_source(spark, Config(values={}))
