"""Gmail decode chain (ext/gmail/source.go:64-155): list → get →
attachment → base64url → csv/tsv/json conversion → filename metadata,
against an injectable message store."""

from __future__ import annotations

import base64

import pytest

from optimus_any2any_spark.config import Config
from optimus_any2any_spark.sources import gmail as G


def b64url(text: str, padded: bool = True) -> str:
    enc = base64.urlsafe_b64encode(text.encode()).decode()
    return enc if padded else enc.rstrip("=")


class FakeService:
    """Message-store protocol fake mirroring the API calls the
    reference makes (Users.Messages.List/Get/Attachments.Get)."""

    def __init__(self, messages: dict):
        self.messages = messages
        self.calls: list[tuple] = []

    def list(self, query):
        self.calls.append(("list", query))
        return list(self.messages)

    def get(self, msg_id):
        self.calls.append(("get", msg_id))
        return {"parts": [p["meta"] for p in self.messages[msg_id]]}

    def get_attachment(self, msg_id, attachment_id):
        self.calls.append(("attachment", msg_id, attachment_id))
        for p in self.messages[msg_id]:
            if p["meta"].get("attachment_id") == attachment_id:
                return p["data"]
        raise KeyError(attachment_id)


@pytest.fixture
def service():
    return FakeService(
        {
            "m1": [
                {
                    # CRLF csv: values must come out as STRINGS
                    "meta": {"filename": "report.csv", "attachment_id": "a1"},
                    "data": b64url("id,amount\r\n1,10.5\r\n2,20\r\n"),
                },
                {
                    # part without filename — skipped (source.go:103-106)
                    "meta": {"filename": "", "attachment_id": "ax"},
                    "data": b64url("ignored"),
                },
            ],
            "m2": [
                {
                    "meta": {"filename": "extra.tsv", "attachment_id": "a2"},
                    # unpadded base64url, as the live Gmail API returns
                    "data": b64url("k\tv\nx\t1\n", padded=False),
                },
                {
                    "meta": {"filename": "events.json", "attachment_id": "a3"},
                    "data": b64url('{"e": "click"}\n{"e": "view"}\n'),
                },
            ],
        }
    )


class TestDecodeChain:
    def test_csv_tsv_json_records_with_filename(self, service):
        recs = G.gmail_records(service, query="has:attachment")
        by_file: dict[str, list] = {}
        for r in recs:
            by_file.setdefault(r["__METADATA__filename"], []).append(r)
        assert by_file["report.csv"] == [
            {"id": "1", "amount": "10.5", "__METADATA__filename": "report.csv"},
            {"id": "2", "amount": "20", "__METADATA__filename": "report.csv"},
        ]
        assert by_file["extra.tsv"] == [
            {"k": "x", "v": "1", "__METADATA__filename": "extra.tsv"}
        ]
        assert [r["e"] for r in by_file["events.json"]] == ["click", "view"]
        # the filter reached the list call
        assert ("list", "has:attachment") in service.calls

    def test_unknown_extension_treated_as_json(self):
        recs = G.attachment_records("data.bin", b64url('{"a": 1}\n'))
        assert recs == [{"a": 1}]

    def test_custom_delimiter(self):
        recs = G.attachment_records(
            "d.csv", b64url("a;b\n1;2\n"), delimiter=";"
        )
        assert recs == [{"a": "1", "b": "2"}]

    def test_skip_header_positional_names(self):
        # csv2json.go:74-76: skipped header -> "0","1",... column names
        assert G.csv_records("x,y\n", skip_header=True) == [
            {"0": "x", "1": "y"}
        ]

    def test_cr_only_line_endings(self):
        recs = G.attachment_records("r.csv", b64url("h\rv1\rv2\r"))
        assert recs == [{"h": "v1"}, {"h": "v2"}]

    def test_ragged_csv_row_errors_like_go(self):
        # encoding/csv returns ErrFieldCount; a silent zip-truncation
        # would emit structurally valid but wrong records
        with pytest.raises(ValueError, match="wrong number of fields"):
            G.attachment_records("r.csv", b64url("a,b\n1,2,3\n"))
        with pytest.raises(ValueError, match="wrong number of fields"):
            G.attachment_records("r.csv", b64url("a,b\nonly-one\n"))


class TestGmailSourceBuilder:
    def test_dataframe_shape(self, spark, service):
        from optimus_any2any_spark.sources.builders import gmail_source

        cfg = Config(
            values={
                "GMAIL__FILTER": "from:reports",
                "GMAIL__SERVICE": service,
            }
        )
        df = gmail_source(spark, cfg)
        rows = {
            (r["__METADATA__filename"], r["id"] if "id" in df.columns else None)
            for r in df.collect()
        }
        assert df.count() == 5
        assert "__METADATA__filename" in df.columns

    def test_custom_filename_column(self, spark, service):
        from optimus_any2any_spark.sources.builders import gmail_source

        cfg = Config(
            values={
                "GMAIL__SERVICE": service,
                "GMAIL__FILENAME_COLUMN": "__METADATA__src",
            }
        )
        df = gmail_source(spark, cfg)
        assert "__METADATA__src" in df.columns

    def test_legacy_fetcher_seam_still_works(self, spark):
        from optimus_any2any_spark.sources.builders import gmail_source

        cfg = Config(
            values={"GMAIL__FETCHER": lambda: [{"a": 1}, {"a": 2}]}
        )
        assert gmail_source(spark, cfg).count() == 2

    def test_no_service_raises(self, spark):
        from optimus_any2any_spark.sources.builders import gmail_source

        with pytest.raises(NotImplementedError, match="GMAIL__SERVICE"):
            gmail_source(spark, Config(values={}))
