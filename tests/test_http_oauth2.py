"""OAuth2 client-credentials flow (ext/http/utils.go:14-26,
internal/ext/auth/clientcredentials/custom_provider_a.go): token
request shape, caching/expiry, and Bearer-header injection through the
HTTP source fetcher, the paged executor-side source, and the HTTP
sink sender."""

from __future__ import annotations

import base64
import json

import pytest

from optimus_any2any_spark.config import Config
from optimus_any2any_spark.sources import oauth2


def fake_transport(log, token="tok-1", expires_in="3600"):
    def transport(url, data, headers):
        log.append((url, data, dict(headers)))
        return 200, json.dumps(
            {
                "access_token": token,
                "token_type": "bearer",
                "expires_in": expires_in,
            }
        )

    return transport


class TestTokenRequest:
    def test_request_shape_matches_provider_a(self):
        log = []
        cc = oauth2.ClientCredentials(
            "my-id", "my-secret", "https://auth.example/token",
            transport=fake_transport(log),
        )
        assert cc.token() == "tok-1"
        url, data, headers = log[0]
        # custom_provider_a.go:64-74: grant type in the QUERY string,
        # JSON content type, Basic auth of id:secret
        assert url == "https://auth.example/token?grant_type=client_credentials"
        assert data is None
        assert headers["Content-Type"] == "application/json"
        expect_basic = base64.b64encode(b"my-id:my-secret").decode()
        assert headers["Authorization"] == f"Basic {expect_basic}"

    def test_token_cached_until_expiry_delta(self):
        log = []
        now = [1000.0]
        cc = oauth2.ClientCredentials(
            "i", "s", "https://auth/token",
            transport=fake_transport(log, expires_in="100"),
            clock=lambda: now[0],
        )
        cc.token()
        cc.token()
        assert len(log) == 1  # ReuseTokenSource semantics: one fetch
        now[0] = 1000.0 + 100 - 11  # inside expiry minus the 10s delta
        cc.token()
        assert len(log) == 1
        now[0] = 1000.0 + 100 - 9  # within the delta -> refresh
        cc.token()
        assert len(log) == 2

    def test_non_200_raises_with_body(self):
        cc = oauth2.ClientCredentials(
            "i", "s", "https://auth/token",
            transport=lambda u, d, h: (401, "denied"),
        )
        with pytest.raises(RuntimeError, match="401.*denied"):
            cc.token()

    def test_unsupported_provider_rejected(self):
        # utils.go:23-24: unknown provider is an error, not a no-op
        with pytest.raises(ValueError, match="unsupported client credentials"):
            oauth2.from_component_config(
                {
                    "client_credentials_provider": "provider_b",
                    "client_credentials_client_id": "i",
                    "client_credentials_client_secret": "s",
                    "client_credentials_token_url": "u",
                }
            )

    def test_partial_config_is_inactive(self):
        # isUsingOAuth2 (utils.go:14-16): ALL four must be set
        assert (
            oauth2.from_component_config(
                {
                    "client_credentials_provider": oauth2.PROVIDER_A,
                    "client_credentials_client_id": "i",
                }
            )
            is None
        )

    def test_file_token_url_offline_fake(self, tmp_path):
        p = tmp_path / "token.json"
        p.write_text(
            json.dumps({"access_token": "filetok", "expires_in": "60"})
        )
        cc = oauth2.ClientCredentials("i", "s", f"file://{p}")
        assert cc.auth_header() == {"Authorization": "Bearer filetok"}


class TestHeaderParsing:
    def test_key_value_lines(self):
        got = oauth2.parse_headers("X-A: 1\nX-B: u,v\n\nX-A: 2\n")
        assert got == {"X-A": "1,2", "X-B": "u,v"}

    def test_bad_line_raises(self):
        # source.go:38-40: exactly one ':' per line
        with pytest.raises(ValueError, match="invalid header format"):
            oauth2.parse_headers("no-colon-here")


class TestHttpSourceAuth:
    def test_bearer_and_custom_headers_reach_fetcher(self, spark):
        from optimus_any2any_spark.sources.builders import http_source

        seen = {}

        def fetcher(url, headers):
            seen["url"], seen["headers"] = url, headers
            return '{"a": 1}\n{"a": 2}'

        cfg = Config(
            values={
                "HTTP__ENDPOINT": "https://api.example/data",
                "HTTP__HEADERS": "X-Trace: abc",
                "HTTP__CLIENT_CREDENTIALS_PROVIDER": oauth2.PROVIDER_A,
                "HTTP__CLIENT_CREDENTIALS_CLIENT_ID": "id",
                "HTTP__CLIENT_CREDENTIALS_CLIENT_SECRET": "sec",
                "HTTP__CLIENT_CREDENTIALS_TOKEN_URL": "https://auth/token",
                "HTTP__TOKEN_TRANSPORT": fake_transport([], token="tok-xyz"),
                "HTTP__FETCHER": fetcher,
            }
        )
        out = http_source(spark, cfg)
        assert out.count() == 2
        assert seen["url"] == "https://api.example/data"
        assert seen["headers"]["Authorization"] == "Bearer tok-xyz"
        assert seen["headers"]["X-Trace"] == "abc"

    def test_legacy_single_arg_fetcher_still_works(self, spark):
        from optimus_any2any_spark.sources.builders import http_source

        cfg = Config(
            values={
                "HTTP__ENDPOINT": "x",
                "HTTP__FETCHER": lambda url: '{"a": 1}',
            }
        )
        assert http_source(spark, cfg).count() == 1

    def test_paged_source_receives_headers_option(self, spark, tmp_path):
        # file:// pages ignore headers on the wire, but the plan must
        # carry them — assert the option lands in the reader
        import optimus_any2any_spark.sources.paged_api as paged_api
        from pyspark.sql.types import StructType

        ndjson = tmp_path / "rows.ndjson"
        ndjson.write_text("\n".join(json.dumps({"id": i}) for i in range(7)))
        reader = paged_api.PagedApiReader(
            StructType.fromDDL("id long"),
            {
                "url": f"file://{ndjson}",
                "page_size": "3",
                "num_pages": "2",
                "headers": json.dumps({"Authorization": "Bearer t"}),
            },
        )
        assert reader.headers == {"Authorization": "Bearer t"}
        rows = [
            r for p in reader.partitions() for r in reader.read(p)
        ]
        assert len(rows) == 7

    def test_http_source_paged_mode_passes_auth(self, spark, tmp_path):
        from optimus_any2any_spark.sources.builders import http_source

        ndjson = tmp_path / "rows.ndjson"
        ndjson.write_text("\n".join(json.dumps({"id": i}) for i in range(5)))
        cfg = Config(
            values={
                "HTTP__ENDPOINT": f"file://{ndjson}",
                "HTTP__PAGE_SIZE": "2",
                "HTTP__NUM_PAGES": "2",
                "HTTP__SCHEMA": "id long",
                "HTTP__CLIENT_CREDENTIALS_PROVIDER": oauth2.PROVIDER_A,
                "HTTP__CLIENT_CREDENTIALS_CLIENT_ID": "id",
                "HTTP__CLIENT_CREDENTIALS_CLIENT_SECRET": "sec",
                "HTTP__CLIENT_CREDENTIALS_TOKEN_URL": "https://auth/token",
                "HTTP__TOKEN_TRANSPORT": fake_transport([]),
            }
        )
        assert http_source(spark, cfg).count() == 5


class TestHttpSinkAuth:
    def test_sender_receives_bearer_header(self, spark, tmp_path):
        from optimus_any2any_spark.sinks.builders import http_sink

        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        capture = str(tmp_path / "posts.jsonl")

        # the sender runs on EXECUTORS — capture via file, as the other
        # http_sink tests do
        def sender(m, e, h, b, path=capture):
            with open(path, "a") as f:
                f.write(json.dumps([m, e, h]) + "\n")

        cfg = Config(
            values={
                "HTTP__ENDPOINT": "https://api.example/ingest",
                "HTTP__SENDER": sender,
                "HTTP__CLIENT_CREDENTIALS_PROVIDER": oauth2.PROVIDER_A,
                "HTTP__CLIENT_CREDENTIALS_CLIENT_ID": "id",
                "HTTP__CLIENT_CREDENTIALS_CLIENT_SECRET": "sec",
                "HTTP__CLIENT_CREDENTIALS_TOKEN_URL": "https://auth/token",
                "HTTP__TOKEN_TRANSPORT": fake_transport([], token="sink-tok"),
            }
        )
        http_sink(df, cfg)
        calls = [json.loads(ln) for ln in open(capture)]
        assert len(calls) == 2
        for _m, _e, headers in calls:
            assert headers["Authorization"] == ["Bearer sink-tok"]
