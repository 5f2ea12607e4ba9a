"""S3 credential providers (ext/s3/sink.go:44-51, ext/s3/util.go,
internal/ext/auth/aws/tiktok_provider.go): JSON credential parsing,
the static default, and the TikTok temporary-STS exchange — protocol
bytes verified against an injected transport (no network in the
sandbox, the oauth2/sf_auth seam discipline)."""

from __future__ import annotations

import json

import pytest

from optimus_any2any_spark.sinks.aws_auth import (
    TIKTOK_CREDS_URL,
    TIKTOK_TOKEN_URL,
    parse_credentials,
    resolve_s3_credentials,
    tiktok_temporary_credentials,
)

CREDS = json.dumps(
    {"aws_access_key_id": "AK", "aws_secret_access_key": "SK"}
)


class TestParseCredentials:
    def test_required_fields(self):
        with pytest.raises(ValueError, match="missing AWS access key"):
            parse_credentials(json.dumps({"aws_access_key_id": "AK"}))
        with pytest.raises(ValueError, match="missing AWS access key"):
            parse_credentials(
                json.dumps({"aws_secret_access_key": "SK"})
            )

    def test_optional_session_token(self):
        got = parse_credentials(CREDS)
        assert got == {
            "access_key_id": "AK",
            "secret_access_key": "SK",
            "session_token": None,
        }
        got = parse_credentials(
            json.dumps(
                {
                    "aws_access_key_id": "AK",
                    "aws_secret_access_key": "SK",
                    "aws_session_token": "TOK",
                }
            )
        )
        assert got["session_token"] == "TOK"


def _fake_transport(calls):
    def transport(url, data, headers):
        calls.append((url, data, headers))
        if url == TIKTOK_TOKEN_URL:
            return 200, json.dumps(
                {"access_token": "at123", "token_type": "Bearer"}
            )
        if url == TIKTOK_CREDS_URL:
            assert headers["Authorization"] == "Bearer at123"
            assert headers["x-tt-target-idc"] == "useast1a"
            body = json.loads(data)
            assert body == {"username": "CK", "password": "CS"}
            return 200, json.dumps(
                {
                    "data": {
                        "access_key_id": "TMPAK",
                        "secret_key": "TMPSK",
                        "session_token": "TMPST",
                    }
                }
            )
        raise AssertionError(url)

    return transport


class TestTikTokExchange:
    def test_two_step_exchange(self):
        calls = []
        got = tiktok_temporary_credentials(
            "CK", "CS", transport=_fake_transport(calls)
        )
        assert got == {
            "access_key_id": "TMPAK",
            "secret_access_key": "TMPSK",
            "session_token": "TMPST",
        }
        # token request: form-encoded client-credentials grant
        url, data, headers = calls[0]
        assert url == TIKTOK_TOKEN_URL
        assert (
            headers["Content-Type"]
            == "application/x-www-form-urlencoded"
        )
        assert b"grant_type=client_credentials" in data
        assert b"client_key=CK" in data

    def test_error_paths(self):
        def bad_token(url, data, headers):
            return 401, json.dumps({"error": "denied"})

        with pytest.raises(RuntimeError, match="401 response"):
            tiktok_temporary_credentials("CK", "CS", transport=bad_token)

        def no_data(url, data, headers):
            if url == TIKTOK_TOKEN_URL:
                return 200, json.dumps(
                    {"access_token": "x", "token_type": "Bearer"}
                )
            return 200, json.dumps({})

        with pytest.raises(RuntimeError, match="data not found"):
            tiktok_temporary_credentials("CK", "CS", transport=no_data)

    def test_non_json_error_body_surfaces_status(self):
        """An HTML 502 / proxy page must raise the reference's
        '<status> response ...' error, not a JSONDecodeError."""

        def html_502(url, data, headers):
            return 502, "<html>Bad Gateway</html>"

        with pytest.raises(RuntimeError, match="502 response.*Gateway"):
            tiktok_temporary_credentials("CK", "CS", transport=html_502)

        def creds_html_500(url, data, headers):
            if url == TIKTOK_TOKEN_URL:
                return 200, json.dumps(
                    {"access_token": "x", "token_type": "Bearer"}
                )
            return 500, "<html>oops</html>"

        with pytest.raises(RuntimeError, match="500 response.*oops"):
            tiktok_temporary_credentials(
                "CK", "CS", transport=creds_html_500
            )

    def test_non_json_200_named_error(self):
        def junk_200(url, data, headers):
            return 200, "not json"

        with pytest.raises(RuntimeError, match="non-JSON 200"):
            tiktok_temporary_credentials("CK", "CS", transport=junk_200)

    def test_default_transport_returns_http_error_body(self):
        """urlopen raises HTTPError on non-2xx; the transport must
        convert it to (status, body) so the status!=200 branches are
        reachable on the real network path."""
        import io
        import urllib.error
        import urllib.request
        from unittest import mock

        from optimus_any2any_spark.sinks.aws_auth import (
            _default_transport,
        )

        err = urllib.error.HTTPError(
            TIKTOK_TOKEN_URL, 403, "Forbidden", {},
            io.BytesIO(b'{"error":"denied"}'),
        )
        with mock.patch.object(
            urllib.request, "urlopen", side_effect=err
        ):
            status, body = _default_transport(
                TIKTOK_TOKEN_URL, b"x", {}
            )
        assert status == 403
        assert "denied" in body


class TestResolveDispatch:
    def test_static_default(self):
        got = resolve_s3_credentials(CREDS, provider="aws")
        assert got["access_key_id"] == "AK"

    def test_tiktok_provider(self):
        calls = []
        got = resolve_s3_credentials(
            json.dumps(
                {
                    "aws_access_key_id": "CK",
                    "aws_secret_access_key": "CS",
                }
            ),
            provider="TikTok",
            transport=_fake_transport(calls),
        )
        assert got["access_key_id"] == "TMPAK"
        assert len(calls) == 2


class TestHadoopConfApplication:
    def test_temporary_and_simple_providers(self, spark):
        from optimus_any2any_spark.sinks.aws_auth import (
            apply_s3_hadoop_conf,
        )

        hc = spark.sparkContext._jsc.hadoopConfiguration()
        apply_s3_hadoop_conf(
            spark,
            {
                "access_key_id": "TMPAK",
                "secret_access_key": "TMPSK",
                "session_token": "TMPST",
            },
            region="ap-southeast-1",
        )
        assert hc.get("fs.s3a.access.key") == "TMPAK"
        assert hc.get("fs.s3a.session.token") == "TMPST"
        assert "TemporaryAWSCredentialsProvider" in hc.get(
            "fs.s3a.aws.credentials.provider"
        )
        assert hc.get("fs.s3a.endpoint.region") == "ap-southeast-1"
        apply_s3_hadoop_conf(
            spark,
            {
                "access_key_id": "AK",
                "secret_access_key": "SK",
                "session_token": None,
            },
        )
        assert "SimpleAWSCredentialsProvider" in hc.get(
            "fs.s3a.aws.credentials.provider"
        )


class TestPipelineComposition:
    """VERDICT r11 item 8: the provider config composes end-to-end
    through the pipeline path — S3__CREDENTIALS + S3__PROVIDER=tiktok
    with the injected transport exchanges for temporary credentials
    and lands them in the session's fs.s3a.* Hadoop conf before the
    file-family write runs."""

    def test_tiktok_provider_through_pipeline(self, spark, tmp_path):
        from optimus_any2any_spark.config import Config
        from optimus_any2any_spark.pipeline import Pipeline

        src = tmp_path / "in.json"
        src.write_text('{"a": 1}\n{"a": 2}\n')
        out = tmp_path / "out.json"
        calls = []
        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                f"S3__DESTINATION_URI=file://{out}",
                "S3__CREDENTIALS=" + json.dumps(
                    {
                        "aws_access_key_id": "CK",
                        "aws_secret_access_key": "CS",
                    }
                ),
                "S3__PROVIDER=tiktok",
                "S3__REGION=us-east-1",
            ],
            environ={},
        )
        cfg.values["S3__TRANSPORT"] = _fake_transport(calls)
        result = Pipeline(spark, "FILE", ["S3"], cfg).run()
        assert sum(result.sink_results["S3"].files.values()) == 2
        assert out.exists()
        # both protocol calls happened, in order
        assert [u for u, _, _ in calls] == [
            TIKTOK_TOKEN_URL, TIKTOK_CREDS_URL,
        ]
        # the EXCHANGED temporary credentials (not the client key)
        # landed in the session conf with the temporary provider
        hc = spark.sparkContext._jsc.hadoopConfiguration()
        assert hc.get("fs.s3a.access.key") == "TMPAK"
        assert hc.get("fs.s3a.secret.key") == "TMPSK"
        assert hc.get("fs.s3a.session.token") == "TMPST"
        assert hc.get("fs.s3a.aws.credentials.provider").endswith(
            "TemporaryAWSCredentialsProvider"
        )
        assert hc.get("fs.s3a.endpoint.region") == "us-east-1"

    def test_static_provider_through_pipeline(self, spark, tmp_path):
        from optimus_any2any_spark.config import Config
        from optimus_any2any_spark.pipeline import Pipeline

        src = tmp_path / "in.json"
        src.write_text('{"a": 1}\n')
        out = tmp_path / "out2.json"
        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                f"S3__DESTINATION_URI=file://{out}",
                "S3__CREDENTIALS=" + json.dumps(
                    {
                        "aws_access_key_id": "SAK",
                        "aws_secret_access_key": "SSK",
                    }
                ),
            ],
            environ={},
        )
        Pipeline(spark, "FILE", ["S3"], cfg).run()
        hc = spark.sparkContext._jsc.hadoopConfiguration()
        assert hc.get("fs.s3a.access.key") == "SAK"
        assert hc.get("fs.s3a.aws.credentials.provider").endswith(
            "SimpleAWSCredentialsProvider"
        )
