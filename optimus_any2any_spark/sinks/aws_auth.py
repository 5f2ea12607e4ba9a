"""AWS credential providers for the S3 sink.

Reproduces the reference's provider selection exactly
(ext/s3/sink.go:44-51, ext/s3/util.go:8-24,
internal/ext/auth/aws/tiktok_provider.go):

- ``S3__CREDENTIALS`` is a JSON document with ``aws_access_key_id``,
  ``aws_secret_access_key`` and optional ``aws_session_token``; both
  key fields are required (util.go:19-21).
- ``S3__PROVIDER`` defaults to ``aws`` → static credentials.
- ``S3__PROVIDER=tiktok`` treats the key/secret as the TikTok client
  key/secret and exchanges them for TEMPORARY S3 upload credentials:
  a client-credentials token POST (form-encoded) to
  ``/v2/oauth/token/``, then a ``get_credentials`` POST (JSON body,
  ``x-tt-target-idc`` header, ``Authorization: <token_type> <token>``)
  whose ``data`` carries ``access_key_id`` / ``secret_key`` /
  ``session_token`` (tiktok_provider.go:50-183). The reference's
  5-10 s request spacing is a rate-limit courtesy on ITS hot path
  (Retrieve per client); this driver-side exchange runs once per
  pipeline, so no sleep.

Spark-side application: the resolved credentials land in the Hadoop
``fs.s3a.*`` session configuration (``TemporaryAWSCredentialsProvider``
when a session token is present, ``SimpleAWSCredentialsProvider``
otherwise), which is how an s3a:// write authenticates on a cluster.
``transport`` is injectable for tests — no network in this
environment; the sandbox discipline shared with ``sources/oauth2.py``.
"""

from __future__ import annotations

import json
from collections.abc import Callable

TIKTOK_TOKEN_URL = "https://open.tiktokapis.com/v2/oauth/token/"
TIKTOK_CREDS_URL = "https://open.tiktokapis.com/v2/feed/upload/get_credentials/"

# transport(url, body, headers) -> (status_code, response_body)
Transport = Callable[[str, bytes, dict[str, str]], tuple[int, str]]


def _default_transport(
    url: str, data: bytes, headers: dict[str, str]
) -> tuple[int, str]:
    import urllib.request

    req = urllib.request.Request(url, data=data, headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req) as resp:  # noqa: S310
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:
        # Return (status, body) so callers surface the reference's
        # "<status> response when ..." message instead of a bare
        # HTTPError — urlopen raises on every non-2xx.
        return e.code, e.read().decode(errors="replace")


def parse_credentials(creds_json: str) -> dict:
    """ext/s3/util.go:14-24 — JSON credentials with required key id +
    secret, optional session token."""
    parsed = json.loads(creds_json)
    if not parsed.get("aws_access_key_id") or not parsed.get(
        "aws_secret_access_key"
    ):
        raise ValueError("missing AWS access key ID or secret access key")
    return {
        "access_key_id": parsed["aws_access_key_id"],
        "secret_access_key": parsed["aws_secret_access_key"],
        "session_token": parsed.get("aws_session_token") or None,
    }


def tiktok_client_token(
    client_key: str,
    client_secret: str,
    transport: Transport | None = None,
) -> str:
    """tiktok_provider.go:73-117 — form-encoded client-credentials
    grant; returns ``"<token_type> <access_token>"``."""
    from urllib.parse import urlencode

    t = transport or _default_transport
    body = urlencode(
        {
            "client_key": client_key,
            "client_secret": client_secret,
            "grant_type": "client_credentials",
        }
    ).encode()
    status, text = t(
        TIKTOK_TOKEN_URL,
        body,
        {
            "Content-Type": "application/x-www-form-urlencoded",
            "Cache-Control": "no-cache",
        },
    )
    if status != 200:
        # Status first: a non-JSON error body (HTML 502, proxy page)
        # must surface the HTTP failure, not a JSONDecodeError.
        raise RuntimeError(
            f"{status} response when getting client token: {text[:500]}"
        )
    try:
        payload = json.loads(text)
    except ValueError as e:
        raise RuntimeError(
            f"non-JSON 200 response when getting client token: "
            f"{text[:500]}"
        ) from e
    if "access_token" not in payload:
        raise RuntimeError("access_token not found in response")
    if "token_type" not in payload:
        raise RuntimeError("token_type not found in response")
    return f"{payload['token_type']} {payload['access_token']}"


def tiktok_temporary_credentials(
    client_key: str,
    client_secret: str,
    transport: Transport | None = None,
) -> dict:
    """tiktok_provider.go:119-183 — exchange the client token for
    temporary S3 upload credentials (access key + secret + session
    token)."""
    t = transport or _default_transport
    token = tiktok_client_token(client_key, client_secret, transport=t)
    body = json.dumps(
        {"username": client_key, "password": client_secret}
    ).encode()
    status, text = t(
        TIKTOK_CREDS_URL,
        body,
        {
            "Content-Type": "application/json",
            "x-tt-target-idc": "useast1a",
            "Authorization": token,
        },
    )
    if status != 200:
        try:
            detail = repr(json.loads(text).get("error"))
        except ValueError:
            detail = text[:500]
        raise RuntimeError(
            f"{status} response when getting temporary creds: {detail}"
        )
    try:
        payload = json.loads(text)
    except ValueError as e:
        raise RuntimeError(
            f"non-JSON 200 response when getting temporary creds: "
            f"{text[:500]}"
        ) from e
    data = payload.get("data")
    if not isinstance(data, dict):
        raise RuntimeError("data not found in response")
    for k in ("access_key_id", "secret_key", "session_token"):
        if k not in data:
            raise RuntimeError(f"{k} not found in response")
    return {
        "access_key_id": data["access_key_id"],
        "secret_access_key": data["secret_key"],
        "session_token": data["session_token"],
    }


def resolve_s3_credentials(
    creds_json: str,
    provider: str = "aws",
    transport: Transport | None = None,
) -> dict:
    """Provider dispatch (ext/s3/sink.go:44-51): ``tiktok`` exchanges
    for temporary credentials, anything else is static."""
    creds = parse_credentials(creds_json)
    if provider.strip().lower() == "tiktok":
        return tiktok_temporary_credentials(
            creds["access_key_id"],
            creds["secret_access_key"],
            transport=transport,
        )
    return creds


def apply_s3_hadoop_conf(spark, creds: dict, region: str | None = None):
    """Land resolved credentials in the session's ``fs.s3a.*`` Hadoop
    configuration — the Spark-native equivalent of handing the AWS SDK
    a CredentialsProvider."""
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    hc.set("fs.s3a.access.key", creds["access_key_id"])
    hc.set("fs.s3a.secret.key", creds["secret_access_key"])
    if creds.get("session_token"):
        hc.set("fs.s3a.session.token", creds["session_token"])
        hc.set(
            "fs.s3a.aws.credentials.provider",
            "org.apache.hadoop.fs.s3a.auth.TemporaryAWSCredentialsProvider",
        )
    else:
        hc.set(
            "fs.s3a.aws.credentials.provider",
            "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider",
        )
    if region:
        hc.set("fs.s3a.endpoint.region", region)
