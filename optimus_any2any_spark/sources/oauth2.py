"""OAuth2 client-credentials token source for HTTP components.

Reproduces the reference's ``custom_provider_a`` flow exactly
(ext/http/utils.go:14-26, ext/http/source.go:53-60,
internal/ext/auth/clientcredentials/custom_provider_a.go):

- token request: ``POST {token_url}?grant_type=client_credentials``
  with ``Content-Type: application/json`` and
  ``Authorization: Basic b64(client_id:client_secret)``;
- token response JSON: ``access_token``, ``token_type``,
  ``expires_in`` (a STRING of seconds — the provider's quirk, parsed
  as ``time.ParseDuration(expires_in + "s")`` in the reference);
- the token is cached and reused until expiry (oauth2's
  ReuseTokenSource, which refreshes inside a 10s early-expiry delta);
- authenticated requests carry ``Authorization: Bearer <token>``.

``transport`` is injectable for tests (no network in this
environment); ``file://`` token URLs read the response JSON from disk
— the same offline protocol-fake discipline as ``paged_api``.
"""

from __future__ import annotations

import base64
import json
import time
from collections.abc import Callable

PROVIDER_A = "custom_provider_a"

# oauth2.ReuseTokenSource's defaultExpiryDelta: a token is treated as
# expired this many seconds before its stated expiry
EXPIRY_DELTA_S = 10

# transport(url, body_or_none, headers) -> (status_code, response_body)
Transport = Callable[[str, bytes | None, dict[str, str]], tuple[int, str]]


def _default_transport(
    url: str, data: bytes | None, headers: dict[str, str]
) -> tuple[int, str]:
    if url.startswith("file://"):
        # offline protocol fake: the grant_type query has no meaning on
        # a file path
        path = url[len("file://") :].split("?", 1)[0]
        with open(path, "r", encoding="utf-8") as f:
            return 200, f.read()
    import urllib.request

    req = urllib.request.Request(url, data=data, headers=headers, method="POST")
    with urllib.request.urlopen(req) as resp:  # noqa: S310
        return resp.status, resp.read().decode()


class ClientCredentials:
    """Cached client-credentials token source (provider A semantics)."""

    def __init__(
        self,
        client_id: str,
        client_secret: str,
        token_url: str,
        transport: Transport | None = None,
        clock: Callable[[], float] = time.time,
    ):
        self.client_id = client_id
        self.client_secret = client_secret
        self.token_url = token_url
        self.transport = transport or _default_transport
        self.clock = clock
        self._token: str | None = None
        self._expiry: float = 0.0

    def token(self) -> str:
        if self._token is not None and self.clock() < self._expiry - EXPIRY_DELTA_S:
            return self._token
        sep = "&" if "?" in self.token_url else "?"
        url = f"{self.token_url}{sep}grant_type=client_credentials"
        basic = base64.b64encode(
            f"{self.client_id}:{self.client_secret}".encode()
        ).decode()
        status, body = self.transport(
            url,
            None,
            {
                "Content-Type": "application/json",
                "Authorization": f"Basic {basic}",
            },
        )
        if status != 200:
            raise RuntimeError(
                f"failed to get token: {status}, response: {body[:500]}"
            )
        payload = json.loads(body)
        self._token = payload["access_token"]
        # expires_in is a STRING of seconds in the provider's response
        self._expiry = self.clock() + float(payload["expires_in"])
        return self._token

    def auth_header(self) -> dict[str, str]:
        return {"Authorization": f"Bearer {self.token()}"}


def from_component_config(
    c: dict[str, str], transport: Transport | None = None
) -> ClientCredentials | None:
    """Build a token source from a component's stripped config keys
    (``client_credentials_*``). The flow activates only when ALL four
    values are set (ext/http/utils.go:14-16 isUsingOAuth2); an unknown
    provider is an error, matching utils.go:23-24."""
    provider = c.get("client_credentials_provider", "")
    cid = c.get("client_credentials_client_id", "")
    secret = c.get("client_credentials_client_secret", "")
    token_url = c.get("client_credentials_token_url", "")
    if not (provider and cid and secret and token_url):
        return None
    if provider.lower() != PROVIDER_A:
        raise ValueError(
            f"unsupported client credentials provider: {provider}"
        )
    return ClientCredentials(cid, secret, token_url, transport=transport)


def parse_headers(content: str) -> dict[str, str]:
    """Parse ``Key: v1,v2`` header lines (ext/http/source.go:33-47).
    The reference keeps a multi-valued map; urllib carries one line per
    key, so multi-values stay comma-joined — equivalent on the wire
    per RFC 9110 field-line folding.

    Documented relaxation: the reference splits on EVERY colon and
    errors when a value itself contains one ('Referer: https://…'
    would be rejected); splitting on the first colon accepts those —
    a strict superset of the reference's accepted inputs."""
    headers: dict[str, str] = {}
    for line in content.splitlines():
        if not line.strip():
            continue
        key, sep, vals = line.partition(":")
        if not sep or not key.strip():
            raise ValueError("invalid header format, expected 'key: value'")
        key, vals = key.strip(), vals.strip()
        headers[key] = f"{headers[key]},{vals}" if key in headers else vals
    return headers
