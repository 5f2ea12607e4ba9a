"""Salesforce session login (ext/salesforce/client.go:29-38).

The reference authenticates with simpleforce's ``LoginPassword``: a
SOAP partner-API login — POST to ``{host}/services/Soap/u/{version}``
with the username and password+security-token concatenated, parse the
``sessionId`` from the response envelope — then issues REST queries
with ``Authorization: Bearer <sessionId>``. ``IncludeDeleted``
switches the REST path from ``query`` to ``queryAll``
(ext/salesforce/source.go:67 ``client.Query(includeDeleted, soql)``).

``transport`` is injectable (no live Salesforce here); ``file://``
hosts read the response envelope from disk, the same offline
protocol-fake discipline as the other sources.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from xml.sax.saxutils import escape

DEFAULT_API_VERSION = "54.0"

# transport(url, body, headers) -> (status, response_text)
Transport = Callable[[str, bytes, dict[str, str]], tuple[int, str]]


def _default_transport(
    url: str, data: bytes, headers: dict[str, str]
) -> tuple[int, str]:
    if url.startswith("file://"):
        path = url[len("file://") :].split("?", 1)[0]
        with open(path, "r", encoding="utf-8") as f:
            return 200, f.read()
    import urllib.request

    req = urllib.request.Request(url, data=data, headers=headers, method="POST")
    with urllib.request.urlopen(req) as resp:  # noqa: S310
        return resp.status, resp.read().decode()


def login_envelope(user: str, password: str, security_token: str) -> str:
    """The partner-WSDL login body: password and security token are
    CONCATENATED (simpleforce LoginPassword semantics)."""
    return (
        '<?xml version="1.0" encoding="utf-8" ?>'
        "<env:Envelope"
        ' xmlns:xsd="http://www.w3.org/2001/XMLSchema"'
        ' xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"'
        ' xmlns:env="http://schemas.xmlsoap.org/soap/envelope/">'
        "<env:Body>"
        '<n1:login xmlns:n1="urn:partner.soap.sforce.com">'
        f"<n1:username>{escape(user)}</n1:username>"
        f"<n1:password>{escape(password)}{escape(security_token)}</n1:password>"
        "</n1:login>"
        "</env:Body>"
        "</env:Envelope>"
    )


def soap_login(
    host: str,
    user: str,
    password: str,
    security_token: str = "",
    api_version: str = DEFAULT_API_VERSION,
    transport: Transport | None = None,
) -> str:
    """Perform the SOAP login; returns the session id used as the
    Bearer token on every REST request."""
    transport = transport or _default_transport
    url = f"{host}/services/Soap/u/{api_version}"
    status, body = transport(
        url,
        login_envelope(user, password, security_token).encode(),
        {
            "Content-Type": "text/xml; charset=UTF-8",
            "SOAPAction": "login",
        },
    )
    if status != 200:
        raise RuntimeError(f"salesforce login failed: {status}: {body[:500]}")
    m = re.search(r"<sessionId>([^<]+)</sessionId>", body)
    if not m:
        raise RuntimeError(
            "salesforce login response carried no sessionId: "
            + body[:500]
        )
    return m.group(1)


def query_url(
    host: str, api_version: str = DEFAULT_API_VERSION, include_deleted: bool = False
) -> str:
    """REST query endpoint; ``queryAll`` surfaces soft-deleted records
    (source.go:67 includeDeleted)."""
    verb = "queryAll" if include_deleted else "query"
    return f"{host}/services/data/v{api_version}/{verb}"
