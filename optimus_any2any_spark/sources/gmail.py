"""Gmail source decode chain (ext/gmail/source.go:64-155).

The reference lists messages matching a filter, walks each message's
payload parts, and for every part with a filename: fetches the
attachment, base64-URL-decodes it, normalizes line endings, converts
``.csv``/``.tsv`` to records via the CSV converter (first row is the
header unless skipped, every value a STRING —
internal/ext/fileconverter/csv2json.go:58-91), treats ``.json`` (and,
with a warning, unknown extensions) as NDJSON, and stamps each record
with the attachment filename under ``GMAIL__FILENAME_COLUMN``.

This module is that chain as pure functions over an injectable
message-store protocol (no live Google client in this environment)::

    service.list(query)                      -> [message_id, ...]
    service.get(message_id)                  -> {"parts": [
        {"filename": str, "attachment_id": str}, ...]}
    service.get_attachment(message_id, attachment_id) -> base64url str

The fetch loop is driver-side and sequential exactly like the
reference's; the resulting records parallelize into a DataFrame.
"""

from __future__ import annotations

import base64
import csv
import io
import json
import logging

log = logging.getLogger(__name__)


def normalize_line_endings(text: str) -> str:
    """CRLF/CR → LF (xio.NewNormalizeLineEndingReader)."""
    return text.replace("\r\n", "\n").replace("\r", "\n")


def decode_attachment(data: str) -> str:
    """base64 URL-safe decode (source.go:115 ``base64.URLEncoding``).
    The live Gmail API returns unpadded payloads, Go's URLEncoding
    emits padded ones — accept both."""
    pad = "=" * (-len(data) % 4)
    return base64.urlsafe_b64decode(data + pad).decode()


def csv_records(
    text: str, delimiter: str = ",", skip_header: bool = False
) -> list[dict]:
    """CSV2JSON (fileconverter/csv2json.go:58-91): first row names the
    columns (or positional "0","1",… names with ``skip_header``), and
    every value stays a string — typing happens downstream, exactly as
    in the FILE source's CSV path."""
    reader = csv.reader(io.StringIO(text), delimiter=delimiter)
    headers: list[str] | None = None
    out: list[dict] = []
    for row in reader:
        if not row:
            continue
        if headers is None:
            if skip_header:
                headers = [str(i) for i in range(len(row))]
            else:
                headers = row
                continue
        if len(row) != len(headers):
            # Go's encoding/csv returns ErrFieldCount for ragged rows
            # and the reference surfaces the failure — a silent
            # zip-truncation would let corrupted attachments produce
            # structurally valid but wrong records
            raise ValueError(
                f"record on line {len(out) + 2}: wrong number of "
                f"fields (got {len(row)}, want {len(headers)})"
            )
        out.append(dict(zip(headers, row)))
    return out


def attachment_records(
    filename: str, data_b64url: str, delimiter: str = ","
) -> list[dict]:
    """One attachment → records, dispatched on extension
    (source.go:122-146)."""
    text = normalize_line_endings(decode_attachment(data_b64url))
    ext = "." + filename.rsplit(".", 1)[-1].lower() if "." in filename else ""
    if ext == ".csv":
        return csv_records(text, delimiter=delimiter)
    if ext == ".tsv":
        return csv_records(text, delimiter="\t")
    if ext != ".json":
        log.warning(
            "unsupported file format: %s, use default (json)", ext
        )
    return [
        json.loads(line) for line in text.splitlines() if line.strip()
    ]


def gmail_records(
    service,
    query: str = "",
    filename_column: str = "__METADATA__filename",
    csv_delimiter: str = ",",
) -> list[dict]:
    """The full list → get → attachment → decode → convert chain.
    Parts without a filename are skipped (source.go:103-106); records
    gain the filename metadata column (source.go:149-151)."""
    out: list[dict] = []
    for msg_id in service.list(query):
        msg = service.get(msg_id)
        for part in msg.get("parts", []):
            filename = part.get("filename", "")
            if not filename:
                continue
            data = service.get_attachment(msg_id, part["attachment_id"])
            for rec in attachment_records(
                filename, data, delimiter=csv_delimiter
            ):
                rec[filename_column] = filename
                out.append(rec)
    return out
