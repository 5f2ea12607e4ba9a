"""PostgreSQL value normalization and schema validity checks.

The reference normalizes PG wire values into portable record shapes
(ext/postgresql/source.go:150-191 ``normalizePGValue``): UUIDs to
canonical lowercase strings, BYTEA to ``\\x``-hex, TIME to
``HH:MM:SS``, INTERVAL to a Go ``time.Duration`` string (months
counted as 30 days, days as 24h — the reference's exact arithmetic),
XML to text, MACADDR to colon-hex. Its sink refuses records whose
headers don't match the destination table's ``information_schema``
columns (ext/postgresql/util.go:15-37 ``checkSchemaValidity``,
:39-70 ``getTableColumns``).

Spark's JDBC reader hides the wire OIDs, so the type map is explicit:
``normalize_pg_frame(df, {"col": "uuid", ...})`` applies the same
transforms as a post-projection — Catalyst expressions only, no UDFs.
In live use the map comes from ``information_schema.columns``
(``data_type``/``udt_name``); tests construct JDBC-shaped frames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_US_PER_MS = 1_000
_US_PER_S = 1_000_000
_US_PER_MIN = 60 * _US_PER_S
_US_PER_H = 3600 * _US_PER_S
# source.go:172-174: months -> 30 days, days -> 24h, plus microseconds
_US_PER_DAY = 24 * _US_PER_H
_US_PER_MONTH = 30 * _US_PER_DAY


def _trim_frac(digits: Column) -> Column:
    """Strip trailing zeros from a fractional-digit string; empty when
    all zeros."""
    return F.regexp_replace(digits, "0+$", "")


def _with_frac(whole: Column, frac_digits: Column) -> Column:
    """``<whole>[.<frac>]`` with the fraction omitted when zero."""
    trimmed = _trim_frac(frac_digits)
    return F.concat(
        whole.cast("string"),
        F.when(trimmed != "", F.concat(F.lit("."), trimmed)).otherwise(
            F.lit("")
        ),
    )


def go_duration(micros: Column) -> Column:
    """Format microseconds exactly as Go's ``time.Duration.String()``
    (source.go:170-176 renders intervals through it): ``0s``; sub-ms
    as ``<n>µs``; sub-second as ``<n[.frac]>ms``; else
    ``[-][Nh][Nm]S[.frac]s`` where intermediate zero units print once
    a larger unit has ("1h0m0s"). PG intervals are micro-precision, so
    the ns branch never occurs."""
    a = F.abs(micros)
    sign = F.when(micros < 0, F.lit("-")).otherwise(F.lit(""))
    us = F.concat((a % _US_PER_MS).cast("string"), F.lit("µs"))
    ms = F.concat(
        _with_frac(
            (a / _US_PER_MS).cast("long"),
            F.lpad((a % _US_PER_MS).cast("string"), 3, "0"),
        ),
        F.lit("ms"),
    )
    secs_total = (a / _US_PER_S).cast("long")
    frac = F.lpad((a % _US_PER_S).cast("string"), 6, "0")
    h = (secs_total / 3600).cast("long")
    m = ((secs_total / 60) % 60).cast("long")
    s = secs_total % 60
    big = F.concat(
        F.when(h > 0, F.concat(h.cast("string"), F.lit("h"))).otherwise(
            F.lit("")
        ),
        F.when((h > 0) | (m > 0), F.concat(m.cast("string"), F.lit("m")))
        .otherwise(F.lit("")),
        _with_frac(s, frac),
        F.lit("s"),
    )
    return F.when(a == 0, F.lit("0s")).otherwise(
        F.concat(
            sign,
            F.when(a < _US_PER_MS, us)
            .when(a < _US_PER_S, ms)
            .otherwise(big),
        )
    )


def interval_micros(iv: Column) -> Column:
    """Total microseconds of a pgtype.Interval-shaped struct column
    ``(months int, days int, microseconds long)`` using the
    reference's month/day folding (source.go:172-174)."""
    return (
        iv.getField("microseconds")
        + iv.getField("days").cast("long") * F.lit(_US_PER_DAY)
        + iv.getField("months").cast("long") * F.lit(_US_PER_MONTH)
    )


def normalize_pg_value(col: Column, pg_type: str) -> Column:
    """One column's ``normalizePGValue`` transform. ``pg_type`` is the
    lowercase PG type name (``udt_name``); unknown types pass through
    unchanged, as the reference's default branch does."""
    t = pg_type.lower()
    if t == "uuid":
        # uuid.UUID(b).String() is canonical lowercase-hyphenated
        return F.lower(col.cast("string"))
    if t == "bytea":
        # fmt.Sprintf("\\x%x", b): lowercase hex with the \x prefix
        return F.concat(F.lit("\\x"), F.lower(F.hex(col)))
    if t == "time":
        # pgtype.Time microseconds-since-midnight -> time.TimeOnly
        # ("15:04:05"); JDBC-shaped frames may carry a timestamp
        # instead, which formats identically
        return F.when(
            col.cast("string").rlike(r"^\d+$"),
            F.date_format(
                F.timestamp_micros(col.cast("long")), "HH:mm:ss"
            ),
        ).otherwise(F.date_format(col.cast("timestamp"), "HH:mm:ss"))
    if t == "interval":
        return go_duration(interval_micros(col))
    if t == "xml":
        return col.cast("string")
    if t == "macaddr":
        # net.HardwareAddr bytes -> lowercase colon-hex; JDBC gives the
        # textual form already, so normalize case (binary input also
        # accepted: 6-byte address)
        return F.when(
            col.cast("string").contains(":"),
            F.lower(col.cast("string")),
        ).otherwise(
            F.lower(
                F.regexp_replace(F.hex(col), "(..)(?!$)", "$1:")
            )
        )
    return col


def normalize_pg_frame(df: DataFrame, pg_types: dict[str, str]) -> DataFrame:
    """Apply :func:`normalize_pg_value` per column as one projection."""
    if not pg_types:
        return df
    return df.select(
        *[
            normalize_pg_value(F.col(c), pg_types[c]).alias(c)
            if c in pg_types
            else F.col(c)
            for c in df.columns
        ]
    )


def table_columns_query(table: str) -> str:
    """The reference's ``getTableColumns`` information_schema query,
    schema-qualified when the table name carries a dot
    (util.go:39-47)."""
    parts = table.split(".")
    if len(parts) > 1:
        return (
            "SELECT column_name FROM information_schema.columns "
            f"WHERE table_schema = '{parts[0]}' AND table_name = "
            f"'{parts[1]}' ORDER BY ordinal_position"
        )
    return (
        "SELECT column_name FROM information_schema.columns "
        f"WHERE table_name = '{table}' ORDER BY ordinal_position"
    )


def check_schema_validity(
    table_columns: list[str], headers: list[str], log=None
) -> None:
    """``checkSchemaValidity`` (util.go:15-37): warn when counts differ
    (missing columns land NULL/default), fail fast when a record field
    matches no table column — case-insensitively, BEFORE any rows are
    sent, with the reference's error message."""
    import logging

    log = log or logging.getLogger(__name__)
    if len(table_columns) != len(headers):
        log.warning(
            "table columns and record headers do not match: %d != %d, "
            "%d columns will have null/default value",
            len(table_columns),
            len(headers),
            len(table_columns) - len(headers),
        )
    known = {c.lower() for c in table_columns}
    for field in headers:
        if field.lower() not in known:
            raise ValueError(
                f"field '{field}' does not match any column in the table"
            )
