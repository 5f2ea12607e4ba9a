"""JSONPath projection applied before sink writes.

Reference: ``<SINK>__JSONPATH_SELECTOR`` evaluated per outgoing record
with gval+jsonpath, compiled once and cached
(internal/component/common/sink.go:113-146; used at ext/file/sink.go:97,
ext/oss/sink.go:134). The selector reshapes each record's JSON before it
is written.

Spark shape: for path selectors the projection is plain nested-column
selection (JVM-side); ``$`` is the record root. Supported:

- ``$`` — identity
- ``$.a.b`` — descend; a struct result is flattened into its fields, a
  scalar result becomes a single column named after the leaf.
- ``$['a']`` — bracket form of the same.

Anything else falls back to ``get_json_object`` over the serialized
record, which covers filters/wildcards at reduced type fidelity.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BRACKET = re.compile(r"\['([^']+)'\]|\[\"([^\"]+)\"\]")


def _parse_path(selector: str) -> list[str] | None:
    s = selector.strip()
    if not s.startswith("$"):
        return None
    s = s[1:]
    s = _BRACKET.sub(lambda m: "." + (m.group(1) or m.group(2)), s)
    if s == "":
        return []
    if not s.startswith("."):
        return None
    parts = s[1:].split(".")
    if any(not re.fullmatch(r"[\w][\w -]*", p) for p in parts):
        return None
    return parts


def apply_jsonpath(df: DataFrame, selector: str, keep: list[str] | None = None) -> DataFrame:
    """Project each record through a JSONPath selector.

    ``keep`` columns (routing/metadata) are carried through unchanged.
    """
    keep = keep or []
    parts = _parse_path(selector)
    if parts is None:
        # generic fallback: serialize record, extract, re-emit as value
        payload_cols = [c for c in df.columns if c not in keep]
        extracted = F.get_json_object(
            F.to_json(F.struct(*payload_cols)), selector
        ).alias("value")
        return df.select(extracted, *[F.col(c) for c in keep])
    if not parts:
        return df
    col = F.col(parts[0])
    dtype: T.DataType | None = dict(
        (f.name, f.dataType) for f in df.schema.fields
    ).get(parts[0])
    for p in parts[1:]:
        col = col.getField(p)
        dtype = (
            dict((f.name, f.dataType) for f in dtype.fields).get(p)
            if isinstance(dtype, T.StructType)
            else None
        )
    if isinstance(dtype, T.StructType):
        flat = df.select(col.alias("__sel"), *[F.col(c) for c in keep])
        return flat.select(
            *[F.col("__sel").getField(f.name).alias(f.name) for f in dtype.fields],
            *[F.col(c) for c in keep],
        )
    return df.select(col.alias(parts[-1]), *[F.col(c) for c in keep])
