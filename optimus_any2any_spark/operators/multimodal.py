"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Image/audio/video at pipeline scale are opaque ``binary`` columns with a
typed metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row-at-a-time.
The decode step itself is STUBBED here (no imaging/audio libraries in
this environment — `_decode_image_stub` raises unless ``fake=True``,
which derives deterministic pseudo-features from the payload hash), but
the Spark-side plumbing — schema, batch shape, partition sizing — is
real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def attach_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Materialize an opaque binary payload column (here: utf-8 bytes of
    the text — a deterministic stand-in for real media bytes)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def _decode_image_stub(payload: bytes, fake: bool) -> tuple[int, int]:
    """STUB: real image decode needs PIL/libvips (absent here).

    With ``fake=True``, derives deterministic pseudo-dimensions from the
    payload's md5 so the full pipeline (schema, batching, joins) can be
    exercised end-to-end and checked against a SQL oracle.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "environment; pass fake=True for deterministic pseudo-decode"
        )
    h = hashlib.md5(payload).hexdigest()
    width = 64 + int(h[0], 16)
    height = 64 + int(h[1], 16)
    return width, height


def extract_features(df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The batch shape is what matters at scale: each pandas batch holds
    whole payloads (size governed by spark.sql.execution.arrow
    .maxRecordsPerBatch — tune down for large media files), and the
    output is a narrow feature table that joins back on doc_id.
    """

    # NOTE: the closure must be self-contained (no references to this
    # module's globals) — cloudpickle then ships it by value and workers
    # don't need the package importable on their PYTHONPATH.
    fake = fake_decode

    def run(batches: Iterator) -> Iterator:
        import hashlib as _hl

        import pandas as pd

        def decode(payload: bytes) -> tuple[int, int]:
            if not fake:
                raise NotImplementedError(
                    "image decode requires an imaging library not present "
                    "in this environment"
                )
            h = _hl.md5(payload).hexdigest()
            return 64 + int(h[0], 16), 64 + int(h[1], 16)

        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(
                        lambda b: _hl.sha256(bytes(b)).hexdigest()
                    ),
                }
            )
            dims = payloads.map(lambda b: decode(bytes(b)))
            out["width"] = dims.map(lambda t: t[0]).astype("int32")
            out["height"] = dims.map(lambda t: t[1]).astype("int32")
            yield out

    return df.select("doc_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)
