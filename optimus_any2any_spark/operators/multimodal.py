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


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)


def resize_images(
    df: DataFrame, target_w: int = 224, target_h: int = 224,
    fake_decode: bool = True,
) -> DataFrame:
    """Arrow-batched image resize (binary in → binary out).

    STUB decode/encode (no imaging libs here): with ``fake_decode`` the
    "resized" payload is a deterministic truncation/pad of the input
    bytes to ``target_w*target_h//64`` — preserving the real contract
    (payload→payload, 1:1 rows, bounded output size). The Spark shape is
    exact: binary column through mapInPandas, output partitions inherit
    input partitioning, no shuffle.
    """
    fake, tw, th = fake_decode, target_w, target_h

    def run(batches):
        import pandas as pd

        n_bytes = tw * th // 64

        def fake_resize(b: bytes) -> bytes:
            if not fake:
                raise NotImplementedError(
                    "image resize requires an imaging library not present "
                    "in this environment"
                )
            b = bytes(b)
            return (b * (n_bytes // max(len(b), 1) + 1))[:n_bytes]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"].map(fake_resize),
                    "width": tw,
                    "height": th,
                }
            )

    out = df.select("doc_id", "payload").mapInPandas(run, schema=RESIZE_SCHEMA)
    return out


def sample_frames(
    df: DataFrame, every_n: int = 4, max_frames: int = 8,
    frame_bytes: int = 256, fake_decode: bool = True,
) -> DataFrame:
    """Video frame sampling: one binary payload → N frame rows (1:N).

    STUB decode (no video libs here): frames are deterministic
    ``frame_bytes`` slices at ``every_n``-spaced offsets. The contract
    that matters at scale is real: fan-out happens INSIDE mapInPandas
    (one Arrow batch in, multiple rows out), so a 10 GB video never
    becomes a 10 GB shuffle row — and downstream per-frame work
    repartitions on (doc_id, frame_index), not on payloads.
    """
    fake, n, mx, fb = fake_decode, every_n, max_frames, frame_bytes

    def run(batches):
        import hashlib as _hl

        import pandas as pd

        for pdf in batches:
            ids, idxs, frames, hashes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError(
                        "frame extraction requires a video library not "
                        "present in this environment"
                    )
                b = bytes(payload)
                for i in range(mx):
                    off = i * n * fb
                    if off >= len(b):
                        break
                    frame = b[off : off + fb]
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(frame)
                    hashes.append(_hl.sha256(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                    "frame_sha256": hashes,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)
