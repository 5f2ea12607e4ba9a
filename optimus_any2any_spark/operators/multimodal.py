"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Image/audio/video at pipeline scale are opaque ``binary`` columns with a
typed metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row-at-a-time.

Decode support is split honestly by dependency weight:

- **PPM (P6) payloads decode for real** — header parse + raw RGB24 via
  numpy, including a real nearest-neighbor resize that emits a valid
  P6 payload. No imaging library needed.
- **WAV (RIFF/PCM) payloads decode for real** — stdlib ``wave``:
  sample rate / channels / duration / RMS energy, plus a real
  nearest-sample resample re-encoded as valid WAV.
- **PNG payloads decode for real** — :mod:`..formats.png`: DEFLATE is
  stdlib ``zlib``, the five predictor filters are byte math. Feature
  extraction reads dimensions from IHDR without inflating; resize does
  the full decode → nearest-neighbor → re-encode round trip.
- **Baseline JPEG payloads decode for real** — :mod:`..formats.jpeg`:
  T.81 baseline on stdlib + numpy (Annex K tables, Huffman, DCT);
  header-only dimension reads, full decode, resize re-encode. Flat
  DC-only blocks are bit-exact quantizer fixed points, which is how a
  LOSSY codec participates in the exact oracle gate.
- **MP4 container STRUCTURE parses for real** — :mod:`..formats.mp4`:
  ISO-BMFF box walking gives brand, timescale, duration, and per-track
  dimensions with stdlib byte math; frame DECODE stays a stub (H.264
  needs ffmpeg-class dependencies).
- **MP3 frame headers parse for real** — :mod:`..formats.mp3`:
  bitrate/sample-rate/frame-count/duration from the 4-byte header
  walk, ID3v2 skipped by its syncsafe size.
- Remaining codec work (AV SAMPLE decode) is STUBBED
  (ffmpeg absent in this environment): the UDFs raise unless
  ``fake=True``, which derives deterministic pseudo-features from the
  payload hash so the full pipeline shape stays exercisable and
  oracle-checkable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark import cloudpickle
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from optimus_any2any_spark.formats import jpeg as _jpeg
from optimus_any2any_spark.formats import mp3 as _mp3
from optimus_any2any_spark.formats import mp4 as _mp4
from optimus_any2any_spark.formats import png as _png

# Worker closures must be self-contained: the package is NOT on worker
# PYTHONPATH when an external driver session runs us (see the verify
# recipe's gotchas). Registering the codec modules for BY-VALUE pickling
# lets mapInPandas closures call formats.png/jpeg directly — cloudpickle
# ships the module's code with the task instead of an import-by-name.
cloudpickle.register_pickle_by_value(_png)
cloudpickle.register_pickle_by_value(_jpeg)
cloudpickle.register_pickle_by_value(_mp4)
cloudpickle.register_pickle_by_value(_mp3)

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
    the text — a deterministic stand-in for real media bytes). NULL
    documents carry no payload and are dropped, matching the oracles'
    ``WHERE text IS NOT NULL``."""
    df = df.filter(F.col(text_col).isNotNull())
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Serialize raw RGB24 bytes as a binary PPM (P6) payload."""
    assert len(rgb) == width * height * 3
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


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
            if payload.startswith(b"P6") or payload.startswith(b"P5"):
                # real decode: PPM/PGM header is "P6|P5\n<w> <h>\n<maxval>\n"
                parts = payload.split(b"\n", 3)
                w, h = parts[1].split()
                return int(w), int(h)
            if _png.is_png(payload):
                # real decode: dimensions live in IHDR — no inflate
                w, h, _ct, _d = _png.png_header(payload)
                return w, h
            if _jpeg.is_jpeg(payload):
                # real decode: SOF0 frame header — no entropy decode
                w, h, _nc = _jpeg.jpeg_header(payload)
                return w, h
            if _mp4.is_mp4(payload):
                # real CONTAINER parse: tkhd dimensions of the first
                # sized (video) track — frame decode stays stubbed
                meta = _mp4.parse_mp4(payload)
                for t in meta["tracks"]:
                    if t["width"]:
                        return t["width"], t["height"]
                return 0, 0
            if not fake:
                raise NotImplementedError(
                    "video-container decode requires a media library "
                    "not present in this environment (PPM/PNG/JPEG "
                    "decode natively)"
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

    PPM (P6) payloads resize for REAL: numpy nearest-neighbor over the
    raw RGB24 plane, re-encoded as a valid P6 payload of the target
    size. Compressed formats fall back to the stub (with
    ``fake_decode`` the "resized" payload is a deterministic
    truncation/pad — preserving the contract: payload→payload, 1:1
    rows, bounded output size). The Spark shape is exact either way:
    binary column through mapInPandas, output partitions inherit input
    partitioning, no shuffle.
    """
    fake, tw, th = fake_decode, target_w, target_h

    def run(batches):
        import numpy as np
        import pandas as pd

        n_bytes = tw * th // 64

        def resize_ppm(b: bytes) -> bytes:
            header, rest = b.split(b"\n", 1)
            dims, rest = rest.split(b"\n", 1)
            _maxval, raw = rest.split(b"\n", 1)
            w, h = (int(x) for x in dims.split())
            ch = 3 if header == b"P6" else 1  # P5 = grayscale PGM
            img = np.frombuffer(raw[: w * h * ch], dtype=np.uint8).reshape(
                h, w, ch
            )
            ys = (np.arange(th) * h) // th
            xs = (np.arange(tw) * w) // tw
            out = img[ys][:, xs]
            return header + b"\n%d %d\n255\n" % (tw, th) + out.tobytes()

        def resize_png(b: bytes) -> bytes:
            w, h, ct, raw = _png.decode_png(b)
            ch = {0: 1, 2: 3, 6: 4}[ct]
            img = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, ch)
            ys = (np.arange(th) * h) // th
            xs = (np.arange(tw) * w) // tw
            out = img[ys][:, xs]
            return _png.encode_png(tw, th, out.tobytes(), color_type=ct)

        def resize_jpeg(b: bytes) -> bytes:
            w, h, nc, raw = _jpeg.decode_jpeg(b)
            img = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, nc)
            ys = (np.arange(th) * h) // th
            xs = (np.arange(tw) * w) // tw
            out = img[ys][:, xs]
            return _jpeg.encode_jpeg(tw, th, out.tobytes(), gray=nc == 1)

        def fake_resize(b: bytes) -> bytes:
            b = bytes(b)
            if b.startswith(b"P6") or b.startswith(b"P5"):
                return resize_ppm(b)
            if _png.is_png(b):
                return resize_png(b)
            if _jpeg.is_jpeg(b):
                return resize_jpeg(b)
            if not fake:
                raise NotImplementedError(
                    "video-container resize requires a media library "
                    "not present in this environment (PPM/PNG/JPEG "
                    "resize natively)"
                )
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


def attach_png_payload(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 8,
    height: int = 8,
) -> DataFrame:
    """Materialize a REAL compressed image payload per document: an
    8-bit RGB PNG whose raw samples are the ASCII bytes of
    ``repeat(md5(text), …)`` truncated to w·h·3 — deterministic, so a
    SQL oracle can reconstruct the raw plane without ever seeing the
    PNG. Scanline filters cycle 0..4, so every predictor in the codec
    is exercised on the oracle-gated path, not just in unit tests.

    The md5 is computed by Catalyst (JVM); only the PNG serialization
    crosses into the Arrow batch."""
    from optimus_any2any_spark.operators.util import ensure_parallelism

    w, h = width, height
    nbytes = w * h * 3
    reps = nbytes // 32 + 1
    # same parallelism guard as attach_jpeg_payload: encode is
    # CPU-bound Python work per payload
    base = ensure_parallelism(
        df.filter(F.col(text_col).isNotNull()), F.col(id_col)
    ).select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("hx")
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        filters = [y % 5 for y in range(h)]

        def build(hx: str) -> bytes:
            raw = (hx * reps)[:nbytes].encode("ascii")
            return _png.encode_png(w, h, raw, color_type=2, filters=filters)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["hx"].map(build),
                    "media_type": "image/png",
                }
            )

    return base.mapInPandas(run, schema=PAYLOAD_SCHEMA)


def attach_jpeg_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Materialize a REAL baseline-JPEG payload per document: a 16x16
    RGB image of four flat 8x8 gray blocks whose levels derive from the
    doc's md5 — level_i = 112 + 2*hexdigit_i, even offsets from 128, so
    each block is a bit-exact fixed point of the Annex K quantizer (see
    :mod:`..formats.jpeg`) and a SQL oracle can predict the DECODED
    pixels of a lossy codec exactly."""

    from optimus_any2any_spark.operators.util import ensure_parallelism

    # per-image encode is CPU-bound Python: a one-file input would
    # funnel every payload through ONE Arrow batch on one core
    base = ensure_parallelism(
        df.filter(F.col(text_col).isNotNull()), F.col(id_col)
    ).select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("hx")
    )

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def build(hx: str) -> bytes:
            img = np.empty((16, 16, 3), dtype=np.uint8)
            for b in range(4):
                v = 112 + 2 * int(hx[b], 16)
                by, bx = divmod(b, 2)
                img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, :] = v
            return _jpeg.encode_jpeg(16, 16, img.tobytes())

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["hx"].map(build),
                    "media_type": "image/jpeg",
                }
            )

    return base.mapInPandas(run, schema=PAYLOAD_SCHEMA)


JPEG_LEVELS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("level_0", T.IntegerType()),
        T.StructField("level_1", T.IntegerType()),
        T.StructField("level_2", T.IntegerType()),
        T.StructField("level_3", T.IntegerType()),
    ]
)


def extract_jpeg_block_levels(df: DataFrame) -> DataFrame:
    """FULL JPEG decode (Huffman + dequant + IDCT + color transform)
    of the four-flat-block payloads, asserting in-UDF that every block
    decoded perfectly flat and gray — then emitting the four levels,
    which the oracle gate checks against the md5-derived expectation.
    Any defect anywhere in the codec (a wrong Huffman bit, a transposed
    IDCT, a color-matrix slip) breaks flatness or shifts a level."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def levels(b: bytes):
            w, h, nc, raw = _jpeg.decode_jpeg(bytes(b))
            img = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, nc)
            out = []
            for blk in range(4):
                by, bx = divmod(blk, 2)
                tile = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, :]
                if not (tile == tile[0, 0, 0]).all():
                    raise ValueError(
                        "jpeg round trip lost block flatness — codec defect"
                    )
                out.append(int(tile[0, 0, 0]))
            return w, h, out

        for pdf in batches:
            d = pdf["payload"].map(levels)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": d.map(lambda t: t[0]).astype("int32"),
                    "height": d.map(lambda t: t[1]).astype("int32"),
                    "level_0": d.map(lambda t: t[2][0]).astype("int32"),
                    "level_1": d.map(lambda t: t[2][1]).astype("int32"),
                    "level_2": d.map(lambda t: t[2][2]).astype("int32"),
                    "level_3": d.map(lambda t: t[2][3]).astype("int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        run, schema=JPEG_LEVELS_SCHEMA
    )


def attach_mp4_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Materialize a REAL (sample-free) MP4 container per document:
    duration ticks = the doc's n_chars at timescale 1000, one video
    track whose dimensions derive from the doc md5 — so a SQL oracle
    can predict the PARSED container metadata without touching a
    byte of ISO-BMFF."""
    from optimus_any2any_spark.operators.util import ensure_parallelism

    base = ensure_parallelism(
        df.filter(F.col(text_col).isNotNull()), F.col(id_col)
    ).select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(text_col)).cast("long").alias("nchars"),
        F.md5(F.col(text_col)).alias("hx"),
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def build(row) -> bytes:
            w = 16 * (int(row.hx[0], 16) + 1)
            h = 16 * (int(row.hx[1], 16) + 1)
            return _mp4.build_mp4_skeleton(
                timescale=1000,
                duration=int(row.nchars),
                tracks=[(1, w, h)],
            )

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [build(r) for r in pdf.itertuples()],
                    "media_type": "video/mp4",
                }
            )

    return base.mapInPandas(run, schema=PAYLOAD_SCHEMA)


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("brand", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_tracks", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def extract_video_metadata(df: DataFrame) -> DataFrame:
    """REAL MP4 container metadata per payload: brand, duration, track
    count, and the first video track's dimensions — no codec, pure box
    walking (:mod:`..formats.mp4`). Y4M payloads report their header
    dims with a synthetic 'y4m ' brand so both container families flow
    through one extractor."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def meta(b: bytes):
            b = bytes(b)
            if _mp4.is_mp4(b):
                m = _mp4.parse_mp4(b)
                w = h = 0
                for t in m["tracks"]:
                    if t["width"]:
                        w, h = t["width"], t["height"]
                        break
                return m["brand"], m["duration_ms"], m["n_tracks"], w, h
            if b.startswith(b"YUV4MPEG2 "):
                header = b.split(b"\n", 1)[0].decode("latin-1")
                fields = dict(
                    (f[0], f[1:]) for f in header.split(" ")[1:] if f
                )
                return (
                    "y4m ",
                    None,
                    1,
                    int(fields.get("W", 0)),
                    int(fields.get("H", 0)),
                )
            raise NotImplementedError(
                "video metadata supports MP4 containers and Y4M"
            )

        for pdf in batches:
            d = pdf["payload"].map(meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "brand": d.map(lambda t: t[0]),
                    "duration_ms": d.map(lambda t: t[1]).astype("Int64"),
                    "n_tracks": d.map(lambda t: t[2]).astype("int32"),
                    "width": d.map(lambda t: t[3]).astype("int32"),
                    "height": d.map(lambda t: t[4]).astype("int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        run, schema=VIDEO_META_SCHEMA
    )


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ahash_hex", T.StringType()),
    ]
)


def image_ahash(df: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) over REALLY decoded images: full
    codec decode (PNG / baseline JPEG / PPM-PGM), integer grayscale,
    nearest-neighbor 8x8 downsample, then bit i = pixel_i strictly
    above the mean — packed row-major, x=0 as each row byte's MSB, as
    16 hex chars. Pure integer comparisons (pixel*64 > sum), so the
    fingerprint is bit-exact across engines and partitionings; the
    classic near-dup key for image corpora (pHash family), robust to
    re-encoding because it is computed from DECODED pixels, not bytes.
    """

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def ahash(b: bytes) -> str:
            b = bytes(b)
            if _png.is_png(b):
                w, h, ct, raw = _png.decode_png(b)
                ch = {0: 1, 2: 3, 6: 4}[ct]
            elif _jpeg.is_jpeg(b):
                w, h, ch, raw = _jpeg.decode_jpeg(b)
            elif b.startswith(b"P6") or b.startswith(b"P5"):
                header, rest = b.split(b"\n", 1)
                dims, rest = rest.split(b"\n", 1)
                _mx, raw = rest.split(b"\n", 1)
                w, h = (int(x) for x in dims.split())
                ch = 3 if header == b"P6" else 1
                raw = raw[: w * h * ch]
            else:
                raise NotImplementedError(
                    "ahash needs a decodable image (PNG/JPEG/PPM/PGM)"
                )
            img = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, ch)
            gray = img[:, :, :3].mean(axis=2).astype(np.int64) if ch >= 3 \
                else img[:, :, 0].astype(np.int64)
            ys = (np.arange(8) * h) // 8
            xs = (np.arange(8) * w) // 8
            g8 = gray[ys][:, xs]
            total = int(g8.sum())
            bits = (g8 * 64 > total).astype(np.uint8)
            out = 0
            for y in range(8):
                byte = 0
                for x in range(8):
                    byte = (byte << 1) | int(bits[y, x])
                out = (out << 8) | byte
            return "%016x" % out

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "ahash_hex": pdf["payload"].map(ahash),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        run, schema=AHASH_SCHEMA
    )


RAW_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("raw_sha256", T.StringType()),
    ]
)


def extract_image_raw_features(df: DataFrame) -> DataFrame:
    """FULL image decode (not just header sniffing): inflate, unfilter,
    and hash the reconstructed sample plane. Supports the formats this
    environment decodes for real — PNG and PPM/PGM; anything else
    raises (no fake path here: a wrong byte anywhere in the codec
    changes ``raw_sha256``, which is exactly what the oracle gate
    checks)."""

    def run(batches: Iterator) -> Iterator:
        import hashlib as _hl

        import pandas as pd

        def feats(b: bytes):
            b = bytes(b)
            if _png.is_png(b):
                w, h, ct, raw = _png.decode_png(b)
                ch = {0: 1, 2: 3, 6: 4}[ct]
            elif b.startswith(b"P6") or b.startswith(b"P5"):
                header, rest = b.split(b"\n", 1)
                dims, rest = rest.split(b"\n", 1)
                _maxval, raw = rest.split(b"\n", 1)
                w, h = (int(x) for x in dims.split())
                ch = 3 if header == b"P6" else 1
                raw = raw[: w * h * ch]
            else:
                raise NotImplementedError(
                    "full decode supports PNG and PPM/PGM payloads only"
                )
            return w, h, ch, _hl.sha256(raw).hexdigest()

        for pdf in batches:
            d = pdf["payload"].map(feats)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": d.map(lambda t: t[0]).astype("int32"),
                    "height": d.map(lambda t: t[1]).astype("int32"),
                    "channels": d.map(lambda t: t[2]).astype("int32"),
                    "raw_sha256": d.map(lambda t: t[3]),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        run, schema=RAW_FEATURE_SCHEMA
    )


def sample_frames(
    df: DataFrame, every_n: int = 4, max_frames: int = 8,
    frame_bytes: int = 256, fake_decode: bool = True,
) -> DataFrame:
    """Video frame sampling: one binary payload → N frame rows (1:N).

    Y4M (YUV4MPEG2) payloads sample for REAL: the container is a text
    header (``W<w> H<h> ... C420``) followed by ``FRAME``-delimited raw
    YUV planes, so every ``every_n``-th frame extracts with pure byte
    math — no video library. Other containers (mp4/webm) fall back to
    the deterministic slice stub under ``fake_decode`` or raise. Either
    way the contract that matters at scale is real: fan-out happens
    INSIDE mapInPandas (one Arrow batch in, multiple rows out), so a
    10 GB video never becomes a 10 GB shuffle row — and downstream
    per-frame work repartitions on (doc_id, frame_index), not on
    payloads.
    """
    fake, n, mx, fb = fake_decode, every_n, max_frames, frame_bytes

    def run(batches):
        import hashlib as _hl

        import pandas as pd

        def y4m_frames(b: bytes):
            # frame size is FIXED and computable from the header, so
            # frames are sliced by size — never by searching for the
            # b"FRAME" marker, which can legitimately occur inside raw
            # plane bytes and would corrupt every boundary after it
            header, _, body = b.partition(b"\n")
            w = h = None
            colorspace = b"C420"
            for p in header.split(b" ")[1:]:
                if p.startswith(b"W"):
                    w = int(p[1:])
                elif p.startswith(b"H"):
                    h = int(p[1:])
                elif p.startswith(b"C"):
                    colorspace = p
            sizes = {
                b"C420": lambda: w * h * 3 // 2,
                b"C420jpeg": lambda: w * h * 3 // 2,
                b"C420paldv": lambda: w * h * 3 // 2,
                b"C422": lambda: w * h * 2,
                b"C444": lambda: w * h * 3,
                b"Cmono": lambda: w * h,
            }
            if w is None or h is None or colorspace not in sizes:
                raise NotImplementedError(
                    f"y4m: unsupported header {header!r}"
                )
            fsize = sizes[colorspace]()
            out, pos = [], 0
            while body.startswith(b"FRAME", pos):
                nl = body.index(b"\n", pos)  # end of FRAME param line
                out.append(body[nl + 1 : nl + 1 + fsize])
                pos = nl + 1 + fsize
            return out

        for pdf in batches:
            ids, idxs, frames, hashes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b.startswith(b"YUV4MPEG2"):
                    src = y4m_frames(b)
                    for out_i, src_i in enumerate(range(0, len(src), n)):
                        if out_i >= mx:
                            break
                        frame = src[src_i]
                        ids.append(doc_id)
                        idxs.append(src_i)
                        frames.append(frame)
                        hashes.append(_hl.sha256(frame).hexdigest())
                    continue
                if not fake:
                    raise NotImplementedError(
                        "compressed-video frame extraction requires a video "
                        "library not present (Y4M samples natively)"
                    )
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


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def extract_audio_features(df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched audio feature extraction.

    WAV (RIFF/PCM) payloads decode for REAL via the stdlib ``wave``
    module — sample rate, channels, frame count, duration, and int16
    RMS energy (the standard silence/clipping screen). MP3 payloads
    parse their frame headers for REAL (:mod:`..formats.mp3`): rate,
    channels, frame count, duration — RMS is null there since it needs
    sample decode, the honest stub. Other containers (ogg/flac) fall
    back to the deterministic pseudo-feature stub under
    ``fake_decode`` or raise.
    """
    fake = fake_decode

    def run(batches):
        import hashlib as _hl
        import io
        import wave as _wave

        import numpy as np
        import pandas as pd

        def decode(b: bytes):
            if b.startswith(b"RIFF"):
                with _wave.open(io.BytesIO(b)) as w:
                    if w.getsampwidth() != 2:
                        raise NotImplementedError(
                            "only 16-bit PCM WAV decodes natively "
                            f"(got sampwidth={w.getsampwidth()})"
                        )
                    sr, ch, nf = (
                        w.getframerate(),
                        w.getnchannels(),
                        w.getnframes(),
                    )
                    pcm = np.frombuffer(
                        w.readframes(nf), dtype=np.int16
                    ).astype(np.float64)
                rms = float(np.sqrt(np.mean(pcm * pcm))) if len(pcm) else 0.0
                return sr, ch, nf, (nf * 1000) // max(sr, 1), round(rms, 6)
            if _mp3.is_mp3(b):
                # REAL frame-header walk (formats/mp3.py): rate,
                # channels, frame count, duration — RMS needs sample
                # decode (the honest stub), reported as null (the NaN
                # crosses Arrow as null)
                m = _mp3.parse_mp3(b)
                return (
                    m["sample_rate"],
                    1 if m["channel_mode"] == "mono" else 2,
                    m["n_frames"],
                    m["duration_ms"],
                    float("nan"),
                )
            if not fake:
                raise NotImplementedError(
                    "compressed-audio SAMPLE decode requires an audio "
                    "library not present in this environment (WAV decodes "
                    "natively; MP3 frame headers parse natively)"
                )
            h = _hl.md5(b).hexdigest()
            sr = 8000 * (1 + int(h[0], 16) % 3)
            nf = 1000 + int(h[1:5], 16)
            return sr, 1, nf, (nf * 1000) // sr, float(int(h[5], 16))

        for pdf in batches:
            rows = [decode(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pd.Series(
                        [r[0] for r in rows], dtype="int32"
                    ),
                    "n_channels": pd.Series(
                        [r[1] for r in rows], dtype="int32"
                    ),
                    "n_frames": pd.Series([r[2] for r in rows], dtype="int64"),
                    "duration_ms": pd.Series(
                        [r[3] for r in rows], dtype="int64"
                    ),
                    "rms": pd.Series([r[4] for r in rows], dtype="float64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=AUDIO_SCHEMA)


def resample_audio(
    df: DataFrame, target_hz: int = 16000, fake_decode: bool = True
) -> DataFrame:
    """Arrow-batched WAV resample (binary in → binary out, 1:1).

    Real for RIFF/PCM payloads: nearest-sample index mapping on the
    int16 plane (mono or interleaved), re-encoded as a valid WAV at
    ``target_hz`` via the stdlib ``wave`` writer. The 16 kHz mono
    contract is the standard ASR/pretraining ingest shape.
    """
    fake, hz = fake_decode, target_hz

    def run(batches):
        import io
        import wave as _wave

        import numpy as np
        import pandas as pd

        def resample(b: bytes) -> bytes:
            if not b.startswith(b"RIFF"):
                if not fake:
                    raise NotImplementedError(
                        "compressed-audio resample requires an audio "
                        "library not present (WAV resamples natively)"
                    )
                return b
            with _wave.open(io.BytesIO(b)) as w:
                if w.getsampwidth() != 2:
                    raise NotImplementedError(
                        "only 16-bit PCM WAV resamples natively "
                        f"(got sampwidth={w.getsampwidth()})"
                    )
                sr, ch, nf = (
                    w.getframerate(),
                    w.getnchannels(),
                    w.getnframes(),
                )
                pcm = np.frombuffer(w.readframes(nf), dtype=np.int16)
            frames = pcm.reshape(-1, ch)
            if nf == 0:
                out = frames  # zero-frame WAV: emit a valid empty WAV
            else:
                n_out = max(1, (nf * hz) // max(sr, 1))
                idx = (np.arange(n_out) * nf) // n_out
                out = frames[idx]
            buf = io.BytesIO()
            with _wave.open(buf, "wb") as w:
                w.setnchannels(ch)
                w.setsampwidth(2)
                w.setframerate(hz)
                w.writeframes(out.tobytes())
            return buf.getvalue()

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"].map(
                        lambda b: resample(bytes(b))
                    ),
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return df.select("doc_id", "payload").mapInPandas(run, schema=schema)
