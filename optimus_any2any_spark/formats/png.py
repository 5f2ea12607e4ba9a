"""Real PNG codec on the stdlib — no imaging library.

PNG's compression is DEFLATE (RFC 1951), which ships with Python as
``zlib``; everything else in the format is plain byte-structure: chunk
framing with CRC-32, an IHDR header, and five per-scanline predictor
filters (None/Sub/Up/Average/Paeth, RFC 2083 §6). That makes PNG the
one *compressed* image format this environment can decode for REAL —
so the multimodal pipeline's "compressed codec" seam
(:mod:`..operators.multimodal`) gets a genuine member instead of a
stub, with the same UDF signature the stubbed JPEG path reserves.

Scope (raises :class:`NotImplementedError` outside it, so callers can
route to the stub/fake path honestly):

- bit depth 8; color types 0 (gray), 2 (RGB), 6 (RGBA)
- interlace 0 (Adam7 would multiply the unfilter pass 7-fold for no
  pipeline value here)
- palette (type 3) and 16-bit depths rejected

The decoder validates chunk CRCs and reassembles multi-IDAT streams
(encoders may split IDAT arbitrarily — the zlib stream is the concat).
Unfiltering is sequential per scanline by spec (Sub/Average/Paeth
reference the just-reconstructed left neighbor); rows are independent
only for None/Up. Payloads decode whole inside one Arrow batch, so
this per-row loop is per-image work bounded by image size — the
DataFrame layer above it stays fully parallel.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (bit depth 8 only)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == _SIG


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_scanline(
    ftype: int, raw: bytearray, prior: bytearray, bpp: int
) -> bytes:
    """Apply filter ``ftype`` to one raw scanline (encoder side)."""
    n = len(raw)
    if ftype == 0:
        return bytes(raw)
    out = bytearray(n)
    for i in range(n):
        a = raw[i - bpp] if i >= bpp else 0
        b = prior[i]
        c = prior[i - bpp] if i >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"png: filter type {ftype} out of range")
        out[i] = (raw[i] - pred) & 0xFF
    return bytes(out)


def _unfilter_scanline(
    ftype: int, flt: bytes, prior: bytearray, bpp: int
) -> bytearray:
    """Reconstruct one scanline from its filtered bytes (decoder side)."""
    n = len(flt)
    out = bytearray(n)
    if ftype == 0:
        out[:] = flt
        return out
    for i in range(n):
        a = out[i - bpp] if i >= bpp else 0
        b = prior[i]
        c = prior[i - bpp] if i >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise NotImplementedError(f"png: unknown filter type {ftype}")
        out[i] = (flt[i] + pred) & 0xFF
    return out


def encode_png(
    width: int,
    height: int,
    raw: bytes,
    color_type: int = 2,
    filters: int | list[int] = 0,
    compress_level: int = 6,
) -> bytes:
    """Serialize raw 8-bit samples as a valid PNG.

    ``filters`` selects the per-scanline predictor: a single type for
    every row, or one per row (the test suite uses this to exercise
    each unfilter path). Deterministic for fixed inputs — zlib with a
    fixed level and strategy has one output — which is what lets
    payload hashes participate in the oracle gate.
    """
    if color_type not in _CHANNELS:
        raise NotImplementedError(f"png: color type {color_type}")
    bpp = _CHANNELS[color_type]
    stride = width * bpp
    if len(raw) != stride * height:
        raise ValueError(
            f"png: raw size {len(raw)} != {width}x{height}x{bpp}"
        )
    ftypes = (
        list(filters)
        if isinstance(filters, (list, tuple))
        else [int(filters)] * height
    )
    if len(ftypes) != height:
        raise ValueError("png: one filter per scanline required")
    prior = bytearray(stride)
    body = bytearray()
    for y, ft in enumerate(ftypes):
        row = bytearray(raw[y * stride : (y + 1) * stride])
        body.append(ft)
        body += _filter_scanline(ft, row, prior, bpp)
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(body), compress_level))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse + inflate + unfilter: returns ``(width, height,
    color_type, raw_samples)``. Validates every chunk CRC and the
    decompressed length; concatenates split IDAT chunks."""
    width, height, color_type, _ = png_header(data)
    bpp = _CHANNELS[color_type]
    stride = width * bpp
    idat = bytearray()
    for tag, body in _chunks(data):
        if tag == b"IDAT":
            idat += body
    body = zlib.decompress(bytes(idat))
    if len(body) != (stride + 1) * height:
        raise ValueError(
            f"png: decompressed {len(body)} bytes, "
            f"expected {(stride + 1) * height}"
        )
    out = bytearray()
    prior = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        prior = _unfilter_scanline(
            body[off], body[off + 1 : off + 1 + stride], prior, bpp
        )
        out += prior
    return width, height, color_type, bytes(out)


def png_header(data: bytes) -> tuple[int, int, int, int]:
    """Decode IHDR only: ``(width, height, color_type, bit_depth)``.

    This is the cheap path feature extraction wants — dimensions
    without inflating a single IDAT byte."""
    if not is_png(data):
        raise ValueError("png: bad signature")
    tag, body = next(_chunks(data))
    if tag != b"IHDR" or len(body) != 13:
        raise ValueError("png: first chunk is not a valid IHDR")
    width, height, depth, color_type, comp, flt, interlace = struct.unpack(
        ">IIBBBBB", body
    )
    if depth != 8:
        raise NotImplementedError(f"png: bit depth {depth} (only 8)")
    if color_type not in _CHANNELS:
        raise NotImplementedError(
            f"png: color type {color_type} (gray/RGB/RGBA only)"
        )
    if comp != 0 or flt != 0:
        raise ValueError("png: unknown compression/filter method")
    if interlace != 0:
        raise NotImplementedError("png: Adam7 interlace")
    return width, height, color_type, depth


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError(f"png: truncated {tag!r} chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"png: CRC mismatch in {tag!r} chunk")
        yield tag, body
        if tag == b"IEND":
            return
        pos += 12 + ln
