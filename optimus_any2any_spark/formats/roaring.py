"""RoaringBitmap codecs for Delta Lake deletion vectors — stdlib only.

Delta's deletion vectors (PROTOCOL.md, "Deletion Vector Format") store
the deleted ROW INDEXES of a data file as a 64-bit
``RoaringBitmapArray`` in the "portable" format:

* int64 little-endian: number of 32-bit bitmaps; the i-th bitmap holds
  the values whose high 32 bits equal i;
* each bitmap in the standard 32-bit portable Roaring serialization
  (github.com/RoaringBitmap/RoaringFormatSpec): a cookie
  (``12346`` = no run containers, or ``12347`` with the container
  count in the high 16 bits and a run-flag bitset), descriptive
  headers of ``(uint16 key, uint16 cardinality-1)`` per container, an
  offset header when required, then array / bitmap / run containers.

On top of that, the DV *blob* is ``int32 LE magic (1681511377)`` +
bitmap bytes; in a ``.bin`` DV FILE each blob is framed as
``int32 BE size | blob | int32 BE CRC32(blob)`` after a 1-byte format
version, and an INLINE descriptor carries ``z85(blob)`` directly
(ZeroMQ Z85 alphabet, 4 bytes -> 5 chars).

Everything round-trips through :func:`serialize_rbm_array` /
:func:`deserialize_rbm_array`, hypothesis-fuzzed in
``tests/test_roaring.py``. The decoder handles all three container
types; the encoder emits array / bitmap containers (run containers are
an optional optimization the spec permits omitting).
"""

from __future__ import annotations

import struct
import zlib

SERIAL_COOKIE_NO_RUN = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4
DV_MAGIC = 1681511377

_ARRAY_MAX = 4096


# ---------------------------------------------------------------------------
# 32-bit portable Roaring


def serialize_roaring32(values: list[int]) -> bytes:
    """Serialize a sorted, deduplicated list of uint32 values."""
    containers: dict[int, list[int]] = {}
    for v in values:
        if not 0 <= v < 2**32:
            raise ValueError(f"roaring32: value {v} out of range")
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    n = len(keys)
    out = bytearray()
    out += struct.pack("<i", SERIAL_COOKIE_NO_RUN)
    out += struct.pack("<i", n)
    bodies: list[bytes] = []
    for k in keys:
        vals = sorted(set(containers[k]))
        if len(vals) <= _ARRAY_MAX:
            bodies.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            bodies.append(bytes(bits))
        out += struct.pack("<HH", k, len(vals) - 1)
    # offset header (always present with the no-run cookie)
    pos = len(out) + 4 * n
    for b in bodies:
        out += struct.pack("<I", pos)
        pos += len(b)
    for b in bodies:
        out += b
    return bytes(out)


def deserialize_roaring32(buf: bytes, base: int = 0) -> tuple[list[int], int]:
    """Decode one 32-bit bitmap starting at ``base``; returns
    (sorted values, bytes consumed)."""
    start = base
    (cookie32,) = struct.unpack_from("<i", buf, base)
    cookie = cookie32 & 0xFFFF
    run_flags = b""
    if cookie == SERIAL_COOKIE:
        n = ((cookie32 >> 16) & 0xFFFF) + 1
        base += 4
        nbytes = (n + 7) // 8
        run_flags = buf[base:base + nbytes]
        base += nbytes
    elif cookie == SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", buf, base + 4)
        base += 8
    else:
        raise ValueError(f"roaring32: bad cookie {cookie}")

    def has_run(i: int) -> bool:
        return bool(run_flags and (run_flags[i >> 3] & (1 << (i & 7))))

    headers = []
    for i in range(n):
        key, card1 = struct.unpack_from("<HH", buf, base)
        headers.append((key, card1 + 1))
        base += 4
    if cookie == SERIAL_COOKIE_NO_RUN or n >= NO_OFFSET_THRESHOLD:
        base += 4 * n  # offset header (positions are sequential anyway)
    out: list[int] = []
    for i, (key, card) in enumerate(headers):
        hi = key << 16
        if has_run(i):
            (n_runs,) = struct.unpack_from("<H", buf, base)
            base += 2
            for _ in range(n_runs):
                s, length = struct.unpack_from("<HH", buf, base)
                base += 4
                out.extend(hi | v for v in range(s, s + length + 1))
        elif card <= _ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", buf, base)
            base += 2 * card
            out.extend(hi | v for v in vals)
        else:
            bits = buf[base:base + 8192]
            base += 8192
            for byte_i, byte in enumerate(bits):
                while byte:
                    low = byte & (-byte)
                    out.append(hi | (byte_i << 3) | low.bit_length() - 1)
                    byte ^= low
    return out, base - start


# ---------------------------------------------------------------------------
# 64-bit RoaringBitmapArray (Delta's flavor)


def serialize_rbm_array(values: list[int]) -> bytes:
    """Serialize sorted uint64 values as Delta's portable
    RoaringBitmapArray: bitmaps for consecutive high-32-bit keys
    0..max_key (empty bitmaps fill gaps)."""
    by_hi: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        if v < 0:
            raise ValueError("rbm array: negative value")
        by_hi.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n = (max(by_hi) + 1) if by_hi else 0
    out = bytearray(struct.pack("<q", n))
    for i in range(n):
        out += serialize_roaring32(by_hi.get(i, []))
    return bytes(out)


def deserialize_rbm_array(buf: bytes) -> list[int]:
    (n,) = struct.unpack_from("<q", buf, 0)
    base = 8
    out: list[int] = []
    for i in range(n):
        vals, used = deserialize_roaring32(buf, base)
        base += used
        out.extend((i << 32) | v for v in vals)
    return out


# ---------------------------------------------------------------------------
# DV blob / file framing + z85


def dv_blob(values: list[int]) -> bytes:
    """magic + serialized bitmap — the unit stored inline (z85) or
    framed inside a ``.bin`` DV file."""
    return struct.pack("<i", DV_MAGIC) + serialize_rbm_array(values)


def dv_blob_decode(blob: bytes) -> list[int]:
    (magic,) = struct.unpack_from("<i", blob, 0)
    if magic != DV_MAGIC:
        raise ValueError(f"deletion vector: bad magic {magic}")
    return deserialize_rbm_array(blob[4:])


def dv_file_write(path: str, blobs: list[bytes]) -> list[int]:
    """Write a DV ``.bin`` file; returns each blob's offset (of its
    size prefix) for the add actions' descriptors."""
    offsets: list[int] = []
    with open(path, "wb") as f:
        f.write(b"\x01")  # format version
        pos = 1
        for b in blobs:
            offsets.append(pos)
            f.write(struct.pack(">i", len(b)))
            f.write(b)
            f.write(struct.pack(">I", zlib.crc32(b) & 0xFFFFFFFF))
            pos += 4 + len(b) + 4
    return offsets


def dv_file_read(path: str, offset: int, size: int) -> bytes:
    """Read (and checksum-verify) one DV blob from a ``.bin`` file."""
    with open(path, "rb") as f:
        f.seek(offset)
        (n,) = struct.unpack(">i", f.read(4))
        if n != size:
            raise ValueError(
                f"deletion vector: size prefix {n} != descriptor "
                f"sizeInBytes {size}"
            )
        blob = f.read(n)
        (crc,) = struct.unpack(">I", f.read(4))
    if zlib.crc32(blob) & 0xFFFFFFFF != crc:
        raise ValueError("deletion vector: checksum mismatch")
    return blob


_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INV = {c: i for i, c in enumerate(_Z85)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85: length must be a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        (v,) = struct.unpack(">I", data[i:i + 4])
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85: length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i:i + 5]:
            v = v * 85 + _Z85_INV[c]
        out += struct.pack(">I", v)
    return bytes(out)
