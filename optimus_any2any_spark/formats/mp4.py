"""MP4/ISO-BMFF container parsing — structure, not codec.

An MP4 file is a tree of length-prefixed boxes (ISO/IEC 14496-12):
``ftyp`` brands, ``moov`` movie metadata holding ``mvhd`` (timescale +
duration) and per-track ``trak``/``tkhd`` (track id, dimensions).
Parsing that tree is pure stdlib byte math — no codec — and it is the
honest half of video support this environment CAN do for real: the
multimodal feature extractor reads duration/dimensions/track layout
from the container while frame DECODE stays a stub (H.264/AV1 need
ffmpeg-class dependencies; see :mod:`..operators.multimodal`).

Scope: 32-bit and 64-bit box sizes, ``mvhd``/``tkhd`` versions 0 and
1, nested box walks limited to the containers that matter
(``moov``/``trak``). Malformed structure raises ``ValueError`` — a
truncated box is corruption, not a feature.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body_off = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body_off = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"mp4: bad box size {size} for {tag!r}")
        yield tag, body_off, pos + size
        pos += size


def parse_mp4(data: bytes) -> dict:
    """Container metadata: ``{brand, timescale, duration_ms, n_tracks,
    tracks: [{track_id, width, height}]}``.

    Width/height come from ``tkhd``'s 16.16 fixed-point fields (0 for
    audio tracks, as the spec prescribes)."""
    if not is_mp4(data):
        raise ValueError("mp4: no ftyp box at file start")
    brand = data[8:12].decode("latin-1")
    out = {
        "brand": brand,
        "timescale": None,
        "duration_ms": None,
        "n_tracks": 0,
        "tracks": [],
    }

    def walk(start: int, end: int):
        for tag, body, box_end in _boxes(data, start, end):
            if tag == b"mvhd":
                ver = data[body]
                if ver == 1:
                    ts, dur = struct.unpack(
                        ">IQ", data[body + 20 : body + 32]
                    )
                else:
                    ts, dur = struct.unpack(
                        ">II", data[body + 12 : body + 20]
                    )
                out["timescale"] = ts
                out["duration_ms"] = int(dur * 1000 // ts) if ts else None
            elif tag == b"tkhd":
                ver = data[body]
                # version+flags(4) then creation/modification stamps
                # (2x8 bytes in v1, 2x4 in v0) precede track_ID
                off = body + (20 if ver == 1 else 12)
                (track_id,) = struct.unpack(">I", data[off : off + 4])
                # width/height: last 8 bytes of tkhd, 16.16 fixed point
                w_fx, h_fx = struct.unpack(
                    ">II", data[box_end - 8 : box_end]
                )
                out["n_tracks"] += 1
                out["tracks"].append(
                    {
                        "track_id": track_id,
                        "width": w_fx >> 16,
                        "height": h_fx >> 16,
                    }
                )
            elif tag in _CONTAINERS:
                walk(body, box_end)

    walk(0, len(data))
    if out["timescale"] is None:
        raise ValueError("mp4: no mvhd box found")
    return out


# ---------------------------------------------------------------------------
# Minimal writer — enough structure for tests and deterministic payload
# generation; NOT a media encoder (there is no sample data at all).


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + tag + body


def build_mp4_skeleton(
    timescale: int,
    duration: int,
    tracks: list[tuple[int, int, int]],
) -> bytes:
    """A valid, sample-free MP4 skeleton: ftyp + moov(mvhd + trak(tkhd)
    per (track_id, width, height)). Deterministic bytes for fixtures
    and the oracle-checkable metadata round trip."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mvhd_body = (
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", len(tracks) + 1)  # next track id
    )
    traks = b""
    for track_id, w, h in tracks:
        tkhd_body = (
            b"\x00\x00\x00\x07"  # version 0, flags: enabled+in-movie
            + struct.pack(">II", 0, 0)
            + struct.pack(">I", track_id)
            + b"\x00" * 4
            + struct.pack(">I", duration)
            + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16)
        )
        traks += _box(b"trak", _box(b"tkhd", tkhd_body))
    moov = _box(b"moov", _box(b"mvhd", mvhd_body) + traks)
    return ftyp + moov
