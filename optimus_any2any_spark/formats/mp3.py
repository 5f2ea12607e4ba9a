"""MPEG audio (MP3) frame-header parsing — structure, not codec.

An MP3 stream is a sequence of frames, each starting with a 4-byte
header (11-bit sync, version, layer, bitrate index, sample-rate index,
padding): ISO/IEC 11172-3 §2.4.1.3. Walking the headers yields
bitrate, sample rate, channel mode, frame count, and a duration
estimate — with stdlib byte math only, the same honest split as the
MP4 container (:mod:`.mp4`): metadata REAL, sample decode STUBBED
(a synthesis filterbank is ffmpeg-class work).

Scope: MPEG-1/2/2.5 Layer III (and Layer I/II headers — the frame-size
formula differs and is handled), optional leading ID3v2 tag skipped by
its declared syncsafe size. CBR duration is exact; VBR streams report
the per-frame-walk duration (correct, since every frame is visited).
"""

from __future__ import annotations

_BITRATES_V1_L3 = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
_BITRATES_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_SAMPLE_RATES = {  # by version key
    3: [44100, 48000, 32000],  # MPEG-1
    2: [22050, 24000, 16000],  # MPEG-2
    0: [11025, 12000, 8000],  # MPEG-2.5
}


def is_mp3(data: bytes) -> bool:
    if data[:3] == b"ID3":
        return True
    return (
        len(data) >= 2
        and data[0] == 0xFF
        and (data[1] & 0xE0) == 0xE0
        and (data[1] & 0x18) != 0x08  # version reserved
        and (data[1] & 0x06) != 0x00  # layer reserved
    )


def _id3v2_size(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    # syncsafe 28-bit size, excluding the 10-byte header
    sz = (
        (data[6] & 0x7F) << 21
        | (data[7] & 0x7F) << 14
        | (data[8] & 0x7F) << 7
        | (data[9] & 0x7F)
    )
    return 10 + sz


def parse_mp3(data: bytes) -> dict:
    """Walk every frame header: ``{version, layer, bitrate_kbps (first
    frame), sample_rate, channel_mode, n_frames, duration_ms}``."""
    pos = _id3v2_size(data)
    first = None
    n_frames = 0
    samples_total = 0
    rate = None
    while pos + 4 <= len(data):
        b0, b1, b2, _b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            break  # trailing junk/tag: stop at first non-frame
        version = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (b1 >> 1) & 0x3  # 3=Layer I, 2=II, 1=III
        if version == 1 or layer == 0:
            raise ValueError("mp3: reserved version/layer bits")
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("mp3: free-format/bad bitrate or sample rate")
        table = _BITRATES_V1_L3 if version == 3 else _BITRATES_V2_L3
        bitrate = table[br_idx] * 1000
        rate = _SAMPLE_RATES[version][sr_idx]
        if layer == 3:  # Layer I
            frame_len = (12 * bitrate // rate + padding) * 4
            samples = 384
        else:  # Layer II/III
            samples = 1152 if (version == 3 or layer == 2) else 576
            frame_len = samples * bitrate // (8 * rate) + padding
        if frame_len <= 4:
            raise ValueError("mp3: degenerate frame length")
        if first is None:
            mode = (data[pos + 3] >> 6) & 0x3
            first = {
                "version": {3: "1", 2: "2", 0: "2.5"}[version],
                "layer": {3: 1, 2: 2, 1: 3}[layer],
                "bitrate_kbps": bitrate // 1000,
                "sample_rate": rate,
                "channel_mode": ["stereo", "joint", "dual", "mono"][mode],
            }
        n_frames += 1
        samples_total += samples
        pos += frame_len
    if first is None:
        raise ValueError("mp3: no audio frame found")
    first["n_frames"] = n_frames
    first["duration_ms"] = samples_total * 1000 // rate
    return first


def build_mp3_frames(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    id3_padding: int = 0,
) -> bytes:
    """Deterministic MPEG-1 Layer III CBR stream of silent (zero-body)
    frames, optionally preceded by an empty ID3v2 tag — a valid header
    walk for fixtures; NOT an audio encoder."""
    br_idx = _BITRATES_V1_L3.index(bitrate_kbps)
    sr_idx = _SAMPLE_RATES[3].index(sample_rate)
    hdr = bytes(
        [
            0xFF,
            0xE0 | (3 << 3) | (1 << 1) | 1,  # MPEG1, Layer III, no CRC
            (br_idx << 4) | (sr_idx << 2),
            0xC0,  # mono
        ]
    )
    frame_len = 1152 * bitrate_kbps * 1000 // (8 * sample_rate)
    frame = hdr + b"\x00" * (frame_len - 4)
    out = b""
    if id3_padding:
        sz = id3_padding
        out += b"ID3\x04\x00\x00" + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
        ) + b"\x00" * sz
    return out + frame * n_frames

