"""Real baseline JPEG codec on stdlib + numpy — no imaging library.

JPEG baseline (ITU-T T.81) is, mechanically: JFIF marker framing, the
Annex K quantization + Huffman tables, an 8x8 DCT-II, zigzag run-length
coding, and byte-stuffed Huffman entropy coding. None of that needs an
imaging library — numpy does the transforms, everything else is bit
arithmetic — so the multimodal pipeline's LAST stubbed image format
gets a genuine implementation with the same UDF seam
(:mod:`..operators.multimodal`).

Scope (raises :class:`NotImplementedError` outside it):

- baseline sequential DCT (SOF0), 8-bit samples
- 1 component (grayscale) or 3 components YCbCr with NO chroma
  subsampling (4:4:4 — all sampling factors 1); subsampled or
  progressive streams are rejected, not mis-decoded
- restart markers (DRI/RSTn) honored on decode
- encoder: fixed Annex K tables (quality 50), 4:4:4, no optimization

Determinism: the encoder is table-fixed and float64-deterministic, the
decoder rounds exactly once per stage — the same bytes decode to the
same samples on every platform, which is what lets flat DC-only blocks
act as bit-exact fixed points under the oracle gate (a flat 8x8 block
whose level offset from 128 is a multiple of 2 survives quant step 16
exactly: DC = 8*(v-128), quantized DC = 8*(v-128)/16 with zero
remainder, reconstruction = v for every pixel).

Per-image cost is O(pixels) with numpy-vectorized transforms and a
bit-level Huffman loop; payloads decode whole inside one Arrow batch,
so the DataFrame layer above stays fully parallel.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K) — the interchange defaults every baseline
# codec ships.

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# (BITS counts per code length 1..16, HUFFVAL symbol list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# DCT-II orthonormal basis: block_dct = C @ block @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def is_jpeg(data: bytes) -> bool:
    return data[:2] == b"\xff\xd8"


# --------------------------------------------------------------------------
# Huffman table construction (T.81 Annex C)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) by canonical assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {
        (length, code): sym
        for sym, (code, length) in _huff_codes(bits, vals).items()
    }


# --------------------------------------------------------------------------
# Bit IO


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: entropy stream exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1  # stuffed FF
            else:
                raise ValueError("jpeg: unexpected marker in entropy data")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0


def _decode_huff_sym(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, size: int) -> int:
    # T.81 F.2.2.1: low-range values are negative
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# --------------------------------------------------------------------------
# Encoder


def _encode_block(
    w: _BitWriter,
    block: np.ndarray,
    quant: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    dc_pred: int,
) -> int:
    coef = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    q = np.round(coef / quant).astype(np.int64)
    zz = q.flatten()[_ZIGZAG]
    dc = int(zz[0])
    diff = dc - dc_pred
    size = _category(diff)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nonzero = 0
    for i in range(63, 0, -1):
        if zz[i] != 0:
            last_nonzero = i
            break
    for i in range(1, last_nonzero + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nonzero != 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return dc


def _dqt_payload(tid: int, table: np.ndarray) -> bytes:
    return bytes([tid]) + bytes(int(x) for x in table.flatten()[_ZIGZAG])


def _dht_payload(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">HH", tag, len(payload) + 2) + payload


def encode_jpeg(
    width: int,
    height: int,
    raw: bytes,
    gray: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encode: 4:4:4 YCbCr (or 1-component grayscale),
    Annex K quality-50 tables, standard Huffman tables. ``raw`` is
    RGB24 (or 8-bit gray) row-major. Edge blocks pad by replication.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (resetting DC prediction) — restart framing changes the byte
    stream but NOT the reconstruction, which the tests exploit."""
    ch = 1 if gray else 3
    if len(raw) != width * height * ch:
        raise ValueError(f"jpeg: raw size {len(raw)} != {width}x{height}x{ch}")
    img = np.frombuffer(raw, dtype=np.uint8).reshape(height, width, ch)
    if gray:
        planes = [img[:, :, 0].astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    padded = []
    for p in planes:
        pp = np.empty((bh * 8, bw * 8))
        pp[:height, :width] = p
        pp[height:, :width] = p[-1:, :]
        pp[:, width:] = pp[:, width - 1 : width]
        padded.append(pp)

    dc_l = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    w = _BitWriter()
    preds = [0] * ch
    comp_tables = [(QUANT_LUMA, dc_l, ac_l)] + [
        (QUANT_CHROMA, dc_c, ac_c)
    ] * (ch - 1)
    mcu = 0
    n_mcus = bh * bw
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                w.flush()
                w.buf += bytes(
                    [0xFF, 0xD0 + (mcu // restart_interval - 1) % 8]
                )
                preds = [0] * ch
            for ci in range(ch):
                quant, dcc, acc = comp_tables[ci]
                block = padded[ci][
                    by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                ]
                preds[ci] = _encode_block(w, block, quant, dcc, acc, preds[ci])
            mcu += 1
    w.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(
        0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    out += _marker(0xFFDB, _dqt_payload(0, QUANT_LUMA))
    if ch == 3:
        out += _marker(0xFFDB, _dqt_payload(1, QUANT_CHROMA))
    sof = struct.pack(">BHHB", 8, height, width, ch)
    for ci in range(ch):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _marker(0xFFC0, sof)
    out += _marker(0xFFC4, _dht_payload(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _marker(0xFFC4, _dht_payload(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    if ch == 3:
        out += _marker(
            0xFFC4, _dht_payload(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        )
        out += _marker(
            0xFFC4, _dht_payload(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        )
    if restart_interval:
        out_dri = struct.pack(">H", restart_interval)
    sos = bytes([ch])
    for ci in range(ch):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    if restart_interval:
        out += _marker(0xFFDD, out_dri)
    out += _marker(0xFFDA, sos)
    out += w.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder


def jpeg_header(data: bytes) -> tuple[int, int, int]:
    """Parse markers up to SOF0 only: ``(width, height, n_components)``.
    The cheap no-entropy-decode path for feature extraction."""
    for tag, payload, _pos in _markers(data):
        if tag == 0xFFC0:
            _prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            return w, h, nc
        if tag in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                   0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise NotImplementedError(
                f"jpeg: only baseline SOF0 supported (got {tag:#x})"
            )
    raise ValueError("jpeg: no SOF marker found")


def _markers(data: bytes):
    if not is_jpeg(data):
        raise ValueError("jpeg: bad SOI")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        tag = 0xFF00 | data[pos + 1]
        if tag == 0xFFD9:  # EOI
            return
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + ln]
        if len(payload) != ln - 2:
            raise ValueError(f"jpeg: truncated {tag:#x} segment")
        yield tag, payload, pos + 2 + ln
        if tag == 0xFFDA:  # entropy data follows; caller takes over
            return
        pos += 2 + ln


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Full baseline decode: returns ``(width, height, n_components,
    samples)`` with samples RGB24 (3-comp) or gray (1-comp) row-major."""
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    sof = None
    sos = None
    restart_interval = 0
    scan_start = None
    for tag, payload, end in _markers(data):
        if tag == 0xFFDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(
                    payload[p + 1 : p + 65], dtype=np.uint8
                )
                quant[tq] = tbl.reshape(8, 8)
                p += 65
        elif tag == 0xFFC4:
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                (huff_dc if cls == 0 else huff_ac)[tid] = _huff_decoder(
                    bits, vals
                )
                p += 17 + nv
        elif tag == 0xFFC0:
            sof = payload
        elif tag == 0xFFDD:
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif tag == 0xFFDA:
            sos = payload
            scan_start = end
    if sof is None or sos is None:
        jpeg_header(data)  # raises the precise error for non-SOF0
        raise ValueError("jpeg: missing SOS")
    _prec, height, width, nc = struct.unpack(">BHHB", sof[:6])
    comps = []
    for i in range(nc):
        cid, hv, tq = sof[6 + 3 * i : 9 + 3 * i]
        if hv != 0x11:
            raise NotImplementedError(
                "jpeg: chroma subsampling not supported (4:4:4 only)"
            )
        comps.append((cid, tq))
    ns = sos[0]
    scan_tables = {}
    for i in range(ns):
        cs, tt = sos[1 + 2 * i : 3 + 2 * i]
        scan_tables[cs] = (tt >> 4, tt & 0xF)

    bw = (width + 7) // 8
    bh = (height + 7) // 8
    planes = [np.zeros((bh * 8, bw * 8)) for _ in range(nc)]
    r = _BitReader(data[scan_start:])
    preds = [0] * nc
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                r.align()
                # skip the RSTn marker bytes
                while r.data[r.pos] == 0xFF and 0xD0 <= r.data[r.pos + 1] <= 0xD7:
                    r.pos += 2
                preds = [0] * nc
            for ci, (cid, tq) in enumerate(comps):
                dc_id, ac_id = scan_tables[cid]
                zz = np.zeros(64, dtype=np.int64)
                size = _decode_huff_sym(r, huff_dc[dc_id])
                diff = _extend(r.read_bits(size), size)
                preds[ci] += diff
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    sym = _decode_huff_sym(r, huff_ac[ac_id])
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    k += run
                    if k > 63:
                        raise ValueError("jpeg: AC index out of range")
                    zz[k] = _extend(r.read_bits(size), size)
                    k += 1
                block = np.zeros(64, dtype=np.int64)
                block[_ZIGZAG] = zz
                coef = block.reshape(8, 8) * quant[tq]
                pix = _C.T @ coef.astype(np.float64) @ _C + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix
            mcu += 1

    planes = [p[:height, :width] for p in planes]
    if nc == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return width, height, 1, out.tobytes()
    if nc != 3:
        raise NotImplementedError(f"jpeg: {nc}-component scan")
    y, cb, cr = planes
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(c), 0, 255) for c in (r_, g_, b_)], axis=-1
    ).astype(np.uint8)
    return width, height, 3, rgb.tobytes()
