"""Password-protected zip writer in pure stdlib Python.

Closes the reference's encrypted-archive feature
(internal/ext/archive/file_archiver.go:173-215 — ``zipWriter.Encrypt(...,
zip.AES256Encryption)`` via yeka/zip) without third-party crypto libs:

- **WinZip AES-256 (AE-2)** — the mode the reference ships: PBKDF2-SHA1
  key derivation (1000 iterations), AES-CTR with a little-endian counter
  starting at 1, HMAC-SHA1 authentication over the ciphertext, method 99
  + 0x9901 extra field. Everything but the AES block cipher is stdlib
  (``hashlib.pbkdf2_hmac``, ``hmac``); the block cipher itself is a
  table-based FIPS-197 implementation below.
- **ZipCrypto** (traditional PKWARE encryption, APPNOTE.TXT §6.1) — kept
  as a second mode because the *stdlib* ``zipfile`` reader can decrypt
  it, giving an independent round-trip oracle in tests.

The container (local headers / central directory / EOCD) is written by
hand so encrypted entries can carry method 99 and the AES extra field,
which ``zipfile.ZipFile`` cannot produce.

Scale note: this is a driver-side post-commit step over already-committed
sink outputs (like the reference's transient-file archiver). Pure-Python
AES runs ~1 MB/s — fine for the grouped-email / routed-file archives this
feature exists for; it is not a data-plane codec.
"""

from __future__ import annotations

import hashlib
import hmac
import os
import struct
import time
import zlib

# ---------------------------------------------------------------------------
# AES block cipher (FIPS-197), encryption direction only — CTR mode needs
# nothing else. S-box and T-tables are generated at import time from the
# GF(2^8) arithmetic in the spec rather than pasted as literal blobs.
# ---------------------------------------------------------------------------


def _generate_sbox() -> list[int]:
    # multiplicative inverse in GF(2^8) followed by the affine transform
    p, q = 1, 1
    sbox = [0] * 256
    # iterate the generator 3 over the multiplicative group
    while True:
        # p := p * 3
        p = p ^ ((p << 1) & 0xFF) ^ (0x1B if p & 0x80 else 0)
        # q := q / 3 (inverse direction)
        q ^= q << 1
        q ^= q << 2
        q ^= q << 4
        q &= 0xFF
        if q & 0x80:
            q ^= 0x09
        x = q ^ _rotl8(q, 1) ^ _rotl8(q, 2) ^ _rotl8(q, 3) ^ _rotl8(q, 4)
        sbox[p] = x ^ 0x63
        if p == 1:
            break
    sbox[0] = 0x63
    return sbox


def _rotl8(x: int, n: int) -> int:
    return ((x << n) | (x >> (8 - n))) & 0xFF


_SBOX = _generate_sbox()


def _xtime(a: int) -> int:
    return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1


# T-tables: one lookup fuses SubBytes + MixColumns for a column byte.
_TE0 = []
for s in _SBOX:
    s2 = _xtime(s)
    s3 = s2 ^ s
    _TE0.append((s2 << 24) | (s << 16) | (s << 8) | s3)
_TE1 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _TE0]
_TE2 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _TE1]
_TE3 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _TE2]

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8]


class _AES:
    """Forward AES with a 128/192/256-bit key (encrypt_block only)."""

    def __init__(self, key: bytes):
        if len(key) not in (16, 24, 32):
            raise ValueError("AES key must be 16/24/32 bytes")
        nk = len(key) // 4
        self.rounds = nk + 6
        words = list(struct.unpack(">%dI" % nk, key))
        for i in range(nk, 4 * (self.rounds + 1)):
            t = words[i - 1]
            if i % nk == 0:
                t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
                t = (
                    (_SBOX[(t >> 24) & 0xFF] << 24)
                    | (_SBOX[(t >> 16) & 0xFF] << 16)
                    | (_SBOX[(t >> 8) & 0xFF] << 8)
                    | _SBOX[t & 0xFF]
                )
                t ^= _RCON[i // nk - 1] << 24
            elif nk > 6 and i % nk == 4:
                t = (
                    (_SBOX[(t >> 24) & 0xFF] << 24)
                    | (_SBOX[(t >> 16) & 0xFF] << 16)
                    | (_SBOX[(t >> 8) & 0xFF] << 8)
                    | _SBOX[t & 0xFF]
                )
            words.append(words[i - nk] ^ t)
        self.rk = words

    def encrypt_block(self, block: bytes) -> bytes:
        rk = self.rk
        s0, s1, s2, s3 = struct.unpack(">4I", block)
        s0 ^= rk[0]
        s1 ^= rk[1]
        s2 ^= rk[2]
        s3 ^= rk[3]
        te0, te1, te2, te3 = _TE0, _TE1, _TE2, _TE3
        k = 4
        for _ in range(self.rounds - 1):
            t0 = (
                te0[(s0 >> 24) & 0xFF]
                ^ te1[(s1 >> 16) & 0xFF]
                ^ te2[(s2 >> 8) & 0xFF]
                ^ te3[s3 & 0xFF]
                ^ rk[k]
            )
            t1 = (
                te0[(s1 >> 24) & 0xFF]
                ^ te1[(s2 >> 16) & 0xFF]
                ^ te2[(s3 >> 8) & 0xFF]
                ^ te3[s0 & 0xFF]
                ^ rk[k + 1]
            )
            t2 = (
                te0[(s2 >> 24) & 0xFF]
                ^ te1[(s3 >> 16) & 0xFF]
                ^ te2[(s0 >> 8) & 0xFF]
                ^ te3[s1 & 0xFF]
                ^ rk[k + 2]
            )
            t3 = (
                te0[(s3 >> 24) & 0xFF]
                ^ te1[(s0 >> 16) & 0xFF]
                ^ te2[(s1 >> 8) & 0xFF]
                ^ te3[s2 & 0xFF]
                ^ rk[k + 3]
            )
            s0, s1, s2, s3 = t0, t1, t2, t3
            k += 4
        # final round: SubBytes + ShiftRows, no MixColumns
        sb = _SBOX
        o0 = (
            (sb[(s0 >> 24) & 0xFF] << 24)
            | (sb[(s1 >> 16) & 0xFF] << 16)
            | (sb[(s2 >> 8) & 0xFF] << 8)
            | sb[s3 & 0xFF]
        ) ^ rk[k]
        o1 = (
            (sb[(s1 >> 24) & 0xFF] << 24)
            | (sb[(s2 >> 16) & 0xFF] << 16)
            | (sb[(s3 >> 8) & 0xFF] << 8)
            | sb[s0 & 0xFF]
        ) ^ rk[k + 1]
        o2 = (
            (sb[(s2 >> 24) & 0xFF] << 24)
            | (sb[(s3 >> 16) & 0xFF] << 16)
            | (sb[(s0 >> 8) & 0xFF] << 8)
            | sb[s1 & 0xFF]
        ) ^ rk[k + 2]
        o3 = (
            (sb[(s3 >> 24) & 0xFF] << 24)
            | (sb[(s0 >> 16) & 0xFF] << 16)
            | (sb[(s1 >> 8) & 0xFF] << 8)
            | sb[s2 & 0xFF]
        ) ^ rk[k + 3]
        return struct.pack(">4I", o0, o1, o2, o3)


def _aes_ctr(key: bytes, data: bytes) -> bytes:
    """WinZip AES CTR: 128-bit little-endian counter starting at 1."""
    cipher = _AES(key)
    out = bytearray(len(data))
    counter = 1
    for off in range(0, len(data), 16):
        ks = cipher.encrypt_block(counter.to_bytes(16, "little"))
        chunk = data[off : off + 16]
        out[off : off + len(chunk)] = bytes(
            a ^ b for a, b in zip(chunk, ks)
        )
        counter += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# ZipCrypto (APPNOTE.TXT §6.1) — stream cipher keyed by CRC32 updates.
# ---------------------------------------------------------------------------


class _ZipCrypto:
    def __init__(self, password: bytes):
        self.k0, self.k1, self.k2 = 0x12345678, 0x23456789, 0x34567890
        for b in password:
            self._update(b)

    def _update(self, b: int) -> None:
        self.k0 = zlib.crc32(bytes([b]), self.k0 ^ 0xFFFFFFFF) ^ 0xFFFFFFFF
        self.k1 = (self.k1 + (self.k0 & 0xFF)) & 0xFFFFFFFF
        self.k1 = (self.k1 * 134775813 + 1) & 0xFFFFFFFF
        self.k2 = zlib.crc32(bytes([self.k1 >> 24]), self.k2 ^ 0xFFFFFFFF) ^ 0xFFFFFFFF

    def _stream_byte(self) -> int:
        t = (self.k2 | 2) & 0xFFFF
        return ((t * (t ^ 1)) >> 8) & 0xFF

    def encrypt(self, data: bytes) -> bytes:
        out = bytearray(len(data))
        for i, b in enumerate(data):
            out[i] = b ^ self._stream_byte()
            self._update(b)  # keys advance on plaintext when encrypting
        return bytes(out)

    def decrypt(self, data: bytes) -> bytes:
        out = bytearray(len(data))
        for i, b in enumerate(data):
            p = b ^ self._stream_byte()
            out[i] = p
            self._update(p)
        return bytes(out)


# ---------------------------------------------------------------------------
# Container writer
# ---------------------------------------------------------------------------

_AES_STRENGTH = {16: 1, 24: 2, 32: 3}


def _dos_datetime(ts: float | None = None) -> tuple[int, int]:
    t = time.localtime(ts)
    dosdate = ((max(t.tm_year, 1980) - 1980) << 9) | (t.tm_mon << 5) | t.tm_mday
    dostime = (t.tm_hour << 11) | (t.tm_min << 5) | (t.tm_sec // 2)
    return dosdate, dostime


def _deflate(data: bytes) -> bytes:
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    return co.compress(data) + co.flush()


def write_encrypted_zip(
    archive_path: str,
    files: list[tuple[str, bytes]],
    password: str,
    encryption: str = "aes256",
    _rand: callable = os.urandom,
) -> None:
    """Write ``files`` (arcname, content) to a password-protected zip.

    ``encryption``: ``aes256``/``aes192``/``aes128`` (WinZip AE-2, the
    reference's mode) or ``zipcrypto`` (traditional, readable by the
    stdlib ``zipfile`` module). ``_rand`` is injectable for deterministic
    tests.
    """
    pwd = password.encode("utf-8")
    central: list[bytes] = []
    out = bytearray()
    dosdate, dostime = _dos_datetime()

    for arcname, content in files:
        name = arcname.encode("utf-8")
        crc = zlib.crc32(content) & 0xFFFFFFFF
        compressed = _deflate(content)
        offset = len(out)

        if encryption == "zipcrypto":
            # 12-byte random header; last byte = CRC high byte so readers
            # can reject a wrong password early (APPNOTE §6.1.6).
            zc = _ZipCrypto(pwd)
            prefix = bytearray(_rand(11))
            prefix.append((crc >> 24) & 0xFF)
            payload = zc.encrypt(bytes(prefix)) + zc.encrypt(compressed)
            method, flags, extra = 8, 0x0001, b""
            csize, usize, hdr_crc, version = len(payload), len(content), crc, 20
        elif encryption in ("aes256", "aes192", "aes128"):
            key_len = {"aes256": 32, "aes192": 24, "aes128": 16}[encryption]
            salt = _rand(key_len // 2)
            derived = hashlib.pbkdf2_hmac("sha1", pwd, salt, 1000, 2 * key_len + 2)
            enc_key, mac_key = derived[:key_len], derived[key_len : 2 * key_len]
            verify = derived[2 * key_len :]
            enc = _aes_ctr(enc_key, compressed)
            auth = hmac.new(mac_key, enc, hashlib.sha1).digest()[:10]
            payload = salt + verify + enc + auth
            # 0x9901 extra: AE-2 (CRC zeroed), vendor "AE", strength,
            # actual compression method 8 (deflate).
            extra = struct.pack(
                "<HHH2sBH", 0x9901, 7, 2, b"AE", _AES_STRENGTH[key_len], 8
            )
            method, flags = 99, 0x0001
            csize, usize, hdr_crc, version = len(payload), len(content), 0, 51
        else:
            raise ValueError(f"unknown encryption mode: {encryption}")

        local = struct.pack(
            "<4sHHHHHIIIHH",
            b"PK\x03\x04",
            version,
            flags,
            method,
            dostime,
            dosdate,
            hdr_crc,
            csize,
            usize,
            len(name),
            len(extra),
        )
        out += local + name + extra + payload
        central.append(
            struct.pack(
                "<4sHHHHHHIIIHHHHHII",
                b"PK\x01\x02",
                version,
                version,
                flags,
                method,
                dostime,
                dosdate,
                hdr_crc,
                csize,
                usize,
                len(name),
                len(extra),
                0,
                0,
                0,
                0,
                offset,
            )
            + name
            + extra
        )

    cd_offset = len(out)
    for entry in central:
        out += entry
    cd_size = len(out) - cd_offset
    out += struct.pack(
        "<4sHHHHIIH",
        b"PK\x05\x06",
        0,
        0,
        len(central),
        len(central),
        cd_size,
        cd_offset,
        0,
    )
    with open(archive_path, "wb") as f:
        f.write(bytes(out))


def read_winzip_aes_entry(archive_path: str, arcname: str, password: str) -> bytes:
    """Decrypt one WinZip-AES entry (round-trip oracle for tests; the
    stdlib reader handles the zipcrypto mode independently)."""
    import zipfile

    pwd = password.encode("utf-8")
    with zipfile.ZipFile(archive_path) as zf:
        info = zf.getinfo(arcname)
        if info.compress_type != 99:
            raise ValueError("not a WinZip AES entry")
        # parse the 0x9901 extra for strength + actual method
        extra, strength, method = info.extra, None, None
        while len(extra) >= 4:
            tag, size = struct.unpack("<HH", extra[:4])
            if tag == 0x9901:
                _, _, strength, method = struct.unpack("<H2sBH", extra[4 : 4 + size])
            extra = extra[4 + size :]
        if strength is None:
            raise ValueError("missing AES extra field")
        key_len = {1: 16, 2: 24, 3: 32}[strength]
    # stdlib can't decrypt method 99 — read the raw payload straight
    # from the local header instead
    with open(archive_path, "rb") as f:
        data = f.read()
    pos = data.find(b"PK\x03\x04")
    while pos >= 0:
        nlen, elen = struct.unpack("<HH", data[pos + 26 : pos + 30])
        nm = data[pos + 30 : pos + 30 + nlen].decode("utf-8")
        csize = struct.unpack("<I", data[pos + 18 : pos + 22])[0]
        body = pos + 30 + nlen + elen
        if nm == arcname:
            payload = data[body : body + csize]
            break
        pos = data.find(b"PK\x03\x04", body + csize)
    else:
        raise KeyError(arcname)

    salt, payload = payload[: key_len // 2], payload[key_len // 2 :]
    verify, payload = payload[:2], payload[2:]
    enc, auth = payload[:-10], payload[-10:]
    derived = hashlib.pbkdf2_hmac("sha1", pwd, salt, 1000, 2 * key_len + 2)
    if derived[2 * key_len :] != verify:
        raise ValueError("wrong password")
    if hmac.new(derived[key_len : 2 * key_len], enc, hashlib.sha1).digest()[:10] != auth:
        raise ValueError("authentication failed")
    compressed = _aes_ctr(derived[:key_len], enc)  # CTR decrypt == encrypt
    if method == 8:
        return zlib.decompress(compressed, -15)
    return compressed
