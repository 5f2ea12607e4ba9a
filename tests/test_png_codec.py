"""Real PNG codec (formats/png.py): round trips over every filter
type and color type, chunk-level validation, and the Spark pipeline
wiring (header-only feature extraction, full-decode resize)."""

from __future__ import annotations

import struct
import zlib

import pytest

from optimus_any2any_spark.formats.png import (
    decode_png,
    encode_png,
    is_png,
    png_header,
)


def _image(w, h, ch, seed=7):
    # deterministic pseudo-random sample plane, no RNG state
    return bytes(
        (i * 31 + seed * 17 + (i >> 3)) % 256 for i in range(w * h * ch)
    )


class TestRoundTrip:
    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (6, 4)])
    def test_every_filter_and_color_type(self, ftype, color_type, ch):
        raw = _image(13, 9, ch)
        png = encode_png(13, 9, raw, color_type=color_type, filters=ftype)
        assert is_png(png)
        w, h, ct, out = decode_png(png)
        assert (w, h, ct) == (13, 9, color_type)
        assert out == raw

    def test_mixed_filters_per_scanline(self):
        raw = _image(8, 10, 3)
        png = encode_png(8, 10, raw, filters=[y % 5 for y in range(10)])
        assert decode_png(png)[3] == raw

    def test_one_pixel_and_one_row_edges(self):
        # bpp > remaining-left-neighbor edge cases: Sub/Paeth with no
        # left pixel, Up with an all-zero prior on the first row
        for w, h in [(1, 1), (5, 1), (1, 6)]:
            raw = _image(w, h, 3)
            for ftype in range(5):
                png = encode_png(w, h, raw, filters=ftype)
                assert decode_png(png)[3] == raw, (w, h, ftype)

    def test_larger_image_all_paeth(self):
        raw = _image(64, 48, 3, seed=3)
        png = encode_png(64, 48, raw, filters=4)
        assert decode_png(png)[3] == raw
        # Paeth should actually compress this gradient-ish plane
        assert len(png) < len(raw)


class TestChunkValidation:
    def test_header_only_parse(self):
        png = encode_png(31, 17, _image(31, 17, 4), color_type=6)
        assert png_header(png) == (31, 17, 6, 8)

    def test_crc_corruption_detected(self):
        png = bytearray(encode_png(4, 4, _image(4, 4, 3)))
        # flip a byte inside the IDAT body (after sig+IHDR 8+25, after
        # IDAT length+tag 8) — CRC must catch it
        png[8 + 25 + 8 + 2] ^= 0xFF
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(png))

    def test_multi_idat_reassembly(self):
        raw = _image(6, 6, 3)
        png = encode_png(6, 6, raw)
        # re-split the single IDAT into two chunks by hand
        body = zlib.compress(
            zlib.decompress(_idat(png)), 6
        )
        a, b = body[:5], body[5:]
        rebuilt = (
            png[:8]
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 6, 8, 2, 0, 0, 0))
            + _chunk(b"IDAT", a)
            + _chunk(b"IDAT", b)
            + _chunk(b"IEND", b"")
        )
        assert decode_png(rebuilt)[3] == raw

    def test_palette_and_16bit_rejected(self):
        ihdr3 = struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)
        bad = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr3)
        with pytest.raises(NotImplementedError, match="color type 3"):
            png_header(bad)
        ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
        bad = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr16)
        with pytest.raises(NotImplementedError, match="bit depth 16"):
            png_header(bad)

    def test_wrong_raw_size_rejected(self):
        with pytest.raises(ValueError, match="raw size"):
            encode_png(4, 4, b"short")


def _chunk(tag, body):
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _idat(png):
    pos = 8
    while pos < len(png):
        (ln,) = struct.unpack(">I", png[pos : pos + 4])
        tag = png[pos + 4 : pos + 8]
        if tag == b"IDAT":
            return png[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raise AssertionError("no IDAT")


class TestSparkWiring:
    def test_extract_features_reads_png_header(self, spark):
        from optimus_any2any_spark.operators.multimodal import (
            extract_features,
        )

        png = encode_png(21, 12, _image(21, 12, 3))
        df = spark.createDataFrame(
            [(1, bytearray(png), "image/png")],
            "doc_id long, payload binary, media_type string",
        )
        row = extract_features(df, fake_decode=False).collect()[0]
        assert (row.width, row.height) == (21, 12)

    def test_resize_png_roundtrip(self, spark):
        from optimus_any2any_spark.operators.multimodal import resize_images

        raw = _image(16, 16, 3)
        png = encode_png(16, 16, raw, filters=2)
        df = spark.createDataFrame(
            [(1, bytearray(png), "image/png")],
            "doc_id long, payload binary, media_type string",
        )
        row = resize_images(df, target_w=4, target_h=4,
                            fake_decode=False).collect()[0]
        w, h, ct, out = decode_png(bytes(row.payload))
        assert (w, h, ct) == (4, 4, 2)
        # nearest-neighbor: every output pixel is an input pixel
        expected = bytearray()
        for y in range(4):
            for x in range(4):
                sy, sx = (y * 16) // 4, (x * 16) // 4
                expected += raw[(sy * 16 + sx) * 3 : (sy * 16 + sx) * 3 + 3]
        assert out == bytes(expected)

    def test_full_decode_feature_hash(self, spark):
        import hashlib

        from optimus_any2any_spark.operators.multimodal import (
            extract_image_raw_features,
        )

        raw = _image(8, 8, 3)
        png = encode_png(8, 8, raw, filters=[0, 1, 2, 3, 4, 0, 1, 2])
        df = spark.createDataFrame(
            [(1, bytearray(png), "image/png")],
            "doc_id long, payload binary, media_type string",
        )
        row = extract_image_raw_features(df).collect()[0]
        assert row.raw_sha256 == hashlib.sha256(raw).hexdigest()
        assert (row.width, row.height, row.channels) == (8, 8, 3)


class TestPropertyFuzz:
    def test_random_images_roundtrip(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=40, deadline=None)
        @given(
            w=st.integers(1, 21),
            h=st.integers(1, 17),
            ct=st.sampled_from([0, 2, 6]),
            seed=st.integers(0, 2**31 - 1),
            mode=st.sampled_from(["per_row", "uniform"]),
        )
        def check(w, h, ct, seed, mode):
            import numpy as np

            ch = {0: 1, 2: 3, 6: 4}[ct]
            rng = np.random.default_rng(seed)
            raw = rng.integers(0, 256, w * h * ch, dtype=np.uint8).tobytes()
            if mode == "per_row":
                filters = [int(x) % 5 for x in rng.integers(0, 5, h)]
            else:
                filters = int(rng.integers(0, 5))
            png = encode_png(w, h, raw, color_type=ct, filters=filters)
            got = decode_png(png)
            assert got == (w, h, ct, raw)

        check()
