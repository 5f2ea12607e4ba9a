"""Real baseline JPEG codec (formats/jpeg.py): fixed-point exactness,
rate-distortion sanity, restart framing, marker validation, and the
Spark pipeline wiring."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from optimus_any2any_spark.formats.jpeg import (
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
    jpeg_header,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


class TestFixedPoints:
    @pytest.mark.parametrize("v", [64, 112, 126, 128, 130, 142, 200])
    def test_flat_even_offset_blocks_roundtrip_exactly(self, v):
        # DC = 8*(v-128); offsets even => divisible by quant step 16;
        # all AC zero => reconstruction is bit-exact despite lossiness
        raw = bytes([v]) * (16 * 16 * 3)
        w, h, nc, out = decode_jpeg(encode_jpeg(16, 16, raw))
        assert (w, h, nc) == (16, 16, 3)
        assert out == raw

    def test_mixed_flat_blocks_keep_their_levels(self):
        img = np.empty((16, 16, 3), dtype=np.uint8)
        levels = [112, 130, 142, 88]
        for b, v in enumerate(levels):
            by, bx = divmod(b, 2)
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, :] = v
        _, _, _, out = decode_jpeg(encode_jpeg(16, 16, img.tobytes()))
        dec = np.frombuffer(out, np.uint8).reshape(16, 16, 3)
        for b, v in enumerate(levels):
            by, bx = divmod(b, 2)
            tile = dec[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, :]
            assert (tile == v).all(), (b, v)


class TestRateDistortion:
    def test_smooth_gradient_psnr(self):
        x = np.linspace(0, 255, 32)
        img = np.clip(np.add.outer(x, x) / 2, 0, 255)
        rgb = np.stack([img, img, img], -1).astype(np.uint8)
        j = encode_jpeg(32, 32, rgb.tobytes())
        w, h, nc, out = decode_jpeg(j)
        dec = np.frombuffer(out, np.uint8).reshape(32, 32, 3)
        # Q50 baseline on a smooth plane: textbook range is ~35-45 dB;
        # a transposed IDCT or off-by-one quant lands FAR below this
        assert _psnr(rgb, dec) > 38
        # and it actually compresses
        assert len(j) < len(rgb.tobytes())

    def test_noise_survives_with_bounded_error(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (24, 17, 3), dtype=np.uint8)
        w, h, nc, out = decode_jpeg(encode_jpeg(17, 24, img.tobytes()))
        assert (w, h, nc) == (17, 24, 3)
        dec = np.frombuffer(out, np.uint8).reshape(24, 17, 3)
        rmse = (((dec.astype(float) - img.astype(float)) ** 2).mean()) ** 0.5
        assert rmse < 60  # Q50 quantization noise, not garbage

    def test_grayscale_roundtrip(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        j = encode_jpeg(16, 16, img.tobytes(), gray=True)
        w, h, nc, out = decode_jpeg(j)
        assert (w, h, nc) == (16, 16, 1)
        dec = np.frombuffer(out, np.uint8).reshape(16, 16)
        # Q50 on uniform NOISE: quantization kills most AC energy, so
        # ~23 dB is the textbook outcome; garbage (wrong IDCT/tables)
        # lands under ~12 dB
        assert _psnr(img, dec) > 18


class TestFraming:
    def test_restart_markers_change_bytes_not_pixels(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        plain = decode_jpeg(encode_jpeg(24, 24, img.tobytes()))
        for ri in (1, 2, 5):
            j = encode_jpeg(24, 24, img.tobytes(), restart_interval=ri)
            assert decode_jpeg(j) == plain, ri
            assert any(
                j[i] == 0xFF and 0xD0 <= j[i + 1] <= 0xD7
                for i in range(len(j) - 1)
            )

    def test_header_only_parse(self):
        j = encode_jpeg(31, 17, bytes(31 * 17 * 3))
        assert is_jpeg(j)
        assert jpeg_header(j) == (31, 17, 3)

    def test_progressive_rejected(self):
        # hand-build SOI + SOF2 (progressive) frame header
        sof2 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
        data = (
            b"\xff\xd8"
            + struct.pack(">HH", 0xFFC2, len(sof2) + 2)
            + sof2
        )
        with pytest.raises(NotImplementedError, match="SOF0"):
            jpeg_header(data)

    def test_subsampled_rejected(self):
        j = bytearray(encode_jpeg(16, 16, bytes(16 * 16 * 3)))
        # patch component 1's sampling factors in SOF0 to 2x2 (4:2:0)
        i = j.find(b"\xff\xc0")
        assert i > 0
        assert j[i + 2 + 2 + 6 + 1] == 0x11
        j[i + 2 + 2 + 6 + 1] = 0x22
        with pytest.raises(NotImplementedError, match="subsampling"):
            decode_jpeg(bytes(j))

    def test_truncated_entropy_stream_detected(self):
        j = encode_jpeg(16, 16, bytes([137]) * (16 * 16 * 3))
        with pytest.raises(ValueError):
            decode_jpeg(j[: len(j) // 2])

    def test_wrong_raw_size_rejected(self):
        with pytest.raises(ValueError, match="raw size"):
            encode_jpeg(8, 8, b"nope")


class TestSparkWiring:
    def test_extract_features_reads_jpeg_header(self, spark):
        from optimus_any2any_spark.operators.multimodal import (
            extract_features,
        )

        j = encode_jpeg(21, 12, bytes(21 * 12 * 3))
        df = spark.createDataFrame(
            [(1, bytearray(j), "image/jpeg")],
            "doc_id long, payload binary, media_type string",
        )
        row = extract_features(df, fake_decode=False).collect()[0]
        assert (row.width, row.height) == (21, 12)

    def test_resize_jpeg_stays_jpeg(self, spark):
        from optimus_any2any_spark.operators.multimodal import resize_images

        raw = bytes([130]) * (32 * 32 * 3)
        df = spark.createDataFrame(
            [(1, bytearray(encode_jpeg(32, 32, raw)), "image/jpeg")],
            "doc_id long, payload binary, media_type string",
        )
        row = resize_images(df, target_w=8, target_h=8,
                            fake_decode=False).collect()[0]
        w, h, nc, out = decode_jpeg(bytes(row.payload))
        assert (w, h, nc) == (8, 8, 3)
        # flat fixed-point image survives decode->resize->re-encode
        assert out == bytes([130]) * (8 * 8 * 3)


class TestPropertyFuzz:
    def test_random_flat_block_grids_stay_exact(self):
        """Any grid of flat 8x8 blocks at even offsets from 128 must
        round-trip bit-exact — the quantizer fixed-point argument,
        fuzzed over grid sizes and level choices."""
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=25, deadline=None)
        @given(
            bw=st.integers(1, 4),
            bh=st.integers(1, 4),
            seed=st.integers(0, 2**31 - 1),
        )
        def check(bw, bh, seed):
            import numpy as np

            rng = np.random.default_rng(seed)
            img = np.empty((bh * 8, bw * 8, 3), dtype=np.uint8)
            for by in range(bh):
                for bx in range(bw):
                    v = 128 + 2 * int(rng.integers(-32, 33))
                    img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, :] = v
            j = encode_jpeg(bw * 8, bh * 8, img.tobytes())
            got = decode_jpeg(j)
            assert got == (bw * 8, bh * 8, 3, img.tobytes())

        check()

    def test_random_images_decode_within_quant_error(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=15, deadline=None)
        @given(
            w=st.integers(1, 24),
            h=st.integers(1, 24),
            seed=st.integers(0, 2**31 - 1),
            ri=st.sampled_from([0, 0, 1, 3]),
        )
        def check(w, h, seed, ri):
            import numpy as np

            rng = np.random.default_rng(seed)
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            j = encode_jpeg(w, h, img.tobytes(), restart_interval=ri)
            dw, dh, nc, out = decode_jpeg(j)
            assert (dw, dh, nc) == (w, h, 3)
            dec = np.frombuffer(out, np.uint8).reshape(h, w, 3)
            rmse = (
                ((dec.astype(float) - img.astype(float)) ** 2).mean()
            ) ** 0.5
            assert rmse < 75, rmse

        check()


class TestAhash:
    def test_ahash_matches_reference_bit_layout(self, spark):
        """Hand-computed aHash for a half-bright/half-dark image: top
        rows above mean -> 0xff bytes, bottom -> 0x00 (x=0 is the MSB,
        row-major)."""
        import numpy as np

        from optimus_any2any_spark.formats.png import encode_png
        from optimus_any2any_spark.operators.multimodal import image_ahash

        img = np.zeros((16, 16, 3), dtype=np.uint8)
        img[:8, :, :] = 200
        img[8:, :, :] = 50
        df = spark.createDataFrame(
            [(1, bytearray(encode_png(16, 16, img.tobytes())), "image/png")],
            "doc_id long, payload binary, media_type string",
        )
        row = image_ahash(df).collect()[0]
        assert row.ahash_hex == "ff" * 4 + "00" * 4

    def test_ahash_survives_jpeg_reencode(self, spark):
        """The perceptual point: the SAME image via PNG (lossless)
        and JPEG (lossy, flat-block fixed points) hashes identically."""
        import numpy as np

        from optimus_any2any_spark.formats.jpeg import encode_jpeg
        from optimus_any2any_spark.formats.png import encode_png
        from optimus_any2any_spark.operators.multimodal import image_ahash

        img = np.zeros((16, 16, 3), dtype=np.uint8)
        for b, v in enumerate([112, 130, 142, 88]):
            by, bx = divmod(b, 2)
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, :] = v
        df = spark.createDataFrame(
            [
                (1, bytearray(encode_png(16, 16, img.tobytes())), "png"),
                (2, bytearray(encode_jpeg(16, 16, img.tobytes())), "jpg"),
            ],
            "doc_id long, payload binary, media_type string",
        )
        got = {r.doc_id: r.ahash_hex for r in image_ahash(df).collect()}
        assert got[1] == got[2]
