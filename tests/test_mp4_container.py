"""MP4/ISO-BMFF container parsing (formats/mp4.py): box walking,
version-1 boxes, 64-bit sizes, malformed rejection, and the Spark
video-metadata extractor."""

from __future__ import annotations

import struct

import pytest

from optimus_any2any_spark.formats.mp4 import (
    build_mp4_skeleton,
    is_mp4,
    parse_mp4,
)


class TestParse:
    def test_skeleton_round_trip(self):
        data = build_mp4_skeleton(
            timescale=1000, duration=5500, tracks=[(1, 640, 360), (2, 0, 0)]
        )
        assert is_mp4(data)
        m = parse_mp4(data)
        assert m["brand"] == "isom"
        assert m["timescale"] == 1000
        assert m["duration_ms"] == 5500
        assert m["n_tracks"] == 2
        assert m["tracks"][0] == {"track_id": 1, "width": 640, "height": 360}
        assert m["tracks"][1]["width"] == 0  # audio track: spec says 0

    def test_odd_timescale_duration_math(self):
        # 90kHz timescale, 123456 ticks -> 1371ms (integer floor)
        m = parse_mp4(
            build_mp4_skeleton(timescale=90000, duration=123456, tracks=[])
        )
        assert m["duration_ms"] == 123456 * 1000 // 90000

    def test_version1_mvhd(self):
        # hand-build a version-1 mvhd (64-bit duration)
        body = (
            b"\x01\x00\x00\x00"
            + struct.pack(">QQ", 0, 0)  # creation/modification (64-bit)
            + struct.pack(">IQ", 600, 1234)  # timescale, duration64
        )
        mvhd = struct.pack(">I", len(body) + 8) + b"mvhd" + body
        moov = struct.pack(">I", len(mvhd) + 8) + b"moov" + mvhd
        ftyp = struct.pack(">I", 16) + b"ftyp" + b"mp42" + b"\x00" * 4
        m = parse_mp4(ftyp + moov)
        assert m["timescale"] == 600
        assert m["duration_ms"] == 1234 * 1000 // 600

    def test_largesize_box(self):
        data = build_mp4_skeleton(timescale=100, duration=100, tracks=[])
        # rewrap moov with a 64-bit largesize header
        ftyp_len = struct.unpack(">I", data[:4])[0]
        moov = data[ftyp_len:]
        size32 = struct.unpack(">I", moov[:4])[0]
        large = (
            struct.pack(">I", 1)
            + b"moov"
            + struct.pack(">Q", size32 + 8)
            + moov[8:]
        )
        m = parse_mp4(data[:ftyp_len] + large)
        assert m["timescale"] == 100

    def test_not_mp4_rejected(self):
        with pytest.raises(ValueError, match="ftyp"):
            parse_mp4(b"\x89PNG\r\n\x1a\nxxxxxxxx")

    def test_truncated_box_rejected(self):
        data = build_mp4_skeleton(timescale=100, duration=100, tracks=[])
        with pytest.raises(ValueError, match="bad box size|truncated"):
            parse_mp4(data[:-6])

    def test_missing_mvhd_rejected(self):
        ftyp = struct.pack(">I", 16) + b"ftyp" + b"mp42" + b"\x00" * 4
        with pytest.raises(ValueError, match="mvhd"):
            parse_mp4(ftyp)


class TestSparkWiring:
    def test_extract_features_reads_container_dims(self, spark):
        from optimus_any2any_spark.operators.multimodal import (
            extract_features,
        )

        payload = build_mp4_skeleton(
            timescale=1000, duration=2000, tracks=[(1, 0, 0), (2, 1280, 720)]
        )
        df = spark.createDataFrame(
            [(1, bytearray(payload), "video/mp4")],
            "doc_id long, payload binary, media_type string",
        )
        row = extract_features(df, fake_decode=False).collect()[0]
        # first SIZED track wins (track 1 is audio)
        assert (row.width, row.height) == (1280, 720)

    def test_video_metadata_extractor(self, spark):
        from optimus_any2any_spark.operators.multimodal import (
            extract_video_metadata,
        )

        mp4 = build_mp4_skeleton(
            timescale=600, duration=3000, tracks=[(7, 320, 240)]
        )
        y4m = b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420\nFRAME\n" + b"\x00" * 12
        df = spark.createDataFrame(
            [(1, bytearray(mp4), "video/mp4"), (2, bytearray(y4m), "video/y4m")],
            "doc_id long, payload binary, media_type string",
        )
        got = {r.doc_id: r for r in extract_video_metadata(df).collect()}
        assert got[1].brand == "isom"
        assert got[1].duration_ms == 5000
        assert (got[1].width, got[1].height, got[1].n_tracks) == (320, 240, 1)
        assert got[2].brand == "y4m "
        assert (got[2].width, got[2].height) == (4, 2)
        assert got[2].duration_ms is None


class TestMp3Headers:
    def test_cbr_walk_counts_frames_and_duration(self):
        from optimus_any2any_spark.formats.mp3 import (
            build_mp3_frames,
            parse_mp3,
        )

        m = parse_mp3(build_mp3_frames(38, 128, 44100))
        assert (m["n_frames"], m["bitrate_kbps"], m["sample_rate"]) == (
            38, 128, 44100,
        )
        # 38 frames * 1152 samples at 44100 Hz
        assert m["duration_ms"] == 38 * 1152 * 1000 // 44100

    def test_id3v2_tag_skipped_by_syncsafe_size(self):
        from optimus_any2any_spark.formats.mp3 import (
            build_mp3_frames,
            parse_mp3,
        )

        m = parse_mp3(build_mp3_frames(3, 64, 32000, id3_padding=200))
        assert m["n_frames"] == 3 and m["sample_rate"] == 32000

    def test_garbage_rejected(self):
        import pytest

        from optimus_any2any_spark.formats.mp3 import parse_mp3

        with pytest.raises(ValueError):
            parse_mp3(b"\x00" * 64)

    def test_audio_features_reads_mp3_headers(self, spark):
        from optimus_any2any_spark.formats.mp3 import build_mp3_frames
        from optimus_any2any_spark.operators.multimodal import (
            extract_audio_features,
        )

        payload = build_mp3_frames(20, 128, 44100)
        df = spark.createDataFrame(
            [(1, bytearray(payload))], "doc_id long, payload binary"
        )
        r = extract_audio_features(df, fake_decode=False).collect()[0]
        assert r.sample_rate == 44100
        assert r.n_channels == 1
        assert r.n_frames == 20
        assert r.duration_ms == 20 * 1152 * 1000 // 44100
        assert r.rms is None  # sample decode honestly stubbed
