"""RoaringBitmap / deletion-vector codecs (formats/roaring.py):
round-trips across container types (array, bitmap, run decode),
64-bit key splits, DV blob/file framing, and the Z85 text codec."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from optimus_any2any_spark.formats.roaring import (
    DV_MAGIC,
    deserialize_rbm_array,
    deserialize_roaring32,
    dv_blob,
    dv_blob_decode,
    dv_file_read,
    dv_file_write,
    serialize_rbm_array,
    serialize_roaring32,
    z85_decode,
    z85_encode,
)


class TestRoaring32:
    def test_empty(self):
        vals, _ = deserialize_roaring32(serialize_roaring32([]))
        assert vals == []

    def test_array_container(self):
        v = [0, 1, 5, 65535, 65536, 100000]
        got, used = deserialize_roaring32(serialize_roaring32(v))
        assert got == v
        assert used == len(serialize_roaring32(v))

    def test_bitmap_container(self):
        v = list(range(0, 10000, 2))  # 5000 > 4096 → bitmap container
        got, _ = deserialize_roaring32(serialize_roaring32(v))
        assert got == v

    def test_run_container_decodes(self):
        # hand-build a run-cookie bitmap: one container, runs
        # [3..7], [10..10]
        buf = struct.pack("<i", 12347 | (0 << 16))  # 1 container
        buf += b"\x01"  # run flag bitset: container 0 has runs
        buf += struct.pack("<HH", 0, 5)  # key 0, cardinality 6
        # < NO_OFFSET_THRESHOLD containers with run cookie: no offsets
        buf += struct.pack("<H", 2)  # 2 runs
        buf += struct.pack("<HH", 3, 4)   # 3..7
        buf += struct.pack("<HH", 10, 0)  # 10
        got, used = deserialize_roaring32(buf)
        assert got == [3, 4, 5, 6, 7, 10]
        assert used == len(buf)

    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=2**32 - 1),
            max_size=400, unique=True,
        )
    )
    def test_round_trip_fuzz(self, vals):
        v = sorted(vals)
        got, _ = deserialize_roaring32(serialize_roaring32(v))
        assert got == v


class TestRbmArray:
    def test_cross_key_values(self):
        v = [0, 1, 2**32 - 1, 2**32, 2**32 + 7, 5 * 2**32 + 3]
        assert deserialize_rbm_array(serialize_rbm_array(v)) == v

    def test_empty(self):
        assert deserialize_rbm_array(serialize_rbm_array([])) == []

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=3 * 2**32),
            max_size=200, unique=True,
        )
    )
    def test_round_trip_fuzz(self, vals):
        v = sorted(vals)
        assert deserialize_rbm_array(serialize_rbm_array(v)) == v


class TestDvFraming:
    def test_blob_round_trip(self):
        v = [0, 5, 1000000]
        assert dv_blob_decode(dv_blob(v)) == v

    def test_blob_rejects_bad_magic(self):
        bad = struct.pack("<i", DV_MAGIC + 1) + b"\x00" * 8
        with pytest.raises(ValueError, match="magic"):
            dv_blob_decode(bad)

    def test_file_round_trip(self, tmp_path):
        p = str(tmp_path / "dv.bin")
        blobs = [dv_blob([1, 2, 3]), dv_blob([7])]
        offsets = dv_file_write(p, blobs)
        assert offsets[0] == 1
        for off, b in zip(offsets, blobs):
            assert dv_file_read(p, off, len(b)) == b

    def test_file_checksum_detects_corruption(self, tmp_path):
        p = str(tmp_path / "dv.bin")
        b = dv_blob([1, 2, 3])
        (off,) = dv_file_write(p, [b])
        raw = bytearray(open(p, "rb").read())
        raw[10] ^= 0xFF
        open(p, "wb").write(bytes(raw))
        with pytest.raises(ValueError):
            dv_file_read(p, off, len(b))


class TestZ85:
    def test_zeromq_reference_vector(self):
        # the Z85 spec's reference example
        assert z85_encode(bytes.fromhex("864FD26FB559F75B")) == "HelloWorld"
        assert z85_decode("HelloWorld") == bytes.fromhex("864FD26FB559F75B")

    @settings(max_examples=100, deadline=None)
    @given(st.binary(max_size=64).filter(lambda b: len(b) % 4 == 0))
    def test_round_trip_fuzz(self, data):
        assert z85_decode(z85_encode(data)) == data
