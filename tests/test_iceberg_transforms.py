"""Iceberg partition transforms vs the spec's own examples.

The hash vectors are the spec's Appendix B table (every engine must
produce these exact values or its buckets disagree with the world);
the temporal/truncate cases follow §Partition Transforms.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from optimus_any2any_spark.sources.iceberg_transforms import (
    bucket_of,
    murmur3_32,
    parse_spec_item,
    partition_field_name,
    result_type,
    transform_column,
)


def _signed(h: int) -> int:
    return h - (1 << 32) if h >= (1 << 31) else h


class TestAppendixBHashVectors:
    def test_int_and_long_34(self):
        data = struct.pack("<q", 34)
        assert _signed(murmur3_32(data)) == 2017239379

    def test_date_2017_11_16(self):
        # 17486 days from epoch, hashed as a long
        assert _signed(murmur3_32(struct.pack("<q", 17486))) == -653330422

    def test_time_22_31_08(self):
        micros = ((22 * 60 + 31) * 60 + 8) * 1_000_000
        assert _signed(murmur3_32(struct.pack("<q", micros))) == -662762989

    def test_timestamp_2017_11_16T22_31_08(self):
        assert (
            _signed(murmur3_32(struct.pack("<q", 1510871468000000)))
            == -2047944441
        )

    def test_string_iceberg(self):
        assert _signed(murmur3_32(b"iceberg")) == 1210000089

    def test_bucket_is_masked_mod(self):
        # (hash & Integer.MAX_VALUE) % N — never negative
        for v in (34, -1, 0, 123456789):
            b = bucket_of(v, "long", 16)
            assert 0 <= b < 16
        assert bucket_of(34, "long", 16) == (2017239379 & 0x7FFFFFFF) % 16
        assert bucket_of(None, "long", 16) is None
        assert (
            bucket_of("iceberg", "string", 7)
            == (1210000089 & 0x7FFFFFFF) % 7
        )


class TestSpecParsing:
    def test_identity_and_functions(self):
        assert parse_spec_item("d") == ("identity", "d")
        assert parse_spec_item("days(ts)") == ("day", "ts")
        assert parse_spec_item("hours(ts)") == ("hour", "ts")
        assert parse_spec_item("months(ts)") == ("month", "ts")
        assert parse_spec_item("years(ts)") == ("year", "ts")
        assert parse_spec_item("bucket(16, k)") == ("bucket[16]", "k")
        assert parse_spec_item("truncate(3, v)") == ("truncate[3]", "v")

    def test_field_names(self):
        assert partition_field_name("identity", "d") == "d"
        assert partition_field_name("day", "ts") == "ts_day"
        assert partition_field_name("bucket[16]", "k") == "k_bucket"
        assert partition_field_name("truncate[3]", "v") == "v_trunc"

    def test_result_types(self):
        assert result_type("day", "timestamp") == "date"
        assert result_type("hour", "timestamp") == "int"
        assert result_type("bucket[8]", "string") == "int"
        assert result_type("truncate[4]", "long") == "long"
        assert result_type("identity", "string") == "string"


class TestTransformColumns:
    def test_day_hour_month_year_from_timestamp(self, spark):
        df = spark.createDataFrame(
            [("2017-11-16 22:31:08",), ("1969-12-31 23:00:00",)],
            "s string",
        ).select(F.to_timestamp("s").alias("ts"))
        got = df.select(
            transform_column("day", F.col("ts"), "timestamp").alias("d"),
            transform_column("hour", F.col("ts"), "timestamp").alias("h"),
            transform_column("month", F.col("ts"), "timestamp").alias("m"),
            transform_column("year", F.col("ts"), "timestamp").alias("y"),
        ).collect()
        assert (got[0].d, got[0].h) == (17486, 17486 * 24 + 22)
        assert (got[0].m, got[0].y) == ((2017 - 1970) * 12 + 10, 47)
        # pre-epoch: floor division, never truncation toward zero
        assert (got[1].d, got[1].h) == (-1, -1)
        assert (got[1].m, got[1].y) == (-1, -1)

    def test_truncate_numbers_floor(self, spark):
        df = spark.createDataFrame(
            [(7,), (-7,), (10,), (0,)], "v long"
        )
        got = [
            r.t
            for r in df.select(
                transform_column(
                    "truncate[10]", F.col("v"), "long"
                ).alias("t")
            ).collect()
        ]
        assert got == [0, -10, 10, 0]

    def test_truncate_string(self, spark):
        df = spark.createDataFrame([("iceberg",), ("ab",)], "v string")
        got = [
            r.t
            for r in df.select(
                transform_column(
                    "truncate[3]", F.col("v"), "string"
                ).alias("t")
            ).collect()
        ]
        assert got == ["ice", "ab"]

    def test_bucket_column_matches_python(self, spark):
        df = spark.createDataFrame([(34,), (0,), (None,)], "v long")
        got = {
            r.v: r.b
            for r in df.select(
                "v",
                transform_column(
                    "bucket[16]", F.col("v"), "long"
                ).alias("b"),
            ).collect()
        }
        assert got[34] == bucket_of(34, "long", 16)
        assert got[0] == bucket_of(0, "long", 16)
        assert got[None] is None

    def test_bucket_timestamp_matches_spec_micros(self, spark):
        df = spark.createDataFrame(
            [("2017-11-16 22:31:08",)], "s string"
        ).select(F.to_timestamp("s").alias("ts"))
        got = df.select(
            transform_column(
                "bucket[32]", F.col("ts"), "timestamp"
            ).alias("b")
        ).collect()[0].b
        assert got == ((-2047944441) & 0x7FFFFFFF) % 32

    def test_unsupported_sources_refused(self):
        from optimus_any2any_spark.sources.iceberg_transforms import (
            validate_source,
        )

        with pytest.raises(NotImplementedError):
            validate_source("hour", "date")
        with pytest.raises(NotImplementedError):
            validate_source("truncate[2]", "double")
        with pytest.raises(NotImplementedError):
            validate_source("day", "long")


class TestNtzTimezoneFreedom:
    """Iceberg ``timestamp`` is Spark TIMESTAMP_NTZ (a wall clock):
    its transforms must come out identical under ANY session timezone
    — unix_micros rejects NTZ and every NTZ→LTZ conversion Spark
    offers reads the session tz, so the micros assemble from calendar
    parts (``_epoch_micros``)."""

    def test_ntz_day_hour_bucket_session_tz_invariant(self, spark):
        import datetime as dt

        from optimus_any2any_spark.sources.iceberg_transforms import (
            bucket_of,
        )

        df = spark.createDataFrame(
            [(dt.datetime(2017, 11, 16, 22, 31, 8, 123456),),
             (dt.datetime(1969, 12, 31, 23, 0, 0),)],
            "ts timestamp_ntz",
        )
        prev = spark.conf.get("spark.sql.session.timeZone")
        results = {}
        try:
            for tz in ("UTC", "Asia/Tokyo", "America/New_York"):
                spark.conf.set("spark.sql.session.timeZone", tz)
                got = df.select(
                    transform_column(
                        "day", F.col("ts"), "timestamp"
                    ).alias("d"),
                    transform_column(
                        "hour", F.col("ts"), "timestamp"
                    ).alias("h"),
                    transform_column(
                        "bucket[32]", F.col("ts"), "timestamp"
                    ).alias("b"),
                ).collect()
                results[tz] = [(r.d, r.h, r.b) for r in got]
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev)
        assert results["UTC"] == results["Asia/Tokyo"]
        assert results["UTC"] == results["America/New_York"]
        # spec values: wall-clock micros, floor division pre-epoch
        assert results["UTC"][0][:2] == (17486, 17486 * 24 + 22)
        assert results["UTC"][1][:2] == (-1, -1)
        micros = 17486 * 86_400_000_000 + (22 * 3600 + 31 * 60 + 8) \
            * 1_000_000 + 123_456
        assert results["UTC"][0][2] == bucket_of(
            micros, "timestamp", 32
        )
