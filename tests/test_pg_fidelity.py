"""PG value-normalization matrix (ext/postgresql/source.go:150-191)
and the sink's information_schema pre-check (util.go:15-70), exercised
on JDBC-shaped DataFrames — no live PostgreSQL needed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from optimus_any2any_spark.sources import pg


def one(spark, value, dtype, pg_type):
    df = spark.createDataFrame([(value,)], f"v {dtype}")
    out = pg.normalize_pg_frame(df, {"v": pg_type})
    return out.collect()[0]["v"]


class TestGoDurationFormat:
    # pinned against Go time.Duration.String() semantics
    CASES = [
        (0, "0s"),
        (123, "123µs"),
        (999, "999µs"),
        (1500, "1.5ms"),
        (1050, "1.05ms"),
        (999999, "999.999ms"),
        (1_000_000, "1s"),
        (1_500_000, "1.5s"),
        (90_500_000, "1m30.5s"),
        (60_000_000, "1m0s"),
        (3_600_000_000, "1h0m0s"),
        (3_661_000_000, "1h1m1s"),
        (93_784_500_000, "26h3m4.5s"),
        (-1_500_000, "-1.5s"),
        (-123, "-123µs"),
    ]

    def test_matrix(self, spark):
        rows = [(i, us) for i, (us, _) in enumerate(self.CASES)]
        df = spark.createDataFrame(rows, "i int, us long")
        got = {
            r["i"]: r["s"]
            for r in df.select(
                "i", pg.go_duration(F.col("us")).alias("s")
            ).collect()
        }
        for i, (us, expect) in enumerate(self.CASES):
            assert got[i] == expect, f"{us}µs -> {got[i]!r}, want {expect!r}"


class TestNormalizeMatrix:
    def test_uuid_lowercased(self, spark):
        v = one(
            spark,
            "A0EEBC99-9C0B-4EF8-BB6D-6BB9BD380A11",
            "string",
            "uuid",
        )
        assert v == "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11"

    def test_bytea_backslash_hex(self, spark):
        # fmt.Sprintf("\\x%x", b) -> "\x01ab" lowercase
        v = one(spark, bytearray(b"\x01\xab"), "binary", "bytea")
        assert v == "\\x01ab"

    def test_time_from_micros_since_midnight(self, spark):
        # pgtype.Time carries microseconds since midnight
        us = (14 * 3600 + 30 * 60 + 45) * 1_000_000
        assert one(spark, us, "long", "time") == "14:30:45"

    def test_time_from_timestamp_shape(self, spark):
        import datetime

        v = one(
            spark,
            datetime.datetime(1970, 1, 1, 9, 5, 7),
            "timestamp",
            "time",
        )
        assert v == "09:05:07"

    def test_interval_month_day_folding(self, spark):
        # source.go:172-174: months*30*24h + days*24h + micros
        import json

        df = spark.createDataFrame(
            [((1, 2, 3_000_000),)],
            "v struct<months:int,days:int,microseconds:long>",
        )
        out = pg.normalize_pg_frame(df, {"v": "interval"})
        assert out.collect()[0]["v"] == "768h0m3s"
        assert json.loads(out.schema.json())  # stays a plain string col

    def test_macaddr_text_lowercased(self, spark):
        v = one(spark, "08:00:2B:01:02:03", "string", "macaddr")
        assert v == "08:00:2b:01:02:03"

    def test_macaddr_from_bytes(self, spark):
        v = one(
            spark, bytearray(b"\x08\x00\x2b\x01\x02\x03"), "binary", "macaddr"
        )
        assert v == "08:00:2b:01:02:03"

    def test_xml_to_text_and_unknown_passthrough(self, spark):
        assert one(spark, "<a/>", "string", "xml") == "<a/>"
        assert one(spark, 7, "long", "int8") == 7

    def test_untyped_columns_untouched(self, spark):
        df = spark.createDataFrame([(1, "X")], "id long, u string")
        out = pg.normalize_pg_frame(df, {"u": "uuid"})
        row = out.collect()[0]
        assert row["id"] == 1 and row["u"] == "x"
        assert out.columns == ["id", "u"]  # projection keeps order


class TestSchemaValidity:
    def test_unknown_field_fails_fast_with_reference_message(self):
        with pytest.raises(
            ValueError,
            match="field 'extra' does not match any column in the table",
        ):
            pg.check_schema_validity(["id", "name"], ["id", "extra"])

    def test_case_insensitive_match(self):
        pg.check_schema_validity(["ID", "Name"], ["id", "NAME"])

    def test_count_mismatch_warns_not_raises(self, caplog):
        import logging

        with caplog.at_level(logging.WARNING):
            pg.check_schema_validity(["id", "name", "ts"], ["id"])
        assert "2 columns will have null/default value" in caplog.text

    def test_table_columns_query_shapes(self):
        q = pg.table_columns_query("events")
        assert "table_name = 'events'" in q and "table_schema" not in q
        q2 = pg.table_columns_query("public.events")
        assert "table_schema = 'public'" in q2
        assert "table_name = 'events'" in q2
        assert "ORDER BY ordinal_position" in q2

    def test_sink_precheck_blocks_before_write(self, spark):
        # injected column list, no live DB: the sink must raise BEFORE
        # attempting any JDBC write
        from optimus_any2any_spark.config import Config
        from optimus_any2any_spark.sinks.builders import jdbc_sink

        df = spark.createDataFrame([(1, "x")], "id long, bogus string")
        cfg = Config(
            values={
                "PSQL__CONNECTION_DSN": "jdbc:postgresql://nowhere/db",
                "PSQL__DESTINATION_TABLE_ID": "t",
                "PSQL__TABLE_COLUMNS": ["id", "name"],
            }
        )
        with pytest.raises(ValueError, match="field 'bogus'"):
            jdbc_sink(df, cfg)


class TestSourceWiring:
    def test_pg_types_config_applied(self, spark, monkeypatch):
        # stub the JDBC load; assert the post-projection runs
        import json

        from optimus_any2any_spark.config import Config
        from optimus_any2any_spark.sources.builders import jdbc_source

        raw = spark.createDataFrame(
            [("A0EEBC99-9C0B-4EF8-BB6D-6BB9BD380A11", bytearray(b"\x0f"))],
            "u string, b binary",
        )

        class FakeReader:
            def __init__(self, df):
                self.df = df

            def format(self, *_):
                return self

            def option(self, *_):
                return self

            def load(self):
                return self.df

        monkeypatch.setattr(
            type(spark), "read", property(lambda self: FakeReader(raw))
        )
        cfg = Config(
            values={
                "PSQL__CONNECTION_DSN": "jdbc:postgresql://nowhere/db",
                "PSQL__QUERY": "SELECT 1",
                "PSQL__PG_TYPES": json.dumps({"u": "uuid", "b": "bytea"}),
            }
        )
        row = jdbc_source(spark, cfg).collect()[0]
        assert row["u"] == "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11"
        assert row["b"] == "\\x0f"
