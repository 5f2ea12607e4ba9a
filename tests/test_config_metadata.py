"""Config-layer and metadata-column tests (SURVEY.md §1.2, §3.1)."""

from __future__ import annotations

from optimus_any2any_spark.config import Config
from optimus_any2any_spark import metadata as M


class TestConfig:
    def test_component_prefix_strip(self):
        cfg = Config.from_env(
            environ={"FILE__SOURCE_URI": "file:///x.json", "JQ__QUERY": ".[]"},
        )
        assert cfg.for_component("file") == {"source_uri": "file:///x.json"}
        assert cfg.for_component("JQ") == {"query": ".[]"}

    def test_env_args_win_last(self):
        cfg = Config.from_env(
            env_args=["A__K=1", "A__K=2"], environ={"A__K": "0"}
        )
        assert cfg.for_component("A") == {"k": "2"}

    def test_defaults(self):
        cfg = Config.from_env(environ={})
        assert cfg.get_int("CONNECTOR_BATCH_SIZE") == 512
        assert cfg.get("METADATA_PREFIX") == "__METADATA__"
        assert cfg.get_bool("DRY_RUN") is False

    def test_bool_parsing(self):
        cfg = Config.from_env(environ={"X": "TRUE", "Y": "0"})
        assert cfg.get_bool("X") and not cfg.get_bool("Y")


class TestMetadata:
    def test_record_index_is_global_and_sequential(self, spark):
        df = spark.range(0, 1000).repartition(7)
        out = M.with_record_index(df)
        idx = sorted(r[M.RECORD_INDEX] for r in out.collect())
        assert idx == list(range(1000))

    def test_record_index_with_order(self, spark):
        df = spark.createDataFrame([(3,), (1,), (2,)], "k int").repartition(2)
        out = M.with_record_index(df, order_by=["k"])
        got = {r["k"]: r[M.RECORD_INDEX] for r in out.collect()}
        assert got == {1: 0, 2: 1, 3: 2}

    def test_record_index_and_total(self, spark):
        # the offsets job already knows the exact N — returned for free
        # (rank-dependent operators need it without a second scan)
        df = spark.range(0, 777).repartition(5)
        out, n = M.with_record_index_and_total(df)
        assert n == 777
        assert sorted(r[M.RECORD_INDEX] for r in out.collect()) == list(
            range(777)
        )
        empty = spark.range(0, 0)
        out2, n2 = M.with_record_index_and_total(empty)
        assert n2 == 0 and out2.count() == 0

    def test_record_index_desc_order(self, spark):
        # Column expressions (F.desc) in order_by — the LPT shard deal
        # ranks by size DESCENDING
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(5, "a"), (9, "b"), (1, "c")], "n int, k string"
        ).repartition(3)
        out, n = M.with_record_index_and_total(
            df, order_by=[F.desc("n"), F.asc("k")]
        )
        assert n == 3
        got = {r["k"]: r[M.RECORD_INDEX] for r in out.collect()}
        assert got == {"b": 0, "a": 1, "c": 2}

    def test_batch_index(self, spark):
        df = spark.range(0, 1100).toDF("n")
        out = M.with_batch_index(M.with_record_index(df.coalesce(1)), batch_size=512)
        batches = {r[M.BATCH_INDEX] for r in out.collect()}
        assert batches == {0, 1, 2}

    def test_strip_and_prefix(self, spark):
        df = spark.createDataFrame([(1, "f.json")], ["a", M.FILENAME])
        assert M.strip_metadata(df).columns == ["a"]
        pref = M.add_metadata_prefix(spark.createDataFrame([(1,)], ["a"]))
        assert pref.columns == ["__METADATA__a"]

    def test_specialized_metadata_split(self, spark):
        # FIXTURES.md F3: all-metadata row configures the sink, data row flows
        df = spark.createDataFrame(
            [
                (None, None, 100, "sample@example.com"),
                ("value_1", "value_2", 100, None),
            ],
            ["column_1", "column_2", "__METADATA__record_count", "__METADATA__email_address"],
        )
        data, meta = M.split_specialized_metadata(df)
        assert data.count() == 1 and meta.count() == 1
        assert meta.collect()[0]["__METADATA__email_address"] == "sample@example.com"


class TestSpecializedMetadataConsumption:
    """rfc_009: a pure-metadata record configures the sink and is never
    written as data (FIXTURES.md F3)."""

    def test_f3_email_address_configures_smtp(self, spark, tmp_path):
        import json

        from optimus_any2any_spark.config import Config
        from optimus_any2any_spark.pipeline import Pipeline

        src = tmp_path / "f3.json"
        src.write_text(
            '{"__METADATA__record_count": 100,'
            ' "__METADATA__email_address": "sample@example.com"}\n'
            '{"column_1": "value_1", "column_2": "value_2",'
            ' "__METADATA__record_count": 100}\n'
        )
        sent = []
        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                "SMTP__ADDRESS_TO=fallback@example.com",
                "SMTP__SUBJECT=report",
            ],
            environ={},
        )
        cfg.values["SMTP__TRANSPORT"] = sent.append
        Pipeline(spark, "FILE", ["SMTP"], cfg).run()
        assert len(sent) == 1
        # line 1 reconfigured the recipient...
        assert sent[0]["to"] == "sample@example.com"
        # ...and was not written as data
        records = [
            json.loads(l) for l in sent[0]["attachment"].splitlines() if l
        ]
        assert records == [{"column_1": "value_1", "column_2": "value_2"}]

    def test_component_scoped_override_configures_file_sink(
        self, spark, tmp_path
    ):
        import json

        from optimus_any2any_spark.config import Config
        from optimus_any2any_spark.pipeline import Pipeline

        src = tmp_path / "in.json"
        dyn_out = tmp_path / "dynamic.json"
        src.write_text(
            '{"__METADATA__file__destination_uri": "%s"}\n'
            '{"a": 1}\n' % dyn_out
        )
        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                f"FILE__DESTINATION_URI={tmp_path}/static.json",
            ],
            environ={},
        )
        Pipeline(spark, "FILE", ["FILE"], cfg).run()
        assert dyn_out.exists()
        assert json.loads(dyn_out.read_text().splitlines()[0]) == {"a": 1}
        assert not (tmp_path / "static.json").exists()


class TestRecordIndexLayoutPinning:
    def test_ordered_index_is_exact_permutation_at_scale(self, spark):
        """repartitionByRange samples boundaries per execution; the
        two-pass offset computation must read ONE pinned layout
        (localCheckpoint) or indices gap/duplicate — seen at sf0.1
        before the fix (batch count 1124 vs 1172)."""
        from optimus_any2any_spark import metadata as M
        from pyspark.sql import functions as F

        n = 200_000
        df = (
            spark.range(n)
            .withColumn("key", (F.lit(n) - F.col("id")) * 7 % 104729)
            .repartition(16)
        )
        out = M.with_record_index(df, col="ri", order_by=["key", "id"])
        stats = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("ri").alias("d"),
            F.min("ri").alias("mn"),
            F.max("ri").alias("mx"),
        ).collect()[0]
        assert stats.n == n and stats.d == n
        assert stats.mn == 0 and stats.mx == n - 1


class TestRuneDelimiters:
    """<COMP>__CSV_DELIMITER is a rune in the reference
    (internal/config/util.go:54-68 runeParser): \\t and \\n decode,
    single chars pass, anything else is a config error."""

    def test_parse_rune_escapes(self):
        from optimus_any2any_spark.config import parse_rune

        assert parse_rune("\\t") == "\t"
        assert parse_rune("\\n") == "\n"
        assert parse_rune(";") == ";"
        assert parse_rune(None) is None
        assert parse_rune("") is None
        import pytest as _pytest

        with _pytest.raises(ValueError):
            parse_rune("ab")

    def test_tab_delimiter_reaches_csv_source(self, spark, tmp_path):
        from optimus_any2any_spark.config import Config
        from optimus_any2any_spark.pipeline import (
            SOURCE_BUILDERS,
            _load_builtin_components,
        )

        _load_builtin_components()

        p = tmp_path / "in.csv"
        p.write_text("a\tb\n1\t2\n")
        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{p}",
                "FILE__CSV_DELIMITER=\\t",
            ],
            environ={},
        )
        df = SOURCE_BUILDERS["FILE"](spark, cfg)
        rows = [
            {k: v for k, v in r.asDict().items() if not k.startswith("__")}
            for r in df.collect()
        ]
        assert rows == [{"a": "1", "b": "2"}]

    def test_tab_delimiter_reaches_file_sink(self, spark, tmp_path):
        from optimus_any2any_spark.config import Config
        from optimus_any2any_spark.pipeline import (
            SINK_BUILDERS,
            _load_builtin_components,
        )

        _load_builtin_components()

        out = tmp_path / "out.csv"
        df = spark.createDataFrame([("x", "y")], "a string, b string")
        cfg = Config.from_env(
            env_args=[
                f"FILE__DESTINATION_URI=file://{out}",
                "FILE__CSV_DELIMITER=\\t",
            ],
            environ={},
        )
        SINK_BUILDERS["FILE"](df, cfg)
        text = "".join(
            f.read_text()
            for f in sorted(out.rglob("*.csv"))
            if f.is_file()
        ) if out.is_dir() else out.read_text()
        assert "x\ty" in text
        assert "a\tb" in text


class TestSmtpGroupSizeGuard:
    """VERDICT r11 item 6: the SMTP sink's grouped content collects to
    the driver — a mis-routed large dataset must fail loudly BEFORE
    the collect, not OOM it. Caps: SMTP__MAX_GROUP_BYTES (per-group
    content) and SMTP__MAX_GROUPS (distinct emails)."""

    def _cfg(self, src, extra, sent):
        from optimus_any2any_spark.config import Config

        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                "SMTP__ADDRESS_TO=x@example.com",
                "SMTP__SUBJECT=report",
                *extra,
            ],
            environ={},
        )
        cfg.values["SMTP__TRANSPORT"] = sent.append
        return cfg

    def test_oversized_group_refuses_by_name(self, spark, tmp_path):
        import pytest as _pytest

        from optimus_any2any_spark.pipeline import Pipeline

        src = tmp_path / "big.json"
        src.write_text(
            "".join('{"v": "%s"}\n' % ("x" * 200) for _ in range(20))
        )
        sent = []
        cfg = self._cfg(src, ["SMTP__MAX_GROUP_BYTES=1000"], sent)
        with _pytest.raises(ValueError, match="SMTP__MAX_GROUP_BYTES"):
            Pipeline(spark, "FILE", ["SMTP"], cfg).run()
        assert sent == []  # nothing was sent before the refusal

    def test_too_many_groups_refuses_by_name(self, spark, tmp_path):
        import pytest as _pytest

        from optimus_any2any_spark.pipeline import Pipeline

        src = tmp_path / "many.json"
        src.write_text(
            "".join('{"team": "t%d"}\n' % i for i in range(5))
        )
        sent = []
        cfg = self._cfg(
            src,
            [
                "SMTP__ADDRESS_TO=[[ .team ]]@example.com",
                "SMTP__MAX_GROUPS=3",
            ],
            sent,
        )
        with _pytest.raises(ValueError, match="SMTP__MAX_GROUPS"):
            Pipeline(spark, "FILE", ["SMTP"], cfg).run()
        assert sent == []

    def test_under_cap_still_sends(self, spark, tmp_path):
        from optimus_any2any_spark.pipeline import Pipeline

        src = tmp_path / "ok.json"
        src.write_text('{"v": "hello"}\n')
        sent = []
        cfg = self._cfg(
            src,
            ["SMTP__MAX_GROUP_BYTES=1000", "SMTP__MAX_GROUPS=3"],
            sent,
        )
        Pipeline(spark, "FILE", ["SMTP"], cfg).run()
        assert len(sent) == 1 and "hello" in sent[0]["attachment"]
