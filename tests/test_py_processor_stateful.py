"""PY processor, API-source stubs, IO source, stateful streaming."""

from __future__ import annotations

import json

import pytest

from optimus_any2any_spark.config import Config
from optimus_any2any_spark.pipeline import Pipeline, py_transform


class TestPyProcessor:
    def test_py_transform_batchwise(self, spark):
        df = spark.createDataFrame([(1, 2.0), (2, 3.0)], "id long, v double")
        out = py_transform(
            df,
            "def process(batch):\n"
            "    batch['v'] = batch['v'] * 10\n"
            "    return batch\n",
        )
        got = {r["id"]: r["v"] for r in out.collect()}
        assert got == {1: 20.0, 2: 30.0}

    def test_py_processor_in_pipeline(self, spark, tmp_path):
        src = tmp_path / "in.json"
        src.write_text('{"id": 1, "v": 5}\n{"id": 2, "v": 7}\n')
        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                "PY__SCRIPT=def process(batch):\n    return batch[batch['v'] > 5]\n",
            ],
            environ={},
        )
        df = Pipeline(spark, "FILE", ["IO"], cfg).dataframe()
        rows = df.collect()
        assert len(rows) == 1 and rows[0]["id"] == 2


class TestApiSourceStubs:
    def test_sf_injected_fetcher(self, spark):
        cfg = Config.from_env(environ={})
        cfg.values["SF__FETCHER"] = lambda: [
            {"Id": "001", "Name": "Acme"},
            {"Id": "002", "Name": "Globex"},
        ]
        df = Pipeline(spark, "SF", ["IO"], cfg).dataframe()
        assert df.count() == 2

    def test_ga_stub_raises_without_fetcher(self, spark):
        cfg = Config.from_env(environ={})
        with pytest.raises(NotImplementedError, match="GA"):
            Pipeline(spark, "GA", ["IO"], cfg).dataframe()


class TestIoSource:
    def test_stdin_source(self, spark, monkeypatch):
        import io as _io

        monkeypatch.setattr(
            "sys.stdin", _io.StringIO('{"a": 1}\n{"a": 2}\n')
        )
        cfg = Config.from_env(environ={})
        df = Pipeline(spark, "IO", ["IO"], cfg).dataframe()
        assert sorted(r["a"] for r in df.collect()) == [1, 2]


class TestStatefulStreaming:
    def test_running_counts(self, spark, tmp_path):
        from optimus_any2any_spark.streaming.stateful import running_counts
        from optimus_any2any_spark.streaming.streams import stream_source

        src = tmp_path / "sstream"
        src.mkdir()
        (src / "b1.json").write_text(
            '{"ts": "2024-01-01T00:00:00Z", "event_type": "click"}\n'
            '{"ts": "2024-01-01T00:01:00Z", "event_type": "click"}\n'
            '{"ts": "2024-01-01T00:02:00Z", "event_type": "view"}\n'
        )
        stream = stream_source(
            spark, str(src), "ts timestamp, event_type string"
        )
        result = running_counts(stream)
        q = (
            result.writeStream.format("memory")
            .queryName("running_counts")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            r["key"]: r["n_events"]
            for r in spark.table("running_counts").collect()
        }
        assert got == {"click": 2, "view": 1}


class TestStreamingFunnel:
    def test_funnel_state_across_micro_batches(self, spark, tmp_path):
        from optimus_any2any_spark.streaming.stateful import funnel_state
        from optimus_any2any_spark.streaming.streams import stream_source

        src = tmp_path / "fstream"
        src.mkdir()
        # batch 1: u1 views; u2 clicks (no view yet -> chain not started)
        (src / "b1.json").write_text(
            '{"ts": "2024-01-01T00:00:00Z", "user_id": 1, "event_type": "view"}\n'
            '{"ts": "2024-01-01T00:00:00Z", "user_id": 2, "event_type": "click"}\n'
        )
        # batch 2: u1 clicks in-window (state crosses batches); u2 views
        # AFTER its click — click must not count retroactively
        (src / "b2.json").write_text(
            '{"ts": "2024-01-01T01:00:00Z", "user_id": 1, "event_type": "click"}\n'
            '{"ts": "2024-01-01T01:00:00Z", "user_id": 2, "event_type": "view"}\n'
        )
        # batch 3: u1 purchases >24h after click — out of window
        (src / "b3.json").write_text(
            '{"ts": "2024-01-02T02:00:00Z", "user_id": 1, "event_type": "purchase"}\n'
        )
        stream = stream_source(
            spark,
            str(src),
            "ts timestamp, user_id long, event_type string",
            max_files_per_trigger=1,
        )
        q = (
            funnel_state(stream)
            .writeStream.format("memory")
            .queryName("funnel_state")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # memory sink in update mode appends each update; take the LAST
        # emitted row per user
        rows = spark.table("funnel_state").collect()
        last = {}
        for r in rows:
            last[r["user_id"]] = r
        assert last[1].furthest_step == 2  # view+click, purchase late
        assert last[1].t3 is None
        assert last[2].furthest_step == 1  # click-before-view ignored
        assert last[2].t2 is None
