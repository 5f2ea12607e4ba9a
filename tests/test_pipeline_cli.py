"""Pipeline/CLI tests: the reference's README usage flows, end-to-end."""

from __future__ import annotations

import json

import pytest

from optimus_any2any_spark.config import Config
from optimus_any2any_spark.pipeline import Pipeline, UnknownComponent


def write_ndjson(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


ROWS = [
    {"id": 1, "name": "alice", "age": 34},
    {"id": 2, "name": "bob", "age": 28},
    {"id": 3, "name": "carol", "age": 41},
]


class TestPipeline:
    def test_file_to_file_with_jq(self, spark, tmp_path):
        """README Advanced Usage: FILE→FILE with JQ filter."""
        src = tmp_path / "in.json"
        write_ndjson(src, ROWS)
        out = tmp_path / "out.json"
        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                f"FILE__DESTINATION_URI=file://{out}",
                "JQ__QUERY=.[] | select(.age > 30)",
            ],
            environ={},
        )
        Pipeline(spark, "FILE", ["FILE"], cfg).run()
        got = [json.loads(l) for l in open(out)]
        assert {r["name"] for r in got} == {"alice", "carol"}
        assert all(not k.startswith("__METADATA__") for r in got for k in r)

    def test_jq_conditional_compiles_native(self, spark, tmp_path):
        """if/then/else and has() run natively through the pipeline —
        no jq subprocess (verified by asserting the native translation
        accepts the program) and correct branch values end-to-end."""
        from optimus_any2any_spark.compiler.jq import translate_jq

        src = tmp_path / "in.json"
        write_ndjson(src, ROWS)
        out = tmp_path / "out.json"
        program = (
            '.[] | {name, bucket: (if .age > 35 then "senior" '
            'elif .age > 30 then "mid" else "junior" end), '
            'known: has("name")}'
        )
        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                f"FILE__DESTINATION_URI=file://{out}",
                f"JQ__QUERY={program}",
            ],
            environ={},
        )
        # prove the native path accepts it (no JQUnsupported)
        translate_jq(spark.createDataFrame(ROWS), program)
        Pipeline(spark, "FILE", ["FILE"], cfg).run()
        got = {r["name"]: r for r in (json.loads(l) for l in open(out))}
        assert got["alice"]["bucket"] == "mid"
        assert got["bob"]["bucket"] == "junior"
        assert got["carol"]["bucket"] == "senior"
        assert all(r["known"] is True for r in got.values())

    def test_multi_sink_fanout(self, spark, tmp_path, capsys):
        src = tmp_path / "in.json"
        write_ndjson(src, ROWS)
        out = tmp_path / "out.json"
        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                f"FILE__DESTINATION_URI=file://{out}",
            ],
            environ={},
        )
        result = Pipeline(spark, "FILE", ["FILE", "IO"], cfg).run()
        assert result.sink_results["IO"] == 3
        printed = capsys.readouterr().out.splitlines()
        assert len([l for l in printed if l.startswith("{")]) == 3
        assert len([json.loads(l) for l in open(out)]) == 3

    def test_mc_pre_query_fanout(self, spark, tmp_path):
        """§3.2: pre-query rows parameterize the main query template."""
        spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 3)], "grp string, v long"
        ).createOrReplaceTempView("t_prequery")
        pre = tmp_path / "pre.sql"
        pre.write_text("SELECT DISTINCT grp FROM t_prequery")
        q = tmp_path / "q.sql"
        q.write_text("SELECT SUM(v) AS total FROM t_prequery WHERE grp = '[[ .grp ]]'")
        cfg = Config.from_env(
            env_args=[
                f"MC__PRE_QUERY_FILE_PATH={pre}",
                f"MC__QUERY_FILE_PATH={q}",
            ],
            environ={},
        )
        df = Pipeline(spark, "MC", ["IO"], cfg).dataframe()
        got = {r["grp"]: r["total"] for r in df.collect()}
        assert got == {"a": 3, "b": 3}

    def test_http_source_injected(self, spark, tmp_path):
        cfg = Config.from_env(environ={"HTTP__ENDPOINT": "http://x/api"})
        cfg.values["HTTP__FETCHER"] = lambda url: '{"a": 1}\n{"a": 2}\n'
        df = Pipeline(spark, "HTTP", ["IO"], cfg).dataframe()
        assert df.count() == 2

    def test_http_source_paged_datasource(self, spark, tmp_path):
        src = tmp_path / "api.ndjson"
        src.write_text("".join(f'{{"id": {i}}}\n' for i in range(10)))
        cfg = Config.from_env(
            environ={
                "HTTP__ENDPOINT": f"file://{src}",
                "HTTP__SCHEMA": "id BIGINT",
                "HTTP__PAGE_SIZE": "3",
                "HTTP__NUM_PAGES": "4",
            }
        )
        df = Pipeline(spark, "HTTP", ["IO"], cfg).dataframe()
        # per-page partitions fetched on executors
        assert df.rdd.getNumPartitions() == 4
        assert sorted(r["id"] for r in df.collect()) == list(range(10))

    def test_redis_sink_grouped_mset(self, spark, tmp_path):
        src = tmp_path / "in.json"
        write_ndjson(src, ROWS)
        # the sink runs on executors (separate processes) — capture MSET
        # calls through an append-only file, not driver memory
        capture = str(tmp_path / "msets.jsonl")

        class FakeRedis:
            def __init__(self, path=capture):
                self.path = path

            def mset(self, d):
                with open(self.path, "a") as f:
                    f.write(json.dumps(d) + "\n")

        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                "REDIS__RECORD_KEY=user:[[ .id ]]",
                "REDIS__RECORD_VALUE=[[ . | tojson ]]",
            ],
            environ={},
        )
        cfg.values["REDIS__CLIENT"] = FakeRedis
        Pipeline(spark, "FILE", ["REDIS"], cfg).run()
        merged = {
            k: v for l in open(capture) for k, v in json.loads(l).items()
        }
        assert set(merged) == {"user:1", "user:2", "user:3"}
        assert json.loads(merged["user:1"])["name"] == "alice"

    def test_smtp_sink_groups_by_compiled_email(self, spark, tmp_path):
        src = tmp_path / "in.json"
        write_ndjson(
            src,
            [
                {"team": "x", "v": 1},
                {"team": "x", "v": 2},
                {"team": "y", "v": 3},
            ],
        )
        sent: list[dict] = []
        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                "SMTP__ADDRESS_TO=[[ .team ]]@example.com",
                "SMTP__SUBJECT=report for [[ .team ]]",
            ],
            environ={},
        )
        cfg.values["SMTP__TRANSPORT"] = sent.append
        result = Pipeline(spark, "FILE", ["SMTP"], cfg).run()
        assert result.sink_results["SMTP"] == 2
        by_to = {e["to"]: e for e in sent}
        assert set(by_to) == {"x@example.com", "y@example.com"}
        x_rows = [json.loads(l) for l in by_to["x@example.com"]["attachment"].splitlines()]
        assert sorted(r["v"] for r in x_rows) == [1, 2]

    def test_http_sink_batches_per_endpoint(self, spark, tmp_path):
        src = tmp_path / "in.json"
        write_ndjson(src, [{"shard": i % 2, "v": i} for i in range(6)])
        capture = str(tmp_path / "posts.jsonl")

        def sender(m, e, h, b, path=capture):
            with open(path, "a") as f:
                f.write(json.dumps([m, e, len(json.loads(b))]) + "\n")

        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                "HTTP__ENDPOINT=http://svc/shard/[[ .shard ]]",
                "HTTP__METHOD=POST",
                "HTTP__BATCH_SIZE=512",
            ],
            environ={},
        )
        cfg.values["HTTP__SENDER"] = sender
        Pipeline(spark, "FILE", ["HTTP"], cfg).run()
        calls = sorted(tuple(json.loads(l)) for l in open(capture))
        assert calls == [
            ("POST", "http://svc/shard/0", 3),
            ("POST", "http://svc/shard/1", 3),
        ]

    def test_http_sink_per_record_method_headers(self, spark, tmp_path):
        """ext/http/sink.go:260-304: method and headers compile per
        record; distinct compiled configs land in distinct groups."""
        src = tmp_path / "in.json"
        write_ndjson(
            src,
            [
                {"op": "create", "id": 1, "tok": "abc"},
                {"op": "update", "id": 2, "tok": "abc"},
            ],
        )
        hdr = tmp_path / "headers.tmpl"
        hdr.write_text("Authorization: Bearer [[ .tok ]]\nX-Id: [[ .id ]]\n")
        capture = str(tmp_path / "posts.jsonl")

        def sender(m, e, h, b, path=capture):
            with open(path, "a") as f:
                f.write(json.dumps([m, e, h, json.loads(b)]) + "\n")

        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                "HTTP__ENDPOINT=http://svc/records",
                'HTTP__METHOD=[[ ternary "POST" "PUT" (eq .op "create") ]]',
                f"HTTP__HEADERS_FILE_PATH={hdr}",
            ],
            environ={},
        )
        cfg.values["HTTP__SENDER"] = sender
        Pipeline(spark, "FILE", ["HTTP"], cfg).run()
        calls = sorted(json.loads(l) for l in open(capture))
        assert len(calls) == 2
        post = next(c for c in calls if c[0] == "POST")
        put = next(c for c in calls if c[0] == "PUT")
        assert post[2] == {"Authorization": ["Bearer abc"], "X-Id": ["1"]}
        assert put[2] == {"Authorization": ["Bearer abc"], "X-Id": ["2"]}
        assert post[3]["op"] == "create" and put[3]["op"] == "update"

    def test_http_sink_body_template_modes(self, spark, tmp_path):
        """ext/http/sink.go:197-210: BATCH_SIZE=1 renders the body
        template against the single record map; >1 against the list."""
        src = tmp_path / "in.json"
        write_ndjson(src, [{"name": "a"}, {"name": "b"}])
        capture = str(tmp_path / "single.jsonl")

        def sender(m, e, h, b, path=capture):
            with open(path, "a") as f:
                f.write(json.dumps(b) + "\n")

        base = [
            f"FILE__SOURCE_URI=file://{src}",
            "HTTP__ENDPOINT=http://svc/x",
        ]
        # single-record mode: "." is the record map
        cfg = Config.from_env(
            env_args=base + ['HTTP__BODY={"payload": "[[ .name ]]"}'],
            environ={},
        )
        cfg.values["HTTP__SENDER"] = sender
        Pipeline(spark, "FILE", ["HTTP"], cfg).run()
        bodies = sorted(json.loads(l) for l in open(capture))
        assert bodies == ['{"payload": "a"}', '{"payload": "b"}']

        # batch mode: "." is the list of record maps
        capture2 = str(tmp_path / "batch.jsonl")

        def sender2(m, e, h, b, path=capture2):
            with open(path, "a") as f:
                f.write(json.dumps(b) + "\n")

        cfg2 = Config.from_env(
            env_args=base
            + ["HTTP__BODY=[[ . | tojson ]]", "HTTP__BATCH_SIZE=16"],
            environ={},
        )
        cfg2.values["HTTP__SENDER"] = sender2
        Pipeline(spark, "FILE", ["HTTP"], cfg2).run()
        (body,) = [json.loads(l) for l in open(capture2)]
        assert sorted(json.loads(body), key=lambda r: r["name"]) == [
            {"name": "a"},
            {"name": "b"},
        ]

    def test_kafka_sink_injected_producer(self, spark, tmp_path):
        src = tmp_path / "in.json"
        write_ndjson(src, ROWS)
        produced: list[tuple] = []
        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                "KAFKA__TOPIC=events",
            ],
            environ={},
        )
        cfg.values["KAFKA__PRODUCER"] = lambda topic, v: produced.append((topic, v))
        Pipeline(spark, "FILE", ["KAFKA"], cfg).run()
        assert len(produced) == 3
        assert all(t == "events" for t, _ in produced)
        assert all("__METADATA__" not in v for _, v in produced)

    def test_unknown_component(self, spark):
        with pytest.raises(UnknownComponent):
            Pipeline(spark, "NOPE", ["IO"], Config.from_env(environ={}))


class TestWarehouseSink:
    def test_append_replace_with_coercion(self, spark, tmp_path):
        spark.sql("DROP TABLE IF EXISTS wh_dest")
        spark.sql(
            "CREATE TABLE wh_dest (id BIGINT, ts TIMESTAMP, amount DECIMAL(18,4)) USING parquet"
        )
        # in-flight record: decimal as string, timestamp as string
        df = spark.createDataFrame(
            [("1", "2024-05-01 10:20:30", "12345.6789"),
             ("2", "2024-05-01T10:20:30Z", ""),],
            "ID string, TS string, Amount string",  # mixed-case names
        )
        from optimus_any2any_spark.sinks.warehouse import write_table

        write_table(df, "wh_dest", "REPLACE")
        got = {r["id"]: r for r in spark.table("wh_dest").collect()}
        assert str(got[1]["amount"]) == "12345.6789"
        assert got[2]["amount"] is None  # empty string → NULL
        assert got[1]["ts"].year == 2024
        write_table(df.limit(1), "wh_dest", "APPEND")
        assert spark.table("wh_dest").count() == 3
        spark.sql("DROP TABLE wh_dest")


class TestTransportRetry:
    """Every transport flush retries with backoff
    (common/common.go:294-315; RETRY_MAX / RETRY_BACKOFF_MS)."""

    def test_smtp_transport_retries_until_success(self, spark, tmp_path):
        src = tmp_path / "in.json"
        write_ndjson(src, [{"a": 1}])
        attempts = []

        def flaky(email):
            attempts.append(1)
            if len(attempts) < 3:
                raise ConnectionError("boom")

        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                "SMTP__ADDRESS_TO=x@example.com",
                "RETRY_MAX=3",
                "RETRY_BACKOFF_MS=1",
            ],
            environ={},
        )
        cfg.values["SMTP__TRANSPORT"] = flaky
        Pipeline(spark, "FILE", ["SMTP"], cfg).run()
        assert len(attempts) == 3

    def test_smtp_transport_exhausted_raises(self, spark, tmp_path):
        src = tmp_path / "in.json"
        write_ndjson(src, [{"a": 1}])

        def always_fail(email):
            raise ConnectionError("down")

        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                "SMTP__ADDRESS_TO=x@example.com",
                "RETRY_MAX=2",
                "RETRY_BACKOFF_MS=1",
            ],
            environ={},
        )
        cfg.values["SMTP__TRANSPORT"] = always_fail
        import pytest as _pytest

        with _pytest.raises(ConnectionError):
            Pipeline(spark, "FILE", ["SMTP"], cfg).run()

    def test_http_sender_retries_on_executor(self, spark, tmp_path):
        src = tmp_path / "in.json"
        write_ndjson(src, [{"a": 1}])
        # executor-side state must go through the filesystem
        marker = str(tmp_path / "attempts")

        def flaky_sender(m, e, h, b, path=marker):
            with open(path, "a") as f:
                f.write("x")
            if len(open(path).read()) < 3:
                raise ConnectionError("boom")

        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                "HTTP__ENDPOINT=http://svc/x",
                "RETRY_MAX=3",
                "RETRY_BACKOFF_MS=1",
            ],
            environ={},
        )
        cfg.values["HTTP__SENDER"] = flaky_sender
        Pipeline(spark, "FILE", ["HTTP"], cfg).run()
        assert len(open(marker).read()) == 3


class TestSmtpStorageModes:
    """ext/smtp/sink.go:246-346: OSS presign mode and bodyNoRecord."""

    def test_oss_presign_links_in_body(self, spark, tmp_path):
        src = tmp_path / "in.json"
        write_ndjson(src, [{"team": "x", "v": 1}, {"team": "x", "v": 2}])
        sent: list[dict] = []
        uploads: dict[str, str] = {}

        class FakeOss:
            def put(self, uri, data):
                uploads[uri] = data

            def presign(self, uri, expiration_s):
                assert expiration_s == 604800
                return f"https://signed.example.com/{uri}?sig=abc"

        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                "SMTP__ADDRESS_TO=[[ .team ]]@example.com",
                "SMTP__SUBJECT=report",
                "SMTP__BODY=Hi,<ul>[[ range .Attachments ]]<li><a href="
                '"[[ .URI ]]">[[ .Filename ]]</a></li>[[ end ]]</ul>Bye',
                "SMTP__ATTACHMENT_FILENAME=report_[[ .team ]].json",
                "SMTP__STORAGE_MODE=oss",
                "SMTP__STORAGE_DESTINATION_DIR=oss://bucket/reports",
            ],
            environ={},
        )
        cfg.values["SMTP__TRANSPORT"] = sent.append
        cfg.values["SMTP__OSS_CLIENT"] = FakeOss()
        Pipeline(spark, "FILE", ["SMTP"], cfg).run()

        assert len(sent) == 1
        (email,) = sent
        # attachment content went to OSS, not the email
        assert email["attachments"] == {} and email["attachment"] == ""
        uri = "oss://bucket/reports/report_x.json"
        assert sorted(
            json.loads(l)["v"] for l in uploads[uri].splitlines()
        ) == [1, 2]
        # the range block rendered once per link and spliced into place
        assert email["body"] == (
            "Hi,<ul><li><a href="
            '"https://signed.example.com/oss://bucket/reports/report_x.json'
            '?sig=abc">report_x.json</a></li></ul>Bye'
        )

    def test_body_no_record_on_empty_stream(self, spark, tmp_path):
        src = tmp_path / "empty.json"
        src.write_text("")
        sent: list[dict] = []
        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                "SMTP__ADDRESS_TO=ops@example.com",
                "SMTP__SUBJECT=daily report",
                "SMTP__BODY=see attachment",
                "SMTP__BODY_NO_RECORD=no records today",
            ],
            environ={},
        )
        cfg.values["SMTP__TRANSPORT"] = sent.append
        result = Pipeline(spark, "FILE", ["SMTP"], cfg).run()
        assert result.sink_results["SMTP"] == 1
        (email,) = sent
        assert email["body"] == "no records today"
        assert email["to"] == "ops@example.com"
        assert email["attachments"] == {}

    def test_empty_stream_without_body_no_record_sends_nothing(
        self, spark, tmp_path
    ):
        src = tmp_path / "empty.json"
        src.write_text("")
        sent: list[dict] = []
        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                "SMTP__ADDRESS_TO=ops@example.com",
            ],
            environ={},
        )
        cfg.values["SMTP__TRANSPORT"] = sent.append
        result = Pipeline(spark, "FILE", ["SMTP"], cfg).run()
        assert result.sink_results["SMTP"] == 0 and sent == []

    def test_per_record_attachment_split(self, spark, tmp_path):
        """Distinct compiled attachment filenames within one email group
        become separate attachments (sink.go:246-257)."""
        src = tmp_path / "in.json"
        write_ndjson(
            src, [{"day": "mon", "v": 1}, {"day": "tue", "v": 2}]
        )
        sent: list[dict] = []
        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                "SMTP__ADDRESS_TO=ops@example.com",
                "SMTP__ATTACHMENT_FILENAME=[[ .day ]].json",
            ],
            environ={},
        )
        cfg.values["SMTP__TRANSPORT"] = sent.append
        Pipeline(spark, "FILE", ["SMTP"], cfg).run()
        (email,) = sent
        assert set(email["attachments"]) == {"mon.json", "tue.json"}
        assert json.loads(email["attachments"]["mon.json"])["v"] == 1


class TestApiSourcePipelines:
    """End-to-end Pipeline runs over the round-3 API sources: the
    decode chains feed the normal source → JQ → sink flow."""

    def test_gmail_to_file_with_jq(self, spark, tmp_path):
        import base64

        class Store:
            def list(self, query):
                return ["m1"]

            def get(self, msg_id):
                return {
                    "parts": [
                        {"filename": "rows.csv", "attachment_id": "a1"}
                    ]
                }

            def get_attachment(self, msg_id, attachment_id):
                return base64.urlsafe_b64encode(
                    b"id,grade\r\n1,good\r\n2,bad\r\n3,good\r\n"
                ).decode()

        out = tmp_path / "out.json"
        cfg = Config.from_env(
            env_args=[
                f"FILE__DESTINATION_URI=file://{out}",
                'JQ__QUERY=.[] | select(.grade == "good")',
            ],
            environ={},
        )
        cfg.values["GMAIL__SERVICE"] = Store()
        Pipeline(spark, "GMAIL", ["FILE"], cfg).run()
        rows = [json.loads(l) for l in open(out)]
        assert {r["id"] for r in rows} == {"1", "3"}  # csv values: strings
        # sinks strip metadata columns (reference: RecordWithoutMetadata)
        assert all("__METADATA__filename" not in r for r in rows)

    def test_ga_to_file(self, spark, tmp_path):
        class Client:
            def run_report(self, req):
                return {
                    "rowCount": 2,
                    "dimensionHeaders": [{"name": "country"}],
                    "metricHeaders": [{"name": "sessions"}],
                    "rows": [
                        {
                            "dimensionValues": [{"value": "ID"}],
                            "metricValues": [{"value": "7"}],
                        },
                        {
                            "dimensionValues": [{"value": "SG"}],
                            "metricValues": [{"value": "3"}],
                        },
                    ][req["offset"] : req["offset"] + req["limit"]],
                }

        out = tmp_path / "out.json"
        cfg = Config.from_env(
            env_args=[
                f"FILE__DESTINATION_URI=file://{out}",
                "GA__PROPERTY_ID=1",
                "GA__START_DATE=2024-01-01",
                "GA__END_DATE=2024-01-31",
                "GA__DIMENSIONS=country",
                "GA__METRICS=sessions",
            ],
            environ={},
        )
        cfg.values["GA__CLIENT"] = Client()
        Pipeline(spark, "GA", ["FILE"], cfg).run()
        rows = sorted(
            (json.loads(l) for l in open(out)), key=lambda r: r["country"]
        )
        assert [(r["country"], r["sessions"]) for r in rows] == [
            ("ID", "7"),
            ("SG", "3"),
        ]


class TestJqMathPipeline:
    def test_libm_and_pow_native_end_to_end(self, spark, tmp_path):
        """Round-4 jq natives (sqrt/pow with jq's NaN->null edge) run
        natively through the full FILE->JQ->FILE pipeline and match
        the jq binary's values, including the negative-input null."""
        import subprocess

        from optimus_any2any_spark.compiler.jq import translate_jq

        rows = [
            {"id": 1, "x": 16},
            {"id": 2, "x": -4},   # sqrt -> null in jq 1.6
            {"id": 3, "x": 2},
        ]
        src = tmp_path / "in.json"
        write_ndjson(src, rows)
        out = tmp_path / "out.json"
        program = ".[] | {id: .id, r: (.x | sqrt), p: pow(.x; 2)}"
        cfg = Config.from_env(
            env_args=[
                f"FILE__SOURCE_URI=file://{src}",
                f"FILE__DESTINATION_URI=file://{out}",
                f"JQ__QUERY={program}",
            ],
            environ={},
        )
        translate_jq(
            spark.createDataFrame(rows, "id long, x long"), program
        )  # native path accepts it
        Pipeline(spark, "FILE", ["FILE"], cfg).run()
        got = {r["id"]: r for r in (json.loads(l) for l in open(out))}
        want_raw = subprocess.run(
            ["jq", "-c", program],
            input=json.dumps(rows).encode(),
            stdout=subprocess.PIPE,
            check=True,
        ).stdout.decode()
        want = {r["id"]: r for r in map(json.loads, want_raw.splitlines())}
        for i in want:
            assert got[i].get("r") == want[i].get("r"), (got[i], want[i])
            assert got[i].get("p") == want[i].get("p"), (got[i], want[i])
