"""Source builders: config → DataFrame (SURVEY.md §2.1 inventory).

Each builder reproduces one reference source's semantics. Network-backed
sources (HTTP/Salesforce/GA/Gmail) take injectable fetchers so the
Spark-side plumbing is testable without live services; warehouse sources
run real SQL on the session catalog (the reference delegates SQL
verbatim to MaxCompute/PG — here Catalyst IS the warehouse).
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from optimus_any2any_spark import metadata as M
from optimus_any2any_spark.config import Config, parse_rune
from optimus_any2any_spark.pipeline import register_source
from optimus_any2any_spark.sources.file import FileSource


@register_source("FILE")
def file_source(spark: SparkSession, cfg: Config) -> DataFrame:
    """NDJSON/CSV file source (ext/file/source.go:28)."""
    c = cfg.for_component("FILE")
    return FileSource(
        spark,
        c["source_uri"],
        skip_header=c.get(
            "skip_header", c.get("csv_skip_header", "false")
        ).lower() == "true",
        skip_rows=int(c.get("skip_rows", c.get("csv_skip_rows", "0")) or 0),
        delimiter=parse_rune(c.get("csv_delimiter")),
    ).read()


@register_source("OSS")
@register_source("S3")
def object_store_source(spark: SparkSession, cfg: Config) -> DataFrame:
    """OSS/S3 source (ext/oss/source.go:35): same file semantics over an
    object-store URI via the Hadoop connector. Credentials map to
    Hadoop conf (fs.oss.* / fs.s3a.*); per-extension decode matches the
    FILE source."""
    comp = "OSS" if cfg.get("OSS__SOURCE_URI") else "S3"
    c = cfg.for_component(comp)
    for k, v in c.items():
        if k.startswith("hadoop."):
            spark.sparkContext._jsc.hadoopConfiguration().set(k[len("hadoop."):], v)
    return FileSource(
        spark,
        c["source_uri"],
        skip_header=c.get(
            "skip_header", c.get("csv_skip_header", "false")
        ).lower() == "true",
        skip_rows=int(c.get("skip_rows", c.get("csv_skip_rows", "0")) or 0),
        delimiter=parse_rune(c.get("csv_delimiter")),
    ).read()


@register_source("MC")
def warehouse_source(spark: SparkSession, cfg: Config) -> DataFrame:
    """Warehouse SQL source (ext/maxcompute/source.go:39): executes the
    query file against the session catalog, with the reference's
    pre-query fan-out — pre-query rows parameterize the main query
    template per-row, results union (source.go:163-244).

    ``MC__PRE_QUERY_FILE_PATH`` → collected rows; each row renders
    ``MC__QUERY_FILE_PATH``'s ``[[ .field ]]`` template; results are
    unioned with pre-record fields merged in (source.go:226-232).

    Script mode: a query containing multiple ``;``-terminated statements
    decomposes into SET headers / ``@var`` + UDF declarations / DROPs /
    body (query_helper.go:91-208) and executes statement-by-statement
    against the catalog (:mod:`..compiler.mc_script`). A query
    *directory* fans out to every file inside, with the file's basename
    in ``MC__FILENAME_COLUMN`` (source.go:299-320, :234).
    """
    import re as _re

    c = cfg.for_component("MC")
    fname_col = c.get("filename_column", M.FILENAME)

    # MC__EXECUTION_PROJECT ≙ the session's current database
    # (source.go:39); MC__ADDITIONAL_HINTS ("k:v,k2:v2" — caarlos0/env
    # map syntax) merge into every query's hints (source.go:82). The
    # reference scopes both PER SOURCE INSTANCE (its odps client is
    # per-component), so the session-global database/conf writes are
    # saved and restored after the queries are built — they must not
    # leak into later components sharing the SparkSession. Hints go
    # through conf.set (no SQL string interpolation) with validated
    # keys.
    prev_db: str | None = None
    prev_confs: dict[str, str | None] = {}
    if c.get("execution_project"):
        prev_db = spark.catalog.currentDatabase()
        spark.catalog.setCurrentDatabase(c["execution_project"])
    for hint in (c.get("additional_hints") or "").split(","):
        if not hint.strip():
            continue
        k, _sep, v = hint.partition(":")
        k = k.strip()
        if not _re.fullmatch(r"[A-Za-z_][\w.\-]*", k):
            raise ValueError(f"MC__ADDITIONAL_HINTS: invalid hint key {k!r}")
        try:
            prev_confs[k] = spark.conf.get(k)
        except Exception:
            prev_confs[k] = None
        spark.conf.set(k, v.strip())

    try:
        return _warehouse_source_queries(spark, c, fname_col)
    finally:
        if prev_db is not None:
            spark.catalog.setCurrentDatabase(prev_db)
        for k, v in prev_confs.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)


def _warehouse_source_queries(spark, c, fname_col) -> DataFrame:
    import os

    from optimus_any2any_spark.compiler.mc_script import run_script
    from optimus_any2any_spark.compiler.template import compile_template

    # filename → raw query text (getRawQueries, source.go:299-320).
    raw_queries: dict[str, str] = {}
    if c.get("query"):
        raw_queries[""] = c["query"]
    elif c.get("query_file_path"):
        qpath = c["query_file_path"]
        if os.path.isdir(qpath):
            for entry in sorted(os.listdir(qpath)):
                p = os.path.join(qpath, entry)
                if os.path.isfile(p):
                    raw_queries[entry] = open(p).read()
        else:
            raw_queries[os.path.basename(qpath)] = open(qpath).read()
    if not raw_queries:
        raise ValueError("MC source requires MC__QUERY or MC__QUERY_FILE_PATH")

    pre_sql = c.get("pre_query")
    if not pre_sql and c.get("pre_query_file_path"):
        pre_sql = open(c["pre_query_file_path"]).read()

    if pre_sql:
        pre_rows = [r.asDict() for r in spark.sql(pre_sql).collect()]
        if not pre_rows:
            pre_rows = [{}]  # empty pre-query yields one empty record
            # (client_reader.go:76-79)
    else:
        pre_rows = [{}]

    def run(sql: str) -> DataFrame:
        # Scripts go through script mode — same trigger as the reference
        # (client_reader.go:72-74 sets submit.mode=script on ';').
        if ";" in sql:
            return run_script(spark, sql)
        return spark.sql(sql)

    parts: list[DataFrame] = []
    for row in pre_rows:
        for filename, raw in raw_queries.items():
            tmpl = compile_template(raw)
            part = run(tmpl.render(row) if row else raw)
            for k, v in row.items():  # merge pre-record fields into each row
                if k not in part.columns:
                    part = part.withColumn(k, F.lit(v))
            if filename:
                part = part.withColumn(fname_col, F.lit(filename))
            parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


@register_source("PSQL")
def jdbc_source(spark: SparkSession, cfg: Config) -> DataFrame:
    """PostgreSQL source (ext/postgresql/source.go:34): SQL over JDBC.
    Partitioned scans via PSQL__PARTITION_COLUMN / NUM_PARTITIONS.

    PSQL__PG_TYPES (JSON ``{"col": "uuid", ...}``, udt_name per
    column) applies the reference's ``normalizePGValue`` matrix
    (source.go:150-191) as a post-projection so UUID/BYTEA/TIME/
    INTERVAL/XML/MACADDR reach records in the reference's string
    forms — Spark's JDBC reader hides wire OIDs, so the map is
    explicit config (from ``information_schema.columns``)."""
    from optimus_any2any_spark.sources import pg

    c = cfg.for_component("PSQL")
    sql = c.get("query")
    if not sql and c.get("query_file_path"):
        sql = open(c["query_file_path"]).read()
    reader = (
        spark.read.format("jdbc")
        .option("url", c["connection_dsn"])
        .option("query", sql)
    )
    if c.get("partition_column"):
        reader = (
            reader.option("partitionColumn", c["partition_column"])
            .option("numPartitions", c.get("num_partitions", "8"))
            .option("lowerBound", c.get("lower_bound", "0"))
            .option("upperBound", c.get("upper_bound", "1000000"))
        )
    out = reader.load()
    if c.get("pg_types"):
        out = pg.normalize_pg_frame(out, json.loads(c["pg_types"]))
    return out


@register_source("HTTP")
def http_source(spark: SparkSession, cfg: Config) -> DataFrame:
    """HTTP source (ext/http/source.go:28): GET an endpoint, parse the
    response as NDJSON records. The fetch is driver-side (the reference
    has no pagination either — source.go:104-106 TODO); records then
    parallelize into a DataFrame. ``fetcher`` injectable for tests via
    HTTP__FETCHER in config values (callable taking ``url`` or
    ``(url, headers)``).

    Request headers come from HTTP__HEADERS_FILE_PATH ('Key: v1,v2'
    lines — source.go:33-47; HTTP__HEADERS carries the same content
    inline). With the four HTTP__CLIENT_CREDENTIALS_* values set, the
    OAuth2 client-credentials flow (ext/http/source.go:53-60,
    custom_provider_a) acquires a Bearer token and injects the
    Authorization header on every request; the token endpoint is
    injectable via HTTP__TOKEN_TRANSPORT (or a file:// token URL)."""
    from optimus_any2any_spark.sources import oauth2

    c = cfg.for_component("HTTP")
    fetcher = cfg.values.get("HTTP__FETCHER")
    endpoint = c.get("endpoint", "")
    header_content = c.get("headers", "")
    if not header_content and c.get("headers_file_path"):
        with open(c["headers_file_path"], "r", encoding="utf-8") as f:
            header_content = f.read()
    headers = oauth2.parse_headers(header_content)
    creds = oauth2.from_component_config(
        c, transport=cfg.values.get("HTTP__TOKEN_TRANSPORT")
    )
    if creds is not None:
        headers.update(creds.auth_header())
    # paged mode: HTTP__PAGE_SIZE (+ optional HTTP__NUM_PAGES and
    # required HTTP__SCHEMA) routes through the Spark 4 Python
    # DataSource — pages fetched ON EXECUTORS in parallel, the upgrade
    # over the reference's unpaginated driver-side GET
    # (ext/http/source.go:104-106 TODO). The Bearer token is acquired
    # once on the driver and shipped in the plan, so executors never
    # hold client secrets.
    if c.get("page_size") and fetcher is None:
        from optimus_any2any_spark.sources import paged_api

        paged_api.register(spark)
        return (
            spark.read.format("paged_api")
            .schema(c["schema"])
            .option("url", endpoint)
            .option("page_size", c["page_size"])
            .option("num_pages", c.get("num_pages", "8"))
            .option("headers", json.dumps(headers))
            .load()
        )
    if fetcher is None:
        import urllib.request

        def fetcher(url: str, hdrs: dict[str, str] | None = None) -> str:
            req = urllib.request.Request(url, headers=hdrs or {})
            with urllib.request.urlopen(req) as resp:  # noqa: S310
                return resp.read().decode()

    # arity detection up front: wrapping the CALL in try/except
    # TypeError would swallow TypeErrors raised inside the fetcher
    # and re-issue the request against a possibly non-idempotent
    # endpoint
    import inspect

    try:
        n_params = len(inspect.signature(fetcher).parameters)
    except (TypeError, ValueError):  # builtins/C callables
        n_params = 2
    if n_params >= 2:
        body = fetcher(endpoint, headers)
    else:
        # legacy single-arg fetcher seam (pre-OAuth2)
        body = fetcher(endpoint)
    lines = [ln for ln in body.splitlines() if ln.strip()]
    if not lines:
        return spark.range(0).drop("id")
    return spark.read.json(spark.sparkContext.parallelize(lines))


@register_source("IO")
def stdin_source(spark: SparkSession, cfg: Config) -> DataFrame:
    """Stdin NDJSON source — declared but unimplemented in the reference
    (internal/component/component.go:131 'unknown source'); provided
    here for completeness."""
    import sys

    lines = [ln for ln in sys.stdin.read().splitlines() if ln.strip()]
    if not lines:
        return spark.range(0).drop("id")
    return spark.read.json(spark.sparkContext.parallelize(lines))


@register_source("SF")
def salesforce_source(spark: SparkSession, cfg: Config) -> DataFrame:
    """Salesforce source (ext/salesforce/source.go:64-151): SOQL query,
    then the NextRecordsURL token chain — one sequential discovery
    request, remaining pages fetched concurrently (here: one Spark
    partition per computed page URL via the ``sf_chain`` DataSource).

    With SF__USER/SF__PASS (+ optional SF__TOKEN) set, the reference's
    SOAP partner login runs first (ext/salesforce/client.go:29-38,
    simpleforce LoginPassword: password+token concatenated, sessionId
    from the response envelope) and every REST page carries
    ``Authorization: Bearer <sessionId>``; the query endpoint derives
    from SF__HOST + SF__API_VERSION, with SF__INCLUDE_DELETED
    switching query→queryAll (source.go:67). Without credentials,
    SF__HOST is used verbatim (file:// = offline protocol fake).
    SF__SCHEMA is required (no live describe call in this
    environment). Falls back to the injectable SF__FETCHER stub
    without a host."""
    c = cfg.for_component("SF")
    if c.get("host"):
        from optimus_any2any_spark.sources import paged_api, sf_auth

        paged_api.register(spark)
        soql = c.get("soql", "")
        if not soql and c.get("soql_file_path"):
            soql = open(c["soql_file_path"]).read()
        headers: dict[str, str] = {}
        url = c["host"]
        if c.get("user"):
            session_id = sf_auth.soap_login(
                c["host"],
                c["user"],
                c.get("pass", ""),
                c.get("token", ""),
                api_version=c.get("api_version", sf_auth.DEFAULT_API_VERSION),
                transport=cfg.values.get("SF__LOGIN_TRANSPORT"),
            )
            headers["Authorization"] = f"Bearer {session_id}"
            url = sf_auth.query_url(
                c["host"],
                api_version=c.get("api_version", sf_auth.DEFAULT_API_VERSION),
                include_deleted=c.get("include_deleted", "").lower()
                in ("1", "true", "yes"),
            )
        return (
            spark.read.format("sf_chain")
            .schema(c["schema"])
            .option("url", url)
            .option("soql", soql)
            .option("headers", json.dumps(headers))
            .load()
        )
    fetch = cfg.values.get("SF__FETCHER")
    if fetch is not None:
        return spark.createDataFrame(fetch())
    raise NotImplementedError(
        "SF source requires SF__HOST (live or file:// protocol fake) or an "
        "injected SF__FETCHER returning records"
    )


@register_source("GMAIL")
def gmail_source(spark: SparkSession, cfg: Config) -> DataFrame:
    """Gmail source (ext/gmail/source.go:64-155): list messages by
    GMAIL__FILTER, fetch each part's attachment, base64url-decode,
    normalize line endings, convert csv/tsv to string-valued records
    (first row = header) or read NDJSON, and stamp the attachment
    filename into GMAIL__FILENAME_COLUMN. The decode chain is real
    (sources/gmail.py); only the transport is injectable — pass
    GMAIL__SERVICE implementing list/get/get_attachment (a live Google
    client is unavailable in this environment). The legacy
    GMAIL__FETCHER seam (pre-finished records) still works."""
    from optimus_any2any_spark.sources import gmail as G

    c = cfg.for_component("GMAIL")
    service = cfg.values.get("GMAIL__SERVICE")
    if service is None:
        fetch = cfg.values.get("GMAIL__FETCHER")
        if fetch is not None:
            return spark.createDataFrame(fetch())
        raise NotImplementedError(
            "GMAIL source requires a Gmail API client; inject "
            "GMAIL__SERVICE (list/get/get_attachment) to run the decode "
            "chain, or GMAIL__FETCHER returning records"
        )
    records = G.gmail_records(
        service,
        query=c.get("filter", ""),
        filename_column=c.get("filename_column", "__METADATA__filename"),
        csv_delimiter=parse_rune(c.get("csv_delimiter")) or ",",
    )
    if not records:
        return spark.range(0).drop("id")
    return spark.read.json(
        spark.sparkContext.parallelize([json.dumps(r) for r in records])
    )


def ga_records(client, property_id: str, start_date: str, end_date: str,
               dimensions: list[str], metrics: list[str],
               batch_size: int = 1000) -> list[dict]:
    """Google Analytics RunReport paging loop
    (ext/googleanalytics/source.go:55-105): limit/offset cursor,
    rowCount captured from the FIRST response only, each row zipped
    into {dimensionHeader: value, metricHeader: value} records — every
    value a string, exactly the Data API's GetValue() shape.

    ``client.run_report(request) -> response`` where request is a dict
    with property/dateRanges/dimensions/metrics/limit/offset and the
    response carries rowCount, dimensionHeaders, metricHeaders, rows
    (each with dimensionValues/metricValues) — the RunReport JSON
    wire shape, injectable offline."""
    out: list[dict] = []
    row_count = -1
    offset = 0
    while row_count < 0 or offset < row_count:
        resp = client.run_report(
            {
                "property": f"properties/{property_id}",
                "dateRanges": [{"startDate": start_date, "endDate": end_date}],
                "dimensions": [{"name": d} for d in dimensions],
                "metrics": [{"name": m} for m in metrics],
                "limit": batch_size,
                "offset": offset,
            }
        )
        if row_count < 0:
            row_count = int(resp.get("rowCount", 0))
        dim_headers = [h["name"] for h in resp.get("dimensionHeaders", [])]
        met_headers = [h["name"] for h in resp.get("metricHeaders", [])]
        for row in resp.get("rows", []):
            rec: dict = {}
            for name, v in zip(dim_headers, row.get("dimensionValues", [])):
                rec[name] = v.get("value")
            for name, v in zip(met_headers, row.get("metricValues", [])):
                rec[name] = v.get("value")
            out.append(rec)
        offset += batch_size
    return out


@register_source("GA")
def ga_source(spark: SparkSession, cfg: Config) -> DataFrame:
    """Google Analytics source (ext/googleanalytics/source.go:55-105):
    the RunReport limit/offset loop with header-zipped records is real
    (:func:`ga_records`); only the API client is injectable
    (GA__CLIENT with .run_report — no live Google service here). The
    legacy GA__FETCHER seam (finished records) still works."""
    c = cfg.for_component("GA")
    client = cfg.values.get("GA__CLIENT")
    if client is None:
        fetch = cfg.values.get("GA__FETCHER")
        if fetch is not None:
            return spark.createDataFrame(fetch())
        raise NotImplementedError(
            "GA source requires a Data API client; inject GA__CLIENT "
            "(run_report) to exercise the paging/record chain, or "
            "GA__FETCHER returning records"
        )
    records = ga_records(
        client,
        property_id=c.get("property_id", ""),
        start_date=c.get("start_date", ""),
        end_date=c.get("end_date", ""),
        dimensions=[d for d in c.get("dimensions", "").split(",") if d],
        metrics=[m for m in c.get("metrics", "").split(",") if m],
        batch_size=int(c.get("batch_size", "1000")),
    )
    if not records:
        return spark.range(0).drop("id")
    return spark.read.json(
        spark.sparkContext.parallelize([json.dumps(r) for r in records])
    )


@register_source("DELTA")
def delta_source(spark: SparkSession, cfg: Config) -> DataFrame:
    """Beyond-reference lakehouse source: current-snapshot read of a
    Delta Lake table via the open log protocol (sources/delta.py —
    no delta-spark jar). ``DELTA__SOURCE_URI=file:///path/to/table``."""
    from optimus_any2any_spark.sources.delta import read_delta

    uri = cfg.get("DELTA__SOURCE_URI")
    if not uri:
        raise ValueError("DELTA source requires DELTA__SOURCE_URI")
    path = uri[len("file://"):] if uri.startswith("file://") else uri
    if (cfg.get("DELTA__HISTORY") or "").lower() == "true":
        # DESCRIBE HISTORY as a source: version / resolved timestamp /
        # commitInfo operation+parameters+engine per commit
        from optimus_any2any_spark.sources.delta import delta_history

        return delta_history(spark, path)
    if (cfg.get("DELTA__ROW_TRACKING") or "").lower() == "true":
        # ROW TRACKING read: _row_id / _row_commit_version appended
        # (the ICEBERG__ROW_LINEAGE twin)
        from optimus_any2any_spark.sources.delta import (
            read_delta_row_tracking,
        )

        return read_delta_row_tracking(spark, path)
    cdf_from = cfg.get("DELTA__CDF_FROM")
    app_from = cfg.get("DELTA__APPENDS_FROM")
    if cdf_from is not None or app_from is not None:
        # incremental batch consumption through the CLI: the version
        # range (FROM exclusive, TO inclusive; TO defaults to head)
        from optimus_any2any_spark.sources.delta import (
            read_delta_appends,
            read_delta_cdf,
            replay_log,
        )

        to = cfg.get("DELTA__VERSION_TO")
        to_v = int(to) if to else replay_log(spark, path)["version"]
        if cdf_from is not None:
            return read_delta_cdf(spark, path, int(cdf_from), to_v)
        return read_delta_appends(spark, path, int(app_from), to_v)
    version = cfg.get("DELTA__VERSION_AS_OF")
    ts = cfg.get("DELTA__TIMESTAMP_AS_OF")
    if version and ts:
        raise ValueError(
            "DELTA source: VERSION_AS_OF and TIMESTAMP_AS_OF are "
            "mutually exclusive"
        )
    if ts:
        # ISO-8601 string or epoch millis — what users actually type
        return read_delta(
            spark, path,
            timestamp=int(ts) if ts.lstrip("-").isdigit() else ts,
        )
    return read_delta(
        spark, path, version=int(version) if version else None
    )


@register_source("ICEBERG")
def iceberg_source(spark: SparkSession, cfg: Config) -> DataFrame:
    """Beyond-reference lakehouse source: snapshot read of an Apache
    Iceberg table via the open spec (sources/iceberg.py — metadata
    JSON + Avro manifests, no iceberg-spark jar).
    ``ICEBERG__SOURCE_URI=file:///path/to/table``; optional
    ``ICEBERG__SNAPSHOT_ID`` time-travels, or
    ``ICEBERG__AS_OF_TIMESTAMP`` (epoch-ms or ISO string) resolves
    TIMESTAMP AS OF through the snapshot log, ``ICEBERG__REF`` reads
    a named tag or branch, and ``ICEBERG__METADATA_TABLE`` (snapshots /
    history / refs / manifests / files) reads the inspection surface
    instead of the data. ``ICEBERG__CHANGES=true`` (with optional
    ``ICEBERG__CHANGES_FROM`` / ``ICEBERG__CHANGES_TO`` snapshot ids)
    reads the CHANGELOG instead — per-snapshot INSERT/DELETE rows
    from the manifest diff, the Delta CDF twin."""
    from optimus_any2any_spark.sources.iceberg import read_iceberg

    uri = cfg.get("ICEBERG__SOURCE_URI")
    if not uri:
        raise ValueError("ICEBERG source requires ICEBERG__SOURCE_URI")
    path = uri[len("file://"):] if uri.startswith("file://") else uri
    mt = cfg.get("ICEBERG__METADATA_TABLE")
    if mt:
        from optimus_any2any_spark.sources.iceberg import (
            read_iceberg_metadata,
        )

        return read_iceberg_metadata(spark, path, mt.strip().lower())
    if (cfg.get("ICEBERG__CHANGES") or "").lower() == "true":
        from optimus_any2any_spark.sources.iceberg import (
            read_iceberg_changes,
        )

        cf = cfg.get("ICEBERG__CHANGES_FROM")
        ct = cfg.get("ICEBERG__CHANGES_TO")
        return read_iceberg_changes(
            spark, path,
            from_snapshot_id=int(cf) if cf else None,
            to_snapshot_id=int(ct) if ct else None,
        )
    snap = cfg.get("ICEBERG__SNAPSHOT_ID")
    ts = cfg.get("ICEBERG__AS_OF_TIMESTAMP")
    if ts is not None and str(ts).lstrip("-").isdigit():
        ts = int(ts)
    return read_iceberg(
        spark, path, snapshot_id=int(snap) if snap else None,
        as_of_timestamp=ts, ref=cfg.get("ICEBERG__REF"),
        # ICEBERG__ROW_LINEAGE=true: append _row_id /
        # _last_updated_sequence_number (v3 row lineage)
        row_lineage=(
            (cfg.get("ICEBERG__ROW_LINEAGE") or "").lower() == "true"
        ),
    )
