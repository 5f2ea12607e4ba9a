"""Pipeline assembly: the reference's component model on Spark.

One CLI invocation = one pipeline: ``--from=<SOURCE> --to=<SINK>
[--to=<SINK2>...]`` configured via ``<COMPONENT>__<KEY>`` env vars
(reference: main.go:20-24; any2any.go:63-84; registry
internal/component/component.go:61-268). Dataflow (docs/rfc_001):

    Source → Connector (JQ transform) → fan-out to N sinks

Spark shape: source builds a DataFrame, the JQ connector compiles to
DataFrame ops (or the jq-binary escape hatch), multi-sink fan-out is
``persist()`` + N writes — one materialization, N consumers, exactly the
once-through-the-source guarantee of the reference's connector loop
(internal/component/common/connector.go:129-153). Each write is a
blocking action ≙ ``Wait()``/``groupSinkWait`` (pkg/pipeline/
multisink.go:86-96).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from optimus_any2any_spark.config import Config
from optimus_any2any_spark import metadata as M


class UnknownComponent(Exception):
    pass


# Registries populated by _build_* below (reference: GetSource
# component.go:61-134, GetSink :138-224, GetConnector :228-268).
SOURCE_BUILDERS: dict[str, Callable[[SparkSession, Config], DataFrame]] = {}
SINK_BUILDERS: dict[str, Callable[[DataFrame, Config], Any]] = {}


def register_source(name: str):
    def deco(fn):
        SOURCE_BUILDERS[name.upper()] = fn
        return fn

    return deco


def register_sink(name: str):
    def deco(fn):
        SINK_BUILDERS[name.upper()] = fn
        return fn

    return deco


def _load_builtin_components() -> None:
    from optimus_any2any_spark.sources import builders as _sb  # noqa: F401
    from optimus_any2any_spark.sinks import builders as _kb  # noqa: F401


def py_transform(df: DataFrame, script: str) -> DataFrame:
    """PY processor — declared but never implemented in the reference
    (internal/component/component.go:56, :261-262 'unimplemented').

    The script defines ``def process(batch: pandas.DataFrame) ->
    pandas.DataFrame`` and runs per Arrow batch on executors
    (schema-preserving; for schema-changing transforms use the JQ
    connector's re-inference path).
    """
    src = script

    def run(batches):
        ns: dict = {}
        exec(src, ns)  # noqa: S102 — user-supplied processor, by design
        process = ns["process"]
        for pdf in batches:
            out = process(pdf)
            if out is not None and len(out):
                yield out

    return df.mapInPandas(run, schema=df.schema)


@dataclass
class PipelineResult:
    sink_results: dict[str, Any] = field(default_factory=dict)
    rows: int | None = None


class Pipeline:
    """``source >> transform >> sinks`` assembled from config."""

    def __init__(
        self,
        spark: SparkSession,
        source: str,
        sinks: list[str],
        config: Config | None = None,
        no_pipeline: bool = False,
        metrics: "Any | None" = None,  # policy.ActionMetrics
    ):
        _load_builtin_components()
        self.spark = spark
        self.source = source.upper()
        self.sinks = [s.upper() for s in sinks]
        self.config = config or Config.from_env()
        self.no_pipeline = no_pipeline
        self.metrics = metrics
        if self.source not in SOURCE_BUILDERS:
            raise UnknownComponent(f"unknown source: {self.source}")
        for s in self.sinks:
            if s not in SINK_BUILDERS:
                raise UnknownComponent(f"unknown sink: {s}")

    def dataframe(self) -> DataFrame:
        """Source + connector transform, as a lazy DataFrame."""
        df = SOURCE_BUILDERS[self.source](self.spark, self.config)
        query = self.config.get("JQ__QUERY")
        query_file = self.config.get("JQ__QUERY_FILE_PATH")
        if query_file and not query:
            query = open(query_file).read()
        if query:
            from optimus_any2any_spark.compiler.jq import jq_transform

            # JQ__BATCH_SIZE is the deprecated alias the reference
            # still honors with a warning (component.go:247-251)
            batch = self.config.get_int(
                "CONNECTOR_BATCH_SIZE",
                self.config.get_int("JQ__BATCH_SIZE", 512),
            )
            df = jq_transform(df, query, batch_size=batch)
        py = self.config.get("PY__SCRIPT")
        py_file = self.config.get("PY__SCRIPT_FILE_PATH")
        if py_file and not py:
            py = open(py_file).read()
        if py:
            df = py_transform(df, py)
        return df

    def run(self) -> PipelineResult:
        """Execute: one materialization, fan-out to every sink."""
        if self.no_pipeline:
            return self._run_direct()
        df = self.dataframe()
        df, cfg = self._consume_specialized_metadata(df)
        if len(self.sinks) > 1:
            df = df.persist()
        result = PipelineResult()
        try:
            for sink in self.sinks:
                # per-sink record count/duration via an Observation node
                # (map-side CollectMetrics; reference commonmetric.go)
                sink_df = (
                    self.metrics.observe(df, f"sink_{sink.lower()}")
                    if self.metrics is not None
                    else df
                )
                result.sink_results[sink] = SINK_BUILDERS[sink](sink_df, cfg)
        finally:
            if len(self.sinks) > 1:
                df.unpersist()
        if self.metrics is not None:
            self.metrics.harvest()
        return result

    def _consume_specialized_metadata(
        self, df: DataFrame
    ) -> tuple[DataFrame, Config]:
        """Apply specialized metadata records as dynamic sink config
        (docs/rfc_009): records carrying ONLY metadata fields are split
        off the stream and their keys reconfigure the sinks —
        ``__METADATA__<comp>__<key>`` overrides ``<COMP>__<KEY>``, and
        the RFC's ``__METADATA__email_address`` example routes to
        ``SMTP__ADDRESS_TO``. The reference sinks currently just skip
        these records (ext/file/sink.go:78-81); consumption implements
        the RFC's stated objective.

        Scale: config records are emitted at the *head* of the stream
        (the MC source sends the pre-record before any data,
        ext/maxcompute/source.go:169-179), so the probe collects only
        the first 64 rows — a single-partition head read, never a full
        scan. The data-record filter itself is a lazy predicate that
        fuses into each sink's scan.
        """
        prefix = self.config.get("METADATA_PREFIX", M.METADATA_PREFIX)
        meta_cols = M.metadata_columns(df, prefix)
        # Engine bookkeeping columns (filename/record_index/...) exist on
        # every record and cannot mark a config record; only
        # source-provided metadata keys can. Skipping here keeps plain
        # pipelines free of the probe job and the extra predicate.
        engine_cols = {M.FILENAME, M.RECORD_INDEX, M.BATCH_INDEX, M.RECORD_TOTAL_COUNT}
        if not meta_cols or not (set(meta_cols) - engine_cols):
            return df, self.config
        data, _meta = M.split_specialized_metadata(df, prefix)
        data_cols = [c for c in df.columns if c not in meta_cols]
        overrides: dict[str, Any] = {}
        for row in df.limit(64).collect():
            d = row.asDict()
            if any(d[c] is not None for c in data_cols):
                continue  # a data record, not a pure-config record
            for k, v in d.items():
                if v is None or not k.startswith(prefix):
                    continue
                key = k[len(prefix):]
                comp, sep, rest = key.partition("__")
                if sep and rest:
                    overrides[f"{comp.upper()}__{rest.upper()}"] = str(v)
                elif key == "email_address":  # rfc_009's worked example
                    overrides["SMTP__ADDRESS_TO"] = str(v)
        if not overrides:
            return data, self.config
        return data, Config(values={**self.config.values, **overrides})

    def _run_direct(self) -> PipelineResult:
        """--no-pipeline: the whole transfer stays engine-side
        (reference: any2any.go:54-61; ext/direct/*). In Spark every
        pipeline already executes engine-side, so direct mode is the
        same read→write with the connector skipped.

        OSS2MC has its own config block (internal/config/
        direct_oss2mc.go) whose LOAD statement we express relationally:
        read the object-store files, add the static partition-value
        columns, APPEND/REPLACE into the table (ext/direct/
        oss2mc.go:95-131). MC2OSS reuses the ordinary MC-source +
        OSS-sink configs in the reference, so no translation is needed
        there."""
        if self.config.get("OSS2MC__SOURCE_URI"):
            return self._run_direct_oss2mc()
        df = SOURCE_BUILDERS[self.source](self.spark, self.config)
        result = PipelineResult()
        for sink in self.sinks:
            result.sink_results[sink] = SINK_BUILDERS[sink](df, self.config)
        return result

    def _run_direct_oss2mc(self) -> PipelineResult:
        from pyspark.sql import functions as F

        from optimus_any2any_spark.sinks.warehouse import write_table
        from optimus_any2any_spark.sources.file import FileSource

        c = self.config.for_component("OSS2MC")
        fmt = c.get("file_format", "json").lower()
        df = FileSource(
            self.spark,
            c["source_uri"],
            fmt=fmt if fmt in ("json", "csv") else None,
            # the reference's CsvStorageHandler sets
            # odps.text.common.header.lines.count=1: files carry a header
            skip_header=False,
        ).read()
        # static partition values: LOAD ... PARTITION (pt='v', ...)
        # appends constant columns relationally
        for pv in (c.get("partition_values") or "").split(","):
            if not pv.strip():
                continue
            col, _sep, val = pv.partition("=")
            df = df.withColumn(
                col.strip(), F.lit(val.strip().strip("'\""))
            )
        from optimus_any2any_spark import metadata as M_

        df = M_.strip_metadata(
            df, self.config.get("METADATA_PREFIX", M_.METADATA_PREFIX)
        )
        table = c["destination_table_id"]
        write_table(df, table, c.get("load_method", "APPEND"))
        result = PipelineResult()
        result.sink_results["MC"] = table
        return result
