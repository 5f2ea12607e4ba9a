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
    ):
        _load_builtin_components()
        self.spark = spark
        self.source = source.upper()
        self.sinks = [s.upper() for s in sinks]
        self.config = config or Config.from_env()
        self.no_pipeline = no_pipeline
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

            batch = self.config.get_int("CONNECTOR_BATCH_SIZE", 512)
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
        if len(self.sinks) > 1:
            df = df.persist()
        result = PipelineResult()
        try:
            for sink in self.sinks:
                result.sink_results[sink] = SINK_BUILDERS[sink](df, self.config)
        finally:
            if len(self.sinks) > 1:
                df.unpersist()
        return result

    def _run_direct(self) -> PipelineResult:
        """--no-pipeline: the whole transfer stays engine-side
        (reference: any2any.go:54-61; ext/direct/*). In Spark every
        pipeline already executes engine-side, so direct mode is the
        same read→write with the connector skipped."""
        df = SOURCE_BUILDERS[self.source](self.spark, self.config)
        result = PipelineResult()
        for sink in self.sinks:
            result.sink_results[sink] = SINK_BUILDERS[sink](df, self.config)
        return result
