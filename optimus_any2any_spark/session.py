"""SparkSession construction with scale-aware defaults.

Local testing runs on ``local[N]``, but every knob here is chosen for the
1000-executor / 100 TB case and degrades gracefully on a laptop:

- AQE on: runtime partition coalescing, skew-join splitting, and
  dynamic join-strategy switching replace hand-tuned shuffle counts.
- ``spark.sql.shuffle.partitions`` is only a pre-AQE upper bound; AQE
  coalesces it down locally and the advisory partition size governs at
  scale.
- Arrow transfer on: every toPandas()/pandas-UDF hop is columnar.
- Session timezone pinned to UTC so timestamp semantics are identical
  across engines (and vs. the DuckDB correctness oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults applied to every session the engine creates. Callers can
#: override any of these via the ``extra_conf`` argument.
SCALE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # PySpark 4 wraps EVERY DataFrame/Column API call in an error-context
    # decorator that, per call, fetches the active session, reads a conf
    # over py4j, walks the Python stack, and sets/clears a JVM thread-local
    # (errors/utils.py _with_origin) — ~3 extra py4j round-trips per API
    # call, measured at ~0.5-1s of pure driver latency per lakehouse
    # commit (601 wrapped calls in one MERGE lifecycle). The only loss is
    # the "user code line" context frame in error messages; exception
    # types and messages are unchanged. This is driver-side overhead paid
    # at ANY cluster scale, not a local-mode tune.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
    "spark.sql.parquet.filterPushdown": "true",
    # INT64 micros, not the deprecated INT96: Iceberg's spec REQUIRES
    # int64 timestamps, and INT96 chunks carry no usable footer
    # statistics (which the lakehouse writers read in lieu of
    # re-scanning their own output — formats/footer_stats.py)
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.shuffle.partitions": "64",
    "spark.ui.enabled": "false",
    "spark.driver.extraJavaOptions": "-Duser.timezone=UTC",
    "spark.executor.extraJavaOptions": "-Duser.timezone=UTC",
    # Local mode runs driver AND all executor threads in ONE JVM whose
    # heap defaults to 1g — with local[32] that is ~32 MB of working
    # heap per task and constant GC pressure (observed: GCLocker retry
    # warnings and an OOM on the 10x bench spot-run). 16g is still
    # conservative on the target hosts; on a real cluster
    # spark-submit's --driver-memory/--executor-memory override this.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}


def get_spark(
    app_name: str = "optimus-any2any-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    when no cluster master is configured — on a real cluster the master
    comes from spark-submit and this argument is ignored.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if master:
        builder = builder.master(master)
    conf = dict(SCALE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
