"""Queries pinning the reference engine's pipeline semantics.

These re-express optimus-any2any's metadata / routing / batching /
projection behaviors (SURVEY.md §1.2, §2.3, §2.4) as verifiable
relational queries over the driver's tables, so the DuckDB oracle gate
checks the *semantics*, not just the relational surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from optimus_any2any_spark.queries import register
from optimus_any2any_spark.queries.util import load


@register(
    "q_record_index_batches",
    oracle="""
    SELECT CAST(floor(record_index / 512) AS BIGINT) AS batch_index,
           COUNT(*) AS n_records,
           MIN(record_index) AS first_index,
           MAX(record_index) AS last_index
    FROM (
      SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS record_index
      FROM lineitem
    ) t
    GROUP BY batch_index
    ORDER BY batch_index
    """,
    doc="__METADATA__record_index + connector_batch_index semantics "
    "(reference: internal/component/common/source.go:89 global counter; "
    "internal/component/common/connector.go:91 batch_index = index/512, "
    "batch size default internal/config/config.go:20). A global sequential "
    "index needs a total order; at scale use zipWithIndex on a sorted "
    "DataFrame instead of a single-partition window.",
)
def q_record_index_batches(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    w = Window.orderBy("l_orderkey", "l_linenumber")
    return (
        l.select((F.row_number().over(w) - 1).alias("record_index"))
        .groupBy(
            F.floor(F.col("record_index") / 512).cast("long").alias("batch_index")
        )
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.min("record_index").alias("first_index"),
            F.max("record_index").alias("last_index"),
        )
        .orderBy("batch_index")
    )


@register(
    "q_routing_destinations",
    oracle="""
    SELECT printf('oss://bucket/events/%s/%s/part.json',
                  event_type, strftime(ts, '%Y-%m-%d')) AS destination_uri,
           COUNT(*) AS n_records
    FROM events
    GROUP BY destination_uri
    ORDER BY destination_uri
    """,
    doc="Templated destination URI routing (reference: ext/oss/sink.go:110 "
    "per-record Go-template URI, docs/rfc_005_dynamic_interpolation.md) — "
    "in Spark the template becomes a computed destination column and the "
    "write is partitionBy(destination); this query checks the routing key "
    "computation + group fan-out cardinality.",
)
def q_routing_destinations(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            F.format_string(
                "oss://bucket/events/%s/%s/part.json",
                F.col("event_type"),
                F.date_format("ts", "yyyy-MM-dd"),
            ).alias("destination_uri")
        )
        .groupBy("destination_uri")
        .agg(F.count(F.lit(1)).alias("n_records"))
        .orderBy("destination_uri")
    )


@register(
    "q_jsonpath_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           COUNT(*) AS n_events,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY k_mod
    ORDER BY k_mod
    """,
    doc="JSONPath projection over in-flight JSON (reference: "
    "internal/component/common/sink.go:113-146 gval/jsonpath selector) — "
    "get_json_object keeps extraction JVM-side.",
)
def q_jsonpath_extract(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("k_mod")
    )


@register(
    "q_csv_string_typing",
    oracle="""
    SELECT CAST(n_nationkey AS VARCHAR) AS nationkey_s,
           n_name AS name_s,
           CAST(n_regionkey AS VARCHAR) AS regionkey_s
    FROM nation
    ORDER BY n_nationkey
    """,
    doc="CSV-source string typing: every CSV field arrives as a string "
    "(reference: internal/ext/fileconverter/csv2json.go:226-229); integer "
    "formatting is engine-stable so the cast round-trips identically.",
)
def q_csv_string_typing(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    return n.orderBy("n_nationkey").select(
        F.col("n_nationkey").cast("string").alias("nationkey_s"),
        F.col("n_name").alias("name_s"),
        F.col("n_regionkey").cast("string").alias("regionkey_s"),
    )


@register(
    "q_group_by_routing_hash",
    oracle="""
    SELECT md5(printf('mailto:%s@example.com|subject:%s report',
                      event_type, strftime(ts, '%Y-%m-%d'))) AS group_hash,
           COUNT(*) AS n_records,
           MIN(event_id) AS first_event,
           MAX(event_id) AS last_event
    FROM events
    GROUP BY group_hash
    ORDER BY group_hash
    """,
    doc="Group-by-metadata-hash routing (reference: ext/smtp/sink.go:229-240 "
    "groups records by MD5 of compiled per-record email config; "
    "ext/http/sink.go:306) — the MD5 is just a group key; Spark runs it as "
    "a hash aggregate on the computed column.",
)
def q_group_by_routing_hash(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    compiled = F.format_string(
        "mailto:%s@example.com|subject:%s report",
        F.col("event_type"),
        F.date_format("ts", "yyyy-MM-dd"),
    )
    return (
        e.select(F.md5(compiled).alias("group_hash"), F.col("event_id"))
        .groupBy("group_hash")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .orderBy("group_hash")
    )
