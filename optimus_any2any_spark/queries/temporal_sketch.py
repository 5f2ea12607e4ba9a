"""Temporal joins + sketches over the events stream.

Operators Spark lacks as built-ins (SURVEY.md §7 step 8 "custom
operators"): as-of join (union+window — never a range-join explosion),
bucketed range join (inequality → bucket equi-join), and a KMV distinct
sketch (engine-portable alternative to approx_count_distinct). DuckDB
oracles use its native ASOF JOIN / inequality joins, so the gate
cross-checks two independent algorithm shapes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from optimus_any2any_spark.queries import register
from optimus_any2any_spark.queries.util import dsum, load, ts_micros
from optimus_any2any_spark.operators.sketch import kmv_distinct
from optimus_any2any_spark.operators.temporal import asof_join, bucketed_range_count


@register(
    "asof_click_attribution",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           c.ts AS ts_asof,
           c.event_id AS event_id_asof,
           date_diff('microsecond', c.ts, p.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    doc="As-of join: each purchase attributed to the user's latest "
    "prior click. Spark side is union+window (one shuffle on user_id, "
    "density-independent); oracle is DuckDB's native ASOF JOIN — two "
    "independent algorithms, identical rows.",
    bench=True,
)
def asof_click_attribution(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["event_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "ts_asof",
        F.col("event_id_asof"),
        (ts_micros("ts") - ts_micros("ts_asof")).alias(
            "gap_us"
        ),
    ).orderBy("event_id")


@register(
    "range_clicks_before_purchase",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, COUNT(c.ts) AS n_clicks_1h
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts < p.ts
     AND c.ts >= p.ts - INTERVAL 1 HOUR
    GROUP BY p.event_id, p.user_id, p.ts
    ORDER BY p.event_id
    """,
    doc="Range join via bucket quantization: clicks in the hour before "
    "each purchase. The inequality never reaches the join operator — "
    "(user, bucket) equi-join with 2-bucket probe, exact range as a "
    "post-filter — so Catalyst plans a hash join, not a nested loop.",
)
def range_clicks_before_purchase(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    return bucketed_range_count(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        window_seconds=3600,
        count_alias="n_clicks_1h",
    ).orderBy("event_id")


@register(
    "hypertable_rollup",
    oracle="""
    SELECT granularity, bucket, event_type, n_events, sum_value FROM (
      SELECT 'hour' AS granularity, date_trunc('hour', ts) AS bucket,
             event_type, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
      GROUP BY bucket, event_type
      UNION ALL
      SELECT 'day', date_trunc('day', ts), event_type, COUNT(*),
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
      FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
      GROUP BY 2, 3
      UNION ALL
      SELECT 'month', date_trunc('month', ts), event_type, COUNT(*),
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
      FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
      GROUP BY 2, 3
    ) ORDER BY granularity, bucket, event_type
    """,
    doc="Hypertable-style continuous-aggregate rollup: hour/day/month "
    "time buckets in ONE scan via GROUPING SETS on pre-computed "
    "truncations (Timescale's hypertable rollup re-expressed; the "
    "oracle's 3-scan UNION is the naive shape we avoid).",
)
def hypertable_rollup(spark, sf_dir):
    e = load(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-03").cast("timestamp")
    )
    # one scan: grouping sets over the three truncations
    base = e.select(
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("month", "ts").alias("m"),
        "event_type",
        "value",
    )
    g = base.groupingSets(
        [["h", "event_type"], ["d", "event_type"], ["m", "event_type"]],
        "h", "d", "m", "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("sum_value"),
    )
    return (
        g.select(
            F.when(F.col("h").isNotNull(), "hour")
            .when(F.col("d").isNotNull(), "day")
            .otherwise("month")
            .alias("granularity"),
            F.coalesce(F.col("h"), F.col("d"), F.col("m")).alias("bucket"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("granularity", "bucket", "event_type")
    )


@register(
    "q_events_cube",
    oracle="""
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    WHERE ts < TIMESTAMP '2024-01-05 00:00:00'
    GROUP BY CUBE (event_type, date_trunc('day', ts))
    ORDER BY event_type, day
    """,
    doc="CUBE over (type, day): all four grouping combinations in one "
    "pass — absent from the reference (SURVEY.md §2.8), native in "
    "Catalyst with partial aggregation per grouping set.",
)
def q_events_cube(spark, sf_dir):
    e = load(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-05").cast("timestamp")
    )
    return (
        e.select(F.col("event_type"), F.date_trunc("day", "ts").alias("d"), "value")
        .cube("event_type", "d")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            F.coalesce(F.date_format("d", "yyyy-MM-dd"), F.lit("ALL")).alias("day"),
            "n_events",
            "sum_value",
        )
        .orderBy("event_type", "day")
    )


_KMV_K = 32


@register(
    "kmv_distinct_users",
    oracle=f"""
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type, user_id,
             (CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                   AS UBIGINT) + 1.0) / 4294967296.0 AS h
      FROM d
    ),
    r AS (
      SELECT *, row_number() OVER (
        PARTITION BY event_type ORDER BY h, user_id) AS rn
      FROM h
    ),
    n AS (SELECT event_type, COUNT(*) AS n_exact FROM d GROUP BY event_type),
    hk AS (
      SELECT event_type, MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS hk
      FROM r GROUP BY event_type
    )
    SELECT n.event_type, n.n_exact,
           round(COALESCE(({_KMV_K} - 1) / hk, CAST(n_exact AS DOUBLE)), 4)
             AS kmv_estimate
    FROM n JOIN hk USING (event_type)
    ORDER BY event_type
    """,
    doc="KMV k-minimum-values distinct sketch (k=32): portable-md5 "
    "unit hashes, estimate (k-1)/h_k — bit-deterministic across "
    "engines unlike HLL, mergeable, O(k·groups) merge traffic.",
)
def kmv_distinct_users(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return kmv_distinct(e, "user_id", ["event_type"], k=_KMV_K).orderBy(
        "event_type"
    )


@register(
    "q_events_moving_avg",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      FROM events GROUP BY 1
    )
    SELECT CAST(day AS TIMESTAMP) AS day, revenue,
           round(CAST(SUM(CAST(revenue AS DECIMAL(18,6))) OVER w7 AS DOUBLE)
                 / COUNT(*) OVER w7, 4) AS ma7,
           round(revenue - lag(revenue) OVER (ORDER BY day), 4) AS dod_delta
    FROM daily
    WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY day
    """,
    doc="Time-series windows: 7-day trailing moving average (exact "
    "DECIMAL accumulation inside the frame) + day-over-day lag delta. "
    "The global ORDER BY window runs over DAILY aggregates — rows = "
    "days, not events, so the single-partition window is bounded by "
    "calendar size at any data scale.",
    scale_note="global window by construction, but its input is the "
    "daily rollup (one row per calendar day at any corpus size) — the "
    "events table itself never crosses the window exchange.",
)
def q_events_moving_avg(spark, sf_dir):
    from pyspark.sql.window import Window
    from pyspark.sql import types as T

    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        dsum(F.col("value")).alias("revenue")
    )
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    wlag = Window.orderBy("day")
    return daily.select(
        "day",
        "revenue",
        F.round(
            F.sum(F.col("revenue").cast(T.DecimalType(18, 6))).over(w7).cast("double")
            / F.count(F.lit(1)).over(w7),
            4,
        ).alias("ma7"),
        F.round(F.col("revenue") - F.lag("revenue").over(wlag), 4).alias("dod_delta"),
    ).orderBy("day")


@register(
    "q_events_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Exact linear-interpolation percentiles per type (Spark "
    "percentile == DuckDB quantile_cont bit-for-bit). Exact quantiles "
    "sort within each group; at 100 TB swap to approx_percentile "
    "(t-digest, mergeable partial aggregation) — kept exact here "
    "because approximate sketches are engine-private state the oracle "
    "gate cannot cross-check.",
)
def q_events_percentiles(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


def _pagerank_oracle(iterations: int = 3, damping: float = 0.85) -> str:
    """Unrolled-CTE PageRank oracle: iteration t as CTE pr{t}."""
    head = f"""
    WITH e0 AS (
      SELECT n1.n_name AS src, n2.n_name AS dst, CAST(COUNT(*) AS DOUBLE) AS w
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        AND n1.n_name <> n2.n_name
      GROUP BY src, dst
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e0 UNION ALL SELECT dst FROM e0
      )
    ),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    outw AS (
      SELECT src, CAST(SUM(CAST(w AS DECIMAL(28,12))) AS DOUBLE) AS outw
      FROM e0 GROUP BY src
    ),
    norm AS (SELECT e0.src, e0.dst, w / outw AS share FROM e0 JOIN outw USING (src)),
    pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    steps = []
    for t in range(1, iterations + 1):
        steps.append(f""",
    pr{t} AS (
      SELECT nodes.node,
             (1 - {damping}) / (SELECT n FROM nn)
               + {damping} * COALESCE(m.in_mass, 0.0) AS rank
      FROM nodes LEFT JOIN (
        SELECT norm.dst AS node,
               CAST(SUM(CAST(pr{t-1}.rank * norm.share AS DECIMAL(28,12)))
                    AS DOUBLE) AS in_mass
        FROM norm JOIN pr{t-1} ON pr{t-1}.node = norm.src
        GROUP BY norm.dst
      ) m ON m.node = nodes.node
    )""")
    return (
        head
        + "".join(steps)
        + f"""
    SELECT node, round(rank, 10) AS rank FROM pr{iterations} ORDER BY node
    """
    )


@register(
    "graph_nation_pagerank",
    oracle=_pagerank_oracle(),
    doc="Weighted PageRank (3 iterations, d=0.85) over the nation trade "
    "graph — the iterative-algorithm representative: a bounded driver "
    "loop where each round is one distributed join+decimal-exact "
    "aggregate. The oracle is the same recurrence unrolled into CTEs; "
    "both engines agree to 10 decimals on every rank.",
)
def graph_nation_pagerank(spark, sf_dir):
    from optimus_any2any_spark.operators.graph import pagerank

    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("src")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("dst")
    )
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    pr = pagerank(edges, weight_col="w", iterations=3, damping=0.85)
    return pr.select("node", F.round("rank", 10).alias("rank")).orderBy("node")
