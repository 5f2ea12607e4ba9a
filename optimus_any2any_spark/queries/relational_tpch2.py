"""Second TPC-H-shaped suite: argmin joins, market-share ratios,
having-vs-scalar filters, outer-join distributions, top-supplier
equality, and double-correlated EXISTS — plan shapes the reference
delegates verbatim to its warehouses (SURVEY.md §2.8 "no joins"),
executed natively by Catalyst here.

Adapted to the driver's TPC-H-lite schema (no partsupp, no ship modes,
no commit/receipt dates): Q2 → per-part argmin over lineitem prices,
Q8 → nation market share within a region by year, Q11 → part value vs
a scalar fraction-of-total threshold, Q13 → customer order-count
distribution over a conditional left outer join, Q15 → suppliers at the
quarterly revenue maximum, Q21 → sole-late-shipper on multi-supplier
orders (EXISTS + NOT EXISTS decorrelated into per-order aggregates).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from optimus_any2any_spark.queries import register
from optimus_any2any_spark.queries.util import dsum, load, o_dsum


@register(
    "q02_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice) AS price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, min(price) AS min_price FROM costs GROUP BY l_partkey
    )
    SELECT c.l_partkey AS p_partkey, s.s_suppkey, s.s_name,
           c.price AS min_price
    FROM costs c
    JOIN best b ON b.l_partkey = c.l_partkey AND c.price = b.min_price
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN part p ON p.p_partkey = c.l_partkey
    WHERE p.p_size BETWEEN 10 AND 15
    ORDER BY p_partkey, s_suppkey
    """,
    doc="TPC-H Q2 shape (argmin join): per-(part,supplier) min price, "
    "per-part global min joined back on equality to keep every "
    "tied supplier; part filter broadcast. min() over doubles is "
    "exact, so no decimal accumulation is needed.",
)
def q02_min_cost_supplier(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_size").between(10, 15))
    costs = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("price")
    )
    best = costs.groupBy(F.col("l_partkey").alias("bk")).agg(
        F.min("price").alias("min_price")
    )
    return (
        costs.join(
            best,
            (costs.l_partkey == best.bk) & (costs.price == best.min_price),
        )
        .join(F.broadcast(s), costs.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(p.select("p_partkey")),
            costs.l_partkey == F.col("p_partkey"),
        )
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            F.col("price").alias("min_price"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


@register(
    "q08_market_share",
    oracle=f"""
    WITH rev AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT o_year,
           {o_dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
             / {o_dsum('volume')} AS mkt_share
    FROM rev
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape (market share): one fact pass through two "
    "dimension chains (customer-nation-region restricts the market; "
    "supplier-nation tags the share numerator); all dims broadcast, "
    "ratio of two exact-decimal sums per year.",
    bench=True,
)
def q08_market_share(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select(F.col("n_nationkey").alias("c_nkey"))
    n2 = n.select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_name").alias("supp_nation"),
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                dsum(
                    F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
                        F.lit(0.0)
                    )
                )
                / dsum(volume)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q11_important_parts",
    oracle=f"""
    WITH pv AS (
      SELECT l_partkey, {o_dsum('l_extendedprice', 4)} AS value
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, value
    FROM pv
    WHERE value > (
      SELECT {o_dsum('value', 4)} * 0.0007 FROM pv
    )
    ORDER BY value DESC, l_partkey
    """,
    doc="TPC-H Q11 shape: per-part value aggregate filtered against a "
    "scalar fraction-of-global-total subquery — the total reuses the "
    "same pre-aggregation (computed once, broadcast as a literal); "
    "both levels accumulate in DECIMAL so the threshold comparison "
    "is bit-identical across engines and partitionings.",
)
def q11_important_parts(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    pv = l.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice"), 4).alias("value")
    )
    total = pv.agg((dsum(F.col("value"), 4) * 0.0007).alias("threshold"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: conditional left outer join (the filter lives "
    "in the join condition, so customers with only urgent orders still "
    "appear with count 0) -> per-customer count -> count distribution. "
    "Two shuffles, both on small keys; COUNT(col) skips the NULLs the "
    "outer join introduces.",
)
def q13_customer_distribution(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             {o_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 shape (top supplier): quarterly revenue view, "
    "suppliers at the scalar max kept via equality against a "
    "broadcast 1-row aggregate (keeps every tied supplier, unlike "
    "LIMIT 1). Exact-decimal revenue makes the equality safe.",
)
def q15_top_supplier(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        s.join(rev, s.s_suppkey == rev.l_suppkey)
        .join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS is_late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS nsupp,
             COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS nlate
      FROM late GROUP BY l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM late l1
    JOIN per_order po ON po.l_orderkey = l1.l_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.is_late = 1 AND po.nsupp >= 2 AND po.nlate = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): the "
    "EXISTS (another supplier on the order) + NOT EXISTS (another "
    "LATE supplier) pair is decorrelated into one per-order "
    "aggregate — distinct suppliers and distinct late suppliers — "
    "computed in a single shuffle and joined back to the late rows; "
    "'late' is shipped >60 days after the order date (the lite "
    "schema has no commit/receipt dates).",
    bench=True,
)
def q21_waiting_suppliers(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("is_late"),
        )
    )
    per_order = late.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("nsupp"),
        F.countDistinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("nlate"),
    )
    return (
        late.filter(F.col("is_late") == 1)
        .join(per_order, F.col("l_orderkey") == F.col("ok"))
        .filter((F.col("nsupp") >= 2) & (F.col("nlate") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@register(
    "scd2_customer_status",
    oracle="""
    SELECT o_custkey,
           o_orderstatus AS status,
           o_orderdate AS effective_from,
           lead(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS effective_to,
           lead(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) IS NULL AS is_current
    FROM orders
    WHERE o_custkey <= 300
    ORDER BY o_custkey, effective_from, status
    """,
    doc="SCD type-2 history build (the lakehouse MERGE/dimension-"
    "versioning shape): each customer's order stream becomes "
    "validity intervals via lead() over (custkey, orderdate) — one "
    "hash shuffle on the customer key, sort within partitions only; "
    "is_current falls out as the NULL upper bound. Deterministic "
    "via the orderkey tie-break.",
)
def scd2_customer_status(spark, sf_dir):
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 300)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("effective_from"),
        nxt.alias("effective_to"),
        nxt.isNull().alias("is_current"),
    ).orderBy("o_custkey", "effective_from", "status")


@register(
    "q_cohort_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    )
    SELECT f.cohort,
           CAST(date_diff('day', f.cohort, a.w) / 7 AS BIGINT) AS week_offset,
           COUNT(*) AS n_users
    FROM activity a JOIN first f ON f.user_id = a.user_id
    GROUP BY f.cohort, week_offset
    ORDER BY f.cohort, week_offset
    """,
    doc="Weekly cohort retention: per-user first-activity week "
    "(cohort, Monday-truncated in both engines) joined back to the "
    "user's distinct active weeks, counted by week offset. Two "
    "aggregations + one equi-join, all keyed on user_id, so a "
    "repartition on user_id serves every stage; the offset is an "
    "exact multiple-of-7-days integer division, identical across "
    "engines.",
)
def q_cohort_retention(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    ).distinct()
    offset = (F.datediff(F.col("w"), F.col("cohort")) / 7).cast("long")
    return (
        activity.join(first, "user_id")
        .groupBy("cohort", offset.alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort", "week_offset")
    )
