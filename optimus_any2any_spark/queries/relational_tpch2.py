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
    # push the part predicate BELOW both aggregates: the size filter
    # keeps ~1/8 of parts, so the broadcast join prunes lineitem before
    # any shuffle instead of after two full-fact aggregations (the
    # per-part min over the filtered subset is identical — the filter
    # is on the grouping key)
    lp = l.join(
        F.broadcast(p.select("p_partkey")),
        l.l_partkey == F.col("p_partkey"),
    )
    costs = lp.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("price"),
        F.first("p_partkey").alias("p_partkey"),
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


@register(
    "q09_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           {o_dsum("l.l_extendedprice * (1 - l.l_discount)"
                   " - 0.5 * p.p_retailprice * l.l_quantity", 4)} AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%bolt%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape (product-type profit by nation and year), "
    "adapted to the lite schema: supply cost proxied as half retail "
    "price (no partsupp table). Part filter + supplier + nation "
    "broadcast; orders joins the fact on the order key; one fact "
    "shuffle, profit summed in DECIMAL for cross-engine parity. "
    "Reference scope: delegates all joins to its warehouse "
    "(SURVEY.md 2.8).",
)
def q09_product_profit(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            profit.alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("profit"), 4).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q12_late_shipment_priority",
    oracle="""
    SELECT CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) > 60
                THEN 'late' ELSE 'ontime' END AS ship_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY ship_bucket
    ORDER BY ship_bucket
    """,
    doc="TPC-H Q12 shape (shipping-delay priority split), adapted: no "
    "ship modes / commit dates in the lite schema, so the bucket is "
    "shipment lateness (> 60 days after order date). Conditional "
    "CASE-sums fold to map-side partials; single fact-fact shuffle on "
    "the order key.",
)
def q12_late_shipment_priority(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60,
                F.lit("late"),
            )
            .otherwise(F.lit("ontime"))
            .alias("ship_bucket"),
            high.cast("long").alias("is_high"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum(1 - F.col("is_high")).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH brand_parts AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#17'
    ),
    part_avg AS (
      SELECT l_partkey,
             {o_dsum("l_quantity", 2)} / COUNT(l_quantity) AS avg_qty
      FROM lineitem JOIN brand_parts ON p_partkey = l_partkey
      GROUP BY l_partkey
    )
    SELECT {o_dsum("l.l_extendedprice", 2)} / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part_avg a ON a.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.2 * a.avg_qty
    """,
    doc="TPC-H Q17 (small-quantity-order revenue): the correlated "
    "per-part average decorrelates into one aggregate over the "
    "brand-filtered lineitem (semi-joined via broadcast part list) "
    "joined back to the fact — two scans, zero correlated probes. "
    "Averages accumulate in DECIMAL so the 0.2x threshold compares "
    "identically across engines.",
)
def q17_small_quantity_revenue(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    bp = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#17")
        .select("p_partkey")
    )
    part_avg = (
        l.join(F.broadcast(bp), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey")
        .agg(
            (dsum(F.col("l_quantity"), 2) / F.count("l_quantity")).alias(
                "avg_qty"
            )
        )
    )
    return (
        l.join(
            F.broadcast(part_avg.withColumnRenamed("l_partkey", "pk")),
            F.col("pk") == F.col("l_partkey"),
        )
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum(F.col("l_extendedprice"), 2) / 7.0).alias("avg_yearly"))
    )


@register(
    "q20_dominant_suppliers",
    oracle=f"""
    WITH red_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ),
    shipped AS (
      SELECT l_partkey, l_suppkey, {o_dsum("l_quantity", 2)} AS supp_qty
      FROM lineitem JOIN red_parts ON p_partkey = l_partkey
      WHERE year(l_shipdate) = 1998
      GROUP BY l_partkey, l_suppkey
    ),
    totals AS (
      SELECT l_partkey, {o_dsum("supp_qty", 2)} AS part_qty FROM shipped
      GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_name, n.n_name AS nation
    FROM shipped sh
    JOIN totals t ON t.l_partkey = sh.l_partkey
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE sh.supp_qty > 0.5 * t.part_qty
    ORDER BY s.s_name, nation
    """,
    doc="TPC-H Q20 shape (part-promotion supplier screen), adapted: "
    "with no partsupp availability, a supplier qualifies by having "
    "shipped more than half of a red part's 1998 volume. Nested "
    "aggregate (per part-supplier, then per part) reuses the first "
    "aggregate's partitioning — the second groupBy induces no extra "
    "shuffle — then a distinct semi-screen into broadcast dims.",
)
def q20_dominant_suppliers(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    rp = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    # one explicit exchange on l_partkey serves the (part, supplier)
    # aggregate (hash(pk) clusters every (pk, sk) group), the per-part
    # rollup, AND the shipped-totals self-join — without it each step
    # would shuffle separately
    shipped = (
        l.filter(F.year("l_shipdate") == 1998)
        .join(F.broadcast(rp), F.col("p_partkey") == F.col("l_partkey"))
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum(F.col("l_quantity"), 2).alias("supp_qty"))
    )
    totals = shipped.groupBy("l_partkey").agg(
        dsum(F.col("supp_qty"), 2).alias("part_qty")
    )
    return (
        shipped.join(totals, "l_partkey")
        .filter(F.col("supp_qty") > 0.5 * F.col("part_qty"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", F.col("n_name").alias("nation"))
        .distinct()
        .orderBy("s_name", "nation")
    )
