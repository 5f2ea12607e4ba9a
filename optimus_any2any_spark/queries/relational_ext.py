"""Extended relational suite: semi/anti joins, disjunctive predicates,
scalar subqueries, nation-pair volume — the join/subquery shapes the
reference delegates verbatim to its warehouses (SURVEY.md §2.1 MC/PSQL
sources), executed natively by Catalyst here.

Adapted TPC-H forms (the driver's tables are TPC-H-lite: no partsupp,
no commit/receipt dates, no ship modes), keeping each query's *plan
shape*: Q4 → left-semi existence join, Q7 → multi-dim broadcast join
with pair grouping, Q14 → conditional aggregation over a fact-dim join,
Q16 → anti-join + distinct aggregate, Q18 → having-filtered semi join,
Q19 → disjunctive pushdown, Q22 → scalar-subquery filter + anti join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from optimus_any2any_spark.queries import register
from optimus_any2any_spark.queries.util import (
    davg,
    dsum,
    load,
    o_davg,
    o_dsum,
    ts_micros,
)


@register(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS → left-semi join (no fact-side "
    "duplication, no distinct needed); quarter filter pushed to the "
    "orders scan.",
)
def q04_order_priority(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    hit = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        hit.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q07_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
      AND n1.n_name <> n2.n_name
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: fact joins two dimension chains (supplier→"
    "nation, customer→nation); both nation sides broadcast, one "
    "shuffle for the pair-year aggregate.",
)
def q07_nation_volume(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * {o_dsum(
        "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END"
    )} / {o_dsum('l_extendedprice * (1 - l_discount)')} AS promo_revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: conditional aggregation over a broadcast "
    "fact-dim join; month filter pushed to the lineitem scan.",
)
def q14_promo_revenue(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.join(F.broadcast(p), l.l_partkey == p.p_partkey).agg(
        (
            100.0
            * dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
            / dsum(rev)
        ).alias("promo_revenue")
    )


@register(
    "q16_supplier_counts",
    oracle="""
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (10, 20, 30, 40, 50)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    doc="TPC-H Q16 shape: NOT IN → broadcast left-anti join against the "
    "excluded-supplier set, then a distinct aggregate per brand/size.",
)
def q16_supplier_counts(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(10, 20, 30, 40, 50)
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


@register(
    "q18_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, {o_dsum('l_quantity', 4)} AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING {o_dsum('l_quantity', 4)} > 160
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, big.sum_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape: having-filtered per-key pre-aggregation "
    "(map-side partial agg shrinks the shuffle) joined back to "
    "orders/customer; top-100 via TakeOrderedAndProject.",
)
def q18_large_orders(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity"), 4).alias("sum_qty"))
        .filter(F.col("sum_qty") > 160)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 25)
       OR (p_brand = 'Brand#24' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 shape: three disjunctive predicate branches over a "
    "broadcast join — Catalyst pushes the common l_quantity/p_size "
    "bounds into both scans.",
)
def q19_disjunctive_revenue(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    branch = (
        (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.filter(branch).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@register(
    "q22_idle_rich_customers",
    oracle=f"""
    WITH threshold AS (
      SELECT {o_davg('c_acctbal')} AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS numcust,
           {o_dsum('c.c_acctbal')} AS totacctbal
    FROM customer c, threshold t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
      )
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    doc="TPC-H Q22 shape: scalar-subquery threshold (computed once, "
    "broadcast as a literal join) + NOT EXISTS → left-anti join on "
    "recent orders.",
)
def q22_idle_rich_customers(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    threshold = c.filter(F.col("c_acctbal") > 0).agg(
        davg(F.col("c_acctbal")).alias("avg_bal")
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    ).select("o_custkey")
    rich = c.join(F.broadcast(threshold)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q_set_ops_customers",
    oracle="""
    WITH buyers_1997 AS (
      SELECT DISTINCT o_custkey AS c FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    ),
    buyers_1998 AS (
      SELECT DISTINCT o_custkey AS c FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    )
    SELECT 'both' AS cohort, c FROM (SELECT c FROM buyers_1997 INTERSECT SELECT c FROM buyers_1998)
    UNION ALL
    SELECT 'only_1997', c FROM (SELECT c FROM buyers_1997 EXCEPT SELECT c FROM buyers_1998)
    ORDER BY cohort, c
    """,
    doc="Set operations (INTERSECT / EXCEPT) over yearly buyer cohorts — "
    "implicit-union-only in the reference (SURVEY.md §2.8); Catalyst "
    "plans both as shuffle semi/anti joins on the distinct key.",
)
def q_set_ops_customers(spark, sf_dir):
    o = load(spark, sf_dir, "orders")

    def buyers(year):
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
            )
            .select(F.col("o_custkey").alias("c"))
            .distinct()
        )

    b97, b98 = buyers(1997), buyers(1998)
    both = b97.intersect(b98).select(F.lit("both").alias("cohort"), "c")
    only97 = b97.subtract(b98).select(F.lit("only_1997").alias("cohort"), "c")
    return both.unionByName(only97).orderBy("cohort", "c")


@register(
    "q_string_agg_nations",
    oracle="""
    SELECT r.r_name,
           COUNT(*) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
    doc="Deterministic ordered string aggregation: collect_list is "
    "partition-order-dependent, so the portable form is "
    "array_join(array_sort(collect_list())) — matching string_agg "
    "(... ORDER BY) exactly on any partitioning.",
)
def q_string_agg_nations(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
        )
        .orderBy("r_name")
    )


@register(
    "q_rank_family_suppliers",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)
    ORDER BY rnk, s_suppkey
    """,
    doc="Rank-family window functions (rank / dense_rank / ntile / "
    "percent_rank) over a total order — none exist in the reference "
    "(SURVEY.md §2.8 'no window functions').",
    scale_note="global window by construction — a window-function demo "
    "over the dimension-scale supplier table (10k rows/SF, never "
    "corpus-scale). For fact-scale ranking use the range-partitioned "
    "offset rank (metadata.with_record_index_and_total), as "
    "curriculum_quality_bins / shard_balanced_assignment do.",
)
def q_rank_family_suppliers(spark, sf_dir):
    from pyspark.sql.window import Window

    s = load(spark, sf_dir, "supplier")
    w = Window.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return s.select(
        "s_suppkey",
        "s_name",
        "s_acctbal",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    ).orderBy("rnk", "s_suppkey")


@register(
    "q_orders_above_customer_avg",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (
      SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*)
      FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    ORDER BY o.o_orderkey
    """,
    doc="Correlated scalar subquery (each order vs 1.5x its customer's "
    "average): the DataFrame form IS the decorrelated plan — one "
    "per-customer aggregate joined back — which is exactly what "
    "Catalyst's decorrelation rewrites the SQL form into; no "
    "per-row re-execution ever happens.",
)
def q_orders_above_customer_avg(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        davg(F.col("o_totalprice")).alias("avg_price")
    )
    return (
        o.join(per_cust, o.o_custkey == per_cust.ck)
        .filter(F.col("o_totalprice") > 1.5 * F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "q_part_unpivot",
    oracle="""
    SELECT p_partkey, metric, CAST(val AS DOUBLE) AS val
    FROM (
      SELECT p_partkey,
             CAST(p_size AS DOUBLE) AS size,
             p_retailprice AS retailprice
      FROM part WHERE p_partkey <= 200
    )
    UNPIVOT (val FOR metric IN (size, retailprice))
    ORDER BY p_partkey, metric
    """,
    doc="UNPIVOT/melt (wide metrics -> long rows): Spark's unpivot is "
    "a zero-shuffle projection (each row expands in place) — the "
    "reshaping complement of q_events_pivot.",
)
def q_part_unpivot(spark, sf_dir):
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    wide = p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    return wide.unpivot(
        "p_partkey", ["size", "retailprice"], "metric", "val"
    ).orderBy("p_partkey", "metric")


_FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000


@register(
    "q_events_funnel",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    g AS (
      SELECT user_id,
             MIN(tsu) FILTER (WHERE event_type = 'view') AS t1,
             LIST(tsu) FILTER (WHERE event_type = 'click') AS clicks,
             LIST(tsu) FILTER (WHERE event_type = 'purchase') AS purch
      FROM ev GROUP BY user_id
    ),
    s2 AS (
      SELECT *,
             list_min(list_filter(clicks,
               x -> x > t1 AND x - t1 <= {_FUNNEL_WINDOW_US})) AS t2
      FROM g
    ),
    s3 AS (
      SELECT *,
             list_min(list_filter(purch,
               x -> x > t2 AND x - t2 <= {_FUNNEL_WINDOW_US})) AS t3
      FROM s2
    ),
    c AS (
      SELECT CAST(COUNT(t1) AS BIGINT) AS c1,
             CAST(COUNT(t2) AS BIGINT) AS c2,
             CAST(COUNT(t3) AS BIGINT) AS c3
      FROM s3
    )
    SELECT step, step_name, users, conv_from_first, conv_from_prev FROM (
      SELECT 1 AS step, 'view' AS step_name, c1 AS users,
             round(1.0, 4) AS conv_from_first,
             CAST(NULL AS DOUBLE) AS conv_from_prev
      FROM c WHERE c1 > 0
      UNION ALL
      SELECT 2, 'click', c2,
             round(CAST(c2 AS DOUBLE) / c1, 4),
             round(CAST(c2 AS DOUBLE) / c1, 4)
      FROM c WHERE c1 > 0
      UNION ALL
      SELECT 3, 'purchase', c3,
             round(CAST(c3 AS DOUBLE) / c1, 4),
             CASE WHEN c2 > 0
                  THEN round(CAST(c3 AS DOUBLE) / c2, 4) END
      FROM c WHERE c1 > 0
    ) t
    ORDER BY step
    """,
    doc="Ordered 3-step funnel (view -> click -> purchase): each step "
    "must follow the user's EARLIEST qualifying previous step within "
    "24h. Per-user chain state comes from ONE conditional aggregate "
    "(min view time + per-type timestamp lists folded with array "
    "lambdas) — a single user-key shuffle with map-side combine, no "
    "windows, no joins; the step table is a 1-row global count "
    "exploded to 3 rows. Shaped like production funnel engines: state "
    "per user is O(events-of-user), corpus crosses the wire once.",
)
def q_events_funnel(spark, sf_dir):
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    tsu = ts_micros("ts")
    g = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", tsu)).alias("t1"),
        F.collect_list(
            F.when(F.col("event_type") == "click", tsu)
        ).alias("clicks"),
        F.collect_list(
            F.when(F.col("event_type") == "purchase", tsu)
        ).alias("purch"),
    )
    win = F.lit(_FUNNEL_WINDOW_US)
    t1 = F.col("t1")
    t2 = F.array_min(
        F.filter("clicks", lambda x: (x > t1) & ((x - t1) <= win))
    )
    s = g.withColumn("t2", t2)
    t2c = F.col("t2")
    t3 = F.array_min(
        F.filter("purch", lambda x: (x > t2c) & ((x - t2c) <= win))
    )
    s = s.withColumn("t3", t3)
    c = s.agg(
        F.count("t1").alias("c1"),
        F.count("t2").alias("c2"),
        F.count("t3").alias("c3"),
    )
    c1, c2, c3 = F.col("c1"), F.col("c2"), F.col("c3")
    steps = F.array(
        F.struct(
            F.lit(1).alias("step"),
            F.lit("view").alias("step_name"),
            c1.alias("users"),
            F.round(F.lit(1.0), 4).alias("conv_from_first"),
            F.lit(None).cast("double").alias("conv_from_prev"),
        ),
        F.struct(
            F.lit(2).alias("step"),
            F.lit("click").alias("step_name"),
            c2.alias("users"),
            F.round(c2.cast("double") / c1, 4).alias("conv_from_first"),
            F.round(c2.cast("double") / c1, 4).alias("conv_from_prev"),
        ),
        F.struct(
            F.lit(3).alias("step"),
            F.lit("purchase").alias("step_name"),
            c3.alias("users"),
            F.round(c3.cast("double") / c1, 4).alias("conv_from_first"),
            F.when(
                c2 > 0, F.round(c3.cast("double") / c2, 4)
            ).alias("conv_from_prev"),
        ),
    )
    return (
        c.filter(c1 > 0)
        .select(F.explode(steps).alias("s"))
        .select("s.*")
        .orderBy("step")
    )
