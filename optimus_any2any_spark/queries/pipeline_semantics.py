"""Queries pinning the reference engine's pipeline semantics.

These re-express optimus-any2any's metadata / routing / batching /
projection behaviors (SURVEY.md §1.2, §2.3, §2.4) as verifiable
relational queries over the driver's tables, so the DuckDB oracle gate
checks the *semantics*, not just the relational surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from optimus_any2any_spark.queries import register
from optimus_any2any_spark.queries.util import dsum, load, o_dsum


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
    "batch size default internal/config/config.go:20). Uses the "
    "distributed partition-offset index (range-partition sort + per-"
    "partition positions + prefix-sum offsets) — same result as a "
    "global row_number window without funneling data through one task.",
)
def q_record_index_batches(spark, sf_dir):
    from optimus_any2any_spark import metadata as M

    l = load(spark, sf_dir, "lineitem")
    indexed = M.with_record_index(
        l, col="record_index", order_by=["l_orderkey", "l_linenumber"]
    )
    return (
        indexed.select("record_index")
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
    "q_salted_user_counts",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Skew-mitigated aggregation: two-stage salted groupBy "
    "(key,salt)->key spreads hot keys over N tasks; the oracle is the "
    "PLAIN group-by — results are identical because the merges are "
    "associative and the double sums are decimal-exact.",
)
def q_salted_user_counts(spark, sf_dir):
    from optimus_any2any_spark.operators.skew import salted_agg

    e = load(spark, sf_dir, "events")
    return (
        salted_agg(
            e,
            ["user_id"],
            {
                "n_events": ("sum", F.count(F.lit(1))),
                "total_value": ("sum", F.sum(F.col("value").cast("decimal(18,6)"))),
            },
        )
        .withColumn("total_value", F.col("total_value").cast("double"))
        .orderBy("user_id")
    )


@register(
    "q_events_pivot",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
           CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Conditional aggregation / pivot: per-user event-type counts as "
    "columns (one shuffle, no pivot-value scan thanks to explicit "
    "category list).",
)
def q_events_pivot(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    return (
        e.groupBy("user_id")
        .agg(
            *[
                F.count(F.when(F.col("event_type") == k, 1)).alias(f"n_{k}")
                for k in kinds
            ]
        )
        .orderBy("user_id")
    )


@register(
    "q_customers_inactive_2001",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
    )
    ORDER BY c.c_custkey
    """,
    doc="Anti-join (NOT EXISTS): customers with no orders in 2001 — "
    "left_anti against the filtered fact is the scalable shape (no "
    "distinct-collect, null-safe, filter pushed before the join).",
)
def q_customers_inactive_2001(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
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


@register(
    "q_salted_segment_revenue",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           {o_dsum('o.o_totalprice')} AS revenue
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    doc="Skew-proof salted join (operators/skew.py::salted_join): the "
    "fact side salted 16 ways, the dimension replicated per salt — a "
    "hot customer's orders spread over 16 tasks by construction. The "
    "oracle is the PLAIN join: row multiplicity is provably unchanged, "
    "so results match bit-for-bit.",
)
def q_salted_segment_revenue(spark, sf_dir):
    from optimus_any2any_spark.operators.skew import salted_join

    o = load(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    c = load(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    joined = salted_join(o, c, on="custkey")
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q_pii_masked_customers",
    oracle="""
    SELECT c_custkey,
           sha256('pepper|' || c_name) AS name_token,
           concat(substr(c_name, 1, 2), repeat('*', 6)) AS name_redacted,
           CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_bucket
    FROM customer
    ORDER BY c_custkey
    """,
    doc="PII handling for training pipelines: deterministic peppered "
    "tokenization (joinable pseudonym), prefix redaction (human "
    "debugging), and value bucketing (k-anonymity-style coarsening) — "
    "all JVM-side expressions, no Python in the path.",
)
def q_pii_masked_customers(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.sha2(
            F.concat(F.lit("pepper|"), F.col("c_name")).cast("binary"), 256
        ).alias("name_token"),
        F.concat(F.substring("c_name", 1, 2), F.lit("*" * 6)).alias(
            "name_redacted"
        ),
        (F.floor(F.col("c_acctbal") / 1000) * 1000)
        .cast("long")
        .alias("acctbal_bucket"),
    ).orderBy("c_custkey")


@register(
    "q_doc_length_histogram",
    oracle="""
    SELECT CAST(floor(n_chars / 50) * 50 AS BIGINT) AS bucket_lo,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_len
    FROM documents
    GROUP BY bucket_lo
    ORDER BY bucket_lo
    """,
    doc="Fixed-width histogram of document lengths (floor-bucketing — "
    "the corpus length-distribution check before token-budget "
    "planning); single shuffle on the bucket key.",
)
def q_doc_length_histogram(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(
            (F.floor(F.col("n_chars") / 50) * 50).cast("long").alias("bucket_lo")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum(F.col("n_chars").cast(T.DecimalType(18, 2))).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_len"),
        )
        .orderBy("bucket_lo")
    )


@register(
    "q_jq_native_program",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, lang,
             string_split_regex(trim(text), '\s+') AS words
      FROM documents
    ),
    f AS (SELECT * FROM w WHERE len(words) >= 5)
    SELECT doc_id, lang, CAST(len(words) AS BIGINT) AS n,
           upper(words[1]) AS caps,
           CAST(list_sum(list_transform(words, x -> length(x))) AS BIGINT)
             AS total_len
    FROM f
    ORDER BY doc_id
    """,
    doc="The round-3 native jq constructs as ONE compiled program "
    "through the oracle gate: assignment stages (.n = ..., an "
    "interpolated .marker), select over the assigned field, map() "
    "with a piped builtin, first, and a reduce fold — all Catalyst "
    "(compiler/jq.py), no jq binary, verified value-exact against "
    "the SQL re-expression.",
)
def q_jq_native_program(spark, sf_dir):
    from optimus_any2any_spark.compiler.jq import translate_jq
    from optimus_any2any_spark.operators.text import tokens

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", tokens(F.col("text")).alias("words")
    )
    prog = (
        '.[] | .n = (.words | length) '
        '| .marker = "d-\\(.doc_id)" '
        "| select(.n >= 5) "
        "| {doc_id, lang, n, "
        "caps: (.words | map(ascii_upcase) | first), "
        "total_len: (reduce .words[] as $w (0; . + ($w | length)))}"
    )
    return translate_jq(d, prog).orderBy("doc_id")


@register(
    "q_jq_object_arrays",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
      FROM documents
    ),
    f AS (SELECT * FROM tok WHERE len(words) >= 3),
    it AS (
      SELECT doc_id, unnest(words) AS w,
             unnest(range(1, len(words) + 1)) AS i
      FROM f
    ),
    itl AS (SELECT doc_id, w, length(w) AS l, i FROM it),
    longest AS (
      -- max_by = LAST maximal under a stable ascending sort:
      -- (l DESC, i DESC) row 1
      SELECT doc_id, w AS longest FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY l DESC, i DESC) AS rn
        FROM itl
      ) t WHERE rn = 1
    ),
    shortest AS (
      -- min_by = FIRST minimal: (l ASC, i ASC) row 1
      SELECT doc_id, w AS shortest FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY l ASC, i ASC) AS rn
        FROM itl
      ) t WHERE rn = 1
    ),
    agg AS (
      SELECT doc_id,
             array_to_string((list(w ORDER BY w ASC, i ASC))[1:3], ',') AS top3,
             CAST(COUNT(*) FILTER (l >= 5) AS BIGINT) AS n_long
      FROM itl GROUP BY doc_id
    ),
    firstw AS (SELECT doc_id, words[1] AS first_w FROM f)
    SELECT f.doc_id, longest, shortest, top3, n_long, first_w
    FROM f
    JOIN longest USING (doc_id)
    JOIN shortest USING (doc_id)
    JOIN agg USING (doc_id)
    JOIN firstw ON f.doc_id = firstw.doc_id
    ORDER BY f.doc_id
    """,
    doc="The object-array jq constructs as ONE compiled program "
    "through the oracle gate: sort_by (stable, tie-checked), "
    "min_by/max_by (first-minimal / last-maximal, jq's "
    "sort-then-pick), map(select(...)), element field access, chained "
    "indexing, and a postfix slice — all Catalyst array lambdas "
    "(compiler/jq.py), no jq binary; the SQL mirror encodes the "
    "stable orders explicitly via (key, original-index) sorts.",
)
def q_jq_object_arrays(spark, sf_dir):
    from optimus_any2any_spark.compiler.jq import translate_jq
    from optimus_any2any_spark.operators.text import tokens

    w = tokens(F.col("text"))
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.transform(
            w,
            lambda x: F.struct(
                x.alias("w"), F.length(x).alias("l")
            ),
        ).alias("items"),
    )
    prog = (
        ".[] | select((.items | length) >= 3) "
        "| {doc_id, "
        "longest: (.items | max_by(.l) | .w), "
        "shortest: (.items | min_by(.l) | .w), "
        "top3: ((.items | sort_by(.w) | map(.w))[0:3] | join(\",\")), "
        "n_long: (.items | map(select(.l >= 5)) | length), "
        "first_w: .items[0].w}"
    )
    return translate_jq(d, prog).orderBy("doc_id")


@register(
    "q_jq_builtins_fanout",
    oracle=r"""
    WITH src AS (
      SELECT doc_id, lang,
             'user' || CAST(doc_id AS VARCHAR) || '@' || lang
                    || '.example.com' AS addr,
             doc_id * 86400 + n_chars AS epoch,
             n_chars
      FROM documents
    ), en AS (
      SELECT doc_id,
             strftime(make_timestamp((doc_id * 86400 + n_chars) * 1000000),
                      '%Y-%m-%dT%H:%M:%SZ') AS day,
             CAST(len(string_split_regex(addr, '[@.]')) AS BIGINT)
               AS nparts,
             CAST(strpos(addr, '@') - 1 AS BIGINT) AS pos,
             CAST(round(n_chars / 7.0) AS BIGINT) AS rounded
      FROM src
    )
    SELECT doc_id, day, nparts, pos, rounded FROM en
    UNION ALL
    SELECT doc_id, 'string' AS day, nparts, pos, rounded FROM en
    ORDER BY doc_id, day
    """,
    doc="The round-3b native jq builtins as ONE compiled program "
    "through the oracle gate: todate on a derived epoch, regex "
    "split/2, index(), round on a real quotient, type, and the comma "
    "operator's two-branch fan-out (union of branch projections) — "
    "all Catalyst (compiler/jq.py), no jq binary, value-exact vs the "
    "SQL re-expression. The epoch/round arithmetic never lands on a "
    "representable .5 boundary (n/7 cannot be x.5 for integer n), so "
    "the double rounding agrees bit-for-bit across engines.",
)
def q_jq_builtins_fanout(spark, sf_dir):
    from optimus_any2any_spark.compiler.jq import translate_jq

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("user"),
            F.col("doc_id").cast("string"),
            F.lit("@"),
            F.col("lang"),
            F.lit(".example.com"),
        ).alias("addr"),
        (F.col("doc_id") * 86400 + F.col("n_chars")).alias("epoch"),
        F.col("n_chars"),
    )
    prog = (
        '.[] | .day = (.epoch | todate) '
        '| .nparts = (.addr | split("[@.]"; "") | length) '
        '| .pos = (.addr | index("@")) '
        "| .rounded = ((.n_chars / 7) | round) "
        "| {doc_id, day, nparts, pos, rounded}, "
        "{doc_id, day: (.day | type), nparts, pos, rounded}"
    )
    out = translate_jq(d, prog)
    return out.select(
        "doc_id",
        "day",
        F.col("nparts").cast("long").alias("nparts"),
        F.col("pos").cast("long").alias("pos"),
        F.col("rounded").cast("long").alias("rounded"),
    ).orderBy("doc_id", "day")


@register(
    "q_jq_generator_limit",
    oracle="""
    WITH uniq AS (
      SELECT DISTINCT l_orderkey AS okey,
             CAST(l_linenumber AS BIGINT) AS ln,
             l_quantity AS qty
      FROM lineitem
    ),
    items AS (
      SELECT okey, ln, qty,
             row_number() OVER (
               PARTITION BY okey ORDER BY ln, qty
             ) AS rn
      FROM uniq
    )
    SELECT okey, ln, qty FROM items
    WHERE rn <= 3 AND qty > 25
    ORDER BY okey, ln, qty
    """,
    doc="Native jq GENERATOR fan-out with truncation (VERDICT r8 item "
    "4) as ONE compiled program through the oracle gate: per order, "
    "the lineitems roll up into a sorted array<struct> column, then "
    "`.[] | limit(3; .items[]) | select(.qty > 25) | {okey, ln, "
    "qty}` compiles to an array slice + explode + filter + "
    "projection — each element flows through the downstream stages "
    "as its own record, all Catalyst (compiler/jq.py _apply_fanout), "
    "no jq binary. jq 1.6's limit(n<=0) bug class stays on the "
    "binary (probed; only positive literal counts compile). Plan "
    "pinned Python-free in tests/test_plan_quality.py.",
    bench=True,
)
def q_jq_generator_limit(spark, sf_dir):
    from optimus_any2any_spark.compiler.jq import translate_jq

    # distinct triples make the per-order element order total: the
    # synthetic lineitem repeats l_linenumber within an order, and a
    # truncating generator is only engine-comparable when the sort
    # key it truncates under is unique
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").cast("long").alias("ln"),
        F.col("l_quantity").alias("qty"),
    ).distinct()
    # sort_array orders the structs lexicographically by field order
    # (ln, qty), making the generator's element order deterministic —
    # collect_list alone is partition-order-dependent
    d = li.groupBy(F.col("okey").alias("gk")).agg(
        F.sort_array(
            F.collect_list(F.struct("ln", "qty", "okey"))
        ).alias("items")
    )
    prog = (
        ".[] | limit(3; .items[]) | select(.qty > 25) "
        "| {okey, ln, qty}"
    )
    return translate_jq(d, prog).orderBy("okey", "ln", "qty")


@register(
    "q_jq_until",
    oracle="""
    WITH src AS (
      SELECT o_orderkey AS k, o_orderkey % 40 AS q FROM orders
    ),
    c AS (
      SELECT k,
             q + 7 * GREATEST(
               0, CAST(CEIL((50 - q) / 7.0) AS BIGINT)
             ) AS q2,
             CAST(FLOOR((11 - (k % 10)) / 3.0) AS BIGINT) + 1 AS wn,
             k % 10 AS m,
             k % 5 AS f
      FROM src
    )
    SELECT k,
           q2 AS q,
           wn,
           CAST(wn * m + (3 * wn * (wn - 1)) / 2 AS BIGINT) AS ws,
           2 * (f + 11) AS r0
    FROM c ORDER BY k
    """,
    doc="Native jq until / [while] / limit(n; repeat(f)) (VERDICT "
    "r11 item 5): the provable bounded-iteration subset — "
    "`. CMP bound` conditions with `. +|- <positive int>` updates — "
    "compiles to EXACT integer closed forms (`until(. >= 50; . + 7)` "
    "is arithmetic-progression algebra, `[while(. < 12; . + 3)]` is "
    "F.sequence, and jq 1.6's repeat does not iterate — probed — so "
    "`[limit(2; repeat(f))]` is array_repeat of f(.)). Directions "
    "that cannot terminate compile to raise_error branches (jq hangs "
    "there); fractional steps, `. * k` updates and `==` conditions "
    "stay on the binary by name. One program exercises all three "
    "through |=, grouped pipes and array aggregation; plan pinned "
    "Python-free in tests/test_jq_transform.py.",
    bench=True,
)
def q_jq_until(spark, sf_dir):
    from optimus_any2any_spark.compiler.jq import translate_jq

    d = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_orderkey") % 40).alias("q"),
    )
    prog = (
        ".[] | .q |= until(. >= 50; . + 7) "
        "| .w = (.k % 10 | [while(. < 12; . + 3)]) "
        "| .r = (.k % 5 | [limit(2; repeat(. + 11))]) "
        "| {k, q, wn: (.w | length), ws: (.w | add), "
        "r0: (.r | add)}"
    )
    out = translate_jq(d, prog)
    return out.select(
        "k",
        F.col("q").cast("long").alias("q"),
        F.col("wn").cast("long").alias("wn"),
        F.col("ws").cast("long").alias("ws"),
        F.col("r0").cast("long").alias("r0"),
    ).orderBy("k")


@register(
    "q_jq_capture_stage",
    oracle="""
    SELECT 'user' || CAST(doc_id AS VARCHAR) AS user_part,
           lang AS dom
    FROM documents
    WHERE doc_id % 7 <> 0
    ORDER BY user_part, dom
    """,
    doc="jq's log-parsing idiom `.field | capture(re)` as a compiled "
    "stage: named-group extraction becomes filter + regexp_extract "
    "projection, and rows the pattern does not match are dropped "
    "exactly like jq's empty stream (every 7th row gets a non-address "
    "string). Pure Catalyst — no jq binary, no Python.",
)
def q_jq_capture_stage(spark, sf_dir):
    from optimus_any2any_spark.compiler.jq import translate_jq

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.lit("not-an-address")
        )
        .otherwise(
            F.concat(
                F.lit("user"),
                F.col("doc_id").cast("string"),
                F.lit("@"),
                F.col("lang"),
                F.lit(".example.com"),
            )
        )
        .alias("addr"),
    )
    prog = (
        '.[] | .addr | capture("(?<user_part>[^@ -]+)@(?<dom>[^.]+)")'
    )
    return translate_jq(d, prog).orderBy("user_part", "dom")


@register(
    "q_jq_paths_defs",
    oracle="""
    WITH src AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN NULL
                  ELSE CAST(length(text) AS BIGINT) END AS len
      FROM documents
    )
    SELECT doc_id,
           CAST(CASE WHEN len IS NULL THEN 4 ELSE 5 END AS INT)
             AS npaths,
           COALESCE(len, 0) * 2 AS len2
    FROM src ORDER BY doc_id
    """,
    doc="The round-5/7/8 native jq constructs as ONE compiled program "
    "through the oracle gate: user defs — zero-arg, call-by-name "
    "parameterized (inlining substitutes the argument tokens at each "
    "occurrence site; probed vs jq 1.6), AND a $value parameter def "
    "(round 8: desugared per jq's own definition to `arg as $x | "
    "body` and applied as a scoped binding group — bind-once "
    "semantics, probed), setpath with a literal path "
    "(compiled to the nested-assignment struct rebuild), delpaths "
    "(compiled to the multi-path del dropFields), a grouped pipe "
    "target (the '| (body)' shape def inlining produces), and "
    "[paths] | length (document-order path arrays over the reshaped "
    "record; null values read as absent — the engine's canonical "
    "serialization relaxation, same as has()/keys). All Catalyst at "
    "runtime — no jq binary, no mapInPandas in the plan (pinned in "
    "tests/test_plan_quality.py).",
    bench=True,
)
def q_jq_paths_defs(spark, sf_dir):
    from optimus_any2any_spark.compiler.jq import translate_jq

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.struct(
            F.col("lang").alias("lang"),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit(None).cast("long")
            )
            .otherwise(F.length("text").cast("long"))
            .alias("len"),
            F.lit("x").alias("junk"),
        ).alias("meta"),
        "text",
    )
    prog = (
        "def scale(f): . * f; def dbl: scale(2); "
        "def finish($l2): "
        "{doc_id, npaths: ([paths] | length), len2: $l2}; .[] "
        '| setpath(["meta","len2"]; ((.meta.len // 0) | dbl)) '
        '| delpaths([["text"],["meta","junk"]]) '
        "| finish(.meta.len2)"
    )
    return translate_jq(d, prog).orderBy("doc_id")


@register(
    "q_jq_entries_bindings",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, lang,
             string_split_regex(trim(text), '\s+') AS words,
             CASE WHEN length(text) % 2 = 0
                  THEN '2021-01-01T00:00:00Z' ELSE 'xx' END AS iso
      FROM documents
    )
    SELECT doc_id, upper(lang) AS lang_u,
           CAST(CASE WHEN iso = '2021-01-01T00:00:00Z'
                     THEN 1609459200 ELSE -1 END AS BIGINT) AS epoch
    FROM w WHERE len(words) >= 3
    ORDER BY doc_id
    """,
    doc="The round-4 native jq constructs as ONE compiled program "
    "through the oracle gate: a stage-level variable binding "
    "(.lang as $l) surviving a with_entries reshape (key-only select "
    "+ .key |= ascii_upcase — the key half evaluated by the real jq "
    "binary per COLUMN at compile time, compiler/jq.py "
    "_jq_eval_static), and try/catch over fromdate compiled to "
    "coalesce on the provable error⇔null class. All Catalyst at "
    "runtime — no jq binary in the plan, verified value-exact "
    "against the SQL re-expression.",
)
def q_jq_entries_bindings(spark, sf_dir):
    from optimus_any2any_spark.compiler.jq import translate_jq
    from optimus_any2any_spark.operators.text import tokens

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        tokens(F.col("text")).alias("words"),
        F.when(
            F.length("text") % 2 == 0, F.lit("2021-01-01T00:00:00Z")
        )
        .otherwise(F.lit("xx"))
        .alias("iso"),
    )
    prog = (
        ".[] | .lang as $l "
        "| select((.words | length) >= 3) "
        '| with_entries(select(.key != "words" and .key != "lang") '
        "| .key |= ascii_upcase) "
        "| {doc_id: .DOC_ID, lang_u: ($l | ascii_upcase), "
        "epoch: (try (.ISO | fromdate) catch -1)}"
    )
    return translate_jq(d, prog).orderBy("doc_id")


@register(
    "q_jq_recursive_descent",
    oracle="""
    WITH src AS (
      SELECT doc_id, lang,
             CASE WHEN doc_id % 4 = 0 THEN NULL
                  ELSE 'cat' || CAST(doc_id % 4 AS VARCHAR) END AS cat,
             upper(lang) AS lang2,
             CASE WHEN doc_id % 5 = 0 THEN NULL
                  ELSE 't' || CAST(doc_id % 5 AS VARCHAR) END AS tag,
             CASE WHEN doc_id % 6 = 0 THEN NULL
                  ELSE CAST(length(text) AS BIGINT) END AS n_chars,
             CASE WHEN doc_id % 3 = 0 THEN 'meta'
                  WHEN doc_id % 3 = 1 THEN 'aux'
                  ELSE 'nope' END AS k1,
             CASE WHEN doc_id % 2 = 0 THEN 'lang'
                  ELSE 'tag' END AS k2
      FROM documents
    )
    SELECT doc_id,
           concat_ws(',', lang, cat, lang2, tag, lang, tag, k1, k2)
             AS all_strs,
           CAST(5 + CASE WHEN cat IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN tag IS NULL THEN 0 ELSE 2 END
                AS BIGINT) AS n_strs,
           doc_id + COALESCE(n_chars, 0) AS nums_sum,
           CASE WHEN k1 = 'meta' AND k2 = 'lang' THEN lang
                WHEN k1 = 'aux' AND k2 = 'tag' THEN tag
           END AS v
    FROM src ORDER BY doc_id
    """,
    doc="The round-10 native jq constructs (VERDICT r9 item 3) as ONE "
    "compiled program through the oracle gate: `[.. | strings]` and "
    "`[.. | numbers]` — recursive descent with a type filter, "
    "compiled as the schema-order leaf census (pre-order document "
    "walk incl. array elements and structs inside arrays; null "
    "object fields absent, null array elements dropped by the type "
    "test — both probed vs jq 1.6) — and getpath([.k1, .k2]) with "
    "DYNAMIC path elements: a CASE chain over the static depth-2 "
    "path set, missing keys → null (probed), keys naming scalar "
    "fields → null (the documented total-path relaxation; jq "
    "errors). join/length/add consume the census arrays natively. "
    "All Catalyst — no jq binary, no Python (pinned in "
    "tests/test_plan_quality.py).",
    bench=True,
)
def q_jq_recursive_descent(spark, sf_dir):
    from optimus_any2any_spark.compiler.jq import translate_jq

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.struct(
            F.col("lang").alias("lang"),
            F.when(F.col("doc_id") % 4 == 0, F.lit(None).cast("string"))
            .otherwise(F.concat(F.lit("cat"), (F.col("doc_id") % 4)
                                .cast("string")))
            .alias("cat"),
        ).alias("meta"),
        F.struct(
            F.upper("lang").alias("lang2"),
            F.when(F.col("doc_id") % 5 == 0, F.lit(None).cast("string"))
            .otherwise(F.concat(F.lit("t"), (F.col("doc_id") % 5)
                                .cast("string")))
            .alias("tag"),
        ).alias("aux"),
        F.when(F.col("doc_id") % 6 == 0, F.lit(None).cast("long"))
        .otherwise(F.length("text").cast("long"))
        .alias("n_chars"),
        F.array(
            F.col("lang"),
            F.when(F.col("doc_id") % 5 == 0, F.lit(None).cast("string"))
            .otherwise(F.concat(F.lit("t"), (F.col("doc_id") % 5)
                                .cast("string"))),
        ).alias("tags"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("meta"))
        .when(F.col("doc_id") % 3 == 1, F.lit("aux"))
        .otherwise(F.lit("nope"))
        .alias("k1"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("lang"))
        .otherwise(F.lit("tag"))
        .alias("k2"),
    )
    prog = (
        ".[] | {doc_id, "
        'all_strs: ([.. | strings] | join(",")), '
        "n_strs: ([.. | strings] | length), "
        "nums_sum: ([.. | numbers] | add), "
        "v: getpath([.k1, .k2])}"
    )
    return translate_jq(d, prog).select(
        "doc_id",
        "all_strs",
        F.col("n_strs").cast("long").alias("n_strs"),
        F.col("nums_sum").cast("long").alias("nums_sum"),
        "v",
    ).orderBy("doc_id")


@register(
    "q_jq_tostream",
    oracle="""
    WITH src AS (
      SELECT doc_id, COALESCE(lang, 'xx') AS lang,
             CASE WHEN doc_id % 3 = 0 THEN NULL
                  ELSE CAST(length(text) AS BIGINT) END AS len
      FROM documents
    ),
    ev AS (
      SELECT '[["doc_id"],' || doc_id || ']' AS value FROM src
      UNION ALL
      SELECT '[["meta","lang"],"' || lang || '"]' FROM src
      UNION ALL
      SELECT '[["meta","len"],' || len || ']' FROM src
      WHERE len IS NOT NULL
      UNION ALL
      SELECT CASE WHEN len IS NULL THEN '[["meta","lang"]]'
                  ELSE '[["meta","len"]]' END FROM src
      UNION ALL
      SELECT '[["meta"]]' FROM src
    )
    SELECT value FROM ev ORDER BY value
    """,
    doc="Native jq TOSTREAM (VERDICT r10 item 8 — the next "
    "binary-bound construct by citation frequency): the streamed "
    "form of each record as one canonical-JSON event text per output "
    "row. The static schema makes the event set enumerable at "
    "compile time (the same finite-path argument as [paths]); "
    "presence (null leaves are ABSENT under the engine's canonical "
    "serialization — the bytes the jq-binary path feeds jq) and each "
    "container's closing event's last-present-child path resolve via "
    "CASE chains at runtime; events explode into the ragged `value` "
    "representation the binary path itself emits. Probed 1.6 edges: "
    "empty containers are leaves ([[\"a\"],{}], no own close), "
    "scalars/empty at top emit [[],v] with no close, close events "
    "carry the LAST PRESENT child's path. Fail-closed: arrays/maps "
    "(numeric path elements) and fractional leaves (to_json vs jq "
    "number re-printing) stay on the binary. Oracle: the same event "
    "texts as SQL string construction. Differential+hypothesis vs "
    "jq 1.6 in tests/test_jq_property.py; Python-free plan pinned.",
    bench=True,
)
def q_jq_tostream(spark, sf_dir):
    from optimus_any2any_spark.compiler.jq import translate_jq

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.struct(
            F.coalesce(F.col("lang"), F.lit("xx")).alias("lang"),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit(None).cast("long")
            )
            .otherwise(F.length("text").cast("long"))
            .alias("len"),
        ).alias("meta"),
    )
    return translate_jq(d, "tostream").orderBy("value")
