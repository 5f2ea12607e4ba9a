"""Tokenizer-training queries: distributed BPE, oracle-verified.

The iterative trainer itself is hash-gated: the DuckDB oracle unrolls
the same three merge steps over the same word-frequency table, using
the identical wrapped-symbol ``replace`` trick (see
operators/tokenizer.py for why plain non-overlapping replace IS greedy
BPE application). Beyond-reference — the reference engine has no
tokenizer surface; this is the LLM-pipeline layer of SURVEY.md §7.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from optimus_any2any_spark.queries import register
from optimus_any2any_spark.queries.util import load

_WC = """
    words AS (
      SELECT w FROM (
        SELECT unnest(string_split_regex(
                 lower(coalesce(text, '')), '\\s+')) AS w
        FROM documents
      ) WHERE regexp_matches(w, '^[a-z]+$')
    ),
    wc AS (SELECT w, COUNT(*) AS cnt FROM words GROUP BY w),
    s0 AS (
      SELECT w, cnt, regexp_replace(w, '(.)', '<\\1>', 'g') AS seq
      FROM wc
    )
"""


def _o_step(i: int) -> str:
    """One unrolled oracle merge step: pair counts → argmax → apply."""
    prev = f"s{i - 1}"
    return f"""
    p{i} AS (
      SELECT cs[i] AS l, cs[i+1] AS r, SUM(cnt) AS total
      FROM (
        SELECT cnt,
               string_split(seq[2:len(seq)-1], '><') AS cs
        FROM {prev}
      ), UNNEST(generate_series(1, len(cs)-1)) AS u(i)
      WHERE len(cs) >= 2
      GROUP BY l, r
    ),
    b{i} AS (
      SELECT l, r, total FROM p{i}
      ORDER BY total DESC, l, r LIMIT 1
    ),
    s{i} AS (
      SELECT w, cnt,
             replace(seq, '<' || b.l || '><' || b.r || '>',
                     '<' || b.l || b.r || '>') AS seq
      FROM {prev}, b{i} AS b
    )
    """


@register(
    "tokenizer_bpe_merges",
    oracle="WITH "
    + _WC
    + ","
    + ",".join(_o_step(i) for i in (1, 2, 3))
    + """
    SELECT step,
           l AS left_sym,
           r AS right_sym,
           l || r AS merged,
           CAST(total AS BIGINT) AS pair_count
    FROM (
      SELECT 1 AS step, * FROM b1
      UNION ALL SELECT 2, * FROM b2
      UNION ALL SELECT 3, * FROM b3
    )
    ORDER BY step
    """,
    doc="Distributed BPE tokenizer training (operators/tokenizer.py, "
    "Sennrich et al. 2016): one corpus-scale word-count shuffle, then "
    "three merge iterations at VOCABULARY scale — pair-count aggregate "
    "(map-side combined), deterministic 1-row argmax (count desc, "
    "lexicographic tie-break), broadcast-1-row replace application. "
    "The oracle unrolls the identical three steps in SQL; both engines "
    "share the wrapped-symbol replace trick, so greedy merge "
    "application semantics are bit-identical. Beyond-reference.",
    bench=True,
)
def tokenizer_bpe_merges(spark, sf_dir):
    from optimus_any2any_spark.operators.tokenizer import bpe_merge_steps
    from optimus_any2any_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(load(spark, sf_dir, "documents"), "doc_id")
    return bpe_merge_steps(docs, "text", n_merges=3)


_ENC_MERGES = [("t", "a"), ("b", "l"), ("ta", "bl")]

_O_ENC_SEQ = """
      replace(replace(replace(replace(
        regexp_replace(trim(regexp_replace(
          lower(coalesce(text, '')), '[^a-z ]', '', 'g')),
          '(.)', '<\\1>', 'g'),
        '< >', '|'),
        '<t><a>', '<ta>'),
        '<b><l>', '<bl>'),
        '<ta><bl>', '<tabl>')
"""


@register(
    "tokenizer_bpe_encode",
    oracle=f"""
    WITH enc AS (
      SELECT doc_id,
             list_filter(
               flatten(list_transform(
                 string_split({_O_ENC_SEQ}, '|'),
                 ws -> string_split(
                   regexp_replace(ws, '^<|>$', '', 'g'), '><')
               )),
               t -> t <> ''
             ) AS toks
      FROM documents
    ),
    tok AS (SELECT unnest(toks) AS t FROM enc)
    SELECT
      (SELECT COUNT(*) FROM enc) AS n_docs,
      (SELECT CAST(SUM(len(toks)) AS BIGINT) FROM enc) AS total_tokens,
      (SELECT COUNT(DISTINCT t) FROM tok) AS distinct_tokens,
      (SELECT t FROM tok GROUP BY t
       ORDER BY COUNT(*) DESC, t LIMIT 1) AS top_token
    """,
    doc="BPE inference over the corpus with a fixed trained merge list "
    "(operators/tokenizer.py bpe_encode): merges applied in training "
    "order as chained replace expressions — zero shuffle until the "
    "final aggregate, no Python. The oracle replays the same chain in "
    "SQL. Beyond-reference.",
)
def tokenizer_bpe_encode(spark, sf_dir):
    from optimus_any2any_spark.operators.tokenizer import bpe_encode
    from optimus_any2any_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(load(spark, sf_dir, "documents"), "doc_id")
    enc = bpe_encode(docs, _ENC_MERGES, "text").persist()
    toks = enc.select(F.explode("bpe_tokens").alias("t"))
    top = (
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "t")
        .limit(1)
        .select("t")
    )
    agg = enc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("bpe_token_count").alias("total_tokens"),
    )
    distinct = toks.agg(
        F.countDistinct("t").alias("distinct_tokens")
    )
    return (
        agg.crossJoin(distinct)
        .crossJoin(top.withColumnRenamed("t", "top_token"))
    )
