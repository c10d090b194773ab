"""Text wave 5: Gopher-style document quality rules.

``text_gopher_rules`` applies the published Gopher (Rae et al. 2021,
"Scaling Language Models: ... & Analysis" §A1.1) repetition/format
heuristics per document:

- mean word length within [3, 10]
- ≥ 80 % of words contain an alphabetic character
- top-token fraction (most frequent token / n_tokens) ≤ 0.20 —
  the single-word repetition rule
- ≥ 2 distinct common stopwords present

Everything is higher-order-function expression work over the split
token array — no explode, no shuffle, no UDF: per-document quality is
embarrassingly parallel, which is the whole point at 100 TB (the
filter runs in the scan stage, before any exchange).

The top-token count is O(distinct × n) per doc as written (HOF
lambdas re-scan the array); for very long documents the
explode → (doc, token) count → max-per-doc window is the same result
with linear per-doc cost — that shape already exists in this repo as
``text_vocab_topk``'s first stage, so the swap is mechanical if doc
length grows beyond ~10³ tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.dedup import spread
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

MEAN_LEN_LO, MEAN_LEN_HI = 3.0, 10.0
ALPHA_MIN = 0.80
TOP_TOKEN_MAX = 0.20
STOP_MIN = 2
_STOP = ["the", "a", "of", "and", "to", "in", "is", "value", "data", "key"]

_GOPHER_ORACLE = f"""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(round(list_sum(list_transform(toks, t -> length(t))) * 1.0
                      / len(toks), 4) AS DOUBLE) AS mean_word_len,
           CAST(round(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
                      * 1.0 / len(toks), 4) AS DOUBLE) AS alpha_frac,
           CAST(round(list_max(list_transform(list_distinct(toks),
                      d -> len(list_filter(toks, x -> x = d)))) * 1.0
                      / len(toks), 4) AS DOUBLE) AS top_token_frac,
           CAST(len(list_intersect(list_distinct(toks),
                    ['the','a','of','and','to','in','is','value','data','key']))
                AS BIGINT) AS n_stopwords,
           (list_sum(list_transform(toks, t -> length(t))) * 1.0 / len(toks)
                BETWEEN {MEAN_LEN_LO} AND {MEAN_LEN_HI}
            AND len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
                * 1.0 / len(toks) >= {ALPHA_MIN}
            AND list_max(list_transform(list_distinct(toks),
                    d -> len(list_filter(toks, x -> x = d)))) * 1.0
                / len(toks) <= {TOP_TOKEN_MAX}
            AND len(list_intersect(list_distinct(toks),
                    ['the','a','of','and','to','in','is','value','data','key']))
                >= {STOP_MIN}) AS passes_gopher
    FROM t ORDER BY doc_id
"""


@query("text_gopher_rules", oracle=_GOPHER_ORACLE, tags=("llm", "text", "quality"))
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules per document — mean word length, alpha-word
    fraction, top-token repetition fraction, stopword presence, and
    the composite keep flag. Pure per-row HOF expressions: zero
    shuffles before the (presentation) sort."""
    d = spread(load_tables(spark, sf_dir)["documents"])
    toks = F.split("text", " ")
    n = F.size(toks)
    tok_len_sum = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    mean_len = tok_len_sum / n
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / n
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda dtok: F.size(F.filter(toks, lambda x: x == dtok)),
        )
    )
    top_frac = top_cnt / n
    stop = F.array(*[F.lit(s) for s in _STOP])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop)).cast("long")
    passes = (
        mean_len.between(MEAN_LEN_LO, MEAN_LEN_HI)
        & (alpha >= ALPHA_MIN)
        & (top_frac <= TOP_TOKEN_MAX)
        & (n_stop >= STOP_MIN)
    )
    return (
        d.select(
            "doc_id",
            n.cast("long").alias("n_tokens"),
            F.round(mean_len, 4).cast("double").alias("mean_word_len"),
            F.round(alpha, 4).cast("double").alias("alpha_frac"),
            F.round(top_frac, 4).cast("double").alias("top_token_frac"),
            n_stop.alias("n_stopwords"),
            passes.alias("passes_gopher"),
        )
        .orderBy("doc_id")
    )


_LOGPROB_ORACLE = """
    WITH tok AS (
        SELECT doc_id, unnest(str_split(text, ' ')) AS t FROM documents
    ),
    uni AS (
        SELECT t, count(*) AS c FROM tok GROUP BY t
    ),
    tot AS (SELECT sum(c) AS n FROM uni)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(round(sum(-ln(c * 1.0 / n)) / count(*), 4) AS DOUBLE) AS mean_nll,
           CAST(round(exp(sum(-ln(c * 1.0 / n)) / count(*)), 2) AS DOUBLE) AS unigram_ppl
    FROM tok, uni, tot
    WHERE tok.t = uni.t
    GROUP BY doc_id
    ORDER BY doc_id
"""


@query("text_unigram_logprob", oracle=_LOGPROB_ORACLE, tags=("llm", "text", "quality"))
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity proxy per document: mean negative
    log-likelihood of the doc's tokens under the corpus unigram
    distribution (the cheap stand-in for model-based perplexity
    filtering — a standard pretraining quality signal; docs full of
    corpus-rare tokens score high). Two shuffles total: the unigram
    count (map-side combinable) and the per-doc aggregate after a
    token-keyed join; the unigram table is tiny relative to the corpus
    (vocab-sized) and broadcast-joins back to the token stream."""
    d = spread(load_tables(spark, sf_dir)["documents"])
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    uni = tok.groupBy("t").agg(F.count("*").alias("c"))
    total = uni.agg(F.sum("c").alias("n"))
    nll = -F.log(F.col("c") / F.col("n"))
    return (
        tok.join(F.broadcast(uni), "t")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum(nll) / F.count("*"), 4).cast("double").alias("mean_nll"),
            F.round(F.exp(F.sum(nll) / F.count("*")), 2).cast("double").alias("unigram_ppl"),
        )
        .orderBy("doc_id")
    )


MIN_TOKENS = 20

_CASCADE_ORACLE = f"""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
    f AS (
        SELECT doc_id,
               len(toks) >= {MIN_TOKENS} AS r1,
               list_sum(list_transform(toks, t -> length(t))) * 1.0 / len(toks)
                   BETWEEN {MEAN_LEN_LO} AND {MEAN_LEN_HI} AS r2,
               list_max(list_transform(list_distinct(toks),
                   d -> len(list_filter(toks, x -> x = d)))) * 1.0 / len(toks)
                   <= {TOP_TOKEN_MAX} AS r3,
               len(list_intersect(list_distinct(toks),
                   ['the','a','of','and','to','in','is','value','data','key']))
                   >= {STOP_MIN} AS r4
        FROM t
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n0,
               CAST(count_if(NOT r1) AS BIGINT) AS d1,
               CAST(count_if(r1 AND NOT r2) AS BIGINT) AS d2,
               CAST(count_if(r1 AND r2 AND NOT r3) AS BIGINT) AS d3,
               CAST(count_if(r1 AND r2 AND r3 AND NOT r4) AS BIGINT) AS d4
        FROM f
    )
    SELECT * FROM (
        SELECT 1 AS stage, 'min_tokens' AS rule, n0 AS n_in, d1 AS n_dropped, n0 - d1 AS n_out FROM agg
        UNION ALL
        SELECT 2, 'mean_word_len', n0 - d1, d2, n0 - d1 - d2 FROM agg
        UNION ALL
        SELECT 3, 'top_token_frac', n0 - d1 - d2, d3, n0 - d1 - d2 - d3 FROM agg
        UNION ALL
        SELECT 4, 'stopwords', n0 - d1 - d2 - d3, d4, n0 - d1 - d2 - d3 - d4 FROM agg
    ) ORDER BY stage
"""


@query("ds_quality_cascade", oracle=_CASCADE_ORACLE, tags=("llm", "text", "quality", "dataset"))
def ds_quality_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential quality-filter cascade with per-rule drop accounting
    — the funnel report every corpus-curation run logs (how many docs
    each rule removed, in order, so rule cost/benefit is attributable).
    One corpus scan computes all rule flags (pure HOF expressions),
    one global aggregate computes every stage's drop count; the 4-row
    funnel is assembled from that single aggregated row — the report
    shape is O(rules), independent of corpus size."""
    d = spread(load_tables(spark, sf_dir)["documents"])
    toks = F.split("text", " ")
    n = F.size(toks)
    tok_len_sum = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    mean_len = tok_len_sum / n
    top_cnt = F.array_max(
        F.transform(F.array_distinct(toks), lambda dt: F.size(F.filter(toks, lambda x: x == dt)))
    )
    stop = F.array(*[F.lit(s) for s in _STOP])
    flags = d.select(
        (n >= MIN_TOKENS).alias("r1"),
        mean_len.between(MEAN_LEN_LO, MEAN_LEN_HI).alias("r2"),
        ((top_cnt / n) <= TOP_TOKEN_MAX).alias("r3"),
        (F.size(F.array_intersect(F.array_distinct(toks), stop)) >= STOP_MIN).alias("r4"),
    )
    agg = flags.agg(
        F.count("*").alias("n0"),
        F.count_if(~F.col("r1")).alias("d1"),
        F.count_if(F.col("r1") & ~F.col("r2")).alias("d2"),
        F.count_if(F.col("r1") & F.col("r2") & ~F.col("r3")).alias("d3"),
        F.count_if(F.col("r1") & F.col("r2") & F.col("r3") & ~F.col("r4")).alias("d4"),
    )
    n0, d1, d2, d3, d4 = (F.col(c) for c in ("n0", "d1", "d2", "d3", "d4"))
    stages = [
        (1, "min_tokens", n0, d1),
        (2, "mean_word_len", n0 - d1, d2),
        (3, "top_token_frac", n0 - d1 - d2, d3),
        (4, "stopwords", n0 - d1 - d2 - d3, d4),
    ]
    rows = [
        agg.select(
            F.lit(i).alias("stage"),
            F.lit(name).alias("rule"),
            n_in.alias("n_in"),
            dropped.alias("n_dropped"),
            (n_in - dropped).alias("n_out"),
        )
        for i, name, n_in, dropped in stages
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("stage")
