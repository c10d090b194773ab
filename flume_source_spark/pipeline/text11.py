"""Text wave 11: BM25 ranked retrieval.

``text_bm25_topk`` completes the retrieval family: ``text_tfidf_topk``
ranks tokens within a document, ``text_inverted_index`` materializes
the posting lists, and this operator is the missing consumer — the
ranked-retrieval primitive itself (Robertson/Sparck-Jones BM25, the
default first-stage ranker in every production retrieval stack and
the standard quality-filter scorer for "does this document match a
reference corpus" curation passes).

All scoring is exact BIGINT (the house exact-twin arithmetic): with
k1 = 6/5 and b = 3/4 the BM25 term saturation is a rational function,
so multiplying through by the denominators gives

    tf_ppm  = floor(1e6 · 44·tf·avgdl_pm
                    / (20·tf·avgdl_pm + 6·avgdl_pm + 18000·dl))
    idf_pm  = floor(1e3 · (2N − 2df + 1) / (2df + 1))
    score   = tf_ppm · idf_pm

where avgdl_pm = floor(1000·L/N) quantizes the corpus average
document length to milli-tokens (documented, deterministic, identical
on both engines). idf is Robertson's odds WITHOUT the log — for a
single query term the log is a monotone per-term constant, so the
per-term ranking is exactly classic BM25's; the log only changes
rankings when summing multi-term scores (noted, out of scope for the
per-term top-k contract).

Reference parity note: the reference engine (cas-bigdatalab
flume-source, CephFSEventReader.java) exposes no retrieval operators;
this is part of the [NS] LLM-pipeline surface (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flume_source_spark.pipeline.dedup import spread
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# Query panel: the top-BM25_PANEL tokens by document frequency
# (df desc, tok asc — deterministic), i.e. the heaviest posting lists,
# which is the WORST case for the ranking stage and therefore the
# honest benchmark shape. Top-K docs per term, ties broken by doc_id.
BM25_PANEL = 8
BM25_K = 5

_BM25_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, tok
        FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> ''
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
    stats AS (
        SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
               CAST((1000 * (SELECT SUM(dl) FROM dl))
                    // (SELECT COUNT(*) FROM documents) AS BIGINT) AS avgdl_pm
    ),
    dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
    panel AS (SELECT tok, df FROM dfq ORDER BY df DESC, tok LIMIT {BM25_PANEL}),
    scored AS (
        SELECT p.tok AS qtok, t.doc_id, t.tf, d.dl,
               ((1000000 * 44 * t.tf * s.avgdl_pm)
                // (20 * t.tf * s.avgdl_pm + 6 * s.avgdl_pm + 18000 * d.dl))
               * ((1000 * (2 * s.n_docs - 2 * p.df + 1)) // (2 * p.df + 1))
               AS score
        FROM tf t
        JOIN panel p ON t.tok = p.tok
        JOIN dl d ON t.doc_id = d.doc_id
        CROSS JOIN stats s
    ),
    ranked AS (
        SELECT qtok, doc_id, tf, dl, score,
               ROW_NUMBER() OVER (PARTITION BY qtok
                                  ORDER BY score DESC, doc_id) AS rnk
        FROM scored
    )
    SELECT qtok, CAST(rnk AS BIGINT) AS rnk, doc_id,
           CAST(tf AS BIGINT) AS tf, CAST(dl AS BIGINT) AS dl,
           CAST(score AS BIGINT) AS score
    FROM ranked WHERE rnk <= {BM25_K}
    ORDER BY qtok, rnk
"""


@query("text_bm25_topk", oracle=_BM25_ORACLE, tags=("llm", "text", "retrieval"))
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K documents per query term under exact-integer BM25
    (k1=1.2, b=0.75, rational-odds idf — see module docstring for the
    derivation and why per-term ranking equals classic BM25's).

    100 TB shape: ONE corpus-proportional aggregation — the
    (doc, token) term-frequency wordcount, map-side combinable, the
    same frame ``text_inverted_index`` materializes as the posting
    base table (at scale: compute once, persist, serve both). It is
    persisted here because three consumers branch from it (document
    lengths, document frequencies, the scored probe) and Spark does
    not deduplicate common subplans. Document length joins back on
    doc_id co-partitioned with the panel-pruned tf probe (the probe is
    ≤ panel·N rows BEFORE the join — the broadcast panel semi-join
    prunes first). Corpus scalars (N, avgdl_pm) travel as a 1-row
    broadcast. The final per-term top-K window partitions on
    BM25_PANEL keys — bounded skew at fixture scale; at 100 TB the
    standard two-phase shape applies (per-partition local top-K, then
    the K·partitions survivors into the global window), which the
    repo's ``window_topk_per_group`` documents; the panel-pruned frame
    here is small enough that the single window is the right plan.

    Integer headroom: 1e6·44·tf·avgdl_pm < 2^63 needs tf·avgdl_pm <
    2.1e11; with avgdl_pm = 1000·(mean tokens/doc), a 10k-token
    average and a 10k-token max tf still leave 20× slack. idf_pm needs
    2·N < 2^53 trivially. The PRODUCT score = tf_ppm·idf_pm is also
    bounded: tf_ppm ≤ 44e6/20 = 2.2e6 always, so score < 2^63 needs
    idf_pm < 4.2e12, i.e. df ≥ N/4.2e9 — satisfied by ANY term with
    document frequency above one-in-4-billion docs, and the panel is
    the TOP-df terms by construction, so the product cannot overflow
    for any panel a top-df selection can produce. All operands
    non-negative (df ≤ N), so Spark ``div`` ≡ DuckDB ``//`` (house
    rule, env-limits)."""
    lazy, tf = _bm25_lazy(spark, sf_dir)
    # materialize the ≤ panel·K-row result eagerly so the corpus-sized
    # tf cache can be RELEASED here instead of leaking one persisted
    # wordcount per builder call (the semdedup_decisions
    # unpersist-after-checkpoint pattern)
    out = lazy.localCheckpoint(eager=True)
    tf.unpersist(blocking=False)
    return out


def _bm25_lazy(spark: SparkSession, sf_dir: str):
    """The un-checkpointed BM25 plan plus its persisted tf frame —
    factored out so the plan-shape tests can inspect the REAL join /
    window plan (the query itself checkpoints, which collapses the
    executed plan to a Scan ExistingRDD)."""
    d = spread(load_tables(spark, sf_dir)["documents"])
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).where(
        F.col("tok") != ""
    )
    # the one corpus-sized frame; three consumers branch from it
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf")).persist()
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    panel = dfq.orderBy(F.col("df").desc(), "tok").limit(BM25_PANEL)
    stats = (
        d.agg(F.count("*").alias("n_docs"))
        .crossJoin(dl.agg(F.sum("dl").alias("l_toks")))
        .select("n_docs", F.expr("(1000 * l_toks) div n_docs").alias("avgdl_pm"))
    )
    scored = (
        tf.join(F.broadcast(panel), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("tok").alias("qtok"),
            "doc_id",
            "tf",
            "dl",
            (
                F.expr(
                    "(1000000 * 44 * tf * avgdl_pm) div "
                    "(20 * tf * avgdl_pm + 6 * avgdl_pm + 18000 * dl)"
                )
                * F.expr("(1000 * (2 * n_docs - 2 * df + 1)) div (2 * df + 1)")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("qtok").orderBy(F.col("score").desc(), "doc_id")
    lazy = (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= BM25_K)
        .select("qtok", "rnk", "doc_id", "tf", "dl", "score")
        .orderBy("qtok", "rnk")
    )
    return lazy, tf


# Multi-term search: fixed literal query, OR semantics, summed
# per-term scores — the actual search-engine request shape (the
# per-term top-K above is the inverted-index primitive it composes).
BM25_QUERY = ("spark", "merge", "window")
BM25_SEARCH_K = 10

_BM25_QUERY_SQL = ", ".join(f"('{t}')" for t in BM25_QUERY)

_BM25_SEARCH_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, tok
        FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> ''
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
    stats AS (
        SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
               CAST((1000 * (SELECT SUM(dl) FROM dl))
                    // (SELECT COUNT(*) FROM documents) AS BIGINT) AS avgdl_pm
    ),
    q(tok) AS (VALUES {_BM25_QUERY_SQL}),
    dfq AS (SELECT tok, COUNT(*) AS df FROM tf
            WHERE tok IN (SELECT tok FROM q) GROUP BY 1),
    scored AS (
        SELECT t.doc_id,
               ((1000000 * 44 * t.tf * s.avgdl_pm)
                // (20 * t.tf * s.avgdl_pm + 6 * s.avgdl_pm + 18000 * d.dl))
               * ((1000 * (2 * s.n_docs - 2 * f.df + 1)) // (2 * f.df + 1))
               AS term_score
        FROM tf t
        JOIN dfq f ON t.tok = f.tok
        JOIN dl d ON t.doc_id = d.doc_id
        CROSS JOIN stats s
    ),
    ranked AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(term_score) AS BIGINT) AS score
        FROM scored GROUP BY doc_id
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
           doc_id, n_terms, score
    FROM ranked
    ORDER BY score DESC, doc_id
    LIMIT {BM25_SEARCH_K}
"""


@query(
    "text_bm25_search", oracle=_BM25_SEARCH_ORACLE, tags=("llm", "text", "retrieval")
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} documents for a fixed multi-term query (OR semantics,
    summed per-term exact-integer BM25 — see ``text_bm25_topk`` for
    the arithmetic; with the rational-odds idf the per-term weights
    differ from log-idf BM25 by a monotone per-term transform, which
    cannot change single-term rankings and is the documented, exactly
    cross-engine-checkable trade for multi-term sums).

    Plan shape vs the per-term top-K: the tf wordcount filters to the
    3 query literals BEFORE any join (pushed into the scan side of the
    agg — the probe frame is ≤ |query|·N rows), document frequencies
    for the query terms are a 3-row broadcast, and the per-document
    rollup is one map-side-combinable sum over ≤ |query| rows per doc.
    The global top-K is a TakeOrdered (sort-limit), never a full
    sort. The tf base is NOT persisted here (unlike the top-K twin's
    three-consumer fan-out): dl and the scored probe both derive from
    it, but the df table only needs the 3 query terms, so the cheaper
    move is recomputing the filtered branch — two scans of the raw
    corpus, zero cached state."""
    d = spread(load_tables(spark, sf_dir)["documents"])
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).where(
        F.col("tok") != ""
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    qtf = tf.where(F.col("tok").isin(*BM25_QUERY))
    dfq = qtf.groupBy("tok").agg(F.count("*").alias("df"))
    stats = (
        d.agg(F.count("*").alias("n_docs"))
        .crossJoin(dl.agg(F.sum("dl").alias("l_toks")))
        .select("n_docs", F.expr("(1000 * l_toks) div n_docs").alias("avgdl_pm"))
    )
    scored = (
        qtf.join(F.broadcast(dfq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.expr(
                    "(1000000 * 44 * tf * avgdl_pm) div "
                    "(20 * tf * avgdl_pm + 6 * avgdl_pm + 18000 * dl)"
                )
                * F.expr("(1000 * (2 * n_docs - 2 * df + 1)) div (2 * df + 1)")
            ).alias("term_score"),
        )
    )
    ranked = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum("term_score").cast("long").alias("score"),
    )
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        ranked.orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_SEARCH_K)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .select("rnk", "doc_id", "n_terms", "score")
        .orderBy("rnk")
    )
