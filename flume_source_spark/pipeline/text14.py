"""Text wave 14 (round 12): Good-Turing frequency smoothing — the
count-of-counts table and the adjusted counts r* every smoothed LM
(Katz backoff, simple Good-Turing) is built from (Good 1953).

Over the corpus TRIGRAM table (the n-gram grain Katz backoff actually
smooths — and the grain with a populated low-frequency tail: the
fixture vocabulary is a closed ~31-word set where every unigram
occurs hundreds of times, while ~57% of trigram types are singletons),
with N_r = the number of trigram types seen exactly r times:

    r* = (r + 1) · N_{r+1} / N_r        (adjusted count)
    p₀ = N_1 / N                        (unseen-type probability mass)

both published in exact floored integer ppm. The companion intuition
check — r* < r at small r on natural text (probability mass flows
from seen to unseen) — is pinned by a model test.

Scale shape: trigram counts collapse map-side (explode + combine, the
text_bigram_lm grain); the count-of-counts table is then grouped BY
FREQUENCY — but instead of windowing over all distinct frequencies
(which grow with the corpus and would eventually feed a corpus-derived
table through one task), the published table is CAPPED at r ≤
GT_MAX_R *before* any per-row work, and N_{r+1} comes from a
broadcast self-join on r+1 (no window at all; N_{r+1} = 0 when no
type has that count — the textbook gap case — via coalesce on the
left join). Everything after the n-gram combine is ≤ GT_MAX_R + 1
rows. Good-Turing is only ever USED at small r (past ~10 the MLE is
already reliable — Gale & Sampson 1995), so the cap is the estimator
convention, not a shortcut.

Reference parity note: the reference engine (`CephFsSource.java`) has
no text surface; this operator belongs to the declared [NS] engine
surface (SURVEY.md §2.2, text/LM family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

GT_MAX_R = 20

_GOOD_TURING_ORACLE = f"""
    WITH toks AS (
        SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                           x -> length(x) > 0) AS t
        FROM documents
    ),
    tg AS (
        SELECT t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS g
        FROM (SELECT t, unnest(generate_series(1, len(t) - 2)) AS i
              FROM toks)
    ),
    wc AS (SELECT g, count(*) AS cnt FROM tg GROUP BY g),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_tokens FROM wc),
    cc AS (
        SELECT CAST(cnt AS BIGINT) AS r, CAST(count(*) AS BIGINT) AS n_r
        FROM wc WHERE cnt <= {GT_MAX_R} + 1 GROUP BY cnt
    ),
    capped AS (SELECT r, n_r FROM cc WHERE r <= {GT_MAX_R})
    SELECT a.r,
           a.n_r,
           CAST(coalesce(b.n_r, 0) AS BIGINT) AS n_r_next,
           CAST(((a.r + 1) * coalesce(b.n_r, 0) * 1000000) // a.n_r
                AS BIGINT) AS r_star_ppm,
           CAST((SELECT (coalesce((SELECT n_r FROM cc WHERE r = 1), 0)
                         * 1000000) // n_tokens FROM tot) AS BIGINT)
               AS p0_ppm
    FROM capped a LEFT JOIN cc b ON b.r = a.r + 1
    ORDER BY a.r
"""


def good_turing_counts(docs: DataFrame, max_r: int = GT_MAX_R) -> DataFrame:
    """Core fold over a (doc_id, text) frame: trigram count →
    capped count-of-counts → broadcast (r+1) self-join → exact ppm
    adjusted counts + the unseen-mass estimate. Factored so
    closed-form model tests (a planted vocabulary with known N_r; the
    gap case N_{r+1} = 0 → r* = 0; r* < r at small r on natural
    text) drive the production stages."""
    toks = docs.select(
        F.filter(
            F.split(F.lower("text"), "[^a-z]+"), lambda x: F.length(x) > 0
        ).alias("t")
    ).filter(F.size("t") >= 3)
    tg = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 3),"
                " i -> concat_ws(' ', t[i], t[i + 1], t[i + 2]))"
            )
        ).alias("g")
    )
    wc = tg.groupBy("g").agg(F.count("*").alias("cnt"))
    tot = wc.agg(F.sum("cnt").cast("long").alias("n_tokens"))
    cc = (
        wc.filter(F.col("cnt") <= max_r + 1)
        .groupBy(F.col("cnt").cast("long").alias("r"))
        .agg(F.count("*").cast("long").alias("n_r"))
    )
    capped = cc.filter(F.col("r") <= max_r)
    nxt = cc.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_next"))
    n1 = cc.filter(F.col("r") == 1).agg(
        F.coalesce(F.sum("n_r"), F.lit(0)).alias("n_1")
    )
    p0 = tot.crossJoin(F.broadcast(n1)).select(
        F.expr("CAST((n_1 * 1000000) div n_tokens AS BIGINT)").alias("p0_ppm")
    )
    return (
        capped.join(F.broadcast(nxt), "r", "left")
        .select(
            "r",
            "n_r",
            F.coalesce(F.col("n_r_next"), F.lit(0)).cast("long").alias("n_r_next"),
        )
        .withColumn(
            "r_star_ppm",
            F.expr("CAST(((r + 1) * n_r_next * 1000000) div n_r AS BIGINT)"),
        )
        .crossJoin(F.broadcast(p0))
        .orderBy("r")
    )


@query(
    "text_good_turing",
    oracle=_GOOD_TURING_ORACLE,
    tags=("llm", "text", "lm", "stats"),
)
def text_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing smoothing table over the corpus trigram vocabulary:
    for each frequency r ≤ 20, the count-of-counts N_r, N_{r+1}, and
    the adjusted count r* = (r+1)·N_{r+1}/N_r in exact floored ppm,
    plus the unseen-mass estimate p₀ = N_1/N — the numbers a
    Katz-backoff LM reads off the corpus before assigning probability
    to unseen n-grams."""
    d = load_tables(spark, sf_dir)["documents"]
    return good_turing_counts(d.select("doc_id", "text"))
