"""Text wave 16 (round 12): interpolated Kneser-Ney bigram
probabilities — Kneser & Ney (1995), the smoothing that made n-gram
LMs competitive and still the reference baseline neural LMs are
compared against (Chen & Goodman 1999 found it uniformly best).

The idea: back off not to unigram FREQUENCY but to unigram
CONTINUATION — how many distinct contexts a word follows. "Francisco"
is frequent but only ever follows "San", so it should get almost no
backoff mass. With absolute discount D and the corpus bigram stream:

    P_KN(w2|w1) = max(c(w1 w2) − D, 0)/c(w1·)
                  + D·N1+(w1 ·)/c(w1·) · N1+(· w2)/N1+(· ·)

Cross-engine exactness: D = 3/4 is RATIONAL, so for observed bigrams
the whole probability is one integer fraction:

    P_KN = [(4·c12 − 3)·N_bb + 3·N1w1·N_cont] / (4·c1·N_bb)

published in exact floored ppm via DECIMAL(38,0)/HUGEINT (headroom:
c12·N_bb·10⁶ ≤ 10³⁸ through ~10¹⁵-token corpora). The MLE ppm rides
along so the discount is visible per row.

Scale shape: three map-side-combinable count aggregates over the
bigram stream (bigram count, context total + distinct-following,
distinct-preceding), a 1-row type-count scalar, the top-30 selection
via orderBy().limit() = TakeOrderedAndProject BEFORE any join, then
the ≤ 30-row frame broadcast against the count tables. The corpus
never joins row-wise; everything after the counts is vocabulary- or
top-k-sized.

Reference parity note: the reference engine (`CephFsSource.java`) has
no text surface; this operator belongs to the declared [NS] engine
surface (SURVEY.md §2.2, text/LM family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_TOPK = 30

_KN_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                           x -> length(x) > 0) AS t
        FROM documents
    ),
    bg AS (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
              FROM toks)
    ),
    bgc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
            FROM bg GROUP BY w1, w2),
    ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
                   CAST(count(*) AS BIGINT) AS n1w1
            FROM bgc GROUP BY w1),
    cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS ncont
             FROM bgc GROUP BY w2),
    nbb AS (SELECT CAST(count(*) AS BIGINT) AS nbb FROM bgc),
    top AS (
        SELECT w1, w2, c12 FROM bgc
        ORDER BY c12 DESC, w1, w2 LIMIT {_TOPK}
    )
    SELECT t.w1, t.w2, t.c12, x.c1, x.n1w1, co.ncont, n.nbb,
           CAST(((4 * CAST(t.c12 AS HUGEINT) - 3) * n.nbb
                 + 3 * CAST(x.n1w1 AS HUGEINT) * co.ncont) * 1000000
                // (4 * CAST(x.c1 AS HUGEINT) * n.nbb) AS BIGINT)
               AS p_kn_ppm,
           CAST(CAST(t.c12 AS HUGEINT) * 1000000 // x.c1 AS BIGINT)
               AS p_mle_ppm
    FROM top t
    JOIN ctx x ON x.w1 = t.w1
    JOIN cont co ON co.w2 = t.w2
    CROSS JOIN nbb n
    ORDER BY t.c12 DESC, t.w1, t.w2
"""


def kneser_ney_bigrams(docs: DataFrame, topk: int = _TOPK) -> DataFrame:
    """Core KN fold over a (doc_id, text) frame: bigram / context /
    continuation counts → top-k bigram selection → exact-ppm
    interpolated KN probability per selected bigram. Factored so
    closed-form model tests (a planted 6-token corpus with
    hand-computed fractions; the discount-vs-MLE inequality) drive
    the production stages."""
    toks = docs.select(
        F.filter(
            F.split(F.lower("text"), "[^a-z]+"), lambda x: F.length(x) > 0
        ).alias("t")
    ).filter(F.size("t") >= 2)
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS w1,"
                " element_at(t, i + 1) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    # bgc feeds FOUR consumers (top-k, context, continuation, the
    # type scalar) — checkpoint the vocabulary²-bounded count table
    # eagerly so the corpus bigram pass runs ONCE, not once per
    # consumer (the embstats3 single-corpus-pass discipline; the 8×
    # probe without this read ~12× — four fanned corpus scans)
    bgc = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c12"))
        .localCheckpoint(eager=True)
    )
    ctx = bgc.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count("*").cast("long").alias("n1w1"),
    )
    cont = bgc.groupBy("w2").agg(F.count("*").cast("long").alias("ncont"))
    nbb = bgc.agg(F.count("*").cast("long").alias("nbb"))
    top = bgc.orderBy(F.col("c12").desc(), "w1", "w2").limit(topk)
    return (
        F.broadcast(top)
        .join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(nbb))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "n1w1",
            "ncont",
            "nbb",
            F.expr(
                "CAST(((4 * CAST(c12 AS DECIMAL(38,0)) - 3) * nbb"
                " + 3 * CAST(n1w1 AS DECIMAL(38,0)) * ncont) * 1000000"
                " div (4 * CAST(c1 AS DECIMAL(38,0)) * nbb) AS BIGINT)"
            ).alias("p_kn_ppm"),
            F.expr(
                "CAST(CAST(c12 AS DECIMAL(38,0)) * 1000000 div c1 AS BIGINT)"
            ).alias("p_mle_ppm"),
        )
        .orderBy(F.col("c12").desc(), "w1", "w2")
    )


@query(
    "text_kneser_ney_bigram",
    oracle=_KN_ORACLE,
    tags=("llm", "text", "lm"),
)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney (D = 3/4) probabilities for the
    corpus's top-30 bigrams, in exact floored ppm alongside the MLE —
    continuation counts, context totals, and the bigram-type scalar
    published per row so the smoothing arithmetic is auditable from
    the output."""
    d = load_tables(spark, sf_dir)["documents"]
    return kneser_ney_bigrams(d.select("doc_id", "text"))


MATTR_W = 25

_MATTR_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                           x -> length(x) > 0) AS t
        FROM documents
    ),
    tok AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos, t[i] AS w,
               CAST(len(t) AS BIGINT) AS n
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
              FROM toks)
    ),
    wins AS (
        SELECT doc_id, n,
               CAST(len(list_distinct(list(w) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN {MATTR_W - 1} PRECEDING AND CURRENT ROW)))
                   AS BIGINT) AS d
        FROM tok
        QUALIFY pos >= {MATTR_W}
    ),
    mattr AS (
        SELECT doc_id,
               CAST(sum(d) * 1000000 // ({MATTR_W} * count(*)) AS BIGINT)
                   AS mattr_ppm
        FROM wins GROUP BY doc_id
    ),
    ttr AS (
        SELECT doc_id, max(n) AS n_tokens,
               CAST(count(DISTINCT w) * 1000000 // max(n) AS BIGINT) AS ttr_ppm
        FROM tok GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_tokens, t.ttr_ppm, m.mattr_ppm
    FROM ttr t LEFT JOIN mattr m ON m.doc_id = t.doc_id
    ORDER BY t.doc_id
"""


def mattr_diversity(docs: DataFrame, w: int = MATTR_W) -> DataFrame:
    """Core lexical-diversity fold over a (doc_id, text) frame:
    plain type-token ratio plus the moving-average TTR (Covington &
    McFall 2010) over ``w``-token windows, both in exact floored ppm
    — MATTR is the TTR variant that does NOT shrink with document
    length, so documents of different sizes are comparable. Factored
    so closed-form model tests (all-same → 1e6/w; all-distinct →
    1e6; period-5 cycle → 5e6/w) drive the production stages.

    Plan: per-doc position windows only (the w-row frame collects a
    bounded token list per row — O(n·w) inside a doc, never
    corpus-derived); the MATTR mean is one exact integer division of
    window-distinct sums. Docs shorter than ``w`` publish NULL MATTR
    (no window completes) with TTR still defined."""
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), "[^a-z]+"), lambda x: F.length(x) > 0
        ).alias("t"),
    ).filter(F.size("t") >= 1)
    tok = toks.select(
        "doc_id",
        F.size("t").cast("long").alias("n"),
        F.posexplode("t").alias("pos0", "w"),
    ).select("doc_id", "n", (F.col("pos0") + 1).alias("pos"), "w")
    fr = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(w - 1), Window.currentRow)
    )
    wins = tok.select(
        "doc_id",
        "pos",
        F.size(F.array_distinct(F.collect_list("w").over(fr))).alias("d"),
    ).filter(F.col("pos") >= w)
    mattr = wins.groupBy("doc_id").agg(
        F.expr(f"CAST(sum(d) * 1000000 div ({w} * count(*)) AS BIGINT)").alias(
            "mattr_ppm"
        )
    )
    ttr = tok.groupBy("doc_id").agg(
        F.max("n").alias("n_tokens"),
        F.expr(
            "CAST(count(DISTINCT w) * 1000000 div max(n) AS BIGINT)"
        ).alias("ttr_ppm"),
    )
    return (
        ttr.join(mattr, "doc_id", "left")
        .select("doc_id", "n_tokens", "ttr_ppm", "mattr_ppm")
        .orderBy("doc_id")
    )


@query(
    "text_mattr_diversity",
    oracle=_MATTR_ORACLE,
    tags=("llm", "text", "quality"),
)
def text_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical diversity: plain TTR and the
    length-invariant moving-average TTR over 25-token windows, both
    exact floored ppm — the repetitiveness signal a quality cascade
    reads next to the Gopher rules."""
    d = load_tables(spark, sf_dir)["documents"]
    return mattr_diversity(d.select("doc_id", "text"))


_BURST_TOPK = 30

_BURSTINESS_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                           x -> length(x) > 0) AS t
        FROM documents
    ),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM toks),
    tc AS (
        SELECT doc_id, x AS w, CAST(count(*) AS BIGINT) AS c
        FROM toks, unnest(t) AS u(x)
        GROUP BY doc_id, x
    ),
    per AS (
        SELECT w,
               CAST(count(*) AS BIGINT) AS df,
               CAST(sum(c) AS BIGINT) AS tf,
               CAST(sum(c * c) AS BIGINT) AS sq
        FROM tc GROUP BY w
    ),
    top AS (
        SELECT w, df, tf, sq FROM per
        ORDER BY tf DESC, w LIMIT {_BURST_TOPK}
    )
    SELECT t.w, t.df, t.tf,
           CAST((CAST(n.n_docs AS HUGEINT) * t.sq - CAST(t.tf AS HUGEINT) * t.tf)
                * 1000000
                // (CAST(n.n_docs AS HUGEINT) * t.tf) AS BIGINT) AS vmr_ppm,
           CAST(t.tf * 1000000 // n.n_docs AS BIGINT) AS mean_count_ppm
    FROM top t CROSS JOIN nd n
    ORDER BY t.tf DESC, t.w
"""


def term_burstiness(docs: DataFrame, topk: int = _BURST_TOPK) -> DataFrame:
    """Core burstiness fold over a (doc_id, text) frame: per-term
    document frequency, total frequency, and the variance-to-mean
    ratio (Fano factor) of per-document counts over ALL documents
    (absent = 0), in exact floored ppm —

        VMR = (N·Σc² − (Σc)²) / (N·Σc)

    Church & Gale (1995): content words are BURSTY (VMR ≫ 1e6 ppm —
    they recur within the documents that use them), function words
    are near-Poisson (VMR ≈ 1e6 ppm). Factored so closed-form model
    tests (a term once in every doc → VMR ppm = 1e6·(N−... exact
    uniform case; a term concentrated in one doc → VMR ≈ its count)
    drive the production stages.

    Scale: one (doc, term) count collapse (map-side combinable), a
    vocabulary-keyed rollup, TakeOrdered top-k BEFORE the 1-row
    n_docs broadcast — the text_vocab_topk shape."""
    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), "[^a-z]+"), lambda x: F.length(x) > 0
        ).alias("t"),
    )
    nd = toks.agg(F.count("*").cast("long").alias("n_docs"))
    tc = toks.select("doc_id", F.explode("t").alias("w")).groupBy(
        "doc_id", "w"
    ).agg(F.count("*").cast("long").alias("c"))
    per = tc.groupBy("w").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("c").cast("long").alias("tf"),
        F.sum(F.expr("c * c")).cast("long").alias("sq"),
    )
    top = per.orderBy(F.col("tf").desc(), "w").limit(topk)
    return (
        F.broadcast(top)
        .crossJoin(F.broadcast(nd))
        .select(
            "w",
            "df",
            "tf",
            F.expr(
                "CAST((CAST(n_docs AS DECIMAL(38,0)) * sq"
                " - CAST(tf AS DECIMAL(38,0)) * tf) * 1000000"
                " div (CAST(n_docs AS DECIMAL(38,0)) * tf) AS BIGINT)"
            ).alias("vmr_ppm"),
            F.expr(
                "CAST(CAST(tf AS DECIMAL(38,0)) * 1000000 div n_docs"
                " AS BIGINT)"
            ).alias("mean_count_ppm"),
        )
        .orderBy(F.col("tf").desc(), "w")
    )


@query(
    "text_term_burstiness",
    oracle=_BURSTINESS_ORACLE,
    tags=("llm", "text", "stats"),
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale burstiness of the corpus's top-30 terms: the
    variance-to-mean ratio of per-document counts in exact floored
    ppm (Poisson = 1e6; content words read far above it), with
    document and total frequencies alongside — the term-level signal
    separating topical vocabulary from boilerplate."""
    d = load_tables(spark, sf_dir)["documents"]
    return term_burstiness(d.select("doc_id", "text"))


_JS_ORACLE = """
    WITH ranked_sources AS (
        SELECT source, count(*) AS c,
               row_number() OVER (ORDER BY count(*) DESC, source) AS rn
        FROM documents GROUP BY source
    ),
    pick AS (SELECT source, rn FROM ranked_sources WHERE rn <= 2),
    tok AS (
        SELECT p.rn, x AS w
        FROM documents d
        JOIN pick p ON p.source = d.source,
        unnest(list_filter(regexp_split_to_array(lower(d.text), '[^a-z]+'),
                           t -> length(t) > 0)) AS u(x)
    ),
    wc AS (
        SELECT w,
               CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN rn = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b
        FROM tok GROUP BY w
    ),
    tot AS (
        SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb
        FROM wc GROUP BY 1 = 1
    ),
    terms AS (
        SELECT CAST(count(*) AS BIGINT) AS vocab,
               sum(CASE WHEN w.a > 0 THEN
                   (CAST(w.a AS DOUBLE) / t.ta / 2)
                   * ln((CAST(w.a AS DOUBLE) / t.ta)
                        / ((CAST(w.a AS DOUBLE) / t.ta
                            + CAST(w.b AS DOUBLE) / t.tb) / 2))
                   ELSE 0 END
                   + CASE WHEN w.b > 0 THEN
                   (CAST(w.b AS DOUBLE) / t.tb / 2)
                   * ln((CAST(w.b AS DOUBLE) / t.tb)
                        / ((CAST(w.a AS DOUBLE) / t.ta
                            + CAST(w.b AS DOUBLE) / t.tb) / 2))
                   ELSE 0 END) AS js
        FROM wc w CROSS JOIN tot t
        GROUP BY 1 = 1
    )
    SELECT vocab AS n_vocab_union,
           CAST(round(js, 4) AS DOUBLE) AS js_nats_r4,
           CAST(round(js / ln(2), 4) AS DOUBLE) AS js_bits_r4
    FROM terms
"""


def js_divergence_sources(docs: DataFrame) -> DataFrame:
    """Jensen-Shannon divergence between the unigram distributions of
    the corpus's two largest sources (by doc count, source-name
    tiebreak): JSD = Σ (p/2)·ln(p/m) + (q/2)·ln(q/m) with m the
    even mixture, over the UNION vocabulary (zero-count terms
    contribute 0 — JS is finite without smoothing, its advantage
    over KL for drift monitoring). Published in nats and bits,
    rounded 4; bounded by ln 2 nats. Factored so closed-form model
    tests (identical sources → 0; disjoint vocabularies → exactly
    ln 2) drive the production stages.

    Scale: one (source-pair, word) count collapse (map-side, the
    vocabulary key space), a 1-row totals broadcast, a
    vocabulary-sized fold. Floats: ln/divisions of exact counts
    rounded on both engines (the text_char_entropy precedent)."""
    from pyspark.sql import Window

    ranked = (
        docs.groupBy("source")
        .agg(F.count("*").alias("c"))
        .select(
            "source",
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), "source"))
            .alias("rn"),
        )
        .filter(F.col("rn") <= 2)
    )
    tok = (
        docs.join(F.broadcast(ranked), "source")
        .select(
            "rn",
            F.explode(
                F.filter(
                    F.split(F.lower("text"), "[^a-z]+"),
                    lambda x: F.length(x) > 0,
                )
            ).alias("w"),
        )
    )
    wc = tok.groupBy("w").agg(
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("rn") == 2, 1).otherwise(0)).cast("long").alias("b"),
    )
    tot = wc.groupBy(F.expr("1 = 1").alias("_g")).agg(
        F.sum("a").cast("long").alias("ta"),
        F.sum("b").cast("long").alias("tb"),
    )
    return (
        wc.crossJoin(F.broadcast(tot.drop("_g")))
        .groupBy(F.expr("1 = 1").alias("_g"))
        .agg(
            F.count("*").cast("long").alias("n_vocab_union"),
            F.sum(
                F.expr(
                    "CASE WHEN a > 0 THEN"
                    " (CAST(a AS DOUBLE) / ta / 2)"
                    " * ln((CAST(a AS DOUBLE) / ta)"
                    "      / ((CAST(a AS DOUBLE) / ta"
                    "          + CAST(b AS DOUBLE) / tb) / 2))"
                    " ELSE 0 END"
                    " + CASE WHEN b > 0 THEN"
                    " (CAST(b AS DOUBLE) / tb / 2)"
                    " * ln((CAST(b AS DOUBLE) / tb)"
                    "      / ((CAST(a AS DOUBLE) / ta"
                    "          + CAST(b AS DOUBLE) / tb) / 2))"
                    " ELSE 0 END"
                )
            ).alias("_js"),
        )
        .select(
            "n_vocab_union",
            F.round("_js", 4).cast("double").alias("js_nats_r4"),
            F.round(F.col("_js") / F.lit(0.6931471805599453), 4)
            .cast("double")
            .alias("js_bits_r4"),
        )
    )


@query(
    "text_js_divergence_sources",
    oracle=_JS_ORACLE,
    tags=("llm", "text", "quality", "drift"),
)
def text_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the two largest sources'
    unigram distributions (nats and bits, rounded 4) — the
    smoothing-free vocabulary-drift number a mixture review reads
    next to dq_drift_psi (binned numerics) and dq_mutual_information
    (categorical association)."""
    d = load_tables(spark, sf_dir)["documents"]
    return js_divergence_sources(d.select("source", "text"))
