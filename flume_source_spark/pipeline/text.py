"""Text-analysis operators for LLM-data pipelines: quality scoring,
token statistics, language-ID heuristic, document fingerprinting.

All pure JVM-side expressions (split/transform/filter/aggregate) —
no Python in the hot path, so these run at full codegen speed over
100 TB of documents. Tokenization is whitespace split; quality
features are the standard pretraining-corpus heuristics (length,
mean token length, stopword ratio, alpha ratio).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables


def _spread(df):
    from flume_source_spark.pipeline.dedup import spread

    return spread(df)

# tiny per-language stopword lists for the n-gram/stopword-hit
# language-ID heuristic (public common stopwords)
_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "value", "row", "data"],
    "es": ["el", "la", "de", "y", "en", "es", "un", "una", "los", "las"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "les", "des", "dans"],
}


@query(
    "text_quality",
    oracle="""
    WITH t AS (SELECT doc_id, lang, text, str_split(text, ' ') AS toks FROM documents)
    SELECT doc_id, lang,
           length(text) AS n_chars,
           len(toks) AS n_tokens,
           CAST(round(length(text) * 1.0 / len(toks), 4) AS DOUBLE) AS chars_per_token,
           len(list_distinct(toks)) AS n_distinct_tokens,
           CAST(round(len(list_distinct(toks)) * 1.0 / len(toks), 4) AS DOUBLE) AS ttr,
           len(list_filter(toks, t -> length(t) <= 2)) AS n_short_tokens,
           CAST(round(len(list_filter(toks, t -> t IN ('a','the','of','and','value','row','data','key'))) * 1.0
                 / len(toks), 4) AS DOUBLE) AS stopword_ratio,
           (len(toks) >= 20 AND len(list_distinct(toks)) * 1.0 / len(toks) >= 0.15) AS passes_quality
    FROM t
    ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length stats, type-token ratio, stopword ratio,
    and a composite keep/drop flag — the pretraining-filter shape."""
    d = _spread(load_tables(spark, sf_dir)["documents"])
    toks = F.split("text", " ")
    stop = F.array(*[F.lit(s) for s in ["a", "the", "of", "and", "value", "row", "data", "key"]])
    n_toks = F.size(toks).cast("bigint")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    return (
        d.select(
            "doc_id",
            "lang",
            F.length("text").cast("bigint").alias("n_chars"),
            n_toks.alias("n_tokens"),
            F.round(F.length("text") / n_toks, 4).cast("double").alias("chars_per_token"),
            n_distinct.alias("n_distinct_tokens"),
            F.round(n_distinct / n_toks, 4).cast("double").alias("ttr"),
            F.size(F.filter(toks, lambda t: F.length(t) <= 2)).cast("bigint").alias("n_short_tokens"),
            F.round(
                F.size(F.filter(toks, lambda t: F.array_contains(stop, t))) / n_toks, 4
            ).cast("double").alias("stopword_ratio"),
            ((n_toks >= 20) & (n_distinct / n_toks >= 0.15)).alias("passes_quality"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_token_stats",
    oracle="""
    SELECT tok, count(*) AS freq, count(DISTINCT doc_id) AS doc_freq,
           count(DISTINCT lang) AS n_langs
    FROM (SELECT doc_id, lang, unnest(str_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY freq DESC, tok
    LIMIT 20
    """,
    tags=("llm", "text"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequencies via explode → agg (the map-side-combine
    wordcount shape; at 100 TB this is one shuffle of (token, partial
    counts), the canonical scalable aggregation)."""
    d = _spread(load_tables(spark, sf_dir)["documents"])
    return (
        d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(
            F.count("*").alias("freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy(F.col("freq").desc(), F.col("tok"))
        .limit(20)
    )


@query(
    "text_lang_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, str_split(text, ' ') AS toks FROM documents),
    scored AS (
        SELECT doc_id, lang,
               len(list_filter(toks, t -> t IN ({','.join(repr(s) for s in _STOPWORDS['en'])}))) AS hits_en,
               len(list_filter(toks, t -> t IN ({','.join(repr(s) for s in _STOPWORDS['es'])}))) AS hits_es,
               len(list_filter(toks, t -> t IN ({','.join(repr(s) for s in _STOPWORDS['de'])}))) AS hits_de,
               len(list_filter(toks, t -> t IN ({','.join(repr(s) for s in _STOPWORDS['fr'])}))) AS hits_fr,
               len(toks) AS n
        FROM t)
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN greatest(hits_en, hits_es, hits_de, hits_fr) = 0 THEN 'und'
                WHEN hits_en >= greatest(hits_es, hits_de, hits_fr) THEN 'en'
                WHEN hits_es >= greatest(hits_de, hits_fr) THEN 'es'
                WHEN hits_de >= hits_fr THEN 'de'
                ELSE 'fr' END AS predicted_lang,
           CAST(round(greatest(hits_en, hits_es, hits_de, hits_fr) * 1.0 / n, 4) AS DOUBLE) AS confidence
    FROM scored
    ORDER BY doc_id
    """,
    tags=("llm", "text", "langid"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID (the classic cheap heuristic): score
    each language by stopword hits, argmax with deterministic
    preference order, 'und' when nothing matches."""
    d = _spread(load_tables(spark, sf_dir)["documents"])
    toks = F.split("text", " ")

    def hits(lang: str):
        arr = F.array(*[F.lit(s) for s in _STOPWORDS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("bigint")

    h = {lang: hits(lang).alias(f"hits_{lang}") for lang in _STOPWORDS}
    scored = d.select("doc_id", F.col("lang").alias("labeled_lang"), F.size(toks).cast("bigint").alias("n"), *h.values())
    best = F.greatest("hits_en", "hits_es", "hits_de", "hits_fr")
    return (
        scored.select(
            "doc_id",
            "labeled_lang",
            F.when(best == 0, "und")
            .when(F.col("hits_en") >= F.greatest("hits_es", "hits_de", "hits_fr"), "en")
            .when(F.col("hits_es") >= F.greatest("hits_de", "hits_fr"), "es")
            .when(F.col("hits_de") >= F.col("hits_fr"), "de")
            .otherwise("fr")
            .alias("predicted_lang"),
            F.round(best / F.col("n"), 4).cast("double").alias("confidence"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_token_count_bpeish",
    oracle="""
    WITH t AS (
        SELECT doc_id, length(text) AS n_chars,
               regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]') AS bpeish,
               str_split(text, ' ') AS ws
        FROM documents
    )
    SELECT doc_id,
           len(ws) AS ws_tokens,
           len(bpeish) AS bpeish_tokens,
           len(list_distinct(bpeish)) AS bpeish_vocab,
           CAST(round(n_chars * 1.0 / len(bpeish), 4) AS DOUBLE) AS chars_per_bpeish_token
    FROM t
    ORDER BY doc_id
    """,
    tags=("llm", "text", "tokenize"),
)
def text_token_count_bpeish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split vs a BPE-ish regex
    (letter runs | digit runs | single punctuation — the GPT-2
    pre-tokenizer shape). The regex uses only literal classes so Java
    (Spark) and RE2 (DuckDB) agree; chars-per-token is the standard
    budget estimator for LLM corpora."""
    d = _spread(load_tables(spark, sf_dir)["documents"])
    bpeish = F.regexp_extract_all("text", F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), 0)
    ws = F.split("text", " ")
    return (
        d.select("doc_id", bpeish.alias("bpeish"), ws.alias("ws"), F.length("text").alias("n_chars"))
        .select(
            "doc_id",
            F.size("ws").cast("bigint").alias("ws_tokens"),
            F.size("bpeish").cast("bigint").alias("bpeish_tokens"),
            F.size(F.array_distinct("bpeish")).cast("bigint").alias("bpeish_vocab"),
            F.round(F.col("n_chars") / F.size("bpeish"), 4).cast("double").alias("chars_per_bpeish_token"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_fingerprint",
    oracle="""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
    sh AS (SELECT doc_id,
                  [array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks)-2)] AS shingles
           FROM t)
    SELECT doc_id,
           md5(array_to_string(shingles, chr(31))) AS content_md5,
           list_min(list_transform(shingles, s -> md5(s))) AS min_shingle_md5,
           len(list_distinct(shingles)) AS n_distinct_shingles
    FROM sh
    ORDER BY doc_id
    """,
    tags=("llm", "text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: full-content hash + min-shingle-hash (a
    1-permutation MinHash — the building block the LSH dedup scales
    up). Portable md5 so DuckDB can verify."""
    d = _spread(load_tables(spark, sf_dir)["documents"])
    toks = F.split("text", " ")
    n = F.size(toks) - 2
    # guarded like dedup.shingle_col: sequence(1, n<1) descends and
    # would crash slice(); short docs get an empty shingle list
    shingles = F.when(
        n >= 1,
        F.transform(F.sequence(F.lit(1), n), lambda i: F.array_join(F.slice(toks, i, 3), " ")),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select("doc_id", shingles.alias("shingles"))
        .select(
            "doc_id",
            F.md5(F.array_join("shingles", "\x1f")).alias("content_md5"),
            F.array_min(F.transform("shingles", lambda s: F.md5(s))).alias("min_shingle_md5"),
            F.size(F.array_distinct("shingles")).cast("bigint").alias("n_distinct_shingles"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Language-ID confusion matrix (round 10): text_lang_id predicts; this
# rolls prediction vs the labeled lang into the confusion matrix —
# the accuracy audit of the classifier the pipeline actually gates
# on. Each (labeled, predicted) cell carries its count and its share
# of the labeled language's documents in exact ppm; the diagonal
# share IS per-class recall. Composes the registered lang-id oracle
# verbatim (one CTE wrap), so classifier and audit cannot drift.
#
# Scale: the lang-id pass is the per-row HOF scorer it already was;
# the rollup is one map-side-combinable groupBy onto ≤ |langs|² cells
# plus a broadcast-sized margin join.
# ---------------------------------------------------------------------------


def _langid_confusion_oracle() -> str:
    from flume_source_spark.registry import REGISTRY

    return f"""
    WITH lid AS ({REGISTRY["text_lang_id"].oracle}),
    cells AS (
        SELECT labeled_lang, predicted_lang,
               CAST(count(*) AS BIGINT) AS n
        FROM lid GROUP BY 1, 2
    ),
    marg AS (
        SELECT labeled_lang, CAST(sum(n) AS BIGINT) AS label_total
        FROM cells GROUP BY 1
    )
    SELECT c.labeled_lang, c.predicted_lang, c.n, m.label_total,
           CAST(c.n * 1000000 // m.label_total AS BIGINT) AS share_ppm
    FROM cells c JOIN marg m USING (labeled_lang)
    ORDER BY c.labeled_lang, c.predicted_lang
"""


@query(
    "text_langid_confusion",
    oracle=_langid_confusion_oracle(),
    tags=("llm", "text", "langid", "audit"),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword language classifier vs the
    labeled lang: per (labeled, predicted) cell, the count and its
    exact-ppm share of the labeled language (diagonal = per-class
    recall) — the audit that says whether the cheap gate is safe to
    filter on, per class."""
    lid = text_lang_id(spark, sf_dir).select("labeled_lang", "predicted_lang")
    cells = lid.groupBy("labeled_lang", "predicted_lang").agg(
        F.count("*").cast("long").alias("n")
    )
    marg = cells.groupBy("labeled_lang").agg(
        F.sum("n").cast("long").alias("label_total")
    )
    return (
        cells.join(F.broadcast(marg), "labeled_lang")
        .select(
            "labeled_lang",
            "predicted_lang",
            "n",
            "label_total",
            F.expr("CAST(n * 1000000 div label_total AS BIGINT)").alias("share_ppm"),
        )
        .orderBy("labeled_lang", "predicted_lang")
    )
