"""Third wave of text operators: corpus-level duplication signals and
URL handling — the web-pipeline steps between raw crawl and dedup.

- ``text_dup_ngram_fraction`` — RefinedWeb/Gopher-style duplicated
  n-gram fraction: for each doc, the share of its distinct 3-gram
  shingles that also occur in at least one OTHER document. Unlike
  pairwise dedup this is a per-doc QUALITY SIGNAL (boilerplate-heavy
  docs score high and get filtered before the expensive pairwise
  pass). Cost: one explode + one n-gram-keyed count + one join back —
  the corpus-wide document-frequency table is the same intermediate
  the TF-IDF and decontamination ops use.
- ``text_url_parse`` — URL component extraction with Spark's
  ``parse_url`` (JVM built-in, codegen-friendly). The fixture has no
  URL column, so URLs are synthesized deterministically from document
  attributes — the oracle recomputes every component independently
  with DuckDB string functions, so Spark's parser output is checked
  against an independent implementation, not against itself.

Scale: both are pure JVM expression work; the df table in
``text_dup_ngram_fraction`` shuffles on the shingle (same key
distribution as dedup's LSH band join — hot shingles are exactly the
boilerplate this op exists to measure, and the count aggregation is
map-side combinable so a hot shingle costs one partial per input
partition, never a fan-out join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.dedup import shingle_col, spread
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

DUP_FRACTION_FLAG = 0.5

_DUP_NGRAM_ORACLE = """
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
                      for i in generate_series(1, len(toks)-2)])) AS shingle
        FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
    ),
    df AS (SELECT shingle, count(*) AS n_docs FROM sh GROUP BY 1)
    SELECT s.doc_id,
           count(*) AS n_shingles,
           CAST(sum(CASE WHEN d.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           CAST(round(sum(CASE WHEN d.n_docs > 1 THEN 1 ELSE 0 END) * 1.0
                      / count(*), 4) AS DOUBLE) AS dup_fraction,
           sum(CASE WHEN d.n_docs > 1 THEN 1 ELSE 0 END) * 1.0
               / count(*) > 0.5 AS is_flagged
    FROM sh s JOIN df d USING (shingle)
    GROUP BY s.doc_id
    ORDER BY s.doc_id
"""


@query("text_dup_ngram_fraction", oracle=_DUP_NGRAM_ORACLE, tags=("llm", "text", "dedup"))
def text_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-n-gram fraction per document: the share of a doc's
    distinct 3-shingles appearing in ≥2 documents corpus-wide. The
    standard cheap pre-filter before pairwise dedup — since shingles
    are distinct per doc, a shingle's occurrence count IS its document
    frequency."""
    d = spread(load_tables(spark, sf_dir)["documents"])
    sh = d.select("doc_id", F.explode(shingle_col(F.col("text"))).alias("shingle"))
    df_tbl = sh.groupBy("shingle").agg(F.count("*").alias("n_docs"))
    dup = F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
    return (
        sh.join(df_tbl, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            dup.cast("long").alias("n_dup"),
            F.round(dup / F.count("*"), 4).cast("double").alias("dup_fraction"),
            (dup / F.count("*") > DUP_FRACTION_FLAG).alias("is_flagged"),
        )
        .orderBy("doc_id")
    )


# The synthesized URL: proto://<source>.example.com/<lang>/doc-<id>?id=<id>&lang=<lang>#s<id%7>
# Components are recomputed independently in the oracle from the same
# base columns (NOT by string-slicing the URL), so the check is
# Spark-parse vs DuckDB-reconstruct.
_URL_PARSE_ORACLE = """
    SELECT doc_id,
           'https://' || source || '.example.com/' || lang || '/doc-' || doc_id
               || '?id=' || doc_id || '&lang=' || lang || '#s' || (doc_id % 7) AS url,
           'https' AS proto,
           source || '.example.com' AS host,
           '/' || lang || '/doc-' || doc_id AS path,
           'id=' || doc_id || '&lang=' || lang AS query,
           CAST(doc_id AS VARCHAR) AS qp_id,
           lang AS qp_lang,
           's' || (doc_id % 7) AS fragment
    FROM documents
    ORDER BY doc_id
"""


@query("text_url_parse", oracle=_URL_PARSE_ORACLE, tags=("llm", "text", "scalar"))
def text_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction via ``parse_url`` (PROTOCOL / HOST /
    PATH / QUERY / QUERY:key / REF), over URLs synthesized from doc
    attributes. The oracle rebuilds each component from the base
    columns, independently checking the JVM parser."""
    d = load_tables(spark, sf_dir)["documents"]
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"), F.col("lang"),
        F.lit("/doc-"), F.col("doc_id"), F.lit("?id="), F.col("doc_id"),
        F.lit("&lang="), F.col("lang"), F.lit("#s"), F.col("doc_id") % 7,
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("qp_id"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("qp_lang"),
        F.parse_url("url", F.lit("REF")).alias("fragment"),
    ).orderBy("doc_id")
