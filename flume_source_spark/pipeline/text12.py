"""Text wave 12: corpus novelty curve.

``text_novelty_curve`` — per-document NOVELTY against everything that
came before it in crawl order: the fraction of a document's distinct
3-token shingles whose global FIRST occurrence is that document. The
declining novelty curve is the standard "is this crawl still adding
information" audit for training-data collection (when marginal
novelty flattens, additional ingestion mostly buys duplicates — the
signal used to stop a crawl or re-weight a source), and per-doc
novelty doubles as a cheap redundancy score: near-zero novelty means
the document's content is already in the corpus even when no single
prior document matches it (the case pairwise dedup structurally
misses — content assembled from many earlier documents).

Semantics: shingles are the house 3-token distinct shingles
(``pipeline.dedup.shingle_col``, shared with the MinHash family);
"first occurrence" is min(doc_id) over the shingle, with doc_id as
the crawl-order surrogate (the events/documents fixture convention).
A document that is the first holder of a shingle counts it novel —
including shingles unique to it forever.

Scale: explode → one shuffle on shingle for the global min →
join-back on shingle → one shuffle on doc_id for the per-doc rollup.
Nothing pairwise, nothing quadratic; the shingle dictionary is the
same key space every MinHash/dedup pass already shuffles. Integer
output (counts + ppm via integral div on non-negative operands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.dedup import shingle_col, spread
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_NOVELTY_ORACLE = """
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
                      for i in generate_series(1, len(toks)-2)])) AS shingle
        FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
    ),
    first AS (
        SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle
    )
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS novelty_ppm
    FROM sh s JOIN first f ON s.shingle = f.shingle
    GROUP BY s.doc_id
    ORDER BY s.doc_id
"""


@query("text_novelty_curve", oracle=_NOVELTY_ORACLE, tags=("llm", "text", "dedup"))
def text_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shingle novelty vs all earlier documents (crawl
    order = doc_id): n_shingles, n_novel (global first occurrence is
    this doc), novelty_ppm. The crawl-saturation audit and the
    assembled-redundancy score pairwise dedup can't see."""
    d = spread(load_tables(spark, sf_dir)["documents"])
    sh = d.select(
        "doc_id", F.explode(shingle_col(F.col("text"))).alias("shingle")
    )
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long"))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.expr("CAST(n_novel * 1000000 div n_shingles AS BIGINT)").alias(
                "novelty_ppm"
            ),
        )
        .orderBy("doc_id")
    )
