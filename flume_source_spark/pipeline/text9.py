"""Fifth wave of text operators: corpus-level segment (line/paragraph)
deduplication in the CCNet style.

``text_line_dedup`` — CCNet (Wenzek et al., LREC'20) deduplicates a
crawl at PARAGRAPH granularity: hash every paragraph, count how many
documents each hash appears in across the whole corpus, and drop the
paragraphs that recur — boilerplate navigation, cookie banners, license
headers — while keeping each document's unique remainder. Doc-level
dedup (``dedup_exact``/``dedup_minhash_lsh``) can't express this: two
pages sharing a footer are NOT near-duplicates, yet the footer must
go. The fixture's documents are single-line token streams, so the
"paragraph" unit here is a fixed-width non-overlapping window of
``SEG`` tokens (last segment ragged) — the same operator shape with a
deterministic segmenter.

Semantics: a segment is *duplicated* iff its exact text occurs in ≥ 2
DISTINCT documents (within-doc repetition does not count — that is
``text_dup_ngram_fraction``'s job). Per document we report segment
counts, surviving token mass, and an integer permyriad kept-fraction
(integer floor-division, tie-free across engines — see text6.py).

Scale design: one narrow segment explode (≈ n_tokens/SEG rows per
doc), one map-side-combinable ``count(DISTINCT doc_id)`` aggregate
keyed on the segment, one join of the segments against ONLY the
duplicated keys (filtered to df ≥ 2 BEFORE the join — the join's build
side is just the boilerplate dictionary, typically tiny relative to
the corpus and broadcastable), then a per-doc aggregate. At 100 TB the
segment join key should be ``xxhash64(seg)`` (8 bytes instead of the
string; collisions at 64 bits are ~n²/2⁶⁵ — irrelevant), the df
aggregate approximated with approx_count_distinct if exact df is not
needed, and the df ≥ 2 dictionary is the natural thing to persist
between crawl increments. String keys here keep the DuckDB oracle
byte-identical; hashing is a pure shuffle-width optimization, not a
semantic change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# Segment width (tokens). CCNet's unit is the natural paragraph; the
# fixture has no line structure, so segmentation is fixed-width.
SEG = 10

_LINE_DEDUP_ORACLE = f"""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
    segs AS (
        SELECT doc_id, u.seg AS seg, u.slen AS slen
        FROM (
            SELECT doc_id,
                   unnest([struct_pack(
                               seg := array_to_string(toks[g*{SEG}+1:g*{SEG}+{SEG}], ' '),
                               slen := len(toks[g*{SEG}+1:g*{SEG}+{SEG}]))
                           for g in generate_series(
                               0, CAST(ceil(len(toks)/{SEG}.0) AS BIGINT) - 1)]) AS u
            FROM t) s
    ),
    dup AS (SELECT seg FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) >= 2),
    j AS (SELECT s.doc_id, s.slen, (d.seg IS NOT NULL) AS is_dup
          FROM segs s LEFT JOIN dup d USING (seg)),
    agg AS (SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_segments,
                   CAST(count(*) FILTER (is_dup) AS BIGINT) AS n_dup_segments,
                   CAST(COALESCE(sum(slen) FILTER (NOT is_dup), 0) AS BIGINT) AS kept_tokens
            FROM j GROUP BY doc_id)
    SELECT a.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           a.n_segments, a.n_dup_segments, a.kept_tokens,
           a.kept_tokens * 10000 // len(t.toks) AS kept_permyriad
    FROM agg a JOIN t USING (doc_id)
    ORDER BY a.doc_id
"""


def line_dedup_stats(docs: DataFrame, seg: int = SEG) -> DataFrame:
    """Core computation over a (doc_id, text) DataFrame: per-doc
    segment counts after corpus-level duplicate-segment removal."""
    base = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    nseg = F.ceil(F.size("toks") / F.lit(float(seg))).cast("long")
    segs = base.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0).cast("long"), nseg - 1),
                lambda g: F.slice("toks", (g * seg + 1).cast("int"), seg),
            )
        ).alias("seg_toks"),
    ).select(
        "doc_id",
        "n_tokens",
        F.array_join("seg_toks", " ").alias("seg"),
        F.size("seg_toks").cast("long").alias("slen"),
    )
    # Corpus-wide document frequency per segment; df >= 2 is the
    # boilerplate dictionary. Filtered BEFORE the join back.
    dup = (
        segs.groupBy("seg")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
        .select("seg", F.lit(True).alias("is_dup"))
    )
    flagged = segs.join(F.broadcast(dup), "seg", "left").withColumn(
        "is_dup", F.coalesce("is_dup", F.lit(False))
    )
    return (
        flagged.groupBy("doc_id", "n_tokens")
        .agg(
            F.count("*").alias("n_segments"),
            F.count_if("is_dup").alias("n_dup_segments"),
            F.coalesce(
                F.sum(F.when(~F.col("is_dup"), F.col("slen"))), F.lit(0).cast("long")
            ).alias("kept_tokens"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_segments",
            "n_dup_segments",
            "kept_tokens",
            ((F.col("kept_tokens") * 10000) / F.col("n_tokens"))
            .cast("long")
            .alias("kept_permyriad"),
        )
        .orderBy("doc_id")
    )


@query("text_line_dedup", oracle=_LINE_DEDUP_ORACLE, tags=("llm", "text", "dedup"))
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-level segment dedup: per-doc counts of
    segments whose exact text recurs in ≥ 2 distinct documents, and
    the token mass that survives removing them."""
    from flume_source_spark.pipeline.dedup import spread

    docs = spread(load_tables(spark, sf_dir)["documents"])
    return line_dedup_stats(docs)
