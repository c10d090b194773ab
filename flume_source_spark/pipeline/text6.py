"""Fourth wave of text operators: substring-level deduplication and
canonical-URL deduplication — the two dedup granularities doc-level
dedup (``dedup_exact``/``dedup_minhash_lsh``) cannot express.

- ``text_substring_dedup_spans`` — substring-level (span) dedup in
  the style of Lee et al., "Deduplicating Training Data Makes
  Language Models Better" (ICML'22): instead of dropping whole
  documents, find the token SPANS within each document that are
  shared verbatim with at least one OTHER document, merge
  overlapping/adjacent spans, and report per-doc removal stats.
  Doc-level Jaccard misses a long quote embedded in otherwise-unique
  text; this is the operator that catches it. The reference paper
  uses a suffix array; a suffix array is a single-machine data
  structure, so the Spark-native reformulation is positional k-gram
  fingerprints: a maximal shared substring of length ≥ K tokens is
  exactly a run of shared K-grams at consecutive positions, so
  merging flagged K-gram positions into islands reconstructs the
  shared spans without any global ordering structure.
- ``text_url_canonical_dedup`` — crawl-frontier URL dedup: the same
  page is typically crawled under many URL variants (host casing,
  tracking parameters, fragments). Canonicalize
  (lowercase scheme+host, strip ``utm_*`` tracking params, drop the
  fragment) and keep the best document per canonical URL (longest
  text, then smallest doc_id). The fixture has no URL column, so
  URLs are synthesized deterministically with planted variants
  (case-jittered host, conditional utm params, per-doc fragments)
  such that ~10 raw URLs collapse onto each canonical URL.

Scale design:
- substring spans: one explode (≈ n_tokens rows/doc), one map-side
  combinable gram-frequency aggregate, then an inner join of the
  positional grams against ONLY the duplicated grams (the gram table
  is filtered to df ≥ 2 BEFORE the join, so the join output is just
  the flagged positions, not the corpus). The island merge is two
  windows partitioned by doc_id — per-doc state only, no global
  sort. Hot grams (boilerplate) are exactly what
  ``text_dup_ngram_fraction`` measures; its flag can pre-filter
  boilerplate docs before this op at 100 TB.
- URL dedup: pure JVM expressions + one hash aggregate keyed on the
  canonical URL; keep-best is row_number over small per-URL groups.

Oracle notes: dup_permyriad uses integer division (``div``/``//``)
rather than round() — span fractions are rationals with small
denominators (n_tokens ≤ ~100), which can land exactly on .xxxx5
where Spark (HALF_UP) and DuckDB (HALF_EVEN) legally disagree;
integer floor-division is tie-free on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flume_source_spark.pipeline.dedup import spread
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# Span gram width (tokens). A shared substring shorter than K tokens
# is below the dedup threshold and is ignored — the direct analogue of
# Lee et al.'s 50-token threshold, scaled to the ~25-100-token fixture
# docs.
SPAN_K = 5

_SUBSTRING_ORACLE = f"""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
    g AS (
        SELECT doc_id, u.pos AS pos, u.gram AS gram
        FROM (
            SELECT doc_id,
                   unnest([struct_pack(pos := i,
                                       gram := array_to_string(toks[i:i+{SPAN_K - 1}], ' '))
                           for i in generate_series(1, len(toks)-{SPAN_K - 1})]) AS u
            FROM t) s
    ),
    gdf AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
    d AS (SELECT doc_id, pos AS s, pos + {SPAN_K - 1} AS e
          FROM g JOIN gdf USING (gram)),
    m AS (SELECT doc_id, s, e,
                 max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
          FROM d),
    isl AS (SELECT doc_id, s, e,
                   sum(CASE WHEN prev_max IS NULL OR s > prev_max + 1 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY s, e
                             ROWS UNBOUNDED PRECEDING) AS island
            FROM m),
    sp AS (SELECT doc_id, island, min(s) AS span_start, max(e) AS span_end
           FROM isl GROUP BY 1, 2),
    agg AS (SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_spans,
                   CAST(sum(span_end - span_start + 1) AS BIGINT) AS dup_tokens,
                   string_agg(span_start || '-' || span_end, ';' ORDER BY span_start) AS spans
            FROM sp GROUP BY 1)
    SELECT t.doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           COALESCE(a.n_spans, 0) AS n_spans,
           COALESCE(a.dup_tokens, 0) AS dup_tokens,
           COALESCE(a.dup_tokens, 0) * 10000 // len(toks) AS dup_permyriad,
           COALESCE(a.spans, '') AS spans
    FROM t LEFT JOIN agg a USING (doc_id)
    ORDER BY t.doc_id
"""


def substring_dup_spans(docs: DataFrame, k: int = SPAN_K) -> DataFrame:
    """Core span computation over a (doc_id, text) DataFrame: merged
    token spans whose every k-gram also occurs in at least one OTHER
    document — i.e. the verbatim cross-document substrings of length
    ≥ k, found by flagging shared positional k-grams and merging
    consecutive flagged positions (gaps-and-islands windows)."""
    base = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    n = F.size("toks") - (k - 1)
    grams = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.struct(
                i.cast("long").alias("pos"),
                F.array_join(F.slice("toks", i, k), " ").alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:long,gram:string>>"))
    g = base.select("doc_id", F.explode(grams).alias("u")).select(
        "doc_id", F.col("u.pos").alias("pos"), F.col("u.gram").alias("gram")
    )
    # Filter to duplicated grams BEFORE the join back: the join output
    # is only the flagged positions, and at 100 TB the duplicated-gram
    # table is the small side (dedup is useful precisely because most
    # content is unique).
    dup_grams = g.groupBy("gram").agg(F.countDistinct("doc_id").alias("n_docs")).where(F.col("n_docs") >= 2).select("gram")
    dspan = g.join(dup_grams, "gram").select(
        "doc_id", F.col("pos").alias("s"), (F.col("pos") + (k - 1)).alias("e")
    )
    by_doc = Window.partitionBy("doc_id").orderBy("s", "e")
    m = dspan.withColumn("prev_max", F.max("e").over(by_doc.rowsBetween(Window.unboundedPreceding, -1)))
    isl = m.withColumn(
        "island",
        F.sum(
            F.when(F.col("prev_max").isNull() | (F.col("s") > F.col("prev_max") + 1), 1).otherwise(0)
        ).over(by_doc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sp = isl.groupBy("doc_id", "island").agg(F.min("s").alias("span_start"), F.max("e").alias("span_end"))
    agg = sp.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("span_start", "span_end"))),
                lambda st: F.concat_ws("-", st["span_start"], st["span_end"]),
            ),
            ";",
        ).alias("spans"),
    )
    all_docs = base.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
    return (
        all_docs.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.expr("coalesce(dup_tokens, 0) * 10000 div n_tokens").alias("dup_permyriad"),
            F.coalesce("spans", F.lit("")).alias("spans"),
        )
        .orderBy("doc_id")
    )


@query("text_substring_dedup_spans", oracle=_SUBSTRING_ORACLE, tags=("llm", "text", "dedup"))
def text_substring_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup spans over the documents fixture — see
    :func:`substring_dup_spans` and the module docstring."""
    return substring_dup_spans(spread(load_tables(spark, sf_dir)["documents"]))


# Raw URL variants planted deterministically (all reconstructed
# independently by the oracle from base columns, per the
# text_url_parse convention): host case jitters by doc_id parity,
# utm_* tracking params always present (one conditional), fragment is
# per-doc. The PAGE identity is doc_id % 50, so ~|docs|/50 raw
# variants collapse per canonical URL.
_URL_DEDUP_ORACLE = """
    WITH u AS (
        SELECT doc_id, n_chars,
               'https://' || lower(source) || '.example.com/' || lang || '/page-'
                   || (doc_id % 50) || '?id=' || (doc_id % 50) AS canonical_url
        FROM documents
    ),
    r AS (
        SELECT doc_id, n_chars, canonical_url,
               row_number() OVER (PARTITION BY canonical_url
                                  ORDER BY n_chars DESC, doc_id ASC) AS rn,
               CAST(count(*) OVER (PARTITION BY canonical_url) AS BIGINT) AS n_variants
        FROM u
    )
    SELECT canonical_url,
           doc_id AS kept_doc_id,
           CAST(n_chars AS BIGINT) AS kept_chars,
           n_variants
    FROM r WHERE rn = 1
    ORDER BY canonical_url
"""


@query("text_url_canonical_dedup", oracle=_URL_DEDUP_ORACLE, tags=("llm", "text", "dedup"))
def text_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup: synthesize messy raw URLs (case-jittered
    host, utm_* tracking params, fragments), canonicalize with
    parse_url + higher-order query-param filtering, and keep the best
    doc per canonical URL (longest text, then smallest doc_id). The
    oracle reconstructs the canonical URL directly from base columns,
    so Spark's parse/filter/rebuild path is checked against an
    independent derivation."""
    d = load_tables(spark, sf_dir)["documents"]
    host_raw = F.when(F.col("doc_id") % 2 == 0, F.upper(F.col("source"))).otherwise(F.col("source"))
    raw = F.concat(
        F.lit("https://"), host_raw, F.lit(".Example.COM/"), F.col("lang"),
        F.lit("/page-"), F.col("doc_id") % 50,
        F.lit("?utm_source=feed&id="), F.col("doc_id") % 50,
        F.when(F.col("doc_id") % 3 == 0, F.lit("&utm_campaign=crawl")).otherwise(F.lit("")),
        F.lit("#sec"), F.col("doc_id") % 7,
    )
    u = d.select("doc_id", "n_chars", raw.alias("raw_url"))
    # Canonicalize: lowercase host, keep path, strip utm_* params,
    # drop fragment. Query params filtered with a higher-order
    # filter() — no Python in the loop.
    params = F.split(F.parse_url("raw_url", F.lit("QUERY")), "&")
    kept = F.filter(params, lambda p: ~p.startswith("utm_"))
    canonical = F.concat(
        F.lit("https://"),
        F.lower(F.parse_url("raw_url", F.lit("HOST"))),
        F.parse_url("raw_url", F.lit("PATH")),
        F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(F.lit("")),
    )
    c = u.select("doc_id", "n_chars", canonical.alias("canonical_url"))
    w = Window.partitionBy("canonical_url")
    r = c.select(
        "canonical_url",
        "doc_id",
        "n_chars",
        F.row_number().over(w.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())).alias("rn"),
        F.count("*").over(w).alias("n_variants"),
    )
    return (
        r.where(F.col("rn") == 1)
        .select(
            "canonical_url",
            F.col("doc_id").alias("kept_doc_id"),
            F.col("n_chars").cast("long").alias("kept_chars"),
            F.col("n_variants").cast("long").alias("n_variants"),
        )
        .orderBy("canonical_url")
    )
