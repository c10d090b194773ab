"""Dedup wave 3 (round 12): content-defined chunking (CDC) — the
rsync/LBFS/casync boundary-selection technique (Muthitacharoen et
al., SOSP 2001) that makes INCREMENTAL dedup work: chunk boundaries
are chosen where a rolling content hash satisfies a modulus
condition, so an insertion early in a document shifts only the chunks
it touches — boundaries RESYNCHRONIZE at the next content-defined
cut, unlike fixed-size blocks where one inserted byte shifts every
later block. The model test pins exactly that property.

Mechanics over the token-trigram stream (the corpus n-gram grain):
a gram position is a CUT when its md5-derived hash ≡ 0 (mod
``CDC_MODULUS`` = 16 → expected chunk ≈ 16 grams); a chunk is the
maximal run between cuts; its fingerprint is the md5 of its ordered
gram-hash sequence. Published: the per-log₂-size-bucket chunk
profile — chunk count, distinct fingerprints, and the duplicated
fraction in floored ppm (the "how much would CDC dedup save"
number), bounded at ≤ ~12 rows.

Cross-engine determinism: gram hashes are the dedup_simhash_exact
md5-prefix convention; the chunk id is an exclusive prefix sum of
cut flags (per-doc window, bounded by doc length); the fingerprint
concatenates gram hashes ORDERED BY position on both engines
(sort_array(collect_list(struct)) ↔ string_agg(... ORDER BY)); the
log₂ bucket uses floor(log2(len)) — exact in IEEE at powers of two,
safely interior elsewhere.

Scale shape: the only windows are per-document; chunk fingerprints
collapse in ONE map-side-combinable groupBy (doc, chunk); the bucket
profile is a second tiny aggregate. No self-join anywhere — the
duplicate accounting is count vs count-distinct inside the bucket
hash-agg. At 100 TB this is the scan-shaped plan CDC is loved for.

Reference parity note: the reference engine (`CephFsSource.java`)
has no dedup surface; this operator belongs to the declared [NS]
engine surface (SURVEY.md §2.2, dedup/fingerprint family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

CDC_K = 3        # tokens per gram (the corpus trigram grain)
CDC_MODULUS = 16  # cut when hash % 16 == 0 → expected chunk ≈ 16 grams

_CDC_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                           x -> length(x) > 0) AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               CAST(('0x' || substr(md5(t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]), 1, 8))
                    AS BIGINT) AS hx
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - {CDC_K - 1})) AS i
              FROM toks)
    ),
    cid AS (
        SELECT doc_id, pos, hx,
               CAST(coalesce(sum(CASE WHEN hx % {CDC_MODULUS} = 0 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS c
        FROM grams
    ),
    chunks AS (
        SELECT doc_id, c,
               CAST(count(*) AS BIGINT) AS len,
               md5(string_agg(CAST(hx AS VARCHAR), ' ' ORDER BY pos)) AS fp
        FROM cid GROUP BY doc_id, c
    )
    SELECT CAST(floor(log2(len)) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct,
           CAST((count(*) - count(DISTINCT fp)) * 1000000 // count(*)
                AS BIGINT) AS dup_ppm
    FROM chunks
    GROUP BY 1 ORDER BY 1
"""


def cdc_chunks(docs: DataFrame, modulus: int = CDC_MODULUS) -> DataFrame:
    """Core CDC fold over a (doc_id, text) frame → chunk rows
    (doc_id, c, len, fp). Factored so the resynchronization model
    test (a prefix insertion shares all but the first chunks) and the
    cut-rule test (every chunk except a doc's last ENDS on a cut
    gram) drive the production stages."""
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), "[^a-z]+"), lambda x: F.length(x) > 0
        ).alias("t"),
    ).filter(F.size("t") >= CDC_K)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {CDC_K - 1}),"
                f" i -> struct(CAST(i AS BIGINT) AS pos,"
                f"  CAST(conv(substring(md5(concat_ws(' ',"
                f"   t[i - 1], t[i], t[i + 1])), 1, 8), 16, 10)"
                f"   AS BIGINT) AS hx))"
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.pos").alias("pos"), F.col("g.hx").alias("hx"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cid = grams.select(
        "doc_id",
        "pos",
        "hx",
        F.coalesce(
            F.sum(
                F.when(F.col("hx") % modulus == 0, 1).otherwise(0)
            ).over(w),
            F.lit(0),
        )
        .cast("long")
        .alias("c"),
    )
    return cid.groupBy("doc_id", "c").agg(
        F.count("*").cast("long").alias("len"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "hx"))),
                    lambda x: x["hx"].cast("string"),
                ),
                " ",
            )
        ).alias("fp"),
    )


@query(
    "dedup_cdc_chunks",
    oracle=_CDC_ORACLE,
    tags=("llm", "dedup", "fingerprint"),
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking profile of the corpus: chunks cut
    where the rolling trigram hash ≡ 0 (mod 16), grouped into
    log₂-size buckets with the duplicated-chunk fraction in floored
    ppm — the savings estimate an incremental-dedup store reads
    before adopting CDC."""
    d = load_tables(spark, sf_dir)["documents"]
    chunks = cdc_chunks(d.select("doc_id", "text"))
    return (
        chunks.groupBy(
            F.expr("CAST(floor(log2(len)) AS BIGINT)").alias("bucket")
        )
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.count_distinct("fp").cast("long").alias("n_distinct"),
        )
        .select(
            "bucket",
            "n_chunks",
            "n_distinct",
            F.expr(
                "CAST((n_chunks - n_distinct) * 1000000 div n_chunks"
                " AS BIGINT)"
            ).alias("dup_ppm"),
        )
        .orderBy("bucket")
    )
