"""Multimodal wave 2 (round 12): the pHash family's measured recall
audit — the ``dedup_lsh_recall_audit`` discipline applied to the
image-near-dup pipeline (VERDICT r11 item 7).

``multimodal_phash_hamming_neardup`` finds radius-3 pairs with the
Charikar/Manku pigeonhole multi-index (4 disjoint 16-bit bands of the
64-bit sketch: any pair within Hamming 3 agrees exactly on ≥ 1 band).
That recall guarantee has so far been an ARGUMENT; this audit turns
it into a measured number: on the deterministic fixed-size md5-bucket
document sample (``budget_sample`` — the same ~150-doc gate every
other audit uses), it compares

- **truth**: ALL pairs within exact Hamming ≤ radius of each other's
  sketches — an all-pairs xor/popcount over the SAMPLE only, so the
  pair work is budget², never corpus²;
- **candidates**: the PRODUCTION candidate generator
  (``_phash_cand_wide``: capped pigeonhole band equi-join) run on the
  same sample;

and emits one integer row (n_docs, n_true, n_cand, n_hit,
precision_ppm, recall_ppm). By the pigeonhole construction recall
must read EXACTLY 10⁶ ppm whenever no shared band bucket exceeds
PHASH_MAX_BUCKET (at budget ≈ 150 sample docs no bucket can) — the
model test asserts that, closing the family's quality claim with
evidence instead of the argument alone. Precision is reported for
symmetry with the LSH audit: bands deliberately over-generate (the
exact verify stage filters), so it is informative, not a guarantee.

Scale: the sample gate is a map-side filter with a broadcast 1-row
modulus; every later stage is bounded by the budget, not the corpus.

Reference parity note: the reference engine (`CephFsSource.java`) has
no multimodal surface; this operator belongs to the declared [NS]
engine surface (SURVEY.md §2.2, multimodal/audit family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.audit import (
    AUDIT_SAMPLE_BUDGET,
    AUDIT_SAMPLE_KEEP,
    budget_sample,
)
from flume_source_spark.pipeline.multimodal import (
    PHASH_BAND_BITS,
    PHASH_BANDS,
    PHASH_MAX_BUCKET,
    PHASH_RADIUS,
    _phash_cand_wide,
    phash_bands,
)
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_SQL_MD5INT_DOC = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"

_XOR_HAM = " + ".join(
    f"bit_count(xor(a.b{b}, b.b{b}))" for b in range(PHASH_BANDS)
)

_PHASH_AUDIT_ORACLE = f"""
    WITH smod AS (
        SELECT greatest((count(*) * {AUDIT_SAMPLE_KEEP})
                        // {AUDIT_SAMPLE_BUDGET}, 1) AS m
        FROM documents
    ),
    sample_docs AS MATERIALIZED (
        SELECT doc_id, text FROM documents
        WHERE {_SQL_MD5INT_DOC} % (SELECT m FROM smod) < {AUDIT_SAMPLE_KEEP}
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
                      for i in generate_series(1, len(toks)-2)])) AS shingle
        FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM sample_docs)
    ),
    bk AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) % 64 AS bucket
        FROM sh
    ),
    cnt AS (SELECT doc_id, bucket, count(*) AS s FROM bk GROUP BY 1, 2),
    tot AS (SELECT doc_id, count(*) AS n FROM bk GROUP BY 1),
    bits AS (
        SELECT c.doc_id, c.bucket
        FROM cnt c JOIN tot t USING (doc_id)
        WHERE 64 * c.s > t.n
    ),
    ph AS MATERIALIZED (
        SELECT t.doc_id, g.band,
               CAST(coalesce(sum(CASE WHEN b.bucket IS NOT NULL
                    THEN 1 << CAST(b.bucket % {PHASH_BAND_BITS} AS INT)
                    ELSE 0 END), 0) AS BIGINT) AS v
        FROM tot t
        CROSS JOIN (SELECT unnest(generate_series(0, {PHASH_BANDS - 1})) AS band) g
        LEFT JOIN bits b
          ON b.doc_id = t.doc_id AND b.bucket // {PHASH_BAND_BITS} = g.band
        GROUP BY t.doc_id, g.band
    ),
    keep AS (
        SELECT band, v FROM ph GROUP BY band, v
        HAVING count(*) <= {PHASH_MAX_BUCKET}
    ),
    cand AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        FROM ph a
        JOIN keep k ON a.band = k.band AND a.v = k.v
        JOIN ph b ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id
    ),
    wide AS MATERIALIZED (
        SELECT doc_id,
               {", ".join(f"min(CASE WHEN band = {b} THEN v END) AS b{b}"
                          for b in range(PHASH_BANDS))}
        FROM ph GROUP BY doc_id
    ),
    truth AS MATERIALIZED (
        SELECT a.doc_id AS i, b.doc_id AS j
        FROM wide a JOIN wide b ON a.doc_id < b.doc_id
        WHERE {_XOR_HAM} <= {PHASH_RADIUS}
    ),
    hit AS (SELECT t.i, t.j FROM truth t JOIN cand c ON t.i = c.i AND t.j = c.j)
    SELECT CAST((SELECT count(*) FROM sample_docs) AS BIGINT) AS n_docs,
           CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_cand,
           CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_hit,
           CAST((SELECT count(*) FROM hit) * 1000000
                // greatest((SELECT count(*) FROM cand), 1) AS BIGINT)
               AS precision_ppm,
           CAST((SELECT count(*) FROM hit) * 1000000
                // greatest((SELECT count(*) FROM truth), 1) AS BIGINT)
               AS recall_ppm
"""


def phash_recall_counts(docs: DataFrame) -> DataFrame:
    """Core audit over a (doc_id, text) frame: exact all-pairs Hamming
    truth (sample-bounded) vs the production capped band candidates,
    one integer summary row. Factored so planted tests (bit-flip
    neighbors at / past the radius; the pigeonhole recall = 10⁶ ppm
    assertion) drive the production sketch + candidate stages."""
    sample = budget_sample(docs)
    ph = phash_bands(sample)
    cand, wide = _phash_cand_wide(ph)
    ham = sum(
        F.bit_count(F.expr(f"xb{b} ^ yb{b}")) for b in range(PHASH_BANDS)
    ).cast("long")
    left = wide.select(
        F.col("doc_id").alias("i"),
        *[F.col(f"b{b}").alias(f"xb{b}") for b in range(PHASH_BANDS)],
    )
    right = wide.select(
        F.col("doc_id").alias("j"),
        *[F.col(f"b{b}").alias(f"yb{b}") for b in range(PHASH_BANDS)],
    )
    # all-pairs over the SAMPLE only (≤ budget² ≈ 11k pairs): the
    # exact-truth side every recall audit needs, budget-bounded by the
    # gate — the deliberate exception to the no-all-pairs rule, with
    # the banded production twin in cand
    truth = (
        left.join(right, F.col("i") < F.col("j"))
        .select("i", "j", ham.alias("hamming"))
        .filter(F.col("hamming") <= PHASH_RADIUS)
        .select("i", "j")
    )
    hit = truth.join(cand, ["i", "j"])
    counts = (
        sample.agg(F.count("*").cast("long").alias("n_docs"))
        .crossJoin(truth.agg(F.count("*").cast("long").alias("n_true")))
        .crossJoin(cand.agg(F.count("*").cast("long").alias("n_cand")))
        .crossJoin(hit.agg(F.count("*").cast("long").alias("n_hit")))
    )
    return counts.select(
        "n_docs",
        "n_true",
        "n_cand",
        "n_hit",
        F.expr("CAST((n_hit * 1000000) div greatest(n_cand, 1) AS BIGINT)")
        .alias("precision_ppm"),
        F.expr("CAST((n_hit * 1000000) div greatest(n_true, 1) AS BIGINT)")
        .alias("recall_ppm"),
    )


@query(
    "multimodal_phash_recall_audit",
    oracle=_PHASH_AUDIT_ORACLE,
    tags=("llm", "multimodal", "dedup", "audit"),
)
def multimodal_phash_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the pHash pigeonhole band index on the
    deterministic ~150-doc budget sample: exact all-pairs Hamming ≤ 3
    truth vs the production capped 4×16-bit band candidates, as one
    integer row — the image-side companion to dedup_lsh_recall_audit.
    The pigeonhole construction makes recall provably 10⁶ ppm while
    no band bucket exceeds the cap; this query is that proof run as a
    measurement."""
    d = load_tables(spark, sf_dir)["documents"]
    return phash_recall_counts(d.select("doc_id", "text"))
