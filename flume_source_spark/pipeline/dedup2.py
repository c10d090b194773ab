"""Dedup wave: Hamming-radius candidate join over SimHash codes.

``dedup_simhash_hamming_join`` — ``dedup_simhash`` produces a 32-bit
code per document; the question it exists to answer is "which pairs
are within Hamming distance r?" — and the naive answer is an O(n²)
XOR scan. The scalable reformulation is Charikar/Manku-style
multi-index (bit-sampling LSH for Hamming space): split the 32-bit
code into B = r+1 disjoint 8-bit bands; by pigeonhole, any pair
within Hamming distance r ≤ 3 agrees EXACTLY on at least one band.
So:

    1. explode each doc to its 4 (band_idx, band_value) keys,
    2. hash-equi-join on the band key (one shuffle — same plan class
       as MinHash-LSH banding; hot bands cap-able the same way),
    3. XOR + popcount the full codes to keep true pairs (exact
       filter, executor-local).

Recall within radius r is EXACT (pigeonhole, not probabilistic);
precision is whatever the band join admits — the popcount filter
removes the rest. This is the Hamming twin of ``dedup_minhash_lsh``'s
Jaccard banding, and the missing production half of
``dedup_simhash``.

Rows-only: the codes hinge on ``xxhash64``, which DuckDB does not
implement, so no SQL oracle exists; correctness is pinned by model
tests (planted bit-flip neighbors: ≤r always found, >r via band
collision correctly filtered, recall vs brute-force XOR equality on a
synthetic code table).

popcount: Spark has ``bit_count`` (used below); 32-bit codes mean
distance ≤ 32 always fits int.

Production order under heavy exact duplication: identical codes make
the band join's OUTPUT quadratic in copy count (every copy pair is a
distance-0 answer) — measured 6.5× time at 8× exact copies
(SCALE.md). Collapse identical codes FIRST (one linear hash agg — the
distance-0 census), then band-join DISTINCT codes (~1× cost restored,
measured), exactly the dedup_exact-before-containment ordering the
dedup family documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query

HAMMING_RADIUS = 3
BANDS = HAMMING_RADIUS + 1  # pigeonhole: r-distance pairs share a band
BAND_BITS = 32 // BANDS  # 8-bit bands


def hamming_pairs(codes: DataFrame, radius: int = HAMMING_RADIUS) -> DataFrame:
    """(i, j, hamming) pairs with distance ≤ radius over a
    (doc_id, simhash) DataFrame, via banded equi-join + exact popcount
    filter. Exact recall for radius ≤ BANDS-1."""
    banded = codes.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_idx"),
                        F.shiftright(F.col("simhash"), bi * BAND_BITS)
                        .bitwiseAND(F.lit((1 << BAND_BITS) - 1))
                        .alias("band_val"),
                    )
                    for bi in range(BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_idx", "band.band_val")
    a = banded.select(
        F.col("doc_id").alias("i"), F.col("simhash").alias("ci"), "band_idx", "band_val"
    )
    b = banded.select(
        F.col("doc_id").alias("j"), F.col("simhash").alias("cj"), "band_idx", "band_val"
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("i") < F.col("j"))
        .select(
            "i", "j",
            F.bit_count(F.col("ci").bitwiseXOR(F.col("cj"))).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= radius)
        .distinct()  # a pair may agree on several bands
    )


@query("dedup_simhash_hamming_join", oracle=None, tags=("llm", "dedup", "simhash", "lsh"))
def dedup_simhash_hamming_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs within Hamming distance 3 of each other's
    SimHash codes, found by exact-recall band blocking (never the n²
    scan). Rows-only: xxhash64-based codes have no DuckDB twin."""
    from flume_source_spark.pipeline.dedup import dedup_simhash

    codes = dedup_simhash(spark, sf_dir)
    return hamming_pairs(codes).orderBy("i", "j")
