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
    filter. Exact recall for radius ≤ BANDS-1.

    ``codes`` is materialized once (round-13, guide §2.4): both band
    sides of the self-join consume it, and every caller's code frame
    embeds the full tokenize → explode → 32-conditional-sum SimHash
    aggregation — unmaterialized, the plan ran that corpus pass twice
    (live-scan audit: 2 scans → 0 for dedup_simhash_hamming_exact).
    The frame is one (doc_id, simhash) row per document — linear,
    smaller than its corpus input."""
    codes = codes.localCheckpoint(eager=True)
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


# ---- md5-based EXACT SimHash twins (round 6): the production pair
# (dedup_simhash / dedup_simhash_hamming_join) rides on xxhash64,
# which has no DuckDB implementation, so both are rows-only. These
# twins swap the token hash for the first 8 md5 hex digits — bitwise
# identical on both engines (the dataset6 split-bucket precedent) —
# making the ENTIRE simhash machinery (majority vote, bit pack, band
# blocking, popcount radius filter) driver-HASHABLE. Production keeps
# xxhash64 (cheaper bytes); the twins verify the machinery.

def _simhash_sql_cte() -> str:
    bit_sums = ",\n               ".join(
        f"CAST(SUM((hx >> {b}) & 1) AS BIGINT) AS b{b}" for b in range(32)
    )
    packed = " + ".join(
        f"(CASE WHEN b{b} * 2 > n THEN {1 << b} ELSE 0 END)" for b in range(32)
    )
    return f"""
    tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    hx AS MATERIALIZED (
        SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS hx
        FROM tok
    ),
    votes AS MATERIALIZED (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
               {bit_sums}
        FROM hx GROUP BY doc_id
    ),
    sh AS MATERIALIZED (
        SELECT doc_id, CAST({packed} AS BIGINT) AS simhash FROM votes
    )"""


_SIMHASH_EXACT_ORACLE = f"""
    WITH {_simhash_sql_cte()}
    SELECT doc_id, simhash FROM sh ORDER BY doc_id
"""

_HAMMING_EXACT_ORACLE = f"""
    WITH {_simhash_sql_cte()},
    bands AS MATERIALIZED (
        SELECT doc_id, simhash, CAST(r.range AS BIGINT) AS band_idx,
               (simhash >> (CAST(r.range AS INTEGER) * {BAND_BITS}))
                   & {(1 << BAND_BITS) - 1} AS band_val
        FROM sh, range({BANDS}) r
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
        WHERE a.doc_id < b.doc_id
    )
    SELECT i, j, hamming FROM pairs WHERE hamming <= {HAMMING_RADIUS}
    ORDER BY i, j
"""


def simhash_md5_codes(docs: DataFrame) -> DataFrame:
    """32-bit SimHash with md5-derived token hashes — the exact twin
    of ``dedup.dedup_simhash``'s xxhash64 core, same majority-vote →
    bit-pack plan (explode, 32 conditional sums, one doc_id shuffle)."""
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tok = tok.withColumn(
        "hx", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    )
    bit_sums = [
        F.sum(F.shiftright("hx", b).bitwiseAND(F.lit(1))).alias(f"b{b}")
        for b in range(32)
    ]
    votes = tok.groupBy("doc_id").agg(F.count("*").alias("n"), *bit_sums)
    simhash = None
    for b in range(32):
        bit = F.when(F.col(f"b{b}") * 2 > F.col("n"), F.lit(1 << b)).otherwise(F.lit(0))
        simhash = bit if simhash is None else simhash + bit
    return votes.select("doc_id", simhash.cast("long").alias("simhash"))


@query(
    "dedup_simhash_exact",
    oracle=_SIMHASH_EXACT_ORACLE,
    tags=("llm", "dedup", "simhash"),
)
def dedup_simhash_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable SimHash codes (md5 token hashes) — converts the
    rows-only simhash family to exact cross-engine verification; the
    production operator stays ``dedup_simhash`` (xxhash64)."""
    from flume_source_spark.pipeline.dedup import spread
    from flume_source_spark.tables import load_tables

    docs = spread(load_tables(spark, sf_dir)["documents"])
    return simhash_md5_codes(docs).orderBy("doc_id")


@query(
    "dedup_simhash_hamming_exact",
    oracle=_HAMMING_EXACT_ORACLE,
    tags=("llm", "dedup", "simhash", "lsh"),
)
def dedup_simhash_hamming_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-radius pair join over the md5 SimHash codes — the
    hash-oracled twin of ``dedup_simhash_hamming_join``: identical
    band blocking (pigeonhole exact recall at radius ≤ BANDS−1) and
    popcount filter, verified value-exact against DuckDB's own band
    join + bit_count."""
    from flume_source_spark.pipeline.dedup import spread
    from flume_source_spark.tables import load_tables

    docs = spread(load_tables(spark, sf_dir)["documents"])
    return hamming_pairs(simhash_md5_codes(docs)).orderBy("i", "j")
