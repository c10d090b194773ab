"""Entity resolution: fuzzy-name deduplication.

``dedup_fuzzy_names`` — the classic record-linkage shape: candidate
pairs from a BLOCKING key (p_brand — bounds the quadratic term at
block size, exactly the role labels play in
``sim_embedding_neardup`` and buckets play in LSH), then an edit-
distance decision: Levenshtein ≤ 4 OR a normalized similarity
1 − d/max(len) ≥ 0.6. Both engines implement the identical classic
Levenshtein (unit costs, no transpositions) so the integer distances
hash-match exactly — pinned precisely because "our fuzzy match
disagrees across engines" is the most common entity-resolution
portability bug (DuckDB ALSO ships jaro_winkler; Spark does not —
staying on Levenshtein keeps the decision engine-portable).

Scale: Levenshtein is O(|a|·|b|) PER PAIR — at 100 TB the blocking
key is the entire cost model: pairs = Σ_blocks |B|². When no natural
block exists, derive one (first-token, phonetic bucket, length
bucket ±1, or q-gram LSH) — every option already demonstrated as a
bucket-join in the dedup family. The decision predicate stays
unchanged under any blocking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_FUZZY_ORACLE = """
    WITH pairs AS (
        SELECT a.p_partkey AS i, b.p_partkey AS j, a.p_brand,
               a.p_name AS name_i, b.p_name AS name_j,
               CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
               greatest(length(a.p_name), length(b.p_name)) AS mx
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    )
    SELECT i, j, p_brand, name_i, name_j, dist,
           CAST(round(1.0 - dist / CAST(mx AS DOUBLE), 4) AS DOUBLE) AS sim
    FROM pairs
    WHERE dist <= 4 OR 1.0 - dist / CAST(mx AS DOUBLE) >= 0.6
    ORDER BY i, j
"""


@query("dedup_fuzzy_names", oracle=_FUZZY_ORACLE, tags=("llm", "dedup", "entity"))
def dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-blocked Levenshtein matching: blocking bounds the
    quadratic term; the edit-distance decision is engine-portable."""
    p = load_tables(spark, sf_dir)["part"]
    a = p.select(
        F.col("p_partkey").alias("i"), "p_brand", F.col("p_name").alias("name_i")
    )
    b = p.select(
        F.col("p_partkey").alias("j"),
        F.col("p_brand").alias("brand_b"),
        F.col("p_name").alias("name_j"),
    )
    pairs = (
        a.join(b, (F.col("p_brand") == F.col("brand_b")) & (F.col("i") < F.col("j")))
        .withColumn("dist", F.levenshtein("name_i", "name_j").cast("int"))
        .withColumn("mx", F.greatest(F.length("name_i"), F.length("name_j")))
        # filter on the RAW ratio (identical IEEE expr in the oracle);
        # rounding is display-only — filtering on the rounded value
        # would disagree with the oracle at round-boundary ratios
        .withColumn("sim_raw", 1.0 - F.col("dist") / F.col("mx").cast("double"))
    )
    return (
        pairs.filter((F.col("dist") <= 4) | (F.col("sim_raw") >= 0.6))
        .select(
            "i", "j", "p_brand", "name_i", "name_j", "dist",
            F.round("sim_raw", 4).alias("sim"),
        )
        .orderBy("i", "j")
    )
