"""Entity resolution wave 2: Fellegi-Sunter scoring over
sorted-neighborhood candidates.

``entity_fs_linkage_scores`` — the probabilistic-record-linkage
mechanic that ``dedup_fuzzy_names`` (single-predicate decision) does
not cover: EACH compared field contributes an agreement/disagreement
weight (log-odds of match vs unmatch, the Fellegi-Sunter m/u
framework), the weights SUM, and thresholds partition candidate pairs
into match / possible (clerical review) / non-match.

Candidate generation is SORTED-NEIGHBORHOOD, not bucket blocking —
the deliberate contrast with dedup_fuzzy_names' brand blocks: sort
records within a coarse partition (brand) by the linkage key (name,
id tiebreak), then compare each record only with its next W=8
neighbors. Pairs are EXACTLY N·W — linear in the corpus — vs bucket
blocking's Σ|B|², which this module's first draft measured hitting a
quadratic wall at 8× fixture scale (25 brands × 6400-row blocks =
half a billion Levenshtein pairs; the probe timed out — that wall is
WHY sorted-neighborhood exists). The window join is realized as a
W-way literal explode + equi-join on (partition, rank + offset): no
non-equi band join, no skew beyond the sort itself.

Determinism: weights are pinned integer centilogits; comparators are
integer decisions (Levenshtein band on name, type equality, size ±1),
so scores and classes hash cross-engine. m/u weights would normally
be EM-estimated over the candidate set; pinning them keeps the twin
deterministic while exercising the full scoring shape.

Scale: one sort per partition (the shuffle), N·W scored pairs, output
pruned to score ≥ REVIEW_T. At 100 TB the standard multi-pass recipe
(several sort keys, union the candidate sets, dedup pairs) is W small
unions of exactly this plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# (agree, disagree) centilogit weights per field — pinned literals
_W_NAME = (24, -8)
_W_TYPE = (12, -6)
_W_SIZE = (8, -4)
_MATCH_T = 30
_REVIEW_T = 10
_WINDOW = 8  # sorted-neighborhood width

_FS_ORACLE = f"""
    WITH ranked AS (
        SELECT p_partkey, p_brand, p_name, p_type, p_size,
               CAST(row_number() OVER (PARTITION BY p_brand
                        ORDER BY p_name, p_partkey) AS BIGINT) AS rnk
        FROM part
    ),
    cand AS (
        SELECT a.p_partkey AS i, b.p_partkey AS j, a.p_brand,
               CASE WHEN levenshtein(a.p_name, b.p_name) <= 3
                    THEN {_W_NAME[0]} ELSE {_W_NAME[1]} END AS w_name,
               CASE WHEN a.p_type = b.p_type
                    THEN {_W_TYPE[0]} ELSE {_W_TYPE[1]} END AS w_type,
               CASE WHEN abs(a.p_size - b.p_size) <= 1
                    THEN {_W_SIZE[0]} ELSE {_W_SIZE[1]} END AS w_size
        FROM ranked a
        CROSS JOIN (SELECT unnest(generate_series(1, {_WINDOW})) AS off) o
        JOIN ranked b ON b.p_brand = a.p_brand AND b.rnk = a.rnk + o.off
    ),
    scored AS (
        SELECT least(i, j) AS i, greatest(i, j) AS j, p_brand,
               CAST(w_name AS BIGINT) AS w_name,
               CAST(w_type AS BIGINT) AS w_type,
               CAST(w_size AS BIGINT) AS w_size,
               CAST(w_name + w_type + w_size AS BIGINT) AS score
        FROM cand
    )
    SELECT i, j, p_brand, w_name, w_type, w_size, score,
           CASE WHEN score >= {_MATCH_T} THEN 'match' ELSE 'possible' END AS link_class
    FROM scored
    WHERE score >= {_REVIEW_T}
    ORDER BY i, j
"""


@query("entity_fs_linkage_scores", oracle=_FS_ORACLE, tags=("llm", "entity", "linkage"))
def entity_fs_linkage_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter linkage scoring over sorted-neighborhood
    candidates (W=8 neighbors in brand-partitioned name order —
    exactly N·W pairs, linear): per-field integer agreement weights
    summed into a score, thresholded into match/possible; only
    review-worthy pairs survive. Pair ids are canonicalized
    (i = min, j = max) so each pair appears once."""
    from pyspark.sql import Window

    p = load_tables(spark, sf_dir)["part"].select(
        "p_partkey", "p_brand", "p_name", "p_type", "p_size"
    )
    ranked = p.withColumn(
        "rnk",
        F.row_number()
        .over(Window.partitionBy("p_brand").orderBy("p_name", "p_partkey"))
        .cast("long"),
    )
    a = ranked.select(
        F.col("p_partkey").alias("ia"), F.col("p_brand").alias("brand_a"),
        F.col("p_name").alias("name_a"), F.col("p_type").alias("type_a"),
        F.col("p_size").alias("size_a"), F.col("rnk").alias("rnk_a"),
    ).withColumn(
        "off", F.explode(F.array(*[F.lit(o) for o in range(1, _WINDOW + 1)]))
    )
    b = ranked.select(
        F.col("p_partkey").alias("jb"), F.col("p_brand").alias("brand_b"),
        F.col("p_name").alias("name_b"), F.col("p_type").alias("type_b"),
        F.col("p_size").alias("size_b"), F.col("rnk").alias("rnk_b"),
    )
    cand = a.join(
        b,
        (F.col("brand_a") == F.col("brand_b"))
        & (F.col("rnk_b") == F.col("rnk_a") + F.col("off")),
    )
    w_name = F.when(
        F.levenshtein("name_a", "name_b") <= 3, F.lit(_W_NAME[0])
    ).otherwise(F.lit(_W_NAME[1]))
    w_type = F.when(F.col("type_a") == F.col("type_b"), F.lit(_W_TYPE[0])).otherwise(
        F.lit(_W_TYPE[1])
    )
    w_size = F.when(
        F.abs(F.col("size_a") - F.col("size_b")) <= 1, F.lit(_W_SIZE[0])
    ).otherwise(F.lit(_W_SIZE[1]))
    scored = cand.select(
        F.least("ia", "jb").alias("i"),
        F.greatest("ia", "jb").alias("j"),
        F.col("brand_a").alias("p_brand"),
        w_name.cast("long").alias("w_name"),
        w_type.cast("long").alias("w_type"),
        w_size.cast("long").alias("w_size"),
    ).withColumn("score", (F.col("w_name") + F.col("w_type") + F.col("w_size")).cast("long"))
    return (
        scored.filter(F.col("score") >= _REVIEW_T)
        .select(
            "i", "j", "p_brand", "w_name", "w_type", "w_size", "score",
            F.when(F.col("score") >= _MATCH_T, "match").otherwise("possible").alias("link_class"),
        )
        .orderBy("i", "j")
    )
