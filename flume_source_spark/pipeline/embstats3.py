"""Embedding stats wave 3: truncation (Matryoshka-style) energy audit.

``emb_prefix_energy`` — how much of each embedding's squared norm
survives truncation to the first P dimensions, for P ∈ {8,16,32,64}?
This is the go/no-go audit for dimension-truncated serving
(Matryoshka representation learning popularized shipping ONE vector
and truncating it per use-case): if the energy isn't front-loaded,
truncated retrieval quality collapses, and the decision should be
``emb_pca_power``/``emb_dim_variance_prune`` instead.

Exactness/portability: the per-vector retained ratio is a DOUBLE
computed in the identical IEEE order on both engines (left-fold dot
over the P-slice ÷ left-fold dot over the full vector, then one
multiply and one floor into ppm) — per-ROW float ops are bitwise
cross-engine (the graph2._EDGE_CTE precedent); all cross-ROW
aggregation then happens on the integer ppm values (BIGINT sums /
counts / min), so no float accumulation-order hazard exists anywhere.

Scale: one corpus scan, a 4× literal explode, map-side-combinable
integer aggregates onto 4 group keys. Nothing shuffles but 4-key
partials."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.similarity import _dot, _dvec
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_PREFIXES = (8, 16, 32, 64)

_PREFIX_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    px AS (
        SELECT vec_id, p,
               CAST(floor((list_dot_product(v[1:p], v[1:p])
                           / list_dot_product(v, v)) * 1000000.0) AS BIGINT) AS retained_ppm
        FROM e CROSS JOIN (SELECT unnest([{", ".join(str(p) for p in _PREFIXES)}]) AS p)
    )
    SELECT CAST(p AS BIGINT) AS prefix_len,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(retained_ppm) // count(*) AS BIGINT) AS avg_retained_ppm,
           CAST(min(retained_ppm) AS BIGINT) AS min_retained_ppm,
           CAST(sum(CASE WHEN retained_ppm >= 900000 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_90pct
    FROM px GROUP BY p ORDER BY prefix_len
"""


@query("emb_prefix_energy", oracle=_PREFIX_ORACLE, tags=("llm", "embedding", "audit"))
def emb_prefix_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retained-energy audit for prefix truncation at P ∈ {8,16,32,
    64}: per-vector double ratio floored into ppm (bitwise cross-
    engine), then integer-only rollups — avg (exact DIV), min, and
    the ≥90%-retained count per prefix length."""
    e = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", _dvec("embedding").alias("v")
    )
    px = e.select(
        "vec_id", "v", F.explode(F.array(*[F.lit(p) for p in _PREFIXES])).alias("p")
    )
    retained = F.floor(
        (_dot(F.slice(F.col("v"), 1, F.col("p")), F.slice(F.col("v"), 1, F.col("p")))
         / _dot(F.col("v"), F.col("v"))) * 1000000.0
    ).cast("long")
    px = px.select(F.col("p").cast("long").alias("prefix_len"), retained.alias("retained_ppm"))
    return (
        px.groupBy("prefix_len")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.expr("CAST(sum(retained_ppm) DIV count(*) AS BIGINT)").alias("avg_retained_ppm"),
            F.min("retained_ppm").cast("long").alias("min_retained_ppm"),
            F.sum(F.when(F.col("retained_ppm") >= 900000, 1).otherwise(0))
            .cast("long")
            .alias("n_ge_90pct"),
        )
        .orderBy("prefix_len")
    )
