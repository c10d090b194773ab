"""Embedding-column statistics: per-label centroids and cluster
cohesion — the embedding-space health report run before/after any
clustering-based curation (is a label actually a tight cluster, or
noise?).

``emb_centroid_cohesion``: per label, the elementwise-mean centroid
(computed distributively: posexplode → partial avg per (label, dim) —
the same shuffle shape as the IVF Lloyd step in
``pipeline/similarity.py``; NEVER a collect of vectors) and then each
label's mean/min cosine of members to their own centroid.

Scale: two shuffles — (label, dim) partial-avg (map-side combinable,
output = |labels|·dim rows) and the per-label cohesion aggregate. The
centroid table is |labels|·dim ≪ corpus, broadcast back for the
cosine pass; corpus embeddings stream through both passes without
repartitioning. Floats: the cosine is rounded 4 dp and the centroid
components 6 dp on BOTH engines before the cosine, so partial-avg
ordering noise cannot reach the compared digits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.similarity import _dvec
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_COHESION_ORACLE = """
    WITH m AS (
        -- DuckDB 1.0: no WITH ORDINALITY / lateral generate_series
        -- over a column, so the unnest is a cross join against the
        -- fixed embedding dim (64), guarded by len()
        SELECT label, g.i - 1 AS dim,
               round(avg(CAST(embedding[g.i] AS DOUBLE)), 6) AS c
        FROM embeddings, generate_series(1, 64) AS g(i)
        WHERE g.i <= len(embedding)
        GROUP BY label, g.i
    ),
    cent AS (
        SELECT label, list(c ORDER BY dim) AS centroid FROM m GROUP BY label
    ),
    cos AS (
        SELECT e.label, e.vec_id,
               list_cosine_similarity(
                   list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                   c.centroid) AS sim
        FROM embeddings e JOIN cent c ON e.label = c.label
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(round(avg(sim), 4) AS DOUBLE) AS mean_cohesion,
           CAST(round(min(sim), 4) AS DOUBLE) AS min_cohesion
    FROM cos GROUP BY label ORDER BY label
"""


@query("emb_centroid_cohesion", oracle=_COHESION_ORACLE, tags=("llm", "similarity", "embedding"))
def emb_centroid_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (distributed elementwise mean) + member→
    centroid cosine cohesion. The oracle recomputes the centroid and
    cosine independently with DuckDB list functions."""
    e = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", "label", _dvec("embedding").alias("v")
    )
    # distributed elementwise mean per label (posexplode → avg)
    cent = (
        e.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("pairs"))
        .select("label", F.transform("pairs", lambda p: p["c"]).alias("centroid"))
    )
    j = e.join(F.broadcast(cent), "label")
    dot = F.aggregate(F.zip_with("v", "centroid", lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x)
    nv = F.sqrt(F.aggregate(F.transform("v", lambda a: a * a), F.lit(0.0), lambda s, x: s + x))
    nc = F.sqrt(
        F.aggregate(F.transform("centroid", lambda a: a * a), F.lit(0.0), lambda s, x: s + x)
    )
    return (
        j.select("label", (dot / (nv * nc)).alias("sim"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.avg("sim"), 4).cast("double").alias("mean_cohesion"),
            F.round(F.min("sim"), 4).cast("double").alias("min_cohesion"),
        )
        .orderBy("label")
    )


QUANT_BITS = 8

_QUANT_ORACLE = """
    WITH b AS (  -- per-dimension min/max over the corpus (the codebook)
        SELECT g.i AS dim,
               min(CAST(embedding[g.i] AS DOUBLE)) AS lo,
               max(CAST(embedding[g.i] AS DOUBLE)) AS hi
        FROM embeddings, generate_series(1, 64) AS g(i)
        WHERE g.i <= len(embedding)
        GROUP BY g.i
    ),
    codes AS (
        SELECT e.vec_id, b.dim,
               coalesce(CAST(least(255, greatest(0,
                   floor((CAST(e.embedding[b.dim] AS DOUBLE) - b.lo)
                         / nullif(b.hi - b.lo, 0) * 256))) AS BIGINT), 0) AS code
        FROM embeddings e, b
    )
    SELECT vec_id,
           CAST(count(*) AS BIGINT) AS n_dims,
           CAST(sum(code) AS BIGINT) AS code_sum,
           CAST(min(code) AS BIGINT) AS code_min,
           CAST(max(code) AS BIGINT) AS code_max
    FROM codes GROUP BY vec_id ORDER BY vec_id
"""


@query("emb_quantize_int8", oracle=_QUANT_ORACLE, tags=("llm", "similarity", "embedding", "quantization"))
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (per-dimension min-max) int8 quantization of the
    embedding column — the 4× memory cut that makes billion-vector ANN
    fit in RAM: codebook = per-dim (lo, hi) over the corpus (one
    bounded aggregate, dim rows out), code = floor((x-lo)/(hi-lo)·256)
    clamped to [0,255]. Emitted as per-vector code digests (sum/min/
    max) so the hash check pins every code without exploding output.
    The codebook is dims-sized → broadcast back; the corpus never
    shuffles. Quantization arithmetic is identical floor/clamp ops on
    identical doubles on both engines — exact, no rounding gamble."""
    e = load_tables(spark, sf_dir)["embeddings"].select("vec_id", _dvec("embedding").alias("v"))
    dims = e.select("vec_id", F.posexplode("v").alias("dim0", "x")).select(
        "vec_id", (F.col("dim0") + 1).alias("dim"), "x"
    )
    book = dims.groupBy("dim").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    # coalesce(…, 0) on BOTH sides pins constant-dimension (hi == lo)
    # behavior explicitly: the nullif division yields NULL, and the
    # engines disagree on NULL through least/greatest (Spark's
    # least/greatest skip NULLs; DuckDB 1.0 propagates), so a constant
    # dim maps to code 0 by contract rather than by engine version.
    code = F.coalesce(
        F.least(
            F.lit(255),
            F.greatest(
                F.lit(0),
                F.floor((F.col("x") - F.col("lo")) / F.nullif(F.col("hi") - F.col("lo"), F.lit(0)) * 256),
            ),
        ).cast("long"),
        F.lit(0),
    )
    return (
        dims.join(F.broadcast(book), "dim")
        .select("vec_id", code.alias("code"))
        .groupBy("vec_id")
        .agg(
            F.count("*").alias("n_dims"),
            F.sum("code").cast("long").alias("code_sum"),
            F.min("code").cast("long").alias("code_min"),
            F.max("code").cast("long").alias("code_max"),
        )
        .orderBy("vec_id")
    )
