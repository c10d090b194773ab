"""Similarity wave 3: bulk k-NN graph construction.

``sim_knn_graph`` — every corpus vector's top-k nearest neighbors
(cosine), not just a bounded query panel's: the all-points variant
that feeds graph-based ANN indexes (HNSW/NN-descent bootstrap),
SemDeDup-style neighborhood pruning, and label-propagation over
embedding space. This fills the gap between ``sim_cosine_topk``
(Q_MAX queries × corpus — query side bounded) and the thresholded
near-dup edge set (``similarity_edges`` — membership, no ranking).

Blocking: pairs are generated within ``label`` blocks (the house
blocked-pair discipline — a bounded-block pair join, never a corpus
cross join; at 100 TB the blocks come from IVF cells or LSH buckets
instead of labels, same plan shape, and NN-descent refines across
block boundaries iteratively). Directed pairs (i ≠ j within block):
each node RECEIVES a ranked neighbor list, so both orientations of a
pair exist by construction — the pair frame is 2× the undirected one,
still block-bounded.

Ranking determinism: vectors are unit-normalized once, the pair score
is the same left-fold dot both engines run in identical IEEE order
(the graph2._EDGE_CTE argument — hash-green precedent), so the FLOAT
ordering is bitwise identical cross-engine; true ties (identical
dots) break on neighbor id ascending. Output similarity is rounded to
4 dp per the house canonicalization; the RANKING uses full precision.

Scale: one pair join shuffling on the block key, one row_number
window shuffling on the source vertex, nothing quadratic outside
blocks. Per-node output is exactly min(k, block_size − 1) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.similarity import _dot, _dvec
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_KNN_K = 3

_KNN_ORACLE = f"""
    WITH e0 AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    e AS (SELECT vec_id, label,
                 list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS v
          FROM e0),
    pairs AS (
        SELECT a.vec_id AS i, b.vec_id AS j, a.label,
               list_dot_product(a.v, b.v) AS sim
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT i, j, label, sim,
               row_number() OVER (PARTITION BY i ORDER BY sim DESC, j) AS rnk
        FROM pairs
    )
    SELECT i AS vec_id, CAST(rnk AS BIGINT) AS rank, j AS neighbor_id, label,
           CAST(round(sim, 4) AS DOUBLE) AS cos_sim
    FROM ranked WHERE rnk <= {_KNN_K}
    ORDER BY vec_id, rank
"""


def knn_graph(e: DataFrame, k: int = _KNN_K) -> DataFrame:
    """Top-k neighbor lists over a ``(vec_id, label, v0)`` frame
    (v0 = raw double vector): normalize once, block-bounded directed
    pair join, per-source row_number window. Factored so planted
    geometry tests (known nearest neighbors) drive the production
    path."""
    from pyspark.sql import Window

    norm = F.sqrt(_dot(F.col("v0"), F.col("v0")))
    e = e.select("vec_id", "label", F.transform("v0", lambda x: x / norm).alias("v"))
    a = e.select(F.col("vec_id").alias("i"), "label", F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("j"), F.col("label").alias("lb"), F.col("v").alias("vb"))
    pairs = a.join(b, (F.col("label") == F.col("lb")) & (F.col("i") != F.col("j"))).select(
        "i", "j", "label", _dot(F.col("va"), F.col("vb")).alias("sim")
    )
    w = Window.partitionBy("i").orderBy(F.col("sim").desc(), F.col("j"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("i").alias("vec_id"),
            F.col("rnk").cast("long").alias("rank"),
            F.col("j").alias("neighbor_id"),
            "label",
            F.round("sim", 4).cast("double").alias("cos_sim"),
        )
        .orderBy("vec_id", "rank")
    )


@query("sim_knn_graph", oracle=_KNN_ORACLE, tags=("llm", "similarity", "graph"))
def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk k-NN graph (k=3, cosine, label-blocked): every vector's
    ranked neighbor list — the all-points companion to
    sim_cosine_topk and the bootstrap input for graph-based ANN."""
    e = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", "label", _dvec("embedding").alias("v0")
    )
    return knn_graph(e)
