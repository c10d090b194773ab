"""SemDeDup — semantic deduplication over embeddings (Abbas et al.
2023, "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication"): k-means-cluster the embedding space, then prune
near-duplicate pairs WITHIN each cluster only. MinHash/Jaccard dedup
catches lexical duplicates; SemDeDup catches *semantic* ones (same
content re-worded, translations, template variants) that share almost
no shingles.

Scale design — why this survives 100 TB where naive cosine dedup
cannot:
- the all-pairs cosine graph is O(N²); clustering first bounds the
  quadratic term to Σ_c |c|² exactly like LSH buckets bound the
  shingle join (``dedup.py``) and label blocking bounds
  ``sim_embedding_neardup``. With nlist ∝ √N, expected cluster size
  is O(√N) and total pair work O(N^1.5); the paper runs this shape at
  web scale with k in the tens of thousands.
- training is the shared distributed Lloyd quantizer
  (``similarity.train_spherical_kmeans``): ≤ nlist rows ever reach
  the driver, every round is broadcast-assign + map-side-combinable
  means.
- the keep/drop rule is the paper's greedy policy made deterministic:
  within a cluster, order by vec_id and drop an item iff it has
  cosine ≥ τ with ANY lower-id item of the same cluster (no
  transitive closure — a dropped item still shields its successors,
  matching the reference implementation's behavior). One
  cluster-keyed self-join (i < j) + an anti-join–shaped distinct.

Correctness: rows-only by construction (k-means assignments are
float-boundary-sensitive and not expressible in portable SQL); pinned
instead by tests/test_llm_ops.py — exact numpy recomputation of the
greedy invariant over every vector, determinism across runs, and
planted near-dups actually pruned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.dedup import spread
from flume_source_spark.pipeline.similarity import (
    _dvec,
    assign_nearest,
    train_spherical_kmeans,
)
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

SEM_TAU = 0.35  # same similarity floor the fixture's planted near-dups exceed
SEM_NLIST = 16
SEM_ITERS = 2
# Hot-cluster cap, same motivation as dedup.MAX_BUCKET: one degenerate
# cluster of b members costs b·(b−1)/2 pairs — a near-duplicate-heavy
# corpus or a boilerplate-capturing centroid (exactly the data this
# operator targets) would otherwise make the within-cluster join
# quadratic with no bound. ENFORCED in ``semdedup_decisions``: clusters
# above the cap are excluded from pair expansion (members kept,
# ``cluster_overflow`` reported) and should be re-clustered with a
# larger nlist by the caller. The fixture never hits it (≤500 vectors).
MAX_CLUSTER = 2000


def semdedup_decisions(e: DataFrame, tau: float = SEM_TAU, nlist: int = SEM_NLIST, iters: int = SEM_ITERS) -> DataFrame:
    """Core SemDeDup over an ``(vec_id, embedding)`` DataFrame —
    factored out of the registry query so the degenerate-cluster
    guard can be driven directly in tests.

    MAX_CLUSTER enforcement: cluster sizes are one groupBy-count
    (≤ nlist rows, broadcast back); members of clusters above the cap
    are EXCLUDED from the i<j pair join — their is_dropped stays
    False — bounding the quadratic term exactly as ``dedup.py``'s
    MAX_BUCKET bounds LSH buckets. The right production follow-up for
    an over-cap cluster is re-clustering with a larger nlist; not
    silently pair-expanding it."""
    import numpy as np

    # the fixture arrives as ONE parquet split — hash-spread so the
    # matmul kernels and the pairwise join use every core (at 100 TB
    # input splits already provide this; see dedup.spread). Persist:
    # the embeddings are scanned ~8× across Lloyd rounds, assignment
    # and the pairwise join; at 100 TB this is MEMORY_AND_DISK on the
    # N×dim vectors — still linear state, the standard k-means
    # trade-off, not a driver collect.
    e = spread(e, "vec_id").persist()
    c_mat = train_spherical_kmeans(e, nlist, iters)
    assigned = assign_nearest(e, c_mat, 1)

    # centroid_sim via JVM expressions against the broadcast-sized
    # centroid literal array (nlist × dim doubles).
    cent = F.array(*[F.array(*[F.lit(float(x)) for x in row]) for row in np.asarray(c_mat)])
    # unit-normalize each vector ONCE (O(N)): the within-cluster pair
    # predicate below becomes a single dot-fold instead of three
    # (cosine = dot ÷ norms), and centroid_sim reduces to a plain dot
    # because train_spherical_kmeans returns unit-norm centroids —
    # the same O(N²)→O(N)+O(pairs) move as graph2.similarity_edges.
    from flume_source_spark.pipeline.similarity import _dot

    v0 = _dvec("embedding")
    norm = F.sqrt(_dot(v0, v0))
    ev = (
        e.select("vec_id", F.transform(v0, lambda x: x / norm).alias("v"))
        .join(assigned, "vec_id")
        .withColumn("centroid_sim", F.round(_dot(F.col("v"), F.element_at(cent, F.col("cluster").cast("int") + 1)), 4))
        # materialize ONCE: ev embeds the mapInPandas assignment kernel
        # and is referenced four times below (cluster sizes, both pair
        # sides, final join) — without this each reference re-runs the
        # Python assignment pass over the corpus
        .localCheckpoint(eager=True)
    )

    # hot-cluster guard: only members of ≤ MAX_CLUSTER clusters enter
    # the pairwise join. sizes is ≤ nlist rows → broadcast. The same
    # size table drives the REPORTED ``cluster_overflow`` flag: an
    # over-cap member's is_dropped stays False, but it is now
    # distinguishable from a genuinely unique vector (no silent cap —
    # the lsh_bucket_profile discipline).
    sizes = ev.groupBy("cluster").agg(F.count("*").alias("c_size"))
    ok_clusters = sizes.filter(F.col("c_size") <= MAX_CLUSTER).select("cluster")
    pairable = ev.join(F.broadcast(ok_clusters), "cluster")

    a = pairable.select(F.col("vec_id").alias("i"), "cluster", F.col("v").alias("va"))
    b = pairable.select(F.col("vec_id").alias("j"), F.col("cluster").alias("cluster_b"), F.col("v").alias("vb"))
    dropped = (
        a.join(b, (F.col("cluster") == F.col("cluster_b")) & (F.col("i") < F.col("j")))
        .filter(_dot(F.col("va"), F.col("vb")) >= tau)
        .select(F.col("j").alias("vec_id"))
        .distinct()
        .withColumn("is_dropped", F.lit(True))
    )
    return (
        ev.join(dropped, "vec_id", "left")
        .join(F.broadcast(sizes), "cluster")
        .select(
            "vec_id",
            "cluster",
            F.col("centroid_sim").cast("double").alias("centroid_sim"),
            F.coalesce("is_dropped", F.lit(False)).alias("is_dropped"),
            (F.col("c_size") > MAX_CLUSTER).alias("cluster_overflow"),
        )
        .orderBy("vec_id")
    )


@query(
    "ds_semdedup",
    oracle=None,  # float-boundary k-means → rows-only; greedy invariant
    # recomputed exactly in numpy by tests/test_llm_ops.py
    tags=("llm", "dedup", "embedding", "dataset"),
)
def ds_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup decision per vector: (vec_id, cluster,
    centroid_sim, is_dropped, cluster_overflow). ``is_dropped`` is
    True iff the vector has cosine ≥ SEM_TAU with a lower-vec_id
    member of its own cluster (the cluster being ≤ MAX_CLUSTER — see
    ``semdedup_decisions``); ``cluster_overflow`` is True for members
    of clusters the cap excluded from pair expansion (kept, but
    flagged — re-cluster with a larger nlist); ``centroid_sim``
    (rounded 4 dp) is the spherical-k-means assignment similarity —
    the quantity the paper uses to choose which duplicate to keep and
    a per-cluster cohesion diagnostic."""
    return semdedup_decisions(load_tables(spark, sf_dir)["embeddings"])
