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
    ceil_sqrt,
    train_spherical_kmeans,
)
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

SEM_TAU = 0.35  # same similarity floor the fixture's planted near-dups exceed
# Floor for the ADAPTIVE default (below), and the fixed override
# determinism tests pass explicitly.
SEM_NLIST = 16
# Ceiling: train_spherical_kmeans ships nlist×dim doubles to the
# driver per Lloyd round and the centroid table broadcast is
# nlist×dim×8 B — 32k × 64 ≈ 16 MB, the conventional broadcast limit.
SEM_NLIST_MAX = 32768
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


def _default_nlist(n: int) -> int:
    """Adaptive cluster count (VERDICT r6 item 4):
    max(⌈√N⌉, ⌈N/(MAX_CLUSTER/2)⌉) clamped to [SEM_NLIST,
    SEM_NLIST_MAX]. The √N term gives O(N^1.5) total pair work (the
    shape the module docstring and SCALE.md's measurements argue
    for); the second term keeps the MEAN cluster size at or below
    half the hot-cluster cap — pure √N crosses MAX_CLUSTER at
    N = MAX_CLUSTER² (4M vectors) and would start flagging overflow
    on perfectly balanced data. A FIXED nlist (the old default 16)
    degrades far sooner: at 100× corpus, mean size ≈ N/16 blows
    through MAX_CLUSTER and the operator flags ~everything
    cluster_overflow while deduping nothing. Beyond
    N ≈ SEM_NLIST_MAX·MAX_CLUSTER/2 (~3×10⁷ with these constants)
    the ceiling wins and overflow returns — at that scale a single
    flat k-means is the wrong tool; shard or cluster hierarchically
    (the paper's web-scale runs do), then apply this per shard."""
    by_cap = -(-n // (MAX_CLUSTER // 2))  # ⌈N / (MAX_CLUSTER/2)⌉
    return max(SEM_NLIST, min(SEM_NLIST_MAX, max(ceil_sqrt(n), by_cap)))


def semdedup_decisions(e: DataFrame, tau: float = SEM_TAU, nlist: int | None = None, iters: int = SEM_ITERS) -> DataFrame:
    """Core SemDeDup over an ``(vec_id, embedding)`` DataFrame —
    factored out of the registry query so the degenerate-cluster
    guard can be driven directly in tests. ``nlist=None`` (the
    default) resolves to ``_default_nlist(count)`` — √N-tracking;
    pass a fixed value for determinism tests or explicit tuning.

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
    cached = spread(e, "vec_id").persist()
    e = cached
    n = e.count()  # one job; also materializes the cache
    if nlist is None:
        nlist = _default_nlist(n)
    # SIZE-DERIVED partition count for the Python-kernel stages
    # (guide §2: scale-adaptive partitioning, not a core-count
    # constant). The Lloyd/assignment kernels spawn one Python worker
    # PER PARTITION; at fixture scale defaultParallelism partitions
    # hold ~60 rows each, so the stage pays 32 worker spawns (each a
    # full interpreter+numpy init — §4.5's per-task cost) to matmul a
    # few KB, and the round-13 bench diagnosis showed exactly those
    # spawn storms stalling the entry for tens of seconds in long
    # 32-core sessions (OPTIMIZATION_r13.md). ⌈N/500⌉ partitions give
    # every worker a real batch; the defaultParallelism ceiling means
    # at scale (N ≥ 500·cores) this is a no-op and every core works.
    p = max(1, min(e.sparkSession.sparkContext.defaultParallelism, -(-n // 500)))
    if p < e.rdd.getNumPartitions():
        e = e.coalesce(p)
    c_mat = train_spherical_kmeans(e, nlist, iters)
    assigned = assign_nearest(e, c_mat, 1)

    # centroid_sim via a BROADCAST-JOINED (cluster, cvec) table, not a
    # plan-embedded literal array: a literal is nlist×dim expression
    # nodes — fine at nlist=16, Catalyst-hostile at the √N defaults
    # (nlist in the thousands). The table is ≤ nlist rows ≤ 16 MB at
    # SEM_NLIST_MAX — always broadcastable.
    cent_rows = [(int(i), [float(x) for x in row]) for i, row in enumerate(np.asarray(c_mat))]
    # unit-normalize each vector ONCE (O(N)): the within-cluster pair
    # predicate below becomes a single dot-fold instead of three
    # (cosine = dot ÷ norms), and centroid_sim reduces to a plain dot
    # because train_spherical_kmeans returns unit-norm centroids —
    # the same O(N²)→O(N)+O(pairs) move as graph2.similarity_edges.
    from flume_source_spark.pipeline.similarity import _dot

    v0 = _dvec("embedding")
    norm = F.sqrt(_dot(v0, v0))
    cent_df = e.sparkSession.createDataFrame(cent_rows, "cluster LONG, cvec ARRAY<DOUBLE>")
    ev = (
        e.select("vec_id", F.transform(v0, lambda x: x / norm).alias("v"))
        .join(assigned, "vec_id")
        .join(F.broadcast(cent_df), "cluster")
        .withColumn("centroid_sim", F.round(_dot(F.col("v"), F.col("cvec")), 4))
        .drop("cvec")
        # materialize ONCE: ev embeds the mapInPandas assignment kernel
        # and is referenced four times below (cluster sizes, both pair
        # sides, final join) — without this each reference re-runs the
        # Python assignment pass over the corpus
        .localCheckpoint(eager=True)
    )
    # everything downstream reads the checkpointed ev — release the
    # corpus cache instead of leaking one persisted frame per call
    # (bench runs this builder 4×; the leaked blocks survived the run)
    cached.unpersist(blocking=False)

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
