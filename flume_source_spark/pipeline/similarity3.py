"""Similarity wave 3: bulk k-NN graph construction, BOUNDED blocks.

``sim_knn_graph`` — every corpus vector's top-k nearest neighbors
(cosine), not just a bounded query panel's: the all-points variant
that feeds graph-based ANN indexes (HNSW/NN-descent bootstrap),
SemDeDup-style neighborhood pruning, and label-propagation over
embedding space. This fills the gap between ``sim_cosine_topk``
(Q_MAX queries × corpus — query side bounded) and the thresholded
near-dup edge set (``similarity_edges`` — membership, no ranking).

Blocking (round 8 re-shape, VERDICT r7 "What's wrong" #2): candidate
pairs are generated within CAPPED IVF-cell blocks, not label blocks.
The round-7 label-blocked registration was a measured 100×
scale-killer — label count is a fixture constant, so block size grew
O(N) and pair work O(N²): the 8× probe showed 64× pair work → 7.8×
wall (SCALE.md part-7 addendum). The bounded design:

1. assign every vector to its nearest integer-lattice IVF centroid
   (the ``sim_ann_ivf_exact`` coarse quantizer — same lattice
   constants, exact integer L2 argmin, deterministic cross-engine),
2. HARD-CAP each cell at ``KNN_BLOCK_CAP`` members by deterministic
   sub-splitting: row_number within the cell (ordered by vec_id) →
   sub-block min(⌊(rn−1)/cap⌋, ⌊(size−2)/cap⌋) — the min() FOLDS a
   remainder singleton into the previous sub-block (round-9 re-shape,
   ADVICE r8 medium item: a plain ⌊(rn−1)/cap⌋ split leaves a size-1
   trailing sub-block whenever size ≡ 1 (mod cap), and a 1-member
   block generates no pairs, silently dropping that vector from the
   graph). Post-fold every sub-block of a size ≥ 2 cell has 2..cap+1
   members, so per-node pair work is ≤ cap and every such vector
   receives a neighbor list,
3. all-pairs + top-k INSIDE each (cell, sub-block) only; rows whose
   cell exceeded the cap carry ``overflow = 1`` — the flag that says
   "this neighbor list searched a capped slice of the cell" (the
   recall knob: production grows nlist ~ √N like semdedup so cells
   stay near the cap and overflow stays rare; the REGISTERED query
   pins the machinery at fixed nlist = 16),
4. a SINGLETON CELL (exactly one member) has no within-cell neighbor
   at all — those vectors emit one SENTINEL row (rank = 0,
   neighbor_id/cos_sim NULL) instead of vanishing: every input
   vector is present in the output by construction, and a consumer
   can distinguish "isolated at quantizer resolution" (rank 0) from
   "has neighbors" (ranks 1..k).

Pair work is ≤ N·cap — LINEAR in N with a constant cap — versus the
label-blocked N²/|labels|. The label-blocked formulation survives as
``knn_graph`` (the small-fixture oracle path: its planted-geometry
numpy cross-check pins the rank/tie/window machinery both variants
share).

Ranking determinism: vectors are unit-normalized once, the pair score
is the same left-fold dot both engines run in identical IEEE order
(the graph2._EDGE_CTE argument — hash-green precedent), so the FLOAT
ordering is bitwise identical cross-engine; true ties (identical
dots) break on neighbor id ascending. Output similarity is rounded to
4 dp per the house canonicalization; the RANKING uses full precision.

Scale: the centroid panel is a broadcast (nlist rows); the assignment
argmin collapses map-side; the sub-split window and the pair join
shuffle on the cell key; the top-k window shuffles on the source
vertex. Nothing is quadratic anywhere: per-node output is exactly
min(k, block_size − 1) rows and per-node pair work is ≤ cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.similarity import _dot, _dvec, ceil_sqrt
from flume_source_spark.pipeline.similarity2 import _IVFX_A, _IVFX_C
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_KNN_K = 3
KNN_NLIST = 16
# Hard per-block cap: pair work ≤ N·(cap−1). 64 keeps the sf fixtures'
# cells mostly un-split (500 vectors / 16 cells ≈ 31) while any larger
# corpus splits deterministically instead of going quadratic.
KNN_BLOCK_CAP = 64
# Adaptive-nlist ceiling for the production entry point: past this the
# centroid panel stops being a cheap broadcast and the N·nlist·dim
# assignment stage dominates — at that corpus size a FLAT coarse
# quantizer is the wrong tool (hierarchical/two-level IVF or
# NN-descent takes over); the clamp makes the flat path degrade into
# documented overflow flags instead of runaway assignment cost.
KNN_NLIST_MAX = 4096


def _unit_nv(e: DataFrame) -> DataFrame:
    """(vec_id, nv) unit-normalized view of a ``(vec_id, v0)`` frame —
    the shared normalize-ONCE idiom (element ÷ sqrt(self-dot), the
    graph2._EDGE_CTE IEEE-order contract). Factored for the round-12
    single-corpus-pass re-shapes: multi-view consumers (descent, the
    recall audits, the refined ladder) localCheckpoint this frame once
    instead of re-deriving it — and re-scanning the corpus — per plan
    branch."""
    norm = F.sqrt(_dot(F.col("v0"), F.col("v0")))
    return e.select("vec_id", F.transform("v0", lambda x: x / norm).alias("nv"))


def _default_knn_nlist(n: int) -> int:
    """Adaptive cell count for the production path: ⌈√N⌉ clamped to
    [KNN_NLIST, KNN_NLIST_MAX] — the flat-IVF sweet spot, giving
    O(N·√N·dim) assignment + O(N·cap) pair work. NOTE the deliberate
    divergence from semdedup's ⌈N/(cap/2)⌉ term: semdedup's cap is a
    degenerate-cluster GUARD it must stay under, so nlist chases the
    cap; here the cap IS the block size and the sub-split enforces it
    unconditionally, so nlist only tunes how often cells split
    (overflow rate) — pushing nlist linear in N to avoid splits would
    make the assignment stage quadratic, a worse trade than a flagged
    split. Mean cell size is √N: above N ≈ cap² (~4k vectors at
    cap = 64) splits are EXPECTED and flagged — the documented recall
    knob of a flat quantizer at scale."""
    return max(KNN_NLIST, min(KNN_NLIST_MAX, ceil_sqrt(n)))


_KNN_ORACLE = f"""
    WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    en AS MATERIALIZED (
        SELECT vec_id,
               list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv,
               list_transform(v, x -> CAST(floor(x * 1000) AS BIGINT)) AS xq
        FROM e0),
    norms AS (
        SELECT vec_id, nv, xq,
               CAST(list_dot_product(
                   list_transform(xq, x -> CAST(x AS DOUBLE)),
                   list_transform(xq, x -> CAST(x AS DOUBLE))) AS BIGINT) AS na
        FROM en),
    centg AS (
        SELECT CAST(j.range AS BIGINT) AS j, CAST(d.range AS BIGINT) AS d,
               ((j.range * {_IVFX_A} + d.range * {_IVFX_C}) % 2001) - 1000 AS c
        FROM range({KNN_NLIST}) j, range(64) d),
    cent AS MATERIALIZED (
        SELECT j, list(c ORDER BY d) AS carr,
               CAST(SUM(c * c) AS BIGINT) AS nc
        FROM centg GROUP BY j),
    dist AS (
        SELECT n.vec_id, n.nv, c.j,
               row_number() OVER (
                   PARTITION BY n.vec_id ORDER BY
                   n.na + c.nc - 2 * CAST(list_dot_product(
                       list_transform(n.xq, x -> CAST(x AS DOUBLE)),
                       list_transform(c.carr, x -> CAST(x AS DOUBLE))) AS BIGINT),
                   c.j) AS rn
        FROM norms n, cent c),
    assign AS MATERIALIZED (SELECT vec_id, nv, j FROM dist WHERE rn = 1),
    blocks AS MATERIALIZED (
        SELECT vec_id, nv, j, cnt,
               CASE WHEN cnt >= 2
                    THEN least((rn - 1) // {KNN_BLOCK_CAP},
                               (cnt - 2) // {KNN_BLOCK_CAP})
                    ELSE 0 END AS blk,
               CASE WHEN cnt > {KNN_BLOCK_CAP} THEN 1 ELSE 0 END AS overflow
        FROM (SELECT vec_id, nv, j,
                     row_number() OVER (PARTITION BY j ORDER BY vec_id) AS rn,
                     count(*) OVER (PARTITION BY j) AS cnt
              FROM assign)),
    pairs AS (
        SELECT a.vec_id AS i, b.vec_id AS nj, a.j AS cell, a.overflow,
               list_dot_product(a.nv, b.nv) AS sim
        FROM blocks a JOIN blocks b
          ON a.j = b.j AND a.blk = b.blk AND a.vec_id <> b.vec_id),
    ranked AS (
        SELECT i, nj, cell, overflow, sim,
               row_number() OVER (PARTITION BY i ORDER BY sim DESC, nj) AS rnk
        FROM pairs),
    singles AS (
        SELECT vec_id, CAST(0 AS BIGINT) AS rank,
               CAST(NULL AS BIGINT) AS neighbor_id,
               CAST(j AS BIGINT) AS cell, CAST(overflow AS BIGINT) AS overflow,
               CAST(NULL AS DOUBLE) AS cos_sim
        FROM blocks WHERE cnt = 1)
    SELECT i AS vec_id, CAST(rnk AS BIGINT) AS rank, nj AS neighbor_id,
           CAST(cell AS BIGINT) AS cell, CAST(overflow AS BIGINT) AS overflow,
           CAST(round(sim, 4) AS DOUBLE) AS cos_sim
    FROM ranked WHERE rnk <= {_KNN_K}
    UNION ALL SELECT * FROM singles
    ORDER BY vec_id, rank
"""

# The cell profile over the registered config, as a DuckDB oracle:
# the assignment/blocks chain + one grouped aggregate — validated by a
# local compare test now, ready for a round-9 registration.
_KNN_PROFILE_ORACLE = (
    _KNN_ORACLE.rsplit("    pairs AS (", 1)[0].rstrip().rstrip(",")
    + f"""
    SELECT j AS cell,
           CAST(count(*) AS BIGINT) AS cell_size,
           CAST(count(DISTINCT blk) AS BIGINT) AS n_blocks,
           CAST(max(overflow) AS BIGINT) AS overflow
    FROM blocks GROUP BY j ORDER BY j
"""
)

# One NN-descent round over the registered graph, as a DuckDB oracle:
# the _KNN_ORACLE chain through `ranked` (the capped-block top-k), then
# forward edges → md5-capped reverse sample → neighbors-of-neighbors →
# dedup → rerank. Every step is deterministic (total orders, the
# portable md5 reverse key), so the descent MACHINERY is cross-engine
# checkable — the oracle behind the registered sim_knn_descent_round.
_KNN_DESCENT_ORACLE = (
    _KNN_ORACLE.rsplit("SELECT i AS vec_id", 1)[0]
    + f""",
    knn AS MATERIALIZED (SELECT i, nj AS j FROM ranked WHERE rnk <= {_KNN_K}),
    fwd AS (SELECT DISTINCT i, j FROM knn),
    rev0 AS (SELECT j AS i, i AS j FROM fwd),
    revc AS (
        SELECT i, j FROM (
            SELECT i, j,
                   row_number() OVER (
                       PARTITION BY i ORDER BY
                       CAST('0x' || substr(md5(CAST(j AS VARCHAR)), 1, 8)
                            AS BIGINT), j) AS rn
            FROM rev0)
        WHERE rn <= {_KNN_K}),
    dirs AS MATERIALIZED (
        SELECT i, j FROM fwd UNION ALL SELECT i, j FROM revc),
    nn2 AS (SELECT a.i AS i, b.j AS j
            FROM dirs a JOIN dirs b ON a.j = b.i),
    cand AS MATERIALIZED (
        SELECT DISTINCT i, j FROM (
            SELECT i, j FROM dirs UNION ALL SELECT i, j FROM nn2)
        WHERE i <> j),
    dscored AS (
        SELECT c.i, c.j, list_dot_product(na.nv, nb.nv) AS sim
        FROM cand c
        JOIN en na ON na.vec_id = c.i
        JOIN en nb ON nb.vec_id = c.j),
    dranked AS (
        SELECT i, j, sim,
               row_number() OVER (PARTITION BY i ORDER BY sim DESC, j) AS rnk
        FROM dscored)
    SELECT i AS vec_id, CAST(rnk AS BIGINT) AS rank, j AS neighbor_id,
           CAST(round(sim, 4) AS DOUBLE) AS cos_sim
    FROM dranked WHERE rnk <= {_KNN_K}
    ORDER BY vec_id, rank
"""
)

# The SECOND descent unroll: round 1's top-k becomes the next round's
# graph and the identical candidate machinery repeats — the BPE-unroll
# pattern (each registered round is one more deterministic CTE layer,
# so convergence of the iterative algorithm is driver-hashable round
# by round, not just asserted).
_KNN_DESCENT2_ORACLE = (
    _KNN_DESCENT_ORACLE.rsplit("SELECT i AS vec_id", 1)[0]
    + f""",
    knn2 AS MATERIALIZED (
        SELECT i, j FROM dranked WHERE rnk <= {_KNN_K}),
    fwd2 AS (SELECT DISTINCT i, j FROM knn2),
    rev02 AS (SELECT j AS i, i AS j FROM fwd2),
    revc2 AS (
        SELECT i, j FROM (
            SELECT i, j,
                   row_number() OVER (
                       PARTITION BY i ORDER BY
                       CAST('0x' || substr(md5(CAST(j AS VARCHAR)), 1, 8)
                            AS BIGINT), j) AS rn
            FROM rev02)
        WHERE rn <= {_KNN_K}),
    dirs2 AS MATERIALIZED (
        SELECT i, j FROM fwd2 UNION ALL SELECT i, j FROM revc2),
    nn22 AS (SELECT a.i AS i, b.j AS j
             FROM dirs2 a JOIN dirs2 b ON a.j = b.i),
    cand2 AS MATERIALIZED (
        SELECT DISTINCT i, j FROM (
            SELECT i, j FROM dirs2 UNION ALL SELECT i, j FROM nn22)
        WHERE i <> j),
    dscored2 AS (
        SELECT c.i, c.j, list_dot_product(na.nv, nb.nv) AS sim
        FROM cand2 c
        JOIN en na ON na.vec_id = c.i
        JOIN en nb ON nb.vec_id = c.j),
    dranked2 AS (
        SELECT i, j, sim,
               row_number() OVER (PARTITION BY i ORDER BY sim DESC, j) AS rnk
        FROM dscored2)
    SELECT i AS vec_id, CAST(rnk AS BIGINT) AS rank, j AS neighbor_id,
           CAST(round(sim, 4) AS DOUBLE) AS cos_sim
    FROM dranked2 WHERE rnk <= {_KNN_K}
    ORDER BY vec_id, rank
"""
)

# Audit sample budget: the md5 gate keeps ~this many query nodes at ANY
# corpus size (the dedup_lsh_recall_audit fixed-SIZE discipline) — the
# exact brute-force side is budget × N dots, linear in N with a fixed
# constant, never N².
KNN_AUDIT_BUDGET = 150

# recall@k audit of the two-view + one-descent-round ladder vs exact
# brute force, all in PINNED cross-engine form: lattice IVF base view
# (the registered sim_knn_graph), an md5-hash random view with the
# same sub-split fold (portable stand-in for production's xxhash64),
# one descent round over the edge union, exact top-k for an md5
# budget-gated node sample, ppm hit rates for base vs refined. The
# per-node recall of the refined graph is ≥ the base view's BY
# CONSTRUCTION (descent candidates ⊇ base edges, and any candidate
# out-ranking a true-top-k base edge is itself in the true top-k),
# so refined_recall_ppm ≥ base_recall_ppm is a theorem this audit's
# hash pins numerically.
_KNN_REFINED_AUDIT_ORACLE = (
    _KNN_ORACLE.rsplit("SELECT i AS vec_id", 1)[0]
    + f""",
    knnb AS MATERIALIZED (SELECT i, nj AS j FROM ranked WHERE rnk <= {_KNN_K}),
    nn AS (SELECT count(*) AS n FROM en),
    rbp AS (
        SELECT vec_id, nv,
               CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)
                    AS BIGINT)
                   % greatest((SELECT (n + {KNN_BLOCK_CAP} - 1)
                               // {KNN_BLOCK_CAP} FROM nn), 1) AS rb
        FROM en),
    rblk AS (
        SELECT vec_id, nv, rb,
               CASE WHEN cnt >= 2
                    THEN least((rn - 1) // {KNN_BLOCK_CAP},
                               (cnt - 2) // {KNN_BLOCK_CAP})
                    ELSE 0 END AS blk
        FROM (SELECT vec_id, nv, rb,
                     row_number() OVER (PARTITION BY rb ORDER BY vec_id) AS rn,
                     count(*) OVER (PARTITION BY rb) AS cnt
              FROM rbp)),
    rpairs AS (
        SELECT a.vec_id AS i, b.vec_id AS j,
               list_dot_product(a.nv, b.nv) AS sim
        FROM rblk a JOIN rblk b
          ON a.rb = b.rb AND a.blk = b.blk AND a.vec_id <> b.vec_id),
    rtopk AS (
        SELECT i, j FROM (
            SELECT i, j,
                   row_number() OVER (PARTITION BY i ORDER BY sim DESC, j) AS rn
            FROM rpairs)
        WHERE rn <= {_KNN_K}),
    fwd AS (SELECT DISTINCT i, j FROM (
        SELECT i, j FROM knnb UNION ALL SELECT i, j FROM rtopk)),
    rev0 AS (SELECT j AS i, i AS j FROM fwd),
    revc AS (
        SELECT i, j FROM (
            SELECT i, j,
                   row_number() OVER (
                       PARTITION BY i ORDER BY
                       CAST('0x' || substr(md5(CAST(j AS VARCHAR)), 1, 8)
                            AS BIGINT), j) AS rn
            FROM rev0)
        WHERE rn <= {_KNN_K}),
    dirs AS MATERIALIZED (
        SELECT i, j FROM fwd UNION ALL SELECT i, j FROM revc),
    nn2 AS (SELECT a.i AS i, b.j AS j
            FROM dirs a JOIN dirs b ON a.j = b.i),
    cand AS MATERIALIZED (
        SELECT DISTINCT i, j FROM (
            SELECT i, j FROM dirs UNION ALL SELECT i, j FROM nn2)
        WHERE i <> j),
    dscored AS (
        SELECT c.i, c.j, list_dot_product(na.nv, nb.nv) AS sim
        FROM cand c
        JOIN en na ON na.vec_id = c.i
        JOIN en nb ON nb.vec_id = c.j),
    refined AS MATERIALIZED (
        SELECT i, j FROM (
            SELECT i, j,
                   row_number() OVER (PARTITION BY i ORDER BY sim DESC, j) AS rnk
            FROM dscored)
        WHERE rnk <= {_KNN_K}),
    sq AS MATERIALIZED (
        SELECT vec_id, nv FROM en
        WHERE CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)
                   AS BIGINT)
              % greatest((SELECT n FROM nn) // {KNN_AUDIT_BUDGET}, 1) = 0),
    ex_topk AS MATERIALIZED (
        SELECT i, j FROM (
            SELECT s.vec_id AS i, c.vec_id AS j,
                   row_number() OVER (
                       PARTITION BY s.vec_id
                       ORDER BY list_dot_product(s.nv, c.nv) DESC, c.vec_id)
                       AS rn
            FROM sq s JOIN en c ON c.vec_id <> s.vec_id)
        WHERE rn <= {_KNN_K})
    SELECT CAST((SELECT count(*) FROM sq) AS BIGINT) AS n_sampled,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(b.j) AS BIGINT) AS base_hits,
           CAST(count(r.j) AS BIGINT) AS refined_hits,
           CAST(count(b.j) * 1000000 // count(*) AS BIGINT)
               AS base_recall_ppm,
           CAST(count(r.j) * 1000000 // count(*) AS BIGINT)
               AS refined_recall_ppm
    FROM ex_topk e
    LEFT JOIN knnb b ON b.i = e.i AND b.j = e.j
    LEFT JOIN refined r ON r.i = e.i AND r.j = e.j
"""
)


# Rounds=2 extension of the refined-recall audit (round 10, VERDICT
# r9 item 6b): one more descent layer over `refined`, scoring base vs
# round-1 vs round-2 recall in the SAME hashed row — the number that
# pins where the ladder PLATEAUS (SCALE.md part 8 measured the
# round-1 jump; this makes the convergence claim driver-hashable
# instead of script-asserted). Same unroll discipline as
# _KNN_DESCENT2_ORACLE: each round is one more deterministic CTE
# layer over the previous round's top-k.
_KNN_REFINED2_AUDIT_ORACLE = (
    _KNN_REFINED_AUDIT_ORACLE.rsplit("    sq AS MATERIALIZED", 1)[0]
    + f"""    fwdq AS (SELECT DISTINCT i, j FROM refined),
    revq0 AS (SELECT j AS i, i AS j FROM fwdq),
    revqc AS (
        SELECT i, j FROM (
            SELECT i, j,
                   row_number() OVER (
                       PARTITION BY i ORDER BY
                       CAST('0x' || substr(md5(CAST(j AS VARCHAR)), 1, 8)
                            AS BIGINT), j) AS rn
            FROM revq0)
        WHERE rn <= {_KNN_K}),
    dirsq AS MATERIALIZED (
        SELECT i, j FROM fwdq UNION ALL SELECT i, j FROM revqc),
    nn2q AS (SELECT a.i AS i, b.j AS j
             FROM dirsq a JOIN dirsq b ON a.j = b.i),
    candq AS MATERIALIZED (
        SELECT DISTINCT i, j FROM (
            SELECT i, j FROM dirsq UNION ALL SELECT i, j FROM nn2q)
        WHERE i <> j),
    dscoredq AS (
        SELECT c.i, c.j, list_dot_product(na.nv, nb.nv) AS sim
        FROM candq c
        JOIN en na ON na.vec_id = c.i
        JOIN en nb ON nb.vec_id = c.j),
    refined2 AS MATERIALIZED (
        SELECT i, j FROM (
            SELECT i, j,
                   row_number() OVER (PARTITION BY i ORDER BY sim DESC, j) AS rnk
            FROM dscoredq)
        WHERE rnk <= {_KNN_K}),
    sq AS MATERIALIZED (
        SELECT vec_id, nv FROM en
        WHERE CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)
                   AS BIGINT)
              % greatest((SELECT n FROM nn) // {KNN_AUDIT_BUDGET}, 1) = 0),
    ex_topk AS MATERIALIZED (
        SELECT i, j FROM (
            SELECT s.vec_id AS i, c.vec_id AS j,
                   row_number() OVER (
                       PARTITION BY s.vec_id
                       ORDER BY list_dot_product(s.nv, c.nv) DESC, c.vec_id)
                       AS rn
            FROM sq s JOIN en c ON c.vec_id <> s.vec_id)
        WHERE rn <= {_KNN_K})
    SELECT CAST((SELECT count(*) FROM sq) AS BIGINT) AS n_sampled,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(b.j) AS BIGINT) AS base_hits,
           CAST(count(r.j) AS BIGINT) AS r1_hits,
           CAST(count(r2.j) AS BIGINT) AS r2_hits,
           CAST(count(b.j) * 1000000 // count(*) AS BIGINT)
               AS base_recall_ppm,
           CAST(count(r.j) * 1000000 // count(*) AS BIGINT)
               AS r1_recall_ppm,
           CAST(count(r2.j) * 1000000 // count(*) AS BIGINT)
               AS r2_recall_ppm
    FROM ex_topk e
    LEFT JOIN knnb b ON b.i = e.i AND b.j = e.j
    LEFT JOIN refined r ON r.i = e.i AND r.j = e.j
    LEFT JOIN refined2 r2 ON r2.i = e.i AND r2.j = e.j
"""
)


def knn_graph(e: DataFrame, k: int = _KNN_K) -> DataFrame:
    """Label-blocked top-k neighbor lists over a ``(vec_id, label,
    v0)`` frame (v0 = raw double vector) — the SMALL-FIXTURE ORACLE
    path: blocks come from a trusted external key, so the
    planted-geometry numpy cross-check pins the shared
    normalize/pair/rank machinery without the IVF assignment in the
    loop. NOT the registered production path (label blocks are
    unbounded — the measured r7 scale-killer); production is
    ``knn_graph_blocked``."""
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


def knn_graph_blocked(
    spark: SparkSession,
    e: DataFrame,
    k: int = _KNN_K,
    nlist: int = KNN_NLIST,
    cap: int = KNN_BLOCK_CAP,
    sampled_centroids: bool = False,
) -> DataFrame:
    """Capped-IVF-block top-k neighbor lists over a ``(vec_id, v0)``
    frame — the PRODUCTION path: integer-lattice coarse quantizer
    (shared with sim_ann_ivf_exact), deterministic sub-split of cells
    above ``cap`` with the remainder-singleton fold, all-pairs + rank
    inside each bounded block. Pair work ≤ N·cap (post-fold block
    size ≤ cap+1); the ``overflow`` column flags nodes whose cell was
    split (production keeps it rare by growing nlist ~ √N). Every
    input vector appears in the output: singleton-CELL vectors emit a
    rank-0 sentinel row (NULL neighbor/sim) instead of vanishing.

    The N·k-row result is materialized eagerly and the corpus-sized
    blocks cache released (the text11/audit unpersist-after-checkpoint
    pattern — repeated builder calls in one session would otherwise
    each leak a persisted assignment frame)."""
    lazy, blocks = _knn_blocked_lazy(spark, e, k, nlist, cap, sampled_centroids)
    try:
        out = lazy.localCheckpoint(eager=True)
    finally:
        # release even when the checkpoint job fails mid-flight — a
        # retrying session would otherwise accumulate leaked caches
        blocks.unpersist(blocking=False)
    return out


def _knn_blocked_lazy(
    spark: SparkSession,
    e: DataFrame,
    k: int = _KNN_K,
    nlist: int = KNN_NLIST,
    cap: int = KNN_BLOCK_CAP,
    sampled_centroids: bool = False,
):
    """The un-checkpointed plan plus its persisted blocks frame —
    factored (the _bm25_lazy pattern) so plan-shape tests can inspect
    the REAL join/window plan; the public builder checkpoints, which
    collapses the executed plan to a scan."""
    from pyspark.sql import Window as W

    norm = F.sqrt(_dot(F.col("v0"), F.col("v0")))
    sq = F.aggregate(
        F.transform("xq", lambda x: x * x), F.lit(0).cast("long"), lambda a, x: a + x
    )
    base = e.select(
        "vec_id",
        F.transform("v0", lambda x: x / norm).alias("nv"),
        F.transform("v0", lambda x: F.floor(x * F.lit(1000)).cast("long")).alias("xq"),
    ).withColumn("na", sq)
    if sampled_centroids:
        # geometry-ADAPTIVE cells for the production/quality paths:
        # centroids are nlist actual (quantized) data points, chosen
        # by md5(vec_id) order — deterministic, content-addressed, one
        # bounded limit; cells then track the data distribution
        # instead of an arbitrary lattice. The REGISTERED query keeps
        # the closed-form lattice (sampled centroids need a LIMIT the
        # oracle can't share bit-for-bit through the same plan).
        cent = (
            base.select(
                "vec_id", "xq", F.md5(F.col("vec_id").cast("string")).alias("h")
            )
            .orderBy("h", "vec_id")
            .limit(nlist)
            .select(
                (F.row_number().over(W.orderBy("h", "vec_id")) - 1)
                .cast("long")
                .alias("j"),
                F.col("xq").alias("carr"),
            )
        )
    else:
        jcol = F.col("j")
        cent = spark.range(nlist).select(
            F.col("id").cast("long").alias("j"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda d: (
                    (jcol * _IVFX_A + d.cast("long") * _IVFX_C) % 2001 - 1000
                ).cast("long"),
            ).alias("carr"),
        )
    cent = cent.withColumn(
        "nc",
        F.aggregate(
            F.transform("carr", lambda c: c * c),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    )
    dot_xc = F.aggregate(
        F.zip_with("xq", "carr", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    rn_assign = F.row_number().over(
        W.partitionBy("vec_id").orderBy(F.col("dist").asc(), F.col("j").asc())
    )
    assign = (
        base.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "nv",
            "j",
            (F.col("na") + F.col("nc") - F.lit(2) * dot_xc).alias("dist"),
        )
        .withColumn("rn", rn_assign)
        .where(F.col("rn") == 1)
        .select("vec_id", "nv", "j")
    )
    blocks = assign.select(
        "vec_id",
        "nv",
        "j",
        F.row_number().over(W.partitionBy("j").orderBy("vec_id")).alias("rn"),
        F.count("*").over(W.partitionBy("j")).alias("cnt"),
    ).select(
        "vec_id",
        "nv",
        "j",
        "cnt",
        # remainder-singleton FOLD: min((rn-1) div cap, (cnt-2) div cap)
        # merges a trailing 1-member sub-block into its predecessor so
        # no vector silently loses its neighbor list (module docstring
        # step 2); singleton CELLS (cnt = 1) keep blk 0 and are emitted
        # as rank-0 sentinel rows downstream.
        F.when(
            F.col("cnt") >= 2,
            F.least(
                F.expr(f"div(rn - 1, {cap})"), F.expr(f"div(cnt - 2, {cap})")
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("blk"),
        (F.col("cnt") > cap).cast("long").alias("overflow"),
    )
    # both sides of the pair join read this frame — persist and
    # materialize the cache BEFORE the join job so the assignment
    # (corpus × nlist dots) computes once, not racily twice; the
    # public builder unpersists after checkpointing its output
    blocks = blocks.persist()
    blocks.count()
    a = blocks.select(
        F.col("vec_id").alias("i"), F.col("nv").alias("nva"), "j", "blk", "overflow"
    )
    b = blocks.select(F.col("vec_id").alias("nj"), F.col("nv").alias("nvb"), "j", "blk")
    pairs = (
        a.join(b, ["j", "blk"])
        .where(F.col("i") != F.col("nj"))
        .select(
            "i", "nj", F.col("j").alias("cell"), "overflow",
            _dot(F.col("nva"), F.col("nvb")).alias("sim"),
        )
    )
    w = W.partitionBy("i").orderBy(F.col("sim").desc(), F.col("nj"))
    topk = (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("i").alias("vec_id"),
            F.col("rnk").cast("long").alias("rank"),
            F.col("nj").alias("neighbor_id"),
            F.col("cell").cast("long").alias("cell"),
            "overflow",
            F.round("sim", 4).cast("double").alias("cos_sim"),
        )
    )
    # singleton-cell sentinels: rank 0, NULL neighbor — the vector is
    # isolated at quantizer resolution but still PRESENT in the graph
    singles = blocks.where(F.col("cnt") == 1).select(
        "vec_id",
        F.lit(0).cast("long").alias("rank"),
        F.lit(None).cast("long").alias("neighbor_id"),
        F.col("j").cast("long").alias("cell"),
        "overflow",
        F.lit(None).cast("double").alias("cos_sim"),
    )
    out = topk.unionByName(singles).orderBy("vec_id", "rank")
    return out, blocks


def knn_cell_profile(
    spark: SparkSession,
    e: DataFrame,
    nlist: int = KNN_NLIST,
    cap: int = KNN_BLOCK_CAP,
    sampled_centroids: bool = False,
) -> DataFrame:
    """Per-cell population histogram — the operational check for cell
    skew (the ``lsh_bucket_profile`` counterpart): one row per cell
    with its size, sub-block count, and overflow flag. Run before
    trusting a (nlist, cap) config at a new scale: pair work is
    Σ_cell (sub-blocks × ≤ cap²) and the overflow fraction is the
    recall-loss signal that says grow nlist (SCALE.md part-8 cap
    sweep: 94% overflow at cap 32 halved recall; ≤ 3% at the tuned
    config). Bounded output (≤ nlist rows), blocks cache released."""
    _, blocks = _knn_blocked_lazy(spark, e, _KNN_K, nlist, cap, sampled_centroids)
    try:
        out = (
            blocks.groupBy(F.col("j").alias("cell"))
            .agg(
                F.count("*").alias("cell_size"),
                F.countDistinct("blk").alias("n_blocks"),
                F.max("overflow").alias("overflow"),
            )
            .orderBy("cell")
            .localCheckpoint(eager=True)
        )
    finally:
        blocks.unpersist(blocking=False)
    return out


def knn_descent_round(
    e: DataFrame, edges: DataFrame, k: int = _KNN_K, nv: DataFrame | None = None
) -> DataFrame:
    """One NN-descent refinement round — the cross-block quality
    repair the capped-block builder defers (blocks bound pair WORK;
    descent recovers neighbors a block boundary hid). Candidates per
    node are its current neighbors, its REVERSE neighbors, and its
    neighbors' neighbors — O(k²) per node, so the round is O(N·k²)
    with three equi-joins and one top-k window: bounded,
    shuffle-on-key, nothing quadratic (Dong/Moses/Li NN-descent, the
    standard k-NN-graph refinement loop, one unrolled step).

    Inputs: ``e`` = (vec_id, v0 raw double vector), ``edges`` =
    (vec_id|i, neighbor_id|j)-shaped current graph (any extra columns
    ignored). Output matches knn_graph_blocked's core columns
    (vec_id, rank, neighbor_id, cos_sim). MONOTONE by construction:
    the candidate set contains the current neighbors, so no node's
    rank-r similarity can decrease — pinned by test, with measured
    recall-vs-exact improvement on the fixture.

    Bound accounting: edges are DEDUPED first (a multi-view caller
    like knn_graph_refined feeds overlapping edge sets; duplicate
    (i, j) rows would otherwise crowd distinct reverse neighbors out
    of the cap slots), then reverse edges are CAPPED at k per node
    (Dong et al.'s reverse SAMPLE — a hub listed by many nodes would
    otherwise put an unbounded row count on the nn2 self-join's probe
    side and make the round hub-quadratic); the sample key is the
    PORTABLE md5 hash of the neighbor id (the house cross-engine
    idiom — xxhash64 would be faster but exists only in Spark, and
    the whole round is deterministic/SQL-expressible with md5, which
    is what lets the descent machinery carry its own DuckDB oracle),
    deterministic but unbiased (ordering by raw id would
    systematically starve high-id nodes of reverse slots).
    With f = the caller's max forward edges per node (k for a plain
    graph, 2k for knn_graph_refined's two-view union), each node
    holds ≤ f + k direction-union rows, candidates are
    ≤ (f+k)² + f + k per node, and the nn2 join output is globally
    ≤ N·(f+k)² regardless of degree skew.

    ``nv``: optional pre-normalized (vec_id, nv) frame — a caller
    holding a checkpointed unit view (the audits, the refined ladder)
    passes it so the corpus is not re-scanned/re-normalized here;
    default derives it from ``e`` (round-12 single-pass re-shape)."""
    from pyspark.sql import Window as W

    if nv is None:
        nv = _unit_nv(e)
    cols = edges.columns
    fwd = (
        edges.select(
            F.col(cols[0] if "vec_id" not in cols else "vec_id").alias("i"),
            F.col(cols[1] if "neighbor_id" not in cols else "neighbor_id").alias("j"),
        )
        # drop rank-0 singleton-cell sentinels (NULL neighbor): they
        # mark isolated nodes, not edges — descent re-ranks whatever
        # candidates the joins produce for them
        .where(F.col("j").isNotNull())
        .distinct()
    )
    rev = fwd.select(F.col("j").alias("i"), F.col("i").alias("j"))
    rev_key = F.conv(F.substring(F.md5(F.col("j").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    w_rev = W.partitionBy("i").orderBy(rev_key, "j")
    rev = (
        rev.withColumn("rn", F.row_number().over(w_rev))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
    # materialize the direction union ONCE: ``both`` feeds the nn2
    # self-join (both sides) and the candidate union — three live
    # references whose common subtree is the caller's ENTIRE edge
    # plan (for the refined ladder: the two-view union incl. its
    # windows and pair joins). Without this the plan re-expands that
    # subtree per reference (measured 5× embeddings re-scans per
    # round; round-12 live-scan audit). ≤ 2·N·k id-pair rows — the
    # same linear-state trade as knn_graph_blocked's checkpoint.
    both = fwd.union(rev).localCheckpoint(eager=True)
    nn2 = (
        both.alias("a")
        .join(both.alias("b"), F.col("a.j") == F.col("b.i"))
        .select(F.col("a.i").alias("i"), F.col("b.j").alias("j"))
    )
    cand = (
        both.union(nn2).where(F.col("i") != F.col("j")).distinct()
    )
    scored = (
        cand.join(nv.select(F.col("vec_id").alias("i"), F.col("nv").alias("nva")), "i")
        .join(nv.select(F.col("vec_id").alias("j"), F.col("nv").alias("nvb")), "j")
        .select("i", "j", _dot(F.col("nva"), F.col("nvb")).alias("sim"))
    )
    w = W.partitionBy("i").orderBy(F.col("sim").desc(), F.col("j"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("i").alias("vec_id"),
            F.col("rnk").cast("long").alias("rank"),
            F.col("j").alias("neighbor_id"),
            F.round("sim", 4).cast("double").alias("cos_sim"),
        )
        .orderBy("vec_id", "rank")
    )


def knn_graph_auto(
    spark: SparkSession, e: DataFrame, k: int = _KNN_K, n: int | None = None
) -> DataFrame:
    """Production entry point: capped-IVF k-NN graph with the
    ADAPTIVE √N cell count (one bounded count() to size the lattice —
    the semdedup adaptive-nlist discipline; pass ``n`` if the caller
    already counted). The REGISTERED query pins the machinery at
    fixed nlist = 16 for oracle hashability; callers building a real
    graph should come through here so cell count tracks the corpus,
    cells track the data (sampled centroids), and ``overflow`` stays
    informative."""
    n = e.count() if n is None else n
    return knn_graph_blocked(
        spark, e, k=k, nlist=_default_knn_nlist(n), sampled_centroids=True
    )


def knn_graph_refined(
    spark: SparkSession, e: DataFrame, k: int = _KNN_K, rounds: int = 1
) -> DataFrame:
    """Quality entry point: two-view bootstrap + NN-descent rounds.

    A block-partitioned k-NN graph is BLOCK-CLOSED — every neighbor,
    reverse neighbor, and neighbor-of-neighbor lives in the same
    block, so descent over the IVF view alone can never cross a cell
    boundary (measured: zero recall gain — the reason this function
    exists). The fix is the NN-descent random init, expressed as a
    SECOND view: a content-independent hash blocking (pmod(xxhash64),
    blocks sized to the same cap) whose top-k edges are random-ish
    bridges across IVF cells. Union the two edge sets and each
    descent round can hop geometry → bridge → geometry, converging
    toward the true graph (Dong et al.'s loop; rounds=1 is usually
    the big step).

    Cost: the random view is the same bounded machinery — the hash
    blocks get the SAME row_number sub-split + remainder fold the IVF
    cells get (ADVICE r8: hash-block sizes are cap only in
    expectation; the sub-split makes the ≤ N·cap pair-work bound HARD
    here too, not just expected), one shuffle on the hash key; each
    round is O(N·k²) equi-joins. Still nothing quadratic, still no
    corpus cross join. MONOTONE vs the IVF view by construction
    (candidates ⊇ its edges); recall improvement is pinned by test on
    the fixture."""
    from pyspark.sql import Window as W

    if rounds < 1:
        raise ValueError(
            "rounds must be >= 1 (the un-refined base view IS "
            "knn_graph_auto — call that for a rounds=0 ablation)"
        )
    n = e.count()
    # the base view IS knn_graph_auto's graph — ONE construction site,
    # so a tuning change there cannot silently diverge from the view
    # this function refines (n passed through to avoid a re-count)
    base = knn_graph_auto(spark, e, k=k, n=n)
    # one normalized corpus pass, checkpointed: the random view's two
    # join sides and every descent round read this frame (round-12
    # single-corpus-pass re-shape — was one re-scan per reference)
    nv = _unit_nv(e).localCheckpoint(eager=True)
    nblocks = max(1, -(-n // KNN_BLOCK_CAP))
    rb = nv.withColumn("rb", F.pmod(F.xxhash64("vec_id"), F.lit(nblocks)))
    rb = rb.select(
        "vec_id",
        "nv",
        "rb",
        F.row_number().over(W.partitionBy("rb").orderBy("vec_id")).alias("rn"),
        F.count("*").over(W.partitionBy("rb")).alias("cnt"),
    ).select(
        "vec_id",
        "nv",
        "rb",
        F.when(
            F.col("cnt") >= 2,
            F.least(
                F.expr(f"div(rn - 1, {KNN_BLOCK_CAP})"),
                F.expr(f"div(cnt - 2, {KNN_BLOCK_CAP})"),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rblk"),
    )
    a = rb.select(F.col("vec_id").alias("i"), F.col("nv").alias("nva"), "rb", "rblk")
    b = rb.select(F.col("vec_id").alias("j"), F.col("nv").alias("nvb"), "rb", "rblk")
    rand_pairs = (
        a.join(b, ["rb", "rblk"])
        .where(F.col("i") != F.col("j"))
        .select("i", "j", _dot(F.col("nva"), F.col("nvb")).alias("sim"))
    )
    w = W.partitionBy("i").orderBy(F.col("sim").desc(), F.col("j"))
    rand_topk = (
        rand_pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("i", "j")
    )
    edges = base.select(
        F.col("vec_id").alias("i"), F.col("neighbor_id").alias("j")
    ).union(rand_topk)
    out = knn_descent_round(e, edges, k=k, nv=nv)
    for _ in range(rounds - 1):
        out = knn_descent_round(
            e,
            out.select(F.col("vec_id").alias("i"), F.col("neighbor_id").alias("j")),
            k=k,
            nv=nv,
        )
    return out


@query("sim_knn_graph", oracle=_KNN_ORACLE, tags=("llm", "similarity", "graph"))
def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk k-NN graph (k=3, cosine, capped IVF-cell blocks): every
    vector's ranked neighbor list — the all-points companion to
    sim_cosine_topk and the bootstrap input for graph-based ANN.
    Blocks are the integer-lattice IVF cells hard-capped at
    KNN_BLOCK_CAP by deterministic sub-split with the
    remainder-singleton fold; ``overflow`` flags nodes whose cell was
    split, and singleton-cell vectors emit a rank-0 sentinel row so
    EVERY vector is present. Pair work ≤ N·cap — linear in N."""
    e = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", _dvec("embedding").alias("v0")
    )
    return knn_graph_blocked(spark, e)


def _emb_v0(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", _dvec("embedding").alias("v0")
    )


@query(
    "sim_knn_cell_profile",
    oracle=_KNN_PROFILE_ORACLE,
    tags=("llm", "similarity", "audit"),
)
def sim_knn_cell_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell population histogram of the registered k-NN graph's
    IVF blocking (size, sub-block count post-fold, overflow flag) —
    the operational skew check to run before trusting a (nlist, cap)
    config at a new scale. Bounded output: ≤ nlist rows."""
    return knn_cell_profile(spark, _emb_v0(spark, sf_dir))


@query(
    "sim_knn_descent_round",
    oracle=_KNN_DESCENT_ORACLE,
    tags=("llm", "similarity", "graph"),
)
def sim_knn_descent_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One NN-descent refinement round over the registered capped-IVF
    k-NN graph (Dong et al.'s loop, one deterministic unroll): forward
    edges + md5-capped reverse sample + neighbors-of-neighbors,
    re-ranked. O(N·k²) equi-join work — the cross-block quality repair
    the capped blocks defer."""
    e = _emb_v0(spark, sf_dir)
    base = knn_graph_blocked(spark, e).select(
        F.col("vec_id").alias("i"), F.col("neighbor_id").alias("j")
    )
    nv = _unit_nv(e).localCheckpoint(eager=True)
    return knn_descent_round(e, base, nv=nv)


@query(
    "sim_knn_descent_round2",
    oracle=_KNN_DESCENT2_ORACLE,
    tags=("llm", "similarity", "graph"),
)
def sim_knn_descent_round2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SECOND NN-descent unroll: round 1's top-k is the input
    graph for an identical round — pinning that the iterative loop's
    per-round machinery composes (the BPE-unroll registration
    pattern). Each round stays O(N·k²)."""
    e = _emb_v0(spark, sf_dir)
    base = knn_graph_blocked(spark, e).select(
        F.col("vec_id").alias("i"), F.col("neighbor_id").alias("j")
    )
    nv = _unit_nv(e).localCheckpoint(eager=True)
    r1 = knn_descent_round(e, base, nv=nv)
    return knn_descent_round(
        e,
        r1.select(F.col("vec_id").alias("i"), F.col("neighbor_id").alias("j")),
        nv=nv,
    )


@query("sim_knn_graph_auto", tags=("llm", "similarity", "graph"))
def sim_knn_graph_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION k-NN graph entry point: √N-adaptive nlist +
    md5-sampled DATA-POINT centroids (cells track the distribution
    instead of the fixed lattice). Rows-only BY CONSTRUCTION: the
    centroid sample needs a LIMIT whose row choice DuckDB cannot
    share bit-for-bit through the same plan (documented at
    knn_graph_blocked), so no SQL oracle exists — its exact twin is
    the registered ``sim_knn_graph`` (identical block/sub-split/rank
    machinery on the closed-form lattice, hash-green), plus the numpy
    replication and the auto == explicit-nlist equality test
    (test_knn_adaptive_nlist_and_auto_path)."""
    return knn_graph_auto(spark, _emb_v0(spark, sf_dir))


@query("sim_knn_graph_refined", tags=("llm", "similarity", "graph"))
def sim_knn_graph_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY k-NN graph entry point: the two-view bootstrap
    (adaptive IVF + xxhash64 random view, both hard-capped) + one
    NN-descent round. Rows-only BY CONSTRUCTION: the production path
    composes the sampled-centroid base (no bit-sharable SQL plan, see
    sim_knn_graph_auto) with Spark-only xxhash64 blocking — its
    hash-green counterpart is ``sim_knn_refined_recall_audit``, the
    SAME ladder on portable primitives (lattice base + md5 random
    view + identical descent machinery), plus the monotonicity +
    recall-improvement tests
    (test_knn_refined_is_monotone_and_improves_recall)."""
    return knn_graph_refined(spark, _emb_v0(spark, sf_dir))


@query(
    "sim_knn_refined_recall_audit",
    oracle=_KNN_REFINED_AUDIT_ORACLE,
    tags=("llm", "similarity", "graph", "audit"),
)
def sim_knn_refined_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of the two-view + one-descent-round k-NN ladder vs
    exact brute force, as ONE integer row — (n_sampled, n_exact,
    base_hits, refined_hits, base_recall_ppm, refined_recall_ppm).
    The quality claim of the knn_graph_refined ladder (SCALE.md
    part 8: recall roughly doubles over the blocked base) becomes
    driver-HASHABLE here: the audited variant swaps production's
    xxhash64 random view for the portable md5 hash (same sub-split
    fold, same cap) so every stage is cross-engine deterministic.
    refined_recall_ppm ≥ base_recall_ppm by construction — descent
    candidates contain the base edges, and any candidate that
    out-ranks a true-top-k edge is itself in the true top-k.

    100 TB shape: the exact side is budget-gated (md5 modulus keeps
    ~KNN_AUDIT_BUDGET query nodes at any N, the
    dedup_lsh_recall_audit discipline) × one corpus scan against the
    broadcast sample — linear in N; the two views and the descent
    round are the production ladder's own bounded plans."""
    from pyspark.sql import Window as W

    e = _emb_v0(spark, sf_dir)
    n = e.count()
    base = knn_graph_blocked(spark, e)
    bedges = base.where(F.col("neighbor_id").isNotNull()).select(
        F.col("vec_id").alias("i"), F.col("neighbor_id").alias("j")
    )
    # one normalized corpus pass, checkpointed: the random view's two
    # join sides, the exact side's corpus scan, the query sample and
    # the descent round all read this frame (round-12 re-shape — the
    # live-scan audit counted 16 embeddings re-scans in this plan)
    nv = _unit_nv(e).localCheckpoint(eager=True)
    md5i = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    nblocks = max(1, -(-n // KNN_BLOCK_CAP))
    rb = nv.select("vec_id", "nv", (md5i % F.lit(nblocks)).alias("rb"))
    rb = rb.select(
        "vec_id",
        "nv",
        "rb",
        F.row_number().over(W.partitionBy("rb").orderBy("vec_id")).alias("rn"),
        F.count("*").over(W.partitionBy("rb")).alias("cnt"),
    ).select(
        "vec_id",
        "nv",
        "rb",
        F.when(
            F.col("cnt") >= 2,
            F.least(
                F.expr(f"div(rn - 1, {KNN_BLOCK_CAP})"),
                F.expr(f"div(cnt - 2, {KNN_BLOCK_CAP})"),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rblk"),
    )
    a = rb.select(F.col("vec_id").alias("i"), F.col("nv").alias("nva"), "rb", "rblk")
    b = rb.select(F.col("vec_id").alias("j"), F.col("nv").alias("nvb"), "rb", "rblk")
    w = W.partitionBy("i").orderBy(F.col("sim").desc(), F.col("j"))
    rtopk = (
        a.join(b, ["rb", "rblk"])
        .where(F.col("i") != F.col("j"))
        .select("i", "j", _dot(F.col("nva"), F.col("nvb")).alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _KNN_K)
        .select("i", "j")
    )
    refined = knn_descent_round(e, bedges.union(rtopk), nv=nv).select(
        F.col("vec_id").alias("i"), F.col("neighbor_id").alias("j")
    )
    m = max(n // KNN_AUDIT_BUDGET, 1)
    sq = nv.where(md5i % F.lit(m) == 0).select(
        F.col("vec_id").alias("qi"), F.col("nv").alias("qnv")
    )
    n_sampled = sq.count()  # bounded: ~KNN_AUDIT_BUDGET rows
    ex_topk = (
        nv.crossJoin(F.broadcast(sq))
        .where(F.col("vec_id") != F.col("qi"))
        .select(
            F.col("qi").alias("i"),
            F.col("vec_id").alias("j"),
            _dot(F.col("qnv"), F.col("nv")).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _KNN_K)
        .select("i", "j")
    )
    return (
        ex_topk.join(bedges.withColumn("bhit", F.lit(1)), ["i", "j"], "left")
        .join(refined.withColumn("rhit", F.lit(1)), ["i", "j"], "left")
        .agg(
            F.lit(n_sampled).cast("long").alias("n_sampled"),
            F.count("*").cast("long").alias("n_exact"),
            F.count("bhit").cast("long").alias("base_hits"),
            F.count("rhit").cast("long").alias("refined_hits"),
        )
        .select(
            "n_sampled",
            "n_exact",
            "base_hits",
            "refined_hits",
            F.expr("CAST(base_hits * 1000000 div n_exact AS BIGINT)").alias(
                "base_recall_ppm"
            ),
            F.expr("CAST(refined_hits * 1000000 div n_exact AS BIGINT)").alias(
                "refined_recall_ppm"
            ),
        )
    )


@query(
    "sim_knn_refined2_recall_audit",
    oracle=_KNN_REFINED2_AUDIT_ORACLE,
    tags=("llm", "similarity", "graph", "audit"),
)
def sim_knn_refined2_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of the two-view ladder after ONE vs TWO NN-descent
    rounds vs exact brute force, as ONE integer row — the convergence
    pin for the iterative refinement (where does the ladder plateau?).
    Same portable primitives as ``sim_knn_refined_recall_audit``
    (lattice base + md5 random view + md5-capped descent), with the
    round-2 graph produced by feeding round 1's top-k back through
    the identical ``knn_descent_round`` — the unroll discipline of
    ``sim_knn_descent_round2``. r2 ≥ r1 ≥ base recall by the same
    containment theorem (each round's candidates include the previous
    round's edges).

    100 TB shape: one extra O(N·k²) equi-join round on top of the
    round-1 audit's bounded plan; the exact side stays budget-gated
    (md5 modulus, ~KNN_AUDIT_BUDGET nodes at any N)."""
    from pyspark.sql import Window as W

    e = _emb_v0(spark, sf_dir)
    n = e.count()
    base = knn_graph_blocked(spark, e)
    bedges = base.where(F.col("neighbor_id").isNotNull()).select(
        F.col("vec_id").alias("i"), F.col("neighbor_id").alias("j")
    )
    # one normalized corpus pass, checkpointed (see
    # sim_knn_refined_recall_audit — this plan re-scanned embeddings
    # 102× before the round-12 re-shape: every consumer × two descent
    # rounds re-expanded the whole upstream subtree)
    nv = _unit_nv(e).localCheckpoint(eager=True)
    md5i = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    nblocks = max(1, -(-n // KNN_BLOCK_CAP))
    rb = nv.select("vec_id", "nv", (md5i % F.lit(nblocks)).alias("rb"))
    rb = rb.select(
        "vec_id",
        "nv",
        "rb",
        F.row_number().over(W.partitionBy("rb").orderBy("vec_id")).alias("rn"),
        F.count("*").over(W.partitionBy("rb")).alias("cnt"),
    ).select(
        "vec_id",
        "nv",
        "rb",
        F.when(
            F.col("cnt") >= 2,
            F.least(
                F.expr(f"div(rn - 1, {KNN_BLOCK_CAP})"),
                F.expr(f"div(cnt - 2, {KNN_BLOCK_CAP})"),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rblk"),
    )
    a = rb.select(F.col("vec_id").alias("i"), F.col("nv").alias("nva"), "rb", "rblk")
    b = rb.select(F.col("vec_id").alias("j"), F.col("nv").alias("nvb"), "rb", "rblk")
    w = W.partitionBy("i").orderBy(F.col("sim").desc(), F.col("j"))
    rtopk = (
        a.join(b, ["rb", "rblk"])
        .where(F.col("i") != F.col("j"))
        .select("i", "j", _dot(F.col("nva"), F.col("nvb")).alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _KNN_K)
        .select("i", "j")
    )
    refined = knn_descent_round(e, bedges.union(rtopk), nv=nv).select(
        F.col("vec_id").alias("i"), F.col("neighbor_id").alias("j")
    )
    refined2 = knn_descent_round(e, refined, nv=nv).select(
        F.col("vec_id").alias("i"), F.col("neighbor_id").alias("j")
    )
    m = max(n // KNN_AUDIT_BUDGET, 1)
    sq = nv.where(md5i % F.lit(m) == 0).select(
        F.col("vec_id").alias("qi"), F.col("nv").alias("qnv")
    )
    n_sampled = sq.count()  # bounded: ~KNN_AUDIT_BUDGET rows
    ex_topk = (
        nv.crossJoin(F.broadcast(sq))
        .where(F.col("vec_id") != F.col("qi"))
        .select(
            F.col("qi").alias("i"),
            F.col("vec_id").alias("j"),
            _dot(F.col("qnv"), F.col("nv")).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _KNN_K)
        .select("i", "j")
    )
    return (
        ex_topk.join(bedges.withColumn("bhit", F.lit(1)), ["i", "j"], "left")
        .join(refined.withColumn("r1hit", F.lit(1)), ["i", "j"], "left")
        .join(refined2.withColumn("r2hit", F.lit(1)), ["i", "j"], "left")
        .agg(
            F.lit(n_sampled).cast("long").alias("n_sampled"),
            F.count("*").cast("long").alias("n_exact"),
            F.count("bhit").cast("long").alias("base_hits"),
            F.count("r1hit").cast("long").alias("r1_hits"),
            F.count("r2hit").cast("long").alias("r2_hits"),
        )
        .select(
            "n_sampled",
            "n_exact",
            "base_hits",
            "r1_hits",
            "r2_hits",
            F.expr("CAST(base_hits * 1000000 div n_exact AS BIGINT)").alias(
                "base_recall_ppm"
            ),
            F.expr("CAST(r1_hits * 1000000 div n_exact AS BIGINT)").alias(
                "r1_recall_ppm"
            ),
            F.expr("CAST(r2_hits * 1000000 div n_exact AS BIGINT)").alias(
                "r2_recall_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# k-NN label purity (round 10): the embedding-space QUALITY audit the
# k-NN ladder feeds. If the space is any good, a vector's nearest
# neighbors should overwhelmingly share its label; per-label purity
# (same-label edge fraction, exact ppm) is the number that says WHICH
# classes the encoder confuses — the confusion-matrix-shaped view of
# emb_centroid_cohesion's single cohesion scalar, computed over the
# REGISTERED capped-IVF graph (so the audit measures the graph a
# consumer actually gets, cap effects included).
#
# Scale: the graph is the bounded sim_knn_graph plan; the audit adds
# two broadcast-able label joins (labels are one narrow column) and
# one map-side-combinable rollup onto |labels| rows.
# ---------------------------------------------------------------------------

_KNN_PURITY_ORACLE = (
    _KNN_ORACLE.rsplit("SELECT i AS vec_id", 1)[0]
    + f""",
    knn AS (SELECT i, nj AS j FROM ranked WHERE rnk <= {_KNN_K}),
    lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings)
    SELECT la.label,
           CAST(count(*) AS BIGINT) AS n_edges,
           CAST(sum(CASE WHEN la.label = lb.label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_same,
           CAST(sum(CASE WHEN la.label = lb.label THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS purity_ppm
    FROM knn k
    JOIN lab la ON la.vec_id = k.i
    JOIN lab lb ON lb.vec_id = k.j
    GROUP BY la.label
    ORDER BY la.label
"""
)


@query(
    "sim_knn_label_purity",
    oracle=_KNN_PURITY_ORACLE,
    tags=("llm", "similarity", "graph", "audit"),
)
def sim_knn_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label k-NN purity over the registered capped-IVF graph:
    what fraction of each label's neighbor edges stay inside the
    label (exact ppm)? Low purity for a label = the encoder confuses
    it — the class-level embedding-quality audit behind SemDeDup and
    label-propagation consumers."""
    e = load_tables(spark, sf_dir)["embeddings"]
    knn = knn_graph_blocked(
        spark, e.select("vec_id", _dvec("embedding").alias("v0"))
    ).where(F.col("neighbor_id").isNotNull())
    lab = e.select("vec_id", F.col("label").cast("long").alias("label"))
    return (
        knn.select(F.col("vec_id").alias("i"), F.col("neighbor_id").alias("j"))
        .join(lab.select(F.col("vec_id").alias("i"), F.col("label").alias("la")), "i")
        .join(lab.select(F.col("vec_id").alias("j"), F.col("label").alias("lb")), "j")
        .groupBy(F.col("la").alias("label"))
        .agg(
            F.count("*").cast("long").alias("n_edges"),
            F.sum(F.when(F.col("la") == F.col("lb"), 1).otherwise(0))
            .cast("long")
            .alias("n_same"),
        )
        .select(
            "label",
            "n_edges",
            "n_same",
            F.expr("CAST(n_same * 1000000 div n_edges AS BIGINT)").alias(
                "purity_ppm"
            ),
        )
        .orderBy("label")
    )
