"""Similarity wave 4 (round 12): MMR-diversified retrieval — the
serving-side rerank the similarity family was missing.

Plain cosine top-k returns near-duplicates of each other (the corpus
is full of near-dups — that is why the dedup family exists); a RAG /
retrieval surface wants RELEVANT-BUT-DIVERSE results. Maximal
Marginal Relevance (Carbonell & Goldstein 1998) selects greedily:

    next = argmax_d  λ·sim(q, d) − (1−λ)·max_{s ∈ selected} sim(d, s)

``sim_mmr_rerank`` runs MMR with λ = 0.7 over each query's exact
cosine top-``MMR_POOL`` candidate pool (the sim_cosine_topk
machinery: Q_MAX-bounded broadcast query side, corpus streams), with
the greedy loop UNROLLED to MMR_K = 3 picks as pure DataFrame joins
— every post-pool frame is ≤ Q_MAX·MMR_POOL rows, so the unroll is a
chain of broadcast joins over driver-small frames, never a
driver-side loop over collected data. Pick 1 is the plain top-1
(no selected set yet — MMR degenerates to relevance); picks 2-3
penalize redundancy against the selected set via the pool's pairwise
cosine table (≤ MMR_POOL² rows per query, bounded by construction).

Determinism: every argmax ranks on (round(score, 6) DESC, nid) — the
sim_cosine_topk tiebreak convention — and both engines compute the
score with the identical operation order (0.7·sim − 0.3·max_pair).

Scale: the only corpus-sized stage is the Q·N scoring pass top-k
already pays (and that the ANN family replaces at scale: feed the
pool from sim_ann_* instead of brute force — the rerank is pool-size
work either way). Everything after the pool rank is bounded.

Reference parity note: the reference engine (`CephFsSource.java`) has
no similarity surface; this operator belongs to the declared [NS]
engine surface (SURVEY.md §2.2, similarity family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.similarity import (
    _QWHERE_SQL,
    _dvec,
    _query_filter,
    cosine,
)
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

MMR_POOL = 10
MMR_K = 3
MMR_LAMBDA = 0.7  # relevance weight; (1-λ) = 0.3 redundancy penalty

_COS_SQL = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)

_MMR_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE {_QWHERE_SQL}),
    scored AS (
        SELECT qid, e.vec_id AS nid,
               {_COS_SQL.format(a="qv", b="v")} AS sim
        FROM q JOIN e ON e.vec_id <> qid
    ),
    pool AS MATERIALIZED (
        SELECT qid, nid, sim FROM (
            SELECT qid, nid, sim,
                   row_number() OVER (PARTITION BY qid
                       ORDER BY round(sim, 6) DESC, nid) AS rn
            FROM scored) WHERE rn <= {MMR_POOL}
    ),
    pv AS (SELECT p.qid, p.nid, p.sim, e.v
           FROM pool p JOIN e ON e.vec_id = p.nid),
    pairs AS MATERIALIZED (
        SELECT a.qid, a.nid AS i, b.nid AS j,
               {_COS_SQL.format(a="a.v", b="b.v")} AS psim
        FROM pv a JOIN pv b ON a.qid = b.qid AND a.nid <> b.nid
    ),
    s1 AS (
        SELECT qid, nid, sim AS mmr FROM (
            SELECT qid, nid, sim,
                   row_number() OVER (PARTITION BY qid
                       ORDER BY round(sim, 6) DESC, nid) AS rn
            FROM pool) WHERE rn = 1
    ),
    c2 AS (
        SELECT p.qid, p.nid,
               {MMR_LAMBDA} * p.sim - {round(1 - MMR_LAMBDA, 10)} * pr.psim AS mmr
        FROM pool p
        JOIN s1 ON s1.qid = p.qid AND p.nid <> s1.nid
        JOIN pairs pr ON pr.qid = p.qid AND pr.i = p.nid AND pr.j = s1.nid
    ),
    s2 AS (
        SELECT qid, nid, mmr FROM (
            SELECT qid, nid, mmr,
                   row_number() OVER (PARTITION BY qid
                       ORDER BY round(mmr, 6) DESC, nid) AS rn
            FROM c2) WHERE rn = 1
    ),
    c3 AS (
        SELECT p.qid, p.nid,
               {MMR_LAMBDA} * p.sim
                 - {round(1 - MMR_LAMBDA, 10)} * greatest(p1.psim, p2.psim) AS mmr
        FROM pool p
        JOIN s1 ON s1.qid = p.qid
        JOIN s2 ON s2.qid = p.qid
        JOIN pairs p1 ON p1.qid = p.qid AND p1.i = p.nid AND p1.j = s1.nid
        JOIN pairs p2 ON p2.qid = p.qid AND p2.i = p.nid AND p2.j = s2.nid
        WHERE p.nid <> s1.nid AND p.nid <> s2.nid
    ),
    s3 AS (
        SELECT qid, nid, mmr FROM (
            SELECT qid, nid, mmr,
                   row_number() OVER (PARTITION BY qid
                       ORDER BY round(mmr, 6) DESC, nid) AS rn
            FROM c3) WHERE rn = 1
    )
    SELECT qid, CAST(pick AS BIGINT) AS pick, nid,
           CAST(round(mmr, 4) AS DOUBLE) AS mmr
    FROM (
        SELECT qid, 1 AS pick, nid, mmr FROM s1
        UNION ALL SELECT qid, 2, nid, mmr FROM s2
        UNION ALL SELECT qid, 3, nid, mmr FROM s3
    )
    ORDER BY qid, pick
"""


def _argmax(df: DataFrame, score_col: str) -> DataFrame:
    """Per-qid argmax with the (round(score,6) DESC, nid) tiebreak."""
    from pyspark.sql import Window as W

    w = W.partitionBy("qid").orderBy(
        F.round(F.col(score_col), 6).desc(), F.col("nid")
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def mmr_rerank(pool: DataFrame, pairs: DataFrame, k: int = MMR_K,
               lam: float = MMR_LAMBDA) -> DataFrame:
    """Greedy MMR unrolled to ``k`` picks over a bounded per-query
    candidate ``pool`` (qid, nid, sim) and its pairwise-cosine table
    ``pairs`` (qid, i, j, psim). Every frame is pool-sized; the unroll
    is a chain of joins, no driver loop. Factored so planted model
    tests (a redundant near-dup pool → MMR skips the duplicate that
    plain top-k keeps; λ = 1 degenerates to top-k order) drive the
    production selection."""
    pen = round(1 - lam, 10)
    picks: list[DataFrame] = []
    s1 = _argmax(pool, "sim").select(
        "qid", F.lit(1).alias("pick"), "nid", F.col("sim").alias("mmr")
    )
    picks.append(s1)
    selected = s1.select("qid", F.col("nid").alias("snid"))
    for step in range(2, k + 1):
        # redundancy = max pairwise sim against the selected set
        red = (
            pool.join(selected, "qid")
            .filter(F.col("nid") != F.col("snid"))
            .join(
                pairs,
                (pairs["qid"] == pool["qid"])
                & (pairs["i"] == pool["nid"])
                & (pairs["j"] == F.col("snid")),
            )
            .select(pool["qid"], pool["nid"], pool["sim"], "psim")
            .groupBy("qid", "nid", "sim")
            .agg(
                F.max("psim").alias("max_psim"),
                F.count("*").alias("__n_sel"),
            )
            # a candidate must be outside the selected set: it pairs
            # with ALL step-1 selected rows (selected members pair
            # with one fewer and are dropped by the count gate)
            .filter(F.col("__n_sel") == step - 1)
        )
        cand = red.select(
            "qid",
            "nid",
            (F.lit(lam) * F.col("sim") - F.lit(pen) * F.col("max_psim")).alias(
                "mmr"
            ),
        )
        s = _argmax(cand, "mmr").select(
            "qid", F.lit(step).alias("pick"), "nid", "mmr"
        )
        picks.append(s)
        selected = selected.unionByName(
            s.select("qid", F.col("nid").alias("snid"))
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.select(
        "qid",
        F.col("pick").cast("long").alias("pick"),
        "nid",
        F.round("mmr", 4).cast("double").alias("mmr"),
    ).orderBy("qid", "pick")


def _pool_and_pairs(e: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The exact top-MMR_POOL candidate pool per bounded query and its
    pairwise cosine table — both ≤ Q_MAX·MMR_POOL(±²) rows."""
    from pyspark.sql import Window as W

    q = e.filter(_query_filter()).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            cosine(F.col("qv"), F.col("v")).alias("sim"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.round("sim", 6).desc(), F.col("nid"))
    pool = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MMR_POOL)
        .select("qid", "nid", "sim")
    )
    pv = pool.join(
        e.select(F.col("vec_id").alias("nid"), "v"), "nid"
    ).select("qid", "nid", "sim", "v")
    a = pv.select("qid", F.col("nid").alias("i"), F.col("v").alias("va"))
    b = pv.select(
        F.col("qid").alias("qid_b"), F.col("nid").alias("j"), F.col("v").alias("vb")
    )
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("qid") == F.col("qid_b")) & (F.col("i") != F.col("j")),
        )
        .select("qid", "i", "j", cosine(F.col("va"), F.col("vb")).alias("psim"))
    )
    # materialize the BOUNDED frames once: the greedy unroll references
    # pool/pairs in every step's plan branch, and without this the
    # Q·N scoring pass would re-run per branch (~2k rows checkpointed
    # vs ~8 corpus scans — the audit.py persist lesson, with eager
    # localCheckpoint so nothing leaks past the builder)
    pool = pool.localCheckpoint(eager=True)
    pairs = pairs.localCheckpoint(eager=True)
    return pool, pairs


@query("sim_mmr_rerank", oracle=_MMR_ORACLE, tags=("llm", "similarity", "serving"))
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-3 per bounded query (λ = 0.7): greedy
    relevance-minus-redundancy selection over the exact cosine top-10
    pool, unrolled as bounded DataFrame joins — the rerank a retrieval
    surface runs so its results aren't three copies of the same
    near-dup cluster."""
    e = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", _dvec("embedding").alias("v")
    )
    pool, pairs = _pool_and_pairs(e)
    return mmr_rerank(pool, pairs)
