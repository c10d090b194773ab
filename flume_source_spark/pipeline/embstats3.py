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


# ---------------------------------------------------------------------------
# Pairwise-cosine histogram on a budget sample (round 9, session 3):
# the embedding-space health check. A healthy embedding space puts
# random-pair cosines in a band near 0; mass piling up near 1 means
# the space has COLLAPSED (all vectors alike — downstream dedup/ANN
# quality silently dies), mass near -1 means antipodal training
# artifacts. This is the test run BEFORE trusting any cosine
# threshold (the 0.35 dedup radius, the 0.2 analysis radius).
#
# Budget gate (the dedup_lsh_recall_audit / entity_blocking discipline,
# pipeline/audit.py:76): sample = vec_id where md5int(vec_id) % m == 0
# with m = greatest(1, N div 96) — ~96 vectors (<=4,560 pairs) at ANY
# corpus size, so the audit cost is the budget, not a corpus fraction.
# The md5 token hash is the house portable hash (identical integers on
# both engines); N is one bounded count on each side.
#
# Exactness: the pair cosine is a per-ROW double computed in identical
# IEEE order on both engines (normalize once, left-fold dot — the
# graph2 edge-membership precedent), binned by floor(cos*20) into
# 0.05-wide buckets; all cross-row math is integer counts.
# ---------------------------------------------------------------------------

_COS_HIST_BUDGET = 96

_COS_HIST_ORACLE = f"""
    WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    m AS (SELECT greatest(1, count(*) // {_COS_HIST_BUDGET}) AS m FROM e0),
    s AS (
        SELECT vec_id,
               list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS v
        FROM e0, m
        WHERE CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT)
              % m.m = 0
    ),
    p AS (
        SELECT CAST(floor(list_dot_product(a.v, b.v) * 20) AS BIGINT) AS bin
        FROM s a JOIN s b ON a.vec_id < b.vec_id
    )
    SELECT bin,
           CAST(bin * 500 AS BIGINT) AS lo_permyriad,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY bin ORDER BY bin
"""


def cosine_hist_from(e: DataFrame, budget: int = _COS_HIST_BUDGET) -> DataFrame:
    """Core histogram over a ``(vec_id, v0)`` frame (v0 = double
    vector): md5-budget-gate the rows, normalize once, bin every
    sampled pair's cosine by floor(cos*20). Factored from the registry
    query so planted-geometry model tests (identical vectors -> one
    bin at 20, orthogonal -> bin 0, antipodal -> bin -20) drive the
    production gate + join."""
    n = e.count()  # one bounded driver scalar, mirrors the oracle's count(*)
    m = max(1, n // budget)
    h = F.expr(
        "CAST(conv(substr(md5(CAST(vec_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
    )
    norm = F.sqrt(_dot(F.col("v0"), F.col("v0")))
    s = (
        e.filter(h % m == 0)
        .select("vec_id", F.transform("v0", lambda x: x / norm).alias("v"))
    )
    a = s.select(F.col("vec_id").alias("i"), F.col("v").alias("va"))
    b = s.select(F.col("vec_id").alias("j"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("i") < F.col("j")).select(
        F.floor(_dot(F.col("va"), F.col("vb")) * 20).cast("long").alias("bin")
    )
    return (
        pairs.groupBy("bin")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .select("bin", (F.col("bin") * 500).cast("long").alias("lo_permyriad"), "n_pairs")
        .orderBy("bin")
    )


@query("emb_cosine_hist", oracle=_COS_HIST_ORACLE, tags=("llm", "embedding", "audit"))
def emb_cosine_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine histogram over a budget md5 sample (~96 vectors
    -> <=4,560 pairs at any N): 0.05-wide bins with the lower edge in
    permyriad. The collapse detector — run before trusting any cosine
    threshold. The sampled pair join is tiny by construction (both
    sides budget-bounded), so the only corpus-sized work is the scan
    feeding the hash gate."""
    e = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", _dvec("embedding").alias("v0")
    )
    return cosine_hist_from(e)


# ---------------------------------------------------------------------------
# emb_prefix_recall_curve (round 12): the RETRIEVAL-quality side of
# the Matryoshka audit. emb_prefix_energy answers "how much norm
# survives truncation"; this answers the question serving actually
# cares about — "if I retrieve with the first P dimensions, how much
# of the full-dimension top-k do I still find?" For each bounded
# query (the similarity family's Q_MAX contract) and each P ∈
# {8, 16, 32, 64}: cosine top-K by the P-prefix slices, then
# recall@K against the P = 64 (full) top-K. The P = 64 row is a
# built-in sanity pin: its recall must read exactly 10⁶ ppm.
#
# Scale: ONE Q·N scoring pass (the sim_cosine_topk class — at real
# scale the pool comes from sim_ann_* instead) fanned ×4 by a literal
# prefix explode; the rank windows partition by (P, qid) so every
# sort is per-query-sized. Per-row float cosines are bitwise
# cross-engine (identical left-fold op order); all aggregation is on
# integer ids and counts.
# ---------------------------------------------------------------------------

PREFIX_RECALL_K = 3
_RECALL_PREFIXES = (8, 16, 32, 64)


def _prefix_recall_oracle() -> str:
    from flume_source_spark.pipeline.similarity import _QWHERE_SQL

    ps = ", ".join(str(p) for p in _RECALL_PREFIXES)
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE {_QWHERE_SQL}),
    scored AS (
        SELECT p.p, q.qid, e.vec_id AS nid,
               list_dot_product(qv[1:p.p], v[1:p.p]) /
                 (sqrt(list_dot_product(qv[1:p.p], qv[1:p.p]))
                  * sqrt(list_dot_product(v[1:p.p], v[1:p.p]))) AS sim
        FROM q JOIN e ON e.vec_id <> qid
        CROSS JOIN (SELECT unnest([{ps}]) AS p) p
    ),
    topk AS MATERIALIZED (
        SELECT p, qid, nid FROM (
            SELECT p, qid, nid,
                   row_number() OVER (PARTITION BY p, qid
                       ORDER BY round(sim, 6) DESC, nid) AS rn
            FROM scored) WHERE rn <= {PREFIX_RECALL_K}
    ),
    truth AS (SELECT qid, nid FROM topk WHERE p = 64),
    hits AS (
        SELECT t.p, count(*) AS n_hits
        FROM topk t JOIN truth u ON u.qid = t.qid AND u.nid = t.nid
        GROUP BY t.p
    ),
    nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM q)
    -- left join from the P lattice: a prefix with ZERO hits keeps its
    -- curve point (recall 0) instead of silently vanishing
    SELECT CAST(l.p AS BIGINT) AS prefix_len,
           nq.n_queries,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST((coalesce(h.n_hits, 0) * 1000000)
                // (nq.n_queries * {PREFIX_RECALL_K}) AS BIGINT) AS recall_ppm
    FROM (SELECT unnest([{ps}]) AS p) l
    LEFT JOIN hits h ON h.p = l.p
    CROSS JOIN nq
    ORDER BY prefix_len
"""


@query(
    "emb_prefix_recall_curve",
    oracle=_prefix_recall_oracle(),
    tags=("llm", "embedding", "similarity", "audit"),
)
def emb_prefix_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation recall curve: per prefix length P ∈
    {8, 16, 32, 64}, the recall@3 of P-prefix cosine retrieval
    against the full-dimension top-3, over the hard-bounded query set
    — the measured answer to "how few dimensions can serving ship?".
    The P = 64 row must read exactly 10⁶ ppm (sanity pin)."""
    e = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", _dvec("embedding").alias("v")
    )
    return prefix_recall_from(spark, e)


def prefix_recall_from(spark: SparkSession, e: DataFrame) -> DataFrame:
    """Curve builder over any (vec_id, v: array<double>) frame —
    split out so planted-geometry tests can feed a tiny frame."""
    from pyspark.sql import Window as W

    from flume_source_spark.pipeline.similarity import _query_filter, cosine

    q = e.filter(_query_filter()).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            F.col("qid"),
            F.col("vec_id").alias("nid"),
            F.explode(
                F.array(*[F.lit(p) for p in _RECALL_PREFIXES])
            ).alias("p"),
            "qv",
            "v",
        )
        .select(
            "p",
            "qid",
            "nid",
            cosine(
                F.slice(F.col("qv"), 1, F.col("p")),
                F.slice(F.col("v"), 1, F.col("p")),
            ).alias("sim"),
        )
    )
    w = W.partitionBy("p", "qid").orderBy(F.round("sim", 6).desc(), F.col("nid"))
    # ≤ |prefixes|·Q_MAX·K rows, but its lineage is the full Q·N×4
    # scoring pass — checkpoint so truth + hits don't rescore the pool
    topk = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PREFIX_RECALL_K)
        .select("p", "qid", "nid")
    ).localCheckpoint(eager=True)
    truth = topk.filter(F.col("p") == 64).select("qid", "nid")
    hits = topk.join(F.broadcast(truth), ["qid", "nid"]).groupBy("p").agg(
        F.count("*").cast("long").alias("n_hits")
    )
    nq = q.agg(F.count("*").cast("long").alias("n_queries"))
    # left join from the P lattice, mirroring the oracle: a prefix with
    # zero hits keeps its curve point instead of silently vanishing
    lattice = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in _RECALL_PREFIXES])).alias("p")
    )
    return (
        lattice.join(F.broadcast(hits), "p", "left")
        .crossJoin(F.broadcast(nq))
        .select(
            F.col("p").cast("long").alias("prefix_len"),
            "n_queries",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.expr(
                f"CAST((coalesce(n_hits, 0) * 1000000)"
                f" div (n_queries * {PREFIX_RECALL_K}) AS BIGINT)"
            ).alias("recall_ppm"),
        )
        .orderBy("prefix_len")
    )


# ---------------------------------------------------------------------------
# emb_isotropy_audit (round 12): exact mean pairwise cosine per label
# WITHOUT a pair join. On unit-normalized vectors,
# ||sum_i u_i||^2 = sum_ij <u_i, u_j> = N + sum_{i != j} cos(i, j),
# so mean_{i != j} cos = (||S||^2 - N) / (N * (N - 1)) — one corpus
# scan, a posexplode into (label, dim) partial sums (64·L rows,
# map-side combinable), then O(dim) arithmetic. Anisotropy (a large
# positive mean cosine) is the classic embedding pathology that
# inflates every cosine-threshold dedup/retrieval decision upstream;
# this is the audit that says whether thresholds need centering.
#
# Cross-engine exactness: the per-row normalize is identical IEEE op
# order (the _EDGE_CTE precedent); the only cross-row float sums are
# the per-(label, dim) sums and the dim-sum-of-squares — ~1e-15
# relative error against a round-6 output, and the total row reuses
# the per-label sums (same two-level accumulation structure mirrored
# in the oracle). The ROLLUP total is a literal UNION of the same
# CTEs, not a second scan.
# ---------------------------------------------------------------------------

_ISOTROPY_ORACLE = """
    WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    nv AS (SELECT label, v, sqrt(list_dot_product(v, v)) AS nrm_v FROM e),
    nrm AS (SELECT label, list_transform(v, x -> x / nrm_v) AS u FROM nv),
    -- equal-length unnests in one SELECT zip positionally in DuckDB
    ex AS (SELECT label,
                  unnest(generate_series(1, len(u))) AS pos,
                  unnest(u) AS val
           FROM nrm),
    dims AS (SELECT label, pos, sum(val) AS s,
                    CAST(count(*) AS BIGINT) AS c
             FROM ex GROUP BY label, pos),
    per AS (SELECT label, sum(s * s) AS s2 FROM dims GROUP BY label),
    -- the count at any dim IS the vector count (arrays are same-
    -- length); max(c) avoids a second corpus-facing aggregate
    cnt AS (SELECT label, CAST(max(c) AS BIGINT) AS n_vecs FROM dims GROUP BY label),
    lab AS (
        SELECT c.label, c.n_vecs,
               CASE WHEN c.n_vecs >= 2 THEN
                   CAST(round((p.s2 - c.n_vecs) / (c.n_vecs * (c.n_vecs - 1.0)), 6)
                        AS DOUBLE)
               END AS mean_pair_cos
        FROM cnt c JOIN per p ON p.label = c.label
    ),
    tot_dims AS (SELECT pos, sum(s) AS s FROM dims GROUP BY pos),
    tot AS (
        SELECT CAST(NULL AS INTEGER) AS label,
               CAST((SELECT sum(n_vecs) FROM cnt) AS BIGINT) AS n_vecs,
               (SELECT sum(s * s) FROM tot_dims) AS s2
    )
    SELECT label, n_vecs, mean_pair_cos FROM lab
    UNION ALL
    SELECT label, n_vecs,
           CASE WHEN n_vecs >= 2 THEN
               CAST(round((s2 - n_vecs) / (n_vecs * (n_vecs - 1.0)), 6) AS DOUBLE)
           END AS mean_pair_cos
    FROM tot WHERE n_vecs IS NOT NULL
    ORDER BY label NULLS LAST
"""


@query(
    "emb_isotropy_audit",
    oracle=_ISOTROPY_ORACLE,
    tags=("llm", "embedding", "audit", "stats"),
)
def emb_isotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mean pairwise cosine per label + an all-corpus total row
    (label NULL) via the sum-of-normalized-vectors identity — no pair
    join anywhere, one scan, 64·L-row shuffles only."""
    e = load_tables(spark, sf_dir)["embeddings"].select(
        "label", _dvec("embedding").alias("v")
    )
    return isotropy_from(e)


def isotropy_from(e: DataFrame) -> DataFrame:
    """Core fold over a (label, v: array<double>) frame — factored so
    planted-geometry model tests (identical → +1, orthogonal → 0,
    antipodal → −1) drive the production arithmetic."""
    # norm as a column FIRST: the transform lambda then does one
    # divide per element (O(d) per row, not O(d²) re-dotting)
    nrm = e.select(
        "label", "v", F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nrm_v")
    ).select("label", F.transform("v", lambda x: x / F.col("nrm_v")).alias("u"))
    ex = nrm.select("label", F.posexplode("u").alias("pos", "val"))
    # per-(label, dim) sums AND counts in the same pass: the count at
    # any dim IS the vector count, so no second corpus scan is needed
    # for n_vecs. dims is 64·L rows with a corpus-wide lineage —
    # materialize it ONCE for its three consumers (per-label s2,
    # per-label n, total dims), mirroring the oracle's single CTE.
    dims = (
        ex.groupBy("label", "pos")
        .agg(F.sum("val").alias("s"), F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    per = dims.groupBy("label").agg(F.sum(F.col("s") * F.col("s")).alias("s2"))
    cnt = dims.groupBy("label").agg(F.max("c").alias("n_vecs"))

    def curve(frame):
        return frame.select(
            "label",
            "n_vecs",
            F.when(
                F.col("n_vecs") >= 2,
                F.round(
                    (F.col("s2") - F.col("n_vecs"))
                    / (F.col("n_vecs") * (F.col("n_vecs") - F.lit(1.0))),
                    6,
                ),
            ).alias("mean_pair_cos"),
        )

    lab = curve(cnt.join(per, "label"))
    # total row: REUSE the per-(label, dim) sums (same two-level
    # accumulation the oracle's tot_dims CTE mirrors), never a rescan
    tot_s2 = (
        dims.groupBy("pos")
        .agg(F.sum("s").alias("s"))
        .agg(F.sum(F.col("s") * F.col("s")).alias("s2"))
    )
    tot_n = cnt.agg(F.sum("n_vecs").alias("n_vecs"))
    tot = curve(
        tot_n.crossJoin(tot_s2).select(
            F.lit(None).cast("int").alias("label"), "n_vecs", "s2"
        )
    ).filter(F.col("n_vecs").isNotNull())
    return lab.unionByName(tot).orderBy(F.col("label").asc_nulls_last())
