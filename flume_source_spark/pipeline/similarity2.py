"""Similarity wave 2: a driver-HASHABLE hyperplane-LSH twin.

``sim_ann_lsh`` (pipeline/similarity.py) is the production variant —
float random hyperplanes, rows-only because per-engine float dot
products can flip sign bits at boundaries. This module re-runs the
SAME machinery (multi-table sign-bit hashing → bucket packing →
(table, bucket) candidate equi-join → rerank → top-k) in exact
integer arithmetic, the graph_pagerank_exact / emb_quantize_pq_exact
pattern applied to LSH:

- components floor-quantized to a 1e-3 integer grid (floor, not
  round — engines' round-half rules legally differ),
- hyperplanes are a closed-form integer lattice h(t,b,d) — no RNG,
  no float, both engines evaluate the same expression,
- bit(t,b) = [Σ_d xq_d·h(t,b,d) ≥ 0], bucket(t) = Σ_b bit·2^b,
- candidates = (table, bucket) equi-join of the Q_MAX-bounded query
  panel against the corpus (never all-pairs),
- rerank score = integer dot of the quantized vectors (|xq| ≤ ~10³,
  dim 64 → |score| ≤ ~10⁸, exact in BIGINT on both engines),
- top-k by (score DESC, cid) — total order, no ties possible to
  break differently.

Every output value is an integer, so the driver hash is exact. The
production operator keeps the float hyperplanes (better isotropy);
this twin verifies the pipeline's moving parts cross-engine.

Scale shape: identical to the production operator — the bit stage is
one posexplode (64×) joined to a broadcast 40-row (table, bit) grid
into a map-side-combinable (vec_id, t, b) partial agg; the candidate
join shuffles on (table, bucket) — never a cartesian; the rerank
touches only candidate pairs with a Q_MAX-bounded broadcast side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.similarity import _QWHERE_SQL, _dvec, _query_filter
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

LSHX_TABLES = 8
LSHX_BITS = 5
LSHX_TOP_K = 5
# closed-form integer hyperplane lattice, values in [-1000, 1000]
_LSHX_A, _LSHX_B, _LSHX_C = 131071, 8191, 524287


def _hplane_sql(t: str, b: str, d: str) -> str:
    return f"((({t} * {_LSHX_A} + {b} * {_LSHX_B} + {d} * {_LSHX_C}) % 2001) - 1000)"


_LSHX_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q0 AS MATERIALIZED (
        SELECT vec_id,
               list_transform(v, x -> CAST(floor(x * 1000) AS BIGINT)) AS xq
        FROM e
    ),
    dims AS MATERIALIZED (
        SELECT vec_id, CAST(r.range AS BIGINT) AS dim,
               xq[CAST(r.range + 1 AS INTEGER)] AS x
        FROM q0, range(64) r
    ),
    grid AS (
        SELECT CAST(t.range AS BIGINT) AS t, CAST(b.range AS BIGINT) AS b
        FROM range({LSHX_TABLES}) t, range({LSHX_BITS}) b
    ),
    bits AS MATERIALIZED (
        SELECT vec_id, t, b,
               CASE WHEN CAST(SUM(x * {_hplane_sql('t', 'b', 'dim')}) AS BIGINT) >= 0
                    THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER)
                    ELSE 0 END AS bitval
        FROM dims, grid GROUP BY vec_id, t, b
    ),
    buckets AS MATERIALIZED (
        SELECT vec_id, t, CAST(SUM(bitval) AS BIGINT) AS bucket
        FROM bits GROUP BY vec_id, t
    ),
    cand AS MATERIALIZED (
        SELECT DISTINCT qb.vec_id AS qid, cb.vec_id AS cid
        FROM buckets qb
        JOIN buckets cb ON qb.t = cb.t AND qb.bucket = cb.bucket
        WHERE qb.vec_id IN (SELECT vec_id FROM e WHERE {_QWHERE_SQL})
          AND qb.vec_id <> cb.vec_id
    ),
    scored AS (
        SELECT c.qid, c.cid,
               CAST(list_dot_product(
                   list_transform(qq.xq, x -> CAST(x AS DOUBLE)),
                   list_transform(cc.xq, x -> CAST(x AS DOUBLE))) AS BIGINT) AS score
        FROM cand c
        JOIN q0 qq ON qq.vec_id = c.qid
        JOIN q0 cc ON cc.vec_id = c.cid
    ),
    ranked AS (
        SELECT qid, cid, score,
               row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rn
        FROM scored
    )
    SELECT qid, cid, score, CAST(rn AS BIGINT) AS rank
    FROM ranked WHERE rn <= {LSHX_TOP_K} ORDER BY qid, rank
"""


@query(
    "sim_ann_lsh_exact",
    oracle=_LSHX_ORACLE,
    tags=("llm", "similarity", "ann", "lsh"),
)
def sim_ann_lsh_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer hyperplane-LSH ANN — the hash-checkable twin of
    ``sim_ann_lsh``: 8 tables × 5 sign bits on a closed-form integer
    lattice, (table, bucket) candidate equi-join, integer-dot rerank,
    top-5 per query with a total-order tiebreak. Output
    (qid, cid, score, rank), all integers."""
    e = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", _dvec("embedding").alias("v")
    )
    q0 = e.select(
        "vec_id",
        F.transform("v", lambda x: F.floor(x * F.lit(1000)).cast("long")).alias("xq"),
    ).localCheckpoint(eager=True)  # bit stage + both rerank sides reuse it
    dims = q0.select(
        "vec_id", F.posexplode("xq").alias("dim", "x")
    ).select("vec_id", F.col("dim").cast("long").alias("dim"), "x")
    grid = (
        spark.range(LSHX_TABLES)
        .select(F.col("id").cast("long").alias("t"))
        .crossJoin(spark.range(LSHX_BITS).select(F.col("id").cast("long").alias("b")))
    )
    h = ((F.col("t") * _LSHX_A + F.col("b") * _LSHX_B + F.col("dim") * _LSHX_C) % 2001) - 1000
    bits = (
        dims.crossJoin(F.broadcast(grid))
        .groupBy("vec_id", "t", "b")
        .agg(F.sum(F.col("x") * h).alias("s"))
        .select(
            "vec_id",
            "t",
            F.when(F.col("s") >= 0, F.expr("shiftleft(1L, cast(b as int))"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("bitval"),
        )
    )
    buckets = bits.groupBy("vec_id", "t").agg(F.sum("bitval").cast("long").alias("bucket"))
    qids = e.filter(_query_filter()).select(F.col("vec_id").alias("qid"))
    qb = buckets.join(F.broadcast(qids), buckets.vec_id == qids.qid).select(
        "qid", "t", "bucket"
    )
    cand = (
        qb.join(
            buckets.select(F.col("vec_id").alias("cid"), "t", "bucket"),
            ["t", "bucket"],
        )
        .where(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
        .distinct()
    )
    qx = q0.select(F.col("vec_id").alias("qid"), F.col("xq").alias("qxq"))
    cx = q0.select(F.col("vec_id").alias("cid"), F.col("xq").alias("cxq"))
    score = F.aggregate(
        F.zip_with("qxq", "cxq", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        cand.join(F.broadcast(qx), "qid")
        .join(cx, "cid")
        .select("qid", "cid", score.alias("score"))
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("cid"))
    )
    return (
        scored.select("qid", "cid", "score", rn.cast("long").alias("rank"))
        .where(F.col("rank") <= LSHX_TOP_K)
        .orderBy("qid", "rank")
    )


# ---------------------------------------------------------------------------
# sim_ann_ivf_exact — the hash-checkable IVF twin
# ---------------------------------------------------------------------------

IVFX_NLIST = 16
IVFX_NPROBE = 4
IVFX_TOP_K = 5
# closed-form integer centroid lattice, values in [-1000, 1000]
_IVFX_A, _IVFX_C = 69061, 293


# The IVF CTE chain (through `ranked`) is shared with the recall
# audit (pipeline/audit.py): the audit's oracle must see the SAME
# candidate generation the twin pins, so the text exists once.
_IVFX_CTES = f"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q0 AS MATERIALIZED (
        SELECT vec_id,
               list_transform(v, x -> CAST(floor(x * 1000) AS BIGINT)) AS xq
        FROM e
    ),
    norms AS MATERIALIZED (
        SELECT vec_id, xq,
               CAST(list_dot_product(
                   list_transform(xq, x -> CAST(x AS DOUBLE)),
                   list_transform(xq, x -> CAST(x AS DOUBLE))) AS BIGINT) AS na
        FROM q0
    ),
    centg AS (
        SELECT CAST(j.range AS BIGINT) AS j, CAST(d.range AS BIGINT) AS d,
               ((j.range * {_IVFX_A} + d.range * {_IVFX_C}) % 2001) - 1000 AS c
        FROM range({IVFX_NLIST}) j, range(64) d
    ),
    cent AS MATERIALIZED (
        SELECT j, list(c ORDER BY d) AS carr,
               CAST(SUM(c * c) AS BIGINT) AS nc
        FROM centg GROUP BY j
    ),
    dist AS MATERIALIZED (
        SELECT n.vec_id, c.j,
               n.na + c.nc - 2 * CAST(list_dot_product(
                   list_transform(n.xq, x -> CAST(x AS DOUBLE)),
                   list_transform(c.carr, x -> CAST(x AS DOUBLE))) AS BIGINT) AS dist,
               row_number() OVER (
                   PARTITION BY n.vec_id ORDER BY
                   n.na + c.nc - 2 * CAST(list_dot_product(
                       list_transform(n.xq, x -> CAST(x AS DOUBLE)),
                       list_transform(c.carr, x -> CAST(x AS DOUBLE))) AS BIGINT),
                   c.j) AS rn
        FROM norms n, cent c
    ),
    assign AS MATERIALIZED (SELECT vec_id, j FROM dist WHERE rn = 1),
    qprobe AS MATERIALIZED (
        SELECT vec_id AS qid, j FROM dist
        WHERE rn <= {IVFX_NPROBE}
          AND vec_id IN (SELECT vec_id FROM e WHERE {_QWHERE_SQL})
    ),
    cand AS MATERIALIZED (
        SELECT qp.qid, a.vec_id AS cid
        FROM qprobe qp JOIN assign a ON qp.j = a.j
        WHERE qp.qid <> a.vec_id
    ),
    scored AS (
        SELECT c.qid, c.cid,
               CAST(list_dot_product(
                   list_transform(qq.xq, x -> CAST(x AS DOUBLE)),
                   list_transform(cc.xq, x -> CAST(x AS DOUBLE))) AS BIGINT) AS score
        FROM cand c
        JOIN q0 qq ON qq.vec_id = c.qid
        JOIN q0 cc ON cc.vec_id = c.cid
    ),
    ranked AS (
        SELECT qid, cid, score,
               row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rn
        FROM scored
    )"""

_IVFX_ORACLE = f"""
    WITH {_IVFX_CTES}
    SELECT qid, cid, score, CAST(rn AS BIGINT) AS rank
    FROM ranked WHERE rn <= {IVFX_TOP_K} ORDER BY qid, rank
"""


@query(
    "sim_ann_ivf_exact",
    oracle=_IVFX_ORACLE,
    tags=("llm", "similarity", "ann", "ivf"),
)
def sim_ann_ivf_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-lattice IVF ANN — the hash-checkable twin of
    ``sim_ann_ivf`` (the graph_pagerank_exact pattern applied to the
    inverted-file path, completing the ANN family: LSH and PQ already
    have exact twins). Same moving parts as production IVF — coarse
    quantizer, per-vector list assignment, nprobe list probing,
    in-list rerank, top-k — but every arithmetic step is exact:

    - vectors floor-quantized to a 1e-3 integer grid (|xq_d| <= 1000),
    - the 16 "centroids" are a closed-form integer lattice c(j,d)
      (no k-means float drift; both engines evaluate one expression),
    - L2 distance via the integer identity ||x-c||^2 = na + nc - 2*x.c
      (|dot| <= 6.4e7 < 2^53, so even DuckDB's double-valued
      list_dot_product is exact; assignment ties broken by list id),
    - rerank score = integer dot, top-5 by (score DESC, cid) — a
      total order, no cross-engine tie ambiguity.

    Scale shape mirrors production ``sim_ann_ivf``: the 16-row centroid
    panel is BROADCAST into a 16x-per-vector dot stage (no shuffle);
    the argmin collapses map-side (16 co-partitioned rows per vec_id);
    the probe panel is <= Q_MAX*NPROBE = 256 rows and is broadcast
    into the assignment frame, so the corpus is never shuffled for
    candidate generation; the rerank broadcasts the Q_MAX-bounded
    query vectors. NLIST scales as sqrt(N) in production; the twin
    pins the machinery, not the constant."""
    e = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", _dvec("embedding").alias("v")
    )
    sq = F.aggregate(
        F.transform("xq", lambda x: x * x), F.lit(0).cast("long"), lambda a, x: a + x
    )
    q0 = (
        e.select(
            "vec_id",
            F.transform("v", lambda x: F.floor(x * F.lit(1000)).cast("long")).alias(
                "xq"
            ),
        )
        .withColumn("na", sq)
        .localCheckpoint(eager=True)  # assignment + both rerank sides reuse it
    )
    jcol = F.col("j")
    cent = spark.range(IVFX_NLIST).select(
        F.col("id").cast("long").alias("j"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda d: ((jcol * _IVFX_A + d.cast("long") * _IVFX_C) % 2001 - 1000).cast(
                "long"
            ),
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
    dist = (
        q0.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "j",
            (F.col("na") + F.col("nc") - F.lit(2) * dot_xc).alias("dist"),
        )
        .localCheckpoint(eager=True)  # assignment and probe ranking reuse it
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("vec_id").orderBy(F.col("dist").asc(), F.col("j").asc())
    )
    ranked_lists = dist.select("vec_id", "j", rn.alias("rn"))
    assign = ranked_lists.where(F.col("rn") == 1).select(
        F.col("vec_id").alias("cid"), "j"
    )
    qids = e.filter(_query_filter()).select(F.col("vec_id").alias("qid"))
    qprobe = (
        ranked_lists.where(F.col("rn") <= IVFX_NPROBE)
        .join(F.broadcast(qids), ranked_lists.vec_id == qids.qid)
        .select("qid", "j")
    )
    cand = assign.join(F.broadcast(qprobe), "j").where(
        F.col("qid") != F.col("cid")
    ).select("qid", "cid")
    qx = q0.select(F.col("vec_id").alias("qid"), F.col("xq").alias("qxq"))
    cx = q0.select(F.col("vec_id").alias("cid"), F.col("xq").alias("cxq"))
    score = F.aggregate(
        F.zip_with("qxq", "cxq", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        cand.join(F.broadcast(qx), "qid").join(cx, "cid").select(
            "qid", "cid", score.alias("score")
        )
    )
    topk = F.row_number().over(
        W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("cid").asc())
    )
    return (
        scored.select("qid", "cid", "score", topk.cast("long").alias("rank"))
        .where(F.col("rank") <= IVFX_TOP_K)
        .orderBy("qid", "rank")
    )
