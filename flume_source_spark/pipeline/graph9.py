"""Graph wave 9 (round 12): HITS hubs & authorities (Kleinberg 1999)
— the eigenvector-pair companion of PageRank, on the same bounded
customer→supplier interaction rollup as ``graph_pagerank_exact``
(pipeline/graph4.py) but DIRECTED: customers are hubs (they "point
at" suppliers through high-quantity purchases), suppliers are
authorities. A good hub buys from good authorities; a good authority
is bought from by good hubs — the mutually recursive definition HITS
iterates.

Scaled-integer exactness (the graph4 discipline): scores live in
integer millionths; each round is

    a(v)  = Σ_{u→v} h(u)           (exact BIGINT sums)
    a'(v) = a(v)·10⁶ div max(a)    (max-normalize, floor division)
    h(u)  = Σ_{u→v} a'(v)
    h'(u) = h(u)·10⁶ div max(h)

so after every round the leader holds exactly 10⁶ and every operation
is integer — bitwise identical across engines, driver-hashable.
Overflow: scores ≤ 10⁶, in-degree ≤ 10⁴ ⇒ sums ≤ 10¹⁰ and the
normalize product ≤ 10¹⁶ — comfortable int64. 3 rounds (HITS
converges geometrically in the principal-eigenvalue gap; on the
bounded rollup round-3 scores are stationary to the floor unit).

Scale design: identical to PageRank-exact — the ONE corpus-facing
stage is the distinct-edge extraction (lineitem ⋈ orders, map-side
combinable, l_quantity ≥ 49 keeps the rollup sparse); the rollup is
localCheckpoint-pinned (≤ 10⁴ edges, broadcast-sized) so the
iterations never replan the fact join. The normalizing max is a
1-row aggregate broadcast back in-plan — no driver collect.

Oracle: 3 unrolled CTE rounds, every sum cast back to BIGINT
(DuckDB sums BIGINT into HUGEINT).

Reference parity note: the reference engine (`CephFsSource.java`)
has no graph surface; this operator belongs to the declared [NS]
engine surface (SURVEY.md §2.2, graph/iterative family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

HITS_SCALE = 10**6
HITS_ITERS = 3


def _round_sql(h_prev: str, i: int) -> str:
    """One unrolled HITS round: authority pull, max-normalize, hub
    pull, max-normalize."""
    return f"""
    a{i}raw AS (
        SELECT e.dst AS id, CAST(sum(h.s) AS BIGINT) AS s
        FROM edges e JOIN {h_prev} h ON e.src = h.id GROUP BY e.dst
    ),
    a{i} AS (
        SELECT id, CAST(s * {HITS_SCALE} //
                        (SELECT max(s) FROM a{i}raw) AS BIGINT) AS s
        FROM a{i}raw
    ),
    h{i}raw AS (
        SELECT e.src AS id, CAST(sum(a.s) AS BIGINT) AS s
        FROM edges e JOIN a{i} a ON e.dst = a.id GROUP BY e.src
    ),
    h{i} AS (
        SELECT id, CAST(s * {HITS_SCALE} //
                        (SELECT max(s) FROM h{i}raw) AS BIGINT) AS s
        FROM h{i}raw
    )"""


_HITS_ORACLE = (
    f"""
    WITH edges AS (
        SELECT DISTINCT CAST(o.o_custkey % 100 AS BIGINT) AS src,
                        CAST(100 + (l.l_suppkey % 100) AS BIGINT) AS dst
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_quantity >= 49
    ),
    h0 AS (SELECT DISTINCT src AS id, CAST({HITS_SCALE} AS BIGINT) AS s
           FROM edges),"""
    + ",".join(_round_sql(f"h{i - 1}", i) for i in range(1, HITS_ITERS + 1))
    + f"""
    SELECT 'authority' AS kind, id, s AS score_micro FROM a{HITS_ITERS}
    UNION ALL
    SELECT 'hub' AS kind, id, s AS score_micro FROM h{HITS_ITERS}
    ORDER BY kind, id
"""
)


def hits_scores(edges: DataFrame, iters: int = HITS_ITERS) -> DataFrame:
    """Core scaled-integer HITS over a directed (src, dst) edge
    frame: ``iters`` rounds of authority/hub pulls with integer
    max-normalization. Factored so closed-form model tests (a star's
    center is the sole authority at 10⁶; disconnected components
    normalize against the GLOBAL leader; a chain's scores decay)
    drive the production stages. The edge frame should be bounded
    (rollup-sized) — callers checkpoint it.

    Round-13 re-shape (guide §2.4/§3 "very wide plans"): the unroll
    used to stay fully LAZY — each round's ``araw``/``hraw`` was
    referenced twice (the normalization join and the max scalar) and
    fed the next round's two references, so the plan tree multiplied
    ~4× per round (~4^iters subtree copies of the edge join; the
    suite's single slowest oracle test at 82 s). Each half-round's
    score frame is now localCheckpoint'd — it is vertex-sized
    (linear, ≤ the rollup's residue count here), every round's plan
    is constant-size, and the integer arithmetic is unchanged, so
    scores are byte-identical (oracle + closed-form model tests)."""
    h = (
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("id"), F.lit(HITS_SCALE).cast("long").alias("s"))
    )
    a = None
    for _ in range(iters):
        araw = (
            edges.join(h.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("s").cast("long").alias("s"))
            .localCheckpoint()
        )
        amax = araw.agg(F.max("s").alias("m"))
        a = araw.crossJoin(F.broadcast(amax)).select(
            "id", F.expr(f"CAST(s * {HITS_SCALE} div m AS BIGINT)").alias("s")
        )
        hraw = (
            edges.join(a.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("s").cast("long").alias("s"))
            .localCheckpoint()
        )
        hmax = hraw.agg(F.max("s").alias("m"))
        h = hraw.crossJoin(F.broadcast(hmax)).select(
            "id", F.expr(f"CAST(s * {HITS_SCALE} div m AS BIGINT)").alias("s")
        )
    return (
        a.select(F.lit("authority").alias("kind"), "id", F.col("s").alias("score_micro"))
        .unionByName(
            h.select(F.lit("hub").alias("kind"), "id", F.col("s").alias("score_micro"))
        )
        .orderBy("kind", "id")
    )


@query(
    "graph_hits_exact",
    oracle=_HITS_ORACLE,
    tags=("llm", "graph", "iterative"),
)
def graph_hits_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scaled-integer HITS (3 rounds) over the directed
    customer→supplier high-quantity rollup: hub scores for customer
    residues, authority scores for supplier residues, leader pinned
    at exactly 10⁶ each round — the driver-hashable twin of the
    float eigenvector iteration."""
    t = load_tables(spark, sf_dir)
    edges = (
        t["lineitem"]
        .filter(F.col("l_quantity") >= 49)
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") % 100).cast("long").alias("src"),
            (F.lit(100) + F.col("l_suppkey") % 100).cast("long").alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    return hits_scores(edges)
