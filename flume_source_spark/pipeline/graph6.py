"""Graph analytics wave 6 (round 9, session 3): node-local structure.

``graph_local_clustering`` — the per-node local clustering
coefficient over the shared near-dup similarity graph, and
``graph_bfs_layers`` — exact BFS hop layers (<= 3 hops) from each
label block's canonical root.

Why: graph_triangle_count answers the GLOBAL clique-vs-chain question
per label; the local coefficient answers it PER NODE — a document
whose neighbors are all pairwise-similar (lcc -> 1e6) sits inside a
boilerplate clique and is safe to drop, while a low-lcc node bridges
otherwise-unrelated near-dup chains and deserves a human look before
transitive dedup merges its cluster (the classic paraphrase-chain
false-merge). BFS layers are the distance-truth twin for reachability
claims: graph_two_hop_reach counts |N(1)|, |N(2)| per node, this
query pins WHICH nodes sit at each hop from a deterministic root —
the verification surface for any "within k hops" dedup policy.

Graph = the SAME label-blocked embedding-similarity edge definition
shared with graph_triangle_count / graph_kcore /
graph_common_neighbors (pipeline/graph2.py ``edge_cte`` /
``similarity_edges``), instantiated at the documented denser ANALYSIS
radius (see ``_ANALYSIS_RADIUS`` below) so node-local statistics have
real local structure to measure.

Scale design: the clustering coefficient reuses the exactly-once
(i<j<k) triangle enumeration — cost identical to graph_triangle_count
(wedge join bounded by label blocking; at 100 TB add the standard hub
cap on the middle vertex) — then attributes each triangle to its 3
corners with a map-side-combinable count. BFS is frontier-iterative:
each hop is one shuffle join frontier ⋈ bidir bounded by
Σ deg(frontier), plus an anti-join against the visited set; the hop
bound (3) caps the rounds, and per-round localCheckpoint truncates
the growing lineage exactly as in connected_components (graph.py:69).
All published ratios are integer ppm via integral `div` on
non-negative numerators (trunc == floor == DuckDB //).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.graph2 import edge_cte, similarity_edges
from flume_source_spark.registry import query

# Node-local statistics need a graph with actual local structure:
# at the shared 0.35 radius the fixture graph has 26 edges and ZERO
# triangles at sf0.001 (a registered query would be 0-row green —
# the geo_grid_join round-7 defect class). The documented ANALYSIS
# radius 0.2 yields 709 edges / 376 deg>=2 nodes / 91 triangles at
# 500 vectors, so every output column carries real evidence. The
# radius is a parameter of the same shared edge builder
# (graph2.similarity_edges), not a fork of the edge definition.
_ANALYSIS_RADIUS = 0.2
_ANALYSIS_EDGE_CTE = edge_cte(_ANALYSIS_RADIUS)

# ---------------------------------------------------------------------------
# Local clustering coefficient: lcc(v) = 2*tri(v) / (deg(v)*(deg(v)-1))
# for deg(v) >= 2, in exact integer ppm. tri(v) counts each triangle
# once per corner; with canonical i<j<k enumeration each triangle is
# produced exactly once, then exploded to its 3 corners.
# ---------------------------------------------------------------------------

_LCC_ORACLE = f"""
    WITH {_ANALYSIS_EDGE_CTE},
    bidir AS (SELECT i, j FROM edges UNION ALL SELECT j, i FROM edges),
    deg AS (SELECT i AS node, CAST(count(*) AS BIGINT) AS deg FROM bidir GROUP BY i),
    tri AS (
        SELECT e1.i AS a, e1.j AS b, e2.j AS c
        FROM edges e1
        JOIN edges e2 ON e2.i = e1.j
        JOIN edges e3 ON e3.i = e1.i AND e3.j = e2.j
    ),
    corner AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    ),
    tcnt AS (SELECT node, CAST(count(*) AS BIGINT) AS tri FROM corner GROUP BY node)
    SELECT d.node, d.deg,
           coalesce(t.tri, 0) AS tri,
           CAST(coalesce(t.tri, 0) * 2 * 1000000
                // (d.deg * (d.deg - 1)) AS BIGINT) AS lcc_ppm
    FROM deg d LEFT JOIN tcnt t ON t.node = d.node
    WHERE d.deg >= 2
    ORDER BY d.node
"""


def local_clustering(edges: DataFrame) -> DataFrame:
    """Core per-node clustering fold over a canonical ``(i, j)`` edge
    frame: degree, triangle membership count, and lcc in integer ppm
    for every node of degree >= 2. Factored from the registry query so
    planted-topology model tests (triangle -> 1e6 everywhere, star hub
    -> 0) drive the exact production joins.

    The edge frame is materialized once (localCheckpoint): it feeds
    five references — three wedge-join legs plus both bidir arms —
    and without the checkpoint Spark recomputes the upstream
    pairwise-cosine join per reference (the graph_triangle_count
    lesson, pipeline/graph2.py:150)."""
    edges = edges.select("i", "j").localCheckpoint(eager=True)
    bidir = edges.union(edges.select(F.col("j").alias("i"), F.col("i").alias("j")))
    deg = bidir.groupBy(F.col("i").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    e1 = edges.select(F.col("i").alias("a"), F.col("j").alias("b"))
    e2 = edges.select(F.col("i").alias("b2"), F.col("j").alias("c"))
    e3 = edges.select(F.col("i").alias("a3"), F.col("j").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    corner = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    tcnt = corner.groupBy("node").agg(F.count("*").cast("long").alias("tri"))
    return (
        deg.join(tcnt, "node", "left")
        .filter(F.col("deg") >= 2)
        .select(
            "node",
            "deg",
            F.coalesce(F.col("tri"), F.lit(0)).cast("long").alias("tri"),
            F.expr(
                "CAST(coalesce(tri, 0) * 2 * 1000000"
                " div (deg * (deg - 1)) AS BIGINT)"
            ).alias("lcc_ppm"),
        )
        .orderBy("node")
    )


@query("graph_local_clustering", oracle=_LCC_ORACLE, tags=("llm", "graph", "dedup"))
def graph_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient over the near-dup graph:
    degree, triangle membership, and lcc in exact ppm. High-lcc nodes
    sit inside boilerplate cliques (safe transitive dedup); low-lcc
    nodes bridge chains (false-merge risk — route to a stricter
    second pass, the graph_common_neighbors companion signal)."""
    return local_clustering(similarity_edges(spark, sf_dir, _ANALYSIS_RADIUS))


# ---------------------------------------------------------------------------
# BFS hop layers from each label's canonical root (its minimum node
# id — the smallest endpoint always appears in the i position of some
# canonical edge, so min(i) per label IS the minimum non-isolated
# node). Hop cap 3; min-hop semantics via UNION-distinct recursion in
# the oracle and frontier/visited anti-joins in Spark.
# ---------------------------------------------------------------------------

_BFS_HOPS = 3

_BFS_ORACLE = f"""
    WITH RECURSIVE {_ANALYSIS_EDGE_CTE},
    bidir AS (
        SELECT i, j, label FROM edges
        UNION ALL SELECT j, i, label FROM edges
    ),
    roots AS (SELECT label, min(i) AS node FROM edges GROUP BY label),
    reach AS (
        SELECT label, node, 0 AS hop FROM roots
        UNION
        SELECT r.label, b.j AS node, r.hop + 1 AS hop
        FROM reach r JOIN bidir b ON b.i = r.node AND b.label = r.label
        WHERE r.hop < {_BFS_HOPS}
    )
    SELECT label, node, CAST(min(hop) AS BIGINT) AS hop
    FROM reach
    GROUP BY label, node
    ORDER BY label, node
"""


def bfs_layers(edges: DataFrame, max_hops: int = _BFS_HOPS) -> DataFrame:
    """Core frontier-iterative BFS over a canonical ``(i, j, label)``
    edge frame, rooted at each label's minimum node: returns (label,
    node, hop) for every node within ``max_hops``. Factored from the
    registry query so chain/cycle model tests (a-b-c-d-e chain from a
    -> hops 0..3, the 5th node absent) drive the production rounds.

    Each round: frontier ⋈ bidir (one shuffle, bounded by frontier
    degree sum) -> distinct -> anti-join visited; visited is
    localCheckpointed per round to truncate the union lineage."""
    edges = edges.select("i", "j", "label").localCheckpoint(eager=True)
    bidir = edges.select(
        F.col("i").alias("src"), F.col("j").alias("dst"), "label"
    ).union(edges.select(F.col("j").alias("src"), F.col("i").alias("dst"), "label"))
    visited = (
        edges.groupBy("label")
        .agg(F.min("i").alias("node"))
        .select("label", "node", F.lit(0).cast("long").alias("hop"))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.select("label", F.col("node").alias("src"))
            .join(bidir, ["label", "src"])
            .select("label", F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("label", "node"), ["label", "node"], "left_anti")
            .withColumn("hop", F.lit(h).cast("long"))
            .localCheckpoint(eager=True)
        )
        visited = visited.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited.orderBy("label", "node")


@query("graph_bfs_layers", oracle=_BFS_ORACLE, tags=("llm", "graph"))
def graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BFS hop layers (<= 3) from each label's canonical root
    over the near-dup graph — the distance-truth surface for "within
    k hops" dedup policies, verified against a recursive-CTE oracle
    with min-hop semantics. Nodes outside hop 3 (or isolated) are
    absent by contract on both engines."""
    return bfs_layers(similarity_edges(spark, sf_dir, _ANALYSIS_RADIUS))
