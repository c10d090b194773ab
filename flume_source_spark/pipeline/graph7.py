"""Graph wave 7 (round 12): weighted link prediction — the Resource
Allocation index (Zhou, Lü & Zhang, EPJ B 2009) and preferential
attachment, the two standard refinements of the plain
common-neighbors score already registered in pipeline/graph3.py.

Resource Allocation weights each shared neighbor v by 1/deg(v): a
low-degree shared neighbor is strong evidence (it "allocates" its
similarity budget to few nodes), a hub is weak evidence. On dedup
graphs this separates "both similar to the same rare paraphrase"
(strong — likely same content) from "both similar to boilerplate"
(weak). Preferential attachment deg(i)·deg(j) is the null-model
baseline the other scores are judged against.

Cross-engine exactness: RA's per-term weight is published in exact
floored integer micro-units — Σ_v (1,000,000 div deg(v)) — so the
score is pure BIGINT arithmetic on both engines (no float ln, unlike
Adamic-Adar whose 1/ln(deg) terms are libm-dependent; RA is the
predictor of that family with an exact integer form, and the 2009
paper reports it matches or beats AA on every tested network).
Per-term flooring, then summing, is order-independent — engine-safe.

Scale design: identical to graph_common_neighbors — the wedge join
(bidir ⋈ bidir on the middle vertex, Σ_v deg(v)² output bounded by
label blocking + the documented hub cap at 100 TB), one extra
broadcast-able equi-join of the middle vertex against the degree
table BEFORE the (i, j) collapse (the weight rides the wedge row;
the aggregate stays map-side-combinable), and the adjacency
exclusion as a left-anti join. Runs at the 0.2 analysis radius for
the same non-degeneracy reason as graph3 (1,652 scored pairs at
sf0.01 vs 1 at the 0.35 dedup radius).

Reference parity note: the reference engine (`CephFsSource.java`) has
no graph surface; this operator belongs to the declared [NS] engine
surface (SURVEY.md §2.2, graph/link-prediction family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.graph2 import edge_cte
from flume_source_spark.registry import query

_RA_RADIUS = 0.2

_RA_ORACLE = f"""
    WITH {edge_cte(_RA_RADIUS)},
    bidir AS (SELECT i, j FROM edges UNION ALL SELECT j, i FROM edges),
    deg AS (SELECT i AS node, CAST(count(*) AS BIGINT) AS deg FROM bidir GROUP BY i),
    wedge AS (
        SELECT a.i AS i, b.i AS j,
               CAST(count(*) AS BIGINT) AS cn,
               CAST(sum(1000000 // dm.deg) AS BIGINT) AS ra_micro
        FROM bidir a
        JOIN bidir b ON a.j = b.j AND a.i < b.i
        JOIN deg dm ON dm.node = a.j
        GROUP BY 1, 2),
    nonadj AS (
        SELECT w.i, w.j, w.cn, w.ra_micro FROM wedge w
        WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.i = w.i AND e.j = w.j))
    SELECT n.i, n.j, n.cn, n.ra_micro,
           CAST(di.deg * dj.deg AS BIGINT) AS pref_attach
    FROM nonadj n
    JOIN deg di ON di.node = n.i
    JOIN deg dj ON dj.node = n.j
    ORDER BY n.i, n.j
"""


def resource_allocation(edges: DataFrame) -> DataFrame:
    """Core weighted link prediction over an (i < j) edge DataFrame:
    for every non-adjacent pair with ≥ 1 shared neighbor, the
    common-neighbor count, the Resource Allocation score in exact
    floored micro-units (Σ_v 1e6 div deg(v) over shared neighbors v),
    and the preferential-attachment product. Factored so planted-
    topology model tests (a star whose leaves score via the hub, a
    path whose ends score via the middle) drive the production
    stages.

    The edge frame feeds five plan branches (two bidir arms, the
    wedge pair, the adjacency anti-join, the degree table) —
    checkpointed once so the upstream pair join runs a single pass
    (the rich_club lesson; the un-checkpointed 8× adversarial probe
    read 99 s mostly re-running the edge builder)."""
    edges = edges.localCheckpoint(eager=True)
    bidir = edges.select("i", "j").union(
        edges.select(F.col("j").alias("i"), F.col("i").alias("j"))
    )
    deg = bidir.groupBy(F.col("i").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    a = bidir.select(F.col("i").alias("wi"), F.col("j").alias("mid"))
    b = bidir.select(F.col("i").alias("wj"), F.col("j").alias("mid"))
    wedge = (
        a.join(b, "mid")
        .where(F.col("wi") < F.col("wj"))
        .join(deg.withColumnRenamed("node", "mid"), "mid")
        .groupBy(F.col("wi").alias("i"), F.col("wj").alias("j"))
        .agg(
            F.count("*").cast("long").alias("cn"),
            # per-term floor then sum: order-independent BIGINT
            # arithmetic, identical on both engines (no float ln —
            # see module docstring on RA vs Adamic-Adar)
            F.sum(F.expr("1000000 div deg")).cast("long").alias("ra_micro"),
        )
    )
    nonadj = wedge.join(edges.select("i", "j"), ["i", "j"], "left_anti")
    return (
        nonadj.join(
            deg.withColumnRenamed("node", "i").withColumnRenamed("deg", "deg_i"),
            "i",
        )
        .join(
            deg.withColumnRenamed("node", "j").withColumnRenamed("deg", "deg_j"),
            "j",
        )
        .select(
            "i",
            "j",
            "cn",
            "ra_micro",
            (F.col("deg_i") * F.col("deg_j")).cast("long").alias("pref_attach"),
        )
        .orderBy("i", "j")
    )


@query(
    "graph_resource_allocation",
    oracle=_RA_ORACLE,
    tags=("llm", "graph", "linkpred"),
)
def graph_resource_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-Allocation link prediction over the label-blocked
    embedding-similarity graph at the 0.2 analysis radius:
    non-adjacent pairs sharing neighbors, scored by Σ 1/deg(v) over
    shared neighbors in exact floored micro-units, alongside the
    common-neighbor count and the preferential-attachment null
    baseline — the hub-discounting refinement of
    ``graph_common_neighbors``."""
    from flume_source_spark.pipeline.graph2 import similarity_edges

    return resource_allocation(
        similarity_edges(spark, sf_dir, _RA_RADIUS).select("i", "j")
    )


_RICH_CLUB_KS = (1, 2, 4, 8)

_RICH_CLUB_ORACLE = f"""
    WITH {edge_cte(_RA_RADIUS)},
    bidir AS (SELECT i, j FROM edges UNION ALL SELECT j, i FROM edges),
    deg AS (SELECT i AS node, CAST(count(*) AS BIGINT) AS deg
            FROM bidir GROUP BY i),
    ks AS (SELECT unnest([{", ".join(str(k) for k in _RICH_CLUB_KS)}]) AS k),
    rich AS (
        SELECT k.k, d.node
        FROM ks k JOIN deg d ON d.deg > k.k
    ),
    nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_rich FROM rich GROUP BY k),
    ek AS (
        SELECT r1.k, CAST(count(*) AS BIGINT) AS e_rich
        FROM edges e
        JOIN rich r1 ON r1.node = e.i
        JOIN rich r2 ON r2.k = r1.k AND r2.node = e.j
        GROUP BY r1.k
    )
    SELECT n.k AS min_degree_excl,
           n.n_rich,
           CAST(coalesce(e.e_rich, 0) AS BIGINT) AS e_rich,
           CAST(CASE WHEN n.n_rich >= 2 THEN
                coalesce(e.e_rich, 0) * 2000000
                // (n.n_rich * (n.n_rich - 1)) END AS BIGINT) AS phi_ppm
    FROM nk n LEFT JOIN ek e ON e.k = n.k
    ORDER BY n.k
"""


def rich_club(edges: DataFrame, ks: tuple[int, ...] = _RICH_CLUB_KS) -> DataFrame:
    """Rich-club coefficient φ(k) = 2·E_k / (N_k·(N_k−1)) over an
    (i < j) edge frame: for each degree threshold k, the density of
    the subgraph induced by nodes with degree > k, in exact floored
    ppm (Zhou & Mondragón 2004 — "do the hubs stick together?").
    Factored so closed-form model tests (a clique of hubs plus
    pendant leaves → φ = 1e6 at every k below the hub degree; a star
    → N_k ≤ 1 past the leaves → NULL) drive the production stages.

    Scale: degree table (one aggregate), a ×|ks| literal fan-out of
    the rich node sets, and TWO membership equi-joins of the edge
    list against them — no wedge join, output |ks| rows. The edge
    frame feeds THREE consumers (degree, both membership joins), so
    it is checkpointed once — without this the upstream pair join
    re-ran per consumer (the embstats3 single-corpus-pass lesson; the
    8× adversarial probe ran past 8 minutes on the duplicated
    subtrees)."""
    edges = edges.localCheckpoint(eager=True)
    bidir = edges.select("i", "j").union(
        edges.select(F.col("j").alias("i"), F.col("i").alias("j"))
    )
    deg = bidir.groupBy(F.col("i").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    ks_df = None
    ks_expr = ", ".join(str(k) for k in ks)
    rich = (
        deg.select(
            "node", "deg", F.explode(F.expr(f"array({ks_expr})")).alias("k")
        )
        .filter(F.col("deg") > F.col("k"))
        .select("k", "node")
    )
    nk = rich.groupBy("k").agg(F.count("*").cast("long").alias("n_rich"))
    ek = (
        edges.join(rich.withColumnRenamed("node", "i"), "i")
        .join(rich.withColumnRenamed("node", "j"), ["j", "k"])
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("e_rich"))
    )
    return (
        nk.join(ek, "k", "left")
        .select(
            F.col("k").cast("long").alias("min_degree_excl"),
            "n_rich",
            F.coalesce(F.col("e_rich"), F.lit(0)).cast("long").alias("e_rich"),
            F.expr(
                "CAST(CASE WHEN n_rich >= 2 THEN"
                " coalesce(e_rich, 0) * 2000000"
                " div (n_rich * (n_rich - 1)) END AS BIGINT)"
            ).alias("phi_ppm"),
        )
        .orderBy("min_degree_excl")
    )


@query(
    "graph_rich_club",
    oracle=_RICH_CLUB_ORACLE,
    tags=("llm", "graph", "stats"),
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficients of the similarity graph at degree
    thresholds {1, 2, 4, 8}: the induced-subgraph density of
    progressively hubbier node sets in exact floored ppm — rising
    φ(k) means near-duplicate hubs cluster into dense cores (the
    shape LSH bucket caps exist to contain)."""
    from flume_source_spark.pipeline.graph2 import similarity_edges

    return rich_club(
        similarity_edges(spark, sf_dir, _RA_RADIUS).select("i", "j")
    )
