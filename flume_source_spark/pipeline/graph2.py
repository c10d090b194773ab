"""Graph analytics wave 2: triangle counting over the near-dup graph.

``graph_triangle_count`` — per-label triangle census over the
embedding near-duplicate graph (the oracled edge set from
``sim_embedding_neardup``: label-blocked pairs with cosine ≥ 0.35,
i < j). Triangle density distinguishes CLIQUE-like duplicate
clusters (template boilerplate: every pair similar → many triangles)
from CHAIN-like drift (A~B~C but A≁C → zero triangles) — the signal
that decides whether transitive-closure dedup (dedup_cluster_cc) is
safe or will over-merge.

Algorithm: the standard two-join triangle enumeration on canonically
ordered edges (i<j<k): edges(i,j) ⋈ edges(j,k) ⋈ edges(i,k). With
every edge stored only in (min,max) orientation each triangle is
counted exactly once — no /6 correction, no direction explosion.

Scale: the joins shuffle on single vertex keys; skew follows the
max-degree vertex (a hub h with degree d contributes d² join-pairs).
The standard mitigation at 100 TB — degree-ordered orientation
(point each edge from lower- to higher-degree endpoint, bounding
out-degree at O(√m)) — matters when hubs exist; here the label
blocking already caps any vertex's degree at its block size, the
same bound that makes the edge source itself tractable. The oracle
mirrors the identical 3-way join in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.similarity import _dvec
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# Unit-normalize each vector ONCE (O(N) work), then the per-pair test
# is a single dot product — vs computing three dot-folds per pair
# (O(N²) work in the label blocks). Same IEEE ops in the same order on
# both engines (element ÷ sqrt(self-dot), then the left-fold dot), so
# edge membership stays bitwise-identical cross-engine.
def edge_cte(threshold: float = 0.35) -> str:
    """The DuckDB edge-set CTE at a given cosine radius — the oracle
    twin of :func:`similarity_edges`. 0.35 is the shared graph-query
    radius; 0.2 is the denser analysis radius (pipeline/graph6.py)."""
    return f"""
    e0 AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    e AS (SELECT vec_id, label,
                 list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS v
          FROM e0),
    edges AS (
        SELECT a.vec_id AS i, b.vec_id AS j, a.label
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) >= {threshold}
    )
"""


_EDGE_CTE = edge_cte(0.35)

_TRIANGLE_ORACLE = f"""
    WITH {_EDGE_CTE},
    tri AS (
        SELECT e1.label, e1.i AS a, e1.j AS b, e2.j AS c
        FROM edges e1
        JOIN edges e2 ON e2.i = e1.j
        JOIN edges e3 ON e3.i = e1.i AND e3.j = e2.j
    ),
    per_label AS (
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_triangles
        FROM tri GROUP BY label
    ),
    edge_counts AS (
        SELECT label, CAST(count(*) AS BIGINT) AS n_edges FROM edges GROUP BY label
    )
    SELECT ec.label, ec.n_edges,
           coalesce(pl.n_triangles, 0) AS n_triangles,
           CAST(round(coalesce(pl.n_triangles, 0) * 3.0 / greatest(ec.n_edges, 1), 4)
                AS DOUBLE) AS closure_ratio
    FROM edge_counts ec LEFT JOIN per_label pl ON ec.label = pl.label
    ORDER BY ec.label
"""


def similarity_edges_from(e: DataFrame, threshold: float = 0.35) -> DataFrame:
    """Label-blocked cosine ≥ ``threshold`` pair join over a
    ``(vec_id, label, v0)`` frame (v0 = double vector) — factored
    from :func:`similarity_edges` so planted-topology model tests
    (hub blocks, cliques, chains) drive the exact production
    pair-join code path. ``threshold`` defaults to the 0.35 dedup
    radius; graph3/graph6 call it at the 0.2 analysis radius (the
    non-degenerate wedge/triangle regime).

    Vectors are unit-normalized ONCE before the pair join (see the
    ``_EDGE_CTE`` comment): per pair the predicate is a single
    zip_with dot-fold instead of three, and the normalization ops
    mirror the oracle exactly so boundary membership matches."""
    from flume_source_spark.pipeline.similarity import _dot
    norm = F.sqrt(_dot(F.col("v0"), F.col("v0")))
    e = e.select(
        "vec_id", "label", F.transform("v0", lambda x: x / norm).alias("v")
    )
    a = e.select(F.col("vec_id").alias("i"), "label", F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("j"), F.col("label").alias("lb"), F.col("v").alias("vb"))
    return (
        a.join(b, (F.col("label") == F.col("lb")) & (F.col("i") < F.col("j")))
        .filter(_dot(F.col("va"), F.col("vb")) >= threshold)
        .select("i", "j", "label")
    )


def similarity_edges(
    spark: SparkSession, sf_dir: str, threshold: float = 0.35
) -> DataFrame:
    """The shared graph-query edge set over the embeddings table —
    the Spark twin of ``_EDGE_CTE``. Used by graph_triangle_count,
    graph_kcore, and graph_common_neighbors (pipeline/graph3.py).
    ``threshold`` defaults to the shared 0.35 radius; node-local
    statistics (pipeline/graph6.py) pass the documented denser 0.2
    analysis radius."""
    e = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", "label", _dvec("embedding").alias("v0")
    )
    return similarity_edges_from(e, threshold)


def triangle_census(edges: DataFrame) -> DataFrame:
    """Per-label exactly-once triangle enumeration over a canonically
    ordered ``(i, j, label)`` edge frame — factored from the registry
    query so planted-topology model tests (hub/star vs clique blocks)
    pin the census against brute force.

    Round-13 re-shape (guide §2.5, VERDICT r12 item 3): wedges are
    enumerated under DEGREE-ORDERED orientation — each edge points
    from its lower-(degree, id) endpoint to the higher one, and wedges
    fan out only from a vertex's OUT-neighbors. Every triangle is
    still counted exactly once (from its (degree, id)-minimum vertex),
    but a hub of degree d now contributes out-degree² ≤ O(m) wedge
    pairs instead of the id-orientation's ~d²/4: total wedge work
    drops from Σd² toward m^1.5 on skewed degree distributions.
    Measured on the planted mid-id-hub probe
    (scripts/scale_probe_r13.py): 21.7× fewer wedge rows at 1×
    (141.8k → 6.5k) and 171.7× at 8× spokes (8.69M → 50.6k) — wedge
    output now grows LINEARLY with hub degree (7.75× rows at 8×
    input vs 61× for id-orientation) — identical census both scales.
    At fixture scale the wall improves mildly too (sf0.1 solo
    min-of-3: 4.31 s baseline → 3.75 s); the real win is the
    quadratic term this removes at 100 TB hub skew.
    The id-ordered (min, max) closing-edge join is unchanged, so the
    result (and the oracle's i<j<k SQL census) is identical; the
    planted-topology brute-force test pins that equivalence. Degrees
    come from one aggregate over the checkpointed edge frame; the
    oriented frame is NOT checkpointed — its two wedge-leg references
    recompute only a broadcast join of the checkpointed edges against
    the tiny degree table (measured cheaper than materializing)."""
    edges = edges.localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("i").alias("v"))
        .unionAll(edges.select(F.col("j").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    e = edges.join(
        deg.select(F.col("v").alias("i"), F.col("d").alias("di")), "i"
    ).join(deg.select(F.col("v").alias("j"), F.col("d").alias("dj")), "j")
    # i < j always holds, so ties in degree orient by id exactly like
    # the canonical form
    src_is_i = (F.col("di") < F.col("dj")) | (F.col("di") == F.col("dj"))
    oriented = e.select(
        F.when(src_is_i, F.col("i")).otherwise(F.col("j")).alias("src"),
        F.when(src_is_i, F.col("j")).otherwise(F.col("i")).alias("dst"),
        "label",
    )
    o1 = oriented.select("src", F.col("dst").alias("y"), "label")
    o2 = oriented.select(F.col("src").alias("src2"), F.col("dst").alias("z"))
    wedge = o1.join(o2, (F.col("src") == F.col("src2")) & (F.col("y") < F.col("z")))
    closing = edges.select(F.col("i").alias("y"), F.col("j").alias("z"))
    tri = wedge.join(closing, ["y", "z"])
    per_label = tri.groupBy("label").agg(F.count("*").cast("long").alias("n_triangles"))
    edge_counts = edges.groupBy("label").agg(F.count("*").cast("long").alias("n_edges"))
    return (
        edge_counts.join(per_label, "label", "left")
        .select(
            "label",
            "n_edges",
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias("n_triangles"),
            F.round(
                F.coalesce(F.col("n_triangles"), F.lit(0)) * 3.0
                / F.greatest(F.col("n_edges"), F.lit(1)),
                4,
            ).alias("closure_ratio"),
        )
        .orderBy("label")
    )


@query("graph_triangle_count", oracle=_TRIANGLE_ORACLE, tags=("llm", "graph", "dedup"))
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once triangle enumeration on canonically ordered
    near-dup edges; closure_ratio = 3·triangles/edges is the
    clique-vs-chain health signal for transitive dedup.

    The edge frame is materialized ONCE inside ``triangle_census``:
    the label-blocked pairwise-cosine join is the dominant cost and is
    referenced four times (three wedge-join legs + edge counts) —
    without the localCheckpoint the plan recomputes it per reference
    (measured 9.9 s → 6 s at sf0.1; normalized edges cut it further,
    see similarity_edges_from)."""
    return triangle_census(similarity_edges(spark, sf_dir))


def kcore(edges: DataFrame, k: int, max_rounds: int = 30) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop
    vertices with degree < k until fixpoint. Returns the surviving
    vertices with their final in-core degree.

    ``edges`` must be canonical undirected pairs (i < j, one row per
    edge). Each round is two shuffles (degree agg + semi-join filter
    of the edge list); the vertex set shrinks monotonically so the
    fixpoint check (a driver-side count comparison, one scalar per
    round — the same convergence-guard discipline as
    connected_components, graph.py:69) terminates in ≤ max_rounds or
    raises. At 100 TB the peel is the standard iterative-join shape;
    localCheckpoint would truncate lineage exactly as in CC.
    """
    cur = edges.select("i", "j").localCheckpoint(eager=True)
    prev_edges = cur.count()
    for _ in range(max_rounds):
        deg = (
            cur.select(F.col("i").alias("v"))
            .unionAll(cur.select(F.col("j").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("v")
        nxt = (
            cur.join(keep.withColumnRenamed("v", "i"), "i", "left_semi")
            .join(keep.withColumnRenamed("v", "j"), "j", "left_semi")
            .select("i", "j")
            .localCheckpoint(eager=True)
        )
        n = nxt.count()
        if n == prev_edges:
            cur = nxt
            break
        cur, prev_edges = nxt, n
    else:
        raise RuntimeError(f"k-core did not converge in {max_rounds} rounds")
    return (
        cur.select(F.col("i").alias("v"))
        .unionAll(cur.select(F.col("j").alias("v")))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("core_degree"))
    )


KCORE_ROUNDS = 6  # fixed unroll: the profile is "the first 6 peel rounds"


def _kcore_peel_oracle(k: int = 2, rounds: int = KCORE_ROUNDS) -> str:
    """Unrolled-CTE DuckDB twin of the peel profile: per round t,
    d{t} = degrees on the surviving edge set r{t-1}, k{t} = the
    keep-set, r{t} = edges with both endpoints kept. All counts are
    integer-exact, so the profile is driver-HASHABLE — the same
    scaled-integer-twin pattern as graph_pagerank_exact (graph4.py).
    Edge membership is bitwise cross-engine (see _EDGE_CTE).

    The per-round CTEs are AS MATERIALIZED: DuckDB inlines plain CTEs
    at every reference, and each round references the previous ~3×,
    so an un-materialized unroll re-expands the base scan ~3^rounds
    times (observed as a too-many-open-files parquet blowup)."""
    ctes = ["r0 AS MATERIALIZED (SELECT i, j FROM edges)"]
    selects = []
    for t in range(1, rounds + 1):
        p = t - 1
        ctes.append(
            f"""d{t} AS MATERIALIZED (
        SELECT v, count(*) AS deg
        FROM (SELECT i AS v FROM r{p} UNION ALL SELECT j AS v FROM r{p})
        GROUP BY v),
    k{t} AS MATERIALIZED (SELECT v FROM d{t} WHERE deg >= {k}),
    r{t} AS MATERIALIZED (SELECT i, j FROM r{p}
             WHERE i IN (SELECT v FROM k{t}) AND j IN (SELECT v FROM k{t}))"""
        )
        selects.append(
            f"""SELECT CAST({t} AS BIGINT) AS round,
           (SELECT CAST(count(*) AS BIGINT) FROM d{t} WHERE deg < {k}) AS removed_vertices,
           (SELECT CAST(count(*) AS BIGINT) FROM r{t}) AS remaining_edges"""
        )
    return (
        f"WITH {_EDGE_CTE},\n    "
        + ",\n    ".join(ctes)
        + "\n    "
        + "\n    UNION ALL\n    ".join(selects)
        + "\n    ORDER BY round"
    )


_KCORE_PEEL_ORACLE = _kcore_peel_oracle()


@query("graph_kcore", oracle=_KCORE_PEEL_ORACLE, tags=("llm", "graph", "iterative"))
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core peel PROFILE of the embedding near-dup graph: for each
    of the first ``KCORE_ROUNDS`` peel rounds, how many vertices fell
    below degree 2 and how many edges survive — non-empty whenever the
    graph has edges, and integer-exact, so it is hash-oracled with an
    unrolled CTE (the round-5 verdict's fix for the zero-signal
    rows-only row: at sf0.01 the 2-core itself is genuinely empty, so
    a 0-row result asserted nothing). The surviving core is the
    fixpoint tail of the profile (remaining_edges of the last round);
    ``kcore()`` itself is unchanged and stays pinned by the
    clique/chain/star model tests in tests/test_round4_ops.py.

    Scale: identical per-round shape to ``kcore()`` — two shuffles
    (degree agg + semi-join filter) on a monotonically shrinking edge
    set, localCheckpoint truncating lineage per round; the profile
    adds only two distributed scalar aggregates per round (bounded
    driver traffic, the CC-fixpoint discipline, graph.py:69)."""
    edges = similarity_edges(spark, sf_dir).select("i", "j")
    cur = edges.localCheckpoint(eager=True)
    rows = []
    t = 1
    while t <= KCORE_ROUNDS:
        deg = (
            cur.select(F.col("i").alias("v"))
            .unionAll(cur.select(F.col("j").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("deg"))
        )
        removed = deg.filter(F.col("deg") < 2).count()
        if removed == 0:
            # fixpoint: peeling removes nothing, so every remaining
            # round is provably (0, same edge count) — fill without
            # running jobs (identical result, 4 fewer jobs/round)
            n = cur.count()
            rows.extend((r, 0, n) for r in range(t, KCORE_ROUNDS + 1))
            break
        keep = deg.filter(F.col("deg") >= 2).select("v")
        cur = (
            cur.join(keep.withColumnRenamed("v", "i"), "i", "left_semi")
            .join(keep.withColumnRenamed("v", "j"), "j", "left_semi")
            .select("i", "j")
            .localCheckpoint(eager=True)
        )
        rows.append((t, removed, cur.count()))
        t += 1
    return spark.createDataFrame(
        rows, "round long, removed_vertices long, remaining_edges long"
    ).orderBy("round")
