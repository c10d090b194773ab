"""Graph wave 5: exact community-quality metrics (modularity).

``graph_modularity_exact`` — Newman modularity of a given node
partition over a similarity graph: the standard "are these communities
real?" health metric run after any clustering/dedup stage (are the
LSH/CC clusters denser than chance? do metadata partitions explain the
similarity structure?). Q = Σ_c [ e_c/m − (d_c/2m)² ] where e_c =
internal edges of community c, d_c = degree mass of c, m = total
edges.

Graph + partition choice: the SPATIAL proximity graph from
operators/geo.py (grid-blocked integer squared-distance pairs — edge
membership is pure integer arithmetic, so the edge set is bitwise
cross-engine, unlike the float-cosine near-dup graph) partitioned by
the customer's nation. Coordinates are key-derived, so nations should
NOT cluster spatially (Q ≈ 0) — the value is the exactness pin of the
metric machinery, and a planted-communities unit test covers the
Q-large case.

Exactness: per community the contribution is emitted as an exact
BIGINT rational — contrib_num = 4·m·e_c − d_c², over q_den = 4·m² —
NO division at all, because contrib_num is frequently NEGATIVE and
Spark's integer DIV truncates toward zero while DuckDB's ``//`` floors
toward −∞ (the divergence the PCA twin documents); Q itself is
Σ contrib_num / q_den, recoverable exactly by any consumer.

Exactness BOUND (the aggregates5 documented-contract discipline):
q_den = 4m² and the contrib_num terms (4·m·e_c, d_c² ≤ 4m²) cross
int64 once m exceeds ~1.5×10⁹ edges PER MODULARITY RUN — past that,
Spark (non-ANSI) wraps silently while DuckDB raises, so the twins
would diverge silently. At 100 TB, run the metric per partition/shard
(modularity is defined per graph; sharded graphs get per-shard Q) or
widen the two rational columns to DECIMAL digit strings (the
agg_moment_sums_exact serialization pattern) — the bound is the
documented contract of the BIGINT output schema, not a surprise.
Conductance's cut/vol columns are ≤ 2m — linear, no such bound.

Scale: edges come from the bounded 3×3 grid equi-join (geo module
scale notes); community tagging is two joins against the node→nation
map (broadcast at fixture scale, hash join on node id at 100 TB);
degrees and internal-edge counts are map-side-combinable aggregates;
m is ONE bounded driver scalar (the same fixpoint-scalar pattern as
kcore/pagerank). Nothing is quadratic in nodes or communities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.operators.geo import _COORDS_SQL, _points, grid_pairs
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# The geo module's default RADIUS (100 cd) yields an EMPTY pair set on
# the key-derived fixture (geo_grid_join's driver rows are 0-row
# greens) — fine for pinning the join machinery, zero-signal for
# community accounting. The graph family therefore uses its own
# radius. 500 cd is the measured sweet spot on the lattice-structured
# key-derived coordinates (distances are quantized, so edge counts
# jump in steps): 101 edges at sf0.001, ~1.4k at sf0.01 (mean degree
# ~1.9, LPA moves ~1.4k nodes in round 1), ~205k at sf0.1 — vs ZERO
# everywhere below 500 and 2.3× the sf0.1 pair work at 800.
_GRAPH_RADIUS = 500
_GR2 = _GRAPH_RADIUS * _GRAPH_RADIUS

# The pts/nat/edges proximity-graph block shared by every oracle in
# this module — ONE definition so a radius or membership change cannot
# desynchronize the three queries that pin against the same graph
# (review finding: this block was previously pasted verbatim three
# times, ~130 lines apart).
_GRAPH_CTE = f"""pts AS ({_COORDS_SQL}),
    nat AS (SELECT c_custkey AS id, CAST(c_nationkey AS BIGINT) AS community FROM customer),
    edges AS (
        SELECT a.id AS i, b.id AS j
        FROM pts a JOIN pts b ON a.id < b.id
        WHERE (a.lat_cd - b.lat_cd) * (a.lat_cd - b.lat_cd)
            + (a.lon_cd - b.lon_cd) * (a.lon_cd - b.lon_cd) <= {_GR2}
    )"""

# Independent quadratic-pair formulation of the edge set (the same
# cross-check shape geo_grid_join's oracle uses), then the modularity
# accounting in exact BIGINT.
# The m/degree/internal-edge accounting shared by the modularity and
# conductance oracles (one definition, two SELECT heads).
_PROFILE_CTES = """m AS (SELECT count(*) AS m FROM edges),
    deg AS (
        SELECT id, count(*) AS deg
        FROM (SELECT i AS id FROM edges UNION ALL SELECT j AS id FROM edges)
        GROUP BY id
    ),
    degc AS (
        SELECT n.community, CAST(sum(d.deg) AS BIGINT) AS degree_sum
        FROM deg d JOIN nat n ON d.id = n.id
        GROUP BY n.community
    ),
    internal AS (
        SELECT ni.community, CAST(count(*) AS BIGINT) AS internal_edges
        FROM edges e
        JOIN nat ni ON e.i = ni.id
        JOIN nat nj ON e.j = nj.id
        WHERE ni.community = nj.community
        GROUP BY ni.community
    ),
    communities AS (SELECT DISTINCT community FROM nat)"""

_MODULARITY_ORACLE = f"""
    WITH {_GRAPH_CTE},
    {_PROFILE_CTES}
    SELECT c.community,
           coalesce(i.internal_edges, 0) AS internal_edges,
           coalesce(d.degree_sum, 0) AS degree_sum,
           CAST(4 * m.m * coalesce(i.internal_edges, 0)
                - coalesce(d.degree_sum, 0) * coalesce(d.degree_sum, 0)
                AS BIGINT) AS contrib_num,
           CAST(4 * m.m * m.m AS BIGINT) AS q_den
    FROM communities c
    CROSS JOIN m
    LEFT JOIN internal i USING (community)
    LEFT JOIN degc d USING (community)
    ORDER BY c.community
"""


def modularity_profile(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """Exact per-community modularity accounting over an (i < j) edge
    frame and an (id, community) membership frame: internal_edges,
    degree_sum, and the exact rational contribution
    (4·m·e_c − d_c²) / 4m² as BIGINT num/den columns. Factored from
    the registry query so planted-community unit tests (cliques →
    Q near max, random partition → Q ≈ 0) drive the production code."""
    return _community_profile(edges, membership)[0]


def _community_profile(edges: DataFrame, membership: DataFrame):
    """Shared body for modularity/conductance: returns (profile_df,
    m) so consumers needing 2m get the EXACT Python int, not a float
    roundtrip through q_den."""
    edges = edges.select("i", "j").localCheckpoint(eager=True)
    # membership feeds three branches (degree rollup, both endpoint
    # joins) + the community spine — materialize its tiny projection
    # once instead of re-scanning its source table per branch
    # (round-12 live-scan audit: 4x customer)
    membership = membership.localCheckpoint(eager=True)
    m = edges.count()
    deg = (
        edges.select(F.col("i").alias("id"))
        .unionAll(edges.select(F.col("j").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    degc = (
        deg.join(membership, "id")
        .groupBy("community")
        .agg(F.sum("deg").cast("long").alias("degree_sum"))
    )
    ni = membership.select(F.col("id").alias("i"), F.col("community").alias("ci"))
    nj = membership.select(F.col("id").alias("j"), F.col("community").alias("cj"))
    internal = (
        edges.join(ni, "i")
        .join(nj, "j")
        .filter(F.col("ci") == F.col("cj"))
        .groupBy(F.col("ci").alias("community"))
        .agg(F.count("*").cast("long").alias("internal_edges"))
    )
    return (
        membership.select("community")
        .distinct()
        .join(internal, "community", "left")
        .join(degc, "community", "left")
        .select(
            "community",
            F.coalesce(F.col("internal_edges"), F.lit(0)).cast("long").alias("internal_edges"),
            F.coalesce(F.col("degree_sum"), F.lit(0)).cast("long").alias("degree_sum"),
            (
                4 * F.lit(m) * F.coalesce(F.col("internal_edges"), F.lit(0))
                - F.coalesce(F.col("degree_sum"), F.lit(0))
                * F.coalesce(F.col("degree_sum"), F.lit(0))
            ).cast("long").alias("contrib_num"),
            F.lit(4 * m * m).cast("long").alias("q_den"),
        )
        .orderBy("community")
    ), m


@query("graph_modularity_exact", oracle=_MODULARITY_ORACLE, tags=("graph", "quality", "exact-twin"))
def graph_modularity_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the nation partition over the spatial
    proximity graph, emitted as exact BIGINT rationals per community
    (no division — see module docstring for the trunc-vs-floor-div
    trap this sidesteps). Q = Σ contrib_num / q_den."""
    pts = _points(spark, sf_dir)
    edges = grid_pairs(pts, _GRAPH_RADIUS)
    nat = load_tables(spark, sf_dir)["customer"].select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").cast("long").alias("community"),
    )
    return modularity_profile(edges, nat)


# ---------------------------------------------------------------------------
# Conductance — the complementary community-quality metric: how leaky
# is each community's boundary? φ_c = cut_c / min(vol_c, 2m − vol_c).
# It derives from the shared community profile — every edge endpoint
# incident to c is either one of 2·e_c internal endpoints or one cut
# endpoint, so cut_c = d_c − 2·e_c — so it costs no joins or scans
# beyond the profile itself. Emitted as exact BIGINT num/den (phi_num
# = cut_c, phi_den = min(vol, 2m − vol)) for the same division-free
# cross-engine reason as modularity; 2m is carried as the profile's
# exact integer edge count (not sqrt(q_den) — see conductance_profile).
# ---------------------------------------------------------------------------

_CONDUCTANCE_ORACLE = f"""
    WITH {_GRAPH_CTE},
    {_PROFILE_CTES}
    SELECT c.community,
           CAST(coalesce(d.degree_sum, 0) - 2 * coalesce(i.internal_edges, 0) AS BIGINT) AS cut_edges,
           coalesce(d.degree_sum, 0) AS volume,
           CAST(coalesce(d.degree_sum, 0) - 2 * coalesce(i.internal_edges, 0) AS BIGINT) AS phi_num,
           CAST(least(coalesce(d.degree_sum, 0),
                      2 * m.m - coalesce(d.degree_sum, 0)) AS BIGINT) AS phi_den
    FROM communities c
    CROSS JOIN m
    LEFT JOIN internal i USING (community)
    LEFT JOIN degc d USING (community)
    ORDER BY c.community
"""


def conductance_profile(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """Per-community conductance from the factored profile: cut_c =
    d_c − 2·e_c, φ_c = phi_num/phi_den with 2m carried as an EXACT
    Python-int literal from the profile's own edge count — never
    recovered via float sqrt(q_den), which would silently break the
    exact-BIGINT contract once 4m² exceeds 2⁵³ (m ≳ 4.7·10⁷ edges,
    within this module's own density² projections)."""
    prof, m = _community_profile(edges, membership)
    cut = (F.col("degree_sum") - 2 * F.col("internal_edges")).cast("long")
    return prof.select(
        "community",
        cut.alias("cut_edges"),
        F.col("degree_sum").alias("volume"),
        cut.alias("phi_num"),
        F.least(F.col("degree_sum"), (F.lit(2 * m) - F.col("degree_sum")).cast("long"))
        .cast("long")
        .alias("phi_den"),
    ).orderBy("community")


@query("graph_conductance_exact", oracle=_CONDUCTANCE_ORACLE, tags=("graph", "quality", "exact-twin"))
def graph_conductance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community conductance over the spatial proximity graph —
    cut/volume/φ as exact BIGINT rationals, 2m exact (see
    conductance_profile)."""
    pts = _points(spark, sf_dir)
    edges = grid_pairs(pts, _GRAPH_RADIUS)
    nat = load_tables(spark, sf_dir)["customer"].select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").cast("long").alias("community"),
    )
    return conductance_profile(edges, nat)


# ---------------------------------------------------------------------------
# Label propagation, one synchronous round — the community-detection
# step the quality metrics above exist to evaluate: every node adopts
# the most frequent community among its neighbors (deterministic ties:
# highest vote count, then LOWEST community id; isolated nodes keep
# their label). One LPA round is a pure join+agg+argmax — exactly the
# per-round shape of the kcore peel and pagerank twins — so it is
# driver-hashable, and its effect is MEASURABLE: the planted test runs
# modularity_profile before and after a round on a noisy planted
# partition and asserts Q does not decrease.
#
# Scale: expand edges to directed form (2m rows), join membership on
# the neighbor endpoint (hash join on node id), count votes per
# (node, label) with map-side combine, one row_number argmax window
# per node. Iterating = repeating this plan on the updated membership
# (localCheckpoint per round, the kcore pattern).
# ---------------------------------------------------------------------------

_LPA_ORACLE = f"""
    WITH {_GRAPH_CTE},
    directed AS (SELECT i AS v, j AS u FROM edges UNION ALL SELECT j AS v, i AS u FROM edges),
    votes AS (
        SELECT d.v, n.community AS cand, CAST(count(*) AS BIGINT) AS votes
        FROM directed d JOIN nat n ON d.u = n.id
        GROUP BY d.v, n.community
    ),
    best AS (
        SELECT v, cand, votes,
               row_number() OVER (PARTITION BY v ORDER BY votes DESC, cand) AS rn
        FROM votes
    )
    SELECT n.id, n.community AS old_community,
           coalesce(b.cand, n.community) AS new_community,
           coalesce(b.votes, 0) AS votes,
           coalesce(b.cand, n.community) <> n.community AS changed
    FROM nat n LEFT JOIN best b ON b.v = n.id AND b.rn = 1
    ORDER BY n.id
"""


def lpa_round(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """One synchronous label-propagation round over an (i < j) edge
    frame and an (id, community) membership frame. Deterministic:
    most neighbor votes, ties to the lowest community id; nodes with
    no neighbors keep their label. Factored for planted-topology
    tests and for iterating (feed new_community back in)."""
    from pyspark.sql import Window

    directed = edges.select(F.col("i").alias("v"), F.col("j").alias("u")).unionAll(
        edges.select(F.col("j").alias("v"), F.col("i").alias("u"))
    )
    nbr = membership.select(F.col("id").alias("u"), F.col("community").alias("cand"))
    votes = directed.join(nbr, "u").groupBy("v", "cand").agg(
        F.count("*").cast("long").alias("votes")
    )
    w = Window.partitionBy("v").orderBy(F.col("votes").desc(), F.col("cand"))
    best = votes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        membership.join(best, membership.id == best.v, "left")
        .select(
            "id",
            F.col("community").alias("old_community"),
            F.coalesce(F.col("cand"), F.col("community")).alias("new_community"),
            F.coalesce(F.col("votes"), F.lit(0)).cast("long").alias("votes"),
            (F.coalesce(F.col("cand"), F.col("community")) != F.col("community")).alias("changed"),
        )
        .orderBy("id")
    )


@query("graph_label_propagation_round", oracle=_LPA_ORACLE, tags=("graph", "community", "exact-twin"))
def graph_label_propagation_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic LPA round over the spatial proximity graph,
    seeded with the nation partition: per node the plurality neighbor
    community (ties to lowest id), vote count, and a changed flag —
    the community-detection step whose outcome graph_modularity_exact
    and graph_conductance_exact evaluate."""
    pts = _points(spark, sf_dir)
    # one materialized pass each for the proximity pair join and the
    # membership projection: lpa_round references edges twice (the
    # direction union) and membership twice (votes + final join) —
    # unmaterialized this plan re-scanned customer 6x (round-12 audit)
    edges = grid_pairs(pts, _GRAPH_RADIUS).select("i", "j").localCheckpoint(eager=True)
    nat = load_tables(spark, sf_dir)["customer"].select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").cast("long").alias("community"),
    ).localCheckpoint(eager=True)
    return lpa_round(edges, nat)


# ---------------------------------------------------------------------------
# LPA convergence profile — the multi-round companion: run R=4
# synchronous rounds from the nation seed and emit per-round
# (n_changed, n_communities). This is the operational signal an LPA
# deployment watches (has propagation stabilized? are communities
# collapsing?) and the iterative-convergence shape made hashable the
# same way graph_kcore's peel profile was: the oracle unrolls the
# rounds as MATERIALIZED CTEs; the Spark side localCheckpoints the
# membership between rounds so the lineage stays flat.
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 4


def _lpa_profile_oracle() -> str:
    head = f"""
    WITH {_GRAPH_CTE},
    directed AS MATERIALIZED (SELECT i AS v, j AS u FROM edges UNION ALL SELECT j AS v, i AS u FROM edges),
    m0 AS MATERIALIZED (SELECT id, community FROM nat)"""
    parts = [head]
    stats = []
    for r in range(1, _LPA_ROUNDS + 1):
        p = r - 1
        parts.append(f"""
    v{r} AS (
        SELECT d.v, m.community AS cand, count(*) AS votes
        FROM directed d JOIN m{p} m ON d.u = m.id
        GROUP BY d.v, m.community
    ),
    b{r} AS (
        SELECT v, cand FROM (
            SELECT v, cand, row_number() OVER (PARTITION BY v ORDER BY votes DESC, cand) AS rn
            FROM v{r}) WHERE rn = 1
    ),
    m{r} AS MATERIALIZED (
        SELECT m.id, coalesce(b.cand, m.community) AS community,
               coalesce(b.cand, m.community) <> m.community AS changed
        FROM m{p} m LEFT JOIN b{r} b ON b.v = m.id
    )""")
        stats.append(
            f"SELECT {r} AS round,"
            f" CAST(sum(CASE WHEN changed THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,"
            f" CAST(count(DISTINCT community) AS BIGINT) AS n_communities FROM m{r}"
        )
    return ",".join(parts).replace(",\n    WITH", "\n    WITH") + "\n" + "\nUNION ALL\n".join(stats) + "\nORDER BY round"


_LPA_PROFILE_ORACLE = _lpa_profile_oracle()


@query(
    "graph_lpa_convergence",
    oracle=_LPA_PROFILE_ORACLE,
    tags=("graph", "community", "iterative", "exact-twin"),
)
def graph_lpa_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four synchronous LPA rounds from the nation seed: per-round
    changed-node count and surviving-community count — the
    convergence profile, unrolled in the oracle exactly like the
    kcore peel profile. Membership is localCheckpointed per round so
    the iterative lineage stays flat (the kcore/pagerank pattern)."""
    pts = _points(spark, sf_dir)
    edges = grid_pairs(pts, _GRAPH_RADIUS).select("i", "j").localCheckpoint(eager=True)
    membership = load_tables(spark, sf_dir)["customer"].select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").cast("long").alias("community"),
    )
    stats = None
    for r in range(1, _LPA_ROUNDS + 1):
        out = lpa_round(edges, membership).localCheckpoint(eager=True)
        s = out.agg(
            F.lit(r).cast("int").alias("round"),
            F.sum(F.when(F.col("changed"), 1).otherwise(0)).cast("long").alias("n_changed"),
            F.countDistinct("new_community").cast("long").alias("n_communities"),
        )
        stats = s if stats is None else stats.unionAll(s)
        membership = out.select("id", F.col("new_community").alias("community"))
    return stats.orderBy("round")
