"""Graph operators for the dedup pipeline: connected components over
the near-duplicate pair graph.

Pair generation (``dedup_ngram_jaccard`` / ``dedup_minhash_lsh``) only
says "i looks like j". A real dedup pass must then pick ONE keeper per
*transitive* cluster — if A~B and B~C, then {A,B,C} is one group even
when A and C never paired. That closure is a connected-components
problem on the pair graph.

Scale design: min-label propagation — every node repeatedly adopts the
smallest label reachable over one edge — implemented as a driver-side
loop of pure DataFrame joins/aggregations (the canonical Spark
iterative pattern, same shape GraphX/GraphFrames use underneath).

- Each round is one shuffle-join (edges ⋈ labels on the edge source)
  plus one min-aggregation; converges in O(graph diameter) rounds.
  Near-dup clusters are shallow (dups of a common source), so the
  diameter is small — typically 2-4 rounds on real corpora.
- Lineage is truncated per round with ``localCheckpoint`` (on a
  cluster: ``checkpoint`` to reliable storage); without it the plan
  doubles every round and the job dies on plan-compile time long
  before data size matters.
- Convergence is detected from ``sum(label)``: labels only ever
  decrease (monotone min), so an unchanged sum is a proof of
  fixpoint — one cheap scalar aggregate per round instead of an
  old⋈new anti-join.
- At 100 TB, the refinement for skewed graphs is alternating
  large-star / small-star (Kiveris et al., "Connected Components in
  MapReduce and Beyond", SoCC'14) — IMPLEMENTED here as
  ``connected_components(..., algorithm="star")`` — which bounds
  per-round skew when one component is huge; plain min-propagation
  (the default) keeps per-round cost Θ(|E|) which is right for dedup
  graphs whose components are small by construction (MAX_BUCKET caps
  upstream candidate fan-out). Use ``graph_degree_hist`` to decide:
  a heavy tail there means a giant component is forming → star.

Oracle: DuckDB ``WITH RECURSIVE`` transitive reachability with the
same edge predicate, min(root) per node — an independent fixpoint
formulation of the same closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.dedup import dedup_minhash_lsh, dedup_ngram_jaccard
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

MAX_CC_ROUNDS = 50


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_rounds: int = MAX_CC_ROUNDS,
    checkpoint_dir: str | None = None,
    algorithm: str = "propagation",
) -> DataFrame:
    """Connected components over an undirected edge list.

    ``nodes``: one column ``id`` (long). ``edges``: columns ``src``,
    ``dst`` (each undirected edge listed once, either direction).
    Returns (id, component_id) where component_id = min id reachable.

    ``algorithm``:
    - ``"propagation"`` (default): min-label propagation — converges
      in O(diameter) rounds, per-round cost Θ(|E|). Right for dedup
      graphs (shallow components by construction), but a giant
      skewed component concentrates every round's aggregation on the
      hot min-label key.
    - ``"star"``: alternating large-star/small-star (Kiveris et al.,
      "Connected Components in MapReduce and Beyond", SoCC'14) —
      O(log²ⁿ) rounds and, crucially, per-round work is redistributed
      as the graph contracts toward stars, so one huge component does
      not pin a single reduce key. The right choice when
      ``graph_degree_hist`` shows a heavy tail. See
      :func:`_connected_components_star`.

    ``checkpoint_dir``: when set, lineage is truncated with reliable
    ``checkpoint`` into that directory (survives executor loss — what
    a real cluster run wants); default uses ``localCheckpoint`` which
    is fine on local[*] / short jobs but ties the cached rounds to
    executor lifetime.

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_rounds`` — returning silently would hand the caller
    plausible-looking but WRONG component ids (a >max_rounds-hop
    chain split into several "components"). Each round is one cheap
    join+agg, so raising (caller retries with a larger bound) beats
    corrupting a dedup pass.
    """
    if algorithm == "star":
        return _connected_components_star(nodes, edges, max_rounds, checkpoint_dir)
    if algorithm != "propagation":
        raise ValueError(f"unknown algorithm: {algorithm!r} (propagation|star)")
    if checkpoint_dir is not None:
        nodes.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint() if checkpoint_dir is not None else df.localCheckpoint()

    bidir = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    bidir = _ckpt(bidir)
    labels = _ckpt(nodes.select(F.col("id"), F.col("id").alias("label")))
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_rounds):
        msgs = (
            bidir.join(labels, bidir.src == labels.id)
            .select(F.col("dst").alias("id"), "label")
        )
        labels = _ckpt(
            labels.select("id", "label")
            .union(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:  # labels are monotone ⇒ fixpoint proof
            return labels.select("id", F.col("label").alias("component_id"))
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_rounds} rounds "
        f"(graph diameter exceeds bound); rerun with a larger max_rounds"
    )


def _connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    max_rounds: int = MAX_CC_ROUNDS,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Alternating large-star/small-star CC (Kiveris et al. SoCC'14).

    Per round, every node u with neighborhood N(u) and
    m(u) = min(N(u) ∪ {u}):

    - **large-star** rewires u's strictly-larger neighbors to m(u):
      E' = ∪_u {(v, m(u)) : v ∈ N(u), v > u}
    - **small-star** orients edges toward the smaller endpoint, then
      rewires each node's ≤-neighbors (and itself) to the minimum:
      E' = ∪_u {(v, m(u)) : v ∈ N⁻(u) ∪ {u}, v ≠ m(u)}

    Both preserve connectivity; the composition strictly contracts
    until every component is a star centered on its minimum — at which
    point the edge set is a fixpoint of the round. Why this beats
    min-propagation at scale: propagation's per-round aggregation
    funnels a giant component's whole frontier into ONE reduce key
    (its min label), while star rounds spread rewiring across every
    node's own neighborhood group — no single hot key, O(log²ⁿ)
    rounds regardless of diameter.

    Fixpoint detection: the canonical (hi→lo) edge set is compared
    round-over-round by (count, xor of per-edge xxhash64) — equal
    pair ⇒ same set with P(collision) ≈ 2⁻⁶⁴ (and the paper
    guarantees the fixpoint exists, so the loop terminates). Isolated
    nodes never enter the edge set and resolve to themselves in the
    final left join.
    """
    if checkpoint_dir is not None:
        nodes.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint() if checkpoint_dir is not None else df.localCheckpoint()

    # canonical undirected representation: (hi, lo), no self-loops
    e = (
        edges.select(
            F.greatest("src", "dst").alias("hi"), F.least("src", "dst").alias("lo")
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )
    e = _ckpt(e)

    def _sig(df: DataFrame) -> tuple[int, int]:
        row = df.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("hi", "lo")), F.lit(0)).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = _sig(e)
    for _ in range(max_rounds):
        # -- large-star: full neighborhoods (both directions)
        bidir = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
            e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        mins = bidir.groupBy("u").agg(F.min("v").alias("mn"))
        ls = (
            bidir.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            # m(u) = min(mn, u) ≤ u < v ⇒ output is already (hi, lo)
            .select(F.col("v").alias("hi"), F.least("mn", "u").alias("lo"))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
        )
        # -- small-star: edges already oriented hi → lo; m(u) = min(N⁻(u))
        smins = ls.groupBy("hi").agg(F.min("lo").alias("m"))
        ss = (
            ls.join(smins, "hi")
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .union(smins.select(F.col("hi"), F.col("m").alias("lo")))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
        )
        e = _ckpt(ss)
        cur = _sig(e)
        if cur == prev:
            labels = nodes.join(e, nodes.id == e.hi, "left").select(
                F.col("id"), F.coalesce("lo", "id").alias("component_id")
            )
            return labels
        prev = cur
    raise RuntimeError(
        f"connected_components(star): no fixpoint after {max_rounds} rounds; "
        f"rerun with a larger max_rounds"
    )


# Shared recursive-closure CTE prefix: exact Jaccard≥0.5 pair graph →
# transitive components. Reused verbatim by every oracle that needs
# the cluster assignment (dedup_cluster_cc* here, dedup_keep_best in
# pipeline/canonical.py) so all of them pin against the SAME
# independently-formulated closure.
_CC_CTE = """
    WITH RECURSIVE
    sh AS (
        SELECT doc_id,
               unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
                      for i in generate_series(1, len(toks)-2)])) AS shingle
        FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT i, j FROM inter
              JOIN sz sa ON i = sa.doc_id
              JOIN sz sb ON j = sb.doc_id
              WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5),
    bidir AS (SELECT i, j FROM pairs UNION SELECT j AS i, i AS j FROM pairs),
    reach(node, root) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT b.j, r.root FROM reach r JOIN bidir b ON b.i = r.node
    ),
    comp AS (SELECT node AS doc_id, min(root) AS component_id FROM reach GROUP BY node)
"""

_CC_ORACLE = _CC_CTE + """
    SELECT c.doc_id, c.component_id,
           s.component_size,
           c.doc_id = c.component_id AS is_keeper
    FROM comp c
    JOIN (SELECT component_id, count(*) AS component_size
          FROM comp GROUP BY component_id) s USING (component_id)
    ORDER BY c.doc_id
"""


def _cc_clusters(spark: SparkSession, sf_dir: str, pairs: DataFrame) -> DataFrame:
    """Shared closure body: pairs (i, j) → (doc_id, component_id,
    component_size, is_keeper). The CC loop is indifferent to where
    edges came from."""
    docs = load_tables(spark, sf_dir)["documents"]
    nodes = docs.select(F.col("doc_id").alias("id"))
    edges = pairs.select(F.col("i").alias("src"), F.col("j").alias("dst"))
    comp = connected_components(nodes, edges)
    sizes = comp.groupBy("component_id").agg(F.count("*").alias("component_size"))
    return (
        comp.join(sizes, "component_id")
        .select(
            F.col("id").alias("doc_id"),
            "component_id",
            "component_size",
            (F.col("id") == F.col("component_id")).alias("is_keeper"),
        )
        .orderBy("doc_id")
    )


@query("dedup_cluster_cc", oracle=_CC_ORACLE, tags=("llm", "dedup", "graph"))
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup clusters: connected components over the exact
    near-dup pair graph (Jaccard ≥ 0.5), keeper = min doc_id per
    component. The step after pair generation in every dedup pipeline:
    A~B, B~C ⇒ one cluster {A,B,C}, one keeper, two drops.

    Edges here come from the EXACT pair join (the Σ|docs(s)|² shingle
    self-join — the declared oracle path, not the scale path), so the
    recursive-CTE oracle is closure over the identical edge set. This
    variant is CORRECTNESS-ONLY: the benched/production variant is
    ``dedup_cluster_cc_lsh`` below, whose banded+capped edge source is
    the one that survives 100 TB."""
    return _cc_clusters(spark, sf_dir, dedup_ngram_jaccard(spark, sf_dir))


@query("dedup_cluster_cc_star", oracle=_CC_ORACLE, tags=("llm", "dedup", "graph", "star"))
def dedup_cluster_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup clusters computed with the large-star/small-star
    algorithm (``connected_components(..., algorithm='star')``) over
    the exact near-dup pair graph — same recursive-CTE oracle as
    ``dedup_cluster_cc``, so the driver hash-check pins the star
    implementation against an independent closure formulation on real
    data (the hand-built-graph property tests pin it against
    min-propagation). Star is the skew-robust choice once
    ``graph_degree_hist`` shows a heavy tail; equality here is the
    evidence the swap is safe."""
    docs = load_tables(spark, sf_dir)["documents"]
    nodes = docs.select(F.col("doc_id").alias("id"))
    edges = dedup_ngram_jaccard(spark, sf_dir).select(
        F.col("i").alias("src"), F.col("j").alias("dst")
    )
    comp = connected_components(nodes, edges, algorithm="star")
    sizes = comp.groupBy("component_id").agg(F.count("*").alias("component_size"))
    return (
        comp.join(sizes, "component_id")
        .select(
            F.col("id").alias("doc_id"),
            "component_id",
            "component_size",
            (F.col("id") == F.col("component_id")).alias("is_keeper"),
        )
        .orderBy("doc_id")
    )


@query("dedup_cluster_cc_lsh", oracle=_CC_ORACLE, tags=("llm", "dedup", "graph", "lsh"))
def dedup_cluster_cc_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup clusters over the MinHash-LSH near-dup pair
    graph — the production/scale variant of ``dedup_cluster_cc``:
    candidate generation is banded + hot-bucket-capped
    (Σ_bucket |bucket|², bucket ≤ MAX_BUCKET) instead of the exact
    shingle self-join's data-dependent Σ|docs(s)|². On this corpus the
    LSH pair set equals the exact pair set with P(miss) < 1e-10 (see
    ``pipeline/dedup.py`` module docstring), so the SAME recursive-CTE
    oracle (closure over exact edges) hash-checks this query —
    that equivalence is the point: swapping the edge source changes
    the cost model, not the answer."""
    return _cc_clusters(spark, sf_dir, dedup_minhash_lsh(spark, sf_dir))


_DEGREE_ORACLE = """
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
                      for i in generate_series(1, len(toks)-2)])) AS shingle
        FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT i, j FROM inter
              JOIN sz sa ON i = sa.doc_id
              JOIN sz sb ON j = sb.doc_id
              WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5),
    ends AS (SELECT i AS doc_id FROM pairs UNION ALL SELECT j FROM pairs),
    deg AS (SELECT d.doc_id, CAST(count(e.doc_id) AS BIGINT) AS degree
            FROM documents d LEFT JOIN ends e USING (doc_id) GROUP BY d.doc_id)
    SELECT degree, CAST(count(*) AS BIGINT) AS n_docs
    FROM deg GROUP BY degree ORDER BY degree
"""


@query("graph_degree_hist", oracle=_DEGREE_ORACLE, tags=("llm", "dedup", "graph"))
def graph_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the near-dup pair graph (including
    degree-0 isolates via a left join against the full corpus) — the
    dedup-graph health metric: a heavy tail here is the early warning
    that a boilerplate template is about to create a giant component —
    and the signal to run the closure with
    ``connected_components(..., algorithm="star")`` (implemented
    above) instead of plain propagation. One explode + one count per endpoint +
    one histogram aggregate; the left join keeps isolates without
    shuffling document text."""
    docs = load_tables(spark, sf_dir)["documents"]
    # materialize the shingle-join pair list ONCE: both endpoint
    # projections re-expanded the whole Jaccard pipeline (9 corpus
    # re-scans, round-12 live-scan audit); the pair frame is tiny
    pairs = dedup_ngram_jaccard(spark, sf_dir).localCheckpoint(eager=True)
    ends = pairs.select(F.col("i").alias("doc_id")).unionAll(pairs.select(F.col("j").alias("doc_id")))
    deg = (
        docs.select("doc_id")
        .join(ends.groupBy("doc_id").agg(F.count("*").alias("degree")), "doc_id", "left")
        .select("doc_id", F.coalesce("degree", F.lit(0)).cast("long").alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count("*").alias("n_docs")).orderBy("degree")


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 10,
    checkpoint_dir: str | None = None,
    tol: float | None = None,
    residuals: list[float] | None = None,
) -> DataFrame:
    """Power-iteration PageRank over an undirected edge list (each
    edge contributes both directions), the second iterative-join
    pattern next to :func:`connected_components`.

    Each round: rank/degree contribution per directed edge → sum per
    destination → damp + teleport. Dangling nodes (degree 0) keep the
    teleport mass only. Same scale mechanics as CC: one shuffle join +
    one aggregation per round, lineage truncated per round
    (``localCheckpoint``, or reliable ``checkpoint`` when
    ``checkpoint_dir`` is given). Mass accounting: under the
    rank = (1-d) + d·inflow formulation total mass N is conserved only
    on dangling-free graphs — a dangling/isolated node forwards no
    mass and retains just the teleport term (1-d), so graphs with
    isolates settle below N (the tests pin exactly this: sum = 3.15 on
    a 4-node graph with one isolate, not 4).

    Convergence observability: a fixed iteration count silently
    under-converges on some graphs (the same failure mode CC's
    fixpoint guard exists for), so callers can pass ``tol`` — stop
    early once the L1 residual ‖r_t − r_{t−1}‖₁ drops below it — and/
    or ``residuals`` (a list the per-round residual is appended to,
    for reporting). The residual costs one extra join+agg per round on
    the already-materialized rank vectors and is only computed when
    requested, so the default path is unchanged.
    """
    from pyspark.sql import functions as F  # local: keep module import surface tidy

    if checkpoint_dir is not None:
        nodes.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint() if checkpoint_dir is not None else df.localCheckpoint()

    # Loop invariants materialized ONCE (round-13, guide §2.4): bidir
    # and deg are referenced by every round's plan, so unmaterialized
    # they re-derive per iteration (n_iter edge-list unions + degree
    # aggregations); both are linear state — the same class as the
    # per-round checkpoint below. Measured 1.3 s → 0.6 s per round on
    # the 4-node model tests (the suite's per-job-latency floor), and
    # at 100 TB it removes n_iter-1 full degree aggregations.
    bidir = _ckpt(
        edges.select(F.col("src"), F.col("dst")).unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    deg = _ckpt(bidir.groupBy("src").agg(F.count("*").alias("deg")))
    n_nodes = nodes.count()
    ranks = nodes.select(F.col("id"), F.lit(1.0).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            bidir.join(ranks, bidir.src == ranks.id)
            .join(deg, "src")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = _ckpt(
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (F.lit(1.0 - damping) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
        if tol is not None or residuals is not None:
            resid = (
                new_ranks.join(ranks.select("id", F.col("rank").alias("prev")), "id")
                .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))))
                .collect()[0][0]
            )
            if residuals is not None:
                residuals.append(float(resid))
            ranks = new_ranks
            if tol is not None and resid < tol:
                break
        else:
            ranks = new_ranks
    return ranks


@query(
    "graph_pagerank_neardup",
    oracle=None,  # iterative fixpoint; invariants pinned in tests
    tags=("llm", "graph", "iterative"),
)
def graph_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-dup pair graph: rank mass concentrates
    on documents sitting inside large duplicate clusters — a
    duplication-centrality signal (which docs are the 'template' of
    their cluster). Rows-only by construction (iterative float
    fixpoint has no closed-form SQL twin); tests pin mass conservation
    (Σrank = N), isolate rank (= 1-d), and monotonicity of rank with
    degree inside a clique."""
    docs = load_tables(spark, sf_dir)["documents"]
    nodes = docs.select(F.col("doc_id").alias("id"))
    edges = dedup_ngram_jaccard(spark, sf_dir).select(
        F.col("i").alias("src"), F.col("j").alias("dst")
    )
    pr = pagerank(nodes, edges)
    return pr.select("id", F.round("rank", 6).cast("double").alias("rank")).orderBy("id")


# ---------------------------------------------------------------------------
# Soft dedup (round 7, session 2): down-WEIGHT duplicate clusters
# instead of dropping members. Several published pipelines keep all
# near-duplicates but scale each document's sampling weight by
# 1/cluster_size so every distinct content item contributes one unit
# of training mass regardless of how many copies crawled in — the
# gentler alternative to keeper-only dedup when duplicates carry
# distinct metadata (different sources/timestamps) worth preserving.
# Weights are exact integer ppm (1e6 DIV size; numerator positive, so
# Spark trunc-div ≡ DuckDB floor-div), and the invariant
# Σ weight_ppm over a cluster ≈ 1e6 (exact when size | 1e6) makes the
# effective-corpus-size column a one-agg audit. Plan: the same LSH→CC
# machinery as dedup_cluster_cc_lsh (banded, capped, skew-safe) plus
# one size join — nothing new shuffles.
# ---------------------------------------------------------------------------

_SOFT_WEIGHTS_ORACLE = _CC_CTE + """
    SELECT c.doc_id, c.component_id, s.component_size,
           CAST(1000000 // s.component_size AS BIGINT) AS weight_ppm
    FROM comp c
    JOIN (SELECT component_id, count(*) AS component_size
          FROM comp GROUP BY component_id) s USING (component_id)
    ORDER BY c.doc_id
"""


@query("dedup_soft_weights", oracle=_SOFT_WEIGHTS_ORACLE, tags=("llm", "dedup", "weights"))
def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size-reciprocal sampling weights over the LSH near-dup
    components: weight_ppm = 1e6 DIV component_size, so each distinct
    content cluster contributes ~one unit of training mass. Same
    banded/capped edge source and CC loop as dedup_cluster_cc_lsh;
    the recursive-closure oracle pins the weights end-to-end."""
    clusters = _cc_clusters(spark, sf_dir, dedup_minhash_lsh(spark, sf_dir))
    return (
        clusters.select(
            "doc_id",
            "component_id",
            "component_size",
            F.expr("CAST(1000000 DIV component_size AS BIGINT)").alias("weight_ppm"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Component-size histogram (round 9, session 3): the dedup-pipeline
# health summary over the exact transitive clusters. A healthy
# near-dup corpus decomposes into many small components (pairs,
# triples); one giant component means the pair threshold is too loose
# and transitive closure is about to merge unrelated content (the
# false-merge catastrophe the keeper policy cannot undo). This is the
# FIRST number a dedup review reads, before any per-cluster drill-in.
#
# Derivative of the same closure dedup_cluster_cc pins: one extra
# map-side-combinable groupBy on component_size (at most sqrt(2N)
# distinct sizes). The oracle reuses _CC_CTE verbatim, so the
# histogram is pinned against the identical independently-formulated
# closure.
# ---------------------------------------------------------------------------

_CC_SIZE_HIST_ORACLE = _CC_CTE + """
    , sizes AS (
        SELECT component_id, CAST(count(*) AS BIGINT) AS component_size
        FROM comp GROUP BY component_id
    )
    SELECT component_size,
           CAST(count(*) AS BIGINT) AS n_components,
           CAST(component_size * count(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY component_size ORDER BY component_size
"""


@query("graph_cc_size_hist", oracle=_CC_SIZE_HIST_ORACLE, tags=("llm", "dedup", "graph"))
def graph_cc_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of transitive dedup-cluster sizes over the exact
    Jaccard >= 0.5 pair graph: component_size, how many components
    have that size, and the documents they hold. Singleton-dominated
    = healthy; a fat tail = the threshold is merging unrelated
    content transitively.

    Registered over the EXACT pair graph so the oracle pins the whole
    chain; at 100 TB run the same two-line rollup over
    ``dedup_cluster_cc_lsh`` (the banded+capped production closure) —
    the histogram itself is one map-side-combinable groupBy either
    way."""
    comp = dedup_cluster_cc(spark, sf_dir)
    return (
        comp.filter(F.col("is_keeper"))
        .groupBy("component_size")
        .agg(F.count("*").cast("long").alias("n_components"))
        .select(
            "component_size",
            "n_components",
            (F.col("component_size") * F.col("n_components"))
            .cast("long")
            .alias("n_docs"),
        )
        .orderBy("component_size")
    )
