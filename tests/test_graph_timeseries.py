"""Model tests for connected components (pipeline/graph.py) and the
batch time-series operators (operators/timeseries.py). The oracle
equivalence is covered by test_oracle.py; these pin the algorithmic
properties on hand-built inputs where the answer is known by
construction."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from flume_source_spark.operators.timeseries import ts_gap_fill, ts_sessionize_gaps
from flume_source_spark.pipeline.graph import connected_components
from tests.conftest import SF_DIR


def _cc_map(spark, node_ids, edge_pairs):
    nodes = spark.createDataFrame([(i,) for i in node_ids], "id long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs] or [(None, None)], "src long, dst long"
    ).filter(F.col("src").isNotNull())
    out = connected_components(nodes, edges).collect()
    return {r.id: r.component_id for r in out}


def test_cc_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter 4, must converge to min label 1.
    got = _cc_map(spark, range(1, 6), [(i, i + 1) for i in range(1, 5)])
    assert got == {i: 1 for i in range(1, 6)}


def test_cc_two_components_and_isolates(spark):
    got = _cc_map(spark, range(10), [(0, 1), (1, 2), (5, 6), (6, 7), (7, 5)])
    assert got[0] == got[1] == got[2] == 0
    assert got[5] == got[6] == got[7] == 5
    for isolate in (3, 4, 8, 9):
        assert got[isolate] == isolate


def test_cc_nonconvergence_raises_not_silent(spark):
    # A 8-hop chain with max_rounds=3 cannot reach the fixpoint; the
    # old behavior returned partially-propagated (wrong) labels.
    import pytest

    nodes = spark.createDataFrame([(i,) for i in range(9)], "id long")
    edges = spark.createDataFrame([(i, i + 1) for i in range(8)], "src long, dst long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(nodes, edges, max_rounds=3)
    # and with an adequate bound the same graph converges
    got = {r.id: r.component_id for r in connected_components(nodes, edges).collect()}
    assert got == {i: 0 for i in range(9)}


def test_cc_reliable_checkpoint_dir(spark, tmp_path):
    # checkpoint_dir switches lineage truncation to reliable checkpoint;
    # results are identical and checkpoint files land in the directory.
    import os

    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    edges = spark.createDataFrame([(i, i + 1) for i in range(4)], "src long, dst long")
    ckpt = str(tmp_path / "cc_ckpt")
    got = {
        r.id: r.component_id
        for r in connected_components(nodes, edges, checkpoint_dir=ckpt).collect()
    }
    assert got == {i: 0 for i in range(5)}
    assert any(os.scandir(ckpt))  # reliable checkpoints were written


def test_cc_edge_direction_irrelevant(spark):
    # Edges listed "backwards" (high → low) must produce the same closure.
    fwd = _cc_map(spark, range(4), [(0, 1), (1, 2), (2, 3)])
    rev = _cc_map(spark, range(4), [(3, 2), (2, 1), (1, 0)])
    assert fwd == rev == {i: 0 for i in range(4)}


def test_gap_fill_calendar_is_dense_and_filled(spark):
    out = ts_gap_fill(spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    fmt = "%Y-%m-%d %H:%M:%S"
    for rows in by_user.values():
        # buckets are a contiguous hourly sequence (gap-free calendar)
        ts = [datetime.datetime.strptime(r.bucket, fmt) for r in rows]
        assert ts == sorted(ts)
        for a, b in zip(ts, ts[1:]):
            assert (b - a) == datetime.timedelta(hours=1)
        # the first bucket is observed (span starts at min ts), so the
        # forward-fill is total: no null filled_value anywhere
        assert rows[0].n_events > 0
        for r in rows:
            assert r.filled_value is not None
            if r.n_events == 0:
                assert r.hour_value is None  # gap rows carry only the fill
            else:
                assert r.hour_value == r.filled_value


def test_sessionize_gap_invariant(spark):
    sessions = ts_sessionize_gaps(spark, SF_DIR).collect()
    fmt = "%Y-%m-%d %H:%M:%S"
    by_user: dict[int, list] = {}
    for s in sessions:
        by_user.setdefault(s.user_id, []).append(s)
    gap = datetime.timedelta(minutes=30)
    n_multi = 0
    for rows in by_user.values():
        rows.sort(key=lambda s: s.session_seq)
        assert [s.session_seq for s in rows] == list(range(1, len(rows) + 1))
        n_multi += len(rows) > 1
        for a, b in zip(rows, rows[1:]):
            # consecutive sessions are separated by MORE than the gap
            # (second-truncated strings make this a >= check at 30:00)
            end_a = datetime.datetime.strptime(a.session_end, fmt)
            start_b = datetime.datetime.strptime(b.session_start, fmt)
            assert start_b - end_a >= gap
    assert n_multi > 0  # the fixture actually exercises session splits


def test_sessionize_conserves_events(spark, sf_dir):
    from flume_source_spark.tables import load_tables

    total = load_tables(spark, sf_dir)["events"].count()
    sessions = ts_sessionize_gaps(spark, sf_dir)
    assert sessions.agg(F.sum("n_events")).collect()[0][0] == total


def test_funnel_partitions_viewers_and_stage1_is_instant(spark, sf_dir):
    from flume_source_spark.operators.timeseries import ts_funnel
    from flume_source_spark.tables import load_tables

    out = {r.stage: r for r in ts_funnel(spark, sf_dir).collect()}
    # stages partition the set of users who ever viewed
    viewers = (
        load_tables(spark, sf_dir)["events"]
        .filter(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .count()
    )
    assert set(out) <= {1, 2, 3} and sum(r.n_users for r in out.values()) == viewers
    # users stuck at stage 1 never left their first view: time-to-last = 0
    if 1 in out:
        assert out[1].avg_secs_to_last == 0.0
    # deeper stages take time: a qualifying later step is strictly after ts1
    for k in (2, 3):
        if k in out:
            assert out[k].avg_secs_to_last > 0.0


def _pr(spark, nodes, edges, **kw):
    from flume_source_spark.pipeline.graph import pagerank

    n = spark.createDataFrame([(i,) for i in nodes], "id long")
    e = spark.createDataFrame(edges, "src long, dst long") if edges else spark.createDataFrame([], "src long, dst long")
    return {r.id: r.rank for r in pagerank(n, e).collect()}


def test_pagerank_mass_conserved_and_isolates(spark):
    """Σrank = N (teleport + damping conserve mass on non-dangling
    graphs); an isolate holds exactly the teleport mass 1-d."""
    ranks = _pr(spark, [1, 2, 3, 4], [(1, 2), (2, 3), (1, 3)])
    assert abs(sum(ranks.values()) - (3 + 0.15)) < 1e-6  # triangle mass 3, isolate 0.15
    assert abs(ranks[4] - 0.15) < 1e-12


def test_pagerank_symmetric_clique_uniform(spark):
    """On a k-clique (regular graph) the stationary distribution is
    uniform: every node gets rank 1."""
    edges = [(i, j) for i in range(1, 5) for j in range(i + 1, 5)]
    ranks = _pr(spark, [1, 2, 3, 4], edges)
    for v in ranks.values():
        assert abs(v - 1.0) < 1e-9


def test_pagerank_degree_monotone_on_star(spark):
    """Star graph: the hub out-ranks every leaf."""
    ranks = _pr(spark, [1, 2, 3, 4, 5], [(1, k) for k in (2, 3, 4, 5)])
    hub, leaves = ranks[1], [ranks[k] for k in (2, 3, 4, 5)]
    assert all(hub > leaf for leaf in leaves)
    assert max(leaves) - min(leaves) < 1e-12  # symmetry


def _cc_star_map(spark, node_ids, edge_pairs, **kw):
    nodes = spark.createDataFrame([(i,) for i in node_ids], "id long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs] or [(None, None)], "src long, dst long"
    ).filter(F.col("src").isNotNull())
    out = connected_components(nodes, edges, algorithm="star", **kw).collect()
    return {r.id: r.component_id for r in out}


def test_cc_star_equals_propagation_on_canonical_shapes(spark):
    """large-star/small-star and min-propagation must agree on the
    shapes that stress them differently: a long chain (diameter),
    a clique (density), a hub (skew), plus isolates."""
    cases = [
        (range(1, 10), [(i, i + 1) for i in range(1, 9)]),                 # chain
        (range(6), [(i, j) for i in range(5) for j in range(i + 1, 5)]),   # clique+isolate
        (range(8), [(0, k) for k in range(1, 7)]),                          # hub+isolate
        (range(12), [(1, 2), (2, 3), (5, 6), (6, 7), (7, 5), (9, 10)]),    # mixed
    ]
    for nodes, edges in cases:
        assert _cc_star_map(spark, nodes, edges) == _cc_map(spark, nodes, edges)


def test_cc_star_random_graphs_match_propagation(spark):
    """Randomized cross-check (fixed seed): sparse random graphs,
    including edges listed high→low and duplicate edges."""
    import random

    rng = random.Random(7)
    for _ in range(3):
        n = rng.randrange(8, 20)
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(n // 2, 2 * n))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _cc_star_map(spark, range(n), edges) == _cc_map(spark, range(n), edges)


def test_cc_star_no_edges_all_isolates(spark):
    got = _cc_star_map(spark, range(5), [])
    assert got == {i: i for i in range(5)}


def test_cc_star_unknown_algorithm_raises(spark):
    import pytest

    nodes = spark.createDataFrame([(1,)], "id long")
    edges = spark.createDataFrame([(1, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="unknown algorithm"):
        connected_components(nodes, edges, algorithm="nope")


def test_pagerank_residual_decreases_and_converges(spark):
    """The per-round L1 residual is monotonically decreasing on a
    fixed graph and reaches < 1e-4 within the default 10 rounds —
    the observability contract: a caller can TELL whether 10
    iterations was enough instead of trusting it."""
    from flume_source_spark.pipeline.graph import pagerank

    n = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (1, 3)], "src long, dst long"
    )
    residuals: list[float] = []
    pagerank(n, e, residuals=residuals)
    assert len(residuals) == 10
    # observed decay ≈ 0.42×/round on this graph: 1.13 → 4.6e-4
    assert residuals[-1] < 1e-3
    # geometric-ish decay: each residual ≤ the previous (damping<1 is a
    # contraction on this graph)
    assert all(b <= a * 1.01 for a, b in zip(residuals, residuals[1:]))


def test_pagerank_tol_stops_early(spark):
    from flume_source_spark.pipeline.graph import pagerank

    n = spark.createDataFrame([(i,) for i in range(1, 5)], "id long")
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    residuals: list[float] = []
    out = pagerank(n, e, n_iter=50, tol=1e-6, residuals=residuals)
    assert len(residuals) < 50  # stopped early
    assert residuals[-1] < 1e-6
    assert out.count() == 4
