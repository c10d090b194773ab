"""Round-9 operator properties beyond the generic oracle hash: MG
twin guarantees vs exact counts, the refined-recall audit's structural
monotonicity, Mann-Kendall against a pure-python reference, novelty
accounting, and PR-curve shape invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from flume_source_spark.registry import load_all

SPECS = load_all()


def test_mg_shard_twin_obeys_mg_guarantees(spark, sf_dir):
    """The batch twin's per-shard summaries must satisfy the MG
    contract against EXACT per-shard counts on the same md5 sharding:
    (1) every reported lower_bound ≤ the true count; (2) undercount
    ≤ shard_total/(K+1); (3) SUPERSET — every key with true count >
    shard_total/(K+1) appears in the summary."""
    from flume_source_spark.streaming.heavy_hitters import MG_K, N_SHARDS
    from flume_source_spark.tables import load_tables

    twin = {
        (r.shard, r.user_id): (r.lower_bound, r.shard_total)
        for r in SPECS["mg_shard_summaries_exact"].builder(spark, sf_dir).collect()
    }
    ev = load_tables(spark, sf_dir)["events"]
    shard = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % N_SHARDS
    )
    exact = {
        (r.shard, r.user_id): r.c
        for r in ev.select("user_id", shard.alias("shard"))
        .groupBy("shard", "user_id")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    totals: dict[int, int] = {}
    for (s, _), c in exact.items():
        totals[s] = totals.get(s, 0) + c
    assert twin, "twin must report counters"
    for (s, u), (lb, st) in twin.items():
        assert st == totals[s]
        true = exact[(s, u)]
        assert 0 < lb <= true, (s, u, lb, true)
        assert true - lb <= st // (MG_K + 1) + 1, (s, u, lb, true, st)
    for (s, u), c in exact.items():
        if c > totals[s] / (MG_K + 1):
            assert (s, u) in twin, (s, u, c, totals[s])


def test_mg_rollup_twin_matches_python_fold(spark, sf_dir):
    """mg_rollup_exact must equal the pure-python PODS'12 fold over
    the shard summaries in shard-ascending order, and n_total must be
    the full event count."""
    from flume_source_spark.streaming.heavy_hitters import MG_K, mg_rollup
    from flume_source_spark.tables import load_tables

    shard_rows = SPECS["mg_shard_summaries_exact"].builder(spark, sf_dir).collect()
    by_shard: dict[int, dict[int, int]] = {}
    for r in shard_rows:
        by_shard.setdefault(r.shard, {})[r.user_id] = r.lower_bound
    want = mg_rollup([by_shard[s] for s in sorted(by_shard)], MG_K)
    got = {
        r.user_id: r.lower_bound
        for r in SPECS["mg_rollup_exact"].builder(spark, sf_dir).collect()
    }
    assert got == {int(k): int(v) for k, v in want.items()}
    n_total = {
        r.n_total for r in SPECS["mg_rollup_exact"].builder(spark, sf_dir).collect()
    }
    assert n_total == {load_tables(spark, sf_dir)["events"].count()}


def test_refined_recall_audit_is_monotone_and_sane(spark, sf_dir):
    """refined_recall ≥ base_recall is structural (candidate superset
    + global-order argument); counts must be internally consistent."""
    row = SPECS["sim_knn_refined_recall_audit"].builder(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert r.refined_hits >= r.base_hits
    assert r.refined_recall_ppm >= r.base_recall_ppm
    assert 0 < r.n_sampled
    assert r.base_hits <= r.n_exact and r.refined_hits <= r.n_exact
    assert r.n_exact <= 3 * r.n_sampled  # k = 3 exact slots per node
    assert 0 <= r.refined_recall_ppm <= 1_000_000


def test_mann_kendall_matches_python_reference(spark, sf_dir):
    """Exact S / tau / var18 against a brute-force python replay of
    the daily series."""
    from flume_source_spark.tables import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").alias("y"))
        .collect()
    )
    series: dict[str, list[tuple]] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.d, r.y))
    got = {
        r.event_type: r.asDict()
        for r in SPECS["ts_mann_kendall"].builder(spark, sf_dir).collect()
    }
    for et, pts in series.items():
        pts.sort()
        ys = [y for _, y in pts]
        n = len(ys)
        if n < 2:
            assert et not in got
            continue
        s = sum(
            (ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        pairs = n * (n - 1) // 2
        tau = (
            s * 1_000_000 // pairs if s >= 0 else -((-s) * 1_000_000 // pairs)
        )
        ties: dict[int, int] = {}
        for y in ys:
            ties[y] = ties.get(y, 0) + 1
        var18 = n * (n - 1) * (2 * n + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values()
        )
        g = got[et]
        assert (g["n_days"], g["s_stat"], g["n_pairs"]) == (n, s, pairs), et
        assert g["tau_ppm"] == tau and g["var18"] == var18, et
        assert var18 >= 0


def test_novelty_curve_accounting(spark, sf_dir):
    """doc_id-ordered novelty: the first document is 100% novel, the
    n_novel column sums to the corpus's distinct-shingle count, and
    every doc with shingles has a row."""
    from flume_source_spark.pipeline.dedup import shingle_col
    from flume_source_spark.tables import load_tables

    rows = SPECS["text_novelty_curve"].builder(spark, sf_dir).collect()
    d = load_tables(spark, sf_dir)["documents"]
    sh = d.select("doc_id", F.explode(shingle_col(F.col("text"))).alias("s"))
    n_distinct = sh.select("s").distinct().count()
    n_docs_with = sh.select("doc_id").distinct().count()
    assert len(rows) == n_docs_with
    assert sum(r.n_novel for r in rows) == n_distinct
    first = min(rows, key=lambda r: r.doc_id)
    assert first.n_novel == first.n_shingles
    assert first.novelty_ppm == 1_000_000
    for r in rows:
        assert 0 <= r.n_novel <= r.n_shingles


def test_pr_curve_shape_invariants(spark, sf_dir):
    """Within a source, as the threshold decreases: tp and recall are
    non-decreasing; the lowest threshold predicts everything positive
    (recall = 1e6); tp+fn is the constant positive count."""
    rows = SPECS["dq_pr_curve_exact"].builder(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert by_src
    for src, rs in by_src.items():
        rs.sort(key=lambda r: -r.threshold)  # high → low
        n_pos = {r.tp + r.fn for r in rs}
        assert len(n_pos) == 1, src
        last_tp = -1
        for r in rs:
            assert r.tp >= last_tp, src
            last_tp = r.tp
            assert 0 <= r.precision_ppm <= 1_000_000
        assert rs[-1].recall_ppm == 1_000_000, src  # lowest threshold
