"""Round-12 operator tests: the text_rake_keywords top-k re-shape,
the driver-materialized global-order boundaries, and the round-12
survival/audit additions.

Reference parity note: the reference engine (`CephFsSource.java`,
`CephFSEventReader.java`) has no analytics surface; everything here
belongs to the declared [NS] engine surface (SURVEY.md §2.2).
"""
from __future__ import annotations

import pyspark.sql.functions as F


def test_rake_plan_uses_take_ordered(spark, sf_dir):
    """The round-12 RAKE re-shape (VERDICT r11 "What's wrong"): the
    corpus-scale phrase vocabulary must reach the top-10 via
    TakeOrderedAndProject (per-partition partial top-k) — the
    whole-vocabulary unpartitioned row_number window is gone; the
    remaining rank Window runs AFTER the 10-row limit."""
    from flume_source_spark.registry import load_all

    qs = load_all()
    p = (
        qs["text_rake_keywords"]
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in p
    # the phrase table must not be globally sorted: a full-table Sort
    # node with a SinglePartition exchange directly beneath it would
    # be the old corpus-scale plan (the remaining rank Window runs on
    # the 10 post-limit rows, which plans no such Sort-over-Exchange)
    import re

    assert not re.search(
        r"Sort \[[^\n]*\n[^\n]*Exchange SinglePartition", p
    ), "corpus-scale single-partition sort resurfaced in RAKE"


def test_rake_topk_equals_rank_filter_form(spark, sf_dir):
    """Equality pin for the re-shape: orderBy().limit(10) then rank
    must return exactly the rows the old rank-then-filter form
    returned (the oracle still ranks first — driver-verified; this
    pins the Spark-vs-Spark equivalence at test time too)."""
    from flume_source_spark.registry import load_all

    qs = load_all()
    got = [
        tuple(r)
        for r in qs["text_rake_keywords"].builder(spark, sf_dir).collect()
    ]
    assert len(got) == 10
    assert [r[3] for r in got] == list(range(1, 11))
    # scores weakly decreasing under the round-6 rank key
    scores = [r[2] for r in got]
    assert all(scores[i] >= scores[i + 1] - 1e-9 for i in range(9))


def test_global_order_boundaries_are_driver_literals(spark):
    """ADVICE r11 (medium): the bucket id must be a pure function of
    the row GIVEN FIXED LITERAL boundaries — the percentile sketch is
    collected once on the driver, so no plan branch can recompute it.
    Pin: the bucketed frame's plan contains no percentile_approx, and
    _boundaries returns plain python floats."""
    from flume_source_spark.global_order import _boundaries, _bucketed

    df = spark.range(1000).select(F.col("id").cast("long").alias("k"))
    bnds = _boundaries(df, F.col("k"), 8)
    assert len(bnds) == 7
    assert all(isinstance(b, float) for b in bnds)
    assert bnds == sorted(bnds)
    b, n_buckets = _bucketed(df, F.col("k"), 8)
    assert n_buckets == 8
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "percentile_approx" not in plan, (
        "boundary sketch must not be re-evaluated inside the bucketed plan"
    )
    # buckets cover the full range and are monotone in k
    rows = b.orderBy("k").select("__go_bucket").collect()
    seq = [r[0] for r in rows]
    assert seq == sorted(seq)
    assert seq[0] == 0 and seq[-1] == 7


def test_global_order_empty_and_single_row(spark):
    """Degenerate inputs: empty frame → empty ranked frame; one row →
    rank 1 (boundary collect returns [] in both cases)."""
    from flume_source_spark.global_order import with_global_rank

    empty = spark.range(0).select(F.col("id").alias("k"))
    assert (
        with_global_rank(empty, [F.col("k")], F.col("k"), rank_col="r").count()
        == 0
    )
    one = spark.range(1).select(F.col("id").alias("k"))
    got = with_global_rank(one, [F.col("k")], F.col("k"), rank_col="r").collect()
    assert [(r["k"], r["r"]) for r in got] == [(0, 1)]


# ---------------------------------------------------------------------------
# Nelson-Aalen closed forms
# ---------------------------------------------------------------------------


def _na(spark, rows):
    from flume_source_spark.operators.timeseries10 import nelson_aalen

    return {
        r["t_hours"]: r.asDict()
        for r in nelson_aalen(
            spark.createDataFrame(rows, "t long, died long")
        ).collect()
    }


def test_nelson_aalen_no_censoring_closed_form(spark):
    """Three uncensored deaths at t = 1, 2, 3: H steps by d/n of the
    shrinking risk set — 1/3, 1/2, 1/1 — in floored ppm."""
    na = _na(spark, [(1, 1), (2, 1), (3, 1)])
    assert na[1]["h_ppm"] == 333_333 and na[1]["n_at_risk"] == 3
    assert na[2]["h_ppm"] == 500_000 and na[2]["n_at_risk"] == 2
    assert na[3]["h_ppm"] == 1_000_000 and na[3]["n_at_risk"] == 1
    assert [na[t]["cumhaz_ppm"] for t in (1, 2, 3)] == [
        333_333,
        833_333,
        1_833_333,
    ]


def test_nelson_aalen_censoring_carries_hazard_flat(spark):
    """A censor-only time contributes NO hazard increment but leaves
    the risk set — H is flat at t = 2 and the t = 3 step uses n = 1."""
    na = _na(spark, [(1, 1), (2, 0), (3, 1)])
    assert na[2]["h_ppm"] == 0 and na[2]["n_censored"] == 1
    assert na[2]["cumhaz_ppm"] == na[1]["cumhaz_ppm"] == 333_333
    assert na[3]["n_at_risk"] == 1 and na[3]["cumhaz_ppm"] == 1_333_333


def test_nelson_aalen_exp_bound_vs_km(spark, sf_dir):
    """The Fleming-Harrington relation on the real corpus: the two
    estimators share the life table row-for-row and satisfy
    exp(−H(t)) ≥ S_KM(t) pointwise (equivalently H ≤ −ln S), with a
    small allowance for the ppm floors on both sides."""
    import math

    from flume_source_spark.registry import load_all

    qs = load_all()
    na = {
        r["t_hours"]: r.asDict()
        for r in qs["ts_nelson_aalen"].builder(spark, sf_dir).collect()
    }
    km = {
        r["t_hours"]: r.asDict()
        for r in qs["ts_kaplan_meier"].builder(spark, sf_dir).collect()
    }
    assert set(na) == set(km) and len(na) > 10
    prev = 0
    for t in sorted(na):
        assert na[t]["n_at_risk"] == km[t]["n_at_risk"]
        assert na[t]["n_events"] == km[t]["n_events"]
        assert na[t]["cumhaz_ppm"] >= prev  # monotone
        prev = na[t]["cumhaz_ppm"]
        s_na = math.exp(-na[t]["cumhaz_ppm"] / 1e6)
        assert s_na >= km[t]["surv_ppm"] / 1e6 - 1e-4, t


# ---------------------------------------------------------------------------
# Curation A/B report anchors
# ---------------------------------------------------------------------------


def test_ab_report_anchors_to_standalone_components(spark, sf_dir):
    """Every report column must equal the standalone query it
    composes: chi2/o1/e1/v from ts_logrank; per-arm RMST and median
    from km_rmst_from over the ts_km_by_arm curves."""
    from flume_source_spark.operators.timeseries9 import km_rmst_from
    from flume_source_spark.registry import load_all

    qs = load_all()
    rep = qs["ts_curation_ab_report"].builder(spark, sf_dir).collect()[0].asDict()
    lr = qs["ts_logrank"].builder(spark, sf_dir).collect()[0].asDict()
    for k in ("n_total", "d_total", "o1", "e1_ppm", "o_minus_e_ppm",
              "v_ppm", "chi2_ppm"):
        assert rep[k] == lr[k], k
    km2 = qs["ts_km_by_arm"].builder(spark, sf_dir)
    for arm, suffix in ((0, "even"), (1, "odd")):
        curve = km2.filter(F.col("arm") == arm).select(
            F.col("t_hours").alias("t"), F.col("surv_ppm").alias("s")
        )
        r = km_rmst_from(curve, rep["horizon_hours"]).collect()[0].asDict()
        assert rep[f"rmst_{suffix}_ppm_hours"] == r["rmst_ppm_hours"], suffix
        assert rep[f"median_{suffix}_hours"] == r["median_hours"], suffix
    assert (
        rep["rmst_delta_ppm_hours"]
        == rep["rmst_even_ppm_hours"] - rep["rmst_odd_ppm_hours"]
    )
    assert rep["significant_05"] == int(rep["chi2_ppm"] >= 3_841_459)


def test_ab_report_significance_flag_planted(spark):
    """Planted arms: identical multisets → χ² = 0 and flag 0;
    fully separated arms → flag 1 and the long-lived EVEN arm shows a
    positive RMST delta."""
    from flume_source_spark.operators.timeseries10 import ab_report_from

    def rep(rows):
        df = spark.createDataFrame(rows, "arm long, t long, died long")
        return ab_report_from(df, 168).collect()[0].asDict()

    base = [(1, 1), (2, 1), (3, 1), (5, 1), (8, 0)]
    same = rep([(0, t, d) for t, d in base] + [(1, t, d) for t, d in base])
    assert same["chi2_ppm"] == 0 and same["significant_05"] == 0
    assert same["rmst_delta_ppm_hours"] == 0

    sep = rep(
        [(0, t, 1) for t in range(100, 110)] + [(1, t, 1) for t in range(1, 11)]
    )
    assert sep["significant_05"] == 1
    assert sep["rmst_delta_ppm_hours"] > 0
    assert sep["median_even_hours"] > sep["median_odd_hours"]


# ---------------------------------------------------------------------------
# pHash recall audit
# ---------------------------------------------------------------------------


def test_phash_recall_audit_pigeonhole_reads_full_recall(spark, sf_dir):
    """The family's quality claim, measured: on the budget sample no
    band bucket can exceed the cap, so the pigeonhole construction
    guarantees every exact radius-3 truth pair appears among the band
    candidates — recall must read EXACTLY 10⁶ ppm, with a nonzero
    truth set so the number means something."""
    from flume_source_spark.registry import load_all

    qs = load_all()
    r = (
        qs["multimodal_phash_recall_audit"]
        .builder(spark, sf_dir)
        .collect()[0]
        .asDict()
    )
    assert r["n_true"] > 0, "fixture sample lost its planted near-dups"
    assert r["n_hit"] == r["n_true"]
    assert r["recall_ppm"] == 1_000_000
    assert 0 < r["n_docs"] <= 200  # the budget gate held


def test_phash_recall_counts_planted_floor_pair(spark):
    """Planted floor: two identical docs (Hamming 0) plus distinct
    background must yield that exact truth pair AND its candidate hit
    — a recall miss here would be attributed to the band join, not
    the fixture (the dedup_lsh_recall_audit superset discipline)."""
    from flume_source_spark.pipeline.multimodal2 import phash_recall_counts

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, text),
            (2, text),
            (3, "completely different words in every position nothing "
                "shared with any other document here at all today"),
            (4, "yet another unrelated block of tokens carrying its own "
                "distinct shingle set for the background population"),
        ],
        "doc_id long, text string",
    )
    r = phash_recall_counts(docs).collect()[0].asDict()
    assert r["n_docs"] == 4  # modulus 1 at tiny N: everything sampled
    assert r["n_true"] >= 1
    assert r["n_hit"] == r["n_true"]
    assert r["recall_ppm"] == 1_000_000


# ---------------------------------------------------------------------------
# Greenwood variance sum
# ---------------------------------------------------------------------------


def test_greenwood_no_censoring_closed_form(spark):
    """Three uncensored deaths at t = 1, 2, 3: increments are
    d/(n(n−d)) = 1/6, 1/2 in floored ppb; the terminal n = d row
    contributes 0 (variance of the constant-0 tail) and the cumsum
    stays flat across it."""
    from flume_source_spark.operators.timeseries10 import greenwood

    rows = {
        r["t_hours"]: r.asDict()
        for r in greenwood(
            spark.createDataFrame([(1, 1), (2, 1), (3, 1)], "t long, died long")
        ).collect()
    }
    assert rows[1]["greenwood_ppb"] == 166_666_666
    assert rows[2]["greenwood_ppb"] == 500_000_000
    assert rows[3]["greenwood_ppb"] == 0  # n = d terminal row
    assert [rows[t]["greenwood_cum_ppb"] for t in (1, 2, 3)] == [
        166_666_666,
        666_666_666,
        666_666_666,
    ]


def test_greenwood_matches_float_recompute(spark, sf_dir):
    """On the real corpus the exact-ppb cumulative Greenwood sum must
    track a float recompute from the same KM life table within the
    documented per-row floor drift (< #rows ppb), and the implied
    variance Var(S) = S²·sum must be finite and nonnegative."""
    from flume_source_spark.registry import load_all

    qs = load_all()
    gw = sorted(
        (r.asDict() for r in qs["ts_km_greenwood"].builder(spark, sf_dir).collect()),
        key=lambda r: r["t_hours"],
    )
    acc, nrows = 0.0, 0
    for row in gw:
        nrows += 1
        d, n = row["n_events"], row["n_at_risk"]
        if d > 0 and n > d:
            acc += d / (n * (n - d))
        assert abs(row["greenwood_cum_ppb"] - acc * 1e9) <= nrows + 1
        assert row["greenwood_cum_ppb"] >= 0


# ---------------------------------------------------------------------------
# Good-Turing
# ---------------------------------------------------------------------------


def test_good_turing_planted_counts(spark):
    """Planted trigrams with known count-of-counts: 'a b c' twice,
    'd e f' once → N₁ = N₂ = 1, so r = 1 has r* = 2·N₂/N₁ = 2
    exactly, r = 2 hits the gap case (N₃ = 0 → r* = 0), and
    p₀ = N₁/N = 1/3 floored ppm."""
    from flume_source_spark.pipeline.text14 import good_turing_counts

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "d e f")], "doc_id long, text string"
    )
    rows = {r["r"]: r.asDict() for r in good_turing_counts(docs).collect()}
    assert rows[1]["n_r"] == 1 and rows[1]["n_r_next"] == 1
    assert rows[1]["r_star_ppm"] == 2_000_000
    assert rows[2]["n_r"] == 1 and rows[2]["n_r_next"] == 0
    assert rows[2]["r_star_ppm"] == 0  # the N_{r+1} = 0 gap case
    assert rows[1]["p0_ppm"] == 333_333


def test_good_turing_discounts_singletons_on_corpus(spark, sf_dir):
    """The estimator's reason to exist, on real data: singletons are
    DISCOUNTED (r* < 1 at r = 1 — mass flows to unseen types), the
    unseen mass p₀ equals N₁/N, and the count-of-counts tail is
    populated (the fixture's trigram grain has singletons even though
    its closed unigram vocabulary does not)."""
    from flume_source_spark.registry import load_all

    qs = load_all()
    rows = {
        r["r"]: r.asDict()
        for r in qs["text_good_turing"].builder(spark, sf_dir).collect()
    }
    assert 1 in rows and rows[1]["n_r"] > 1000
    assert 0 < rows[1]["r_star_ppm"] < 1_000_000
    assert 0 < rows[1]["p0_ppm"] < 1_000_000


# ---------------------------------------------------------------------------
# MMR rerank
# ---------------------------------------------------------------------------


def _mmr(spark, pool_rows, pair_rows, lam):
    from flume_source_spark.pipeline.similarity4 import mmr_rerank

    pool = spark.createDataFrame(pool_rows, "qid long, nid long, sim double")
    pairs = spark.createDataFrame(
        pair_rows, "qid long, i long, j long, psim double"
    )
    return [
        (r["pick"], r["nid"])
        for r in mmr_rerank(pool, pairs, lam=lam).collect()
    ]


def _sym_pairs(vals):
    return [(q, i, j, s) for q, i, j, s in vals] + [
        (q, j, i, s) for q, i, j, s in vals
    ]


def test_mmr_skips_the_near_duplicate_plain_topk_keeps(spark):
    """Planted redundancy: B is a near-copy of the top result A
    (pair sim 0.99) while C is distinct — plain top-2 is (A, B), MMR
    at λ = 0.7 must pick (A, C, B): 0.7·0.90 − 0.3·0.99 = 0.333 for B
    vs 0.7·0.80 − 0.3·0.10 = 0.530 for C."""
    pool = [(1, 10, 0.95), (1, 20, 0.90), (1, 30, 0.80)]
    pairs = _sym_pairs(
        [(1, 10, 20, 0.99), (1, 10, 30, 0.10), (1, 20, 30, 0.12)]
    )
    got = _mmr(spark, pool, pairs, lam=0.7)
    assert got == [(1, 10), (2, 30), (3, 20)]


def test_mmr_lambda_one_degenerates_to_topk(spark):
    """λ = 1 removes the redundancy penalty entirely: the MMR order
    must equal the plain relevance order even with a planted
    duplicate."""
    pool = [(1, 10, 0.95), (1, 20, 0.90), (1, 30, 0.80)]
    pairs = _sym_pairs(
        [(1, 10, 20, 0.99), (1, 10, 30, 0.10), (1, 20, 30, 0.12)]
    )
    got = _mmr(spark, pool, pairs, lam=1.0)
    assert got == [(1, 10), (2, 20), (3, 30)]


def test_mmr_picks_are_distinct_and_from_pool_on_corpus(spark, sf_dir):
    """On the real corpus: 3 picks per query, all distinct, every pick
    a member of that query's exact top-10 pool, and pick 1 IS the
    plain top-1 (MMR with an empty selected set is pure relevance)."""
    from flume_source_spark.registry import load_all

    qs = load_all()
    mmr = {}
    for r in qs["sim_mmr_rerank"].builder(spark, sf_dir).collect():
        mmr.setdefault(r["qid"], []).append((r["pick"], r["nid"]))
    topk = {}
    for r in qs["sim_cosine_topk"].builder(spark, sf_dir).collect():
        topk.setdefault(r["qid"], []).append(r["nid"])
    assert set(mmr) == set(topk)
    for qid, picks in mmr.items():
        assert [p for p, _ in sorted(picks)] == [1, 2, 3]
        nids = [n for _, n in sorted(picks)]
        assert len(set(nids)) == 3
        assert nids[0] == topk[qid][0]  # pick 1 = plain top-1


def test_prefix_recall_full_dim_pins_exact_million(spark, sf_dir):
    """The P = 64 row of the Matryoshka recall curve compares the
    full-dimension top-k with itself, so its recall must read exactly
    10**6 ppm; the lattice keeps all four prefixes; hit counts are
    bounded by n_queries * K."""
    from flume_source_spark.pipeline.embstats3 import PREFIX_RECALL_K
    from flume_source_spark.registry import load_all

    rows = sorted(
        load_all()["emb_prefix_recall_curve"].builder(spark, sf_dir).collect(),
        key=lambda r: r["prefix_len"],
    )
    assert [r["prefix_len"] for r in rows] == [8, 16, 32, 64]
    full = rows[-1]
    assert full["recall_ppm"] == 1_000_000
    assert full["n_hits"] == full["n_queries"] * PREFIX_RECALL_K
    for r in rows:
        assert 0 <= r["n_hits"] <= r["n_queries"] * PREFIX_RECALL_K


def test_prefix_recall_planted_disjoint_prefix_keeps_zero_row(spark):
    """Planted geometry where the first-8-dim retrieval is MAXIMALLY
    misleading: candidates 4-6 share the query's 8-dim prefix but are
    near-orthogonal in full space, while candidates 1-3 are
    prefix-orthogonal but dominate dims 9+. The full top-3 is {1,2,3},
    the P=8 top-3 is {4,5,6} — disjoint — so the P=8 curve point must
    SURVIVE with recall 0 (the lattice left join) instead of
    vanishing; P in {16, 32, 64} all see dim 9 and read 10**6."""
    from flume_source_spark.pipeline.embstats3 import prefix_recall_from

    def vec(first8, at9=0.0, marker=(0, 0.0)):
        v = first8 + [0.0] * 56
        v[8] = at9
        pos, val = marker
        if val:
            v[pos] = val
        return v

    u = [1.0] + [0.0] * 7   # query's 8-dim prefix direction
    o = [0.0, 1.0] + [0.0] * 6  # orthogonal to u in the prefix
    rows = [
        (0, vec(u, at9=10.0)),              # the query (0 % 100 == 0)
        (1, vec(o, at9=10.0)),              # full-space winners
        (2, vec(o, at9=10.0)),
        (3, vec(o, at9=10.0)),
        (4, vec(u, marker=(10, 0.001))),    # prefix-space decoys
        (5, vec(u, marker=(11, 0.001))),
        (6, vec(u, marker=(12, 0.001))),
    ]
    e = spark.createDataFrame(rows, "vec_id long, v array<double>")
    got = {
        r["prefix_len"]: (r["n_queries"], r["n_hits"], r["recall_ppm"])
        for r in prefix_recall_from(spark, e).collect()
    }
    assert got[8] == (1, 0, 0)
    for p in (16, 32, 64):
        assert got[p] == (1, 3, 1_000_000)


def test_isotropy_planted_geometry(spark):
    """Closed forms of the sum-trick: an identical pair reads mean
    pairwise cosine exactly +1, an orthogonal pair exactly 0, an
    antipodal pair exactly −1; the total row counts everything."""
    from flume_source_spark.pipeline.embstats3 import isotropy_from

    rows = [
        (1, [3.0, 0.0, 0.0, 0.0]), (1, [6.0, 0.0, 0.0, 0.0]),   # identical dir
        (2, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 2.0, 0.0, 0.0]),   # orthogonal
        (3, [0.0, 0.0, 5.0, 0.0]), (3, [0.0, 0.0, -5.0, 0.0]),  # antipodal
    ]
    e = spark.createDataFrame(rows, "label int, v array<double>")
    got = {r["label"]: r for r in isotropy_from(e).collect()}
    assert got[1]["mean_pair_cos"] == 1.0
    assert got[2]["mean_pair_cos"] == 0.0
    assert got[3]["mean_pair_cos"] == -1.0
    assert got[None]["n_vecs"] == 6
    assert -1.0 <= got[None]["mean_pair_cos"] <= 1.0


def test_isotropy_corpus_total_row_is_consistent(spark, sf_dir):
    """On the real corpus: the label-NULL total row's count is the sum
    of the per-label counts, and every mean pairwise cosine is a valid
    cosine."""
    from flume_source_spark.registry import load_all

    rows = load_all()["emb_isotropy_audit"].builder(spark, sf_dir).collect()
    per = [r for r in rows if r["label"] is not None]
    tot = [r for r in rows if r["label"] is None]
    assert len(tot) == 1 and per
    assert tot[0]["n_vecs"] == sum(r["n_vecs"] for r in per)
    for r in rows:
        assert -1.0 <= r["mean_pair_cos"] <= 1.0


def test_mutual_information_perfect_association(spark):
    """A diagonal 3×3 contingency table: MI = H(rows) = H(cols) =
    ln 3, so the normalized MI must read exactly 10⁶ ppm."""
    import math

    from flume_source_spark.operators.quality4 import mutual_information

    cells = spark.createDataFrame(
        [(1, 1, 5), (2, 2, 5), (3, 3, 5)], "r int, c int, o long"
    )
    got = mutual_information(cells).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n"] == 15 and r["n_cells"] == 3
    assert r["mi_nats"] == round(math.log(3), 6)
    assert r["h_rows"] == r["h_cols"] == round(math.log(3), 6)
    assert r["nmi_ppm"] == 1_000_000


def test_mutual_information_exact_independence(spark):
    """A perfectly multiplicative 2×2 table (o = rn·cn/t for every
    cell): every log argument is exactly 1.0, so MI and NMI read
    exactly zero — not merely small."""
    from flume_source_spark.operators.quality4 import mutual_information

    cells = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 2), (2, 1, 2), (2, 2, 4)], "r int, c int, o long"
    )
    got = mutual_information(cells).collect()
    assert len(got) == 1
    assert got[0]["mi_nats"] == 0.0
    assert got[0]["nmi_ppm"] == 0


def test_mutual_information_corpus_bounds(spark, sf_dir):
    """On documents(lang, source): 0 ≤ MI ≤ min(H_rows, H_cols) and
    NMI ∈ [0, 10⁶] ppm (rounding slack one ulp of the 6th decimal)."""
    from flume_source_spark.registry import load_all

    r = load_all()["dq_mutual_information"].builder(spark, sf_dir).collect()[0]
    eps = 1e-6
    assert r["mi_nats"] >= -eps
    assert r["mi_nats"] <= min(r["h_rows"], r["h_cols"]) + eps
    assert 0 <= r["nmi_ppm"] <= 1_000_000
