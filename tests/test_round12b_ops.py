"""Round-12 batch-6 operator tests: winnowing fingerprints (coverage
guarantee, rightmost tie rule, planted near-dup pair detection).

Reference parity note: the reference engine (`CephFsSource.java`,
`CephFSEventReader.java`) has no analytics surface; everything here
belongs to the declared [NS] engine surface (SURVEY.md §2.2).
"""
from __future__ import annotations

import pyspark.sql.functions as F


def test_winnowing_coverage_guarantee_on_corpus(spark, sf_dir):
    """The paper's selection guarantee: every window of W consecutive
    k-gram hashes contributes a fingerprint, so within a document the
    gap between consecutive selected POSITIONS is at most W, and the
    first selection sits in the first window (pos ≤ W). Checked for
    every corpus document — this is the property that makes shared
    runs of ≥ W + K - 1 tokens detectable."""
    from flume_source_spark.pipeline.text15 import (
        WINNOW_W,
        winnow_fingerprints,
    )
    from flume_source_spark.tables import load_tables

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    fp = winnow_fingerprints(d)
    from pyspark.sql import Window

    gaps = (
        fp.select("doc_id", "pos")
        .distinct()
        .withColumn(
            "prev",
            F.lag("pos").over(
                Window.partitionBy("doc_id").orderBy("pos")
            ),
        )
        .withColumn("gap", F.col("pos") - F.coalesce("prev", F.lit(0)))
        .agg(F.max("gap").alias("max_gap"), F.min("pos").alias("min_first"))
        .collect()[0]
    )
    assert gaps["max_gap"] <= WINNOW_W
    assert gaps["min_first"] >= 1


def test_winnowing_rightmost_tie_rule(spark):
    """All-equal-hash document ('a' × 9 → six identical 'a a a'
    grams): every window's minimum is shared by all W members, so the
    rightmost rule must select the window's LAST position — the
    selected set is exactly {W, W+1, ..., n_grams}. A leftmost (or
    undefined) tie rule would return {1} ∪ ... and fail this."""
    from flume_source_spark.pipeline.text15 import (
        WINNOW_W,
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(["a"] * 9))], "doc_id long, text string"
    )
    got = sorted(
        r["pos"] for r in winnow_fingerprints(docs).collect()
    )
    n_grams = 9 - 2
    assert got == list(range(WINNOW_W, n_grams + 1))


def test_winnowing_short_doc_single_window(spark):
    """A document with fewer grams than the window width still
    fingerprints: the whole gram sequence is one window (the
    least(W, n) anchor), selecting exactly one (pos, hash)."""
    from flume_source_spark.pipeline.text15 import winnow_fingerprints

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    got = winnow_fingerprints(docs).collect()
    assert len(got) == 1  # 2 grams < W=4 → one window, one selection


def test_winnowing_planted_shared_run_detected(spark):
    """Two documents sharing a W + K - 1 = 7-token run must share at
    least one fingerprint (the coverage guarantee applied to the
    shared window), and an unrelated third document must share none —
    the MOSS detection property the dup-pairs report is built on."""
    from flume_source_spark.pipeline.text15 import winnow_fingerprints

    shared = "one two three four five six seven"
    docs = spark.createDataFrame(
        [
            (1, "intro words here " + shared + " tail alpha"),
            (2, "different prefix tokens " + shared + " other ending"),
            (3, "completely unrelated vocabulary with nothing common"),
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs)
    pairs = (
        fp.alias("a")
        .join(fp.alias("b"), "hx")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j")
        )
        .distinct()
        .collect()
    )
    got = {(r["i"], r["j"]) for r in pairs}
    assert (1, 2) in got
    assert not any(3 in p for p in got)


def test_resource_allocation_planted_star_and_path(spark):
    """Closed-form RA on planted topologies: leaves of a 4-leaf star
    share only the hub (deg 4) -> ra = 1e6 div 4 = 250,000 micro;
    path ends share the middle (deg 2) -> ra = 500,000 micro; all
    planted pairs have cn = 1 and pref_attach = 1."""
    from flume_source_spark.pipeline.graph7 import resource_allocation

    # star: hub 100 - leaves 1..4; path: 10 - 20 - 30
    edges = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 100), (10, 20), (20, 30)],
        "i long, j long",
    )
    rows = {(r["i"], r["j"]): r.asDict() for r in resource_allocation(edges).collect()}
    assert rows[(1, 2)]["ra_micro"] == 250_000
    assert rows[(1, 2)]["cn"] == 1 and rows[(1, 2)]["pref_attach"] == 1
    assert rows[(10, 30)]["ra_micro"] == 500_000
    # all six leaf pairs of the star present, no adjacent pair leaks
    assert sum(1 for (i, j) in rows if j == 100 or i == 100) == 0
    assert len([p for p in rows if p[0] < 5 and p[1] < 5]) == 6


def test_resource_allocation_discounts_hubs(spark):
    """The predictor's reason to exist: equal common-neighbor counts,
    different evidence strength — a pair sharing a RARE neighbor
    (deg 2) must outscore a pair sharing only a HUB (deg 5), which
    plain common-neighbors cannot separate."""
    from flume_source_spark.pipeline.graph7 import resource_allocation

    edges = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9), (4, 9), (5, 9), (11, 13), (12, 13)],
        "i long, j long",
    )
    rows = {(r["i"], r["j"]): r.asDict() for r in resource_allocation(edges).collect()}
    hub_pair = rows[(1, 2)]
    rare_pair = rows[(11, 12)]
    assert hub_pair["cn"] == rare_pair["cn"] == 1
    assert rare_pair["ra_micro"] > hub_pair["ra_micro"]
    assert hub_pair["ra_micro"] == 200_000 and rare_pair["ra_micro"] == 500_000


def test_resource_allocation_matches_cn_frame_on_corpus(spark, sf_dir):
    """Consistency anchor to the registered common-neighbors query:
    same radius, same edge set -> identical (i, j, cn) support; RA
    adds the weights without changing the candidate set."""
    from flume_source_spark.pipeline.graph2 import similarity_edges
    from flume_source_spark.pipeline.graph3 import common_neighbors
    from flume_source_spark.pipeline.graph7 import (
        _RA_RADIUS,
        resource_allocation,
    )

    e = similarity_edges(spark, sf_dir, _RA_RADIUS).select("i", "j")
    cn = {(r["i"], r["j"]): r["cn"] for r in common_neighbors(e).collect()}
    ra = {(r["i"], r["j"]): r["cn"] for r in resource_allocation(e).collect()}
    assert cn == ra


def test_brier_perfectly_calibrated_forecast(spark):
    """Exact-division calibrated fixture (q=250: 1/4 positive, q=750:
    3/4 positive -> obar = 1/2 exact): reliability must be exactly 0,
    resolution 62,500 ppm, uncertainty 250,000 ppm, Brier = REL - RES
    + UNC = 187,500 ppm with zero flooring gap."""
    from flume_source_spark.operators.quality5 import brier_decomposition

    rows = [(250, 1)] + [(250, 0)] * 3 + [(750, 1)] * 3 + [(750, 0)]
    obs = spark.createDataFrame(rows, "q long, o long")
    r = brier_decomposition(obs).collect()[0].asDict()
    assert r["n"] == 8 and r["n_pos"] == 4 and r["n_bins"] == 2
    assert r["reliability_ppm"] == 0
    assert r["resolution_ppm"] == 62_500
    assert r["uncertainty_ppm"] == 250_000
    assert r["brier_ppm"] == 187_500
    assert r["decomp_gap_ppm"] == 0


def test_brier_constant_forecast_has_zero_resolution(spark):
    """A constant forecast cannot resolve anything: RES = 0 by
    definition; at q = 500 with base rate 1/2 it is also perfectly
    calibrated (REL = 0), so BS = UNC = 250,000 ppm exactly."""
    from flume_source_spark.operators.quality5 import brier_decomposition

    obs = spark.createDataFrame(
        [(500, 1), (500, 0), (500, 1), (500, 0)], "q long, o long"
    )
    r = brier_decomposition(obs).collect()[0].asDict()
    assert r["resolution_ppm"] == 0
    assert r["reliability_ppm"] == 0
    assert r["brier_ppm"] == 250_000 == r["uncertainty_ppm"]
    assert r["decomp_gap_ppm"] == 0


def test_brier_identity_gap_bounded_on_corpus(spark, sf_dir):
    """On the real corpus the Murphy identity holds up to per-bin
    flooring: |BS - (REL - RES + UNC)| <= 2 ppm per bin, all
    components non-negative, and UNC <= 250,000 ppm (its p(1-p)
    maximum)."""
    from flume_source_spark.registry import load_all

    qs = load_all()
    r = (
        qs["dq_brier_decomposition"]
        .builder(spark, sf_dir)
        .collect()[0]
        .asDict()
    )
    for c in ("brier_ppm", "reliability_ppm", "resolution_ppm", "uncertainty_ppm"):
        assert r[c] >= 0, (c, r)
    assert r["uncertainty_ppm"] <= 250_000
    assert abs(r["decomp_gap_ppm"]) <= 2 * r["n_bins"] + 2


def test_hurst_constant_series_yields_empty(spark):
    """A constant series has zero variance in every block -> R/S is
    undefined everywhere -> no rs rows and no summary row (empty
    frame on both engines, not a NULL-laden row)."""
    from flume_source_spark.operators.timeseries11 import hurst_rescaled_range

    series = spark.createDataFrame(
        [(p, 5) for p in range(1, 129)], "p long, x long"
    )
    assert hurst_rescaled_range(series).count() == 0


def test_hurst_block_counts_and_ordering(spark):
    """Block accounting is exact (n_blocks = N div n for a 128-point
    series) and the estimator separates the two canonical regimes:
    a strictly alternating series (anti-persistent) must have a lower
    Hurst slope than a monotone ramp (maximally persistent)."""
    from flume_source_spark.operators.timeseries11 import hurst_rescaled_range

    alt = spark.createDataFrame(
        [(p, p % 2) for p in range(1, 129)], "p long, x long"
    )
    ramp = spark.createDataFrame(
        [(p, p) for p in range(1, 129)], "p long, x long"
    )
    ra = {r["block_size"]: r.asDict() for r in hurst_rescaled_range(alt).collect()}
    rr = {r["block_size"]: r.asDict() for r in hurst_rescaled_range(ramp).collect()}
    for n in (8, 16, 32, 64):
        assert ra[n]["n_blocks"] == 128 // n
        assert rr[n]["n_blocks"] == 128 // n
    h_alt = ra[None]["hurst_r4"]
    h_ramp = rr[None]["hurst_r4"]
    assert h_alt < 0.3  # alternating: R/S flat in n
    assert h_ramp > 0.9  # ramp: R/S grows ~linearly in n
    assert h_alt < h_ramp


def test_hurst_alternating_closed_form_block8(spark):
    """Closed form at n = 8 for x = 1,0,1,0,...: block sum S_b = 4,
    prefix deviates n*Z_t = 8*P_t - 4t peak at +4 after each 1 and
    return to 0 after each 0 -> R_num = 4 - (-0)... computed: max 4,
    min 0 -> R_num = 4; V_num = 8*4 - 16 = 16 -> R/S = 4/sqrt(16) = 1
    exactly, for every block."""
    from flume_source_spark.operators.timeseries11 import hurst_rescaled_range

    series = spark.createDataFrame(
        [(p, 1 if p % 2 == 1 else 0) for p in range(1, 129)],
        "p long, x long",
    )
    rows = {r["block_size"]: r.asDict() for r in hurst_rescaled_range(series).collect()}
    assert rows[8]["rs_r4"] == 1.0


def test_hurst_corpus_sane(spark, sf_dir):
    """Corpus anchor: 4 block-size rows + 1 summary row; the hourly
    event-count series yields a Hurst slope in the meaningful band
    (0, 1.2) and every rs mean is positive."""
    from flume_source_spark.registry import load_all

    qs = load_all()
    rows = qs["ts_hurst_rs"].builder(spark, sf_dir).collect()
    assert len(rows) == 5
    by = {r["block_size"]: r.asDict() for r in rows}
    for n in (8, 16, 32, 64):
        assert by[n]["rs_r4"] > 0
    assert 0.0 < by[None]["hurst_r4"] < 1.2


def test_copurchase_planted_baskets(spark):
    """Closed-form projection: order 1 = {10, 20, 30} emits its 3
    pairs, order 2 = {10, 20} reinforces (10, 20) -> count 2; a
    single-item order emits nothing; an over-cap basket (17 parts)
    emits nothing (the hub cap)."""
    from flume_source_spark.pipeline.graph8 import bipartite_copurchase

    rows = (
        [(1, 10), (1, 20), (1, 30), (2, 10), (2, 20), (3, 99)]
        + [(4, 1000 + i) for i in range(17)]
    )
    edges = spark.createDataFrame(rows, "o long, p long")
    got = {(r["p1"], r["p2"]): r["n_orders"] for r in bipartite_copurchase(edges).collect()}
    assert got == {(10, 20): 2, (10, 30): 1, (20, 30): 1}


def test_copurchase_dedups_repeat_lines(spark):
    """The same part appearing on two lines of one order counts once
    (collect_set semantics; the oracle's DISTINCT twin): a duplicated
    (o, p) edge must not double the pair count."""
    from flume_source_spark.pipeline.graph8 import bipartite_copurchase

    edges = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 20)], "o long, p long"
    )
    got = {(r["p1"], r["p2"]): r["n_orders"] for r in bipartite_copurchase(edges).collect()}
    assert got == {(10, 20): 1}


def test_kneser_ney_planted_fractions(spark):
    """Hand-computed KN on 'a b a b a c' (D = 3/4): bigram types
    (a,b)x2 (b,a)x2 (a,c)x1, N_bb = 3, N1+(a.) = 2, N1+(b.) = 1,
    continuation counts all 1. Exact ppm: P(b|a) = 21e6/36 = 583,333;
    P(a|b) = 18e6/24 = 750,000; P(c|a) = 9e6/36 = 250,000."""
    from flume_source_spark.pipeline.text16 import kneser_ney_bigrams

    docs = spark.createDataFrame([(1, "a b a b a c")], "doc_id long, text string")
    rows = {(r["w1"], r["w2"]): r.asDict() for r in kneser_ney_bigrams(docs).collect()}
    assert rows[("a", "b")]["p_kn_ppm"] == 583_333
    assert rows[("b", "a")]["p_kn_ppm"] == 750_000
    assert rows[("a", "c")]["p_kn_ppm"] == 250_000
    assert rows[("a", "b")]["nbb"] == 3
    assert rows[("a", "b")]["n1w1"] == 2 and rows[("b", "a")]["n1w1"] == 1
    # the discount is visible: MLE of (a,b) is 2/3 = 666,666 ppm > KN
    assert rows[("a", "b")]["p_mle_ppm"] == 666_666
    assert rows[("a", "b")]["p_kn_ppm"] < rows[("a", "b")]["p_mle_ppm"]


def test_kneser_ney_observed_mass_identity(spark):
    """Probability accounting on the planted corpus: for context 'a',
    the observed KN mass plus the backoff share of UNSEEN
    continuations must reconstruct 1 exactly (in fractions:
    0.583333 + 0.25 + lambda(a) * P_cont(a) = 1 with lambda(a) = 1/2,
    P_cont(a) = 1/3) -> observed sum = 833,333 ppm (floored terms)."""
    from flume_source_spark.pipeline.text16 import kneser_ney_bigrams

    docs = spark.createDataFrame([(1, "a b a b a c")], "doc_id long, text string")
    rows = {(r["w1"], r["w2"]): r.asDict() for r in kneser_ney_bigrams(docs).collect()}
    observed_a = rows[("a", "b")]["p_kn_ppm"] + rows[("a", "c")]["p_kn_ppm"]
    # unseen mass for context a = D * N1w1/c1 * P_cont(a) = 1/6
    assert observed_a + 166_666 in (999_999, 1_000_000)


def test_kneser_ney_corpus_bounds(spark, sf_dir):
    """Corpus anchor: 30 rows, every probability in (0, 1e6], KN
    bounded above by interpolating toward certainty, and every top
    bigram's components consistent (c12 <= c1, ncont <= nbb)."""
    from flume_source_spark.registry import load_all

    qs = load_all()
    rows = [r.asDict() for r in qs["text_kneser_ney_bigram"].builder(spark, sf_dir).collect()]
    assert len(rows) == 30
    for r in rows:
        assert 0 < r["p_kn_ppm"] <= 1_000_000
        assert r["c12"] <= r["c1"]
        assert r["ncont"] <= r["nbb"]


def test_lift_gain_perfect_ranker(spark):
    """A perfect ranker (all 4 positives hold the top scores of 20
    docs): the top two deciles (2 docs each) capture everything ->
    capture = 1e6 by decile 2, decile-1 lift = (2/2)/(4/20) = 5e6
    ppm, and every later decile has zero positives."""
    from flume_source_spark.operators.quality5 import lift_gain_deciles

    rows = [(i, 1000 - i, 1 if i < 4 else 0) for i in range(20)]
    scored = spark.createDataFrame(rows, "doc_id long, score long, o long")
    got = {r["decile"]: r.asDict() for r in lift_gain_deciles(scored).collect()}
    assert got[1]["n_pos"] == 2 and got[2]["n_pos"] == 2
    assert got[2]["capture_ppm"] == 1_000_000
    assert got[1]["lift_ppm"] == 5_000_000
    assert all(got[d]["n_pos"] == 0 for d in range(3, 11))
    assert got[10]["cum_lift_ppm"] == 1_000_000  # full-corpus lift is exact 1


def test_lift_gain_uninformative_score_is_flat(spark):
    """A score carrying no signal (positives alternate down the
    ranking): every decile's lift is exactly 1e6 ppm and capture
    climbs linearly (100,000 ppm per decile at 50% base rate)."""
    from flume_source_spark.operators.quality5 import lift_gain_deciles

    rows = [(i, 1000 - i, i % 2) for i in range(20)]
    scored = spark.createDataFrame(rows, "doc_id long, score long, o long")
    got = {r["decile"]: r.asDict() for r in lift_gain_deciles(scored).collect()}
    for d in range(1, 11):
        assert got[d]["lift_ppm"] == 1_000_000
        assert got[d]["capture_ppm"] == d * 100_000


def test_lift_gain_corpus_monotone(spark, sf_dir):
    """Corpus anchor: capture is non-decreasing in decile, ends at
    exactly 1e6, and the full-corpus cumulative lift is exactly 1e6
    (cum_pos = P, cum_n = N cancel)."""
    from flume_source_spark.registry import load_all

    qs = load_all()
    rows = sorted(
        (r.asDict() for r in qs["dq_lift_gain_deciles"].builder(spark, sf_dir).collect()),
        key=lambda r: r["decile"],
    )
    caps = [r["capture_ppm"] for r in rows]
    assert caps == sorted(caps)
    assert caps[-1] == 1_000_000
    assert rows[-1]["cum_lift_ppm"] == 1_000_000


def test_hits_star_saturates(spark):
    """Star fixture (1,2,3 -> 100): the center is the unique
    authority at exactly 1e6 and every hub normalizes to exactly 1e6
    in every round."""
    from flume_source_spark.pipeline.graph9 import hits_scores

    edges = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100)], "src long, dst long"
    )
    got = {(r["kind"], r["id"]): r["score_micro"] for r in hits_scores(edges).collect()}
    assert got[("authority", 100)] == 1_000_000
    assert got[("hub", 1)] == got[("hub", 2)] == got[("hub", 3)] == 1_000_000


def test_hits_global_normalization_decays_minor_component(spark):
    """Two components, one twice as strong: the minor component's
    scores halve against the GLOBAL leader every round — after 3
    rounds authority(200) = hub(3) = 125,000 micro exactly (the
    closed-form geometric decay of the scaled-integer recursion)."""
    from flume_source_spark.pipeline.graph9 import hits_scores

    edges = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 200)], "src long, dst long"
    )
    got = {(r["kind"], r["id"]): r["score_micro"] for r in hits_scores(edges).collect()}
    assert got[("authority", 100)] == 1_000_000
    assert got[("authority", 200)] == 125_000
    assert got[("hub", 3)] == 125_000


def test_seasonal_strength_pure_signal_is_full(spark):
    """A planted y = a + b*t + s_{t mod 7} series decomposes EXACTLY
    (the timeseries8 model-test property: residual == 0 identically),
    so both strengths must be exactly 1e6 ppm."""
    import datetime as dt

    from flume_source_spark.operators.timeseries12 import seasonal_strength

    season = [0, 5, -3, 7, -2, 4, 1]
    rows = [
        ("a", dt.date(2024, 1, 1) + dt.timedelta(days=t), 100 + 2 * t + season[t % 7])
        for t in range(28)
    ]
    daily = spark.createDataFrame(rows, "event_type string, d date, y long")
    r = seasonal_strength(daily).collect()[0].asDict()
    assert r["seasonal_strength_ppm"] == 1_000_000
    assert r["trend_strength_ppm"] == 1_000_000


def test_seasonal_strength_constant_series_is_null(spark):
    """A constant series: trend equals the series, residual and
    seasonal are zero -> both variance denominators are 0 -> NULL
    strengths (no fabricated number), n_days still published."""
    import datetime as dt

    from flume_source_spark.operators.timeseries12 import seasonal_strength

    rows = [
        ("a", dt.date(2024, 1, 1) + dt.timedelta(days=t), 50)
        for t in range(21)
    ]
    daily = spark.createDataFrame(rows, "event_type string, d date, y long")
    r = seasonal_strength(daily).collect()[0].asDict()
    assert r["seasonal_strength_ppm"] is None
    assert r["trend_strength_ppm"] is None
    assert r["n_days"] == 21 - 6  # full 7-day MA windows only


def test_seasonal_strength_corpus_bounds(spark, sf_dir):
    """Corpus anchor: one row per event_type, strengths in [0, 1e6]
    when defined, n_days = the decompose frame's row count per
    type."""
    from flume_source_spark.registry import load_all

    qs = load_all()
    rows = [r.asDict() for r in qs["ts_seasonal_strength"].builder(spark, sf_dir).collect()]
    assert len(rows) == 5
    for r in rows:
        for c in ("seasonal_strength_ppm", "trend_strength_ppm"):
            if r[c] is not None:
                assert 0 <= r[c] <= 1_000_000


def test_cdc_resynchronizes_after_prefix_insertion(spark):
    """The CDC selling point: prepending tokens shifts positions but
    boundaries are CONTENT-defined, so the edited copy re-aligns and
    shares almost all chunk fingerprints with the original (only
    chunks up to the first cut after the edit can differ). Fixed-size
    blocking would share none."""
    from flume_source_spark.pipeline.dedup3 import cdc_chunks

    import itertools
    import string

    words = [
        a + b + c
        for a, b, c in itertools.product(string.ascii_lowercase, repeat=3)
    ][:400]
    base = " ".join(words)
    docs = spark.createDataFrame(
        [(1, base), (2, "inserted prefix tokens " + base)],
        "doc_id long, text string",
    )
    ch = cdc_chunks(docs).collect()
    fps = {1: set(), 2: set()}
    for r in ch:
        fps[r["doc_id"]].add(r["fp"])
    shared = fps[1] & fps[2]
    # doc 1's chunks are nearly all recovered inside doc 2
    assert len(shared) >= len(fps[1]) - 2
    assert len(shared) > 0


def test_cdc_chunks_end_on_cuts(spark):
    """The cut rule: within a document every chunk except the last
    ends exactly at a gram with hash % MODULUS == 0, and chunk ids
    are the dense 0..k sequence (the exclusive prefix-sum
    construction)."""
    from flume_source_spark.pipeline.dedup3 import CDC_MODULUS, cdc_chunks
    from flume_source_spark.pipeline.text15 import winnow_fingerprints  # noqa: F401

    import itertools
    import string

    base = " ".join(
        [a + b + c for a, b, c in itertools.product(string.ascii_lowercase, repeat=3)][:300]
    )
    docs = spark.createDataFrame([(1, base)], "doc_id long, text string")
    ch = sorted(
        (r["c"], r["len"]) for r in cdc_chunks(docs).collect()
    )
    ids = [c for c, _ in ch]
    assert ids == list(range(len(ids)))
    assert sum(l for _, l in ch) == 300 - 2  # every gram in exactly one chunk


def test_cdc_identical_docs_fully_duplicate(spark):
    """Two identical documents produce identical chunk sets — the
    degenerate case the dup_ppm accounting must count fully: every
    fingerprint appears twice, so distinct = chunks/2."""
    from flume_source_spark.pipeline.dedup3 import cdc_chunks

    import itertools
    import string

    base = " ".join(
        [a + b + c for a, b, c in itertools.product(string.ascii_lowercase, repeat=3)][:200]
    )
    docs = spark.createDataFrame(
        [(1, base), (2, base)], "doc_id long, text string"
    )
    ch = cdc_chunks(docs).collect()
    n = len(ch)
    assert n % 2 == 0
    assert len({r["fp"] for r in ch}) == n // 2


def test_mattr_closed_forms(spark):
    """Closed-form diversity fixtures: an all-identical 50-token doc
    reads MATTR = 1e6/25 = 40,000 ppm; an all-distinct 50-token doc
    reads exactly 1e6; a period-5 cycle reads 5/25 = 200,000 ppm.
    Plain TTR shrinks with length on the repeated docs while MATTR
    stays at the window-defined value - the length-invariance MATTR
    exists for."""
    import itertools
    import string

    from flume_source_spark.pipeline.text16 import mattr_diversity

    distinct = [
        a + b + c for a, b, c in itertools.product(string.ascii_lowercase, repeat=3)
    ]
    docs = spark.createDataFrame(
        [
            (1, " ".join(["same"] * 50)),
            (2, " ".join(distinct[:50])),
            (3, " ".join((distinct[:5] * 10))),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in mattr_diversity(docs).collect()}
    assert rows[1]["mattr_ppm"] == 40_000
    assert rows[2]["mattr_ppm"] == 1_000_000
    assert rows[3]["mattr_ppm"] == 200_000
    assert rows[1]["ttr_ppm"] == 20_000  # 1/50: TTR conflates repetition with length
    assert rows[2]["ttr_ppm"] == 1_000_000


def test_mattr_short_doc_null(spark):
    """A document shorter than the window completes no window ->
    MATTR NULL, TTR still defined."""
    from flume_source_spark.pipeline.text16 import mattr_diversity

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    r = mattr_diversity(docs).collect()[0].asDict()
    assert r["mattr_ppm"] is None
    assert r["ttr_ppm"] == 1_000_000


def test_mann_whitney_complete_separation(spark):
    """All group-1 values above all group-2 values: U hits its
    maximum n1*n2 (doubled: 2*n1*n2), AUC = 1e6 exactly, z > 0."""
    from flume_source_spark.operators.timeseries12 import mann_whitney_u

    rows = [(100 + i, 1) for i in range(5)] + [(i, 0) for i in range(7)]
    obs = spark.createDataFrame(rows, "v long, g1 long")
    r = mann_whitney_u(obs).collect()[0].asDict()
    assert r["u1_x2"] == 2 * 5 * 7
    assert r["auc_ppm"] == 1_000_000
    assert r["z_r4"] > 0


def test_mann_whitney_all_tied_is_exact_half(spark):
    """Every observation shares one value: midranks make U exactly
    n1*n2/2 (AUC 500,000 ppm); the tie-corrected variance hits 0 so z
    divides by zero -> NULL/NaN-free contract matters: variance
    (n+1)n(n-1) - T is 0 when ALL values tie, and both engines emit
    the same non-finite-free result only because the numerator is
    also 0 -> we pin AUC and U here, not z."""
    from flume_source_spark.operators.timeseries12 import mann_whitney_u

    rows = [(42, 1)] * 3 + [(42, 0)] * 5
    obs = spark.createDataFrame(rows, "v long, g1 long")
    r = mann_whitney_u(obs).collect()[0].asDict()
    assert r["u1_x2"] == 3 * 5  # 2*U1 = n1*n2 at the exact center
    assert r["auc_ppm"] == 500_000
    assert r["tie_term"] == 8**3 - 8


def test_mann_whitney_hand_ranked_case(spark):
    """Hand-computed 2v2 with one tie: values g1={10, 20}, g2={10,
    30}. Midranks: 10 -> 1.5, 20 -> 3, 30 -> 4. R1 = 4.5, U1 = R1 -
    n1(n1+1)/2 = 1.5 -> u1_x2 = 3; AUC = 1.5/4 = 375,000 ppm."""
    from flume_source_spark.operators.timeseries12 import mann_whitney_u

    obs = spark.createDataFrame(
        [(10, 1), (20, 1), (10, 0), (30, 0)], "v long, g1 long"
    )
    r = mann_whitney_u(obs).collect()[0].asDict()
    assert r["u1_x2"] == 3
    assert r["auc_ppm"] == 375_000


def test_burstiness_uniform_term_closed_form(spark):
    """A term appearing exactly once in every document: c = 1
    everywhere, so VMR = (N*N - N^2)/(N*N) = 0 -> maximally
    NON-bursty, vmr_ppm = 0; mean_count_ppm = 1e6."""
    from flume_source_spark.pipeline.text16 import term_burstiness

    docs = spark.createDataFrame(
        [(i, "common filler") for i in range(8)], "doc_id long, text string"
    )
    rows = {r["w"]: r.asDict() for r in term_burstiness(docs).collect()}
    assert rows["common"]["vmr_ppm"] == 0
    assert rows["common"]["mean_count_ppm"] == 1_000_000
    assert rows["common"]["df"] == 8 and rows["common"]["tf"] == 8


def test_burstiness_concentrated_term_reads_high(spark):
    """A term occurring 8 times in ONE doc of 8: Sum c = 8, Sum c^2 =
    64 -> VMR = (8*64 - 64)/(8*8) = 7 -> 7,000,000 ppm — burstiness
    equals the concentration, exactly the Church-Gale contrast with
    the uniform term above."""
    from flume_source_spark.pipeline.text16 import term_burstiness

    docs = spark.createDataFrame(
        [(0, " ".join(["bursty"] * 8) + " filler")]
        + [(i, "plain filler") for i in range(1, 8)],
        "doc_id long, text string",
    )
    rows = {r["w"]: r.asDict() for r in term_burstiness(docs).collect()}
    assert rows["bursty"]["vmr_ppm"] == 7_000_000
    assert rows["filler"]["vmr_ppm"] == 0


def test_ljung_box_alternating_series(spark):
    """A strictly alternating series has lag-1 autocorrelation near
    -1 (exactly -n/(n-1) scaled: y_t y_{t-1} < 0 for every pair) and
    a large Q: r_1 ppm must be <= -900,000 and Q grows with every
    lag (cumulative by construction)."""
    import datetime as dt

    from flume_source_spark.operators.timeseries12 import ljung_box

    rows = [
        ("a", dt.datetime(2024, 1, 1) + dt.timedelta(hours=t), 100 if t % 2 else 0)
        for t in range(64)
    ]
    hourly = spark.createDataFrame(
        rows, "event_type string, bucket timestamp, cents long"
    )
    got = {r["lag"]: r.asDict() for r in ljung_box(hourly).collect()}
    assert got[1]["r_ppm"] <= -900_000
    qs = [got[k]["q_cum_ppm"] for k in range(1, 7)]
    assert qs == sorted(qs)
    assert qs[0] > 60 * 1_000_000  # Q ~ n r^2 >> chi2_1 in ppm


def test_ljung_box_white_noise_small_q(spark):
    """A low-autocorrelation fixture (a fixed pseudo-random
    permutation of 0..63 as the series): every |r_k| far from 1e6 and
    Q(6) far below the alternating fixture's - the separation the
    test exists to provide."""
    import datetime as dt

    from flume_source_spark.operators.timeseries12 import ljung_box

    vals = [(i * 37) % 64 for i in range(64)]  # full-cycle permutation
    rows = [
        ("a", dt.datetime(2024, 1, 1) + dt.timedelta(hours=t), vals[t])
        for t in range(64)
    ]
    hourly = spark.createDataFrame(
        rows, "event_type string, bucket timestamp, cents long"
    )
    got = {r["lag"]: r.asDict() for r in ljung_box(hourly).collect()}
    assert all(abs(got[k]["r_ppm"]) < 500_000 for k in range(1, 7))
    assert got[6]["q_cum_ppm"] < 60 * 1_000_000


def test_hurst_single_block_size_has_no_summary(spark):
    """A 12-point series completes blocks only at n = 8: the log-log
    regression would be degenerate (one x), so no summary row is
    emitted (ANSI Spark would otherwise throw DIVIDE_BY_ZERO) - only
    the n = 8 rs row appears."""
    from flume_source_spark.operators.timeseries11 import hurst_rescaled_range

    series = spark.createDataFrame(
        [(p, p % 3) for p in range(1, 13)], "p long, x long"
    )
    rows = hurst_rescaled_range(series).collect()
    assert [r["block_size"] for r in rows] == [8]


def test_geo_knn_planted_grid(spark):
    """Planted colinear points at x = 0, 10, 25, 45, 1000 (radius
    100): point 2's neighbors rank (3: d=15, 1: d=25, 4: d=... wait -
    computed: |25-45|=20 < |25-0|=25) -> order is 10(d15), 45(d20),
    0(d25); the far point at 1000 is absent entirely; rank ties on
    equal distance break by smaller id."""
    from flume_source_spark.operators.geo2 import knn_from_pairs
    from flume_source_spark.operators.geo import grid_pairs

    pts = spark.createDataFrame(
        [(1, 0, 0), (2, 10, 0), (3, 25, 0), (4, 45, 0), (5, 1000, 0)],
        "id long, lat_cd long, lon_cd long",
    )
    got = {}
    for r in knn_from_pairs(grid_pairs(pts, radius=100)).collect():
        got.setdefault(r["i"], []).append((r["rk"], r["nn_id"], r["d2"]))
    assert got[3] == [(1, 2, 225), (2, 4, 400), (3, 1, 625)]
    assert 5 not in got
    assert [j for _, j, _ in got[1]] == [2, 3, 4]


def test_geo_knn_equidistant_tie_breaks_by_id(spark):
    """Two neighbors at the same distance rank by smaller id - the
    determinism contract both engines share."""
    from flume_source_spark.operators.geo2 import knn_from_pairs
    from flume_source_spark.operators.geo import grid_pairs

    pts = spark.createDataFrame(
        [(1, 50, 50), (2, 50, 60), (3, 50, 40)],
        "id long, lat_cd long, lon_cd long",
    )
    got = [
        (r["rk"], r["nn_id"])
        for r in knn_from_pairs(grid_pairs(pts, radius=100)).collect()
        if r["i"] == 1
    ]
    assert got == [(1, 2), (2, 3)]


def test_balanced_undersample_quotas_and_determinism(spark):
    """Every class keeps exactly n_min = the smallest class's size;
    the kept manifest digest is invariant to input row order (the
    selection is a pure function of (doc_id, lang))."""
    from flume_source_spark.pipeline.dataset9 import balanced_undersample

    rows = [(i, "en") for i in range(20)] + [(100 + i, "de") for i in range(7)] + [
        (200 + i, "fr") for i in range(12)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    a = {r["lang"]: r.asDict() for r in balanced_undersample(docs).collect()}
    assert all(a[l]["n_kept"] == 7 for l in ("en", "de", "fr"))
    assert a["en"]["n_orig"] == 20 and a["de"]["n_orig"] == 7
    # de keeps everything -> digest is the full-class digest
    assert a["de"]["sum_kept_ids"] == sum(range(100, 107))
    shuffled = spark.createDataFrame(list(reversed(rows)), "doc_id long, lang string")
    b = {r["lang"]: r.asDict() for r in balanced_undersample(shuffled).collect()}
    assert a == b


def test_balanced_undersample_minority_set_stable_under_majority_growth(spark):
    """Adding documents to a majority class must not change which
    minority documents are kept (per-class md5 ranking is
    class-local even though the implementation ranks globally)."""
    from flume_source_spark.pipeline.dataset9 import balanced_undersample

    base = [(i, "en") for i in range(10)] + [(100 + i, "de") for i in range(5)]
    grown = base + [(50 + i, "en") for i in range(10)]
    a = {r["lang"]: r.asDict() for r in balanced_undersample(
        spark.createDataFrame(base, "doc_id long, lang string")).collect()}
    b = {r["lang"]: r.asDict() for r in balanced_undersample(
        spark.createDataFrame(grown, "doc_id long, lang string")).collect()}
    assert a["de"] == b["de"]


def test_balanced_undersample_plan_is_distributed(spark, sf_dir):
    """The CORPUS-facing rank must ride the global_order helper (its
    row_number window partitioned by __go_bucket), not a
    low-cardinality per-lang window. The plan legitimately contains
    ONE unpartitioned window + single-partition sort - over the
    per-class COUNT table (<= #langs rows, the accepted
    post-aggregation bounded class) - so the pin targets the corpus
    window specifically: every row_number window whose ordering
    includes the md5 hash column (the corpus rank) must carry the
    bucket partition."""
    import re

    from flume_source_spark.registry import load_all

    qs = load_all()
    p = (
        qs["ds_balanced_undersample"]
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "__go_bucket" in p  # the helper's bucket column is in play
    for ln in p.splitlines():
        m = re.search(r"\bWindow \[[^]]*row_number[^]]*\], \[([^]]*)\]", ln)
        if m is not None and re.search(r"\bh#\d+", ln):
            assert "__go_bucket" in ln, f"corpus rank not bucketed: {ln.strip()}"


def test_pacf_lag1_equals_acf_lag1(spark, sf_dir):
    """By definition pacf(1) = r(1) - pinned on the corpus for every
    event_type, anchoring the PACF to the registered Ljung-Box ACF."""
    from flume_source_spark.registry import load_all

    qs = load_all()
    pacf = {
        r["event_type"]: r.asDict()
        for r in qs["ts_pacf_durbin_levinson"].builder(spark, sf_dir).collect()
    }
    lb = {
        (r["event_type"], r["lag"]): r["r_ppm"]
        for r in qs["ts_ljung_box"].builder(spark, sf_dir).collect()
    }
    for et, row in pacf.items():
        assert row["pacf1_ppm"] == row["r1_ppm"] == lb[(et, 1)]


def test_pacf_smooth_series_damps_higher_lags(spark):
    """An AR(1)-like smooth ramp: r1, r2, r3 all large and positive,
    but once lag 1 is partialled out the higher partials shrink -
    |pacf2| and |pacf3| both well under pacf1 (the AR-order
    fingerprint the recursion exists to expose)."""
    import datetime as dt

    from flume_source_spark.operators.timeseries12 import pacf_durbin_levinson

    rows = [
        ("a", dt.datetime(2024, 1, 1) + dt.timedelta(hours=t), t * (64 - t))
        for t in range(64)
    ]
    hourly = spark.createDataFrame(
        rows, "event_type string, bucket timestamp, cents long"
    )
    r = pacf_durbin_levinson(hourly).collect()[0].asDict()
    assert r["pacf1_ppm"] > 800_000
    assert abs(r["pacf2_ppm"]) < r["pacf1_ppm"] // 2
    assert abs(r["pacf3_ppm"]) < r["pacf1_ppm"] // 2


def test_information_value_uninformative_score_is_zero(spark):
    """Positives alternate down the ranking: every decile's
    good-share equals its bad-share -> WoE = 0 in every bin and
    IV = 0 exactly."""
    from flume_source_spark.operators.quality5 import information_value

    rows = [(i, 1000 - i, i % 2) for i in range(20)]
    scored = spark.createDataFrame(rows, "doc_id long, score long, o long")
    got = [r.asDict() for r in information_value(scored).collect()]
    assert all(r["woe_r4"] == 0.0 for r in got)
    assert all(r["iv_total_r4"] == 0.0 for r in got)


def test_information_value_separating_score(spark):
    """A perfectly separating score: pure bins have a zero cell ->
    NULL WoE (excluded); mixed corpus variant: strong separation
    (top deciles nearly all positive) yields a large IV - the
    scorecard's 'suspiciously strong' regime (> 0.5)."""
    from flume_source_spark.operators.quality5 import information_value

    # 40 rows, 4 per decile: top-half deciles 3 pos / 1 neg, bottom
    # half 1 pos / 3 neg -> WoE = +-ln 3, IV = 2 * 5 * (2/20) * ln 3
    # = ln 3 ~ 1.0986
    rows = []
    for i in range(40):
        top = i < 20
        o = 1 if (i % 4 < 3) == top else 0
        rows.append((i, 1000 - i, o))
    scored = spark.createDataFrame(rows, "doc_id long, score long, o long")
    got = {r["decile"]: r.asDict() for r in information_value(scored).collect()}
    assert got[1]["woe_r4"] == round(__import__("math").log(3), 4)
    assert got[10]["woe_r4"] == -round(__import__("math").log(3), 4)
    assert got[1]["iv_total_r4"] > 0.5


def test_gini_closed_forms(spark):
    """All-equal sizes -> G = 0 exactly; one doc owns everything ->
    G = (n-1)/n; the [0, 0, 3] case -> 2/3 (666,666 ppm floored)."""
    from flume_source_spark.operators.quality5 import gini_concentration

    eq = spark.createDataFrame([(i, 7) for i in range(5)], "doc_id long, tok long")
    assert gini_concentration(eq).collect()[0]["gini_ppm"] == 0
    one = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 3)], "doc_id long, tok long"
    )
    assert gini_concentration(one).collect()[0]["gini_ppm"] == 666_666
    four = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 10)], "doc_id long, tok long"
    )
    assert gini_concentration(four).collect()[0]["gini_ppm"] == 750_000


def test_gini_empty_and_all_zero(spark):
    """All-zero sizes have no defined concentration -> zero rows on
    both engines (the HAVING guard), not a divide-by-zero."""
    from flume_source_spark.operators.quality5 import gini_concentration

    z = spark.createDataFrame([(0, 0), (1, 0)], "doc_id long, tok long")
    assert gini_concentration(z).count() == 0


def test_entropy_rate_deterministic_cycle_is_zero(spark):
    """A deterministic a->b->a->b chain: every conditional
    distribution is a point mass -> H_i = 0 and the chain rate is 0
    exactly."""
    import datetime as dt

    from flume_source_spark.operators.timeseries12 import markov_entropy_rate

    rows = [
        (1, "a" if t % 2 == 0 else "b", dt.datetime(2024, 1, 1) + dt.timedelta(minutes=t), t)
        for t in range(40)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    got = {r["from_type"]: r.asDict() for r in markov_entropy_rate(ev).collect()}
    assert got["a"]["h_cond_r4"] == 0.0 and got["b"]["h_cond_r4"] == 0.0
    assert got[None]["entropy_rate_r4"] == 0.0


def test_entropy_rate_uniform_coin_is_ln2(spark):
    """A strictly alternating two-user interleave making every
    transition 50/50: H = ln 2 = 0.6931 nats at every state and for
    the chain."""
    import datetime as dt
    import math

    from flume_source_spark.operators.timeseries12 import markov_entropy_rate

    # one user whose sequence is a de Bruijn-ish 50/50 pattern:
    # a a b b repeated -> from a: {a, b} equally; from b: {b, a} equally
    pat = ["a", "a", "b", "b"] * 10
    rows = [
        (1, pat[t], dt.datetime(2024, 1, 1) + dt.timedelta(minutes=t), t)
        for t in range(len(pat) - 1)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    got = {r["from_type"]: r.asDict() for r in markov_entropy_rate(ev).collect()}
    ln2 = round(math.log(2), 4)
    assert got["a"]["h_cond_r4"] == ln2
    assert got["b"]["h_cond_r4"] == ln2
    assert abs(got[None]["entropy_rate_r4"] - ln2) <= 0.02  # edge transitions


def test_rich_club_hub_clique_with_leaves(spark):
    """Four mutually-connected hubs (deg 5 each: 3 clique edges + 2
    pendant leaves): at every threshold k < 5 the rich set is exactly
    the 4 hubs and their induced subgraph is the complete clique ->
    phi = 1e6; leaves (deg 1) never enter past k = 1."""
    from flume_source_spark.pipeline.graph7 import rich_club

    hubs = [1, 2, 3, 4]
    edges = [(a, b) for i, a in enumerate(hubs) for b in hubs[i + 1:]]
    leaf = 100
    for h in hubs:
        edges += [(h, leaf), (h, leaf + 1)]
        leaf += 2
    e = spark.createDataFrame(edges, "i long, j long")
    got = {r["min_degree_excl"]: r.asDict() for r in rich_club(e).collect()}
    for k in (1, 2, 4):
        assert got[k]["n_rich"] == 4
        assert got[k]["e_rich"] == 6
        assert got[k]["phi_ppm"] == 1_000_000
    assert 8 not in got  # empty rich set -> no row on either engine


def test_rich_club_star_has_no_club(spark):
    """A star: one hub (deg 6), leaves deg 1 -> past k = 1 the rich
    set is the hub alone -> N_k = 1 -> phi NULL (undefined density),
    never a fabricated number."""
    from flume_source_spark.pipeline.graph7 import rich_club

    e = spark.createDataFrame([(0, i) for i in range(1, 7)], "i long, j long")
    got = {r["min_degree_excl"]: r.asDict() for r in rich_club(e).collect()}
    assert got[2]["n_rich"] == 1 and got[2]["phi_ppm"] is None


def test_turning_points_ramp_and_alternation(spark):
    """A monotone ramp has 0 turning points (z far negative); a
    strict alternation turns at every interior point (t = n - 2, z
    far positive) - the two regimes the test separates."""
    import datetime as dt

    from flume_source_spark.operators.timeseries12 import turning_points

    base = dt.date(2024, 1, 1)
    ramp = [("r", base + dt.timedelta(days=t), 10 + t) for t in range(30)]
    alt = [("a", base + dt.timedelta(days=t), 10 + (t % 2)) for t in range(30)]
    daily = spark.createDataFrame(
        ramp + alt, "event_type string, d date, y long"
    )
    got = {r["event_type"]: r.asDict() for r in turning_points(daily).collect()}
    assert got["r"]["t_count"] == 0 and got["r"]["z_r4"] < -3
    assert got["a"]["t_count"] == 28 and got["a"]["z_r4"] > 3
    assert got["r"]["n"] == 30
    assert got["r"]["expected_ppm"] == (2 * 28 * 1_000_000) // 3


def test_runs_test_shift_and_alternation(spark):
    """Half-low-half-high series -> exactly 2 runs (z far negative:
    a level shift); strict alternation -> a run per day (z far
    positive) - the regimes the test separates. Odd-length series
    keep the median day out (tie-drop convention)."""
    import datetime as dt

    from flume_source_spark.operators.timeseries12 import runs_test

    base = dt.date(2024, 1, 1)
    shift = [("s", base + dt.timedelta(days=t), 10 if t < 15 else 90) for t in range(30)]
    alt = [("a", base + dt.timedelta(days=t), 10 + 80 * (t % 2)) for t in range(30)]
    daily = spark.createDataFrame(shift + alt, "event_type string, d date, y long")
    got = {r["event_type"]: r.asDict() for r in runs_test(daily).collect()}
    assert got["s"]["runs"] == 2 and got["s"]["z_r4"] < -4
    assert got["a"]["runs"] == 30 and got["a"]["z_r4"] > 4
    assert got["s"]["n1"] == 15 and got["s"]["n2"] == 15


def test_runs_test_constant_series_guarded(spark):
    """A constant series: every day ties the median -> all dropped ->
    n1 = n2 = 0, NULL z, no crash."""
    import datetime as dt

    from flume_source_spark.operators.timeseries12 import runs_test

    base = dt.date(2024, 1, 1)
    daily = spark.createDataFrame(
        [("c", base + dt.timedelta(days=t), 5) for t in range(10)],
        "event_type string, d date, y long",
    )
    rows = runs_test(daily).collect()
    assert len(rows) == 0 or (rows[0]["n1"] == 0 and rows[0]["z_r4"] is None)


def test_hhi_closed_forms(spark):
    """k equal sources -> HHI = 1e6/k floored; one source owns
    everything -> 1e6 on both axes."""
    from flume_source_spark.operators.quality5 import herfindahl_index

    eq = spark.createDataFrame(
        [("a", 10, 1000), ("b", 10, 1000), ("c", 10, 1000), ("d", 10, 1000)],
        "source string, n_docs long, chars long",
    )
    r = herfindahl_index(eq).collect()[0].asDict()
    assert r["hhi_docs_ppm"] == 250_000 == r["hhi_chars_ppm"]
    one = spark.createDataFrame(
        [("a", 10, 1000), ("b", 0, 0)], "source string, n_docs long, chars long"
    )
    r = herfindahl_index(one).collect()[0].asDict()
    assert r["hhi_docs_ppm"] == 1_000_000 == r["hhi_chars_ppm"]


def test_hhi_axes_can_disagree(spark):
    """Even doc counts but skewed char mass: the doc axis reads even
    (500,000 ppm for 2 sources) while the char axis reads
    concentrated - the reason both are published."""
    from flume_source_spark.operators.quality5 import herfindahl_index

    per = spark.createDataFrame(
        [("a", 10, 9000), ("b", 10, 1000)], "source string, n_docs long, chars long"
    )
    r = herfindahl_index(per).collect()[0].asDict()
    assert r["hhi_docs_ppm"] == 500_000
    assert r["hhi_chars_ppm"] == 820_000  # 0.81 + 0.01


def test_js_divergence_identical_and_disjoint(spark):
    """Identical sources -> JSD = 0 exactly; disjoint vocabularies ->
    the JS maximum ln 2 nats = 1 bit exactly (rounded 4)."""
    from flume_source_spark.pipeline.text16 import js_divergence_sources

    r = js_divergence_sources(
        spark.createDataFrame(
            [("s1", "alpha beta gamma alpha"), ("s2", "alpha beta gamma alpha")],
            "source string, text string",
        )
    ).collect()[0].asDict()
    assert r["js_nats_r4"] == 0.0
    disj = spark.createDataFrame(
        [("s1", "alpha beta gamma"), ("s2", "delta epsilon zeta")],
        "source string, text string",
    )
    r = js_divergence_sources(disj).collect()[0].asDict()
    assert r["js_nats_r4"] == 0.6931
    assert r["js_bits_r4"] == 1.0
    assert r["n_vocab_union"] == 6
