"""Round-10 operator properties beyond the oracle hash: planted
forecast backtests (HW must beat the naive baseline exactly where the
series has learnable weekly structure and tie where it has none)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flume_source_spark.operators.timeseries6 import hw_backtest_daily

PPM = 1_000_000


def _idx_frame(spark, series: dict[str, list[int]]):
    rows = [
        (et, t + 1, y) for et, ys in series.items() for t, y in enumerate(ys)
    ]
    return spark.createDataFrame(rows, "event_type string, t long, y long")


def test_backtest_constant_series_is_a_scored_tie(spark):
    """On a constant series both models forecast exactly y·S at every
    point: WAPE 0 for both, and the strict-< verdict bit scores the
    tie as 0 (no false win)."""
    out = hw_backtest_daily(_idx_frame(spark, {"flat": [40] * 30})).collect()
    assert len(out) == 1
    r = out[0].asDict()
    # eval points: t in [8, 29] (HW output starts at 8, actual needs t+1)
    assert r["n_eval"] == 22
    assert r["hw_wape_ppm"] == 0
    assert r["base_wape_ppm"] == 0
    assert r["hw_beats_baseline"] == 0


def test_backtest_hw_wins_on_planted_weekly_pattern(spark):
    """A strong pure-weekly series is exactly learnable by the season
    term, while the trailing-7 mean forecasts the weekly AVERAGE at
    every point and eats the full seasonal amplitude as error — HW's
    WAPE must come out far lower and the verdict bit must be 1."""
    pattern = [10, 10, 10, 10, 10, 200, 200]
    out = hw_backtest_daily(
        _idx_frame(spark, {"weekly": pattern * 10})
    ).collect()
    r = out[0].asDict()
    assert r["hw_beats_baseline"] == 1
    assert r["hw_wape_ppm"] < r["base_wape_ppm"] // 2, r


def test_backtest_eval_points_need_both_models_and_an_actual(spark):
    """A 9-point series has HW forecasts at t = 8, 9 but only t = 8
    has an actual at t+1 — exactly one evaluation point. An 8-point
    series' single forecast (t = 8 → t = 9) has no actual, and a
    7-point series has no HW output at all — both vanish from the
    result instead of scoring an empty model."""
    out = {
        r["event_type"]: r["n_eval"]
        for r in hw_backtest_daily(
            _idx_frame(
                spark,
                {
                    "nine": [5, 7, 6, 9, 8, 4, 3, 6, 7],
                    "eight": [5, 7, 6, 9, 8, 4, 3, 6],
                    "seven": [5, 7, 6, 9, 8, 4, 3],
                },
            )
        ).collect()
    }
    assert out == {"nine": 1}


def test_backtest_wape_matches_python_reference(spark):
    """Seeded pseudo-random series: the production WAPE ppm must equal
    an exact python-int recompute that replays the same HW kernel and
    trailing-mean arithmetic."""
    import random

    from flume_source_spark.operators.timeseries6 import (
        _HW_A_NUM,
        _HW_B_NUM,
        _HW_DEN,
        _HW_G_NUM,
        _HW_M,
        _S,
    )

    rng = random.Random(7)
    ys = [rng.randint(5, 120) for _ in range(40)]

    # replay the exact HW recurrence (the _hw_kernel arithmetic)
    tot = sum(ys[:_HW_M]) * _S
    l = (tot - ((tot % _HW_M + _HW_M) % _HW_M)) // _HW_M
    b = 0
    sl = [0] * _HW_M
    for i in range(_HW_M):
        sl[(i + 1) % _HW_M] = ys[i] * _S - l
    hw_f = {}
    for t0 in range(_HW_M, len(ys)):
        t, y = t0 + 1, ys[t0]
        y_s = y * _S
        s_old = sl[t % _HW_M]
        l_new = (_HW_A_NUM * (y_s - s_old) + (_HW_DEN - _HW_A_NUM) * (l + b)) // _HW_DEN
        b = (_HW_B_NUM * (l_new - l) + (_HW_DEN - _HW_B_NUM) * b) // _HW_DEN
        s_new = (_HW_G_NUM * (y_s - l_new) + (_HW_DEN - _HW_G_NUM) * s_old) // _HW_DEN
        l = l_new
        sl[t % _HW_M] = s_new
        hw_f[t] = l + b + sl[(t + 1) % _HW_M]

    se = sb = sy = 0
    n_eval = 0
    for t in sorted(hw_f):
        if t + 1 > len(ys) or t < 8:
            continue
        ws = sum(ys[t - 7 : t]) * _S
        base_f = (ws - ((ws % 7 + 7) % 7)) // 7
        ay = ys[t] * _S  # actual at t+1 is ys[(t+1)-1]
        se += abs(ay - hw_f[t])
        sb += abs(ay - base_f)
        sy += ay
        n_eval += 1

    r = hw_backtest_daily(_idx_frame(spark, {"rand": ys})).collect()[0].asDict()
    assert r["n_eval"] == n_eval
    assert r["hw_wape_ppm"] == se * PPM // sy
    assert r["base_wape_ppm"] == sb * PPM // sy


# ---------------------------------------------------------------------------
# pHash Hamming-band near-dup
# ---------------------------------------------------------------------------


def _phash_wide(spark, docs):
    from flume_source_spark.pipeline.multimodal import phash_bands

    ph = phash_bands(spark.createDataFrame(docs, "doc_id long, text string"))
    out = {}
    for r in ph.collect():
        out.setdefault(r["doc_id"], {})[r["band"]] = r["v"]
    return out


def test_phash_every_doc_emits_all_four_bands_including_zeros(spark):
    docs = [(1, "a b c d e f"), (2, "one two three four five six seven")]
    wide = _phash_wide(spark, docs)
    for d, bands in wide.items():
        assert sorted(bands) == [0, 1, 2, 3], (d, bands)


def test_phash_identical_docs_are_distance_zero_and_found(spark):
    from flume_source_spark.pipeline.multimodal import (
        phash_bands,
        phash_hamming_pairs,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "completely different words in every position "
                                   "nothing shared with any other document here")],
        "doc_id long, text string",
    )
    pairs = {
        (r["i"], r["j"]): r["hamming"]
        for r in phash_hamming_pairs(phash_bands(docs)).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_phash_hamming_matches_python_reference(spark):
    """Seeded near-dup and far pairs: the production band pipeline's
    pair distances must equal an exact python recompute of the
    64-bucket threshold sketch."""
    import hashlib
    import random

    from flume_source_spark.pipeline.multimodal import (
        PHASH_RADIUS,
        phash_bands,
        phash_hamming_pairs,
    )

    rng = random.Random(11)
    vocab = [f"w{k}" for k in range(400)]
    base = [rng.choice(vocab) for _ in range(120)]
    far = [rng.choice(vocab) for _ in range(120)]

    def sketch(text):
        toks = text.split(" ")
        shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        counts = [0] * 64
        for s in shingles:
            counts[int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 64] += 1
        n = sum(counts)
        return {i for i, c in enumerate(counts) if 64 * c > n}

    # single-token edits flip few threshold bits; pick the first edit
    # position whose reference distance is nonzero AND in-radius so
    # the planted pair exercises the interesting regime
    # deterministically (a fixed position could land at 0 or beyond
    # the radius depending on bucket boundaries)
    edited = None
    for p in range(len(base)):
        cand = list(base)
        cand[p] = "w999x"
        d = len(sketch(" ".join(base)) ^ sketch(" ".join(cand)))
        if 1 <= d <= PHASH_RADIUS:
            edited = cand
            break
    assert edited is not None, "no single-token edit lands in-radius"
    texts = {1: " ".join(base), 2: " ".join(edited), 3: " ".join(far)}

    exp = {}
    for i in (1, 2, 3):
        for j in (1, 2, 3):
            if i < j:
                d = len(sketch(texts[i]) ^ sketch(texts[j]))
                if d <= PHASH_RADIUS:
                    exp[(i, j)] = d

    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r["i"], r["j"]): r["hamming"]
        for r in phash_hamming_pairs(phash_bands(docs)).collect()
    }
    assert (1, 2) in exp, "fixture must plant an in-radius pair"
    assert got == exp, (got, exp)


# ---------------------------------------------------------------------------
# rounds=2 refined recall audit
# ---------------------------------------------------------------------------


def test_refined2_audit_recall_is_monotone_in_rounds(spark, sf_dir):
    """The containment theorem made numeric: base ≤ r1 ≤ r2 recall,
    with all three on the same exact denominator."""
    from flume_source_spark.pipeline.similarity3 import (
        sim_knn_refined2_recall_audit,
    )

    r = sim_knn_refined2_recall_audit(spark, sf_dir).collect()[0].asDict()
    assert r["n_exact"] > 0
    assert r["base_hits"] <= r["r1_hits"] <= r["r2_hits"]
    assert r["base_recall_ppm"] <= r["r1_recall_ppm"] <= r["r2_recall_ppm"]


# ---------------------------------------------------------------------------
# Cramér's V²
# ---------------------------------------------------------------------------


def test_cramers_v_perfect_association_and_independence(spark):
    from flume_source_spark.operators.quality3 import cramers_v_sq

    # perfect association: each r maps to exactly one c, equal masses
    perfect = spark.createDataFrame(
        [("a", 1, 50), ("b", 2, 50), ("c", 3, 50)], "r string, c long, o long"
    )
    r = cramers_v_sq(perfect).collect()[0].asDict()
    # every cell's floor loses < 1 ppm-unit; 3x3 perfect association
    # lands within #cells of exactly 1e6
    assert r["n"] == 150 and r["n_rows"] == 3 and r["n_cols"] == 3
    assert PPM - 9 <= r["v_sq_ppm"] <= PPM

    # exact independence: o = rn*cn/t for every cell -> chi2 == 0
    indep = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 30), ("b", 1, 20), ("b", 2, 60)],
        "r string, c long, o long",
    )
    r = cramers_v_sq(indep).collect()[0].asDict()
    assert r["chi2_ppm"] == 0 and r["v_sq_ppm"] == 0


# ---------------------------------------------------------------------------
# Golden record survivorship
# ---------------------------------------------------------------------------


def test_golden_record_survivorship_rules_on_planted_cluster(spark, sf_dir):
    """The fixture clusters are whatever FS finds; pin the RULES
    instead: within every emitted record, the canonical name must be
    a member name of maximal length, the type a modal member type,
    and the size envelope must bracket every member size."""
    from flume_source_spark.pipeline.entity2 import (
        entity_fs_linkage_scores,
        entity_golden_record,
    )
    from flume_source_spark.pipeline.graph import connected_components
    from flume_source_spark.tables import load_tables

    golden = {r["entity_id"]: r.asDict() for r in entity_golden_record(spark, sf_dir).collect()}
    assert golden, "fixture must produce at least one multi-member cluster"

    matches = (
        entity_fs_linkage_scores(spark, sf_dir)
        .filter(F.col("link_class") == "match")
        .select("i", "j")
        .distinct()
    )
    nodes = matches.select(F.col("i").alias("id")).unionAll(
        matches.select(F.col("j").alias("id"))
    ).distinct()
    comp = connected_components(
        nodes, matches.select(F.col("i").alias("src"), F.col("j").alias("dst"))
    )
    p = {
        r["p_partkey"]: r.asDict()
        for r in load_tables(spark, sf_dir)["part"]
        .select("p_partkey", "p_name", "p_type", "p_size")
        .collect()
    }
    clusters = {}
    for r in comp.collect():
        clusters.setdefault(r["component_id"], []).append(r["id"])
    for eid, g in golden.items():
        members = [p[k] for k in clusters[eid]]
        assert g["n_members"] == len(members) >= 2
        assert eid == min(clusters[eid])
        max_len = max(len(m["p_name"]) for m in members)
        assert len(g["canonical_name"]) == max_len
        assert g["canonical_name"] in {m["p_name"] for m in members}
        from collections import Counter

        tc = Counter(m["p_type"] for m in members)
        assert tc[g["canonical_type"]] == max(tc.values())
        sizes = [m["p_size"] for m in members]
        assert g["size_lo"] == min(sizes) and g["size_hi"] == max(sizes)


# ---------------------------------------------------------------------------
# Seasonal residual outliers
# ---------------------------------------------------------------------------


def test_residual_outliers_flag_spike_not_season(spark):
    """A planted trend+weekly-season series decomposes with residual
    identically 0 → nothing flags; injecting one spike day flags
    EXACTLY that day (the weekend highs never flag — the raw-MAD
    contrast this operator exists for)."""
    import datetime as dt

    from flume_source_spark.operators.timeseries8 import (
        seasonal_decompose_daily,
        seasonal_residual_outliers,
    )

    season = [0, 5, 10, 15, 10, 5, 100]  # strong "weekend" bump
    base = dt.date(2024, 1, 1)
    rows = []
    for t in range(70):
        y = 50 + 2 * t + season[(t + 1) % 7]
        rows.append(("s", base + dt.timedelta(days=t), y))
    df = spark.createDataFrame(rows, "event_type string, d date, y long")
    clean = seasonal_residual_outliers(seasonal_decompose_daily(df, "event_type"))
    assert clean.count() == 0

    spiked = [
        (et, d, y + (500 if d == base + dt.timedelta(days=30) else 0))
        for (et, d, y) in rows
    ]
    df2 = spark.createDataFrame(spiked, "event_type string, d date, y long")
    out = seasonal_residual_outliers(
        seasonal_decompose_daily(df2, "event_type")
    ).collect()
    assert len(out) >= 1
    # t is the 1-based day index; the spike day t=31 must be flagged
    # and be the LARGEST flagged residual (the MA smears a little
    # energy onto the 3 neighbors inside the centered window)
    flagged = {r["t"]: abs(r["residual_s"]) for r in out}
    assert 31 in flagged
    assert flagged[31] == max(flagged.values())


# ---------------------------------------------------------------------------
# Exact rolling median
# ---------------------------------------------------------------------------


def test_rolling_median_resists_the_outlier_a_mean_cannot(spark):
    """One huge value inside the window must leave the median at the
    baseline (the masking contrast with a rolling mean), and full-
    window semantics must trim 3 days at each edge."""
    import datetime as dt

    from flume_source_spark.operators.timeseries8 import rolling_median_daily

    base = dt.date(2024, 3, 1)
    ys = [10] * 21
    ys[10] = 100000  # one fat outlier mid-series
    rows = [("s", base + dt.timedelta(days=i), y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "event_type string, d date, y long")
    out = {r["t"]: r["rolling_med7"] for r in rolling_median_daily(df).collect()}
    # full windows only: t in [4, 18] for 21 points
    assert sorted(out) == list(range(4, 19))
    assert all(v == 10 for v in out.values()), out


def test_rolling_median_matches_python_reference(spark):
    import datetime as dt
    import random

    from flume_source_spark.operators.timeseries8 import rolling_median_daily

    rng = random.Random(3)
    ys = [rng.randint(0, 50) for _ in range(30)]
    base = dt.date(2024, 3, 1)
    rows = [("s", base + dt.timedelta(days=i), y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "event_type string, d date, y long")
    got = {r["t"]: r["rolling_med7"] for r in rolling_median_daily(df).collect()}
    exp = {
        t + 1: sorted(ys[t - 3 : t + 4])[3]
        for t in range(3, len(ys) - 3)
    }
    assert got == exp


# ---------------------------------------------------------------------------
# Dedup threshold sweep
# ---------------------------------------------------------------------------


def test_threshold_sweep_is_monotone_and_anchored_to_the_membership_query(spark, sf_dir):
    """Counts must be non-increasing in the threshold, one row per
    threshold, and the 0.5 floor must count at least as many pairs as
    dedup_minhash_lsh publishes (same floor, same corpus — the sweep
    uses exact integral permyriad, the membership query a rounded
    double, so boundary pairs can only differ one way: a pair the
    rounded double admits at 0.5 has jac_pm >= 4999, and on the
    fixture the two counts are equal)."""
    from flume_source_spark.pipeline.audit import (
        SWEEP_THRESHOLDS_PM,
        dedup_threshold_sweep,
    )
    from flume_source_spark.pipeline.dedup import dedup_minhash_lsh

    rows = {r["threshold_pm"]: r["n_pairs"] for r in dedup_threshold_sweep(spark, sf_dir).collect()}
    assert sorted(rows) == sorted(SWEEP_THRESHOLDS_PM)
    counts = [rows[t] for t in sorted(rows)]
    assert counts == sorted(counts, reverse=True), counts
    assert rows[5000] >= 1
    n_membership = dedup_minhash_lsh(spark, sf_dir).count()
    assert rows[5000] == n_membership


# ---------------------------------------------------------------------------
# IVF nprobe tuning curve
# ---------------------------------------------------------------------------


def test_nprobe_curve_is_monotone_and_consistent_with_the_audit(spark, sf_dir):
    """Nested candidate sets make recall non-decreasing in nprobe, and
    the nprobe = 4 row must agree with sim_ann_recall_audit's
    aggregate (same machinery, same panel, same exact side)."""
    from flume_source_spark.pipeline.audit import (
        NPROBE_CURVE,
        sim_ann_nprobe_curve,
        sim_ann_recall_audit,
    )

    rows = {r["nprobe"]: r.asDict() for r in sim_ann_nprobe_curve(spark, sf_dir).collect()}
    assert sorted(rows) == sorted(NPROBE_CURVE)
    hits = [rows[p]["hits"] for p in sorted(rows)]
    assert hits == sorted(hits), hits
    assert len({rows[p]["n_exact"] for p in rows}) == 1

    audit = sim_ann_recall_audit(spark, sf_dir).collect()
    agg_hits = sum(r["hits"] for r in audit)
    agg_exact = sum(r["n_exact"] for r in audit)
    assert rows[4]["hits"] == agg_hits
    assert rows[4]["n_exact"] == agg_exact


# ---------------------------------------------------------------------------
# Kaplan-Meier survival
# ---------------------------------------------------------------------------


def test_kaplan_meier_without_censoring_is_the_empirical_survival(spark):
    """With zero censoring KM collapses to the empirical survival
    function: S(t) = (#durations > t) / N — checked exactly in ppm
    against a python recompute (floor drift < #death-steps ppm is
    covered by recomputing with the SAME recursion)."""
    from flume_source_spark.operators.timeseries7 import kaplan_meier

    durs = [1, 1, 2, 3, 3, 3, 5, 8, 8, 13]
    df = spark.createDataFrame([(t, 1) for t in durs], "t long, died long")
    got = {r["t_hours"]: r.asDict() for r in kaplan_meier(df).collect()}

    s = 1_000_000
    n = len(durs)
    exp = {}
    at_risk = n
    from collections import Counter

    cnt = Counter(durs)
    for t in sorted(cnt):
        d = cnt[t]
        s = (s * (at_risk - d)) // at_risk
        exp[t] = (at_risk, d, 0, s)
        at_risk -= d
    for t, (nr, d, c, sv) in exp.items():
        g = got[t]
        assert (g["n_at_risk"], g["n_events"], g["n_censored"], g["surv_ppm"]) == (
            nr, d, c, sv,
        ), (t, g, exp[t])


def test_kaplan_meier_censoring_reduces_risk_without_a_step(spark):
    """A censored duration must consume risk (later n drops) but never
    step S down at its own t — the whole point of KM vs naive
    drop-the-censored estimates."""
    from flume_source_spark.operators.timeseries7 import kaplan_meier

    rows = [(1, 1), (2, 0), (3, 1), (4, 0)]  # deaths at 1 and 3
    df = spark.createDataFrame(rows, "t long, died long")
    got = {r["t_hours"]: r.asDict() for r in kaplan_meier(df).collect()}
    # t=1: n=4, d=1 -> S = 750000
    assert got[1]["surv_ppm"] == 750_000
    # t=2 censored only: S unchanged, n=3
    assert got[2]["surv_ppm"] == 750_000 and got[2]["n_at_risk"] == 3
    assert got[2]["n_events"] == 0 and got[2]["n_censored"] == 1
    # t=3: n=2, d=1 -> S = 750000 * 1 // 2 = 375000
    assert got[3]["surv_ppm"] == 375_000
    # t=4 censored tail: unchanged
    assert got[4]["surv_ppm"] == 375_000 and got[4]["n_at_risk"] == 1


# ---------------------------------------------------------------------------
# Snake-striped shard balance
# ---------------------------------------------------------------------------


def test_snake_balance_beats_hash_layout_on_skewed_weights(spark):
    """Geometric weights (the adversarial case for count-balanced
    layouts): the snake stripe's worst per-shard weight deviation must
    be far tighter than the md5-hash layout's on the same corpus, and
    every shard must receive ~n/K docs."""
    from flume_source_spark.pipeline.dataset8 import _SHARD_K, snake_balance

    n = 1600
    rows = [(i, 10 + (i % 40) ** 3) for i in range(n)]  # heavy tail
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = {r["shard"]: r.asDict() for r in snake_balance(df).collect()}
    assert sorted(out) == list(range(_SHARD_K))
    assert all(r["n_docs"] == n // _SHARD_K for r in out.values())
    snake_dev = max(abs(r["dev_permyriad"]) for r in out.values())

    # md5-hash layout weight deviation on the same corpus
    import hashlib

    sums = [0] * _SHARD_K
    for i, w in rows:
        sums[int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % _SHARD_K] += w
    total = sum(sums)
    hash_dev = max(
        abs(
            (s * _SHARD_K - total) * 10000 // total
            if s * _SHARD_K >= total
            else -((total - s * _SHARD_K) * 10000 // total)
        )
        for s in sums
    )
    assert snake_dev * 5 < hash_dev, (snake_dev, hash_dev)
    assert snake_dev <= 100  # within ±1% of ideal on sorted weights


def test_cramers_v_headroom_guard_empties_both_engines(spark):
    """ADVICE r10 item 2: past the DECIMAL(38,0) headroom bound
    (CRAMERS_MAX_N) the Spark fold must return an EMPTY frame — never
    an overflow NULL — and the oracle's guarded GROUP BY shape must
    agree (an ungrouped sum would emit one NULL row instead)."""
    import duckdb

    from flume_source_spark.operators.quality3 import CRAMERS_MAX_N, cramers_v_sq

    big = CRAMERS_MAX_N  # per-cell counts, t = 4*CRAMERS_MAX_N > bound
    over = spark.createDataFrame(
        [(0, 0, big), (0, 1, big), (1, 0, big), (1, 1, big)],
        "r long, c long, o long",
    )
    assert cramers_v_sq(over).count() == 0
    # just UNDER the bound still emits the row (guard is not too eager)
    under = spark.createDataFrame(
        [(0, 0, 10), (0, 1, 5), (1, 0, 5), (1, 1, 10)], "r long, c long, o long"
    )
    assert cramers_v_sq(under).count() == 1
    # oracle shape: the guarded+grouped terms CTE yields ZERO rows on
    # an over-bound input (DuckDB mini-model of the real oracle)
    con = duckdb.connect()
    n = con.execute(
        f"""
        WITH cells(r, c, o) AS (VALUES (0, 0, ({big}::HUGEINT + 1))),
        t AS (SELECT sum(o) AS t FROM cells),
        terms AS (
            SELECT t.t AS tt, sum(o) AS s
            FROM cells CROSS JOIN t
            WHERE t.t <= {CRAMERS_MAX_N}
            GROUP BY t.t
        )
        SELECT count(*) FROM terms
        """
    ).fetchone()[0]
    assert n == 0
