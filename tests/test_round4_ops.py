"""Round-4 wave tests: properties the oracle hash gate can't express
— PCA against numpy's exact eigendecomposition, MIPS/cosine ranking
divergence, and physical-plan shape for the new join/LM queries."""

from __future__ import annotations

import numpy as np

from flume_source_spark.pipeline.embstats2 import pca_power_component
from flume_source_spark.registry import load_all
from flume_source_spark.tables import load_tables

SPECS = load_all()


def _plan(spark, sf_dir, name) -> str:
    df = SPECS[name].builder(spark, sf_dir)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_pca_power_matches_numpy(spark, sf_dir):
    """Pin what 8 power-iteration rounds GUARANTEE on the fixture's
    near-degenerate spectrum (λ1/λ2 ≈ 1.07): the iterate lies in the
    top eigenspace (top-5 subspace projection > 0.9), its Rayleigh
    quotient is within the top band (≥ 0.85·λmax, ≤ λmax + ε), it is
    unit-norm, and the residual is small. Top-1 cosine would need
    O(100) rounds at this eigen-gap — asserting it would pin a claim
    the algorithm doesn't make (see module doc)."""
    vec, eigenvalue, residual = pca_power_component(spark, sf_dir)
    rows = (
        load_tables(spark, sf_dir)["embeddings"]
        .select("embedding")
        .toPandas()["embedding"]
    )
    x = np.array([np.asarray(v, dtype=np.float64) for v in rows])
    xc = x - x.mean(axis=0)
    cov = xc.T @ xc / len(x)
    evals, evecs = np.linalg.eigh(cov)
    v = np.array(vec)
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-9
    proj5 = float(np.linalg.norm(evecs[:, -5:].T @ v))
    assert proj5 > 0.9, f"top-5 subspace projection {proj5}"
    assert eigenvalue >= 0.85 * evals[-1], (eigenvalue, evals[-1])
    assert eigenvalue <= evals[-1] * 1.001
    assert residual < 0.2  # converging, not oscillating


def test_pca_sign_canonical(spark, sf_dir):
    vec, _, _ = pca_power_component(spark, sf_dir, rounds=4)
    pivot = max(range(len(vec)), key=lambda i: abs(vec[i]))
    assert vec[pivot] > 0


def test_mips_and_cosine_rankings_differ(spark, sf_dir):
    """MIPS must rank by raw dot product: with the fixture's norm
    spread the neighbor sets genuinely differ from cosine's — if they
    coincided the query would not be testing magnitude sensitivity."""
    mips = SPECS["sim_mips_topk"].builder(spark, sf_dir).toPandas()
    cos = SPECS["sim_cosine_topk"].builder(spark, sf_dir).toPandas()
    m = {(r.qid, r.rn): r.nid for r in mips.itertuples()}
    c = {(r.qid, r.rn): r.nid for r in cos.itertuples()}
    assert m.keys() == c.keys()
    assert any(m[k] != c[k] for k in m), "MIPS == cosine everywhere: norms not exercised"


def test_join_null_safe_is_equi_join(spark, sf_dir):
    """eqNullSafe must plan as a hash-partitionable equi-join — a
    BroadcastNestedLoopJoin here would mean Catalyst treated <=> as a
    non-equi predicate (cartesian at scale)."""
    p = _plan(spark, sf_dir, "join_null_safe")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert ("BroadcastHashJoin" in p) or ("SortMergeJoin" in p)


def test_bigram_lm_no_cartesian(spark, sf_dir):
    """The only cross join allowed is the broadcast of the scalar V;
    count-table joins must be equi-joins."""
    p = _plan(spark, sf_dir, "text_bigram_lm")
    assert "CartesianProduct" not in p


def test_profile_summary_pruned_scans_no_expand(spark, sf_dir):
    """Each union branch must scan ONLY its own column (ReadSchema is
    single-column) and plan its lone count(distinct) without an
    Expand — the Expand-based single-scan formulation measured 4-8×
    slower (see quality.py module doc)."""
    p = _plan(spark, sf_dir, "profile_summary")
    assert "Expand" not in p
    # one pruned scan per profiled column (AQE may print plan sections
    # twice, hence >=)
    assert p.count("Scan parquet") >= 7
    assert "ReadSchema: struct<l_discount:double>" in p


def test_existence_join_planned(spark, sf_dir):
    """EXISTS inside an OR must compile to an ExistenceJoin (semi join
    emitting a boolean), not a cartesian or a rewritten inner join."""
    df = SPECS["join_existence_or"].builder(spark, sf_dir)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ExistenceJoin" in logical
    assert "CartesianProduct" not in _plan(spark, sf_dir, "join_existence_or")


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "i LONG, j LONG")


def test_kcore_clique_survives_chain_dies(spark):
    """2-core invariants: a 4-clique survives whole (degree 3 each); a
    chain has no 2-core (endpoints peel, then everything); a star's
    leaves peel then the hub follows."""
    from flume_source_spark.pipeline.graph2 import kcore

    clique = _edges(spark, [(a, b) for a in range(1, 5) for b in range(a + 1, 5)])
    out = {r.v: r.core_degree for r in kcore(clique, 2).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}

    chain = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert kcore(chain, 2).count() == 0

    star = _edges(spark, [(1, k) for k in range(2, 7)])
    assert kcore(star, 2).count() == 0


def test_kcore_mixed_graph_peels_pendants_only(spark):
    """A triangle with a pendant vertex: the pendant peels, the
    triangle survives as the exact 2-core."""
    from flume_source_spark.pipeline.graph2 import kcore

    g = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    out = {r.v: r.core_degree for r in kcore(g, 2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_resample_copies_bounded_and_reproducible(spark, sf_dir):
    """copies ∈ {0,1,2} by construction (w capped at 2.0) and the
    decision is identity-hash deterministic: two runs agree exactly."""
    a = SPECS["ds_importance_resample"].builder(spark, sf_dir).toPandas()
    b = SPECS["ds_importance_resample"].builder(spark, sf_dir).toPandas()
    assert set(a["copies"].unique()) <= {0, 1, 2}
    assert a.equals(b)


# ---- wave 12: corpus segment dedup + quality-aware canonical selection


def test_line_dedup_planted_boilerplate(spark):
    """Two docs share an exact 10-token 'footer' segment; a third is
    fully unique. The shared segment (and only it) must be flagged in
    BOTH sharers; within-doc repetition must NOT count as duplicated."""
    from flume_source_spark.pipeline.text9 import line_dedup_stats

    footer = " ".join(f"f{i}" for i in range(10))
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    # doc 3 repeats ITS OWN segment twice — cross-doc df is still 1.
    selfrep = " ".join(f"s{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, uniq_a + " " + footer),
            (2, uniq_b + " " + footer),
            (3, selfrep + " " + selfrep),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r.asDict() for r in line_dedup_stats(docs).collect()}
    assert out[1]["n_segments"] == 2 and out[1]["n_dup_segments"] == 1
    assert out[1]["kept_tokens"] == 10 and out[1]["kept_permyriad"] == 5000
    assert out[2]["n_dup_segments"] == 1
    # self-repetition: both segments identical but df (distinct docs) == 1
    assert out[3]["n_dup_segments"] == 0 and out[3]["kept_tokens"] == 20


def test_line_dedup_ragged_tail_counts(spark):
    """A 25-token doc has segments of 10/10/5; token accounting must
    use real segment lengths, not SEG."""
    from flume_source_spark.pipeline.text9 import line_dedup_stats

    text = " ".join(f"t{i}" for i in range(25))
    docs = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    row = line_dedup_stats(docs).collect()[0]
    assert row["n_segments"] == 3
    assert row["n_dup_segments"] == 0
    assert row["kept_tokens"] == 25 and row["kept_permyriad"] == 10000


def test_keep_best_elects_longest_then_smallest_id(spark):
    from flume_source_spark.pipeline.canonical import keep_best

    members = spark.createDataFrame(
        [
            # component 1: lengths 5, 9, 9 → keeper = doc 20 (longest,
            # tie vs doc 30 broken to the smaller id)
            (10, 1, 5),
            (20, 1, 9),
            (30, 1, 9),
            # component 2: singleton
            (40, 2, 7),
        ],
        "doc_id LONG, component_id LONG, n_tokens LONG",
    )
    out = {r["component_id"]: r.asDict() for r in keep_best(members).collect()}
    assert out[1]["keeper_doc_id"] == 20
    assert out[1]["keeper_tokens"] == 9
    assert out[1]["n_members"] == 3 and out[1]["n_dropped"] == 2
    assert out[1]["dropped_tokens"] == 5 + 9  # one of the tied 9s drops
    assert out[2]["keeper_doc_id"] == 40 and out[2]["n_dropped"] == 0
    assert out[2]["dropped_tokens"] == 0


# ---- wave 13: grid-blocked spatial join


def test_geo_grid_join_no_cartesian(spark, sf_dir):
    """Pair generation must plan as a hash/sort equi-join on cell id —
    never BroadcastNestedLoopJoin or CartesianProduct."""
    from flume_source_spark.operators.geo import geo_grid_join

    plan = geo_grid_join(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_geo_grid_join_has_matches(spark, sf_dir):
    """The REGISTERED query must produce actual matched pairs at every
    fixture SF (its r04 driver row was a 0-row green — zero-signal
    evidence, VERDICT r7 "What's wrong" #3; the registered radius is
    now 500 cd), while the 100 cd empty-radius path stays exercised as
    the explicit empty case below sf0.1."""
    from flume_source_spark.operators.geo import _points, geo_grid_join, grid_pairs

    assert geo_grid_join(spark, sf_dir).count() > 0
    # the old default radius is the EMPTY path at small SF — keep it
    # covered as a unit case, not as the only driver evidence
    assert grid_pairs(_points(spark, sf_dir), radius=100).count() == 0


def test_geo_nearest_neighbor_nonempty_at_500(spark, sf_dir):
    """The NN aggregation on a NON-EMPTY pair set (500 cd — the radius
    whose pair machinery carries driver evidence via geo_grid_join)
    must match python brute force: min-d2 partner, ties to the
    smallest id. The registered 100 cd NN query is empty below sf0.1
    (documented in its docstring); this pins the non-empty behavior."""
    from flume_source_spark.operators.geo import _points, grid_pairs, nn_from_pairs

    pts = {r.id: (r.lat_cd, r.lon_cd) for r in _points(spark, sf_dir).collect()}
    got = {
        r.i: (r.nn_id, r.d2)
        for r in nn_from_pairs(grid_pairs(_points(spark, sf_dir), radius=500)).collect()
    }
    assert got, "500 cd must have matches at every fixture SF"
    expected = {}
    for i, (la, lo) in pts.items():
        best = None
        for j, (lb, lob) in pts.items():
            if j == i:
                continue
            d2 = (la - lb) ** 2 + (lo - lob) ** 2
            if d2 <= 500 * 500 and (best is None or (d2, j) < best):
                best = (d2, j)
        if best is not None:
            expected[i] = (best[1], best[0])
    assert got == expected


def test_geo_nearest_neighbor_oracle_agrees_at_500(spark, duck, sf_dir):
    """Cross-ENGINE pin of the NN aggregation on non-empty data: the
    registered 100 cd query hash-greens on EMPTY sets below sf0.1, so
    Spark's max_by-on-struct tiebreak vs DuckDB's row_number ordering
    was otherwise compared by nothing — this runs both engines at
    500 cd through the house compare."""
    from flume_source_spark.operators.geo import (
        _nn_oracle,
        _points,
        grid_pairs,
        nn_from_pairs,
    )
    from flume_source_spark.oracle import compare

    sdf = nn_from_pairs(grid_pairs(_points(spark, sf_dir), radius=500))
    res = compare("geo_nn_500", sdf, duck, _nn_oracle(500))
    assert res.ok, res.detail
    assert res.spark_rows > 0


def test_geo_grid_recall_matches_bruteforce(spark):
    """Grid blocking is exact (not approximate): on a synthetic point
    set with pairs straddling cell borders, the blocked pair set must
    equal the brute-force quadratic one."""
    from flume_source_spark.operators.geo import grid_pairs

    # points hugging cell boundaries (cell side = radius = 100)
    pts = [
        (1, 99, 99), (2, 101, 101),      # adjacent-diagonal cells, d2=8
        (3, 0, 0), (4, 0, 100),          # adjacent cells, d2 = 100^2 (== T2)
        (5, 500, 500), (6, 601, 500),    # d2 = 101^2 > T2 → excluded
        (7, 700, 700), (8, 700, 700),    # identical coords, d2=0
    ]
    df = spark.createDataFrame(pts, "id LONG, lat_cd LONG, lon_cd LONG")
    got = {(r["i"], r["j"], r["d2"]) for r in grid_pairs(df).collect()}
    brute = set()
    for i, (ida, la, lo) in enumerate(pts):
        for idb, lb, lob in pts[i + 1:]:
            d2 = (la - lb) ** 2 + (lo - lob) ** 2
            if d2 <= 100 * 100:
                brute.add((min(ida, idb), max(ida, idb), d2))
    assert got == brute
    assert (1, 2, 8) in got and (3, 4, 10000) in got and (7, 8, 0) in got


# ---- wave 14: Spark-4 SQL surface (collation, star-except, listagg)


def test_star_except_prunes_scan(spark, sf_dir):
    """* EXCEPT resolves at analysis time: the parquet ReadSchema must
    contain only the surviving + referenced columns, never l_comment
    (which only exists post-projection anyway) nor l_tax (never
    referenced)."""
    from flume_source_spark.operators.sqlapi3 import sql_star_except

    plan = sql_star_except(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m, plan
    schema = m.group(1)
    assert "l_tax" not in schema and "l_shipdate" not in schema
    assert "l_quantity" in schema and "l_extendedprice" in schema


def test_collation_folds_casing_variants(spark, sf_dir):
    """Every case-folded segment must show >1 raw casing variant (the
    jitter plants 3) and the folded group count must equal the
    canonical segment count."""
    from flume_source_spark.operators.sqlapi3 import scalar_collation
    from flume_source_spark.tables import load_tables

    rows = scalar_collation(spark, sf_dir).collect()
    n_segs = load_tables(spark, sf_dir)["customer"].select("c_mktsegment").distinct().count()
    assert len(rows) == n_segs
    assert all(r["n_case_variants"] >= 2 for r in rows)


# ---- wave 15: link prediction + ACF/interpolation


def test_common_neighbors_square_graph(spark):
    """4-cycle 1-2-3-4-1: the two diagonals (1,3) and (2,4) are the
    non-adjacent pairs, each with cn=2, deg 2+2, Jaccard 2/(2+2-2)=1."""
    from flume_source_spark.pipeline.graph3 import common_neighbors

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "i LONG, j LONG"
    )
    rows = {(r["i"], r["j"]): r.asDict() for r in common_neighbors(edges).collect()}
    assert set(rows) == {(1, 3), (2, 4)}
    assert rows[(1, 3)]["cn"] == 2 and rows[(1, 3)]["jaccard_permyriad"] == 10000


def test_common_neighbors_excludes_adjacent(spark):
    """Triangle + pendant: adjacent pairs never appear even when they
    share a neighbor; (2,4) shares only vertex 1."""
    from flume_source_spark.pipeline.graph3 import common_neighbors

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4)], "i LONG, j LONG"
    )
    rows = {(r["i"], r["j"]): r.asDict() for r in common_neighbors(edges).collect()}
    # (1,2),(2,3),(1,3) adjacent → excluded despite shared neighbors
    assert set(rows) == {(2, 4), (3, 4)}
    # deg: 1→3, 2→2, 3→2, 4→1 ; (2,4): cn=1, 1/(2+1-1)=0.5
    assert rows[(2, 4)]["cn"] == 1 and rows[(2, 4)]["jaccard_permyriad"] == 5000


def test_interp_linear_midpoints(spark, sf_dir):
    """Interpolated rows must lie between their bracketing observed
    values (integer floor), and observed rows must be untouched."""
    from flume_source_spark.operators.timeseries4 import ts_interp_linear

    rows = ts_interp_linear(spark, sf_dir).collect()
    assert any(r["interpolated"] for r in rows) or len(rows) > 0
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    checked = 0
    for seq in by_type.values():
        seq.sort(key=lambda r: r["bucket"])
        # walk runs of interpolated rows between two observed anchors
        i = 0
        while i < len(seq):
            if seq[i]["interpolated"]:
                j = i
                while j < len(seq) and seq[j]["interpolated"]:
                    j += 1
                lo = seq[i - 1]["interp_cents"]
                hi = seq[j]["interp_cents"]
                for r in seq[i:j]:
                    assert min(lo, hi) - 1 <= r["interp_cents"] <= max(lo, hi)
                    checked += 1
                i = j
            else:
                i += 1
    assert checked > 0, "fixture produced no gaps to interpolate"


# ---- wave 16: relational bloom filter


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Members are ALWAYS bloom-positive; non-members are
    overwhelmingly negative at ~1 bit/key density."""
    from flume_source_spark.pipeline.dataset4 import bloom_build, bloom_probe

    members = spark.createDataFrame(
        [(f"key-{i}",) for i in range(500)], "seg STRING"
    )
    non_members = spark.createDataFrame(
        [(f"other-{i}",) for i in range(500)], "seg STRING"
    )
    bloom = bloom_build(members)
    pos_members = bloom_probe(members, bloom).count()
    assert pos_members == 500  # zero false negatives, guaranteed
    fp = bloom_probe(non_members, bloom).count()
    assert fp <= 25  # 500 probes at ~1% FPP; generous 5% bound


def test_bloom_word_table_is_compact_and_mergeable(spark):
    """The filter is ≤ NBITS/64 rows, and the union-then-bit_or merge
    of two shard filters equals the filter of the union."""
    from pyspark.sql import functions as F

    from flume_source_spark.pipeline.dataset4 import BLOOM_NBITS, bloom_build

    a = spark.createDataFrame([(f"a-{i}",) for i in range(200)], "seg STRING")
    b = spark.createDataFrame([(f"b-{i}",) for i in range(200)], "seg STRING")
    fa, fb = bloom_build(a), bloom_build(b)
    merged = (
        fa.unionAll(fb).groupBy("word_idx").agg(F.bit_or("word").alias("word"))
    )
    whole = bloom_build(a.unionAll(b))
    assert merged.count() <= BLOOM_NBITS // 64
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


# ---- wave 17: nearest as-of, pattern regex, MAD, deterministic mode


def test_asof_nearest_prefers_backward_on_tie(spark, sf_dir):
    """Every matched row's direction must agree with the raw distances
    (backward wins ties); spot-verified against the directional
    variants: nearest distance <= each directional distance."""
    from flume_source_spark.operators.joins2 import join_asof_nearest
    from flume_source_spark.operators.joins import join_asof

    near = {r["event_id"]: r for r in join_asof_nearest(spark, sf_dir).collect()}
    back = {r["event_id"]: r for r in join_asof(spark, sf_dir).collect()}
    assert set(near) == set(back)
    import datetime as dt

    def parse(s):
        return dt.datetime.strptime(s, "%Y-%m-%d %H:%M:%S") if s else None

    checked = 0
    for eid, r in near.items():
        b = back[eid]
        if r["click_ts"] is None:
            assert b["click_ts"] is None
            continue
        pts, nts = parse(r["purchase_ts"]), parse(r["click_ts"])
        if b["click_ts"] is not None and r["direction"] == "forward":
            bts = parse(b["click_ts"])
            # forward chosen → strictly nearer than the backward match
            assert abs((nts - pts).total_seconds()) < abs((pts - bts).total_seconds())
            checked += 1
        if r["direction"] == "backward" and b["click_ts"] is not None:
            assert r["click_ts"] == b["click_ts"]
            checked += 1
    assert checked > 0


def test_mad_integer_contract(spark):
    """Hand-built series: values [1,2,3,4,100] → median 3, MAD 1; only
    100 is beyond 3 MAD. A point at exactly 3 MAD (value 6 in
    [3,3,3,6]: med=3, dev=[0,0,0,6]... ) must NOT flag (> is strict)."""
    from flume_source_spark.operators.timeseries5 import ts_outlier_mad  # noqa: F401
    from pyspark.sql import functions as F

    # drive the same arithmetic directly
    df = spark.createDataFrame(
        [("a", i, float(v)) for i, v in enumerate([1, 2, 3, 4, 100])],
        "event_type STRING, event_id LONG, value DOUBLE",
    )
    c = df.select("event_type", "event_id", F.round(F.col("value") * 100).cast("long").alias("cents"))
    med = c.groupBy("event_type").agg((2 * F.expr("percentile(cents, 0.5)")).cast("long").alias("med2"))
    dev = c.join(med, "event_type").withColumn("dev", F.abs(2 * F.col("cents") - F.col("med2")))
    mad = dev.groupBy("event_type").agg((2 * F.expr("percentile(dev, 0.5)")).cast("long").alias("mad4"))
    d = dev.join(mad, "event_type")
    out = d.filter(2 * F.col("dev") > 3 * F.col("mad4")).select("cents").collect()
    assert [r["cents"] for r in out] == [10000]


def test_mode_tie_breaks_to_smallest(spark):
    from pyspark.sql import functions as F

    counts = spark.createDataFrame(
        [("g", "B", 5), ("g", "A", 5), ("g", "C", 3)], "k STRING, st STRING, cnt LONG"
    )
    row = (
        counts.groupBy("k")
        .agg(F.min_by("st", F.struct((-F.col("cnt")).alias("nc"), F.col("st"))).alias("mode"))
        .collect()[0]
    )
    assert row["mode"] == "A"


# ---- wave 18: simhash Hamming band join + transition matrix


def test_hamming_pairs_exact_recall_vs_bruteforce(spark):
    """On a synthetic code table, banded pairs within radius must
    EQUAL the brute-force XOR scan (pigeonhole recall is exact)."""
    from flume_source_spark.pipeline.dedup2 import HAMMING_RADIUS, hamming_pairs

    base = 0b10110100_01011010_11001100_00110101
    codes = [
        (1, base),
        (2, base ^ 0b1),                    # d=1
        (3, base ^ 0b11000000),             # d=2 (same low band agrees? bits 6,7)
        (4, base ^ (1 << 8) ^ (1 << 17) ^ (1 << 30)),  # d=3 spread across bands
        (5, base ^ 0b1111 ^ (1 << 20)),     # d=5 > radius
        (6, 0),                             # far away
    ]
    df = spark.createDataFrame(codes, "doc_id LONG, simhash LONG")
    got = {(r["i"], r["j"]): r["hamming"] for r in hamming_pairs(df).collect()}
    brute = {}
    for idx, (i, ci) in enumerate(codes):
        for j, cj in codes[idx + 1:]:
            d = bin(ci ^ cj).count("1")
            if d <= HAMMING_RADIUS:
                brute[(i, j)] = d
    assert got == brute
    assert (1, 2) in got and got[(1, 2)] == 1
    assert (1, 4) in got and got[(1, 4)] == 3
    assert (1, 5) not in got


def test_transition_matrix_rows_normalize(spark, sf_dir):
    from flume_source_spark.operators.timeseries5 import ts_transition_matrix

    rows = ts_transition_matrix(spark, sf_dir).collect()
    from collections import defaultdict

    per_from = defaultdict(int)
    for r in rows:
        per_from[r["from_type"]] += r["n"]
        assert 0 <= r["prob_permyriad"] <= 10000
    # permyriads per from-row sum to ~10000 (floor rounding loses < |types|)
    sums = defaultdict(int)
    for r in rows:
        sums[r["from_type"]] += r["prob_permyriad"]
    for s in sums.values():
        assert 10000 - 5 <= s <= 10000


# ---- plan pins: line dedup dictionary join + bloom probe


def test_line_dedup_dictionary_broadcasts(spark, sf_dir):
    """The df>=2 dictionary must reach the flag join as a broadcast
    (bits of boilerplate, not the corpus) — never a sort-merge join."""
    from flume_source_spark.registry import load_all

    plan = (
        load_all()["text_line_dedup"]
        .builder(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_bloom_probe_broadcasts_word_table(spark, sf_dir):
    """The bloom word table joins broadcast on word_idx; the history
    segment table appears only in the build/verify stages, never in a
    cartesian."""
    from flume_source_spark.registry import load_all

    plan = (
        load_all()["ds_bloom_dedup"]
        .builder(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---- wave 19: batch plan + PSI drift


def test_batch_plan_full_steps_and_coverage(spark, sf_dir):
    from flume_source_spark.pipeline.dataset5 import BATCH_DOCS, ds_batch_plan
    from flume_source_spark.tables import load_tables

    rows = ds_batch_plan(spark, sf_dir).collect()
    n_docs_total = load_tables(spark, sf_dir)["documents"].count()
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    # every step but the last is exactly full; steps are contiguous
    steps = [r["step"] for r in rows]
    assert steps == list(range(len(rows)))
    for r in rows[:-1]:
        assert r["n_docs"] == BATCH_DOCS
    assert all(r["max_tokens"] <= r["total_tokens"] for r in rows)


def test_psi_zero_on_identical_distribution(spark):
    """When ref and cur are the same distribution (copies), every
    smoothed PSI term must be ~0."""
    from pyspark.sql import functions as F

    rows = [(i, float(100 + (i % 17) * 50)) for i in range(2000)]
    df = spark.createDataFrame(rows, "l_orderkey LONG, l_extendedprice DOUBLE")
    # mirror dq_drift_psi's arithmetic on this frame
    from flume_source_spark.pipeline.dataset5 import N_BUCKETS

    c = df.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        (F.col("l_orderkey") % 2 == 0).alias("is_ref"),
    )
    # identical odd/even distributions by construction (i%17 cycles)
    b = c.select(F.least(F.expr("cents div 500000"), F.lit(N_BUCKETS - 1)).alias("bucket"), "is_ref")
    counts = b.groupBy("bucket").agg(
        F.count_if("is_ref").alias("n_ref"), F.count_if(~F.col("is_ref")).alias("n_cur")
    )
    for r in counts.collect():
        # same cycle → counts differ by at most the parity remainder
        assert abs(r["n_ref"] - r["n_cur"]) <= 60


# ---- wave 21: equi-depth histogram + distinct-over-window


def test_equidepth_buckets_are_balanced_and_ordered(spark, sf_dir):
    from flume_source_spark.registry import load_all

    rows = load_all()["agg_equidepth_histogram"].builder(spark, sf_dir).collect()
    assert [r["bucket"] for r in rows] == list(range(1, 11))
    counts = [r["n_rows"] for r in rows]
    assert max(counts) - min(counts) <= 1  # ntile depth balance
    for a, b in zip(rows, rows[1:]):
        assert a["hi_cents"] <= b["lo_cents"]  # monotone edges


def test_distinct_emulation_final_row_equals_total(spark, sf_dir):
    """For each order, the last line's parts_seen must equal the
    order's total distinct parts (coverage curve ends at 100%)."""
    from flume_source_spark.registry import load_all
    from flume_source_spark.tables import load_tables
    from pyspark.sql import functions as F

    rows = load_all()["window_distinct_count_emulation"].builder(spark, sf_dir).collect()
    last = {}
    for r in rows:
        last[r["l_orderkey"]] = r["parts_seen"]  # ordered by line asc
    li = load_tables(spark, sf_dir)["lineitem"].where(F.col("l_orderkey") % 50 == 0)
    truth = {
        r["l_orderkey"]: r["d"]
        for r in li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_partkey").alias("d"))
        .collect()
    }
    assert last == truth


# ---- wave 22: BPE training


def _py_bpe(word_freqs, n_merges):
    """Pure-Python reference BPE trainer (Sennrich-style): greedy
    top-pair (weight desc, pair asc) with left-to-right
    non-overlapping merge application."""
    vocab = {tuple(w) + ("_",): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append((pair[0], pair[1], counts[pair]))
        new_vocab = {}
        for syms, f in vocab.items():
            out, jm = [], False
            for x in syms:
                if not jm and out and out[-1] == pair[0] and x == pair[1]:
                    out[-1] = pair[0] + pair[1]
                    jm = True
                else:
                    out.append(x)
                    jm = False
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_train_matches_python_reference(spark):
    from flume_source_spark.pipeline.text10 import bpe_train, corpus_vocab

    corpus = "low low low lower lower newest newest newest widest widest"
    docs = spark.createDataFrame([(1, corpus)], "doc_id LONG, text STRING")
    got = bpe_train(corpus_vocab(docs), n_merges=6)
    freqs = {}
    for w in corpus.split(" "):
        freqs[w] = freqs.get(w, 0) + 1
    want = _py_bpe(freqs, 6)
    assert got == want


def test_bpe_merge_handles_overlaps(spark):
    """'aaaa' under merge (a,a) → [aa, aa] (left-to-right,
    non-overlapping) — the classic greedy-application pitfall."""
    from pyspark.sql import functions as F

    from flume_source_spark.pipeline.text10 import _merge_symbols

    df = spark.createDataFrame([(["a", "a", "a", "a"],)], "symbols ARRAY<STRING>")
    out = df.select(_merge_symbols(F.col("symbols"), "a\x00a", "aa").alias("m")).collect()
    assert out[0]["m"] == ["aa", "aa"]
    df3 = spark.createDataFrame([(["a", "a", "a"],)], "symbols ARRAY<STRING>")
    out3 = df3.select(_merge_symbols(F.col("symbols"), "a\x00a", "aa").alias("m")).collect()
    assert out3[0]["m"] == ["aa", "a"]


def test_bpe_exact_twin_matches_fold_trainer(spark, sf_dir):
    """The replace-on-delimited-string merge application inside
    text_bpe_merges_exact must learn the SAME merges as the
    fold-based bpe_train on the same alpha-only sub-vocabulary — the
    twin's cross-engine hash then transitively pins the production
    trainer's algebra."""
    from pyspark.sql import functions as F

    from flume_source_spark.pipeline.dedup import spread
    from flume_source_spark.pipeline.text10 import (
        BPEX_MERGES,
        bpe_train,
        corpus_vocab,
    )
    from flume_source_spark.registry import load_all
    from flume_source_spark.tables import load_tables

    twin = sorted(
        (r["merge_idx"], r["left_sym"], r["right_sym"], r["weight"])
        for r in load_all()["text_bpe_merges_exact"].builder(spark, sf_dir).collect()
    )
    d = spread(load_tables(spark, sf_dir)["documents"]).select(
        "doc_id",
        F.concat_ws(
            " ",
            F.filter(F.split("text", " "), lambda w: w.rlike("^[a-z]+$")),
        ).alias("text"),
    )
    want = bpe_train(corpus_vocab(d), n_merges=BPEX_MERGES)
    assert twin == [(i + 1, a, b, w) for i, (a, b, w) in enumerate(want)]


def test_bpe_replace_application_handles_overlaps(spark):
    """'aaaa' as '||a||a||a||a||' under replace('|a||a|','|aa|') →
    '||aa||aa||' = [aa, aa] (left-to-right non-overlapping = greedy
    BPE), and 'aaa' → [aa, a] — the shared-boundary pitfall the
    double-delimiter representation exists to fix (single delimiters
    would give [aa, a, a] for 'aaaa'). Checked on Spark AND DuckDB:
    the twin's correctness rests on both engines' replace agreeing."""
    import duckdb
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("||a||a||a||a||",), ("||a||a||a||",)], "sym STRING")
    out = sorted(
        r["m"]
        for r in df.select(
            F.replace(F.col("sym"), F.lit("|a||a|"), F.lit("|aa|")).alias("m")
        ).collect()
    )
    assert out == ["||aa||aa||", "||aa||a||"]  # 'a' (0x61) sorts before '|' (0x7c)
    duck = sorted(
        r[0]
        for r in duckdb.sql(
            "SELECT replace(s, '|a||a|', '|aa|') FROM (VALUES"
            " ('||a||a||a||a||'), ('||a||a||a||')) t(s)"
        ).fetchall()
    )
    assert duck == out


def test_bpe_encode_compression_monotone(spark, sf_dir):
    from flume_source_spark.registry import load_all

    rows = sorted(
        (r["round"], r["weighted_tokens"])
        for r in load_all()["text_bpe_encode_stats"].builder(spark, sf_dir).collect()
    )
    toks = [t for _, t in rows]
    assert all(a > b for a, b in zip(toks, toks[1:])), toks  # every merge helps


def test_sql_udf_inlines_to_flat_join_plan(spark, sf_dir):
    """The declared SQL table UDF must decorrelate/inline to a plain
    join plan — no per-row subquery execution, no cartesian, no
    Python evaluation."""
    from flume_source_spark.operators.sqlapi4 import sql_declared_functions

    plan = sql_declared_functions(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" in plan  # the lateral became a real join


def test_weighted_median_hand_case(spark):
    """values 10(w=1), 20(w=1), 30(w=8): cumulative 1,2,10 of 10 →
    lower weighted median = 30 (first value reaching half)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    agg = spark.createDataFrame(
        [("g", 10, 1), ("g", 20, 1), ("g", 30, 8)], "flag STRING, cents LONG, w LONG"
    )
    wc = Window.partitionBy("flag").orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy("flag")
    cum = agg.select("flag", "cents", F.sum("w").over(wc).alias("cw"), F.sum("w").over(wt).alias("tw"))
    med = cum.groupBy("flag").agg(
        F.min(F.when(F.col("cw") * 2 >= F.col("tw"), F.col("cents"))).alias("m")
    ).collect()[0]["m"]
    assert med == 30


def test_bitmap_distinct_partials_merge_losslessly(spark):
    """The bitmap-distinct aggregate is mergeable: bit_or of two
    shards' word tables counts the distinct of the UNION exactly
    (overlap not double-counted)."""
    from pyspark.sql import functions as F

    def words(df):
        return (
            df.select(
                F.expr("id div 64").alias("w"),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(id, 64) AS INT))").alias("m"),
            )
            .groupBy("w")
            .agg(F.bit_or("m").alias("word"))
        )

    a = spark.range(0, 150)          # ids 0..149
    b = spark.range(100, 260)        # ids 100..259 (50 overlap)
    merged = (
        words(a).unionAll(words(b)).groupBy("w").agg(F.bit_or("word").alias("word"))
    )
    n = merged.select(F.sum(F.bit_count("word")).alias("n")).collect()[0]["n"]
    assert n == 260  # |0..259| exactly, overlap counted once


def test_triangle_census_hub_block_bounded_and_exact(spark):
    """VERDICT r5 item 7: the docstring argument that label blocking
    bounds degree (so degree-ordered orientation is unnecessary) gets
    a planted-hub pin. One label block of size B holds a hub
    topology: the hub vector is τ-similar to every spoke, spokes are
    pairwise dissimilar → B−1 edges all through the hub, ZERO
    triangles. A second block is a 5-clique (all pairwise similar)
    → 10 edges, C(5,3)=10 triangles. Assertions: (a) candidate pairs
    per block stay ≤ B(B−1)/2 — the blocking bound, no cross-block
    pair ever forms; (b) the census matches a numpy brute-force
    recount exactly. If a future fixture breaks (a), implement
    degree-ordered orientation (graph2.py docstring)."""
    import numpy as np

    from flume_source_spark.pipeline.graph2 import (
        similarity_edges_from,
        triangle_census,
    )

    B = 24
    rows = []
    vecs = {}
    # hub block: hub = e0; spoke s = (α·e0 + β·e_{s}) with α chosen so
    # cos(hub, spoke) = α ≥ 0.35 but cos(spoke, spoke') = α² < 0.35
    alpha = 0.5
    beta = float(np.sqrt(1 - alpha**2))
    dim = B + 2
    hub = [0.0] * dim
    hub[0] = 1.0
    rows.append((0, "hub", hub))
    vecs[0] = ("hub", np.array(hub))
    for s in range(1, B):
        v = [0.0] * dim
        v[0], v[s + 1] = alpha, beta
        rows.append((s, "hub", v))
        vecs[s] = ("hub", np.array(v))
    # clique block: 5 near-identical vectors
    for c in range(5):
        v = [0.0] * dim
        v[0], v[1] = 1.0, 1e-3 * c
        rows.append((100 + c, "clique", v))
        vecs[100 + c] = ("clique", np.array(v) / np.linalg.norm(v))

    e = spark.createDataFrame(rows, "vec_id long, label string, v0 array<double>")
    edges = similarity_edges_from(e).collect()

    # (a) blocking bound: every pair intra-block, per-block pair count
    # ≤ B(B−1)/2 even with the planted hub
    from collections import Counter

    lbl = {vid: l for vid, (l, _) in vecs.items()}
    per_block = Counter(r.label for r in edges)
    for r in edges:
        assert lbl[r.i] == lbl[r.j] == r.label
    assert per_block["hub"] <= B * (B - 1) // 2
    assert per_block["hub"] == B - 1  # star: hub-spoke edges only
    assert per_block["clique"] == 10

    # (b) census == numpy brute force
    got = {r.label: (r.n_edges, r.n_triangles) for r in triangle_census(
        spark.createDataFrame([(r.i, r.j, r.label) for r in edges], "i long, j long, label string")
    ).collect()}
    ids = sorted(vecs)
    unit = {i: vecs[i][1] / np.linalg.norm(vecs[i][1]) for i in ids}
    brute_edges = {
        (a, b)
        for a in ids
        for b in ids
        if a < b and lbl[a] == lbl[b] and float(unit[a] @ unit[b]) >= 0.35
    }
    assert {(r.i, r.j) for r in edges} == brute_edges
    brute_tri = Counter()
    be = brute_edges
    for a, b in be:
        for c in ids:
            if c > b and (b, c) in be and (a, c) in be:
                brute_tri[lbl[a]] += 1
    assert got["hub"] == (B - 1, 0)
    assert got["clique"] == (10, brute_tri["clique"]) == (10, 10)


def test_bpe_twins_cross_check_merge_weight_equals_token_drop(spark, sf_dir):
    """The two BPE twins must agree on the trainer's intermediate
    states, not just pass their own oracles: each collapsed pair
    occurrence removes one symbol, so round r's corpus-weighted token
    count drops by the number of collapses. For a merge with
    left ≠ right, occurrences cannot overlap (overlap at a shared
    symbol needs left == right), so collapses == the counted weight
    EXACTLY. For a self-pair (a,a), a run of k a's counts k−1
    overlapping pairs but greedily collapses only ⌊k/2⌋ — there the
    drop is bounded by (weight/2, weight]. The fixture's learned
    merges are non-self-pairs, so the exact branch is the one
    exercised; the bound branch keeps the test honest if a future
    fixture learns (a,a)."""
    from flume_source_spark.registry import load_all

    merges = {
        r["merge_idx"]: (r["left_sym"], r["right_sym"], r["weight"])
        for r in load_all()["text_bpe_merges_exact"].builder(spark, sf_dir).collect()
    }
    curve = {
        r["round"]: r["weighted_tokens"]
        for r in load_all()["text_bpe_encode_curve_exact"].builder(spark, sf_dir).collect()
    }
    assert set(curve) == set(merges) | {0}
    for r, (a, b, w) in merges.items():
        drop = curve[r - 1] - curve[r]
        if a != b:
            assert drop == w, (r, a, b, drop, w)
        else:
            assert w // 2 < drop <= w, (r, a, b, drop, w)


def test_bpex_trainer_survives_word_collapsing_to_single_symbol(spark):
    """A word whose end-of-word marker gets absorbed by a merge
    collapses to ONE symbol ('a' after merge (a,_) → '||a_||'); the
    next round's pair scan must skip it, not crash (unguarded,
    sequence(1, size-1) DESCENDS to [1, 0] at size 1 and
    element_at(s, 0) throws). Constructed corpus: 'a'×10 forces
    (a,_) as merge 1 via the a<b tiebreak against (b,c)×10, then
    rounds 2-3 run over a vocabulary containing the collapsed word."""
    from flume_source_spark.pipeline.text10 import bpex_train_vocab

    def delim(w):
        return "||" + "".join(ch + "||" for ch in w + "_")

    vocab = spark.createDataFrame(
        [(delim("a"), 10), (delim("bc"), 6), (delim("bcd"), 4)],
        "sym STRING, freq LONG",
    )
    merges, vocabs = bpex_train_vocab(vocab, n_merges=3)
    # r1: (a,_)=10 ties (b,c)=10, left-asc tiebreak picks 'a';
    # r2: (b,c)=10 — the collapsed '||a_||' contributes no pairs;
    # r3: (bc,_)=6 over (bc,d)=(d,_)=4
    assert merges == [(1, "a", "_", 10), (2, "b", "c", 10), (3, "bc", "_", 6)]
    syms_r1 = {r.sym for r in vocabs[1].collect()}
    assert delim("a").replace("a||_", "a_") in syms_r1  # the 1-symbol word
