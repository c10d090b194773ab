"""Property-based tests (hypothesis), per SURVEY.md §5.2:

- consume-order selection vs a naive Python model of the reference's
  scan loops (CephFSEventReader.java:135-156)
- MinHash signature agreement as an unbiased Jaccard estimator on
  arbitrary small shingle universes (the math behind dedup_minhash_lsh)
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from flume_source_spark.pipeline.dedup import MERSENNE31, _HASH_PARAMS, N_HASHES
from flume_source_spark.sources.filemeta import _order_files

names = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
files = st.lists(
    st.tuples(names, st.integers(0, 50)).map(lambda t: (t[0], f"/x/{t[0]}", float(t[1]))),
    min_size=1,
    max_size=25,
    unique_by=lambda f: f[0],
)


def naive_oldest(fs):
    """Reference model: linear scan keeping the smaller mtime; on ties
    the lexicographically smaller name (Reader:146-156, 161-166)."""
    best = fs[0]
    for f in fs[1:]:
        if f[2] < best[2] or (f[2] == best[2] and f[0] < best[0]):
            best = f
    return best


def naive_youngest(fs):
    best = fs[0]
    for f in fs[1:]:
        if f[2] > best[2] or (f[2] == best[2] and f[0] < best[0]):
            best = f
    return best


@given(files)
@settings(max_examples=200, deadline=None)
def test_oldest_matches_reference_model(fs):
    assert _order_files(fs, "oldest")[0] == naive_oldest(fs)


@given(files)
@settings(max_examples=200, deadline=None)
def test_youngest_matches_reference_model(fs):
    assert _order_files(fs, "youngest")[0] == naive_youngest(fs)


@given(files)
@settings(max_examples=100, deadline=None)
def test_full_drain_order_is_repeated_selection(fs):
    """Sorting once == the reference's repeated select-and-remove loop
    (this equivalence is WHY one sorted listing per micro-batch can
    replace the reference's O(n²) per-event re-scan)."""
    remaining = list(fs)
    drained = []
    while remaining:
        pick = naive_oldest(remaining)
        drained.append(pick)
        remaining.remove(pick)
    assert _order_files(fs, "oldest") == drained


def _minhash_sig(shingle_hashes: set[int]) -> list[int]:
    """Pure-Python mirror of pipeline.dedup.minhash_signature's math."""
    return [
        min((a * h + b) % MERSENNE31 for h in shingle_hashes)  # h already in [0, 2^30)
        for a, b in _HASH_PARAMS
    ]


# sets drawn from the (masked) hash universe [0, 2^30): real inputs are
# uniform xxhash64 outputs, where universe collisions are ~2^-30 noise;
# adversarial colliding pre-images (found by hypothesis when the model
# masked arbitrary 63-bit ints) are not part of the estimator's contract
shingle_sets = st.sets(st.integers(0, 2**30 - 1), min_size=1, max_size=40)


@given(shingle_sets, shingle_sets)
@settings(max_examples=60, deadline=None)
def test_minhash_agreement_estimates_jaccard(a, b):
    """P(h_min(A) == h_min(B)) = J(A,B); with 63 hashes the agreement
    fraction must land within a generous CLT bound of the true Jaccard
    (σ = sqrt(J(1-J)/63) ≤ 0.063; 4σ ≈ 0.26)."""
    true_j = len(a & b) / len(a | b)
    sa, sb = _minhash_sig(a), _minhash_sig(b)
    agree = sum(x == y for x, y in zip(sa, sb)) / N_HASHES
    assert abs(agree - true_j) <= 0.27, (true_j, agree)


@given(shingle_sets)
@settings(max_examples=30, deadline=None)
def test_minhash_identical_sets_agree_fully(a):
    assert _minhash_sig(a) == _minhash_sig(set(a))


def test_csv_failfast_raises(spark, tmp_path):
    """FAILFAST is the third malformed-CSV policy (PERMISSIVE /
    DROPMALFORMED are oracle-checked by source_csv_malformed): a
    malformed row must raise, not pass through."""
    import pytest

    p = tmp_path / "bad.csv"
    p.write_text("1,alpha,10\n2,beta,oops\n")
    df = (
        spark.read.schema("id long, name string, qty long")
        .option("mode", "FAILFAST")
        .csv(str(tmp_path))
    )
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        df.collect()


def test_observation_metrics_piggyback(spark, sf_dir):
    """df.observe(Observation, ...) collects metrics DURING the action
    (no second scan) — the Spark-native accumulator surface for
    pipeline health counters (rows seen, nulls, sum checks)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    obs = Observation("li_health")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("null_qty"),
    )
    n = observed.filter(F.col("l_quantity") > 0).count()
    m = obs.get
    assert m["n_rows"] >= n and m["null_qty"] == 0


def test_dynamic_partition_overwrite_leaves_other_partitions(spark, tmp_path):
    """partitionOverwriteMode=dynamic: an INSERT OVERWRITE-style write
    that only touches partition A must leave partition B intact (static
    mode would wipe the whole table) — the operational contract for
    incremental re-processing of one day/source at 100 TB."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, part string"
    )
    base.write.partitionBy("part").parquet(out)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        spark.createDataFrame([(99, "a")], "id long, part string").write.mode(
            "overwrite"
        ).partitionBy("part").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    got = {(r.id, r.part) for r in spark.read.parquet(out).collect()}
    assert got == {(99, "a"), (3, "b")}, got  # a replaced, b untouched


# ---- session-3 primitives: grid blocking, BPE merge, segmentation


_points_strat = st.lists(
    st.tuples(st.integers(0, 500), st.integers(0, 500)), min_size=0, max_size=12
)


@given(_points_strat)
@settings(max_examples=25, deadline=None)
def test_grid_pairs_equals_bruteforce_random(spark, pts):
    """Grid blocking is EXACT on arbitrary point sets (radius 100,
    coordinates straddling cells at will)."""
    from flume_source_spark.operators.geo import grid_pairs

    rows = [(i, la, lo) for i, (la, lo) in enumerate(pts)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "id LONG, lat_cd LONG, lon_cd LONG")
    got = {(r["i"], r["j"], r["d2"]) for r in grid_pairs(df).collect()}
    brute = set()
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            d2 = (rows[a][1] - rows[b][1]) ** 2 + (rows[a][2] - rows[b][2]) ** 2
            if d2 <= 100 * 100:
                brute.add((a, b, d2))
    assert got == brute


_symbols_strat = st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=10)


@given(_symbols_strat, st.sampled_from([("a", "b"), ("a", "a"), ("b", "c")]))
@settings(max_examples=25, deadline=None)
def test_bpe_merge_fold_matches_python(spark, syms, pair):
    """The HOF merge fold equals the reference greedy left-to-right
    non-overlapping application on arbitrary symbol strings."""
    from pyspark.sql import functions as F

    from flume_source_spark.pipeline.text10 import _merge_symbols

    a, b = pair
    out_ref, jm = [], False
    for x in syms:
        if not jm and out_ref and out_ref[-1] == a and x == b:
            out_ref[-1] = a + b
            jm = True
        else:
            out_ref.append(x)
            jm = False
    df = spark.createDataFrame([(syms,)], "symbols ARRAY<STRING>")
    got = df.select(
        _merge_symbols(F.col("symbols"), f"{a}\x00{b}", a + b).alias("m")
    ).collect()[0]["m"]
    assert got == out_ref


@given(st.lists(st.sampled_from(["x", "yy", "zzz"]), min_size=1, max_size=35))
@settings(max_examples=25, deadline=None)
def test_line_dedup_segmentation_accounting(spark, words):
    """Segment accounting invariants on arbitrary docs: segment count
    = ceil(tokens/SEG), token mass conserved (kept + dropped =
    total), self-repetition never counts as duplication for a
    single-doc corpus."""
    from flume_source_spark.pipeline.text9 import SEG, line_dedup_stats

    text = " ".join(words)
    n_tokens = len(words)
    df = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    row = line_dedup_stats(df).collect()[0]
    assert row["n_tokens"] == n_tokens
    assert row["n_segments"] == -(-n_tokens // SEG)
    assert row["n_dup_segments"] == 0  # single doc: df(seg) == 1 always
    assert row["kept_tokens"] == n_tokens


@given(
    st.lists(
        st.tuples(st.integers(1, 30), st.integers(1, 4), st.integers(1, 50)),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=25, deadline=None)
def test_keep_best_matches_python_argmax(spark, members):
    """keep_best's mergeable max_by election equals the reference
    argmax (longest, tie → smallest doc_id) on random memberships."""
    from flume_source_spark.pipeline.canonical import keep_best

    df = spark.createDataFrame(
        members, "doc_id LONG, component_id LONG, n_tokens LONG"
    )
    got = {r["component_id"]: (r["keeper_doc_id"], r["dropped_tokens"]) for r in keep_best(df).collect()}
    by_comp = {}
    for d, c, n in members:
        by_comp.setdefault(c, []).append((d, n))
    for c, rows in by_comp.items():
        keeper = min(rows, key=lambda t: (-t[1], t[0]))
        dropped = sum(n for _, n in rows) - max(n for _, n in rows)
        assert got[c] == (keeper[0], dropped)


def test_hamming_pairs_partition_invariant(spark):
    """The banded Hamming join returns the identical pair set
    regardless of input partitioning (1 vs 16 partitions) — no
    partition-order dependence anywhere in the pipeline."""
    from flume_source_spark.pipeline.dedup2 import hamming_pairs

    base = 0b1011_0100_0101_1010_1100_1100_0011_0101
    codes = [(i, base ^ (i % 7)) for i in range(60)]
    df = spark.createDataFrame(codes, "doc_id LONG, simhash LONG")
    one = {(r["i"], r["j"], r["hamming"]) for r in hamming_pairs(df.coalesce(1)).collect()}
    many = {(r["i"], r["j"], r["hamming"]) for r in hamming_pairs(df.repartition(16)).collect()}
    assert one == many and one
