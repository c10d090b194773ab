"""Round-9 session-2 operator properties beyond the oracle hash:
banded-DTW kernel vs an independent full-matrix reference, KS and
chi-square vs pure-python recomputes from the fixture, and the
two-hop neighborhood function on planted topologies."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from flume_source_spark.operators.timeseries7 import _INF, _dtw_band_cost
from flume_source_spark.registry import load_all

SPECS = load_all()


def _dtw_reference(x, y, r):
    """Independent full-matrix banded DTW (dict-of-cells, no rolling
    rows) — a different formulation from the kernel's two-row DP."""
    n, m = len(x), len(y)
    dp = {}
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            if abs(i - j) > r:
                continue
            c = abs(x[i - 1] - y[j - 1])
            if i == 1 and j == 1:
                dp[(1, 1)] = c
                continue
            best = min(
                dp.get((i - 1, j), _INF),
                dp.get((i - 1, j - 1), _INF),
                dp.get((i, j - 1), _INF),
            )
            dp[(i, j)] = c + best
    return dp[(n, m)]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=24),
    st.data(),
)
def test_dtw_kernel_matches_full_matrix_reference(x, data):
    y = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=50), min_size=len(x), max_size=len(x)
        )
    )
    assert _dtw_band_cost(x, y) == _dtw_reference(x, y, r=2)


def test_dtw_identity_and_shift_tolerance():
    x = [0] * 24
    x[5] = 100
    assert _dtw_band_cost(x, x) == 0
    shifted = [0] * 24
    shifted[7] = 100  # two positions late — inside the r=2 band
    # The warp path absorbs the shift entirely; L1 would read 200.
    assert _dtw_band_cost(x, shifted) == 0
    far = [0] * 24
    far[10] = 100  # five positions late — outside the band
    assert _dtw_band_cost(x, far) == 200


def _fixture_docs(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT source, lang, n_chars, doc_id FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()


def test_ks_matches_python_recompute(spark, sf_dir):
    rows = _fixture_docs(sf_dir)
    got = {
        r["source"]: (r["na"], r["nb"], r["ks_num"], r["ks_at_value"], r["ks_ppm"])
        for r in SPECS["dq_ks_two_sample_exact"].builder(spark, sf_dir).collect()
    }
    by_source: dict[str, tuple[list[int], list[int]]] = {}
    for source, lang, n_chars, _ in rows:
        a, b = by_source.setdefault(source, ([], []))
        (a if lang == "en" else b).append(n_chars)
    for source, (a, b) in by_source.items():
        if not a or not b:
            assert source not in got
            continue
        na, nb = len(a), len(b)
        best, at = -1, None
        for v in sorted(set(a) | set(b)):
            d = abs(sum(1 for t in a if t <= v) * nb - sum(1 for t in b if t <= v) * na)
            if d > best:
                best, at = d, v
        assert got[source] == (na, nb, best, at, best * 10**6 // (na * nb)), source


def test_chi2_matches_python_recompute(spark, sf_dir):
    rows = _fixture_docs(sf_dir)
    got = {
        r["source"]: (r["a"], r["b"], r["c"], r["d"], r["chi2_ppm"])
        for r in SPECS["dq_chi2_drift_2x2"].builder(spark, sf_dir).collect()
    }
    by_source: dict[str, list[tuple[int, str]]] = {}
    for source, lang, _, doc_id in rows:
        by_source.setdefault(source, []).append((doc_id, lang))
    for source, docs in by_source.items():
        docs.sort()
        half1 = docs[: (len(docs) + 1) // 2]  # ntile puts the remainder first
        half2 = docs[(len(docs) + 1) // 2 :]
        a = sum(1 for _, lg in half1 if lg == "en")
        b = len(half1) - a
        c = sum(1 for _, lg in half2 if lg == "en")
        d = len(half2) - c
        if min(a + c, b + d, a + b, c + d) == 0:
            assert source not in got
            continue
        t = a + b + c + d
        chi2_ppm = t * (a * d - b * c) ** 2 * 10**6 // ((a + b) * (c + d) * (a + c) * (b + d))
        assert got[source] == (a, b, c, d, chi2_ppm), source


def test_two_hop_reach_on_planted_topologies(spark):
    from flume_source_spark.pipeline.graph3 import two_hop_reach

    # Star on 5 nodes: center 0 reaches all 4 in one hop (and nothing
    # more at two); each leaf reaches 1 directly, all 4 within two.
    star = spark.createDataFrame([(0, k) for k in (1, 2, 3, 4)], "i long, j long")
    got = {r["v"]: (r["reach1"], r["reach2"]) for r in two_hop_reach(star).collect()}
    assert got[0] == (4, 4)
    for leaf in (1, 2, 3, 4):
        assert got[leaf] == (1, 4)

    # Path 0-1-2-3-4: interior nodes see 2 at one hop; two-hop reach
    # is the distance-<=2 ball minus self.
    path = spark.createDataFrame([(k, k + 1) for k in range(4)], "i long, j long")
    got = {r["v"]: (r["reach1"], r["reach2"]) for r in two_hop_reach(path).collect()}
    assert got == {
        0: (1, 2),
        1: (2, 3),
        2: (2, 4),
        3: (2, 3),
        4: (1, 2),
    }


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.data(),
)
def test_dtw_block_kernel_matches_per_user_reference(u, data):
    """The vectorized block kernel (one numpy DP across all users in a
    hash block) must agree row-for-row with the per-user python DP —
    the blocking is a pure execution detail."""
    import numpy as np

    xm = np.array(
        data.draw(
            st.lists(
                st.lists(st.integers(min_value=0, max_value=99), min_size=24, max_size=24),
                min_size=u,
                max_size=u,
            )
        ),
        dtype=np.int64,
    )
    y = np.array(
        data.draw(st.lists(st.integers(min_value=0, max_value=99), min_size=24, max_size=24)),
        dtype=np.int64,
    )
    from flume_source_spark.operators.timeseries7 import _dtw_band_block

    got = _dtw_band_block(xm, y)
    assert got.tolist() == [_dtw_band_cost(list(row), list(y)) for row in xm]


def test_attribution_matches_python_recompute(spark, sf_dir):
    """Last-touch attribution recomputed in pure python from the
    fixture: per user, events sorted by (micro-ts, event_id); each
    purchase credits the latest strictly-preceding click/view within
    the 7-day lookback."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    got = {
        r["event_id"]: (r["attr_event_id"], r["attr_type"], r["lag_us"])
        for r in SPECS["ts_attribution_last_touch"].builder(spark, sf_dir).collect()
    }
    from flume_source_spark.operators.timeseries7 import _ATTR_LOOKBACK_US

    by_user: dict[int, list] = {}
    for u, e, t, us in rows:
        by_user.setdefault(u, []).append((us, e, t))
    expect = {}
    for u, evs in by_user.items():
        evs.sort()
        last = None
        for us, e, t in evs:
            if t == "purchase":
                if last is not None and us - last[0] <= _ATTR_LOOKBACK_US:
                    expect[e] = (last[1], last[2], us - last[0])
                else:
                    expect[e] = (None, None, None)
            if t in ("click", "view"):
                last = (us, e, t)
    assert got == expect
