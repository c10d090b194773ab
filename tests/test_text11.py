"""Property + plan pins for text wave 11 (BM25 ranked retrieval).
The query is DuckDB-hash-oracled; these tests pin the invariants the
hash can't see (exact-integer scoring arithmetic vs an independent
Python recompute, panel construction, broadcast/pruning plan shape,
top-k contract)."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from flume_source_spark.pipeline.text11 import BM25_K, BM25_PANEL
from flume_source_spark.registry import load_all
from flume_source_spark.tables import load_tables
from tests.test_plans import plan

SPECS = load_all()


def run(name, spark, sf_dir):
    return SPECS[name].builder(spark, sf_dir)


def _python_bm25(docs):
    """Third implementation: plain-Python exact-integer BM25 over
    (doc_id, text) rows, mirroring the documented arithmetic."""
    tf: Counter = Counter()
    dl: Counter = Counter()
    for doc_id, text in docs:
        toks = [t for t in text.split(" ") if t != ""]
        for t in toks:
            tf[(doc_id, t)] += 1
        dl[doc_id] += len(toks)
    n_docs = len(docs)
    l_toks = sum(dl.values())
    avgdl_pm = (1000 * l_toks) // n_docs
    df: Counter = Counter()
    for (_, t) in tf:
        df[t] += 1
    panel = sorted(df, key=lambda t: (-df[t], t))[:BM25_PANEL]
    out = {}
    for q in panel:
        scored = []
        for (doc_id, t), f_ in tf.items():
            if t != q:
                continue
            d = dl[doc_id]
            tf_ppm = (1000000 * 44 * f_ * avgdl_pm) // (
                20 * f_ * avgdl_pm + 6 * avgdl_pm + 18000 * d
            )
            idf_pm = (1000 * (2 * n_docs - 2 * df[q] + 1)) // (2 * df[q] + 1)
            scored.append((tf_ppm * idf_pm, doc_id, f_, d))
        scored.sort(key=lambda r: (-r[0], r[1]))
        out[q] = [
            (rank + 1, doc_id, f_, d, s)
            for rank, (s, doc_id, f_, d) in enumerate(scored[:BM25_K])
        ]
    return out


def test_bm25_matches_python_recompute(spark, sf_dir):
    docs = [
        (r.doc_id, r.text)
        for r in load_tables(spark, sf_dir)["documents"]
        .select("doc_id", "text")
        .collect()
    ]
    expect = _python_bm25(docs)
    rows = run("text_bm25_topk", spark, sf_dir).collect()
    got: dict = {}
    for r in rows:
        got.setdefault(r.qtok, []).append((r.rnk, r.doc_id, r.tf, r.dl, r.score))
    assert set(got) == set(expect), "query panel = top-df tokens"
    for q in expect:
        assert got[q] == expect[q], f"ranking for {q!r}"


def test_bm25_topk_contract(spark, sf_dir):
    rows = run("text_bm25_topk", spark, sf_dir).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.qtok, []).append(r)
    assert len(by_q) == BM25_PANEL
    for q, rs in by_q.items():
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= BM25_K
        # score non-increasing, doc_id ascending within ties
        for a, b in zip(rs, rs[1:]):
            assert a.score >= b.score
            if a.score == b.score:
                assert a.doc_id < b.doc_id
        for r in rs:
            assert r.score >= 0 and 1 <= r.tf <= r.dl


def test_bm25_plan_shape(spark, sf_dir):
    """The panel and corpus-scalar joins must broadcast (never a
    corpus-wide shuffle against an 8-row side), and a window over
    BM25_PANEL keys must exist exactly once. Pins the LAZY plan —
    the registered query checkpoints its ≤ panel·K-row result (to
    release the tf cache), which collapses the executed plan."""
    from flume_source_spark.pipeline.text11 import _bm25_lazy

    lazy, tf = _bm25_lazy(spark, sf_dir)
    lazy.collect()
    p = lazy._jdf.queryExecution().executedPlan().toString()
    tf.unpersist(blocking=False)
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert len(re.findall(r"\bWindow\b", p)) >= 1
    # the tf wordcount must reach the panel join pruned, not the raw
    # corpus: the explode feeds an agg (partial_count present)
    assert "partial_count" in p or "HashAggregate" in p


def test_fused_lloyd_round_matches_numpy_reference(spark):
    """The fused assign-and-partial-sum Lloyd round (similarity.py)
    must train the SAME centroid matrix as a straightforward numpy
    k-means with the documented semantics: seeds = nlist lowest
    xxhash64-ordered ids, assignment = argmax cosine (first index at
    the max), means over RAW vectors, 6-dp round then re-normalize,
    empty clusters keep their previous centroid. The 6-dp round is
    what licenses comparing across float-sum orders."""
    import numpy as np

    from flume_source_spark.pipeline.similarity import train_spherical_kmeans

    rng = np.random.RandomState(7)
    vecs = rng.randn(60, 8).round(3)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(60)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    nlist, iters = 5, 2
    got = train_spherical_kmeans(e, nlist, iters)

    seed_ids = [
        r.vec_id
        for r in e.selectExpr("vec_id", "xxhash64(cast(vec_id as string)) h")
        .orderBy("h", "vec_id")
        .limit(nlist)
        .collect()
    ]
    c = vecs[seed_ids].astype(np.float64)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    for _ in range(iters):
        m_n = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        cl = np.argmax(m_n @ c.T, axis=1)
        new_c = c.copy()
        for k in range(nlist):
            mem = vecs[cl == k]
            if len(mem):
                v = mem.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    new_c[k] = v / n
        c = np.round(new_c, 6)
        norms = np.linalg.norm(c, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        c = c / norms
    assert np.allclose(got, c, atol=2e-6), np.abs(got - c).max()


def test_bm25_search_matches_python_recompute(spark, sf_dir):
    """Multi-term search: sum of per-term scores over the fixed query,
    OR semantics, global top-K — recomputed in plain Python."""
    from flume_source_spark.pipeline.text11 import BM25_QUERY, BM25_SEARCH_K

    docs = [
        (r.doc_id, r.text)
        for r in load_tables(spark, sf_dir)["documents"]
        .select("doc_id", "text")
        .collect()
    ]
    tf: Counter = Counter()
    dl: Counter = Counter()
    for doc_id, text in docs:
        toks = [t for t in text.split(" ") if t != ""]
        for t in toks:
            tf[(doc_id, t)] += 1
        dl[doc_id] += len(toks)
    n_docs = len(docs)
    avgdl_pm = (1000 * sum(dl.values())) // n_docs
    df: Counter = Counter()
    for (_, t) in tf:
        if t in BM25_QUERY:
            df[t] += 1
    agg: dict = {}
    for (doc_id, t), f_ in tf.items():
        if t not in BM25_QUERY:
            continue
        d = dl[doc_id]
        tf_ppm = (1000000 * 44 * f_ * avgdl_pm) // (
            20 * f_ * avgdl_pm + 6 * avgdl_pm + 18000 * d
        )
        idf_pm = (1000 * (2 * n_docs - 2 * df[t] + 1)) // (2 * df[t] + 1)
        n, s = agg.get(doc_id, (0, 0))
        agg[doc_id] = (n + 1, s + tf_ppm * idf_pm)
    order = sorted(agg.items(), key=lambda kv: (-kv[1][1], kv[0]))[:BM25_SEARCH_K]
    expect = [
        (rank + 1, doc_id, n, s) for rank, (doc_id, (n, s)) in enumerate(order)
    ]
    rows = run("text_bm25_search", spark, sf_dir).collect()
    got = [(r.rnk, r.doc_id, r.n_terms, r.score) for r in rows]
    assert got == expect


def test_bm25_search_topk_is_take_ordered(spark, sf_dir):
    """The global top-K must plan as a TakeOrdered (sort-limit), never
    a full global sort of the per-document rollup."""
    p = plan(spark, sf_dir, "text_bm25_search")
    assert "TakeOrderedAndProject" in p
