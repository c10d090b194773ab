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
            assert (a.score, -a.doc_id) >= (b.score, -b.doc_id) or a.score > b.score
            if a.score == b.score:
                assert a.doc_id < b.doc_id
        for r in rs:
            assert r.score >= 0 and 1 <= r.tf <= r.dl


def test_bm25_plan_shape(spark, sf_dir):
    """The panel and corpus-scalar joins must broadcast (never a
    corpus-wide shuffle against an 8-row side), and a window over
    BM25_PANEL keys must exist exactly once."""
    p = plan(spark, sf_dir, "text_bm25_topk")
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert len(re.findall(r"\bWindow\b", p)) >= 1
    # the tf wordcount must reach the panel join pruned, not the raw
    # corpus: the explode feeds an agg (partial_count present)
    assert "partial_count" in p or "HashAggregate" in p
