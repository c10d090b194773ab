"""Property + plan pins for dataset wave 7 (mixture rebalance,
collocation mining). Both queries are DuckDB-hash-oracled; these tests
pin the invariants the hash can't see (rate construction, integer lift
arithmetic, broadcast/map-side plan shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flume_source_spark.pipeline.dataset7 import MIX_MOD, PMI_MIN_PAIR, PMI_TOP, PMI_VOCAB
from flume_source_spark.registry import load_all
from flume_source_spark.tables import load_tables
from tests.test_plans import plan

SPECS = load_all()


def run(name, spark, sf_dir):
    return SPECS[name].builder(spark, sf_dir)


def test_mix_rebalance_rate_construction(spark, sf_dir):
    rows = {r.lang: r for r in run("ds_domain_mix_rebalance", spark, sf_dir).collect()}
    langs = load_tables(spark, sf_dir)["documents"].select("lang").distinct().count()
    assert len(rows) == langs, "one summary row per language"
    m = min(r.n_before for r in rows.values())
    for r in rows.values():
        # rate is exactly floor(1e6 * min / n) — the rarest language
        # keeps everything, larger ones downsample proportionally
        assert r.rate_ppm == (MIX_MOD * m) // r.n_before
        assert 0 < r.rate_ppm <= MIX_MOD
        assert 0 <= r.n_after <= r.n_before
    assert any(r.rate_ppm == MIX_MOD for r in rows.values())
    # monotonicity: more docs before → no larger acceptance rate
    by_n = sorted(rows.values(), key=lambda r: r.n_before)
    for x, y in zip(by_n, by_n[1:]):
        assert x.rate_ppm >= y.rate_ppm


def test_mix_rebalance_no_shuffle_joins(spark, sf_dir):
    # every join in this plan (corpus-side gate, audit join-back) must
    # resolve to broadcast — none may survive as a shuffle join. NOTE
    # the limits of a plan-string pin under AQE: a #langs-row side
    # would be broadcast-converted at runtime even without the
    # explicit hint, so this guards the resolved SHAPE (no
    # SortMergeJoin in the final adaptive plan, broadcast joins
    # present), not the presence of the F.broadcast hint itself
    p = plan(spark, sf_dir, "ds_domain_mix_rebalance")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_pmi_lift_integer_arithmetic(spark, sf_dir):
    rows = run("text_cooccurrence_pmi", spark, sf_dir).collect()
    assert 0 < len(rows) <= PMI_TOP
    n_docs = load_tables(spark, sf_dir)["documents"].count()
    for r in rows:
        assert r.tok_a < r.tok_b, "pairs emitted once, canonically ordered"
        assert PMI_MIN_PAIR <= r.c_ab <= min(r.df_a, r.df_b)
        assert r.lift_ppm == (MIX_MOD * r.c_ab * n_docs) // (r.df_a * r.df_b)


def test_pmi_pairs_come_from_topv_vocab(spark, sf_dir):
    toks = (
        load_tables(spark, sf_dir)["documents"]
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
    )
    vocab = {
        r.tok
        for r in toks.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), "tok")
        .limit(PMI_VOCAB)
        .collect()
    }
    for r in run("text_cooccurrence_pmi", spark, sf_dir).collect():
        assert r.tok_a in vocab and r.tok_b in vocab


def test_pmi_vocab_join_broadcast_and_topk(spark, sf_dir):
    p = plan(spark, sf_dir, "text_cooccurrence_pmi")
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p, "LIMIT+ORDER BY must plan as top-k"
    # the pair stage is an array expansion off one doc_id exchange —
    # a doc_id SELF-JOIN creeping back in would double the corpus
    # exchange and sort both sides
    assert "SortMergeJoin" not in p
