"""Property pins for dataset wave 8 (release QA). Both queries are
DuckDB-hash-oracled; these pin the operator-level invariants and the
generality of ``snapshot_diff`` on hand-built snapshots."""

from __future__ import annotations

from pyspark.sql import functions as F

from flume_source_spark.pipeline.dataset8 import (
    KANON_K,
    RULE_V1_MIN_CHARS,
    RULE_V2_MIN_CHARS,
    snapshot_diff,
)
from flume_source_spark.registry import load_all
from flume_source_spark.tables import load_tables

SPECS = load_all()


def run(name, spark, sf_dir):
    return SPECS[name].builder(spark, sf_dir)


def test_snapshot_diff_partitions_both_snapshots(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    a = docs.where(F.col("n_chars") >= RULE_V1_MIN_CHARS)
    b = docs.where(
        (F.col("n_chars") >= RULE_V2_MIN_CHARS) | (F.col("lang") == "zh")
    )
    rows = run("ds_snapshot_diff", spark, sf_dir).collect()
    # added+common must reassemble B, removed+common must reassemble A
    assert sum(r.n_added + r.n_common for r in rows) == b.count()
    assert sum(r.n_removed + r.n_common for r in rows) == a.count()
    # the non-nested rule change must exercise every diff class
    assert sum(r.n_added for r in rows) > 0
    assert sum(r.n_removed for r in rows) > 0
    assert sum(r.n_common for r in rows) > 0


def test_snapshot_diff_operator_on_planted_frames(spark):
    mk = lambda ids: spark.createDataFrame(
        [(i, f"s{i % 2}") for i in ids], "doc_id long, source string"
    )
    out = {
        r.source: r
        for r in snapshot_diff(mk([1, 2, 3, 4]), mk([3, 4, 5, 6, 8])).collect()
    }
    # A-only: 1,2 — B-only: 5,6,8 — common: 3,4 (source = parity of id)
    assert (out["s0"].n_added, out["s0"].n_removed, out["s0"].n_common) == (2, 1, 1)
    assert (out["s1"].n_added, out["s1"].n_removed, out["s1"].n_common) == (1, 1, 1)


def test_k_anonymity_recomputed_in_pandas(spark, sf_dir):
    pdf = load_tables(spark, sf_dir)["documents"].select(
        "lang", "source", "n_chars"
    ).toPandas()
    pdf["len_bucket"] = (pdf.n_chars // 100) * 100
    classes = (
        pdf.groupby(["lang", "source", "len_bucket"]).size().rename("sz").reset_index()
    )
    for r in run("ds_k_anonymity_audit", spark, sf_dir).collect():
        c = classes[classes.lang == r.lang]
        assert r.n_classes == len(c)
        assert r.at_risk_classes == int((c.sz < KANON_K).sum())
        assert r.at_risk_docs == int(c.sz[c.sz < KANON_K].sum())
        assert r.min_class_size == int(c.sz.min())
        assert 0 <= r.at_risk_classes <= r.n_classes
