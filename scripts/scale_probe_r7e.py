"""Round-7 SCALE.md measurements, part 5: the approximation-quality
audits.

1. sim_ann_recall_audit at 1x and 8x embeddings (vec_id shifted —
   the query panel stays the SAME Q_MAX-bounded set because shifted
   ids fail the vec_id < QUERY_MOD*Q_MAX gate). Claim: linear-ish —
   the exact side is one corpus scan against a broadcast query panel;
   the IVF side scales like sim_ann_ivf_exact's measured 2.4x.
2. dedup_lsh_recall_audit at 1x and 8x documents under the FIXED
   sample rate (sample grows 8x with the corpus — the shape that
   motivates the budget knob), AND at 8x with the rate divided by 8
   (mod 80 instead of mod 10 — same absolute sample size s). Claim:
   fixed-rate grows superlinearly in the truth join (expected, and
   why production drops the rate as N grows); fixed-SIZE is flat —
   the audit cost is a budget constant, not a corpus fraction.

Protocol: scripts/scale_probe_r5/6/7.py — 8 exact copies with shifted
ids, unchanged tables symlinked, min-of-3, noop sink.
"""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session
from scale_probe_r7 import BASE, make_dir, run, timeit


def fixed_size_audit(spark, sf_dir, mod):
    """The registered audit with the sample gate re-parameterized —
    the budget knob a production run turns as N grows."""
    from flume_source_spark.pipeline.audit import (
        AUDIT_SAMPLE_KEEP,
        _md5int,
        lsh_audit_counts,
    )
    from flume_source_spark.pipeline.dedup import spread
    from flume_source_spark.tables import load_tables

    d = spread(load_tables(spark, sf_dir)["documents"])
    sample = d.where(
        (_md5int(F.col("doc_id").cast("string")) % mod) < AUDIT_SAMPLE_KEEP
    ).select("doc_id", "text")
    return lsh_audit_counts(sample)


def main():
    spark = get_session(app_name="scale_probe_r7e")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_emb = make_dir(spark, {"embeddings": {"vec_id": 100_000_000}})
    try:
        out["ann_audit_1x"] = run(specs, spark, "sim_ann_recall_audit", BASE)
        out["ann_audit_8x"] = run(specs, spark, "sim_ann_recall_audit", d_emb)
        out["ann_audit_ratio"] = round(out["ann_audit_8x"] / out["ann_audit_1x"], 2)
    finally:
        shutil.rmtree(d_emb, ignore_errors=True)

    d_docs = make_dir(spark, {"documents": {"doc_id": 100_000_000}})
    try:
        out["lsh_audit_1x"] = run(specs, spark, "dedup_lsh_recall_audit", BASE)
        out["lsh_audit_8x_fixed_rate"] = run(
            specs, spark, "dedup_lsh_recall_audit", d_docs
        )
        out["lsh_audit_8x_fixed_size"] = timeit(
            lambda: fixed_size_audit(spark, d_docs, 80)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        out["lsh_fixed_rate_ratio"] = round(
            out["lsh_audit_8x_fixed_rate"] / out["lsh_audit_1x"], 2
        )
        out["lsh_fixed_size_ratio"] = round(
            out["lsh_audit_8x_fixed_size"] / out["lsh_audit_1x"], 2
        )
    finally:
        shutil.rmtree(d_docs, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
