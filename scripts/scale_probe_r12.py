"""Round-12 SCALE.md measurements (the VERDICT r7 item 8 protocol:
solo + 8x probes before any HEADLINE decision).

1. global_order boundary-sketch accuracy sweep (VERDICT r11 item 4):
   exactness is provably independent of boundary quality
   (global_order.py module doc), so the percentile_approx accuracy
   only buys bucket BALANCE. Measure agg_equidepth_histogram at
   1x/8x lineitem with accuracy in {100, 1000, 10000}, assert the
   published histogram is IDENTICAL across accuracies, and ship the
   cheapest. (Round 12 also moved the boundary collect driver-side —
   one tiny job — so the sweep measures the new plan.)
2. ts_nelson_aalen at 1x/8x events (event_id shifted, user_id/ts
   unchanged — 8x rows funnel into the same per-user lag windows and
   the same calendar-bounded life table; the survival fold's class,
   already HEADLINE-represented by ts_logrank).
3. ts_curation_ab_report at 1x/8x events — the composed report: one
   logrank fold + two per-arm KM kernels + two RMST folds in one
   plan.
4. multimodal_phash_recall_audit at 1x/8x documents (doc_id shifted,
   TEXT UNCHANGED — the audit's sample modulus self-scales with N, so
   the probe checks the budget gate keeps the audit flat; the
   dedup_lsh_recall_audit class, already HEADLINE-represented).

Protocol: 8 exact copies with shifted ids, unchanged tables
symlinked, min-of-3, noop sink, SOLO on an idle host.
"""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import flume_source_spark.global_order as go
from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session
from scale_probe_r7 import BASE, make_dir, run


def main():
    spark = get_session(app_name="scale_probe_r12")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_li = d_ev = d_docs = None
    try:
        d_li = make_dir(spark, {"lineitem": {"l_orderkey": 100_000_000}})
        q = "agg_equidepth_histogram"
        ref_rows = None
        for acc in (100, 1000, 10000):
            go._BOUNDARY_ACCURACY = acc
            rows = sorted(
                tuple(r) for r in specs[q].builder(spark, BASE).collect()
            )
            if ref_rows is None:
                ref_rows = rows
            assert rows == ref_rows, f"accuracy {acc} changed the histogram"
            out[f"{q}_acc{acc}_1x"] = run(specs, spark, q, BASE)
            out[f"{q}_acc{acc}_8x"] = run(specs, spark, q, d_li)
        go._BOUNDARY_ACCURACY = 1000
        shutil.rmtree(d_li, ignore_errors=True)
        d_li = None

        d_ev = make_dir(spark, {"events": {"event_id": 100_000_000}})
        for q in ("ts_nelson_aalen", "ts_curation_ab_report"):
            out[f"{q}_1x"] = run(specs, spark, q, BASE)
            out[f"{q}_8x"] = run(specs, spark, q, d_ev)
        shutil.rmtree(d_ev, ignore_errors=True)
        d_ev = None

        d_docs = make_dir(spark, {"documents": {"doc_id": 10_000_000}})
        q = "multimodal_phash_recall_audit"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_docs)
    finally:
        for d in (d_li, d_ev, d_docs):
            if d:
                shutil.rmtree(d, ignore_errors=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
