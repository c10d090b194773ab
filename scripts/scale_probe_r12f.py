"""Round-12 batch 6: solo + 8x records for the winnowing /
link-prediction / Brier registrations (protocol: every round-12
registration ships a measured 1x/8x record).

- text_winnowing_profile at 1x/8x documents (doc_id shifted, text
  UNCHANGED): the winnow window is per-document (bounded frames), so
  8x docs should scale ~linearly in the exchange + window pass.
- text_winnowing_dup_pairs, same replica: the ADVERSARIAL shape —
  text-identical copies multiply every posting width by 8, so the
  WINNOW_MAX_POSTING stop-gram cap is the claim under test (pair
  fan-out stays bounded; hashes pushed past the cap drop out).
- graph_resource_allocation at 1x/8x embeddings (vec_id shifted,
  labels UNCHANGED): cosine-identical replicas multiply degrees by 8
  and wedge output by up to 64x — the documented graph-family
  adversarial class (graph_common_neighbors precedent; measured,
  not admitted).
- dq_brier_decomposition at 1x/8x documents: 8x rows funnel into the
  SAME <= 1001-cell forecast support — the map-side-combine claim.

Protocol: 8 exact copies with shifted ids, unchanged tables
symlinked, min-of-3, noop sink, SOLO on an idle host.
"""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session
from scale_probe_r7 import BASE, make_dir, run


def main():
    spark = get_session(app_name="scale_probe_r12f")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_doc = d_emb = None
    try:
        d_doc = make_dir(spark, {"documents": {"doc_id": 10_000_000}})
        for q in (
            "text_winnowing_profile",
            "text_winnowing_dup_pairs",
            "dq_brier_decomposition",
        ):
            out[f"{q}_1x"] = run(specs, spark, q, BASE)
            out[f"{q}_8x"] = run(specs, spark, q, d_doc)

        d_emb = make_dir(spark, {"embeddings": {"vec_id": 10_000_000}})
        q = "graph_resource_allocation"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_emb)

        # events 8x (event_id shifted, ts UNCHANGED): 8x rows funnel
        # into the SAME hourly cells — the calendar-bounded collapse
        # claim; everything after it is O(hours) work
        d_ev = make_dir(spark, {"events": {"event_id": 100_000_000}})
        q = "ts_hurst_rs"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_ev)
        shutil.rmtree(d_ev, ignore_errors=True)
    finally:
        for d in (d_doc, d_emb):
            if d:
                shutil.rmtree(d, ignore_errors=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
