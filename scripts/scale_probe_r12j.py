"""Round-12 batch 10: solo + 8x records for the CDC / MATTR /
Mann-Whitney registrations.

- dedup_cdc_chunks at 1x/8x documents (doc_id shifted, text
  UNCHANGED): per-doc cut windows scale with the doc exchange; the
  chunk groupBy collapses map-side; text-identical copies multiply
  every fingerprint's multiplicity x8 INSIDE the same bucket cells
  (no self-join to stress - the dup accounting is count vs
  count-distinct in one hash-agg).
- text_mattr_diversity, same replica: per-doc 25-row list windows -
  the substring-span window class; corpus growth adds docs, never
  widens a frame.
- ts_mann_whitney_u at 1x/8x events (event_id shifted, value/type
  UNCHANGED): 8x rows funnel into the SAME cent-value cells; the
  cumulative window runs on the bounded value domain.

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
    spark = get_session(app_name="scale_probe_r12j")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}
    run(specs, spark, "q01_pricing_summary", BASE)  # warm
    d_doc = d_ev = None
    try:
        d_doc = make_dir(spark, {"documents": {"doc_id": 10_000_000}})
        for q in ("dedup_cdc_chunks", "text_mattr_diversity"):
            out[f"{q}_1x"] = run(specs, spark, q, BASE)
            out[f"{q}_8x"] = run(specs, spark, q, d_doc)
        d_ev = make_dir(spark, {"events": {"event_id": 100_000_000}})
        q = "ts_mann_whitney_u"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_ev)
    finally:
        for d in (d_doc, d_ev):
            if d:
                shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
