"""Round-12 batch 2: solo + 8x records for the session-2
registrations (the r11b precedent: every registration ships a
measured 1x/8x record even when its cost class is already
HEADLINE-represented).

- ts_km_greenwood at 1x/8x events (event_id shifted, user_id/ts
  unchanged) — the survival-fold class (ts_logrank benches it).
- text_good_turing at 1x/8x documents (doc_id shifted, TEXT
  UNCHANGED — 8x trigram tokens funnel into the SAME type space, so
  the count-of-counts table is fixed and the map-side combine must
  absorb the growth; the text_vocab_topk explode+agg class).

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
    spark = get_session(app_name="scale_probe_r12b")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_ev = d_docs = None
    try:
        d_ev = make_dir(spark, {"events": {"event_id": 100_000_000}})
        q = "ts_km_greenwood"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_ev)
        shutil.rmtree(d_ev, ignore_errors=True)
        d_ev = None

        d_docs = make_dir(spark, {"documents": {"doc_id": 10_000_000}})
        q = "text_good_turing"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_docs)
    finally:
        for d in (d_ev, d_docs):
            if d:
                shutil.rmtree(d, ignore_errors=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
