"""Round-12 batch 11: solo + 8x records for the burstiness and
Ljung-Box registrations.

- text_term_burstiness at 1x/8x documents (doc_id shifted, text
  UNCHANGED): the (doc, term) collapse grows 8x in rows but the
  vocabulary rollup's key space is fixed; everything after is
  top-30-sized.
- ts_ljung_box at 1x/8x events (event_id shifted, ts/value
  UNCHANGED): 8x rows funnel into the SAME hourly cells; lags,
  ratios, and the cumulative Q run on the calendar-bounded series.

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
    spark = get_session(app_name="scale_probe_r12k")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}
    run(specs, spark, "q01_pricing_summary", BASE)  # warm
    d_doc = d_ev = None
    try:
        d_doc = make_dir(spark, {"documents": {"doc_id": 10_000_000}})
        q = "text_term_burstiness"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_doc)
        d_ev = make_dir(spark, {"events": {"event_id": 100_000_000}})
        q = "ts_ljung_box"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_ev)
    finally:
        for d in (d_doc, d_ev):
            if d:
                shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
