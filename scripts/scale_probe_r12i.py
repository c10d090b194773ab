"""Round-12 batch 9: solo + 8x record for ts_seasonal_strength.

- events 8x (event_id shifted, ts/event_type UNCHANGED): 8x rows
  funnel into the SAME (event_type, day) cells — the calendar-bounded
  collapse; the decompose windows and the strength fold run on the
  collapsed frame.

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
    spark = get_session(app_name="scale_probe_r12i")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}
    run(specs, spark, "q01_pricing_summary", BASE)  # warm
    d_ev = None
    try:
        d_ev = make_dir(spark, {"events": {"event_id": 100_000_000}})
        q = "ts_seasonal_strength"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_ev)
    finally:
        if d_ev:
            shutil.rmtree(d_ev, ignore_errors=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
