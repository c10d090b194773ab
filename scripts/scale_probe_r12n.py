"""Round-12 batch 14: solo + 8x record for ts_pacf_durbin_levinson.

- events 8x (event_id shifted, ts/value UNCHANGED): rows funnel into
  the SAME hourly cells; the shared ACF fold and the unrolled
  recursion run on the calendar-bounded series (the ts_ljung_box
  class).

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
    spark = get_session(app_name="scale_probe_r12n")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}
    run(specs, spark, "q01_pricing_summary", BASE)  # warm
    d_ev = None
    try:
        d_ev = make_dir(spark, {"events": {"event_id": 100_000_000}})
        q = "ts_pacf_durbin_levinson"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_ev)
    finally:
        if d_ev:
            shutil.rmtree(d_ev, ignore_errors=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
