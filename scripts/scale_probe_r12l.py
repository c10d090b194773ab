"""Round-12 batch 12: solo + 8x record for geo_knn_join.

- customer 8x (c_custkey shifted): shifted keys scatter to NEW
  coordinates in the SAME fixed-area patch, so point density — and
  with it the in-radius pair count — grows ~quadratically (the
  fixed-territory densification shape; real 8x growth also expands
  territory). Measures the blocking join + per-point rank under
  densification; the candidate generation stays a hash equi-join
  either way.

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
    spark = get_session(app_name="scale_probe_r12l")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}
    run(specs, spark, "q01_pricing_summary", BASE)  # warm
    d_c = None
    try:
        d_c = make_dir(spark, {"customer": {"c_custkey": 10_000_000}})
        q = "geo_knn_join"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_c)
    finally:
        if d_c:
            shutil.rmtree(d_c, ignore_errors=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
