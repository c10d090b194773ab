"""Round-12 batch 13: solo + 8x record for ds_balanced_undersample.

- documents 8x (doc_id shifted, lang UNCHANGED): 8x rows per class,
  same class count. The claim under test is the global-order re-shape:
  one boundary pass + bucketed rank (the agg_equidepth class), never
  a per-lang single-partition funnel - wall should track the
  equidepth pipeline, not a per-class sort.

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
    spark = get_session(app_name="scale_probe_r12m")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}
    run(specs, spark, "q01_pricing_summary", BASE)  # warm
    d_doc = None
    try:
        d_doc = make_dir(spark, {"documents": {"doc_id": 10_000_000}})
        q = "ds_balanced_undersample"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_doc)
    finally:
        if d_doc:
            shutil.rmtree(d_doc, ignore_errors=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
