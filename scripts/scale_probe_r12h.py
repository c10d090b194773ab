"""Round-12 batch 8: solo + 8x records for the gains/lift and HITS
registrations.

- dq_lift_gain_deciles at 1x/8x documents (doc_id shifted, n_chars/
  lang UNCHANGED): the decile assignment is the round-11 global-order
  plan (boundary pass + bucketed rank) — the equidepth-histogram cost
  class; everything after it is a 10-row frame.
- graph_hits_exact at 1x/8x lineitem (l_orderkey shifted, custkey/
  suppkey residues UNCHANGED): 8x fact rows funnel into the SAME
  <= 10^4 distinct rollup edges; the 3 HITS rounds run on the
  checkpointed broadcast-sized rollup — the pagerank_exact class.

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
    spark = get_session(app_name="scale_probe_r12h")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_doc = d_li = None
    try:
        d_doc = make_dir(spark, {"documents": {"doc_id": 10_000_000}})
        q = "dq_lift_gain_deciles"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_doc)

        d_li = make_dir(spark, {"lineitem": {"l_orderkey": 100_000_000}})
        q = "graph_hits_exact"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_li)
    finally:
        for d in (d_doc, d_li):
            if d:
                shutil.rmtree(d, ignore_errors=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
