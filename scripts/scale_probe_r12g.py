"""Round-12 batch 7: solo + 8x records for the bipartite-projection
and Kneser-Ney registrations.

- graph_bipartite_copurchase at 1x/8x lineitem (l_orderkey shifted,
  partkeys UNCHANGED): 8 copies of every order are 8 DISTINCT capped
  baskets emitting pairs into the SAME (p1, p2) key space — the
  map-side pair-count combine is the claim under test (per-order
  fan-out is bounded by the basket cap regardless of row growth).
- text_kneser_ney_bigram at 1x/8x documents (doc_id shifted, text
  UNCHANGED): bigram/context/continuation counts multiply by 8 but
  every count table's KEY space is the fixed vocabulary — the
  count-funnel claim; everything after the counts is top-30-sized.

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
    spark = get_session(app_name="scale_probe_r12g")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_li = d_doc = None
    try:
        d_li = make_dir(spark, {"lineitem": {"l_orderkey": 100_000_000}})
        q = "graph_bipartite_copurchase"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_li)

        d_doc = make_dir(spark, {"documents": {"doc_id": 10_000_000}})
        q = "text_kneser_ney_bigram"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_doc)
    finally:
        for d in (d_li, d_doc):
            if d:
                shutil.rmtree(d, ignore_errors=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
