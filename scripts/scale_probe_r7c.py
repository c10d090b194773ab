"""Round-7 SCALE.md measurements, part 3: the session-4 additions.

1. ds_domain_mix_rebalance at 1x and 8x documents (doc_ids shifted,
   lang column unchanged — per-language counts grow 8x, the language
   key space stays 5). Claim: linear in the corpus scan; the count
   aggregate is map-side-combinable onto #langs keys, the rate table
   is a #langs-row broadcast, and the keep-gate is a codegen scan
   filter — no term grows faster than the input.
2. text_cooccurrence_pmi at 1x and 8x documents (TEXT UNCHANGED — the
   vocabulary and per-doc pair fan-out stay fixed while doc count and
   document frequencies grow 8x, the shape the top-V bound promises
   to absorb). Claim: ~linear; the pair stage is a map-side array
   expansion off one doc_id exchange (8x doc-set rows, NOT a
   self-join) and the pair agg key space is capped at C(V,2), so the
   partial agg absorbs growth map-side.

Protocol: scripts/scale_probe_r5/6/7.py — 8 exact copies with shifted
ids, unchanged tables symlinked, min-of-3, noop sink.
"""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session
from scale_probe_r7 import BASE, make_dir, run


def main():
    spark = get_session(app_name="scale_probe_r7c")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_docs = make_dir(spark, {"documents": {"doc_id": 100_000_000}})
    try:
        for name in ("ds_domain_mix_rebalance", "text_cooccurrence_pmi"):
            out[f"{name}_1x"] = run(specs, spark, name, BASE)
            out[f"{name}_8x"] = run(specs, spark, name, d_docs)
            out[f"{name}_ratio"] = round(
                out[f"{name}_8x"] / out[f"{name}_1x"], 2
            )
    finally:
        shutil.rmtree(d_docs, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
