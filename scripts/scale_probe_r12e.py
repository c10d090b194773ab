"""Round-12 batch 5: solo + 8x records for the session-3 quality/
embedding registrations (protocol: every round-12 registration ships
a measured 1x/8x record).

- emb_isotropy_audit at 1x/8x embeddings (vec_id shifted, labels
  UNCHANGED): the posexplode fans 64*N rows into a (label, dim)
  hash-agg -- 8x rows funnel into the SAME 64*L key space, so the
  map-side combine must absorb the growth; everything after the
  per-dim sums is O(dim) arithmetic.
- dq_mutual_information at 1x/8x documents (doc_id shifted, lang/
  source UNCHANGED): 8x rows funnel into the SAME contingency cells;
  the one (r, c) hash-agg is the whole corpus-facing cost.

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
    spark = get_session(app_name="scale_probe_r12e")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_emb = d_doc = None
    try:
        d_emb = make_dir(spark, {"embeddings": {"vec_id": 10_000_000}})
        q = "emb_isotropy_audit"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_emb)

        d_doc = make_dir(spark, {"documents": {"doc_id": 10_000_000}})
        q = "dq_mutual_information"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_doc)
    finally:
        for d in (d_emb, d_doc):
            if d:
                shutil.rmtree(d, ignore_errors=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
