"""Round-12 batch 4: solo + 8x record for emb_prefix_recall_curve
(the session-3 registration; protocol precedent: every round-12
registration ships a measured 1x/8x record).

embeddings 8x with shifted vec_ids: the query set stays HARD-BOUNDED
at Q_MAX = 64 (shifted copies fail the vec_id < QUERY_MOD*Q_MAX
filter), so the probe grows only the scored side of the one Q*N
cosine pass -- fanned x4 by the literal prefix explode, then
per-(P, qid) rank windows over per-query-sized groups. Everything
after the rank is the checkpointed <= 4*Q_MAX*K top-k table, so the
hit join and the recall arithmetic are corpus-independent.

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
    spark = get_session(app_name="scale_probe_r12d")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_emb = None
    try:
        d_emb = make_dir(spark, {"embeddings": {"vec_id": 10_000_000}})
        q = "emb_prefix_recall_curve"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_emb)
    finally:
        if d_emb:
            shutil.rmtree(d_emb, ignore_errors=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
