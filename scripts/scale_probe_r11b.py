"""Round-11 batch-2 SCALE.md measurements: solo + 8x probes for the
remaining round-11 registrations (none is a HEADLINE candidate — the
probes complete the record so every new op ships scaling evidence).

1. ts_kendall_tau at 1x/8x events (event_id shifted, ts/types
   UNCHANGED — 8x rows collapse into the SAME calendar-bounded daily
   series, so the exact day-pair join must stay FLAT).
2. graph_ktruss_peel at 1x/8x embeddings (vec_id shifted, vectors
   UNCHANGED — cosine-identical copies fatten every wedge, the
   graph_kcore / triangle-census adversarial replication shape; the
   wedge join runs per round on a shrinking edge set).
3. text_vocab_growth at 1x/8x documents (doc_id shifted, TEXT
   UNCHANGED — 8x token volume into the same type space; the
   min-per-type aggregate is map-side combinable, expected
   near-linear).

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
    spark = get_session(app_name="scale_probe_r11b")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_ev = d_emb = d_docs = None
    try:
        d_ev = make_dir(spark, {"events": {"event_id": 100_000_000}})
        q = "ts_kendall_tau"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_ev)
        shutil.rmtree(d_ev, ignore_errors=True)
        d_ev = None

        d_emb = make_dir(spark, {"embeddings": {"vec_id": 10_000_000}})
        q = "graph_ktruss_peel"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_emb)
        shutil.rmtree(d_emb, ignore_errors=True)
        d_emb = None

        d_docs = make_dir(spark, {"documents": {"doc_id": 10_000_000}})
        q = "text_vocab_growth"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_docs)
    finally:
        for d in (d_ev, d_emb, d_docs):
            if d:
                shutil.rmtree(d, ignore_errors=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
