"""Round-9 SCALE.md measurements: 8x-replication probes for the
round-9 bench admissions (the solo + 8x protocol, VERDICT r7 item 8 /
r8 item 6).

1. sim_knn_descent_round at 1x/8x embeddings (vec_id shifted, vectors
   UNCHANGED — copies land in the same IVF cells, the capped-block
   adversarial shape): descent is O(N*k^2) equi-joins over the
   registered graph — claim LINEAR-ish wall.
2. sim_knn_refined_recall_audit at 1x/8x embeddings: two bounded
   views + one descent round + a budget-gated exact side (~150
   sampled nodes x N dots — modulus self-scales) — claim linear-ish.
3. mg_shard_summaries_exact at 1x/8x events (event_id shifted,
   user_id UNCHANGED — same 4 shards, 8x items per shard: the
   adversarial shape for a sequential per-shard python kernel; at
   production the shard count scales with executors, here it pins
   the per-shard fold cost).
4. text_novelty_curve at 1x/8x documents (doc_id shifted, TEXT
   UNCHANGED — every shingle's posting list grows 8x, the worst case
   for the first-occurrence join).
5. ts_mann_kendall at 1x/8x events (same day range — daily collapse
   absorbs the growth map-side; the day-pair join is calendar-bounded
   and must NOT grow).

Protocol: scripts/scale_probe_r5..r8 — 8 exact copies with shifted
ids, unchanged tables symlinked, min-of-3, noop sink, SOLO on an idle
host.
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
    spark = get_session(app_name="scale_probe_r9")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_emb = d_ev = d_docs = None
    try:
        d_emb = make_dir(spark, {"embeddings": {"vec_id": 10_000_000}})
        for q in ("sim_knn_descent_round", "sim_knn_refined_recall_audit"):
            out[f"{q}_1x"] = run(specs, spark, q, BASE)
            out[f"{q}_8x"] = run(specs, spark, q, d_emb)

        d_ev = make_dir(spark, {"events": {"event_id": 100_000_000}})
        for q in ("mg_shard_summaries_exact", "ts_mann_kendall"):
            out[f"{q}_1x"] = run(specs, spark, q, BASE)
            out[f"{q}_8x"] = run(specs, spark, q, d_ev)

        d_docs = make_dir(spark, {"documents": {"doc_id": 10_000_000}})
        out["text_novelty_curve_1x"] = run(specs, spark, "text_novelty_curve", BASE)
        out["text_novelty_curve_8x"] = run(specs, spark, "text_novelty_curve", d_docs)
    finally:
        for d in (d_emb, d_ev, d_docs):
            if d:
                shutil.rmtree(d, ignore_errors=True)

    for q in (
        "sim_knn_descent_round",
        "sim_knn_refined_recall_audit",
        "mg_shard_summaries_exact",
        "ts_mann_kendall",
        "text_novelty_curve",
    ):
        a, b = out[f"{q}_1x"], out[f"{q}_8x"]
        out[f"{q}_ratio"] = round(b / a, 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
