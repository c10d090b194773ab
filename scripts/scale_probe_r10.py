"""Round-10 SCALE.md measurements: solo + 8x probes for the round-10
bench-admission candidates (the VERDICT r7 item 8 / r8 item 6
protocol — nothing enters HEADLINE without these numbers).

1. ts_hw_backtest_wape at 1x/8x events (event_id shifted, ts/types
   UNCHANGED — the daily collapse absorbs the row growth map-side;
   the HW kernel, the trailing-mean window, and the scoring joins all
   run on the CALENDAR-bounded daily frame and must NOT grow).
2. multimodal_phash_hamming_neardup at 1x/8x documents (doc_id
   shifted, TEXT UNCHANGED — every sketch is replicated 8x, so every
   band bucket grows 8x and identical codes make the candidate
   OUTPUT quadratic in copy count: the dedup_simhash_hamming_join
   adversarial shape. The hot-bucket cap is the lever under test —
   buckets over PHASH_MAX_BUCKET drop out of candidate generation).
3. sim_knn_refined2_recall_audit at 1x/8x embeddings (vec_id shifted,
   vectors UNCHANGED — capped-block adversarial): one more O(N·k²)
   descent round on top of the admitted round-1 audit; probed for
   the record even though admission is NOT planned (its cost class —
   descent equi-joins — is already represented in HEADLINE by
   sim_knn_descent_round and sim_knn_refined_recall_audit).

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
    spark = get_session(app_name="scale_probe_r10")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_ev = d_docs = d_emb = None
    try:
        d_ev = make_dir(spark, {"events": {"event_id": 100_000_000}})
        out["ts_hw_backtest_wape_1x"] = run(specs, spark, "ts_hw_backtest_wape", BASE)
        out["ts_hw_backtest_wape_8x"] = run(specs, spark, "ts_hw_backtest_wape", d_ev)

        d_docs = make_dir(spark, {"documents": {"doc_id": 10_000_000}})
        q = "multimodal_phash_hamming_neardup"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_docs)

        d_emb = make_dir(spark, {"embeddings": {"vec_id": 10_000_000}})
        q = "sim_knn_refined2_recall_audit"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_emb)
    finally:
        for d in (d_ev, d_docs, d_emb):
            if d:
                shutil.rmtree(d, ignore_errors=True)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
