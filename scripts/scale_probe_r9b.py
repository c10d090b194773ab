"""Round-9 session-2 SCALE.md measurements: solo + 8x probes for the
four new bench-admission candidates (protocol of scale_probe_r5..r9:
8 exact copies with shifted ids, unchanged tables symlinked,
min-of-3, noop sink, run SOLO on an idle host).

1. ts_dtw_band at 1x/8x events with user_id AND event_id shifted —
   8x distinct users, identical per-user series shape: the
   adversarial shape for the applyInPandas DP stage. The first
   (per-user-group) draft measured 5.48 s solo / 3.63x here — 1500
   serial sub-ms kernel calls behind AQE's tiny-shuffle coalesce;
   the admitted hash-blocked vectorized kernel re-measured 2.21 s /
   0.72x (more users -> more parallel blocks). SCALE.md part 9b.
2. dq_ks_two_sample_exact at 1x/8x documents (doc_id shifted, text/
   n_chars UNCHANGED) — 8x rows collapse onto the SAME distinct
   (source, n_chars) keys: the grouped frame and both window passes
   must stay fixture-sized — claim FLAT after the scan.
3. dq_chi2_drift_2x2 under the same replication — the ntile window
   is the one per-row pass (sort within source), then a 4-counter
   fold — claim linear-with-sort in rows.
4. graph_two_hop_reach at 1x/8x embeddings (vec_id shifted, vectors
   UNCHANGED) — every copy is cosine-identical to every copy, so
   edges grow 64x and wedges ~512x: the declared output-bound
   adversarial shape (same caveat class as geo_grid_join's fixed-
   area replication and the triangle census). Record the number to
   document it; real corpora do not replicate vectors verbatim 8x.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session
from scale_probe_r7 import BASE, make_dir, run


def main():
    spark = get_session(app_name="scale_probe_r9b")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_ev = make_dir(
        spark, {"events": {"event_id": 1_000_000_000, "user_id": 10_000_000}}
    )
    d_doc = make_dir(spark, {"documents": {"doc_id": 100_000_000}})
    d_emb = make_dir(spark, {"embeddings": {"vec_id": 100_000_000}})

    for name, base_dir, rep_dir in [
        ("ts_dtw_band", BASE, d_ev),
        ("dq_ks_two_sample_exact", BASE, d_doc),
        ("dq_chi2_drift_2x2", BASE, d_doc),
        ("graph_two_hop_reach", BASE, d_emb),
    ]:
        t1 = run(specs, spark, name, base_dir)
        t8 = run(specs, spark, name, rep_dir)
        out[name] = {"t1": t1, "t8": t8, "ratio": round(t8 / t1, 2)}
        print(name, out[name], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
