"""Round-9 session-3 SCALE.md measurements: solo + 8x probes for the
six new queries (protocol of scale_probe_r5..r9b: 8 exact copies with
shifted ids, unchanged tables symlinked, min-of-3, noop sink, run
SOLO on an idle host).

1. dq_cohens_kappa / dq_gini_impurity at 1x/8x documents (doc_id
   shifted, source/lang/n_chars UNCHANGED) — both are single
   map-side-combinable folds onto per-source counters; claim LINEAR
   in the scan with a fixture-sized reduce.
2. ts_spearman_corr / ts_theil_sen at 1x/8x events (event_id +
   user_id shifted, ts/event_type UNCHANGED) — 8x rows collapse onto
   the SAME (event_type, day) keys, so the ranked/pair stages run on
   an unchanged daily frame; claim FLAT after the scan.
3. graph_local_clustering / graph_bfs_layers at 1x/8x embeddings
   (vec_id shifted, vectors UNCHANGED) — every copy is
   cosine-identical to every copy: edges grow 64x, triangles ~512x,
   so these are the declared OUTPUT-BOUND adversarial shapes (the
   graph_two_hop_reach / geo_grid_join caveat class). Recorded to
   document the envelope; real corpora do not replicate vectors
   verbatim 8x.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session
from scale_probe_r7 import BASE, make_dir, run


def main():
    spark = get_session(app_name="scale_probe_r9c")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_doc = make_dir(spark, {"documents": {"doc_id": 100_000_000}})
    d_ev = make_dir(
        spark, {"events": {"event_id": 1_000_000_000, "user_id": 10_000_000}}
    )
    d_emb = make_dir(spark, {"embeddings": {"vec_id": 100_000_000}})

    for name, rep_dir in [
        ("dq_cohens_kappa", d_doc),
        ("dq_gini_impurity", d_doc),
        ("ts_spearman_corr", d_ev),
        ("ts_theil_sen", d_ev),
        ("graph_local_clustering", d_emb),
        ("graph_bfs_layers", d_emb),
    ]:
        t1 = run(specs, spark, name, BASE)
        t8 = run(specs, spark, name, rep_dir)
        out[name] = {"t1": t1, "t8": t8, "ratio": round(t8 / t1, 2)}
        print(name, out[name], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
