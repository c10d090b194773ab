"""Round-8 SCALE.md measurements: the two re-shaped operators' scale
claims, measured (VERDICT r7 items 3-4 acceptance criteria).

1. sim_knn_graph at 1x/8x embeddings (vec_id shifted, vectors
   UNCHANGED — copies land in the SAME IVF cells, so cell size grows
   8x: the exact shape the round-7 label-block probe failed at 7.8x
   wall / 64x pair work). With the capped sub-split, pair work is
   <= N*cap — LINEAR — so the claim is <= ~2x wall.
2. dedup_lsh_recall_audit at 1x/8x documents under the new DEFAULT
   fixed-SIZE budget gate (modulus self-scales 8x, absolute sample
   size constant): claim ~flat (SCALE.md part 5 measured the old
   fixed-RATE default at 1.66x, the budget mode at 0.71x — the
   budget mode is now the registered query).
3. geo_grid_join at 1x/8x customers at the new 500 cd registered
   radius: the density^2-adversarial shape (8x points in a FIXED
   lattice area — same caveat as graph_modularity_exact's row), for
   the record rather than a linearity claim.

Protocol: scripts/scale_probe_r5/6/7.py — 8 exact copies with shifted
ids, unchanged tables symlinked, min-of-3, noop sink, SOLO on an idle
host (the r6/r7 contention lesson).
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
    spark = get_session(app_name="scale_probe_r8")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_emb = d_docs = d_cust = None
    try:
        d_emb = make_dir(spark, {"embeddings": {"vec_id": 10_000_000}})
        out["sim_knn_graph_1x"] = run(specs, spark, "sim_knn_graph", BASE)
        out["sim_knn_graph_8x"] = run(specs, spark, "sim_knn_graph", d_emb)

        d_docs = make_dir(spark, {"documents": {"doc_id": 10_000_000}})
        out["dedup_lsh_recall_audit_1x"] = run(
            specs, spark, "dedup_lsh_recall_audit", BASE
        )
        out["dedup_lsh_recall_audit_8x"] = run(
            specs, spark, "dedup_lsh_recall_audit", d_docs
        )

        d_cust = make_dir(spark, {"customer": {"c_custkey": 100_000_000}})
        out["geo_grid_join_1x"] = run(specs, spark, "geo_grid_join", BASE)
        out["geo_grid_join_8x"] = run(specs, spark, "geo_grid_join", d_cust)
    finally:
        for d in (d_emb, d_docs, d_cust):
            if d:
                shutil.rmtree(d, ignore_errors=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
