"""Round-9 session-3 SCALE.md measurements, part 4: solo + 8x probes
for the batch-5 changes (protocol of scale_probe_r5..r9e).

1. graph_common_neighbors (re-shaped onto the 0.2 analysis radius) at
   1x/8x embeddings (vec_id shifted, vectors UNCHANGED) — the wedge
   join over cosine-identical copies is the declared OUTPUT-BOUND
   adversarial shape (edges 64x, wedges ~512x; the triangle-census /
   two_hop / graph6 caveat class). Recorded to document the envelope.
2. text_compression_ratio at 1x/8x documents (doc_id shifted) — one
   Arrow-batched zlib kernel pass over the corpus + a per-source
   fold; claim LINEAR in the scan (CPU-bound, embarrassingly
   parallel).
3. geo_nearest_neighbor (re-registered at 500 cd) at 1x/8x customers
   (c_custkey shifted -> NEW lattice points in the SAME fixed area):
   density grows 8x so candidate pairs grow ~64x — the geo_grid_join
   density^2 caveat class (output-bound under fixed-area replication;
   real corpora grow area with N). Recorded to document the envelope.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session
from scale_probe_r7 import BASE, make_dir, run


def main():
    spark = get_session(app_name="scale_probe_r9f")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_doc = make_dir(spark, {"documents": {"doc_id": 100_000_000}})
    d_emb = make_dir(spark, {"embeddings": {"vec_id": 100_000_000}})
    d_cust = make_dir(spark, {"customer": {"c_custkey": 100_000_000}})

    for name, rep_dir in [
        ("graph_common_neighbors", d_emb),
        ("text_compression_ratio", d_doc),
        ("geo_nearest_neighbor", d_cust),
    ]:
        t1 = run(specs, spark, name, BASE)
        t8 = run(specs, spark, name, rep_dir)
        out[name] = {"t1": t1, "t8": t8, "ratio": round(t8 / t1, 2)}
        print(name, out[name], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
