"""Round-9 session-3 SCALE.md measurements, part 2: solo + 8x probes
for the batch-2 queries (protocol of scale_probe_r5..r9c).

1. emb_cosine_hist at 1x/8x embeddings (vec_id shifted, vectors
   UNCHANGED) — the md5 budget gate's modulus self-scales with N, so
   the sampled side stays ~96 vectors and the pair join ~4.6k pairs
   at ANY corpus size; claim FLAT after the gate scan (the
   dedup_lsh_recall_audit budget discipline).
2. ds_shard_skew_audit at 1x/8x documents (doc_id shifted) — one
   map-side-combinable groupBy onto K=32 keys + a broadcast 1-row
   total; claim LINEAR in the scan.
3. graph_cc_size_hist under the same doc replication — inherits
   dedup_cluster_cc's EXACT shingle self-join (the declared
   oracle path): doc_id-shifted copies keep identical text, so
   shingle postings grow 8x and candidate pairs ~64x — the
   output-bound adversarial caveat class. The histogram rollup
   itself is one groupBy over components; at scale it runs over the
   banded+capped dedup_cluster_cc_lsh closure instead (docstring).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session
from scale_probe_r7 import BASE, make_dir, run


def main():
    spark = get_session(app_name="scale_probe_r9d")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_doc = make_dir(spark, {"documents": {"doc_id": 100_000_000}})
    d_emb = make_dir(spark, {"embeddings": {"vec_id": 100_000_000}})

    for name, rep_dir in [
        ("emb_cosine_hist", d_emb),
        ("ds_shard_skew_audit", d_doc),
        ("graph_cc_size_hist", d_doc),
    ]:
        t1 = run(specs, spark, name, BASE)
        t8 = run(specs, spark, name, rep_dir)
        out[name] = {"t1": t1, "t8": t8, "ratio": round(t8 / t1, 2)}
        print(name, out[name], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
