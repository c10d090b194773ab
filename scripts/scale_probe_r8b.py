"""Round-8 SCALE.md measurement, part 2: the k-NN quality ladder's
wall-clock at 1x/8x embeddings (vec_id shifted, vectors unchanged —
copies land in the same cells AND the same random hash blocks, the
adversarial replication). Claims under test: knn_graph_auto inherits
the capped-block linearity (the registered twin measured 1.5x), and
knn_graph_refined's two-view + hub-capped descent round stays
near-linear — deduped edges + the reverse cap bound the candidate
self-join at N*(f+k)^2 regardless of degree skew (f = forward edges
per node; 2k for the two-view union => <= 9*N*k^2), so 8x corpus =>
~8x bounded work on 32 cores => low single-digit wall ratio.

Protocol: scripts/scale_probe_r5..r8 — min-of-3, noop sink, solo.
"""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flume_source_spark.pipeline.similarity import _dvec
from flume_source_spark.pipeline.similarity3 import knn_graph_auto, knn_graph_refined
from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session
from flume_source_spark.tables import load_tables
from scale_probe_r7 import BASE, make_dir, run, timeit


def main():
    spark = get_session(app_name="scale_probe_r8b")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_emb = None
    try:
        d_emb = make_dir(spark, {"embeddings": {"vec_id": 10_000_000}})

        def probe(fn, sf_dir):
            e = load_tables(spark, sf_dir)["embeddings"].select(
                "vec_id", _dvec("embedding").alias("v0")
            )
            return timeit(
                lambda: fn(spark, e)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )

        out["knn_graph_auto_1x"] = probe(knn_graph_auto, BASE)
        out["knn_graph_auto_8x"] = probe(knn_graph_auto, d_emb)
        out["knn_graph_refined_1x"] = probe(knn_graph_refined, BASE)
        out["knn_graph_refined_8x"] = probe(knn_graph_refined, d_emb)
    finally:
        if d_emb:
            shutil.rmtree(d_emb, ignore_errors=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
