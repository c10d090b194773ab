"""Round-7 SCALE.md measurements, part 7: the session-7 additions.

1. dq_roc_auc_exact at 1x/8x documents (doc_id shifted, text/lang/
   n_chars UNCHANGED): the (source, score) key space is fixed, so 8x
   rows must collapse map-side into the same distinct-score groups
   before the window — claim ~flat.
2. agg_count_min_exact at 1x/8x lineitem (orderkey shifted, suppkeys
   UNCHANGED): the D×W cell space and the probe key space are fixed —
   the sketch claim is that growth is absorbed entirely by the partial
   agg; claim ~flat.
3. dedup_soft_weights at 1x/8x documents: the LSH→CC machinery under
   8x duplicate mass (every text now has 8 copies) — pair work grows
   within capped buckets, the known dedup_cluster_cc_lsh shape.
4. geo_point_in_polygon at 1x/8x customers: a pure unrolled projection
   (zero shuffles) — claim linear scan cost, i.e. ~flat at this size.
5. graph_modularity_exact at 1x/8x customers: grid-pair term grows
   with within-cell density (the geo_grid_join shape) plus two
   membership joins and O(1)-width aggregates.

Protocol: scripts/scale_probe_r5/6/7.py — 8 exact copies with shifted
ids, unchanged tables symlinked, min-of-3, noop sink.
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
    spark = get_session(app_name="scale_probe_r7g")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_docs = d_li = d_cust = None
    try:
        d_docs = make_dir(spark, {"documents": {"doc_id": 100_000_000}})
        out["dq_roc_auc_exact_1x"] = run(specs, spark, "dq_roc_auc_exact", BASE)
        out["dq_roc_auc_exact_8x"] = run(specs, spark, "dq_roc_auc_exact", d_docs)
        out["dedup_soft_weights_1x"] = run(specs, spark, "dedup_soft_weights", BASE)
        out["dedup_soft_weights_8x"] = run(specs, spark, "dedup_soft_weights", d_docs)

        d_li = make_dir(spark, {"lineitem": {"l_orderkey": 100_000_000}})
        out["agg_count_min_exact_1x"] = run(specs, spark, "agg_count_min_exact", BASE)
        out["agg_count_min_exact_8x"] = run(specs, spark, "agg_count_min_exact", d_li)

        d_cust = make_dir(spark, {"customer": {"c_custkey": 100_000_000}})
        out["geo_point_in_polygon_1x"] = run(specs, spark, "geo_point_in_polygon", BASE)
        out["geo_point_in_polygon_8x"] = run(specs, spark, "geo_point_in_polygon", d_cust)
        out["graph_modularity_exact_1x"] = run(specs, spark, "graph_modularity_exact", BASE)
        out["graph_modularity_exact_8x"] = run(specs, spark, "graph_modularity_exact", d_cust)
    finally:
        for d in (d_docs, d_li, d_cust):
            if d:
                shutil.rmtree(d, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
