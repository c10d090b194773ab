"""Round-6 session-2 SCALE.md measurements: 8x-replication scaling for
the two new operators — skew_salted_join (salt-replicated fact-fact
join; lineitem AND orders both 8x with consistent key shifts so the
join degree per key is unchanged while key cardinality grows 8x) and
sim_ann_ivf_exact (corpus 8x with the query panel held at its bounded
size — the production IVF contract — so candidate lists and rerank
grow 8x while the probe panel stays 256 rows). Same protocol as
scripts/scale_probe_r5.py: 8 exact copies with shifted ids, unchanged
tables symlinked, min-of-3 timings, noop sink."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_probe_r6 import BASE, make_dir, run

from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session


def main():
    spark = get_session(app_name="scale_probe_r6b")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_fact = make_dir(
        spark,
        {
            "lineitem": {"l_orderkey": 100_000_000},
            "orders": {"o_orderkey": 100_000_000},
        },
    )
    out["skew_salted_join_1x"] = run(specs, spark, "skew_salted_join", BASE)
    out["skew_salted_join_8x"] = run(specs, spark, "skew_salted_join", d_fact)

    d_emb = make_dir(spark, {"embeddings": {"vec_id": 10_000_000}})
    out["sim_ann_ivf_exact_1x"] = run(specs, spark, "sim_ann_ivf_exact", BASE)
    out["sim_ann_ivf_exact_8x"] = run(specs, spark, "sim_ann_ivf_exact", d_emb)

    import shutil

    shutil.rmtree(d_fact, ignore_errors=True)
    shutil.rmtree(d_emb, ignore_errors=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
