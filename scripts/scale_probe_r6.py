"""Round-6 SCALE.md measurements: 8x-replication scaling for the
operators round 6 added or re-shaped — the graph_kcore peel PROFILE
(fixed 6 rounds, was fixpoint-peel) and the emb_quantize_pq_exact
integer-lattice twin. Same protocol as scripts/scale_probe_r5.py:
8 exact copies with shifted ids, unchanged tables symlinked,
min-of-N timings."""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session
from flume_source_spark.tables import TABLE_NAMES

BASE = "/root/testdata/sf0.1"
REP = 8


def replicate(spark, out_dir, table, id_shifts):
    df = spark.read.parquet(f"{BASE}/{table}.parquet")
    parts = []
    for i in range(REP):
        d = df
        for col, off in id_shifts.items():
            d = d.withColumn(col, F.col(col) + F.lit(i * off))
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")


def make_dir(spark, replicated: dict):
    d = tempfile.mkdtemp(prefix="sf0.1x8-")
    for t in TABLE_NAMES:
        if t in replicated:
            replicate(spark, d, t, replicated[t])
        else:
            os.symlink(f"{BASE}/{t}.parquet", f"{d}/{t}.parquet")
    return d


def timeit(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 2)


def run(specs, spark, name, sf_dir):
    return timeit(
        lambda: specs[name].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
    )


def main():
    spark = get_session(app_name="scale_probe_r6")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    # embeddings 8x (labels unchanged -> blocks 8x bigger, the
    # adversarial shape for the label-blocked pair join both
    # operators' edge/assignment stages ride on)
    d_emb = make_dir(spark, {"embeddings": {"vec_id": 10_000_000}})

    # 1. kcore peel profile: fixed 6 rounds (was fixpoint), two
    #    shuffles + two scalar aggs per round on a shrinking edge set
    out["graph_kcore_profile_1x"] = run(specs, spark, "graph_kcore", BASE)
    out["graph_kcore_profile_8x"] = run(specs, spark, "graph_kcore", d_emb)

    # 2. integer-lattice PQ twin: posexplode(64x) + broadcast(16) ->
    #    one map-side-combinable (vec_id, sub, k) partial agg
    out["emb_quantize_pq_exact_1x"] = run(specs, spark, "emb_quantize_pq_exact", BASE)
    out["emb_quantize_pq_exact_8x"] = run(specs, spark, "emb_quantize_pq_exact", d_emb)

    shutil.rmtree(d_emb, ignore_errors=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
