"""Round-5 SCALE.md measurements: 8x-replication scaling for the new
operators + the MAX_CLUSTER degenerate-corpus bound (VERDICT r4 item 3).
Writes replicated fixture dirs under /tmp, symlinking unchanged tables."""
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
    """8 copies of `table` with id columns shifted per copy (exact
    content copies, the adversarial dedup shape)."""
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
    return timeit(lambda: specs[name].builder(spark, sf_dir).write.format("noop").mode("overwrite").save())

def main():
    spark = get_session(app_name="scale_probe_r5")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    # warm
    run(specs, spark, "q01_pricing_summary", BASE)

    # 1. leakage-safe split: 8x exact doc copies (groups become 8-member)
    d_docs = make_dir(spark, {"documents": {"doc_id": 10_000_000}})
    out["ds_split_leakage_safe_1x"] = run(specs, spark, "ds_split_leakage_safe", BASE)
    out["ds_split_leakage_safe_8x"] = run(specs, spark, "ds_split_leakage_safe", d_docs)

    # 2. hard negatives: corpus 8x, query side fixed by the Q_MAX bound
    d_emb = make_dir(spark, {"embeddings": {"vec_id": 10_000_000}})
    out["sim_hard_negatives_1x"] = run(specs, spark, "sim_hard_negatives", BASE)
    out["sim_hard_negatives_8x"] = run(specs, spark, "sim_hard_negatives", d_emb)

    # 3. scaled-integer pagerank: fact side 8x, rollup stays <=100x100
    d_fact = make_dir(spark, {
        "lineitem": {"l_orderkey": 100_000_000},
        "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    })
    out["graph_pagerank_exact_1x"] = run(specs, spark, "graph_pagerank_exact", BASE)
    out["graph_pagerank_exact_8x"] = run(specs, spark, "graph_pagerank_exact", d_fact)

    # 4. MAX_CLUSTER bound on a degenerate near-identical corpus:
    #    4k vectors, all tau-similar -> unbounded pair join is ~16M/nlist
    #    pairs; the cap excludes over-cap clusters entirely.
    import flume_source_spark.pipeline.semdedup as sd
    rows = [(i, [1.0, 1e-6 * (i % 17), 1e-6 * (i % 5), 0.0]) for i in range(4000)]
    deg = spark.createDataFrame(rows, "vec_id long, embedding array<double>").persist()
    deg.count()
    t_capped = timeit(lambda: sd.semdedup_decisions(deg).write.format("noop").mode("overwrite").save(), n=2)
    orig = sd.MAX_CLUSTER
    sd.MAX_CLUSTER = 10**9
    try:
        t_uncapped = timeit(lambda: sd.semdedup_decisions(deg).write.format("noop").mode("overwrite").save(), n=2)
    finally:
        sd.MAX_CLUSTER = orig
    out["semdedup_degenerate_4k_capped"] = t_capped
    out["semdedup_degenerate_4k_uncapped"] = t_uncapped

    for d in (d_docs, d_emb, d_fact):
        shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out, indent=1))

if __name__ == "__main__":
    main()
