"""Round-7 SCALE.md measurements: 8x-replication scaling for the
operators round 7 added or re-shaped — the agg_sketch_merge_exact
bitmap rollup twin, the text_bpe_merges_exact string-rewrite trainer
twin, and ds_semdedup under its new sqrt(N)-adaptive nlist default.
Same protocol as scripts/scale_probe_r5/r6.py: 8 exact copies with
shifted ids (embeddings: emb_id; documents: doc_id, TEXT UNCHANGED —
word frequencies grow 8x while the vocabulary stays fixed, which is
the shape the vocabulary-sized BPE stages must be insensitive to),
unchanged tables symlinked, min-of-3."""
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
    spark = get_session(app_name="scale_probe_r7")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    # lineitem 8x with shifted orderkeys; partkeys UNCHANGED — the
    # adversarial shape for the bitmap rollup: 8x rows funnel into the
    # SAME word-table key space, so the partial agg must absorb the
    # growth map-side (the claim under test)
    d_li = make_dir(spark, {"lineitem": {"l_orderkey": 100_000_000}})
    out["agg_sketch_merge_exact_1x"] = run(specs, spark, "agg_sketch_merge_exact", BASE)
    out["agg_sketch_merge_exact_8x"] = run(specs, spark, "agg_sketch_merge_exact", d_li)
    shutil.rmtree(d_li, ignore_errors=True)

    # documents 8x, doc_id shifted (text unchanged): word FREQUENCIES
    # grow 8x but the vocabulary does not — the trainer's claim is
    # that everything after the word-count agg is vocabulary-sized,
    # so 8x corpus should be ~flat
    d_doc = make_dir(spark, {"documents": {"doc_id": 10_000_000}})
    out["text_bpe_merges_exact_1x"] = run(specs, spark, "text_bpe_merges_exact", BASE)
    out["text_bpe_merges_exact_8x"] = run(specs, spark, "text_bpe_merges_exact", d_doc)
    shutil.rmtree(d_doc, ignore_errors=True)

    # embeddings 8x: ds_semdedup with the ADAPTIVE default — nlist
    # grows 71 -> 200 with the corpus, holding cluster size ~O(sqrt N)
    # (the r4 table measured fixed-16 at 4.4x; sqrt-scaling should cut
    # the pair term ~8x at the cost of a wider centroid broadcast)
    d_emb = make_dir(spark, {"embeddings": {"vec_id": 10_000_000}})
    out["ds_semdedup_adaptive_1x"] = run(specs, spark, "ds_semdedup", BASE)
    out["ds_semdedup_adaptive_8x"] = run(specs, spark, "ds_semdedup", d_emb)
    shutil.rmtree(d_emb, ignore_errors=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()


