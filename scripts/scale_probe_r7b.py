"""Round-7 SCALE.md measurements, part 2: the late round-7 additions.

1. join_bloom_prefilter at 1x and 8x (lineitem + orders both 8x,
   orderkeys shifted in lockstep so the join cardinality scales 8x) —
   claim: ~linear in the fact side; the bitmap build/broadcast is
   dim-sized and the probe is map-side, so no superlinear term.
2. The counterfactual that motivates the operator: the SAME join with
   auto-broadcast disabled (autoBroadcastJoinThreshold=-1, AQE's too)
   to simulate the 100 TB regime where the dim side exceeds the
   broadcast threshold and Catalyst plans a shuffle join. Measured
   both WITH the bloom prefilter (the explicit F.broadcast hint on
   the 16 KB bitmap still fires — hints bypass thresholds) and
   WITHOUT (plain join): the delta is the shuffle volume the ~96% of
   fact rows that cannot match would otherwise pay.
3. agg_sketch_intersect_exact 1x vs 8x under the same adversarial
   shape as the merge twin: 8x rows funneled into the SAME partkey
   word space, so growth must be absorbed by the map-side partial agg.

Protocol: scripts/scale_probe_r5/6/7.py — 8 exact copies with shifted
ids, unchanged tables symlinked, min-of-3, noop sink.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flume_source_spark.canon import dec, dsum
from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session
from scale_probe_r7 import BASE, make_dir, run, timeit


def plain_join(spark, sf_dir):
    """join_bloom_prefilter's result WITHOUT the prefilter."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), "revenue"),
        )
        .orderBy("l_returnflag")
    )


def main():
    spark = get_session(app_name="scale_probe_r7b")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    shifts = {
        "lineitem": {"l_orderkey": 100_000_000},
        "orders": {"o_orderkey": 100_000_000},
    }
    d8 = make_dir(spark, shifts)

    out["join_bloom_prefilter_1x"] = run(specs, spark, "join_bloom_prefilter", BASE)
    out["join_bloom_prefilter_8x"] = run(specs, spark, "join_bloom_prefilter", d8)

    # 100 TB-regime counterfactual: dim too big to broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    noop = lambda df: df.write.format("noop").mode("overwrite").save()
    out["shuffle_join_bloom_8x"] = timeit(
        lambda: noop(specs["join_bloom_prefilter"].builder(spark, d8))
    )
    out["shuffle_join_plain_8x"] = timeit(lambda: noop(plain_join(spark, d8)))
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    shutil.rmtree(d8, ignore_errors=True)

    d_li = make_dir(spark, {"lineitem": {"l_orderkey": 100_000_000}})
    out["agg_sketch_intersect_exact_1x"] = run(
        specs, spark, "agg_sketch_intersect_exact", BASE
    )
    out["agg_sketch_intersect_exact_8x"] = run(
        specs, spark, "agg_sketch_intersect_exact", d_li
    )
    shutil.rmtree(d_li, ignore_errors=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
