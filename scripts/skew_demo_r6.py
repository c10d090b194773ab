"""SCALE.md evidence for skew_salted_join: on a PLANTED hot key, does
salting actually beat the straight shuffle join, and what does AQE's
skew-split do on the same input? Three plans over the same synthetic
skewed fact table, identical results, wall-clock compared:

  fact: N rows, HOT_FRAC of them sharing orderkey 0, the rest uniform
        over K keys;  dim: K rows (orderkey, priority).
  (a) unsalted SMJ, AQE off  — one reducer owns HOT_FRAC·N rows;
  (b) salted SMJ (the skew_salted_join transform), AQE off — the hot
      key spreads over SALT_BUCKETS reducers at the price of an
      8×-replicated K-row build side;
  (c) unsalted SMJ, AQE skew-join ON — the adaptive baseline.

min-of-3 each, noop sink. Run: python scripts/skew_demo_r6.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N = 16_000_000
K = 10_000
HOT_FRAC = 0.8
SALT = 8


def build(spark):
    fact = spark.range(N).select(
        F.when(
            F.col("id") < int(N * HOT_FRAC), F.lit(0)
        ).otherwise(F.pmod(F.xxhash64("id"), F.lit(K))).alias("fk"),
        F.col("id").alias("rid"),
        (F.pmod(F.col("id"), F.lit(50)) + 1).cast("double").alias("qty"),
    )
    dim = spark.range(K).select(
        F.col("id").alias("dk"),
        F.concat(F.lit("P"), F.pmod(F.col("id"), F.lit(5)).cast("string")).alias(
            "prio"
        ),
    )
    return fact.localCheckpoint(eager=True), dim.localCheckpoint(eager=True)


def agg(j):
    return j.groupBy("prio").agg(
        F.count("*").alias("n"), F.sum("qty").alias("s")
    )


def unsalted(fact, dim):
    return agg(fact.hint("merge").join(dim, fact.fk == dim.dk))


def salted(fact, dim):
    f = fact.withColumn("salt", F.pmod(F.xxhash64("rid"), F.lit(SALT)))
    d = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT)]))
    ).withColumn("salt", F.col("salt").cast("long"))
    return agg(f.hint("merge").join(d, (f.fk == d.dk) & (f.salt == d.salt)))


def timeit(df, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 2)


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fact, dim = build(spark)
    out = {}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    out["unsalted_aqe_off"] = timeit(unsalted(fact, dim))
    out["salted_aqe_off"] = timeit(salted(fact, dim))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    out["unsalted_aqe_skewjoin"] = timeit(unsalted(fact, dim))
    # sanity: identical results
    a = {tuple(r) for r in unsalted(fact, dim).collect()}
    b = {tuple(r) for r in salted(fact, dim).collect()}
    out["results_equal"] = a == b
    print(json.dumps(out))


if __name__ == "__main__":
    main()
