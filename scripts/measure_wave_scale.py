#!/usr/bin/env python
"""8×-replication scale measurement for the wave-12/16/18 operators
(text_line_dedup, ds_bloom_dedup, dedup_simhash_hamming_join core
paths). Same protocol as SCALE.md's dedup-family table: documents
replicated with shifted ids (8 exact copies each — adversarial:
every segment's document frequency grows 8×), min of 3 timed runs,
noop-format write so nothing collects to the driver."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flume_source_spark.session import get_session
from flume_source_spark.tables import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(df_fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    spark = get_session(app_name="wave_scale_measure")
    docs1 = load_tables(spark, SF_DIR)["documents"].select("doc_id", "text")
    reps = [
        docs1.select((F.col("doc_id") + 1_000_000 * k).alias("doc_id"), "text")
        for k in range(8)
    ]
    docs8 = reps[0]
    for r in reps[1:]:
        docs8 = docs8.unionAll(r)
    docs8 = docs8.repartition(32).localCheckpoint()  # materialize once

    from flume_source_spark.pipeline.text9 import line_dedup_stats
    from flume_source_spark.pipeline.dataset4 import _segments, bloom_build, bloom_probe
    from flume_source_spark.pipeline.dedup2 import hamming_pairs

    def bloom_path(docs):
        segs = _segments(docs)
        hist = segs.where(F.col("doc_id") % 2 == 0).select("seg").distinct()
        inc = segs.where(F.col("doc_id") % 2 == 1)
        bloom = bloom_build(hist)
        positive = bloom_probe(inc, bloom)
        return positive.join(hist, "seg", "left_semi").groupBy("doc_id").agg(
            F.countDistinct("seg").alias("n")
        )

    def simhash_codes(docs):
        tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        tok = tok.withColumn("hx", F.xxhash64("tok"))
        bit_sums = [
            F.sum(F.shiftright("hx", b).bitwiseAND(F.lit(1))).alias(f"b{b}")
            for b in range(32)
        ]
        votes = tok.groupBy("doc_id").agg(F.count("*").alias("n"), *bit_sums)
        sim = None
        for b in range(32):
            bit = F.when(F.col(f"b{b}") * 2 > F.col("n"), F.lit(1 << b)).otherwise(F.lit(0))
            sim = bit if sim is None else sim + bit
        return votes.select("doc_id", sim.cast("long").alias("simhash"))

    for label, docs in (("1x", docs1.repartition(32).localCheckpoint()), ("8x", docs8)):
        n = docs.count()
        t_line = timed(lambda: line_dedup_stats(docs))
        t_bloom = timed(lambda: bloom_path(docs))
        t_ham = timed(lambda: hamming_pairs(simhash_codes(docs)))
        print(f"{label}: docs={n} line_dedup={t_line:.2f}s bloom_dedup={t_bloom:.2f}s "
              f"simhash_hamming={t_ham:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
