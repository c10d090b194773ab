#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...}

Execution is measured end-to-end per query with a noop-format write
(full plan runs on executors, nothing collects to the driver), after a
JVM/codegen warmup pass. The headline set spans the engine's cost
classes: scan+agg, broadcast-join pipelines, top-k, windows,
rollup, streaming batch-twin, dedup (LSH), similarity, text quality.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q07_nation_volume",
    "q10_returned_items",
    "q18_large_volume_customers",
    "join_broadcast_hint",
    "join_asof",
    "window_topk_per_group",
    "agg_rollup",
    "subquery_exists_correlated",
    "streaming_tumbling_window",
    "merge_upsert_emulation",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "text_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_session(app_name="flume_source_spark_bench")
    specs = load_all()

    def run_once(name: str) -> float:
        df = specs[name].builder(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def run(name: str) -> float:
        # two executions, report the steady-state (min): the first pays
        # one-time whole-stage-codegen compilation, which on a long-lived
        # cluster amortizes to zero
        return min(run_once(name), run_once(name))

    run_once("q01_pricing_summary")  # warmup: JVM, parquet footer cache
    timings = {name: round(run(name), 3) for name in HEADLINE}
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
