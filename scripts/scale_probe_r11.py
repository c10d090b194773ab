"""Round-11 SCALE.md measurements: solo + 8x probes for the round-11
bench-admission candidates (the VERDICT r7 item 8 / r8 item 6
protocol — nothing enters HEADLINE without these numbers).

1. The four GLOBAL-ORDER re-shapes (agg_equidepth_histogram,
   ds_batch_plan, ds_curriculum_order, ds_shard_snake_balance) at
   1x/8x of their driving table — the distributed global-rank helper
   (flume_source_spark/global_order.py) is the new cost class under
   test: one percentile_approx boundary pass + a bucket-partitioned
   window + broadcast offset join, replacing the old single-partition
   sort. 8x rows spread over the SAME key range, so bucket sizes grow
   8x uniformly — the probe checks the plan scales with rows, not
   with a one-task sort.
2. ts_logrank at 1x/8x events (event_id shifted, user_id/ts
   UNCHANGED — 8x gap rows funnel into the same calendar-bounded
   life table; the per-user lag window and two tiny reverse-cum
   windows are the only non-fold stages).
3. multimodal_similar_topk at 1x/8x documents (doc_id shifted, TEXT
   UNCHANGED — identical sketches make every band bucket grow 8x and
   the candidate OUTPUT quadratic in copy count; the
   PHASH_MAX_BUCKET cap is the lever under test, exactly the r10
   neardup probe's adversarial shape plus the per-doc top-k rank).
4. entity_golden_record_audit at 1x/8x part (p_partkey shifted,
   names/types UNCHANGED — sorted-neighborhood candidates stay N·W
   but match clusters fatten; CC + the audit aggregates run on the
   match-edge set).

Protocol: 8 exact copies with shifted ids, unchanged tables
symlinked, min-of-3, noop sink, SOLO on an idle host.
"""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session
from scale_probe_r7 import BASE, make_dir, run


def main():
    spark = get_session(app_name="scale_probe_r11")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_li = d_docs = d_ev = d_part = None
    try:
        d_li = make_dir(spark, {"lineitem": {"l_orderkey": 100_000_000}})
        q = "agg_equidepth_histogram"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_li)
        shutil.rmtree(d_li, ignore_errors=True)
        d_li = None

        d_docs = make_dir(spark, {"documents": {"doc_id": 10_000_000}})
        for q in (
            "ds_batch_plan",
            "ds_curriculum_order",
            "ds_shard_snake_balance",
            "multimodal_similar_topk",
        ):
            out[f"{q}_1x"] = run(specs, spark, q, BASE)
            out[f"{q}_8x"] = run(specs, spark, q, d_docs)
        shutil.rmtree(d_docs, ignore_errors=True)
        d_docs = None

        d_ev = make_dir(spark, {"events": {"event_id": 100_000_000}})
        q = "ts_logrank"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_ev)
        shutil.rmtree(d_ev, ignore_errors=True)
        d_ev = None

        d_part = make_dir(spark, {"part": {"p_partkey": 10_000_000}})
        q = "entity_golden_record_audit"
        out[f"{q}_1x"] = run(specs, spark, q, BASE)
        out[f"{q}_8x"] = run(specs, spark, q, d_part)
    finally:
        for d in (d_li, d_docs, d_ev, d_part):
            if d:
                shutil.rmtree(d, ignore_errors=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
