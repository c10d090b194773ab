"""Round-9 session-3 SCALE.md measurements, part 3: solo + 8x probes
for the batch-3 queries (protocol of scale_probe_r5..r9d).

1. dedup_minhash_calibration at 1x/8x documents (doc_id shifted) —
   the fixed-SIZE budget gate self-scales its modulus, so signature
   and pair work stay O(budget^2); claim FLAT after the gate scan.
2. ds_l_diversity_audit under the same replication — one groupBy onto
   QI keys (count + count-distinct over the bounded source domain) +
   a per-language rollup; claim LINEAR in the scan.
3. ts_bootstrap_ci_median at 1x/8x events (event_id + user_id
   shifted, ts/event_type UNCHANGED) — the resample grid is
   calendar x BOOT_B regardless of N; claim FLAT after the daily
   collapse.
4. agg_winsorized_mean under the same event replication — one rank
   window per event_type over ALL rows (the dq_roc_auc per-row window
   class) + a broadcast bounds join + one clamp fold; claim
   linear-with-sort in rows.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session
from scale_probe_r7 import BASE, make_dir, run


def main():
    spark = get_session(app_name="scale_probe_r9e")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_doc = make_dir(spark, {"documents": {"doc_id": 100_000_000}})
    d_ev = make_dir(
        spark, {"events": {"event_id": 1_000_000_000, "user_id": 10_000_000}}
    )

    for name, rep_dir in [
        ("dedup_minhash_calibration", d_doc),
        ("ds_l_diversity_audit", d_doc),
        ("ts_bootstrap_ci_median", d_ev),
        ("agg_winsorized_mean", d_ev),
    ]:
        t1 = run(specs, spark, name, BASE)
        t8 = run(specs, spark, name, rep_dir)
        out[name] = {"t1": t1, "t8": t8, "ratio": round(t8 / t1, 2)}
        print(name, out[name], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
