"""Round-7 SCALE.md measurements, part 4: the release-QA ops.

1. ds_snapshot_diff at 1x and 8x documents (doc_ids shifted — both
   derived snapshots grow 8x and the full-outer join cardinality
   grows 8x with them). Claim: linear; the join shuffles the two
   id-projected snapshots and the per-source rollup collapses
   map-side onto 20 source keys.
2. ds_k_anonymity_audit at 1x and 8x documents. Claim: flat-ish at
   fixture scale / linear in the scan at 100 TB; both aggregations
   are map-side combinable and the shuffled partials are QI-sized
   (lang x source x length-bucket), not corpus-sized.

Protocol: scripts/scale_probe_r5/6/7.py — 8 exact copies with shifted
ids, unchanged tables symlinked, min-of-3, noop sink.
"""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session
from scale_probe_r7 import BASE, make_dir, run


def main():
    spark = get_session(app_name="scale_probe_r7d")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_docs = make_dir(spark, {"documents": {"doc_id": 100_000_000}})
    try:
        for name in ("ds_snapshot_diff", "ds_k_anonymity_audit"):
            out[f"{name}_1x"] = run(specs, spark, name, BASE)
            out[f"{name}_8x"] = run(specs, spark, name, d_docs)
            out[f"{name}_ratio"] = round(out[f"{name}_8x"] / out[f"{name}_1x"], 2)
    finally:
        shutil.rmtree(d_docs, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
