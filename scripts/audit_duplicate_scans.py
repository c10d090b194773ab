"""One-shot plan audit (round 12, handoff item 3): for every
registered query, count how many times each base parquet table is
scanned in the OPTIMIZED physical plan. A table scanned >= 3 times
in one plan usually means an expensive subtree fanned to several
consumers without a checkpoint (the round-12 Kneser-Ney / rich-club
/ link-predictor class); 2 scans are often legitimate (self-joins,
unions of two projections).

Usage: python scripts/audit_duplicate_scans.py [--sf /root/testdata/sf0.001]
Prints one line per (query, table, n_scans >= 2), worst first.
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf = "/root/testdata/sf0.001"
    args = sys.argv[1:]
    if args and args[0] == "--sf":
        sf = args[1]
    spark = get_session(app_name="audit_duplicate_scans")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, spec in sorted(load_all().items()):
        try:
            p = (
                spec.builder(spark, sf)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as ex:  # streaming/source queries may not plan here
            rows.append((name, "PLAN_ERROR", 0, str(ex)[:80]))
            continue
        for t in TABLES:
            n = len(re.findall(rf"Scan parquet[^\n]*{t}\.parquet", p))
            if n >= 2:
                rows.append((name, t, n, ""))
    rows.sort(key=lambda r: -r[2])
    for name, t, n, err in rows:
        print(f"{n}x  {name:45s} {t} {err}")
    print(f"-- {sum(1 for r in rows if r[2] >= 3)} queries with >=3 scans of one table")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
