"""Refined duplicate-corpus-scan audit (round 12): walk the physical
plan TREE and count live FileSourceScan leaves per base table —
excluding anything hidden under an InMemoryTableScan (persisted) or
RDDScan (localCheckpoint) leaf, which the textual audit
(audit_duplicate_scans.py) overcounts because those leaves print their
full originating lineage.

A table with >= 2 LIVE scans in one plan is genuinely re-read (and its
derived subtree genuinely recomputed) every run — the 100 TB defect
class this optimization round removes.

Usage: python scripts/audit_live_scans.py [--sf DIR] [names...]
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


def live_scan_counts(df) -> dict[str, int]:
    """Count live FileSourceScan leaves per table in df's physical
    plan (cached/checkpointed leaves excluded: InMemoryTableScan and
    RDDScan nodes are leaves — the tree walk never descends into the
    lineage they print)."""
    counts: dict[str, int] = {}

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(node.initialPlan())
            return
        if name in ("InMemoryTableScanExec", "RDDScanExec"):
            return  # cached / checkpointed leaf
        if "FileSourceScan" in name or "BatchScan" in name:
            s = node.toString().split("\n")[0]
            m = re.search(r"(\w+)\.parquet", s)
            if m:
                counts[m.group(1)] = counts.get(m.group(1), 0) + 1
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        # subqueries / broadcast exchanges hang off innerChildren too
        inner = node.innerChildren()
        for i in range(inner.size()):
            walk(inner.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return counts


def main() -> int:
    sf = "/root/testdata/sf0.001"
    args = sys.argv[1:]
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    spark = get_session(app_name="audit_live_scans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    names = args or sorted(specs)
    rows = []
    for name in names:
        try:
            counts = live_scan_counts(specs[name].builder(spark, sf))
        except Exception as ex:
            rows.append((0, name, "PLAN_ERROR", str(ex)[:80]))
            continue
        for t, n in counts.items():
            if n >= 2:
                rows.append((n, name, t, ""))
    rows.sort(key=lambda r: -r[0])
    for n, name, t, err in rows:
        print(f"{n}x  {name:45s} {t} {err}")
    print(f"-- {sum(1 for r in rows if r[0] >= 3)} (query,table) pairs with >=3 live scans")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
