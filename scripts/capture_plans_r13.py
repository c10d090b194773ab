"""Capture .explain("formatted") for named registry queries into
plans/r12/<query>_<suffix>.txt (the round-12 optimization evidence:
judge checks plan claims against these files).

Usage: python scripts/capture_plans_r13.py <suffix> [--sf DIR] q1 q2 ...
       python scripts/capture_plans_r13.py before --headline   (whole bench set)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session


def main() -> int:
    args = sys.argv[1:]
    suffix = args.pop(0)
    sf = "/root/testdata/sf0.1"
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    if args and args[0] == "--headline":
        import bench

        names = list(bench.HEADLINE)
    else:
        names = args
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name="capture_plans_r13")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    for name in names:
        try:
            df = specs[name].builder(spark, sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:
            txt = f"PLAN_ERROR: {ex}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} B)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
