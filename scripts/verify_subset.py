"""Targeted driver-contract verification: run the named registry
queries through the REAL driver surface (__spark_entry__.queries /
oracle_sql) against DuckDB on a given sf dir, raw-tuple strict.

Usage: python scripts/verify_subset.py [--sf /root/testdata/sf0.01] q1 q2 ...
"""
from __future__ import annotations

import importlib.util
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(t):
    out = []
    for v in t:
        if isinstance(v, np.ndarray):
            v = tuple(v.tolist())
        elif isinstance(v, list):
            v = tuple(v)
        out.append(None if (not isinstance(v, (tuple, str)) and pd.isna(v)) else v)
    return tuple(out)


def _skey(t):
    def k(v):
        if v is None:
            return (True, "", 0)
        if isinstance(v, bool):
            return (False, "bool", v)
        if isinstance(v, (int, float)):
            return (False, "num", float(v))
        return (False, str(type(v)), v)

    return tuple(k(v) for v in t)


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    nfail = 0
    for name in args:
        if name not in qs:
            print(f"  {name}: NOT IN REGISTRY")
            nfail += 1
            continue
        try:
            spdf = qs[name](spark, sf).toPandas()
            if name not in osql:
                print(f"  {name}: {len(spdf)} rows (rows-only)")
                continue
            dpdf = con.execute(osql[name]).fetchdf()
            sc, dc = sorted(spdf.columns), sorted(dpdf.columns)
            assert sc == dc, (name, sc, dc)
            a = sorted(
                (_norm(t) for t in spdf[sc].itertuples(index=False, name=None)),
                key=_skey,
            )
            b = sorted(
                (_norm(t) for t in dpdf[dc].itertuples(index=False, name=None)),
                key=_skey,
            )
            assert a == b, (
                name,
                next((i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y),
            )
            print(f"  {name}: {len(a)} rows MATCH")
        except Exception as e:  # noqa: BLE001 — report-and-continue harness
            nfail += 1
            print(f"  {name}: FAIL {repr(e)[:400]}")
    print("ALL MATCH" if nfail == 0 else f"{nfail} FAILURES")
    return 1 if nfail else 0


if __name__ == "__main__":
    raise SystemExit(main())
