"""PartitionedParquetUpsertSink: partition-pruned streaming MERGE —
only buckets a batch touches rewrite; untouched buckets keep their
generation directories byte-identical. Same single-commit-file
exactly-once contract as ParquetUpsertSink."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pandas as pd

from pyspark.sql import functions as F

from flume_source_spark.streaming.upsert_partitioned import PartitionedParquetUpsertSink

T0 = datetime(2025, 1, 1)
SCHEMA = "k LONG, ts TIMESTAMP, v STRING"


def _frame(spark, rows):
    pdf = pd.DataFrame(
        {
            "k": [r[0] for r in rows],
            "ts": [T0 + timedelta(minutes=r[1]) for r in rows],
            "v": [r[2] for r in rows],
        }
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return spark.createDataFrame(pdf)


def test_partitioned_upsert_prunes_untouched_buckets(spark, tmp_path):
    sink = PartitionedParquetUpsertSink(str(tmp_path / "t"), key="k", order_col="ts", n_buckets=4)
    # epoch 0: keys 0..7 cover all 4 buckets
    sink(_frame(spark, [(k, k, f"v{k}") for k in range(8)]), 0)
    gens0 = sink.bucket_generations()
    assert set(gens0) == {"0", "1", "2", "3"}

    # epoch 1: update only keys 1 and 5 — both bucket 1
    sink(_frame(spark, [(1, 100, "v1b"), (5, 101, "v5b")]), 1)
    gens1 = sink.bucket_generations()
    assert gens1["1"] != gens0["1"]  # touched bucket advanced
    for b in ("0", "2", "3"):
        assert gens1[b] == gens0[b]  # untouched pointers unchanged
        d = tmp_path / "t" / f"bucket={b}" / gens0[b]
        assert d.exists()

    got = {
        r["k"]: r["v"] for r in sink.read_target(spark).collect()
    }
    assert got == {k: (f"v{k}" if k not in (1, 5) else f"v{k}b") for k in range(8)}

    # latest-wins within a bucket across epochs
    sink(_frame(spark, [(5, 50, "stale")]), 2)  # older ts than v5b
    got2 = {r["k"]: r["v"] for r in sink.read_target(spark).collect()}
    assert got2[5] == "v5b"  # merge kept the newer row

    # epoch fence: redelivery no-ops (pointer map unchanged)
    gens2 = sink.bucket_generations()
    sink(_frame(spark, [(0, 999, "SHOULD_NOT_APPLY")]), 1)
    assert sink.bucket_generations() == gens2
    assert {r["k"]: r["v"] for r in sink.read_target(spark).collect()}[0] == "v0"


def test_partitioned_upsert_bucket_reads_are_pruned(spark, tmp_path):
    """read_bucket() returns exactly the keys hashing to that bucket
    (the co-location invariant the bucketed-join layout relies on)."""
    sink = PartitionedParquetUpsertSink(str(tmp_path / "t"), key="k", order_col="ts", n_buckets=4)
    sink(_frame(spark, [(k, k, f"v{k}") for k in range(16)]), 0)
    for b in range(4):
        rows = sink.read_bucket(spark, b).collect()
        assert rows and all(r["k"] % 4 == b for r in rows)
