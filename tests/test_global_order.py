"""Distributed global-order helper (round 11, VERDICT r10 item 1).

Three pin families:
1. EQUALITY pins — the helper's rank/ntile must be bit-identical to
   the single-partition window form on the real fixtures (ascending,
   descending, and composite-key shapes — one per re-shaped query).
2. PLAN pins — the helper's executed plan must contain NO
   single-partition Window (empty partition spec) and NO Sort fed by
   Exchange SinglePartition; the only SinglePartition exchanges
   allowed are the 1-row scalar aggregates (boundaries / total). The
   four re-shaped registered queries are each plan-pinned too.
3. MODEL pins — NTILE fill-rule arithmetic on adversarial totals
   (total < n, total % n != 0, heavy ties on the bucket key), where
   a wrong closed form would diverge from F.ntile immediately.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_source_spark.global_order import with_global_ntile, with_global_rank
from flume_source_spark.registry import load_all


def _mismatches(a, b, key, col):
    return (
        a.alias("a")
        .join(b.alias("b"), key)
        .filter(F.col(f"a.{col}") != F.col(f"b.{col}"))
        .count()
    )


def test_global_rank_equals_window_ascending(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "n_chars")
    w = d.select(
        "doc_id",
        F.row_number().over(Window.orderBy("n_chars", "doc_id")).cast("long").alias("r"),
    )
    g = with_global_rank(
        d, [F.col("n_chars"), F.col("doc_id")], F.col("n_chars"), rank_col="r"
    ).select("doc_id", "r")
    assert _mismatches(w, g, "doc_id", "r") == 0


def test_global_rank_equals_window_descending(spark, sf_dir):
    # the snake_balance shape: DESC weight head, negated bucket key
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "n_chars")
    w = d.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("n_chars").desc(), "doc_id"))
        .cast("long")
        .alias("r"),
    )
    g = with_global_rank(
        d, [F.col("n_chars").desc(), F.col("doc_id")], -F.col("n_chars"), rank_col="r"
    ).select("doc_id", "r")
    assert _mismatches(w, g, "doc_id", "r") == 0


def test_global_ntile_equals_window(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "n_chars")
    w = d.select(
        "doc_id", F.ntile(4).over(Window.orderBy("n_chars", "doc_id")).alias("t")
    )
    g = with_global_ntile(
        d, 4, [F.col("n_chars"), F.col("doc_id")], F.col("n_chars"), tile_col="t"
    ).select("doc_id", "t")
    assert _mismatches(w, g, "doc_id", "t") == 0


def test_global_rank_composite_bucket_key(spark, sf_dir):
    # the ds_curriculum_order shape: rank by (stage, h, doc_id) with a
    # composite stage*K+h bucket key
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "n_chars")
    s = d.select(
        "doc_id",
        (F.col("n_chars") % 4 + 1).alias("stage"),
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
         .cast("long") % 100000).alias("h"),
    )
    w = s.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy("stage", "h", "doc_id"))
        .cast("long")
        .alias("r"),
    )
    g = with_global_rank(
        s,
        [F.col("stage"), F.col("h"), F.col("doc_id")],
        F.col("stage").cast("long") * 100000 + F.col("h"),
        rank_col="r",
    ).select("doc_id", "r")
    assert _mismatches(w, g, "doc_id", "r") == 0


def test_ntile_fill_rule_adversarial_totals(spark):
    # totals that stress the closed form: < n, == n, n+1, prime,
    # exact multiple; plus heavy ties on the bucket key (every row
    # lands in ONE boundary bucket — rank must still be exact)
    for total, n in [(3, 7), (7, 7), (8, 7), (97, 10), (100, 10)]:
        d = spark.createDataFrame(
            [(i, (i * 13) % 5) for i in range(total)], "doc_id long, k long"
        )
        w = d.select(
            "doc_id", F.ntile(n).over(Window.orderBy("k", "doc_id")).alias("t")
        )
        g = with_global_ntile(
            d, n, [F.col("k"), F.col("doc_id")], F.col("k"), tile_col="t", buckets=8
        ).select("doc_id", "t")
        assert _mismatches(w, g, "doc_id", "t") == 0, (total, n)
    # all-ties bucket key: one bucket absorbs everything, rank exact
    d = spark.createDataFrame([(i, 1) for i in range(50)], "doc_id long, k long")
    w = d.select(
        "doc_id",
        F.row_number().over(Window.orderBy("k", "doc_id")).cast("long").alias("r"),
    )
    g = with_global_rank(
        d, [F.col("k"), F.col("doc_id")], F.col("k"), rank_col="r", buckets=8
    ).select("doc_id", "r")
    assert _mismatches(w, g, "doc_id", "r") == 0


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_distributed_order_plan(p: str) -> None:
    """No corpus-sized single-partition stage: every Window node must
    carry a non-empty partition spec, and no Sort may sit directly
    above an Exchange SinglePartition (scalar-aggregate exchanges — a
    1-row reduction — are the only SinglePartition occupants)."""
    lines = p.splitlines()
    for ln in lines:
        m = re.search(r"\bWindow(GroupLimit)? \[[^]]*\], \[([^]]*)\]", ln)
        if m is not None and "row_number" in ln:
            assert m.group(2).strip(), f"unpartitioned Window in plan: {ln.strip()}"
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln and i > 0:
            assert "Sort" not in lines[i - 1], (
                f"single-partition Sort: {lines[i - 1].strip()}"
            )


def test_helper_plan_has_no_single_partition_sort(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "n_chars")
    g = with_global_rank(
        d, [F.col("n_chars"), F.col("doc_id")], F.col("n_chars"), rank_col="r"
    )
    p = _plan(g)
    _assert_distributed_order_plan(p)
    # and the bucket-partitioned window must actually be there
    assert "row_number" in p and "__go_bucket" in p


def test_reshaped_queries_plans_are_distributed(spark, sf_dir):
    """The four re-shaped registered queries (VERDICT r10 'What's
    wrong': agg_equidepth_histogram, ds_batch_plan,
    ds_curriculum_order, ds_shard_snake_balance) must plan with no
    unpartitioned Window and no single-partition Sort."""
    qs = load_all()
    for name in (
        "agg_equidepth_histogram",
        "ds_batch_plan",
        "ds_curriculum_order",
        "ds_shard_snake_balance",
    ):
        df = qs[name].builder(spark, sf_dir)
        _assert_distributed_order_plan(_plan(df))
