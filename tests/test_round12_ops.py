"""Round-12 operator tests: the text_rake_keywords top-k re-shape,
the driver-materialized global-order boundaries, and the round-12
survival/audit additions.

Reference parity note: the reference engine (`CephFsSource.java`,
`CephFSEventReader.java`) has no analytics surface; everything here
belongs to the declared [NS] engine surface (SURVEY.md §2.2).
"""
from __future__ import annotations

import pyspark.sql.functions as F


def test_rake_plan_uses_take_ordered(spark, sf_dir):
    """The round-12 RAKE re-shape (VERDICT r11 "What's wrong"): the
    corpus-scale phrase vocabulary must reach the top-10 via
    TakeOrderedAndProject (per-partition partial top-k) — the
    whole-vocabulary unpartitioned row_number window is gone; the
    remaining rank Window runs AFTER the 10-row limit."""
    from flume_source_spark.registry import load_all

    qs = load_all()
    p = (
        qs["text_rake_keywords"]
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in p
    # the phrase table must not be globally sorted: a full-table Sort
    # node with a SinglePartition exchange directly beneath it would
    # be the old corpus-scale plan (the remaining rank Window runs on
    # the 10 post-limit rows, which plans no such Sort-over-Exchange)
    import re

    assert not re.search(
        r"Sort \[[^\n]*\n[^\n]*Exchange SinglePartition", p
    ), "corpus-scale single-partition sort resurfaced in RAKE"


def test_rake_topk_equals_rank_filter_form(spark, sf_dir):
    """Equality pin for the re-shape: orderBy().limit(10) then rank
    must return exactly the rows the old rank-then-filter form
    returned (the oracle still ranks first — driver-verified; this
    pins the Spark-vs-Spark equivalence at test time too)."""
    from flume_source_spark.registry import load_all

    qs = load_all()
    got = [
        tuple(r)
        for r in qs["text_rake_keywords"].builder(spark, sf_dir).collect()
    ]
    assert len(got) == 10
    assert [r[3] for r in got] == list(range(1, 11))
    # scores weakly decreasing under the round-6 rank key
    scores = [r[2] for r in got]
    assert all(scores[i] >= scores[i + 1] - 1e-9 for i in range(9))


def test_global_order_boundaries_are_driver_literals(spark):
    """ADVICE r11 (medium): the bucket id must be a pure function of
    the row GIVEN FIXED LITERAL boundaries — the percentile sketch is
    collected once on the driver, so no plan branch can recompute it.
    Pin: the bucketed frame's plan contains no percentile_approx, and
    _boundaries returns plain python floats."""
    from flume_source_spark.global_order import _boundaries, _bucketed

    df = spark.range(1000).select(F.col("id").cast("long").alias("k"))
    bnds = _boundaries(df, F.col("k"), 8)
    assert len(bnds) == 7
    assert all(isinstance(b, float) for b in bnds)
    assert bnds == sorted(bnds)
    b = _bucketed(df, F.col("k"), 8)
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "percentile_approx" not in plan, (
        "boundary sketch must not be re-evaluated inside the bucketed plan"
    )
    # buckets cover the full range and are monotone in k
    rows = b.orderBy("k").select("__go_bucket").collect()
    seq = [r[0] for r in rows]
    assert seq == sorted(seq)
    assert seq[0] == 0 and seq[-1] == 7


def test_global_order_empty_and_single_row(spark):
    """Degenerate inputs: empty frame → empty ranked frame; one row →
    rank 1 (boundary collect returns [] in both cases)."""
    from flume_source_spark.global_order import with_global_rank

    empty = spark.range(0).select(F.col("id").alias("k"))
    assert (
        with_global_rank(empty, [F.col("k")], F.col("k"), rank_col="r").count()
        == 0
    )
    one = spark.range(1).select(F.col("id").alias("k"))
    got = with_global_rank(one, [F.col("k")], F.col("k"), rank_col="r").collect()
    assert [(r["k"], r["r"]) for r in got] == [(0, 1)]
