"""Skew and co-location recipes: key salting and bucketed joins — the
two manual levers for shuffle pathologies that AQE alone can't always
fix.

Both queries return results identical to their unsalted/unbucketed
equivalents (that's what the oracle checks); the point is the PLAN:
salting spreads one hot key across N reducers, bucketing removes the
join shuffle entirely (pinned by tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.canon import dec, dsum
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

SALT_BUCKETS = 8


@query(
    "skew_salted_aggregation",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("skew", "aggregate"),
)
def skew_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: group by (key, salt) first — every
    reducer gets ≤ 1/N of any hot key — then re-aggregate by key.
    l_returnflag has only 3 values, the worst-case hot-key layout: an
    unsalted groupBy lands all rows on 3 reducers regardless of
    cluster size. Decimal partials make the two-phase result exactly
    equal to the one-phase oracle."""
    li = load_tables(spark, sf_dir)["lineitem"]
    salted = li.withColumn("salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALT_BUCKETS)))
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.count("*").alias("pn"), F.sum(dec("l_quantity")).alias("pq")
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(F.sum("pn").alias("n"), F.round(F.sum("pq"), 2).cast("double").alias("sum_qty"))
        .orderBy("l_returnflag")
    )


@query(
    "bucketed_colocated_join",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_items,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("bucketing", "join", "plan"),
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket both tables on the join key (bucketBy → saveAsTable),
    then join the bucketed tables: no Exchange on either side of the
    SortMergeJoin (pinned by test_bucketed_join_has_no_shuffle). This
    is THE lever for repeated fact-fact joins at 100 TB — pay the
    bucketed write once, skip the join shuffle forever after."""
    from flume_source_spark.workdir import slot as _slot

    t = load_tables(spark, sf_dir)
    base = _slot(sf_dir, "buckets")
    db = f"fss_buckets_{os.path.basename(os.path.dirname(base))}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    # external tables with explicit /tmp paths: overwrite is idempotent
    # across sessions (managed-table locations outlive the in-memory
    # catalog and collide on re-create)
    spark.sql(f"DROP TABLE IF EXISTS {db}.orders_b")
    spark.sql(f"DROP TABLE IF EXISTS {db}.lineitem_b")
    (
        t["orders"].select("o_orderkey", "o_orderpriority")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", os.path.join(base, "orders_b"))
        .mode("overwrite").saveAsTable(f"{db}.orders_b")
    )
    (
        t["lineitem"].select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", os.path.join(base, "lineitem_b"))
        .mode("overwrite").saveAsTable(f"{db}.lineitem_b")
    )
    o = spark.table(f"{db}.orders_b")
    li = spark.table(f"{db}.lineitem_b")
    # hint("merge"): at fixture scale Catalyst would broadcast the small
    # side and never exercise the bucket layout; at 100 TB neither side
    # broadcasts, so forcing sort-merge reproduces the at-scale plan —
    # which the bucketed+sorted scans then feed with NO Exchange/Sort
    return (
        o.join(li.hint("merge"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"), dsum(dec("l_quantity"), "total_qty"))
        .orderBy("o_orderpriority")
    )


@query(
    "skew_salted_join",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("skew", "join", "plan"),
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third manual skew lever (after salted aggregation and
    bucketing): SALT-REPLICATED fact-fact join. The skewed probe side
    gets a deterministic salt in [0, N); the build side is replicated
    N× (explode of a static salt array — N small rows per key, never
    a data-dependent blow-up), and the join key becomes
    (key, salt) — one hot key now spreads across N reducers instead
    of pinning one. Result is provably identical to the unsalted
    join (the oracle checks exactly that); hint("merge") forces the
    shuffle path at fixture scale the same way join_shuffle_fact_fact
    and bucketed_colocated_join do, so the plan test can pin the
    salted Exchange keys. At 100 TB, AQE's skew-split handles
    MODERATE skew adaptively; explicit salting is the lever when one
    key exceeds what post-shuffle splitting can rebalance (the
    replicated side cost is N× its size, chosen up front)."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALT_BUCKETS))
    )
    o_rep = (
        t["orders"]
        .select("o_orderkey", "o_orderpriority")
        .withColumn(
            "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT_BUCKETS)]))
        )
        .withColumn("salt", F.col("salt").cast("long"))
    )
    joined = li.hint("merge").join(
        o_rep,
        (F.col("l_orderkey") == F.col("o_orderkey")) & (li.salt == o_rep.salt),
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.round(F.sum(dec("l_quantity")), 2).cast("double").alias("total_qty"),
        )
        .orderBy("o_orderpriority")
    )
