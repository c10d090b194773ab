"""Join operator surface: every join type over the TPC-H keys.

Catalyst picks the physical strategy; at these dimension sizes every
equi-join below resolves to broadcast-hash (verified by the plan tests
in tests/test_plans.py). At 100 TB the same declarations hold: the
dims stay broadcast-able, and fact-fact joins would shuffle on their
keys with AQE handling skew — nothing here hand-schedules.

Generalizes the reference's single dataflow (a metadata projection fed
to a channel) to the full relational join surface required by the
north star in BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.canon import davg, dec, dsum
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables


@query(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_orderstatus, c_name, n_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderkey % 100 = 7
    ORDER BY o_orderkey
    """,
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") % 100 == 7)
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .select("o_orderkey", "o_orderstatus", "c_name", "n_name")
        .orderBy("o_orderkey")
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
           CAST(round(sum(CAST(coalesce(o_totalprice, 0) AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join keeps order-less customers (count = 0, spend = 0)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum(dec(F.coalesce(F.col("o_totalprice"), F.lit(0))), "total_spend"),
        )
        .orderBy("c_custkey")
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT n_nationkey, n_name, c_custkey
    FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey
    WHERE n_nationkey < 5
    ORDER BY n_nationkey, c_custkey NULLS FIRST
    """,
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["nation"].filter(F.col("n_nationkey") < 5), F.col("c_nationkey") == F.col("n_nationkey"), "right")
        .select("n_nationkey", "n_name", "c_custkey")
        .orderBy(F.col("n_nationkey"), F.col("c_custkey").asc_nulls_first())
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(cn.k, sn.k) AS nationkey, n_cust, n_supp
    FROM cn FULL JOIN sn ON cn.k = sn.k
    ORDER BY nationkey
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates — nulls on either side."""
    t = load_tables(spark, sf_dir)
    cn = t["customer"].groupBy(F.col("c_nationkey").alias("ck")).agg(F.count("*").alias("n_cust"))
    sn = t["supplier"].groupBy(F.col("s_nationkey").alias("sk")).agg(F.count("*").alias("n_supp"))
    return (
        cn.join(sn, cn.ck == sn.sk, "full")
        .select(F.coalesce("ck", "sk").alias("nationkey"), "n_cust", "n_supp")
        .orderBy("nationkey")
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
    tags=("join",),
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi = EXISTS: customers with ≥1 urgent order."""
    t = load_tables(spark, sf_dir)
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 150000)
    ORDER BY c_custkey
    """,
    tags=("join",),
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti = NOT EXISTS: customers with no large order."""
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 150000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, s.o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    ORDER BY r_name, o_orderstatus
    """,
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian of two tiny sides (the only sane cross-join shape)."""
    t = load_tables(spark, sf_dir)
    statuses = t["orders"].select("o_orderstatus").distinct()
    return t["region"].crossJoin(statuses).select("r_name", "o_orderstatus").orderBy("r_name", "o_orderstatus")


@query(
    "join_range_nonequi",
    oracle="""
    SELECT band, count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS band_total
    FROM orders
    JOIN (VALUES ('small', 0.0, 100000.0), ('mid', 100000.0, 200000.0), ('big', 200000.0, 1000000000.0))
         AS bands(band, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    ORDER BY band
    """,
    tags=("join", "nonequi"),
)
def join_range_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join against a tiny band table: the non-equi condition
    forces broadcast-nested-loop — correct only because the broadcast
    side is 3 rows. (At scale, banding is better done with a CASE
    expression or bucketized equi-join; this query exists to pin BNLJ
    semantics.)"""
    t = load_tables(spark, sf_dir)
    bands = spark.createDataFrame(
        [("small", 0.0, 100000.0), ("mid", 100000.0, 200000.0), ("big", 200000.0, 1000000000.0)],
        "band string, lo double, hi double",
    )
    return (
        t["orders"]
        .join(bands, (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")))
        .groupBy("band")
        .agg(F.count("*").alias("n_orders"), dsum(dec("o_totalprice"), "band_total"))
        .orderBy("band")
    )


@query(
    "join_broadcast_hint",
    oracle="""
    SELECT p_brand,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS brand_revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    tags=("join", "plan"),
)
def join_broadcast_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast() hint — the plan test asserts the physical
    plan contains BroadcastHashJoin with no shuffle of lineitem."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(dsum(dec("l_extendedprice"), "brand_revenue"), F.count("*").alias("n_items"))
        .orderBy("p_brand")
    )


@query(
    "join_asof",
    oracle="""
    WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
               FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           CAST(round(c.value, 4) AS DOUBLE) AS click_value
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
    ORDER BY p.event_id
    """,
    tags=("join", "asof"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (nearest prior event per key), which Spark lacks
    natively. Recipe: union both sides tagged, then
    last(value, ignorenulls) over (partition by key order by ts, side)
    carries the latest click forward onto each purchase row; ties at
    equal ts sort the click first, giving <= semantics — matching
    DuckDB's ASOF LEFT JOIN oracle.

    Scale: one shuffle on user_id + a window sort, no row explosion —
    same cost class as any windowed aggregation on the fact stream.
    """
    from pyspark.sql import Window as W

    events = load_tables(spark, sf_dir)["events"]
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_p"), F.lit(None).cast("double").alias("c_value"),
        F.lit(None).cast("timestamp").alias("c_ts"), F.col("event_id").alias("tie_id"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"), "user_id", "ts", F.lit(0).alias("is_p"),
        F.col("value").alias("c_value"), F.col("ts").alias("c_ts"), F.col("event_id").alias("tie_id"),
    )
    # tie_id makes the window order TOTAL: multiple clicks sharing a
    # (user_id, ts) would otherwise make last(...) partition-dependent.
    # (Cross-engine tie preference is undefined for ASOF JOIN too; the
    # fixture has no same-ts clicks, but OUR output must be stable.)
    w = W.partitionBy("user_id").orderBy("ts", "is_p", "tie_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    merged = (
        purchases.unionByName(clicks)
        .withColumn("last_click_value", F.last("c_value", ignorenulls=True).over(w))
        .withColumn("last_click_ts", F.last("c_ts", ignorenulls=True).over(w))
    )
    return (
        merged.filter(F.col("is_p") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.date_format("last_click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            F.round("last_click_value", 4).cast("double").alias("click_value"),
        )
        .orderBy("event_id")
    )


@query(
    "join_asof_forward",
    oracle="""
    WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
               FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS next_click_ts,
           CAST(round(c.value, 4) AS DOUBLE) AS next_click_value
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts >= p.ts
    ORDER BY p.event_id
    """,
    tags=("join", "asof"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (nearest NEXT event per key — pandas
    merge_asof direction='forward'): the mirror of ``join_asof``'s
    recipe with the window reflected — first(value, ignorenulls) over
    (current row → unbounded FOLLOWING), ordering (ts, is_p DESC) so
    a click at the same instant sorts after its purchase and lands in
    the frame, giving >= semantics — matching DuckDB's forward ASOF
    (c.ts >= p.ts). Same single-shuffle + window cost as backward."""
    from pyspark.sql import Window as W

    events = load_tables(spark, sf_dir)["events"]
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_p"),
        F.lit(None).cast("double").alias("c_value"),
        F.lit(None).cast("timestamp").alias("c_ts"),
        F.col("event_id").alias("tie_id"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"), "user_id", "ts",
        F.lit(0).alias("is_p"),
        F.col("value").alias("c_value"), F.col("ts").alias("c_ts"),
        F.col("event_id").alias("tie_id"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.desc("is_p"), "tie_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    merged = (
        purchases.unionByName(clicks)
        .withColumn("next_click_value", F.first("c_value", ignorenulls=True).over(w))
        .withColumn("next_click_ts", F.first("c_ts", ignorenulls=True).over(w))
    )
    return (
        merged.filter(F.col("is_p") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.date_format("next_click_ts", "yyyy-MM-dd HH:mm:ss").alias("next_click_ts"),
            F.round("next_click_value", 4).cast("double").alias("next_click_value"),
        )
        .orderBy("event_id")
    )


@query(
    "join_shuffle_fact_fact",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_items,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                          (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "shuffle", "smj"),
)
def join_shuffle_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-⋈-fact: lineitem joins orders with a SHUFFLE_MERGE hint —
    the plan shape every big-big join takes at 100 TB, where neither
    side fits a broadcast. Both sides exchange on the join key, sort,
    and merge; AQE coalesces post-shuffle partitions and splits skewed
    ones at runtime (skew handling pinned by the plan test). The hint
    matters at bench scale because orders at sf<=0.1 would otherwise
    duck under the broadcast threshold and measure the wrong plan."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount")
    o = t["orders"].filter(F.col("o_orderdate") >= "1996-01-01").select(
        "o_orderkey", "o_orderpriority"
    )
    return (
        li.join(o.hint("SHUFFLE_MERGE"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), "revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "join_asof_tolerance",
    oracle="""
    WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
               FROM events WHERE event_type = 'click'),
         m AS (
           SELECT p.event_id, p.user_id, p.ts AS pts, c.ts AS cts, c.value AS cval
           FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
         )
    SELECT event_id, user_id,
           strftime(pts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           CASE WHEN cts >= pts - INTERVAL 30 MINUTE
                THEN strftime(cts, '%Y-%m-%d %H:%M:%S') END AS click_ts,
           CASE WHEN cts >= pts - INTERVAL 30 MINUTE
                THEN CAST(round(cval, 4) AS DOUBLE) END AS click_value,
           COALESCE(cts >= pts - INTERVAL 30 MINUTE, FALSE) AS within_tolerance
    FROM m
    ORDER BY event_id
    """,
    tags=("join", "asof", "tolerance"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a bounded lookback (pandas merge_asof's
    ``tolerance``, kdb wj-style): the nearest prior click counts only
    if it happened within 30 minutes of the purchase; staler state is
    reported as NO match (attribution windows, sensor staleness
    cutoffs). Same single-shuffle window recipe as ``join_asof`` —
    the tolerance is applied AFTER the carry-forward (if the nearest
    prior is too old, every prior is), so it adds zero shuffles; the
    DuckDB oracle mirrors with ASOF LEFT JOIN + the same cutoff
    predicate."""
    from pyspark.sql import Window as W

    events = load_tables(spark, sf_dir)["events"]
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_p"), F.lit(None).cast("double").alias("c_value"),
        F.lit(None).cast("timestamp").alias("c_ts"), F.col("event_id").alias("tie_id"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"), "user_id", "ts", F.lit(0).alias("is_p"),
        F.col("value").alias("c_value"), F.col("ts").alias("c_ts"), F.col("event_id").alias("tie_id"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "is_p", "tie_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    in_tol = F.col("last_click_ts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES")
    merged = (
        purchases.unionByName(clicks)
        .withColumn("last_click_value", F.last("c_value", ignorenulls=True).over(w))
        .withColumn("last_click_ts", F.last("c_ts", ignorenulls=True).over(w))
    )
    return (
        merged.filter(F.col("is_p") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.when(in_tol, F.date_format("last_click_ts", "yyyy-MM-dd HH:mm:ss")).alias("click_ts"),
            F.when(in_tol, F.round("last_click_value", 4).cast("double")).alias("click_value"),
            F.coalesce(in_tol, F.lit(False)).alias("within_tolerance"),
        )
        .orderBy("event_id")
    )
