"""Join wave 2: nearest-direction as-of join.

``join_asof_nearest`` — pandas ``merge_asof(direction='nearest')``:
match each purchase to the click closest in time in EITHER direction
(the backward/forward variants in operators/joins.py each look one
way). Spark has no native as-of; the recipe composes the two
window-carry passes the directional variants already use — one
backward carry (last click ≤ t) and one forward carry (first click
≥ t) over the SAME tagged union, then an executor-local arbitration:
pick whichever candidate is nearer in absolute time, ties preferring
the BACKWARD match (deterministic, and the common attribution
convention: past evidence beats future evidence at equal distance).

Distances are compared in exact integer MICROSECONDS
(``unix_micros`` / DuckDB ``epoch_us``) — never float seconds, so the
tie rule is exact cross-engine.

Scale: still ONE shuffle on the key + two window passes over the same
sort order (Catalyst reuses the sort — both frames share
partition/order spec), no row explosion. The oracle composes DuckDB's
native backward and forward ASOF JOINs with the same arbitration
CASE, an independent formulation of 'nearest'.

Reference shape: pandas.merge_asof (public API semantics); kdb+ aj
is the backward special case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_NEAREST_ORACLE = """
    WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
               FROM events WHERE event_type = 'click'),
         back AS (
           SELECT p.event_id, p.user_id, p.ts AS pts, c.ts AS bts, c.value AS bval
           FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts),
         fwd AS (
           SELECT p.event_id, c.ts AS fts, c.value AS fval
           FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts >= p.ts),
         m AS (
           SELECT b.event_id, b.user_id, b.pts, b.bts, b.bval, f.fts, f.fval,
                  CASE
                    WHEN b.bts IS NULL AND f.fts IS NULL THEN NULL
                    WHEN f.fts IS NULL THEN 'backward'
                    WHEN b.bts IS NULL THEN 'forward'
                    WHEN epoch_us(b.pts) - epoch_us(b.bts)
                         <= epoch_us(f.fts) - epoch_us(b.pts) THEN 'backward'
                    ELSE 'forward'
                  END AS direction
           FROM back b JOIN fwd f USING (event_id))
    SELECT event_id, user_id,
           strftime(pts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           CASE direction WHEN 'backward' THEN strftime(bts, '%Y-%m-%d %H:%M:%S')
                          WHEN 'forward' THEN strftime(fts, '%Y-%m-%d %H:%M:%S') END
               AS click_ts,
           CAST(round(CASE direction WHEN 'backward' THEN bval
                                     WHEN 'forward' THEN fval END, 4) AS DOUBLE)
               AS click_value,
           direction
    FROM m
    ORDER BY event_id
"""


@query("join_asof_nearest", oracle=_NEAREST_ORACLE, tags=("join", "asof"))
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: per purchase, the click minimizing absolute
    time distance (tie → backward), via one backward + one forward
    window carry over a single tagged union."""
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
    # Backward frame: clicks at the same instant sort BEFORE the
    # purchase (is_p ascending) → included, matching c.ts <= p.ts.
    wb = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_p", "tie_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # Forward frame: same-instant clicks sort AFTER (is_p descending)
    # → included, matching c.ts >= p.ts.
    wf = (
        W.partitionBy("user_id")
        .orderBy("ts", F.desc("is_p"), "tie_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    merged = (
        purchases.unionByName(clicks)
        .withColumn("b_value", F.last("c_value", ignorenulls=True).over(wb))
        .withColumn("b_ts", F.last("c_ts", ignorenulls=True).over(wb))
        .withColumn("f_value", F.first("c_value", ignorenulls=True).over(wf))
        .withColumn("f_ts", F.first("c_ts", ignorenulls=True).over(wf))
    )
    bdist = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("b_ts"))
    fdist = F.unix_micros(F.col("f_ts")) - F.unix_micros(F.col("ts"))
    direction = (
        F.when(F.col("b_ts").isNull() & F.col("f_ts").isNull(), F.lit(None).cast("string"))
        .when(F.col("f_ts").isNull(), F.lit("backward"))
        .when(F.col("b_ts").isNull(), F.lit("forward"))
        .when(bdist <= fdist, F.lit("backward"))
        .otherwise(F.lit("forward"))
    )
    return (
        merged.filter(F.col("is_p") == 1)
        .withColumn("direction", direction)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.when(F.col("direction") == "backward", F.date_format("b_ts", "yyyy-MM-dd HH:mm:ss"))
            .when(F.col("direction") == "forward", F.date_format("f_ts", "yyyy-MM-dd HH:mm:ss"))
            .alias("click_ts"),
            F.round(
                F.when(F.col("direction") == "backward", F.col("b_value"))
                .when(F.col("direction") == "forward", F.col("f_value")),
                4,
            )
            .cast("double")
            .alias("click_value"),
            "direction",
        )
        .orderBy("event_id")
    )


_INTERVAL_ORACLE = """
    WITH iv AS (
        SELECT o_orderkey AS k, o_custkey AS c,
               o_orderdate AS s,
               o_orderdate + to_days(CAST(o_orderkey % 14 AS INT)) AS e
        FROM orders),
    pairs AS (
        SELECT a.c AS custkey, a.k AS i, b.k AS j,
               greatest(a.s, b.s) AS ov_start,
               least(a.e, b.e) AS ov_end
        FROM iv a JOIN iv b
          ON a.c = b.c AND a.k < b.k
         AND a.s <= b.e AND b.s <= a.e)
    SELECT custkey, i, j,
           strftime(ov_start, '%Y-%m-%d') AS overlap_start,
           strftime(ov_end, '%Y-%m-%d') AS overlap_end,
           CAST(date_diff('day', ov_start, ov_end) + 1 AS BIGINT) AS overlap_days
    FROM pairs
    ORDER BY custkey, i, j
"""


@query("join_interval_overlap", oracle=_INTERVAL_ORACLE, tags=("join", "interval"))
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join — the temporal member of the
    non-equi-join family (range: join_range_nonequi, spatial:
    geo_grid_join, temporal: this): per customer, every pair of that
    customer's order validity windows [o_orderdate, +k·days] that
    overlap, with the intersection extent. The join is an EQUI-join
    on the blocking key (custkey) with the overlap predicate
    (a.s ≤ b.e AND b.s ≤ a.e) applied INSIDE bounded per-key groups —
    never a cartesian (plan-pinned via the family's no-cartesian
    tests); with no natural key the blocking falls back to time
    buckets sized to max interval length, exactly geo_grid_join's
    cell construction on the time axis. Interval ends are derived
    deterministically from the key (the fixture has single-date
    orders), all arithmetic in whole days — tie-free."""
    o = load_tables(spark, sf_dir)["orders"]
    iv = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("c"),
        F.to_date("o_orderdate").alias("s"),
        F.date_add(
            F.to_date("o_orderdate"), (F.col("o_orderkey") % 14).cast("int")
        ).alias("e"),
    )
    a = iv.select(F.col("c").alias("custkey"), F.col("k").alias("i"),
                  F.col("s").alias("si"), F.col("e").alias("ei"))
    b = iv.select(F.col("c").alias("custkey"), F.col("k").alias("j"),
                  F.col("s").alias("sj"), F.col("e").alias("ej"))
    pairs = a.join(b, "custkey").where(
        (F.col("i") < F.col("j"))
        & (F.col("si") <= F.col("ej"))
        & (F.col("sj") <= F.col("ei"))
    )
    ov_s = F.greatest("si", "sj")
    ov_e = F.least("ei", "ej")
    return pairs.select(
        "custkey", "i", "j",
        F.date_format(ov_s, "yyyy-MM-dd").alias("overlap_start"),
        F.date_format(ov_e, "yyyy-MM-dd").alias("overlap_end"),
        (F.datediff(ov_e, ov_s) + 1).cast("long").alias("overlap_days"),
    ).orderBy("custkey", "i", "j")
