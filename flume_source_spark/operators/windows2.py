"""Window wave 2: time-RANGE frames.

``window_range_interval`` — per-user rolling 1-hour aggregates
evaluated AT EVERY EVENT: count and exact-decimal sum of ``value``
over the frame [t−3600 s, t]. This is the RANGE frame (frame
membership decided by ORDER-key distance), not a ROWS frame (fixed
row offsets) — the two differ precisely when events cluster
unevenly in time, which is the normal case. Spark's rangeBetween
needs a numeric order key, so event time is projected to epoch
seconds (``unix_ts``) on BOTH engines — also what makes the frames
byte-identical cross-engine (DuckDB RANGE over the same integer).

Scale: the window partitions by user_id (high cardinality → well
distributed, never a global sort); within a partition Spark keeps a
sliding frame buffer bounded by the hour span, not the partition
size. The sum is decimal-cast BEFORE aggregation (dec/dsum
convention, canon.py) so frame-order float noise can't reach the
compared digits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_RANGE_ORACLE = """
    WITH e AS (
        SELECT event_id, user_id,
               -- floor(), not CAST: epoch() keeps the micros fraction
               -- and BIGINT cast ROUNDS it, while Spark's
               -- unix_timestamp floors — off-by-one at .5+ fractions
               CAST(floor(epoch(ts)) AS BIGINT) AS unix_ts,
               CAST(value AS DECIMAL(18,4)) AS v
        FROM events
    )
    SELECT event_id, user_id, unix_ts,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           CAST(round(sum(v) OVER w, 2) AS DOUBLE) AS sum_1h
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY unix_ts
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
"""


@query("window_range_interval", oracle=_RANGE_ORACLE, tags=("window", "range"))
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour per-user aggregates via a RANGE frame on epoch
    seconds — value-distance framing, decimal-exact sums."""
    ev = load_tables(spark, sf_dir)["events"]
    e = ev.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("unix_ts"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("unix_ts")
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "unix_ts",
        F.count("*").over(w).cast("long").alias("n_1h"),
        F.round(F.sum("v").over(w), 2).cast("double").alias("sum_1h"),
    ).orderBy("event_id")
