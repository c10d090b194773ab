"""Batch twin, wave 2: CDC latest-per-key materialization.

``streaming_cdc_latest_batch`` — the compaction every change-data
stream needs: given an append stream of keyed updates, materialize
the LATEST row per key (by event time, with a deterministic
tiebreak). This is the batch definition of what the live
``ParquetUpsertSink`` (streaming/engine.py) maintains incrementally
via foreachBatch merge — stream ≡ batch ≡ oracle, same closure the
other twins in batch_equiv.py pin.

Semantics note: ``dropDuplicates`` (streaming_dedup_batch) keeps an
ARBITRARY/first row per key — correct for idempotent replay
suppression; CDC upsert must keep the LAST by event time, which
needs the row_number-over-(ts DESC) formulation here (or max_by on a
unique ordering). The tiebreak on event_id pins same-timestamp
updates deterministically on both engines.

Scale: one shuffle on the key; the window partitions by key (never
global). At 100 TB this is the classic high-cardinality window —
AQE handles moderate skew; a pathological hot key (celebrity row
updated millions of times) wants a pre-aggregation with max_by
partials, which is algebraically identical because (ts, event_id)
ordering is total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_CDC_ORACLE = """
    WITH ranked AS (
        SELECT user_id, event_id, event_type, value, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id, event_id AS latest_event_id, event_type AS latest_type,
           CAST(round(value, 2) AS DOUBLE) AS latest_value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS latest_ts
    FROM ranked WHERE rn = 1 ORDER BY user_id
"""


@query("streaming_cdc_latest_batch", oracle=_CDC_ORACLE, tags=("streaming", "cdc"))
def streaming_cdc_latest_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-per-key CDC compaction: row_number over (ts DESC,
    event_id DESC) — the batch contract the upsert sink maintains."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("event_type").alias("latest_type"),
            F.round("value", 2).alias("latest_value"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("latest_ts"),
        )
        .orderBy("user_id")
    )


_CHAINED_ORACLE = """
    WITH q AS (
        SELECT user_id,
               to_timestamp(epoch_us(ts) // 900000000 * 900) AS w15,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS q_cents
        FROM events GROUP BY 1, 2)
    SELECT strftime(to_timestamp(epoch_us(w15) // 3600000000 * 3600),
                    '%Y-%m-%d %H:%M:%S') AS hour,
           user_id,
           CAST(count(*) AS BIGINT) AS n_quarters,
           CAST(sum(q_cents) AS BIGINT) AS total_cents
    FROM q GROUP BY 1, 2
    ORDER BY hour, user_id
"""


@query("streaming_chained_windows_batch", oracle=_CHAINED_ORACLE, tags=("streaming", "chained"))
def streaming_chained_windows_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of CHAINED windowed aggregations (two stateful
    operators in one streaming query, Spark 3.5+/4): 15-min tumbling
    cents per user re-windowed — via ``window_time()`` — into hourly
    (n_quarters, total_cents). The live append-mode equivalence (one
    checkpoint, one watermark lineage through both states) is pinned
    by tests/test_streaming2.py with THIS exact plan as its batch
    reference; the oracle reproduces both window levels with epoch
    bucket arithmetic. Scale: two shuffles — (window, user) then
    (hour, user) — each map-side combinable; the second operates on
    the already-reduced quarter series."""
    from flume_source_spark.tables import load_tables

    events = load_tables(spark, sf_dir)["events"]
    quarter = events.groupBy(
        F.window("ts", "15 minutes").alias("w15"), "user_id"
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("q_cents"))
    return (
        quarter.groupBy(
            F.window(F.window_time("w15"), "1 hour").alias("w60"), "user_id"
        )
        .agg(
            F.count("*").alias("n_quarters"),
            F.sum("q_cents").alias("total_cents"),
        )
        .select(
            F.date_format(F.col("w60.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "user_id",
            "n_quarters",
            "total_cents",
        )
        .orderBy("hour", "user_id")
    )
