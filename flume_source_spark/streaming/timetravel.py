"""Time travel over the streaming upsert target as a USER-FACING
query (the API itself is live-tested in tests/test_streaming.py; this
registry entry makes the snapshot semantics oracle-checkable).

``upsert_time_travel`` — builds a keyed upsert target from three
deterministic 'epochs' of the events table (epoch k = event_id%3==k,
key = user_id, order = (ts, event_id) packed into a STRUCT column so
the sink's single-order-column contract still gets a TOTAL order —
without it, same-timestamp updates would merge engine-arbitrarily),
then reads every committed generation via
``ParquetUpsertSink.read_generation(as_of_epoch=g)`` and reports the
snapshot-diff sequence: keys present, keys added vs the previous
snapshot, keys whose latest row CHANGED vs the previous snapshot.

The oracle never sees the sink: it recomputes each snapshot from
first principles — latest-per-key over the CUMULATIVE event subset
event_id%3 ≤ g — which is equal to the sink's sequential
merge-latest because latest-by-total-order is associative
(merge(latest(A), B) = latest(A ∪ B)). The hash gate therefore pins
the sink's MERGE semantics, its epoch ordering, and the time-travel
read path in one query.

Scale: each generation is a full keyed snapshot (the sink's
documented dimension-table trade-off); the diff joins are
key-partitioned equi-joins on snapshots, never on the raw stream.
The builder wipes its workdir slot first so reruns are
deterministic (the commit log would otherwise accumulate).
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.streaming.engine import ParquetUpsertSink
from flume_source_spark.tables import load_tables
from flume_source_spark.workdir import slot as _slot

_TT_ORACLE = """
    WITH ranked AS (
        SELECT g.e AS epoch, user_id, event_id,
               row_number() OVER (PARTITION BY g.e, user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events, (SELECT unnest(generate_series(0, 2)) AS e) AS g
        WHERE event_id % 3 <= g.e
    ),
    snap AS (
        SELECT epoch, user_id, event_id AS latest_event_id
        FROM ranked WHERE rn = 1
    ),
    diff AS (
        SELECT c.epoch,
               count(*) AS n_keys,
               count_if(p.user_id IS NULL) AS n_added,
               count_if(p.user_id IS NOT NULL
                        AND p.latest_event_id <> c.latest_event_id) AS n_changed
        FROM snap c LEFT JOIN snap p
          ON p.epoch = c.epoch - 1 AND p.user_id = c.user_id
        GROUP BY c.epoch
    )
    SELECT CAST(epoch AS INT) AS epoch,
           CAST(n_keys AS BIGINT) AS n_keys,
           CAST(n_added AS BIGINT) AS n_added,
           CAST(n_changed AS BIGINT) AS n_changed
    FROM diff ORDER BY epoch
"""


@query("upsert_time_travel", oracle=_TT_ORACLE, tags=("streaming", "cdc", "timetravel"))
def upsert_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three deterministic upsert epochs → per-snapshot key counts and
    added/changed diffs via the time-travel read path; oracle
    recomputes every snapshot from the raw events."""
    ev = load_tables(spark, sf_dir)["events"]
    path = _slot(sf_dir, "upsert_time_travel")
    shutil.rmtree(path, ignore_errors=True)
    sink = ParquetUpsertSink(path, key="user_id", order_col="__ord")
    for k in range(3):
        batch = ev.filter(F.col("event_id") % 3 == k).select(
            "user_id",
            "event_id",
            F.struct("ts", "event_id").alias("__ord"),
        )
        sink(batch, epoch_id=k)
    snaps = []
    for g in range(3):
        s = sink.read_generation(spark, as_of_epoch=g).select(
            F.lit(g).alias("epoch"),
            "user_id",
            F.col("event_id").alias("latest_event_id"),
        )
        snaps.append(s)
    snap = snaps[0].unionByName(snaps[1]).unionByName(snaps[2])
    prev = snap.select(
        (F.col("epoch") + 1).alias("epoch"),
        F.col("user_id").alias("p_user"),
        F.col("latest_event_id").alias("p_latest"),
    )
    return (
        snap.join(
            prev,
            (snap["epoch"] == prev["epoch"]) & (snap["user_id"] == prev["p_user"]),
            "left",
        )
        .groupBy(snap["epoch"])
        .agg(
            F.count("*").cast("long").alias("n_keys"),
            F.count_if(F.col("p_user").isNull()).cast("long").alias("n_added"),
            F.count_if(
                F.col("p_user").isNotNull()
                & (F.col("p_latest") != F.col("latest_event_id"))
            )
            .cast("long")
            .alias("n_changed"),
        )
        .select(F.col("epoch").cast("int").alias("epoch"), "n_keys", "n_added", "n_changed")
        .orderBy("epoch")
    )
