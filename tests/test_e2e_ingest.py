"""End-to-end: the loop the engine exists for.

A watched directory receives raw event files; the ``filemeta`` source
detects them (rename-commit marks consumption, exactly the reference's
protocol applied post-durability); ``foreachBatch`` loads each new
file's CONTENT and appends it to a parquet table; analytics then run
over the ingested table. This is the reference's watch loop
(CephFsSource poll → event per file) extended through to the analytics
the metadata events were always for.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flume_source_spark.sources.filemeta import drain_directory

EVENT_CSV_SCHEMA = "event_id INT, user_id INT, event_type STRING, value DOUBLE"


def _write_csv(d: str, name: str, rows: list[tuple]) -> None:
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")


def _ingest_sink(table_dir: str):
    """foreachBatch: for each admitted file, load its rows and append
    to the parquet table. The filemeta row carries the path; content
    loading is a normal distributed spark.read over those paths."""

    def sink(batch_df, epoch_id):
        paths = [r.file_path for r in batch_df.select("file_path").collect()]
        if not paths:
            return
        spark = batch_df.sparkSession
        rows = spark.read.schema(EVENT_CSV_SCHEMA).csv(paths)
        rows.write.mode("append").parquet(table_dir)

    return sink


def test_watch_ingest_analyze_loop(spark, tmp_path):
    watched = str(tmp_path / "incoming")
    table = str(tmp_path / "events_table")
    os.makedirs(watched)

    _write_csv(watched, "day1.csv", [(1, 10, "view", 1.0), (2, 10, "click", 2.0)])
    _write_csv(watched, "day2.csv", [(3, 20, "view", 3.0)])

    drain_directory(spark, watched, _ingest_sink(table), commitMode="rename")

    # consumption is durably marked on the filesystem (reference protocol)
    assert sorted(os.listdir(watched)) == ["day1.csv.COMPLETED", "day2.csv.COMPLETED"]

    # analytics over the ingested table
    t = spark.read.parquet(table)
    counts = {r.event_type: r.n for r in t.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert counts == {"view": 2, "click": 1}

    # late arrival: only the NEW file is ingested on the next drain
    _write_csv(watched, "day3.csv", [(4, 10, "view", 4.0), (5, 30, "buy", 5.0)])
    drain_directory(spark, watched, _ingest_sink(table), commitMode="rename")

    t = spark.read.parquet(table)
    assert t.count() == 5  # no duplicates from day1/day2
    per_user = {
        r.user_id: r.total
        for r in t.groupBy("user_id").agg(F.round(F.sum("value"), 2).alias("total")).collect()
    }
    assert per_user == {10: 7.0, 20: 3.0, 30: 5.0}
