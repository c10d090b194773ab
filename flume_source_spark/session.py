"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[N]`` but every knob is chosen to also be
the right default on a large cluster: AQE for runtime re-planning
(partition coalescing, skew-join splitting), Arrow for any
Python-boundary crossing, UTC session time zone so results are
byte-comparable with the DuckDB oracle, and shuffle partitions sized to
the local core count (on a real cluster AQE coalesces the default up
or down from the initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "flume_source_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    If a SparkSession is already active (cluster deployment, driver
    harness, notebook), it is reused as-is with only the RUNTIME SQL
    confs layered on — its master/memory are never overridden.
    Otherwise a local session is built, honoring ``SPARK_GRAFT_CPUS``
    for parallelism (``master`` defaults to ``local[$SPARK_GRAFT_CPUS]``).
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        for k, v in {
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.session.timeZone": "UTC",
            "spark.sql.execution.arrow.pyspark.enabled": "true",
            **(extra_conf or {}),
        }.items():
            try:
                active.conf.set(k, v)
            except Exception:
                pass  # non-runtime conf on a live session — leave it
        return active
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Small dims (region/nation/supplier/part at test SFs) should
        # broadcast; 64 MB is a sane executor-memory-aware ceiling that
        # still holds with 8 GB executors on a real cluster.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.schemaInference", "false")
        # events.parquet carries TIMESTAMP(NANOS); Spark's reader has no
        # nanos timestamp type, so read as long and convert in tables.py.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
