"""Test-table loading + view registration.

The driver's deterministic synthetic tables (TESTDATA.md) are the
engine's relational fixtures: a TPC-H-ish star schema plus ``events``
(streaming/JSON), ``documents`` (text/dedup) and ``embeddings``
(similarity search).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table from ``{sf_dir}/{name}.parquet``.

    Plain ``spark.read.parquet`` — columnar scan with predicate pushdown
    and column pruning; nothing is cached here (callers decide).
    """
    # events.parquet carries TIMESTAMP(NANOS), which Spark's parquet
    # reader rejects unless nanos are read as long. Set here (runtime
    # SQL conf) rather than only at session build so the engine works
    # with ANY caller-provided SparkSession (e.g. the driver's).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            # TIMESTAMP(NANOS) arrives as long (nanosAsLong); truncate to
            # micros exactly (integer div) — same truncation DuckDB applies
            # when casting its TIMESTAMP_NS down to TIMESTAMP.
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        out[name] = df
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view for ``spark.sql``."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
