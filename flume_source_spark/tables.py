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

# Per-(session, sf_dir) caches. The driver/oracle harness runs ~100
# registry queries against ONE reused session; without this every
# builder re-reads 10 parquet footers (schema discovery) and re-creates
# 10 temp views, which dominated per-query wall time in round 1.
# Key includes both id(spark) and the context's applicationId: id()
# alone could be reused after a stopped session is GC'd, but a restarted
# context always gets a fresh applicationId; two sessions sharing one
# context (newSession) get distinct id()s, so per-session temp-view
# state stays correct.
_TABLE_CACHE: dict[tuple[int, str, str], dict[str, DataFrame]] = {}
_VIEWS_DONE: set[tuple[int, str, str]] = set()
# Cached DataFrames pin their SparkSession, so an unbounded cache would
# leak every stopped/replaced session for the process lifetime (e.g. a
# harness that rebuilds sessions per sweep). Keep the most recent few
# (dict preserves insertion order); hits re-insert to refresh recency.
_CACHE_MAX = 4


def _cache_key(spark: SparkSession, sf_dir: str) -> tuple[int, str, str]:
    return (id(spark), spark.sparkContext.applicationId, sf_dir)


def _evict_lru() -> None:
    while len(_TABLE_CACHE) > _CACHE_MAX:
        oldest = next(iter(_TABLE_CACHE))
        del _TABLE_CACHE[oldest]
        _VIEWS_DONE.discard(oldest)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table from ``{sf_dir}/{name}.parquet``.

    Plain ``spark.read.parquet`` — columnar scan with predicate pushdown
    and column pruning; the returned DataFrames are lazy plans (nothing
    is persisted). Plans are memoized per (session, sf_dir) so repeated
    builder calls don't re-read parquet footers.
    """
    key = _cache_key(spark, sf_dir)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        _TABLE_CACHE[key] = _TABLE_CACHE.pop(key)  # refresh LRU recency
        return dict(cached)
    # events.parquet carries TIMESTAMP(NANOS), which Spark's parquet
    # reader rejects unless nanos are read as long. Set here (runtime
    # SQL conf) rather than only at session build so the engine works
    # with ANY caller-provided SparkSession (e.g. the driver's).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            # The fixture's ts physical type has varied across driver
            # rounds: TIMESTAMP(NANOS) (arrives as long under
            # nanosAsLong → truncate to micros, the same truncation
            # DuckDB applies casting TIMESTAMP_NS down) vs
            # TIMESTAMP(MICROS) (arrives as TIMESTAMP_NTZ → cast to
            # session-TZ timestamp; TZ is pinned UTC so wall-clock is
            # preserved and both shapes yield identical values).
            from pyspark.sql.types import LongType

            if isinstance(df.schema["ts"].dataType, LongType):
                df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
            else:
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        out[name] = df
    _TABLE_CACHE[key] = out
    _evict_lru()
    return dict(out)


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view for ``spark.sql``.

    View creation is idempotent and memoized per (session, sf_dir): a
    second call with the same pair is a dict copy, no catalog traffic.
    If the same session is pointed at a DIFFERENT sf_dir the views are
    re-registered (createOrReplaceTempView), and the memo key moves.
    """
    key = _cache_key(spark, sf_dir)
    tables = load_tables(spark, sf_dir)
    if key not in _VIEWS_DONE:
        for name, df in tables.items():
            df.createOrReplaceTempView(name)
        # Same session re-pointed at another sf_dir must re-register.
        _VIEWS_DONE.difference_update({k for k in _VIEWS_DONE if k[0] == key[0] and k[1] == key[1]})
        _VIEWS_DONE.add(key)
    return tables
