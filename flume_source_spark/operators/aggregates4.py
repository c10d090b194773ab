"""Aggregation wave 4: a deterministic Count-Min sketch exact twin.

``agg_count_min_exact`` — the last classic mergeable sketch family
without a driver-hashable pin. The bitmap (agg_bitmap_distinct), HLL
merge algebra (agg_sketch_merge_exact / agg_sketch_intersect_exact)
and quantile histogram (agg_quantile_hist_exact) already have exact
twins; Count-Min is the point-FREQUENCY sketch (heavy-hitter serving,
stream frequency caps) and its build/probe shape is pinned here with
md5-derived hash rows so both engines compute the identical sketch
bit-for-bit (the same portability trick as the SimHash twins,
pipeline/dedup2.py: Spark ``conv(substring(md5(x),1,8),16,10)`` ≡
DuckDB ``CAST('0x'||substr(md5(x),1,8) AS BIGINT)``).

Shape (the part that must survive 100 TB):
- BUILD: each row expands to D=4 (hash-row, bucket) increments —
  a map-side explode followed by groupBy(j, b); partial aggregation
  collapses the 4× expansion to at most D×W = 256 cells per map task
  BEFORE the shuffle, so the exchange carries O(D·W) rows per task
  regardless of input size. The sketch is tiny and mergeable by cell
  addition (that is its point) — a 100 TB build shuffles kilobytes.
- PROBE: estimate(key) = min over the D cells the key hashes to.
  The D×W cell table broadcasts; probes never shuffle the corpus.
- GUARANTEE: est ≥ true always (counters only over-count on
  collisions); est ≤ true + εN with prob 1−δ for W = ⌈e/ε⌉, D =
  ⌈ln 1/δ⌉. The over-estimate NON-NEGATIVITY is asserted in-query
  (overestimate column) and property-tested.

W is deliberately small (64) against the suppkey space so the
fixture exercises collisions — tier-dependent: sf0.001 has 10 keys
(no collisions — the exact path), sf0.01 has 100 keys (49
over-estimate — the mixed regime the oracle hash-pins), sf0.1 has
1000 keys (every key collides — the saturated regime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_CM_D = 4  # hash rows (depth)
_CM_W = 64  # buckets per row (width)


def _bucket_spark(j, key):
    """md5-derived bucket — first 8 hex digits as an integer, mod W.
    Bit-identical to the oracle's CAST('0x'||substr(md5(..),1,8))."""
    s = F.concat_ws(":", j.cast("string"), key.cast("string"))
    return (F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % _CM_W).alias("b")


_CM_ORACLE = f"""
    WITH keys AS (SELECT CAST(l_suppkey AS BIGINT) AS key FROM lineitem),
    expanded AS (
        SELECT key, j
        FROM keys CROSS JOIN (SELECT unnest(generate_series(0, {_CM_D - 1})) AS j)
    ),
    cells AS (
        SELECT j,
               CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || CAST(key AS VARCHAR)), 1, 8))
                    AS BIGINT) % {_CM_W} AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM expanded GROUP BY 1, 2
    ),
    truth AS (SELECT key, CAST(count(*) AS BIGINT) AS true_cnt FROM keys GROUP BY key),
    probes AS (
        SELECT t.key, t.true_cnt, x.j,
               CAST(('0x' || substr(md5(CAST(x.j AS VARCHAR) || ':' || CAST(t.key AS VARCHAR)), 1, 8))
                    AS BIGINT) % {_CM_W} AS b
        FROM truth t CROSS JOIN (SELECT unnest(generate_series(0, {_CM_D - 1})) AS j) x
    )
    SELECT p.key, p.true_cnt,
           CAST(min(c.c) AS BIGINT) AS est_cnt,
           CAST(min(c.c) - p.true_cnt AS BIGINT) AS overestimate
    FROM probes p JOIN cells c ON p.j = c.j AND p.b = c.b
    GROUP BY p.key, p.true_cnt
    ORDER BY p.key
"""


@query("agg_count_min_exact", oracle=_CM_ORACLE, tags=("agg", "sketch", "exact-twin"))
def agg_count_min_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch build + point probes, md5-derived hash rows —
    the frequency-sketch twin completing the sketch-family pins. The
    D×W cell table is built with one map-side-combined groupBy and
    BROADCAST to the probe join; ``overestimate`` is provably ≥ 0."""
    li = load_tables(spark, sf_dir)["lineitem"].select(
        F.col("l_suppkey").cast("long").alias("key")
    )
    js = F.array(*[F.lit(j) for j in range(_CM_D)])
    expanded = li.select("key", F.explode(js).alias("j"))
    cells = expanded.groupBy(
        "j", _bucket_spark(F.col("j"), F.col("key"))
    ).agg(F.count("*").cast("long").alias("c"))
    truth = li.groupBy("key").agg(F.count("*").cast("long").alias("true_cnt"))
    probes = truth.select("key", "true_cnt", F.explode(js).alias("j")).withColumn(
        "b", _bucket_spark(F.col("j"), F.col("key"))
    )
    return (
        probes.join(F.broadcast(cells), ["j", "b"])
        .groupBy("key", "true_cnt")
        .agg(F.min("c").cast("long").alias("est_cnt"))
        .select(
            "key",
            "true_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("true_cnt")).cast("long").alias("overestimate"),
        )
        .orderBy("key")
    )
