"""Aggregation wave 2: the selector/bitwise/boolean aggregate surface.

- ``agg_wave2`` — per-order-status rollup exercising ``median``,
  ``max_by`` (selector aggregate; its ordering value is verified
  unique at every fixture SF, so the result is deterministic — with a
  non-unique key max_by is engine-arbitrary, the same tie trap that
  rules out raw ``mode()`` below), ``count_if``, ``bit_xor``
  (order-independent by associativity+commutativity — safe under any
  partitioning), and ``bool_and``/``bool_or``.
- The "mode" column is the DETERMINISTIC mode: count + row_number
  with an explicit (count DESC, value ASC) tiebreak, because the
  built-in ``mode()`` returns an arbitrary element among tied maxima
  in BOTH engines (the fixture has a real tie at sf0.001:
  orderstatus 'P' × two priorities) — a cross-engine hash gate can
  never legally contain it. The two-level count+window IS the
  scalable mode anyway: partial counts combine map-side, the window
  partitions by the (bounded) group key.

Scale: one partial+final hash aggregation over orders plus one
count+window pass for the mode join — both shuffle only on
``o_orderstatus`` (3 groups; at 100 TB a low-cardinality group key
means partial aggregation does nearly all the work map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_AGG_WAVE2_ORACLE = """
    WITH m AS (
        SELECT o_orderstatus, o_orderpriority,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY count(*) DESC, o_orderpriority) AS rn
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    ),
    a AS (
        SELECT o_orderstatus,
               count(*) AS n_orders,
               CAST(round(median(o_totalprice), 2) AS DOUBLE) AS median_price,
               arg_max(o_custkey, o_totalprice) AS top_cust,
               CAST(round(max(o_totalprice), 2) AS DOUBLE) AS max_price,
               CAST(count_if(o_orderpriority LIKE '1-%') AS BIGINT) AS n_urgent,
               bit_xor(o_orderkey) AS key_xor,
               bool_and(o_totalprice > 0) AS all_positive,
               bool_or(o_totalprice > 400000) AS any_jumbo
        FROM orders GROUP BY o_orderstatus
    )
    SELECT a.*, m.o_orderpriority AS mode_priority
    FROM a JOIN m ON a.o_orderstatus = m.o_orderstatus AND m.rn = 1
    ORDER BY a.o_orderstatus
"""


@query("agg_wave2", oracle=_AGG_WAVE2_ORACLE, tags=("agg",))
def agg_wave2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selector / bitwise / boolean aggregates per order status, plus
    a deterministic mode via count + row_number (see module doc for
    why built-in mode() is banned from hash-compared output)."""
    o = load_tables(spark, sf_dir)["orders"]
    a = o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.median("o_totalprice"), 2).cast("double").alias("median_price"),
        F.max_by("o_custkey", "o_totalprice").alias("top_cust"),
        F.round(F.max("o_totalprice"), 2).cast("double").alias("max_price"),
        F.count_if(F.col("o_orderpriority").like("1-%")).alias("n_urgent"),
        F.bit_xor("o_orderkey").alias("key_xor"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_jumbo"),
    )
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("cnt"), F.asc("o_orderpriority"))
    m = (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"))
    )
    return a.join(m, "o_orderstatus").orderBy("o_orderstatus")


_INCR_ORACLE = """
    WITH full_agg AS (
        SELECT o_orderstatus, count(*) AS n,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total,
               CAST(round(max(o_totalprice), 2) AS DOUBLE) AS max_price
        FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, n, total, max_price FROM full_agg ORDER BY o_orderstatus
"""


@query("agg_incremental_merge", oracle=_INCR_ORACLE, tags=("agg", "incremental"))
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the 'history' partition (90 %
    of orders) is pre-aggregated once, the 'delta' (10 %) aggregates
    separately, and the published result MERGES THE PARTIALS (sum of
    counts/sums, max of maxes) — never rescanning history. The oracle
    recomputes from scratch over everything, so what's verified is the
    algebraic identity merge(partial(A), partial(B)) == full(A ∪ B):
    the property that makes count/sum/min/max (and sketches — see
    ``agg_sketch_mergeable``) incrementally maintainable at 100 TB,
    and AVG maintainable as (sum, count). Decimal sums keep the merge
    exact under any partitioning."""
    o = load_tables(spark, sf_dir)["orders"]
    hist = o.filter(F.col("o_orderkey") % 10 != 0)
    delta = o.filter(F.col("o_orderkey") % 10 == 0)

    def partial(df):
        return df.groupBy("o_orderstatus").agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("total_dec"),
            F.max("o_totalprice").alias("mx"),
        )

    merged = (
        partial(hist).unionByName(partial(delta))
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("total_dec"), 2).cast("double").alias("total"),
            F.round(F.max("mx"), 2).cast("double").alias("max_price"),
        )
    )
    return merged.orderBy("o_orderstatus")


_HEAVY_HITTERS_ORACLE = """
    WITH c AS (
        SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS cnt
        FROM orders GROUP BY 1, 2
    ),
    per AS (
        SELECT o_orderstatus, o_orderpriority, cnt,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY cnt DESC, o_orderpriority) AS rn
        FROM c
    ),
    g AS (
        SELECT o_orderpriority, CAST(sum(cnt) AS BIGINT) AS cnt FROM c GROUP BY 1
    ),
    gr AS (
        SELECT 'ALL' AS o_orderstatus, o_orderpriority, cnt,
               row_number() OVER (ORDER BY cnt DESC, o_orderpriority) AS rn
        FROM g
    )
    SELECT o_orderstatus, o_orderpriority, cnt, CAST(rn AS BIGINT) AS rn
    FROM (SELECT * FROM per WHERE rn <= 3 UNION ALL SELECT * FROM gr WHERE rn <= 3)
    ORDER BY o_orderstatus, rn
"""


@query("agg_heavy_hitters", oracle=_HEAVY_HITTERS_ORACLE, tags=("agg", "sketch", "approx"))
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via Spark 4.1's ApproxTopK sketch family — the
    frequent-items surface (Misra-Gries-class) next to HLL
    (``agg_sketch_mergeable``): per-group top-3 order priorities from
    ``approx_top_k``, plus a global 'ALL' row computed by MERGING the
    per-group sketches (``approx_top_k_accumulate`` →
    ``approx_top_k_combine`` → ``approx_top_k_estimate``) — history
    partials re-aggregated without rescanning, the same mergeability
    contract the HLL query pins.

    Hash-checkable against an EXACT oracle because maxItemsTracked
    (10000) far exceeds the 5 distinct priorities, where the sketch
    counts are exact by construction; ties are re-ranked
    deterministically ((cnt DESC, item ASC) row_number) since the
    sketch's own array order ranks ties arbitrarily. At 100 TB the
    sketch is what survives: per-partition state is
    O(maxItemsTracked), partials merge associatively, and the
    estimate never needs the raw value distribution."""
    o = load_tables(spark, sf_dir)["orders"]
    per_sketch = o.groupBy("o_orderstatus").agg(
        F.expr("approx_top_k_accumulate(o_orderpriority, 10000)").alias("sk")
    )
    per = (
        per_sketch.select(
            "o_orderstatus",
            F.explode(F.expr("approx_top_k_estimate(sk, 10000)")).alias("e"),
        )
        .select("o_orderstatus", F.col("e.item").alias("o_orderpriority"), F.col("e.count").alias("cnt"))
    )
    merged = (
        per_sketch.agg(F.expr("approx_top_k_combine(sk, 10000)").alias("sk"))
        .select(F.explode(F.expr("approx_top_k_estimate(sk, 10000)")).alias("e"))
        .select(F.lit("ALL").alias("o_orderstatus"), F.col("e.item").alias("o_orderpriority"), F.col("e.count").alias("cnt"))
    )
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("cnt").desc(), F.col("o_orderpriority"))
    return (
        per.unionByName(merged)
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_orderstatus", "o_orderpriority", F.col("cnt").cast("long").alias("cnt"), "rn")
        .orderBy("o_orderstatus", "rn")
    )
