"""Fourth (final) wave of TPC-H-shaped queries — with relational.py /
relational2.py / relational3.py this completes all 22 TPC-H query
SHAPES on the fixture schema. The fixture has no ``partsupp`` table
and no ``l_receiptdate``/``l_commitdate``, so the affected queries
keep their reference PLAN shape on the columns that exist:

- q02 shape: minimum-cost supplier — the correlated scalar-min
  subquery (agg once, join back on equality) over a 4-way dim chain
  (supplier⋈nation⋈region), ordered + limited output. "Supply cost"
  is derived from lineitem as each (part, supplier) pair's minimum
  observed unit price (min is order-independent and bit-exact, so
  the min-equality join back is oracle-safe without decimal bridges).
- q08 shape: national market share — CASE-sum numerator over a
  5-way join, per-year share of one supplier nation inside one
  customer region's market.
- q09 shape: product-type profit — LIKE-filtered parts, profit
  expression per line (p_retailprice standing in for supplycost),
  grouped by supplier nation × order year.
- q11 shape: important stock — per-part value HAVING > fraction of
  the global value, the uncorrelated-scalar-in-HAVING plan (one
  broadcast of a 1-row aggregate).
- q15 shape: top supplier — quarter revenue per supplier, scalar max
  over the aggregate, equality join back (view + max + join in the
  reference; here one reused aggregate).
- q16 shape: supplier count by part attributes — count(DISTINCT
  suppkey) per (brand, type, size) bucket with NOT-IN exclusion of
  flagged suppliers (negative balance standing in for the complaint
  comment scan).
- q20 shape: excess concentration — two aggregations of the same
  fact at different granularities with a correlated 0.5× threshold,
  collapsed to a semi-join feeding the supplier list.
- q21 shape: suppliers who kept orders waiting — the EXISTS /
  NOT-EXISTS pair over the same fact with different correlation,
  hand-decorrelated into ONE per-order aggregation (distinct-supplier
  and distinct-late-supplier counts) instead of three fact scans;
  "late" is l_shipdate > o_orderdate + 60 days standing in for
  receipt-after-commit.

Scale notes: every dim chain here (supplier⋈nation⋈region, the
filtered part lists, the 1-row scalars, q15's per-supplier and q20's
per-pair aggregates) is broadcast-sized and broadcast; the fact is
scanned once per query except q20's deliberate two-granularity pass,
and q21 touches lineitem once + orders once with the heavy EXISTS
logic folded into a single shuffle on l_orderkey — the decorrelated
plan you want at 100 TB, vs the reference's three correlated scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.canon import dec, dsum
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables


@query(
    "q02_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    regional AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
    ),
    offers AS (
        SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name, unit_cost
        FROM part JOIN cost ON p_partkey = l_partkey
                  JOIN regional ON s_suppkey = l_suppkey
        WHERE p_size <= 10 AND p_type = 'LARGE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, unit_cost
    FROM offers
    WHERE unit_cost = (SELECT min(unit_cost) FROM offers o2
                       WHERE o2.p_partkey = offers.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("flagship", "correlated-scalar", "dim-chain"),
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the regional supplier
    offering it at minimum cost. The correlated ``= (SELECT min ...)``
    decorrelates to: aggregate min per part over the filtered offers,
    broadcast it, equality-join back. min() over doubles is exact and
    order-independent, so the equality survives the oracle hash with
    no decimal bridge. The part filter and the region dim-chain both
    shrink to broadcast size before they touch lineitem's aggregate."""
    t = load_tables(spark, sf_dir)
    cost = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    regional = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = t["part"].filter((F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")).select("p_partkey")
    offers = (
        cost.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(regional), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name", "unit_cost")
    )
    min_cost = offers.groupBy(F.col("p_partkey").alias("mp")).agg(F.min("unit_cost").alias("mc"))
    return (
        offers.join(
            F.broadcast(min_cost),
            (F.col("mp") == F.col("p_partkey")) & (F.col("mc") == F.col("unit_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q08_market_share",
    oracle="""
    WITH flat AS (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(round(sum(CASE WHEN supp_nation = 'NATION_3' THEN CAST(volume AS DECIMAL(18,4)) ELSE 0 END), 2) AS DOUBLE) AS nation_volume,
           CAST(round(sum(CAST(volume AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_volume,
           CAST(round(sum(CASE WHEN supp_nation = 'NATION_3' THEN CAST(volume AS DECIMAL(18,4)) ELSE 0 END), 2) AS DOUBLE)
             / CAST(round(sum(CAST(volume AS DECIMAL(18,4))), 2) AS DOUBLE) AS mkt_share
    FROM flat
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("flagship", "conditional-agg", "dim-chain"),
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market for one
    part type, per year. The 7-table join keeps lineitem as the only
    fact-sized input — part is pre-filtered to the type, the customer
    side collapses through nation⋈region to a broadcast key set, and
    the share is a CASE-sum over ONE pass (no second scan for the
    denominator). Numerator and denominator are exact decimal sums
    rounded to 2 dp; the share divides those two identical doubles, so
    the quotient is bit-identical across engines."""
    t = load_tables(spark, sf_dir)
    amer_nations = (
        t["nation"]
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cnk"))
    )
    cust = t["customer"].join(F.broadcast(amer_nations), F.col("c_nationkey") == F.col("cnk")).select("c_custkey")
    o = (
        t["orders"]
        .filter((F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year("o_orderdate").cast("int").alias("o_year"))
    )
    p = t["part"].filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    nat_vol = F.round(F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0))), 2).cast("double")
    tot_vol = F.round(F.sum(vol), 2).cast("double")
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("o_year")
        .agg(
            nat_vol.alias("nation_volume"),
            tot_vol.alias("total_volume"),
            (nat_vol / tot_vol).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@query(
    "q09_product_type_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year DESC
    """,
    tags=("flagship", "dim-chain", "like-filter"),
)
def q09_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a product line by supplier nation and
    year. p_retailprice × quantity stands in for the missing
    ps_supplycost × quantity cost term. The LIKE-filtered part list
    broadcasts; orders joins on the fact's natural key; the profit
    expression is a single JVM-side decimal per line."""
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_name").like("%red%")).select("p_partkey", "p_retailprice")
    supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    profit = dec(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(t["orders"].select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(dsum(profit, "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH nat_li AS (
        SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,4)) AS v
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        WHERE s_nationkey = 7
    )
    SELECT l_partkey AS p_partkey,
           CAST(round(sum(v), 2) AS DOUBLE) AS part_value
    FROM nat_li
    GROUP BY l_partkey
    HAVING CAST(round(sum(v), 2) AS DOUBLE) >
           0.001 * (SELECT CAST(round(sum(v), 2) AS DOUBLE) FROM nat_li)
    ORDER BY part_value DESC, p_partkey
    """,
    tags=("flagship", "scalar-subquery", "having"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose value (here: lineitem revenue from
    one nation's suppliers, standing in for partsupp stock value)
    exceeds a fraction of the global value. The uncorrelated scalar in
    HAVING becomes a 1-row aggregate broadcast-crossed into the
    per-part aggregate — the per-part and global sums share one
    filtered scan. Both sides of the > are rounded decimal-sum
    doubles, so the cut is bit-identical across engines."""
    t = load_tables(spark, sf_dir)
    supp = t["supplier"].filter(F.col("s_nationkey") == 7).select("s_suppkey")
    nat_li = (
        t["lineitem"]
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey", dec("l_extendedprice").alias("v"))
    )
    per_part = nat_li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.round(F.sum("v"), 2).cast("double").alias("part_value")
    )
    total = nat_li.agg((F.lit(0.001) * F.round(F.sum("v"), 2).cast("double")).alias("cutoff"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("cutoff"))
        .select("p_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("flagship", "scalar-subquery", "view"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue.
    The reference's revenue VIEW is one per-supplier aggregate, reused
    for both the scalar max and the equality filter — Spark computes
    it once (supplier-count-sized, broadcast), maxes the 1-row scalar,
    and equality-joins back. Revenue is a rounded decimal sum, so the
    max-equality comparison is exact on both engines."""
    t = load_tables(spark, sf_dir)
    revenue = (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01"))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))), "total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mr"))
    return (
        t["supplier"]
        .join(F.broadcast(revenue), F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("mr"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 14, 19, 23)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("flagship", "distinct-agg", "not-in"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers offer parts in
    each (brand, type, size) bucket, excluding flagged suppliers (a
    negative balance standing in for the complaint-comment scan). The
    NOT IN over a key column with no nulls decorrelates to a left-anti
    join against the broadcast flagged list; count(DISTINCT) shuffles
    once on the group keys with distinct aggregation inside."""
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    flagged = t["supplier"].filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (
        t["lineitem"].select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(flagged), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_excess_concentration",
    oracle="""
    WITH pair_year AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty_1996
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey
    ),
    pair_all AS (
        SELECT l_partkey AS ap, l_suppkey AS asup, sum(l_quantity) AS qty_all
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    hot AS (
        SELECT DISTINCT l_suppkey
        FROM pair_year
        JOIN pair_all ON ap = l_partkey AND asup = l_suppkey
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%' AND qty_1996 > 0.5 * qty_all
    )
    SELECT s_name, s_nationkey
    FROM supplier JOIN hot ON s_suppkey = l_suppkey
    WHERE s_nationkey = 2
    ORDER BY s_name
    """,
    tags=("flagship", "semi", "correlated-agg"),
)
def q20_excess_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding excess stock of a forecast
    product line — reframed without partsupp as suppliers who shipped
    more than half a (part, supplier) pair's lifetime quantity inside
    one year. Two aggregations of the same fact at different date
    slices join on the pair key (the correlated ``> 0.5 * (SELECT
    sum ...)`` threshold, decorrelated); the part LIKE-filter
    broadcasts; distinct suppliers semi-join into the dim. Quantity
    sums are exact (fixture quantities are small integers in double),
    so the 0.5× comparison is engine-identical."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    pair_year = (
        li.filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty_1996"))
    )
    pair_all = li.groupBy(F.col("l_partkey").alias("ap"), F.col("l_suppkey").alias("asup")).agg(
        F.sum("l_quantity").alias("qty_all")
    )
    p = t["part"].filter(F.col("p_name").like("small%")).select("p_partkey")
    hot = (
        pair_year.join(pair_all, (F.col("ap") == F.col("l_partkey")) & (F.col("asup") == F.col("l_suppkey")))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(F.col("qty_1996") > 0.5 * F.col("qty_all"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .filter(F.col("s_nationkey") == 2)
        .join(F.broadcast(hot), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_name", "s_nationkey")
        .orderBy("s_name")
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND s_nationkey = 4
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    tags=("flagship", "exists", "not-exists", "decorrelated"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    multi-supplier finalized order ("late" = shipped >60 days after
    the order date, standing in for receipt-after-commit). The
    reference plan scans lineitem three times (l1, EXISTS l2,
    NOT EXISTS l3); here both EXISTS collapse into ONE per-order
    aggregation — count distinct suppliers, count distinct LATE
    suppliers, and remember the late supplier when it is unique:

        qualifies ⇔ status F ∧ n_supp > 1 ∧ n_late_supp = 1

    which is exactly the EXISTS/NOT-EXISTS pair (any second late
    supplier would trip l3 for both). One shuffle on l_orderkey
    replaces two correlated re-scans — at 100 TB that is the
    difference between one exchange and three. The oracle keeps the
    literal EXISTS form to pin semantic equivalence.

    NOTE: the reference counts qualifying l1 ROWS, and the sole late
    supplier can have several late lines in one order — so each
    qualifying order contributes its late-line count (``n_late_lines``),
    not 1 (caught by the sf0.1 oracle sweep)."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
            F.sum(F.when(late, 1).otherwise(0)).alias("n_late_lines"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    supp = (
        t["supplier"].filter(F.col("s_nationkey") == 4).select("s_suppkey", "s_name")
    )
    return (
        per_order.join(F.broadcast(supp), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
