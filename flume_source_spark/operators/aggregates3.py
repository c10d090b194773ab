"""Aggregation wave 3: the linear-regression aggregate family and the
existence-join (disjunctive EXISTS) shape.

- ``agg_regression_family`` — regr_slope / regr_intercept / regr_r2 /
  regr_count / regr_avgx / regr_avgy of price-on-quantity per return
  flag. These are single-pass COMPOSABLE aggregates (each reduces to
  the five moment sums n, Σx, Σy, Σxy, Σx² — partials combine
  map-side and merge associatively, the same mergeability contract
  as agg_incremental_merge), i.e. regression at 100 TB is one
  shuffle, never a collect. Cross-engine float note: both engines
  accumulate moments in double; compared digits are rounded (4 dp
  slope/r2, 2 dp intercept/means) far above the ~1e-10 relative
  accumulation noise.
- ``join_existence_or`` — a semi-join condition OR'd with a local
  predicate: ``c_acctbal > 9000 OR EXISTS(urgent order)``. A plain
  LEFT SEMI can't express this (the local arm must pass rows the
  subquery arm rejects), so Catalyst plans an ExistenceJoin — a semi
  join that outputs a boolean 'exists' column consumed by the filter
  (asserted in tests/test_round4_ops.py). Still hash-partitionable
  on the correlation key; the oracle runs the literal SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables, register_views

_REGR_ORACLE = """
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           CAST(round(regr_slope(l_extendedprice, l_quantity), 4) AS DOUBLE) AS slope,
           CAST(round(regr_intercept(l_extendedprice, l_quantity), 2) AS DOUBLE) AS intercept,
           CAST(round(regr_r2(l_extendedprice, l_quantity), 4) AS DOUBLE) AS r2,
           CAST(round(regr_avgx(l_extendedprice, l_quantity), 2) AS DOUBLE) AS avg_x,
           CAST(round(regr_avgy(l_extendedprice, l_quantity), 2) AS DOUBLE) AS avg_y
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query("agg_regression_family", oracle=_REGR_ORACLE, tags=("agg", "regression"))
def agg_regression_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS of price on quantity via the regr_* aggregate
    family — five mergeable moment sums, one shuffle."""
    li = load_tables(spark, sf_dir)["lineitem"]
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.regr_count(y, x).cast("long").alias("n"),
            F.round(F.regr_slope(y, x), 4).alias("slope"),
            F.round(F.regr_intercept(y, x), 2).alias("intercept"),
            F.round(F.regr_r2(y, x), 4).alias("r2"),
            F.round(F.regr_avgx(y, x), 2).alias("avg_x"),
            F.round(F.regr_avgy(y, x), 2).alias("avg_y"),
        )
        .orderBy("l_returnflag")
    )


_EXISTENCE_SQL = """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_qualifying,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_bal
    FROM customer c
    WHERE c_acctbal > 9000
       OR EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


@query("join_existence_or", oracle=_EXISTENCE_SQL, tags=("join", "subquery", "existence"))
def join_existence_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS inside a disjunction → ExistenceJoin physical shape
    (semi join emitting a boolean instead of filtering)."""
    register_views(spark, sf_dir)
    return spark.sql(_EXISTENCE_SQL)


_PDISC_SQL = """
    SELECT l_returnflag,
           CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)
                AS DOUBLE) AS q25_disc,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)
                AS DOUBLE) AS median_disc,
           CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)
                AS DOUBLE) AS median_cont,
           CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)
                AS DOUBLE) AS p90_price_disc
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query("agg_percentile_disc_cont", oracle=_PDISC_SQL, tags=("agg", "percentile"))
def agg_percentile_disc_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI WITHIN GROUP inverse-distribution aggregates:
    percentile_disc (smallest value with CDF ≥ p — always an actual
    data value) next to percentile_cont (interpolated) on the same
    column, pinning the disc/cont divergence on even-sized groups.
    The identical statement runs on DuckDB. Scale: Spark plans these
    as sort-based aggregates per group — memory is bounded by the
    group's value multiset; for the approximate regime at 100 TB see
    agg_approx (approx_percentile sketch, mergeable)."""
    register_views(spark, sf_dir)
    return spark.sql(_PDISC_SQL)


_MODE_ORACLE = """
    WITH counts AS (
        SELECT o_orderpriority, o_orderstatus AS st, CAST(count(*) AS BIGINT) AS cnt
        FROM orders GROUP BY 1, 2),
    r AS (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                       ORDER BY cnt DESC, st) AS rn
          FROM counts)
    SELECT o_orderpriority,
           max(CASE WHEN rn = 1 THEN st END) AS mode_status,
           max(CASE WHEN rn = 1 THEN cnt END) AS mode_count,
           CAST(count(*) AS BIGINT) AS n_distinct_statuses
    FROM r GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("agg_mode_deterministic", oracle=_MODE_ORACLE, tags=("agg", "mode"))
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE: most frequent o_orderstatus per priority,
    ties broken to the SMALLEST value. Spark 4 ships a native mode()
    aggregate but its tie choice is unspecified (as is DuckDB's), so
    the portable contract is count + arg-min over (−cnt, value) — one
    extra (tiny) aggregate over the distinct (group, value) pairs, and
    min_by is mergeable so both steps map-side combine. The oracle
    formulates the same election independently via a row_number
    window."""
    o = load_tables(spark, sf_dir)["orders"]
    counts = o.groupBy("o_orderpriority", F.col("o_orderstatus").alias("st")).agg(
        F.count("*").alias("cnt")
    )
    return (
        counts.groupBy("o_orderpriority")
        .agg(
            F.min_by("st", F.struct((-F.col("cnt")).alias("nc"), F.col("st"))).alias(
                "mode_status"
            ),
            F.max("cnt").alias("mode_count"),
            F.count("*").alias("n_distinct_statuses"),
        )
        .orderBy("o_orderpriority")
    )


def word_and_mask(key_sql: str) -> tuple:
    """The positional-bitmap slotting arithmetic, defined ONCE: word
    index = key div 64, mask = 1 << (key mod 64). Every builder
    (agg_bitmap_distinct, agg_sketch_merge_exact, sketch_set_ops, the
    bloom build in runtime_filter) derives its layout from here, and
    :func:`bit_test` is the matching probe — change one, both move.

    ``key_sql`` must evaluate NON-NEGATIVE: for k < 0, truncating
    ``div`` pairs with ``pmod`` to alias k onto k+64 (e.g. −1 → word 0
    bit 63, same slot as 63) — open or signed domains belong to the
    HLL path (agg_approx), not positional bitmaps. (The bloom build
    satisfies this by construction: its key is pmod(hash, nbits).)
    """
    return (
        F.expr(f"({key_sql}) div 64").alias("word_idx"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pmod({key_sql}, 64) AS INT))"
        ).alias("mask"),
    )


def bit_test(word_col: str, key_sql: str):
    """True iff ``key_sql``'s bit is set in ``word_col`` — the probe
    dual of :func:`word_and_mask`'s build layout."""
    return F.expr(
        f"(shiftright({word_col}, CAST(pmod({key_sql}, 64) AS INT)) & 1) = 1"
    )


def word_bitmaps(
    df: DataFrame, group_col: str, key_col: str, *,
    group_alias: str | None = None, with_rowcount: bool = False,
    checkpoint: bool = False,
) -> DataFrame:
    """Per-(group, word) positional bitmap table: one ``bit_or``
    aggregate over :func:`word_and_mask` slots (see there for the
    non-negative dense-id contract on ``key_col``). ``checkpoint``
    materializes the table as the "stored partial sketches" the set
    algebra consumers re-read without rescanning base data."""
    widx, mask = word_and_mask(key_col)
    gname = group_alias or group_col
    aggs = [F.bit_or("mask").alias("word")]
    if with_rowcount:
        aggs.append(F.count("*").alias("n"))
    out = (
        df.select(F.col(group_col).alias(gname), widx, mask)
        .groupBy(gname, "word_idx")
        .agg(*aggs)
    )
    return out.localCheckpoint(eager=True) if checkpoint else out


_BITMAP_ORACLE = """
    SELECT c_mktsegment,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


@query("agg_bitmap_distinct", oracle=_BITMAP_ORACLE, tags=("agg", "distinct", "bitmap"))
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via positional bitmaps — the
    Druid/ClickHouse roaring-bitmap pattern built from relational
    primitives (the same word-table shape as ds_bloom_dedup's filter,
    minus hashing, so zero collisions): for a bounded integer id
    domain, bitmap word = id div 64, mask = 1 << (id % 64); per
    (group, word) one ``bit_or`` aggregate, then Σ bit_count(word)
    per group IS the exact distinct count. Why it matters at 100 TB:
    count(DISTINCT) needs a shuffle of the DISTINCT VALUES per group
    and is not partial-aggregatable as-is, while the bitmap is a
    MERGEABLE aggregate — partial word tables OR together losslessly
    across shards/days (same algebra the bloom tests pin), making
    incremental/rollup-maintained exact distinct possible. Cost is
    O(domain/64) words per group — the trade is memory for
    mergeability, right when ids are dense and bounded (user ids,
    item ids); for open domains use HLL (agg_approx) instead. The
    oracle is the plain count(DISTINCT) — the hash match proves the
    bitmap arithmetic exactly."""
    c = load_tables(spark, sf_dir)["customer"]
    words = word_bitmaps(c, "c_mktsegment", "c_custkey", with_rowcount=True)
    return (
        words.groupBy("c_mktsegment")
        .agg(
            F.sum(F.bit_count("word")).cast("long").alias("n_distinct"),
            F.sum("n").alias("n_rows"),
        )
        .orderBy("c_mktsegment")
    )


_SKETCH_MERGE_ORACLE = """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT 'ALL' AS l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct
    FROM lineitem
    ORDER BY l_returnflag
"""


@query(
    "agg_sketch_merge_exact",
    oracle=_SKETCH_MERGE_ORACLE,
    tags=("agg", "distinct", "sketch", "exact-twin"),
)
def agg_sketch_merge_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable twin of ``agg_sketch_mergeable``'s MERGE ALGEBRA
    (VERDICT r6 item 6): the same two-level shape — build one partial
    "sketch" per group, then roll the group sketches up to a global
    cardinality WITHOUT rescanning the base data — with the HLL
    replaced by the exact positional bitmap of
    ``agg_bitmap_distinct``. That query pins the per-group BUILD;
    this one pins the cross-group UNION step (``hll_union_agg``'s
    analog): the global word table is ``bit_or`` over the PER-GROUP
    word tables (domain/64 rows per group — sketch-sized, not
    data-sized), and its popcount must equal the true corpus-wide
    distinct count, which only holds if partial-merge is lossless.
    Oracle: plain per-group + global count(DISTINCT). At 100 TB this
    is the property that makes daily/partition sketches roll up to
    any coarser grain for free; the estimates themselves stay
    rows-only in ``agg_sketch_mergeable`` (DataSketches-specific),
    with the merge shape now positively pinned cross-engine."""
    li = load_tables(spark, sf_dir)["lineitem"]
    # the "stored partial sketches" (checkpointed): both consumers
    # below read THIS table, never lineitem again
    words = word_bitmaps(li, "l_returnflag", "l_partkey", checkpoint=True)
    per_flag = words.groupBy("l_returnflag").agg(
        F.sum(F.bit_count("word")).cast("long").alias("n_distinct")
    )
    merged = (
        words.groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
        .agg(
            F.lit("ALL").alias("l_returnflag"),
            F.sum(F.bit_count("word")).cast("long").alias("n_distinct"),
        )
    )
    return per_flag.unionByName(merged).orderBy("l_returnflag")


_SKETCH_INTERSECT_ORACLE = """
    SELECT 'intersect' AS set_op, CAST(count(*) AS BIGINT) AS n_distinct
    FROM (
        SELECT l_partkey FROM lineitem GROUP BY l_partkey
        HAVING count(DISTINCT l_returnflag)
               = (SELECT count(DISTINCT l_returnflag) FROM lineitem)
    )
    UNION ALL
    SELECT 'union' AS set_op, CAST(count(DISTINCT l_partkey) AS BIGINT)
    FROM lineitem
    ORDER BY set_op
"""


def sketch_set_ops(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Union and intersection cardinalities over per-group word
    bitmaps — the set algebra applied to STORED sketches, never the
    base rows. Factored out of the registry query so the absent-word
    guard can be driven on constructed data in tests (the fixture's
    dense keys put every word in every group, which never exercises
    it). Returns two rows: (set_op ∈ {union, intersect}, n_distinct).
    ``key_col`` must be NON-NEGATIVE — :func:`word_and_mask` states
    the dense-bounded-id contract.
    """
    # the stored partial sketches (checkpointed) — both set
    # expressions below read these, never the base table
    words = word_bitmaps(df, group_col, key_col, group_alias="g", checkpoint=True)
    n_groups = words.select("g").distinct().count()
    inter = (
        words.groupBy("word_idx")
        .agg(F.bit_and("word").alias("w"), F.count("*").alias("ng"))
        .select(
            F.when(F.col("ng") == n_groups, F.col("w")).otherwise(F.lit(0)).alias("w")
        )
        .agg(
            F.lit("intersect").alias("set_op"),
            F.coalesce(F.sum(F.bit_count("w")), F.lit(0)).cast("long").alias("n_distinct"),
        )
    )
    union = (
        words.groupBy("word_idx")
        .agg(F.bit_or("word").alias("w"))
        .agg(
            F.lit("union").alias("set_op"),
            F.coalesce(F.sum(F.bit_count("w")), F.lit(0)).cast("long").alias("n_distinct"),
        )
    )
    return union.unionByName(inter).orderBy("set_op")


@query(
    "agg_sketch_intersect_exact",
    oracle=_SKETCH_INTERSECT_ORACLE,
    tags=("agg", "distinct", "sketch", "exact-twin"),
)
def agg_sketch_intersect_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Companion to :func:`agg_sketch_merge_exact`, pinning the sketch
    INTERSECTION algebra — the capability that separates Theta-style
    sketches (set expressions) from HLL (union only): parts appearing
    in EVERY return-flag class, computed purely on the stored
    per-group word bitmaps via ``bit_and``, vs the union via
    ``bit_or``, with neither rescanning base data. The subtlety the
    guard in :func:`sketch_set_ops` covers: a word absent from some
    group's sketch is an implicit all-zeros word, but ``bit_and``
    only folds the rows PRESENT per ``word_idx`` — so a
    group-presence count rides along and words seen in fewer than all
    groups are zeroed before the popcount. (Dropping that guard
    overcounts: a part exclusive to one flag would survive the fold
    untouched.) The class count is a driver scalar from a distinct
    over the grouping column — flag-domain-sized, not data-sized.
    Oracle: plain HAVING count(DISTINCT)=total membership test."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return sketch_set_ops(li, "l_returnflag", "l_partkey")


# Mergeable-quantile histogram: 5.00-unit bins over floor(value·100)
# cents; quantile read = smallest bin lower bound whose cumulative
# count reaches ceil(q·N/100). The bin width is the accuracy dial —
# the sketch analog's k/eps parameter.
HIST_BIN_CENTS = 500
HIST_QS = (50, 90, 99)

_QUANTILE_HIST_ORACLE = f"""
    WITH hist AS (
        SELECT event_type,
               CAST(floor(value * 100) AS BIGINT) // {HIST_BIN_CENTS} AS bin,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    both_grains AS (
        SELECT event_type, bin, n FROM hist
        UNION ALL
        SELECT 'ALL' AS event_type, bin, CAST(SUM(n) AS BIGINT) AS n
        FROM hist GROUP BY bin
    ),
    cum AS (
        SELECT event_type, bin, n,
               CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT)
                   AS cum_n,
               CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
        FROM both_grains
    ),
    q(q) AS (VALUES (50), (90), (99))
    SELECT c.event_type, CAST(q.q AS BIGINT) AS q,
           CAST(MIN(c.bin) * {HIST_BIN_CENTS} AS BIGINT) AS bin_lo_cents,
           MIN(c.total) AS n_total
    FROM cum c JOIN q ON c.cum_n * 100 >= q.q * c.total
    GROUP BY 1, 2
    ORDER BY event_type, q
"""


@query(
    "agg_quantile_hist_exact",
    oracle=_QUANTILE_HIST_ORACLE,
    tags=("agg", "quantile", "sketch", "exact-twin"),
)
def agg_quantile_hist_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable twin of the QUANTILE-sketch merge algebra —
    completing the sketch-family pins: ``agg_bitmap_distinct`` /
    ``agg_sketch_merge_exact`` / ``agg_sketch_intersect_exact`` pin
    distinct-count build/union/intersection; this pins the
    t-digest/KLL-shaped workflow with the sketch replaced by an exact
    fixed-bin histogram. Per-group histograms are ONE map-side-
    combinable aggregate with bounded state (value-domain/bin rows per
    group — sketch-sized, not data-sized); the corpus-grain histogram
    is a rollup of the stored per-group partials (checkpointed —
    neither consumer rescans events), which is lossless exactly
    because fixed-bin counts merge by addition, the property that lets
    daily/partition histograms roll up to any grain. The quantile read
    is the smallest bin lower bound with cum_n ≥ ceil(q·N/100),
    computed set-based for all grains × quantiles at once: one
    cumulative window over BIN space (≤ domain/bin rows per grain,
    never data-sized), a 3-row broadcast of the quantile panel, and a
    min-bin aggregate. All-integer (cum_n·100 ≥ q·total avoids the
    ceil division entirely); floor(value·100) is IEEE-identical on
    both engines, and the non-negative domain keeps Spark ``div`` ≡
    DuckDB ``//``. At 100 TB: the estimates of a real KLL sketch stay
    engine-specific (``agg_approx``'s documented note) — what this
    twin proves cross-engine is the build/merge/read PLAN SHAPE those
    sketches run in."""
    ev = load_tables(spark, sf_dir)["events"]
    hist = (
        ev.select(
            "event_type",
            F.expr(
                f"CAST(floor(value * 100) AS BIGINT) div {HIST_BIN_CENTS}"
            ).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count("*").alias("n"))
        # the stored partial histograms: both grains read THIS table
        .localCheckpoint(eager=True)
    )
    merged = hist.groupBy("bin").agg(F.sum("n").alias("n")).select(
        F.lit("ALL").alias("event_type"), "bin", "n"
    )
    both = hist.select("event_type", "bin", "n").unionByName(merged)
    from pyspark.sql import Window as W

    cum = both.select(
        "event_type",
        "bin",
        F.sum("n").over(W.partitionBy("event_type").orderBy("bin")).alias("cum_n"),
        F.sum("n").over(W.partitionBy("event_type")).alias("total"),
    )
    qs = ev.sparkSession.createDataFrame([(q,) for q in HIST_QS], "q long")
    return (
        cum.join(F.broadcast(qs), F.col("cum_n") * 100 >= F.col("q") * F.col("total"))
        .groupBy("event_type", "q")
        .agg(
            (F.min("bin") * HIST_BIN_CENTS).cast("long").alias("bin_lo_cents"),
            F.min("total").cast("long").alias("n_total"),
        )
        .orderBy("event_type", "q")
    )
