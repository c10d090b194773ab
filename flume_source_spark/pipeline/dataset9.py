"""Dataset-prep wave 9 (round 12): exact stratified undersampling —
balance a corpus to its smallest class by keeping exactly n_min
deterministically-chosen documents per class, the standard class-
rebalance step before training on skewed label distributions.

Selection rule: within each lang, rank documents by
(md5(doc_id), doc_id) — a deterministic pseudo-random order both
engines reproduce — and keep rank ≤ n_min (the smallest class's
size). Published per class: original count, kept count (= n_min for
every class, by construction), and an order-independent manifest
digest of the kept ids (sum + bit_xor — mergeable, O(1) per class,
unlike a concatenated-id digest which would be corpus-sized at
100 TB).

Scale design — the interesting part: "rank within each class" is a
window partitioned by a LOW-CARDINALITY key (a handful of langs), so
the naive form funnels the whole corpus through one task per class —
the exact anti-pattern the round-11 distributed global-order helper
(flume_source_spark/global_order.py) was built to kill. The re-shape:
ONE global rank over the total order (lang_idx, h, doc_id) — classes
occupy contiguous rank ranges — then per-class rank = global rank −
class offset, where the offsets are an exclusive prefix sum over the
(tiny) per-class count table, broadcast back. The bucket key composes
lang_idx·2³² + h per the helper's multi-column-head contract, so
boundary buckets stay balanced within and across classes. No
per-class sort, no single-partition exchange, one corpus pass.

Reference parity note: the reference engine (`CephFsSource.java`)
has no dataset surface; this operator belongs to the declared [NS]
engine surface (SURVEY.md §2.2, dataset-prep family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_BALANCE_ORACLE = """
    WITH d AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) AS h
        FROM documents
    ),
    nmin AS (
        SELECT min(c) AS n_min
        FROM (SELECT count(*) AS c FROM d GROUP BY lang)
    ),
    r AS (
        SELECT doc_id, lang, h,
               row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
                   AS class_rank
        FROM d
    )
    SELECT r.lang,
           CAST(count(*) AS BIGINT) AS n_orig,
           CAST(sum(CASE WHEN class_rank <= n.n_min THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN class_rank <= n.n_min THEN doc_id ELSE 0 END)
                AS BIGINT) AS sum_kept_ids,
           CAST(bit_xor(CASE WHEN class_rank <= n.n_min THEN doc_id
                        ELSE 0 END) AS BIGINT) AS xor_kept_ids
    FROM r CROSS JOIN nmin n
    GROUP BY r.lang
    ORDER BY r.lang
"""


def balanced_undersample(docs: DataFrame) -> DataFrame:
    """Core stratified-undersample fold over a (doc_id, lang) frame.
    Factored so model tests (every class kept at exactly n_min; the
    kept set is invariant to row order; adding rows to a majority
    class never changes the minority's kept set) drive the production
    stages.

    The per-class rank rides ONE distributed global rank over
    (lang_idx, h, doc_id) minus broadcast class offsets — see the
    module docstring; the oracle uses the plain per-class window
    (fixture-sized), making the two formulations independent."""
    from flume_source_spark.global_order import with_global_rank

    d = docs.select(
        "doc_id",
        "lang",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("h"),
    )
    counts = d.groupBy("lang").agg(F.count("*").cast("long").alias("c"))
    # tiny frame (one row per class): dense index + exclusive offsets
    # + the n_min scalar, all in bounded windows over ≤ #classes rows
    from pyspark.sql import Window

    wl = Window.orderBy("lang")
    idx = counts.select(
        "lang",
        "c",
        (F.row_number().over(wl) - 1).cast("long").alias("lidx"),
        F.coalesce(
            F.sum("c").over(wl.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("long")
        .alias("off"),
        F.min("c").over(Window.partitionBy()).cast("long").alias("n_min"),
    )
    joined = d.join(F.broadcast(idx), "lang")
    ranked = with_global_rank(
        joined,
        [F.col("lidx"), F.col("h"), F.col("doc_id")],
        F.col("lidx") * (1 << 32) + F.col("h"),
        rank_col="grk",
    )
    flagged = ranked.withColumn(
        "keep", (F.col("grk") - F.col("off")) <= F.col("n_min")
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_orig"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("doc_id")).otherwise(0))
            .cast("long")
            .alias("sum_kept_ids"),
            F.expr(
                "bit_xor(CASE WHEN keep THEN doc_id ELSE 0 END)"
            )
            .cast("long")
            .alias("xor_kept_ids"),
        )
        .orderBy("lang")
    )


@query(
    "ds_balanced_undersample",
    oracle=_BALANCE_ORACLE,
    tags=("llm", "dataset", "sampling"),
)
def ds_balanced_undersample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-class undersampling of documents to the smallest
    lang's size, selection by deterministic md5 rank, per-class kept
    counts + order-independent manifest digests — the class-rebalance
    manifest, with the per-class rank riding the distributed
    global-order helper instead of a low-cardinality window (no
    single-partition sort at 100 TB)."""
    d = load_tables(spark, sf_dir)["documents"]
    return balanced_undersample(d.select("doc_id", "lang"))
