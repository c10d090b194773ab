"""Dataset-prep wave 4: Bloom-filter incremental membership dedup.

``ds_bloom_dedup`` — the daily-crawl screening problem: given a large
HISTORICAL corpus and a small new INCREMENT, flag increment documents
that share any content segment with history. The naive plan semi-joins
the increment's segments against the historical segment set — at
100 TB that shuffles the *history* every day. The production pattern
(the dedup bloom of web-crawl pipelines) replaces the history with a
compact bit array:

    1. build a Bloom filter over historical segment hashes,
    2. probe each increment segment against the (broadcast) filter,
    3. exact-verify only the bloom-positive survivors.

Spark's internal ``BloomFilterAggregate`` is not SQL-registered in
OSS Spark (it exists for Catalyst's runtime join filters — see
``test_bloom_join_pruning``), so the filter here is built from first
principles with PURE relational operators — which is exactly the
mergeable-sketch shape a distributed bloom needs anyway:

    - K hash positions per key: ``pmod(xxhash64(seg, seed_k), NBITS)``
    - the filter = NBITS/64 words: ``groupBy(pos div 64)`` +
      ``bit_or(1 << (pos % 64))`` — a map-side-combinable aggregate
      whose merge (OR) is associative/commutative/idempotent, so
      per-shard/per-day partial filters union losslessly (persist the
      word table between increments and ``bit_or`` the new day in),
    - probe = explode the K positions, LEFT join the broadcast word
      table on word index (≤ NBITS/64 rows — bits, not history rows),
      a position hits iff its bit is set, a segment is bloom-positive
      iff ``bool_and(hit)`` over its K positions.

Bloom guarantees no false negatives, so step 3's output EQUALS the
pure exact semi-join — which is what the DuckDB oracle computes
(DuckDB can't evaluate the filter; it doesn't need to, because the
bloom sits inside an exactness-preserving sandwich). False positives
only cost verify-join work; K=7 / NBITS≈10·NDV targets ~1 % FPP.
``test_bloom_*`` pins the raw filter behavior on hand-built data:
exact hits are always bloom-positive, misses are overwhelmingly
bloom-negative, and the word table is tiny.

History/increment split is deterministic (doc_id parity); segments
are the SEG-token windows shared with ``text_line_dedup``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.text9 import SEG
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# K hash functions, NBITS filter bits (~10 bits/key at the fixture's
# ~20k historical segments → FPP ≈ 1 %). At 100 TB size NBITS to the
# historical NDV the same way (bits live in a DataFrame, so a
# multi-GB filter is fine — it broadcasts as a compact word table).
BLOOM_K = 7
BLOOM_NBITS = 1 << 18  # 262144 bits = 4096 words

_BLOOM_ORACLE = f"""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
    segs AS (
        SELECT doc_id,
               unnest([array_to_string(toks[g*{SEG}+1:g*{SEG}+{SEG}], ' ')
                       for g in generate_series(
                           0, CAST(ceil(len(toks)/{SEG}.0) AS BIGINT) - 1)]) AS seg
        FROM t
    ),
    hist AS (SELECT DISTINCT seg FROM segs WHERE doc_id % 2 = 0),
    inc AS (SELECT doc_id, seg FROM segs WHERE doc_id % 2 = 1),
    hits AS (SELECT doc_id, CAST(count(DISTINCT i.seg) AS BIGINT) AS n_shared_segments
             FROM inc i JOIN hist h USING (seg) GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(h.n_shared_segments, 0) AS n_shared_segments,
           h.doc_id IS NOT NULL AS overlaps_history
    FROM (SELECT DISTINCT doc_id FROM inc) d
    LEFT JOIN hits h USING (doc_id)
    ORDER BY d.doc_id
"""


def _segments(docs: DataFrame, seg: int = SEG) -> DataFrame:
    base = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    nseg = F.ceil(F.size("toks") / F.lit(float(seg))).cast("long")
    return base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0).cast("long"), nseg - 1),
                lambda g: F.array_join(F.slice("toks", (g * seg + 1).cast("int"), seg), " "),
            )
        ).alias("seg"),
    )


def _positions(col: str, k: int, nbits: int) -> F.Column:
    """Array of k bloom bit positions for a string column."""
    return F.transform(
        F.sequence(F.lit(1), F.lit(k)),
        lambda i: F.pmod(F.xxhash64(F.col(col), i), F.lit(nbits)),
    )


def bloom_build(keys: DataFrame, col: str = "seg",
                k: int = BLOOM_K, nbits: int = BLOOM_NBITS) -> DataFrame:
    """Bloom filter as a (word_idx, word) DataFrame: bit_or-aggregated
    64-bit words over the k hash positions of every key. Mergeable:
    union two filters' word tables and bit_or again."""
    return (
        keys.select(F.explode(_positions(col, k, nbits)).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_probe(probe: DataFrame, bloom_words: DataFrame, col: str = "seg",
                k: int = BLOOM_K, nbits: int = BLOOM_NBITS) -> DataFrame:
    """Rows of ``probe`` whose ``col`` is bloom-POSITIVE (all k bits
    set). The filter joins broadcast on word index — history never
    shuffles at probe time."""
    pid = probe.withColumn("__pid", F.monotonically_increasing_id())
    pos = pid.select(
        "__pid", F.explode(_positions(col, k, nbits)).alias("pos")
    ).select(
        "__pid",
        (F.col("pos") / 64).cast("long").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias("mask"),
    )
    checked = (
        pos.join(F.broadcast(bloom_words), "word_idx", "left")
        .select(
            "__pid",
            (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask")) != 0).alias("hit"),
        )
        .groupBy("__pid")
        .agg(F.bool_and("hit").alias("maybe"))
        .filter("maybe")
    )
    return pid.join(checked.select("__pid"), "__pid", "left_semi").drop("__pid")


@query("ds_bloom_dedup", oracle=_BLOOM_ORACLE, tags=("llm", "dataset", "dedup", "bloom"))
def ds_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental membership screening: per increment (odd doc_id)
    document, how many of its segments already exist in the historical
    (even doc_id) corpus — bloom prefilter + exact verify; output
    equals the pure exact semi-join the oracle runs."""
    from flume_source_spark.pipeline.dedup import spread

    docs = spread(load_tables(spark, sf_dir)["documents"])
    segs = _segments(docs)
    hist = segs.where(F.col("doc_id") % 2 == 0).select("seg").distinct()
    inc = segs.where(F.col("doc_id") % 2 == 1)
    bloom = bloom_build(hist)
    positive = bloom_probe(inc, bloom)
    confirmed = positive.join(hist, "seg", "left_semi")
    hits = confirmed.groupBy("doc_id").agg(
        F.countDistinct("seg").alias("n_shared_segments")
    )
    inc_docs = inc.select("doc_id").distinct()
    return (
        inc_docs.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared_segments", F.lit(0).cast("long")).alias(
                "n_shared_segments"
            ),
            F.col("n_shared_segments").isNotNull().alias("overlaps_history"),
        )
        .orderBy("doc_id")
    )
