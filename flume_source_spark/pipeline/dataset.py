"""Dataset-preparation operators for LLM training pipelines:
deterministic splits, token-budget sequence packing, benchmark
decontamination.

These are the steps between "deduped corpus" and "training shards":

- ``ds_split_deterministic`` — train/val/test assignment must be a
  PURE FUNCTION of the document identity, never of partitioning, row
  order, or an RNG: re-running the pipeline (or running it on a
  different cluster layout) must put every doc in the same split, or
  eval sets silently leak into training. Hash-bucket on md5(doc_id)
  → [0,100) → threshold. One narrow projection, no shuffle beyond
  the final count aggregate.
- ``ds_pack_sequences`` — pretraining concatenates documents into
  fixed token-budget sequences ("packing"). The assignment here is
  the concat-and-chunk model: within a deterministic shard, docs are
  laid out in doc_id order and a doc's pack is its start-offset
  divided by the budget. One window (running sum per shard) — the
  shard key bounds window state, so no global sort exists anywhere.
- ``text_decontaminate`` — n-gram overlap against a benchmark set
  (the standard eval-contamination check: a training doc sharing any
  benchmark n-gram is flagged). The benchmark side is SMALL by
  definition → broadcast its distinct n-grams; the corpus side
  streams. Cost is one broadcast-hash-join over exploded n-grams,
  no shuffle of the corpus text.

At 100 TB: split assignment and packing are embarrassingly parallel
(hash + per-shard window); decontamination's only shuffle is the
per-doc hit count, post-filter (contaminated docs are rare).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.dedup import shingle_col, spread
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# split thresholds over the 100 hash buckets
TRAIN_PCT, VAL_PCT = 80, 10
PACK_SHARDS = 8
PACK_BUDGET = 256  # tokens per packed sequence
DECON_NGRAM = 4  # ~13-gram-on-real-text selectivity for ~30-token synthetic docs
BENCH_MOD = 97  # doc_id % 97 == 0 → the stand-in benchmark set


def split_bucket(id_col):
    """[0,100) bucket as a pure function of the id: first 8 hex chars
    of md5(id-as-string), parsed base-16, mod 100. md5 (not xxhash64)
    so the oracle can reproduce it byte-for-byte."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long") % 100


@query(
    "ds_split_deterministic",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
        FROM documents
    )
    SELECT doc_id, bucket,
           CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
                WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM b ORDER BY doc_id
    """,
    tags=("llm", "dataset", "split"),
)
def ds_split_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment per document.
    Emits the full per-doc assignment so the hash check pins every
    single placement, not just the counts."""
    d = load_tables(spark, sf_dir)["documents"]
    bucket = split_bucket(F.col("doc_id"))
    split = (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        d.select("doc_id", bucket.alias("bucket"), split.alias("split"))
        .orderBy("doc_id")
    )


@query(
    "ds_pack_sequences",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
               len(str_split(text, ' ')) AS toks
        FROM documents
    ),
    o AS (
        SELECT *, COALESCE(SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
        FROM t
    )
    SELECT shard, CAST(floor(start / {PACK_BUDGET}.0) AS BIGINT) AS pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS pack_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM o GROUP BY shard, pack_id ORDER BY shard, pack_id
    """,
    tags=("llm", "dataset", "packing"),
)
def ds_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (concat-and-chunk): shard docs
    deterministically, lay them out in doc_id order, and assign each
    doc to pack floor(start_offset / budget). The window partitions by
    shard, so state per window is one shard — at scale, shards are the
    parallelism unit and no global sort is ever required. A doc whose
    tokens straddle a budget boundary belongs to the pack where it
    STARTS (the chunker splits it downstream — that's the concat-and-
    chunk contract, matching how pretraining loaders pack)."""
    from pyspark.sql import Window as W

    d = load_tables(spark, sf_dir)["documents"]
    t = d.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(F.split("text", " ")).alias("toks"),
    )
    w = W.partitionBy("shard").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    o = t.withColumn("start", F.coalesce(F.sum("toks").over(w), F.lit(0)))
    return (
        o.groupBy("shard", F.floor(F.col("start") / PACK_BUDGET).cast("long").alias("pack_id"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("toks").cast("long").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard", "pack_id")
    )


@query(
    "text_decontaminate",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+{DECON_NGRAM - 1}], ' ')
                   for i in generate_series(1, len(toks) - {DECON_NGRAM - 1})])) AS g
        FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
    ),
    bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % {BENCH_MOD} = 0)
    SELECT s.doc_id, CAST(count(DISTINCT s.g) AS BIGINT) AS n_hits
    FROM sh s JOIN bench USING (g)
    WHERE s.doc_id % {BENCH_MOD} <> 0
    GROUP BY s.doc_id ORDER BY s.doc_id
    """,
    tags=("llm", "dataset", "decontamination"),
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any n-gram
    with the benchmark set (stand-in: doc_id % BENCH_MOD == 0). The
    benchmark's distinct n-grams are BROADCAST — the benchmark is
    small by definition while the corpus streams through, so the only
    shuffle is the per-doc hit count over the (rare) matching rows."""
    d = spread(load_tables(spark, sf_dir)["documents"])
    sh = d.select(
        "doc_id", F.explode(shingle_col(F.col("text"), k=DECON_NGRAM)).alias("g")
    )
    bench = sh.filter(F.col("doc_id") % BENCH_MOD == 0).select("g").distinct()
    return (
        sh.filter(F.col("doc_id") % BENCH_MOD != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").cast("long").alias("n_hits"))
        .orderBy("doc_id")
    )


# per-source keep rates over the 10000 hash buckets (domain mixing):
# heavy upsample of src0/src1, light tail for the rest
MIX_RATES = {"src0": 10000, "src1": 5000}  # buckets kept out of 10000
MIX_DEFAULT = 1500


@query(
    "ds_stratified_sample",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, source,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS bucket
        FROM documents
    )
    SELECT doc_id, source, bucket
    FROM b
    WHERE bucket < CASE source WHEN 'src0' THEN {MIX_RATES['src0']}
                               WHEN 'src1' THEN {MIX_RATES['src1']}
                               ELSE {MIX_DEFAULT} END
    ORDER BY doc_id
    """,
    tags=("llm", "dataset", "sampling"),
)
def ds_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified (domain-mix) sampling: each source
    keeps a configured fraction, decided by the SAME md5 hash-bucket
    function as ds_split_deterministic — a pure function of doc
    identity, so re-runs and re-partitions keep identical rows, and a
    doc kept at rate r stays kept at any rate ≥ r (nested samples,
    the property Bernoulli RNG sampling can't give you). Emits the
    per-doc keep set so the oracle pins every decision; at 100 TB
    this is a stateless filter — no shuffle at all."""
    d = load_tables(spark, sf_dir)["documents"]
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long") % 10000
    )
    rate = (
        F.when(F.col("source") == "src0", MIX_RATES["src0"])
        .when(F.col("source") == "src1", MIX_RATES["src1"])
        .otherwise(MIX_DEFAULT)
    )
    return (
        d.select("doc_id", "source", bucket.alias("bucket"))
        .filter(F.col("bucket") < rate)
        .orderBy("doc_id")
    )


N_SHARDS = 32

_SHARD_MANIFEST_ORACLE = f"""
    WITH assigned AS (
        SELECT doc_id, n_chars,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   % {N_SHARDS} AS shard_id
        FROM documents
    )
    SELECT shard_id,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id
    FROM assigned
    GROUP BY shard_id
    ORDER BY shard_id
"""


@query("ds_shard_manifest", oracle=_SHARD_MANIFEST_ORACLE, tags=("llm", "dataset"))
def ds_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest: assign every doc to one of N_SHARDS
    output shards by the same identity-hash used for splits/sampling
    (so shard membership survives re-runs and re-partitions), then
    aggregate the per-shard manifest a writer job would emit (doc
    count, byte budget, id range). At 100 TB this IS the write plan:
    `repartition(N, shard_id).write.partitionBy("shard_id")` gives
    one balanced file per shard, and the manifest doubles as the
    balance check — identity hashing makes shard sizes binomial, so
    max/mean skew stays within a few percent at any corpus size."""
    d = load_tables(spark, sf_dir)["documents"]
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
        % N_SHARDS
    )
    return (
        d.select(shard.alias("shard_id"), "doc_id", "n_chars")
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("shard_id")
    )
