"""Dataset-preparation wave 2: domain mixture control and training
order — the steps between "filtered corpus" and "what the trainer
actually reads".

- ``ds_mixture_weighted`` — domain/source mixture control: each
  source gets a target sampling rate (quality-tiered here), and a doc
  is kept iff a hash-bucket of its (doc_id, source) identity falls
  under the rate. Like ``ds_split_deterministic``, the decision is a
  PURE FUNCTION of identity — reruns, repartitions, and cluster-size
  changes never move a document in or out of the mixture, and no RNG
  state has to be carried. The emitted report is the per-source
  realized-vs-target rate, i.e. the mixture audit a pipeline logs.
- ``ds_token_budget_fill`` — per-source token budgeting: give every
  source a token budget and keep documents (in deterministic doc_id
  order) until the budget is exhausted. One running-sum window per
  source — the source key bounds window state, so this is the same
  bounded-window shape as ``ds_pack_sequences``; no global sort.
- ``ds_global_shuffle`` — the training-order shuffle: documents get
  a reproducible pseudo-random order via rank over md5(doc_id, salt),
  SHARDED first (hash bucket → shard) so ordering is a per-shard
  window, never a global sort. The trainer reads shards in any order
  and each shard's sequence is deterministic: the standard
  shuffle-by-shard layout at 100 TB, where a true global sort of the
  corpus would be the single most expensive exchange in the pipeline.

At 100 TB: mixture and budget-fill shuffle only per-source partials
(the report aggregate); the shuffle op exchanges once on the shard
key. No operator here keys a window or group on an unbounded key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# source-number tiers → target sampling rate (pct of the 100 buckets)
MIX_HI, MIX_MID = 100, 50  # src0-4 keep all, src5-12 half, rest 10 %
MIX_LO = 10
TOKEN_BUDGET = 600  # per-source token budget for budget-fill
SHUFFLE_SHARDS = 16
SHUFFLE_SALT = "epoch-0"


def _hash_bucket(*cols):
    """[0,100) bucket as a pure function of the concatenated id cols:
    md5 (oracle-reproducible, like ds_split_deterministic's bucket)."""
    key = F.concat_ws(":", *cols)
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % 100


_MIXTURE_ORACLE = f"""
    WITH t AS (
        SELECT source,
               CAST(substr(source, 4) AS INT) AS src_num,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 8))
                    AS BIGINT) % 100 AS bucket
        FROM documents
    ),
    r AS (
        SELECT source,
               CASE WHEN src_num < 5 THEN {MIX_HI}
                    WHEN src_num < 13 THEN {MIX_MID}
                    ELSE {MIX_LO} END AS target_pct,
               bucket
        FROM t
    )
    SELECT source, target_pct,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN bucket < target_pct THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(round(sum(CASE WHEN bucket < target_pct THEN 1 ELSE 0 END) * 100.0
                      / count(*), 4) AS DOUBLE) AS realized_pct
    FROM r GROUP BY source, target_pct ORDER BY source
"""


@query("ds_mixture_weighted", oracle=_MIXTURE_ORACLE, tags=("llm", "dataset", "mixture"))
def ds_mixture_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source weighted sampling to a target mixture.
    Keep-decision = hash-bucket(doc_id, source) < tiered target rate;
    output is the per-source mixture audit (target vs realized)."""
    d = load_tables(spark, sf_dir)["documents"]
    src_num = F.substring("source", 4, 10).cast("int")
    target = (
        F.when(src_num < 5, MIX_HI).when(src_num < 13, MIX_MID).otherwise(MIX_LO)
    )
    kept = F.when(_hash_bucket(F.col("doc_id"), F.col("source")) < F.col("target_pct"), 1).otherwise(0)
    return (
        d.select("source", target.alias("target_pct"), "doc_id")
        .withColumn("keep", kept)
        .groupBy("source", "target_pct")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("keep").cast("long").alias("n_kept"),
            F.round(F.sum("keep") * 100.0 / F.count("*"), 4).cast("double").alias("realized_pct"),
        )
        .orderBy("source")
    )


_BUDGET_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, source, len(str_split(text, ' ')) AS toks
        FROM documents
    ),
    o AS (
        SELECT *, SUM(toks) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        FROM t
    )
    SELECT doc_id, source, CAST(toks AS BIGINT) AS toks,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           cum_tokens <= {TOKEN_BUDGET} AS selected
    FROM o ORDER BY doc_id
"""


@query("ds_token_budget_fill", oracle=_BUDGET_ORACLE, tags=("llm", "dataset", "budget"))
def ds_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget fill: docs are taken in deterministic
    doc_id order until the source's token budget is exhausted. Emits
    every doc with its running total and selected flag, so the hash
    check pins each inclusion decision."""
    d = load_tables(spark, sf_dir)["documents"]
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    t = d.select("doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("toks"))
    return (
        t.withColumn("cum_tokens", F.sum("toks").over(w).cast("long"))
        .withColumn("selected", F.col("cum_tokens") <= TOKEN_BUDGET)
        .orderBy("doc_id")
    )


_SHUFFLE_ORACLE = f"""
    WITH t AS (
        SELECT doc_id,
               md5(CAST(doc_id AS VARCHAR) || ':{SHUFFLE_SALT}') AS h,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{SHUFFLE_SALT}'), 1, 8))
                    AS BIGINT) % {SHUFFLE_SHARDS} AS shard
        FROM documents
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT)
               AS rank_in_shard
    FROM t ORDER BY doc_id
"""


@query("ds_global_shuffle", oracle=_SHUFFLE_ORACLE, tags=("llm", "dataset", "shuffle"))
def ds_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible training-order shuffle, sharded: shard =
    hash-bucket(doc_id, salt) % N, order within shard = rank over the
    same md5 — a pure identity function (any rerun, any cluster layout
    produces the same order), with ordering work confined to per-shard
    windows instead of one global sort."""
    d = load_tables(spark, sf_dir)["documents"]
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{SHUFFLE_SALT}")))
    shard = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % SHUFFLE_SHARDS
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        d.select("doc_id", h.alias("h"), shard.alias("shard"))
        .withColumn("rank_in_shard", F.row_number().over(w).cast("long"))
        .drop("h")
        .orderBy("doc_id")
    )


_INTERLEAVE_ORACLE = """
    WITH r AS (
        SELECT doc_id, source,
               CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) - 1 AS rk,
               CAST(dense_rank() OVER (ORDER BY source) AS BIGINT) - 1 AS src_idx
        FROM documents
    ),
    n AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_src FROM documents)
    SELECT doc_id, source,
           rk * n_src + src_idx AS interleave_pos
    FROM r, n
    ORDER BY doc_id
"""


@query("ds_interleave_sources", oracle=_INTERLEAVE_ORACLE, tags=("llm", "dataset", "mixture"))
def ds_interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-robin source interleaving for curriculum/mixture
    scheduling: position = rank_within_source × n_sources + source
    index, so consecutive training positions cycle through sources —
    the deterministic 'evenly interleave the domains' layout. One
    per-source window (bounded key) + one broadcast scalar; no global
    sort in the computation (the ORDER BY is presentation)."""
    d = load_tables(spark, sf_dir)["documents"]
    w = Window.partitionBy("source").orderBy("doc_id")
    # dense_rank over sources needs a global ordering of source names;
    # sources are a tiny domain, so derive src_idx from a broadcast
    # distinct-source table instead of a corpus-wide window.
    srcs = (
        d.select("source").distinct()
        .withColumn("src_idx", F.row_number().over(Window.orderBy("source")).cast("long") - 1)
    )
    n_src = srcs.count()
    return (
        d.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w).cast("long") - 1)
        .join(F.broadcast(srcs), "source")
        .select(
            "doc_id",
            "source",
            (F.col("rk") * F.lit(n_src) + F.col("src_idx")).alias("interleave_pos"),
        )
        .orderBy("doc_id")
    )


_PIPELINE_ORACLE = """
    WITH keep AS (  -- stage 1: exact dedup, keep min doc_id per content hash
        SELECT doc_id, text, source FROM (
            SELECT doc_id, text, source,
                   min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS keeper
            FROM documents
        ) WHERE doc_id = keeper
    ),
    q AS (  -- stage 2: quality gate (gopher mean-word-length + min tokens)
        SELECT doc_id, source, len(str_split(text, ' ')) AS toks
        FROM keep
        WHERE len(str_split(text, ' ')) >= 20
          AND list_sum(list_transform(str_split(text, ' '), t -> length(t))) * 1.0
              / len(str_split(text, ' ')) BETWEEN 3.0 AND 10.0
    ),
    s AS (  -- stage 3: deterministic split assignment
        SELECT doc_id, source, toks,
               CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM q
    )
    SELECT split, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS total_tokens
    FROM s GROUP BY split, source
    ORDER BY split, source
"""


@query("ds_pipeline_end_to_end", oracle=_PIPELINE_ORACLE, tags=("llm", "dataset", "pipeline"))
def ds_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline composed as ONE declarative plan:
    exact-dedup (min-keeper per content hash) → quality gate (token
    floor + Gopher mean word length) → deterministic split → per
    (split, source) manifest. Each stage is an operator that exists
    standalone in this registry (dedup_exact / ds_quality_cascade /
    ds_split_deterministic); composing them stays ONE Catalyst plan —
    filters and the dedup window pipeline before the final aggregate,
    nothing materializes between stages. That composability is the
    engine's core promise at 100 TB: no intermediate parquet between
    curation steps unless YOU choose to checkpoint one."""
    d = load_tables(spark, sf_dir)["documents"]
    keeper = F.min("doc_id").over(
        Window.partitionBy(F.md5(F.lower(F.trim(F.col("text")))))
    )
    keep = d.withColumn("keeper", keeper).filter(F.col("doc_id") == F.col("keeper"))
    toks = F.split("text", " ")
    n = F.size(toks)
    mean_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0).cast("long"), lambda a, x: a + x
    ) / n
    q = keep.filter((n >= 20) & mean_len.between(3.0, 10.0)).select(
        "doc_id", "source", n.cast("long").alias("toks")
    )
    from flume_source_spark.pipeline.dataset import TRAIN_PCT, VAL_PCT, split_bucket

    bucket = split_bucket(F.col("doc_id"))
    split = (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        q.withColumn("split", split)
        .groupBy("split", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("toks").cast("long").alias("total_tokens"))
        .orderBy("split", "source")
    )


PACK_SHARDS2, PACK_BUDGET2 = 8, 256

_PACK_SPANS_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, doc_id % {PACK_SHARDS2} AS shard,
               len(str_split(text, ' ')) AS toks
        FROM documents
    ),
    o AS (
        SELECT *, COALESCE(SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
        FROM t
    ),
    spans AS (
        SELECT shard, CAST(floor(start / {PACK_BUDGET2}.0) AS BIGINT) AS pack_id,
               doc_id, CAST(start % {PACK_BUDGET2} AS BIGINT) AS span_start,
               CAST(toks AS BIGINT) AS span_len
        FROM o
    )
    SELECT shard, pack_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           array_to_string(list(doc_id ORDER BY doc_id), ',') AS span_docs,
           array_to_string(list(span_start ORDER BY doc_id), ',') AS span_starts,
           array_to_string(list(span_len ORDER BY doc_id), ',') AS span_lens
    FROM spans GROUP BY shard, pack_id ORDER BY shard, pack_id
"""


@query("ds_pack_attention_spans", oracle=_PACK_SPANS_ORACLE, tags=("llm", "dataset", "packing"))
def ds_pack_attention_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pack document span lists — the attention-mask metadata a
    trainer needs to stop cross-document attention inside a packed
    sequence: for each pack, the member doc ids with their in-pack
    start offsets and lengths (start is relative to the pack the doc
    STARTS in; the concat-and-chunk contract, same layout as
    ``ds_pack_sequences``). One per-shard window + one aggregate;
    span arrays are doc_id-ordered on both engines and serialized to
    comma-joined strings so the comparison surface is scalar (the
    house canonicalization rule for array outputs — the driver's
    pandas canonicalizer cannot sort raw list columns)."""
    from pyspark.sql import Window as W

    d = load_tables(spark, sf_dir)["documents"]
    t = d.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS2).alias("shard"),
        F.size(F.split("text", " ")).alias("toks"),
    )
    w = W.partitionBy("shard").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    o = t.withColumn("start", F.coalesce(F.sum("toks").over(w), F.lit(0)))
    spans = o.select(
        "shard",
        F.floor(F.col("start") / PACK_BUDGET2).cast("long").alias("pack_id"),
        "doc_id",
        (F.col("start") % PACK_BUDGET2).cast("long").alias("span_start"),
        F.col("toks").cast("long").alias("span_len"),
    )
    pair = F.struct("doc_id", "span_start", "span_len")
    return (
        spans.groupBy("shard", "pack_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.array_sort(F.collect_list(pair)).alias("triples"),
        )
        .select(
            "shard", "pack_id", "n_spans",
            F.array_join(
                F.transform("triples", lambda s: s["doc_id"].cast("string")), ","
            ).alias("span_docs"),
            F.array_join(
                F.transform("triples", lambda s: s["span_start"].cast("string")), ","
            ).alias("span_starts"),
            F.array_join(
                F.transform("triples", lambda s: s["span_len"].cast("string")), ","
            ).alias("span_lens"),
        )
        .orderBy("shard", "pack_id")
    )
