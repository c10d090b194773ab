"""Dataset-prep wave 8: release QA — the two audits a curation
pipeline runs BEFORE publishing a corpus snapshot.

``ds_snapshot_diff`` — dataset version diff: when a curation rule
changes between runs, the release note needs what changed — how many
documents each source gained, lost, and kept. The operator is the
content-id full-outer-join classification (``snapshot_diff``, any two
document frames); the registry query instantiates it on two
deterministic rule versions of the fixture corpus so the whole diff
is hash-checkable cross-engine.

``ds_k_anonymity_audit`` — re-identification risk audit: released
metadata columns (language, source, length bucket) form
quasi-identifier equivalence classes; documents in classes smaller
than K are linkage-attack candidates (Sweeney's k-anonymity). The
audit reports, per language, how many classes and documents sit below
the K threshold — the go/no-go number a release review reads.
``text_pii_scrub`` removes direct identifiers; this measures the
INDIRECT ones that scrubbing cannot touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# Rule versions instantiating the diff query: v2 raises the length
# floor but admits all Chinese documents (a deliberately non-nested
# change so the diff has all three classes populated).
RULE_V1_MIN_CHARS = 200
RULE_V2_MIN_CHARS = 300

# k-anonymity parameters: QI length bucket width and the class-size
# threshold under which a document counts as at-risk.
KANON_BUCKET = 100
KANON_K = 5


def snapshot_diff(
    a: DataFrame, b: DataFrame, key: str = "doc_id", group_col: str = "source"
) -> DataFrame:
    """Classify every key in either snapshot as added (B only),
    removed (A only), or common, rolled up by ``group_col`` (both
    frames must carry ``key`` and ``group_col``; everything else is
    ignored). One full-outer shuffle join on the content id — at
    100 TB both snapshots hash-partition on the same key (bucketed
    snapshots co-locate and skip the exchange entirely), and the
    per-group rollup is map-side combinable."""
    an = a.select(F.col(key).alias("a_key"), F.col(group_col).alias("a_grp"))
    bn = b.select(F.col(key).alias("b_key"), F.col(group_col).alias("b_grp"))
    joined = an.join(bn, an.a_key == bn.b_key, "full_outer")
    return (
        joined.select(
            F.coalesce("a_grp", "b_grp").alias(group_col),
            F.when(F.col("a_key").isNull(), 1).otherwise(0).alias("is_added"),
            F.when(F.col("b_key").isNull(), 1).otherwise(0).alias("is_removed"),
            F.when(F.col("a_key").isNotNull() & F.col("b_key").isNotNull(), 1)
            .otherwise(0)
            .alias("is_common"),
        )
        .groupBy(group_col)
        .agg(
            F.sum("is_added").cast("long").alias("n_added"),
            F.sum("is_removed").cast("long").alias("n_removed"),
            F.sum("is_common").cast("long").alias("n_common"),
        )
    )


@query(
    "ds_snapshot_diff",
    oracle=f"""
    WITH a AS (
        SELECT doc_id, source FROM documents WHERE n_chars >= {RULE_V1_MIN_CHARS}
    ),
    b AS (
        SELECT doc_id, source FROM documents
        WHERE n_chars >= {RULE_V2_MIN_CHARS} OR lang = 'zh'
    )
    SELECT COALESCE(a.source, b.source) AS source,
           CAST(SUM(CASE WHEN a.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
           CAST(SUM(CASE WHEN b.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           CAST(SUM(CASE WHEN a.doc_id IS NOT NULL AND b.doc_id IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_common
    FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    GROUP BY 1
    ORDER BY source
    """,
    tags=("llm", "dataset", "release"),
)
def ds_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source added/removed/kept counts between two rule versions
    of the corpus (v1: length floor 200; v2: floor 300 but all zh
    admitted — non-nested on purpose so
    every diff class is exercised). The snapshots here derive from one
    scan of the same table; in production they are two stored runs and
    the plan below is unchanged — that generality lives in
    ``snapshot_diff``, which this query instantiates."""
    docs = load_tables(spark, sf_dir)["documents"]
    a = docs.where(F.col("n_chars") >= RULE_V1_MIN_CHARS)
    b = docs.where(
        (F.col("n_chars") >= RULE_V2_MIN_CHARS) | (F.col("lang") == "zh")
    )
    return snapshot_diff(a, b).orderBy("source")


@query(
    "ds_k_anonymity_audit",
    oracle=f"""
    WITH classes AS (
        SELECT lang, source, (n_chars // {KANON_BUCKET}) * {KANON_BUCKET} AS len_bucket,
               COUNT(*) AS class_size
        FROM documents
        GROUP BY 1, 2, 3
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN class_size < {KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
               AS at_risk_classes,
           CAST(SUM(CASE WHEN class_size < {KANON_K} THEN class_size ELSE 0 END)
                AS BIGINT) AS at_risk_docs,
           CAST(MIN(class_size) AS BIGINT) AS min_class_size
    FROM classes
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("llm", "dataset", "privacy"),
)
def ds_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity over the released quasi-identifiers (lang, source,
    100-char length bucket): per language, the number of
    equivalence classes, how many fall below K=5, how many
    documents those expose, and the worst class size. Two chained
    aggregations, both map-side combinable (first keyed by the QI
    tuple, second by language — strictly fewer keys), zero joins; at
    100 TB this is one shuffle of QI-partial counts whose key space is
    the QI cardinality, not the corpus. `//`-vs-`div` floor semantics
    agree because n_chars is non-negative (house rule, env-limits)."""
    docs = load_tables(spark, sf_dir)["documents"]
    classes = (
        docs.select(
            "lang",
            "source",
            (F.expr(f"n_chars div {KANON_BUCKET}") * KANON_BUCKET).alias("len_bucket"),
        )
        .groupBy("lang", "source", "len_bucket")
        .agg(F.count("*").alias("class_size"))
    )
    at_risk = F.col("class_size") < KANON_K
    return (
        classes.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_classes"),
            F.sum(F.when(at_risk, 1).otherwise(0)).cast("long").alias("at_risk_classes"),
            F.sum(F.when(at_risk, F.col("class_size")).otherwise(0))
            .cast("long")
            .alias("at_risk_docs"),
            F.min("class_size").cast("long").alias("min_class_size"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Shard-key skew audit (round 9, session 3). Before writing a corpus
# as K shards (or bucketing a join) on a proposed key, measure how the
# key actually balances: per shard, the row count and its signed
# deviation from the ideal total/K in permyriad. At 100 TB a 10% hot
# shard is a straggler executor on every downstream stage, so this is
# the go/no-go a partitioning decision reads — the write-side
# companion to skew_salted_aggregation (which REPAIRS skew after this
# audit finds it).
#
# Key under audit: the house portable md5 hash of doc_id mod K=32
# (the hash a content-addressed shard layout would use). Deviation is
# sign-split integral div (Spark trunc == DuckDB floor on the
# non-negative magnitude); n_docs*K*10000 fits BIGINT to ~2.8e13 rows
# per shard. Scale: one map-side-combinable groupBy onto K keys plus
# a broadcast-able 1-row total.
# ---------------------------------------------------------------------------

_SHARD_K = 32

_SHARD_SKEW_ORACLE = f"""
    WITH s AS (
        SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
               % {_SHARD_K} AS shard
        FROM documents
    ),
    c AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs FROM s GROUP BY shard),
    t AS (SELECT sum(n_docs) AS total FROM c)
    SELECT c.shard, c.n_docs,
           CAST(CASE WHEN c.n_docs * {_SHARD_K} >= t.total
                     THEN (c.n_docs * {_SHARD_K} - t.total) * 10000 // t.total
                     ELSE -((t.total - c.n_docs * {_SHARD_K}) * 10000 // t.total)
                END AS BIGINT) AS dev_permyriad
    FROM c, t ORDER BY c.shard
"""


def shard_skew_from(shards: DataFrame, k: int = _SHARD_K) -> DataFrame:
    """Core skew fold over a one-column ``shard`` frame: per-shard
    count + signed permyriad deviation from the ideal total/k.
    Factored so planted-balance model tests (uniform -> all 0,
    one hot shard -> positive dev there, negative elsewhere) drive
    the production arithmetic."""
    c = shards.groupBy("shard").agg(F.count("*").cast("long").alias("n_docs"))
    t = c.agg(F.sum("n_docs").alias("total"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "shard",
            "n_docs",
            F.expr(
                f"CAST(CASE WHEN n_docs * {k} >= total"
                f" THEN (n_docs * {k} - total) * 10000 div total"
                f" ELSE -((total - n_docs * {k}) * 10000 div total)"
                f" END AS BIGINT)"
            ).alias("dev_permyriad"),
        )
        .orderBy("shard")
    )


@query("ds_shard_skew_audit", oracle=_SHARD_SKEW_ORACLE, tags=("llm", "dataset", "audit"))
def ds_shard_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard balance of the md5(doc_id) mod 32 layout: row count
    and signed permyriad deviation from the ideal total/32. Read
    max |dev| before committing a shard layout; feed hot keys to the
    salting levers if it exceeds the straggler budget."""
    d = load_tables(spark, sf_dir)["documents"]
    shard = F.expr(
        f"CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
        f" % {_SHARD_K}"
    )
    return shard_skew_from(d.select(shard.alias("shard")))


# ---------------------------------------------------------------------------
# l-diversity audit (round 9, session 3): the k-anonymity companion.
# k-anonymity counts SMALL quasi-identifier classes; l-diversity
# catches the orthogonal leak — a class can be large (k-safe) yet
# have every member share the same SENSITIVE value, so the attacker
# learns it anyway (Machanavajjhala et al. 2007). QI = (lang,
# len_bucket), sensitive = source: a class whose documents all come
# from ONE source reveals provenance to anyone who knows the QI.
# Reported per language: class count, the minimum diversity, and how
# many classes / documents sit below L = 2 distinct sources.
#
# Exact integers end-to-end; one groupBy onto QI keys (count +
# count-distinct over the bounded source domain), one per-language
# rollup. Same shuffle envelope as ds_k_anonymity_audit.
# ---------------------------------------------------------------------------

LDIV_L = 2

_LDIV_ORACLE = f"""
    WITH cls AS (
        SELECT lang, (n_chars // {KANON_BUCKET}) * {KANON_BUCKET} AS len_bucket,
               CAST(count(*) AS BIGINT) AS class_size,
               CAST(count(DISTINCT source) AS BIGINT) AS diversity
        FROM documents GROUP BY 1, 2
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(diversity) AS BIGINT) AS min_diversity,
           CAST(sum(CASE WHEN diversity < {LDIV_L} THEN 1 ELSE 0 END) AS BIGINT)
               AS low_div_classes,
           CAST(sum(CASE WHEN diversity < {LDIV_L} THEN class_size ELSE 0 END)
               AS BIGINT) AS docs_at_risk
    FROM cls GROUP BY lang ORDER BY lang
"""


@query("ds_l_diversity_audit", oracle=_LDIV_ORACLE, tags=("llm", "dataset", "audit"))
def ds_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-l-diversity over the release QI (lang, 100-char length
    bucket) with source as the sensitive attribute: per language, the
    classes (and documents) whose members all share one source — the
    provenance leak k-anonymity cannot see because the class is big
    enough to pass K."""
    d = load_tables(spark, sf_dir)["documents"]
    cls = d.groupBy(
        "lang",
        (F.expr(f"n_chars div {KANON_BUCKET}") * KANON_BUCKET).alias("len_bucket"),
    ).agg(
        F.count("*").cast("long").alias("class_size"),
        F.countDistinct("source").cast("long").alias("diversity"),
    )
    return (
        cls.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_classes"),
            F.min("diversity").cast("long").alias("min_diversity"),
            F.sum(F.when(F.col("diversity") < LDIV_L, 1).otherwise(0))
            .cast("long")
            .alias("low_div_classes"),
            F.sum(F.when(F.col("diversity") < LDIV_L, F.col("class_size")).otherwise(0))
            .cast("long")
            .alias("docs_at_risk"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Near-dup rate by language (round 10): the curation-dashboard rollup
# of the dedup machinery — per lang, how much of the corpus sits in a
# near-duplicate pair? The number that decides WHERE dedup budget
# goes (a lang with 20% near-dup rate gets the aggressive pass; one
# at 0.1% doesn't) and the drift alarm when one crawl source starts
# recycling content. Pairs come from the production MinHash-LSH path
# (banded candidates + exact verify — dedup_minhash_lsh's plan, equal
# to the exact join on this corpus by the module's probability
# argument); the oracle is the exact shingle-Jaccard join + the same
# rollup. A doc counts as duplicated if it appears in ANY qualifying
# pair (cross-lang pairs count for both sides' langs).
#
# Scale: the LSH pair set is the bounded banded plan; the rollup is
# one union + distinct on the (rare) pair endpoints, one broadcast
# join back to the narrow (doc_id, lang) projection, and a
# map-side-combinable per-lang fold.
# ---------------------------------------------------------------------------

_NEARDUP_RATE_ORACLE = """
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
                      for i in generate_series(1, len(toks)-2)])) AS shingle
        FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT i, j FROM inter
              JOIN sz sa ON i = sa.doc_id
              JOIN sz sb ON j = sb.doc_id
              WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5),
    dup AS (SELECT DISTINCT doc_id FROM (
        SELECT i AS doc_id FROM pairs UNION ALL SELECT j FROM pairs))
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(dup.doc_id) AS BIGINT) AS n_dup_docs,
           CAST(count(dup.doc_id) * 1000000 // count(*) AS BIGINT) AS dup_ppm
    FROM documents d LEFT JOIN dup ON d.doc_id = dup.doc_id
    GROUP BY d.lang
    ORDER BY d.lang
"""


@query(
    "ds_neardup_rate_by_lang",
    oracle=_NEARDUP_RATE_ORACLE,
    tags=("llm", "dataset", "dedup", "report"),
)
def ds_neardup_rate_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language near-duplicate exposure: fraction of docs (exact
    ppm) appearing in at least one Jaccard ≥ 0.5 near-dup pair, pairs
    found by the production banded-LSH + exact-verify plan. The
    curation dashboard's budget-allocation number."""
    from flume_source_spark.pipeline.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir).select("i", "j")
    dup = (
        pairs.select(F.col("i").alias("doc_id"))
        .unionAll(pairs.select(F.col("j").alias("doc_id")))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "lang")
    return (
        d.join(F.broadcast(dup), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count("is_dup").cast("long").alias("n_dup_docs"),
        )
        .select(
            "lang",
            "n_docs",
            "n_dup_docs",
            F.expr("CAST(n_dup_docs * 1000000 div n_docs AS BIGINT)").alias(
                "dup_ppm"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Snake-striped shard balancing (round 10): ds_shard_skew_audit
# MEASURES layout imbalance; this is the REPAIR. Hash sharding
# balances COUNTS but not WEIGHTS — a shard that drew the long
# documents straggles even at equal row counts. The standard fix for
# batch/shard packing is the snake stripe: rank items by weight
# descending, then deal rank r to shard s(r) = r' if r' < K else
# 2K−1−r' with r' = (r−1) mod 2K — the boustrophedon order that
# pairs each shard's heavy pick with a light pick every full pass
# (for sorted weights its worst-case spread beats round-robin's by
# construction; it is the deterministic, shuffle-free approximation
# of LPT greedy, which needs a sequential heap and does not
# distribute).
#
# Output per shard: doc count, weight (char) sum, and the signed
# permyriad deviation from the ideal total/K — the same deviation
# convention the audit uses, so "audit says ±X, snake achieves ±Y"
# reads off directly.
#
# Scale (round 11): the weight-descending rank is the distributed
# global-order helper (flume_source_spark/global_order.py) — exact
# row_number via boundary-bucketed two-level rank, no single-partition
# sort anywhere in the plan. The snake shard depends only on
# rank mod 2K, so the offset arithmetic distributes. Assignment
# itself is map-side; the rollup is K rows.
# ---------------------------------------------------------------------------

_SNAKE_ORACLE = f"""
    WITH ranked AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
               row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
        FROM documents
    ),
    assigned AS (
        SELECT doc_id, w,
               CASE WHEN (r - 1) % {2 * _SHARD_K} < {_SHARD_K}
                    THEN (r - 1) % {2 * _SHARD_K}
                    ELSE {2 * _SHARD_K} - 1 - ((r - 1) % {2 * _SHARD_K})
               END AS shard
        FROM ranked
    ),
    per AS (
        SELECT shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(w) AS BIGINT) AS w_sum
        FROM assigned GROUP BY shard
    ),
    tot AS (SELECT CAST(sum(w_sum) AS BIGINT) AS total FROM per)
    SELECT CAST(p.shard AS BIGINT) AS shard, p.n_docs, p.w_sum,
           CAST(CASE WHEN p.w_sum * {_SHARD_K} >= t.total
                     THEN (p.w_sum * {_SHARD_K} - t.total) * 10000 // t.total
                     ELSE -((t.total - p.w_sum * {_SHARD_K}) * 10000 // t.total)
                END AS BIGINT) AS dev_permyriad
    FROM per p CROSS JOIN tot t
    ORDER BY shard
"""


def snake_balance(weighted: DataFrame, k: int = _SHARD_K) -> DataFrame:
    """Core snake-stripe assignment + balance rollup over a
    ``(doc_id, w)`` frame. Factored so model tests (uniform weights →
    near-zero deviation; adversarial geometric weights → snake beats
    the md5-hash layout's weight spread) drive the production rank
    and assignment arithmetic. Round 11: the weight-descending rank is
    the DISTRIBUTED global-order helper (bucket key ``-w`` — negation
    makes the ascending boundary bucketing monotone in the DESC
    order), closing ADVICE r10 item 3: the shard depends only on
    rank mod 2K, so the rank-offset recipe distributes and the shipped
    path now uses it. Bit-identical to the unchanged window oracle."""
    from flume_source_spark.global_order import with_global_rank

    ranked = with_global_rank(
        weighted.select("doc_id", "w"),
        [F.col("w").desc(), F.col("doc_id")],
        -F.col("w"),
        rank_col="r",
    )
    assigned = ranked.select(
        "doc_id",
        "w",
        F.expr(
            f"CAST(CASE WHEN (r - 1) % {2 * k} < {k}"
            f" THEN (r - 1) % {2 * k}"
            f" ELSE {2 * k} - 1 - ((r - 1) % {2 * k}) END AS BIGINT)"
        ).alias("shard"),
    )
    per = assigned.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("w_sum"),
    )
    tot = per.agg(F.sum("w_sum").cast("long").alias("total"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "n_docs",
            "w_sum",
            F.expr(
                f"CAST(CASE WHEN w_sum * {k} >= total"
                f" THEN (w_sum * {k} - total) * 10000 div total"
                f" ELSE -((total - w_sum * {k}) * 10000 div total)"
                f" END AS BIGINT)"
            ).alias("dev_permyriad"),
        )
        .orderBy("shard")
    )


@query(
    "ds_shard_snake_balance",
    oracle=_SNAKE_ORACLE,
    tags=("llm", "dataset", "layout"),
)
def ds_shard_snake_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-balanced K=32 shard layout by snake striping documents
    in descending length order — the repair for the weight imbalance
    ds_shard_skew_audit measures: per shard, doc count, char weight,
    and signed permyriad deviation from ideal (reads directly against
    the audit's deviation column)."""
    d = load_tables(spark, sf_dir)["documents"]
    return snake_balance(
        d.select("doc_id", F.col("n_chars").cast("long").alias("w"))
    )
