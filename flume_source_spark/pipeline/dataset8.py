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
