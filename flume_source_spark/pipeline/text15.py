"""Text wave 15 (round 12): winnowing document fingerprints — the
MOSS local fingerprinting algorithm (Schleimer, Wilkerson & Aiken,
SIGMOD 2003) and the shared-fingerprint duplicate-pair report built
on it.

Winnowing slides a window of W consecutive k-gram hashes over each
document and keeps, per window, the MINIMUM hash — ties broken by the
RIGHTMOST occurrence (the paper's robust-winnowing tie rule). The
selected (position, hash) set is the fingerprint. Two guarantees make
it the standard local scheme: (a) every W-window contributes at least
one selection, so any shared substring of length ≥ W + K - 1 tokens
is detected (no gap longer than W between selections), and (b) the
selection of a position depends only on the W hashes around it, so
edits perturb fingerprints only locally.

Cross-engine determinism: k-gram hash = first 8 md5 hex digits as a
BIGINT (< 2^32) — the dedup_simhash_exact convention. The
rightmost-min-per-window argmin runs WITHOUT an argmin window
primitive on either engine by packing (hash, position) into one
BIGINT:

    c_p = hx_p * 2^20 + (2^20 - 1 - p)

min(c) over the window picks the smallest hash and, among equal
hashes, the LARGEST position; decode by div/mod. Positions are capped
at 2^20 - 1 grams/doc (a million-token document; over-long docs are
EXCLUDED on both engines — enforced in code, see toks) so the pack
fits a BIGINT with 2^32 * 2^20 = 2^52 headroom.

Scale shape: the only windows are per-document (partition by doc_id —
bounded by doc length, never corpus-derived); the pair report joins
CAPPED posting lists (a fingerprint hash shared by more than
``WINNOW_MAX_POSTING`` docs is a stop-gram, excluded before the
self-join — the dedup_minhash_lsh MAX_BUCKET discipline), and the
top-20 pairs ride orderBy().limit() = TakeOrderedAndProject
(per-partition partial top-k, no global sort).

Reference parity note: the reference engine (`CephFsSource.java`) has
no text surface; this operator belongs to the declared [NS] engine
surface (SURVEY.md §2.2, dedup/fingerprint family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

WINNOW_K = 3           # tokens per k-gram
WINNOW_W = 4           # hashes per winnowing window
WINNOW_MAX_POSTING = 50  # stop-gram cap on posting-list width
_POS_BITS = 20         # position pack width (max ~1M grams/doc)
_TOPK_PAIRS = 20

_PACK = 1 << _POS_BITS


def _winnow_cte() -> str:
    """DuckDB CTE chain ending in ``fp(doc_id, pos, hx)`` — the
    selected winnowing fingerprints, mirroring ``winnow_fingerprints``
    stage for stage."""
    return f"""
    toks AS (
        -- the position-pack bound enforced (len(t) < 2^{_POS_BITS}):
        -- an over-long document would corrupt the (hash, pos) pack,
        -- so it is excluded on BOTH engines rather than silently
        -- mis-fingerprinted
        SELECT doc_id, t FROM (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                               x -> length(x) > 0) AS t
            FROM documents
        ) WHERE len(t) < {_PACK}
    ),
    grams AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               CAST(('0x' || substr(md5(t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]), 1, 8))
                    AS BIGINT) AS hx
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - {WINNOW_K - 1})) AS i
              FROM toks)
    ),
    packed AS (
        SELECT doc_id, pos, hx,
               hx * {_PACK} + ({_PACK - 1} - pos) AS c,
               row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn,
               count(*) OVER (PARTITION BY doc_id) AS n
        FROM grams
    ),
    wins AS (
        SELECT doc_id,
               min(c) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW) AS cmin
        FROM packed
        QUALIFY rn >= least({WINNOW_W}, n)
    ),
    fp AS (
        SELECT DISTINCT doc_id,
               CAST({_PACK - 1} - (cmin % {_PACK}) AS BIGINT) AS pos,
               CAST(cmin // {_PACK} AS BIGINT) AS hx
        FROM wins
    )"""


_WINNOW_PROFILE_ORACLE = f"""
    WITH {_winnow_cte()},
    per_g AS (
        SELECT doc_id, CAST(max(pos) AS BIGINT) AS n_grams
        FROM grams GROUP BY doc_id
    ),
    per_f AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_selected
        FROM fp GROUP BY doc_id
    ),
    per AS (
        SELECT doc_id, n_grams, n_selected FROM per_g JOIN per_f USING (doc_id)
    )
    SELECT doc_id, n_grams, n_selected,
           CAST((n_selected * 1000000) // n_grams AS BIGINT) AS density_ppm
    FROM per
    ORDER BY doc_id
"""

_WINNOW_PAIRS_ORACLE = f"""
    WITH {_winnow_cte()},
    posting AS (
        SELECT hx, doc_id FROM fp GROUP BY hx, doc_id
    ),
    kept AS (
        SELECT hx FROM posting GROUP BY hx
        HAVING count(*) BETWEEN 2 AND {WINNOW_MAX_POSTING}
    ),
    pairs AS (
        SELECT a.doc_id AS i, b.doc_id AS j,
               CAST(count(DISTINCT a.hx) AS BIGINT) AS shared_fps
        FROM posting a
        JOIN kept USING (hx)
        JOIN posting b ON a.hx = b.hx AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT i, j, shared_fps FROM pairs
    ORDER BY shared_fps DESC, i, j
    LIMIT {_TOPK_PAIRS}
"""


def winnow_fingerprints(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """Core winnowing fold over a (doc_id, text) frame → selected
    fingerprint rows (doc_id, pos, hx). Factored so closed-form model
    tests (the W-gap coverage guarantee, the rightmost tie rule on an
    all-equal-hash document, locality under a planted edit) drive the
    production stages.

    Plan: explode k-grams (map-side), one exchange on doc_id for the
    per-doc window, distinct on the selected set. No corpus-scale
    window — the partition key is doc_id, the frame is W rows.
    """
    from pyspark.sql import Window

    toks = (
        docs.select(
            "doc_id",
            F.filter(
                F.split(F.lower("text"), "[^a-z]+"), lambda x: F.length(x) > 0
            ).alias("t"),
        )
        .filter(F.size("t") >= k)
        # enforce the position-pack bound (module docstring): a doc
        # with ≥ 2^20 tokens would corrupt the (hash, pos) pack —
        # excluded on both engines, never silently mis-fingerprinted
        .filter(F.size("t") < _PACK)
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {k - 1}),"
                f" i -> struct(CAST(i AS BIGINT) AS pos,"
                f"  CAST(conv(substring(md5(concat_ws(' ',"
                f"   t[i - 1], t[i], t[i + 1])), 1, 8), 16, 10)"
                f"   AS BIGINT) AS hx))"
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.pos").alias("pos"), F.col("g.hx").alias("hx"))
    packed = grams.select(
        "doc_id",
        "pos",
        (F.col("hx") * _PACK + (_PACK - 1 - F.col("pos"))).alias("c"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    frame = win.rowsBetween(-(w - 1), Window.currentRow)
    sel = (
        packed.select(
            "doc_id",
            F.row_number().over(win).alias("rn"),
            F.count("*").over(Window.partitionBy("doc_id")).alias("n"),
            F.min("c").over(frame).alias("cmin"),
        )
        .filter(F.col("rn") >= F.least(F.lit(w), F.col("n")))
        .select(
            "doc_id",
            (F.lit(_PACK - 1) - F.col("cmin") % _PACK).cast("long").alias("pos"),
            F.expr(f"CAST(cmin div {_PACK} AS BIGINT)").alias("hx"),
        )
        .distinct()
    )
    return sel


@query(
    "text_winnowing_profile",
    oracle=_WINNOW_PROFILE_ORACLE,
    tags=("llm", "text", "fingerprint", "dedup"),
)
def text_winnowing_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowing fingerprint profile: k-gram count,
    selected-fingerprint count, and selection density in exact floored
    ppm (the paper's expected density for random hashes is
    2/(W+1) ≈ 400,000 ppm at W=4 — the profile is how a real corpus
    is checked against that design point)."""
    d = load_tables(spark, sf_dir)["documents"]
    fp = winnow_fingerprints(d.select("doc_id", "text"))
    n_grams = (
        d.select(
            "doc_id",
            F.filter(
                F.split(F.lower("text"), "[^a-z]+"), lambda x: F.length(x) > 0
            ).alias("t"),
        )
        .filter(F.size("t") >= WINNOW_K)
        .select(
            "doc_id",
            (F.size("t") - (WINNOW_K - 1)).cast("long").alias("n_grams"),
        )
    )
    per = fp.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_selected"))
    return (
        n_grams.join(per, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            "n_selected",
            F.expr("CAST((n_selected * 1000000) div n_grams AS BIGINT)").alias(
                "density_ppm"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "text_winnowing_dup_pairs",
    oracle=_WINNOW_PAIRS_ORACLE,
    tags=("llm", "text", "fingerprint", "dedup"),
)
def text_winnowing_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 document pairs by shared winnowing fingerprints — the
    MOSS overlap report. Any shared run of ≥ W + K - 1 = 7 tokens
    forces at least one shared fingerprint (the winnowing coverage
    guarantee), so this surfaces copy-paste pairs the whole-document
    hash misses. Stop-gram cap: a fingerprint in more than
    ``WINNOW_MAX_POSTING`` docs is boilerplate and is excluded before
    the posting self-join (bounded pair fan-out); top-20 via
    orderBy().limit() = TakeOrderedAndProject."""
    d = load_tables(spark, sf_dir)["documents"]
    fp = winnow_fingerprints(d.select("doc_id", "text"))
    posting = fp.select("hx", "doc_id").distinct()
    kept = (
        posting.groupBy("hx")
        .agg(F.count("*").alias("width"))
        .filter((F.col("width") >= 2) & (F.col("width") <= WINNOW_MAX_POSTING))
        .select("hx")
    )
    p = posting.join(F.broadcast(kept), "hx")
    pairs = (
        p.alias("a")
        .join(p.alias("b"), "hx")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j")
        )
        .agg(F.count_distinct("hx").cast("long").alias("shared_fps"))
    )
    return pairs.orderBy(
        F.col("shared_fps").desc(), "i", "j"
    ).limit(_TOPK_PAIRS)
