"""Approximation-quality AUDIT operators — measured precision/recall
for the two approximate families (MinHash-LSH dedup, IVF ANN), as
first-class hash-checkable queries.

The round-6 "rows-only policy" closed every approximate operator with
an exact TWIN pinning its machinery cross-engine. These audits are the
next discipline level: not "does the machinery compute what it says"
but "how good is the approximation against ground truth, measured
inside the engine, reproducibly". A 100 TB curation pipeline runs
exactly this shape before trusting an LSH/ANN config at a new scale:

- ``dedup_lsh_recall_audit`` — on a DETERMINISTIC md5-bucket sample
  of documents (the ds_deterministic_sample gate: same docs every
  engine/run/cluster), compute exact-Jaccard truth pairs AND
  portable-MinHash LSH candidate pairs, and report integer
  precision/recall. The exact stage is C(s, 2)-bounded by the SAMPLE
  (a budget constant, not a corpus fraction), which is what makes a
  recall audit affordable at any corpus size: the full-corpus exact
  join that the audit grades is precisely the thing you cannot run.
- ``sim_ann_recall_audit`` — recall@k of the integer-lattice IVF twin
  (``sim_ann_ivf_exact``) against brute-force exact top-k over the
  SAME quantized vectors and scoring order. Per-query integer hit
  counts: the standard recall@k table every ANN deployment publishes.
  The exact side costs one corpus scan per audit over a Q_MAX-bounded
  broadcast query panel — linear, run per config change, amortized
  across the queries it certifies.

Both audits are integer-only outputs hashed against DuckDB oracles —
the audit itself is oracled, so "LSH recall on this corpus is X" is a
cross-engine-verified number, not a trust-me metric.

Reference parity note: the reference engine (CephFsSource.java:29-171)
has no dedup/ANN surface; these belong to the declared [NS] engine
scope (SURVEY.md §2.2) alongside the operators they audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.dedup import shingle_col, spread
from flume_source_spark.pipeline.similarity import _QWHERE_SQL, _dvec, _query_filter
from flume_source_spark.pipeline.similarity2 import (
    _IVFX_CTES,
    IVFX_TOP_K,
    sim_ann_ivf_exact,
)
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# ---------------------------------------------------------------------------
# dedup_lsh_recall_audit
# ---------------------------------------------------------------------------

# Portable MinHash: h_i(s) = (a_i·x + b_i) mod p over
# x = md5int(shingle) mod 2^30 (the house portable token hash —
# conv(substr(md5,1,8),16,10) on Spark == CAST('0x'||… AS BIGINT) on
# DuckDB). The production operator (dedup_minhash_lsh) hashes with
# xxhash64, which only Spark has; the audit's band structure must be
# reproducible on BOTH engines, so it uses the md5 token hash — the
# same swap dedup_simhash_exact made for the SimHash family.
# Closed-form lattice parameters (no RNG): a_i odd-ish and nonzero,
# b_i arbitrary; products stay in BIGINT (x < 2^30, a < 2^31 → < 2^61).
AUDIT_P = (1 << 31) - 1
AUDIT_N_HASHES = 12
AUDIT_BANDS = 4
AUDIT_ROWS = 3  # bands × rows = hashes; P(cand|J) = 1-(1-J^3)^4
_AUDIT_AB = [
    ((1 + i * 131071) % (AUDIT_P - 1) + 1, (8191 + i * 524287) % AUDIT_P)
    for i in range(AUDIT_N_HASHES)
]
AUDIT_SAMPLE_MOD = 10
AUDIT_SAMPLE_KEEP = 3  # deterministic 30% document sample (rate mode)
AUDIT_TAU = 0.5  # truth threshold: exact Jaccard ≥ τ
# Fixed-SIZE sample budget (round 8, VERDICT r7 item 4): the REGISTERED
# default. The gate keeps ~AUDIT_SAMPLE_BUDGET docs regardless of
# corpus size by growing the modulus with N — mod = ⌈N·KEEP/BUDGET⌉ —
# so audit cost is the budget, not a corpus fraction (SCALE.md part 5
# measured the fixed 30% RATE at 1.66× on 8× docs vs 0.71× FLAT for
# fixed SIZE — the 100 TB operating mode). BUDGET = 150 makes the
# budget gate EXACTLY the historical mod-10-keep-3 gate at the 500-doc
# fixtures (500·3//150 = 10), so sf0.001/sf0.01 results are unchanged;
# at sf0.1 (5000 docs) the modulus self-scales to 100 (~150-doc
# sample) and at any larger N the audit stays budget-bounded.
AUDIT_SAMPLE_BUDGET = 150

_SQL_MD5INT_DOC = (
    f"CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"
)

_AUDIT_MINS_SQL = ",\n               ".join(
    f"min((hx * {a} + {b}) % {AUDIT_P}) AS h{i}"
    for i, (a, b) in enumerate(_AUDIT_AB)
)
_AUDIT_BANDS_SQL = "\n        UNION ALL\n        ".join(
    "SELECT doc_id, {band} AS band, concat_ws('|', {hs}) AS sig FROM sig".format(
        band=band,
        hs=", ".join(f"h{band * AUDIT_ROWS + r}" for r in range(AUDIT_ROWS)),
    )
    for band in range(AUDIT_BANDS)
)

_LSH_AUDIT_ORACLE = f"""
    WITH smod AS (
        SELECT greatest((count(*) * {AUDIT_SAMPLE_KEEP})
                        // {AUDIT_SAMPLE_BUDGET}, 1) AS m
        FROM documents
    ),
    sample_docs AS MATERIALIZED (
        SELECT doc_id, text FROM documents
        WHERE {_SQL_MD5INT_DOC} % (SELECT m FROM smod) < {AUDIT_SAMPLE_KEEP}
    ),
    sh AS MATERIALIZED (
        SELECT doc_id,
               unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
                      for i in generate_series(1, len(toks)-2)])) AS shingle
        FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM sample_docs)
    ),
    hashed AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) % {1 << 30} AS hx
        FROM sh
    ),
    sig AS MATERIALIZED (
        SELECT doc_id,
               {_AUDIT_MINS_SQL}
        FROM hashed GROUP BY doc_id
    ),
    bands AS ({_AUDIT_BANDS_SQL}),
    cand AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    truth AS MATERIALIZED (
        SELECT i, j FROM (
            SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2) t
        JOIN sz sa ON t.i = sa.doc_id
        JOIN sz sb ON t.j = sb.doc_id
        WHERE c * 1.0 / (sa.n + sb.n - c) >= {AUDIT_TAU}
    ),
    hit AS (SELECT t.i, t.j FROM truth t JOIN cand c ON t.i = c.i AND t.j = c.j)
    SELECT CAST((SELECT count(*) FROM sample_docs) AS BIGINT) AS n_docs,
           CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_cand,
           CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_hit,
           CAST((SELECT count(*) FROM hit) * 1000000
                // greatest((SELECT count(*) FROM cand), 1) AS BIGINT)
               AS precision_ppm,
           CAST((SELECT count(*) FROM hit) * 1000000
                // greatest((SELECT count(*) FROM truth), 1) AS BIGINT)
               AS recall_ppm
"""


def _md5int(col):
    """Portable 32-bit md5 integer (house idiom, never negative)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def lsh_audit_counts(docs: DataFrame, tau: float = AUDIT_TAU) -> DataFrame:
    """Core audit over a (doc_id, text) frame: exact-Jaccard truth
    pairs vs portable-MinHash band candidates, one integer summary row
    (n_docs, n_true, n_cand, n_hit, precision_ppm, recall_ppm)."""
    # persist the exploded shingle frame: it feeds the signature path,
    # the size table, AND both sides of the truth join — without
    # persist the (expensive) shingling recomputes 4× (the
    # dedup_minhash_lsh lesson, dedup.py:268)
    sh = docs.select(
        "doc_id", F.explode(shingle_col(F.col("text"))).alias("shingle")
    ).persist()
    hashed = sh.select("doc_id", (_md5int(F.col("shingle")) % (1 << 30)).alias("hx"))
    sig = hashed.groupBy("doc_id").agg(
        *[
            F.min((F.col("hx") * a + b) % AUDIT_P).alias(f"h{i}")
            for i, (a, b) in enumerate(_AUDIT_AB)
        ]
    )
    stack_args = ", ".join(
        "{band}, concat_ws('|', {hs})".format(
            band=band,
            hs=", ".join(f"h{band * AUDIT_ROWS + r}" for r in range(AUDIT_ROWS)),
        )
        for band in range(AUDIT_BANDS)
    )
    bands = sig.select(
        "doc_id", F.expr(f"stack({AUDIT_BANDS}, {stack_args}) AS (band, sig)")
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
        .distinct()
    )
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        sh.select(F.col("doc_id").alias("i"), "shingle")
        .join(sh.select(F.col("doc_id").alias("j"), "shingle"), "shingle")
        .filter(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count("*").alias("c"))
    )
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    truth = (
        inter.join(sz.select(F.col("doc_id").alias("i"), F.col("n").alias("na")), "i")
        .join(sz.select(F.col("doc_id").alias("j"), F.col("n").alias("nb")), "j")
        .filter(jac >= tau)
        .select("i", "j")
    )
    hit = truth.join(cand, ["i", "j"])
    counts = (
        docs.agg(F.count("*").cast("long").alias("n_docs"))
        .crossJoin(truth.agg(F.count("*").cast("long").alias("n_true")))
        .crossJoin(cand.agg(F.count("*").cast("long").alias("n_cand")))
        .crossJoin(hit.agg(F.count("*").cast("long").alias("n_hit")))
    )
    out = counts.select(
        "n_docs",
        "n_true",
        "n_cand",
        "n_hit",
        (F.col("n_hit") * 1000000 / F.greatest(F.col("n_cand"), F.lit(1)))
        .cast("long")
        .alias("precision_ppm"),
        (F.col("n_hit") * 1000000 / F.greatest(F.col("n_true"), F.lit(1)))
        .cast("long")
        .alias("recall_ppm"),
    )
    # materialize the 1-row summary eagerly so the sample-sized
    # shingle cache can be RELEASED here instead of leaking one
    # persisted frame per call (bench runs this builder 3-4×; the
    # leaked blocks would survive the whole session — the same leak
    # class semdedup_decisions fixes via unpersist-after-checkpoint)
    out = out.localCheckpoint(eager=True)
    sh.unpersist(blocking=False)
    return out


def budget_sample(d: DataFrame, budget: int = AUDIT_SAMPLE_BUDGET) -> DataFrame:
    """Deterministic fixed-SIZE md5-bucket document sample: the gate's
    modulus self-scales with the corpus (mod = max(N·KEEP//budget, 1))
    so ~``budget`` docs pass at ANY corpus size. The modulus is a
    1-row broadcast scalar (one count aggregate), the gate itself a
    map-side filter — no shuffle, no driver collect."""
    smod = d.agg(F.count("*").alias("n")).select(
        F.greatest(
            F.expr(f"div(n * {AUDIT_SAMPLE_KEEP}, {budget})"), F.lit(1).cast("long")
        ).alias("m")
    )
    return (
        d.crossJoin(F.broadcast(smod))
        .where(
            (_md5int(F.col("doc_id").cast("string")) % F.col("m"))
            < AUDIT_SAMPLE_KEEP
        )
        .select("doc_id", "text")
    )


@query(
    "dedup_lsh_recall_audit",
    oracle=_LSH_AUDIT_ORACLE,
    tags=("llm", "dedup", "lsh", "audit"),
)
def dedup_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH dedup quality audit on a deterministic FIXED-SIZE md5-bucket
    document sample (budget ≈ 150 docs; modulus self-scales with N —
    the registered default is the budget mode, VERDICT r7 item 4):
    exact-Jaccard (τ = 0.5) truth pairs vs portable-MinHash band
    candidates (12 hashes = 4 bands × 3 rows, P(cand|J) = 1−(1−J³)⁴
    ≈ 0.99 at the corpus's planted J ≥ 0.88), reported as one integer
    row — n_docs, n_true, n_cand, n_hit, precision_ppm, recall_ppm.

    100 TB shape: the sample gate is a map-side scan filter whose
    modulus grows with N so the absolute sample size s stays at the
    budget — audit cost is O(budget²) shingle work, independent of
    corpus size (SCALE.md part 5: fixed RATE grew 1.66× on 8× docs;
    fixed SIZE measured FLAT at 0.71×). Every stage after the gate is
    bounded by s, not N: the truth join is the Σ_shingle |docs|²
    shared-shingle join RESTRICTED to the sample; the candidate join
    is banded. The audit certifies the production band config
    (dedup_minhash_lsh) before a full-corpus run — recall here is an
    unbiased estimate of full-corpus recall because the gate is
    content-addressed, not partition-correlated. A fixed-RATE override
    stays available by passing a pre-sampled frame straight to
    ``lsh_audit_counts``."""
    d = spread(load_tables(spark, sf_dir)["documents"])
    return lsh_audit_counts(budget_sample(d))


# ---------------------------------------------------------------------------
# sim_ann_recall_audit
# ---------------------------------------------------------------------------

_ANN_AUDIT_ORACLE = f"""
    WITH {_IVFX_CTES},
    ivf_topk AS MATERIALIZED (
        SELECT qid, cid FROM ranked WHERE rn <= {IVFX_TOP_K}
    ),
    exact_scored AS (
        SELECT q.vec_id AS qid, c.vec_id AS cid,
               CAST(list_dot_product(
                   list_transform(q.xq, x -> CAST(x AS DOUBLE)),
                   list_transform(c.xq, x -> CAST(x AS DOUBLE))) AS BIGINT) AS score
        FROM q0 q JOIN q0 c ON q.vec_id <> c.vec_id
        WHERE q.vec_id IN (SELECT vec_id FROM e WHERE {_QWHERE_SQL})
    ),
    exact_topk AS MATERIALIZED (
        SELECT qid, cid FROM (
            SELECT qid, cid,
                   row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rn
            FROM exact_scored) WHERE rn <= {IVFX_TOP_K}
    )
    SELECT e.qid,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(i.cid) AS BIGINT) AS hits,
           CAST(count(i.cid) * 1000000 // count(*) AS BIGINT) AS recall_ppm
    FROM exact_topk e
    LEFT JOIN ivf_topk i ON e.qid = i.qid AND e.cid = i.cid
    GROUP BY e.qid
    ORDER BY e.qid
"""


@query(
    "sim_ann_recall_audit",
    oracle=_ANN_AUDIT_ORACLE,
    tags=("llm", "similarity", "ann", "audit"),
)
def sim_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the integer-lattice IVF twin against brute-force
    exact top-k over the SAME quantized vectors and (score DESC, cid)
    order — per query: (qid, n_exact, hits, recall_ppm). The IVF side
    IS ``sim_ann_ivf_exact``'s registered builder, so the audit grades
    exactly the machinery the twin pins (nprobe = 4 of nlist = 16).

    100 TB shape: the exact side is ONE corpus scan against a
    Q_MAX-bounded broadcast query panel (the sim_cosine_topk plan —
    linear in N, zero corpus shuffle), and it runs once per ANN config
    change, not per search. recall@k vs nprobe is THE tuning curve for
    IVF; this query is that curve's one-point evaluator, hash-verified
    cross-engine."""
    e = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", _dvec("embedding").alias("v")
    )
    q0 = e.select(
        "vec_id",
        F.transform("v", lambda x: F.floor(x * F.lit(1000)).cast("long")).alias("xq"),
    )
    qs = q0.filter(_query_filter()).select(
        F.col("vec_id").alias("qid"), F.col("xq").alias("qxq")
    )
    score = F.aggregate(
        F.zip_with("qxq", "xq", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        q0.crossJoin(F.broadcast(qs))
        .where(F.col("qid") != F.col("vec_id"))
        .select("qid", F.col("vec_id").alias("cid"), score.alias("score"))
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("cid"))
    )
    exact_topk = (
        scored.withColumn("rn", rn).where(F.col("rn") <= IVFX_TOP_K).select("qid", "cid")
    )
    ivf_topk = sim_ann_ivf_exact(spark, sf_dir).select(
        "qid", "cid", F.lit(1).alias("in_ivf")
    )
    return (
        exact_topk.join(ivf_topk, ["qid", "cid"], "left")
        .groupBy("qid")
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.count("in_ivf").cast("long").alias("hits"),
            (F.count("in_ivf") * 1000000 / F.count("*")).cast("long").alias("recall_ppm"),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# dedup_minhash_calibration (round 9, session 3)
#
# The recall audit above asks "did the bands FIND the true pairs?";
# this one asks "is the MinHash ESTIMATE itself honest?" — per sampled
# pair sharing >= 1 shingle, compare the 12-hash agreement estimate
# (matching mins / 12, in ppm) against the exact shingle Jaccard, then
# publish the calibration curve: per exact-Jaccard decile, pair count,
# mean exact, mean estimate, and mean |error| (all integral-div ppm).
# This is the number that tunes N_HASHES: if MAE at the decision
# boundary (~tau) exceeds the band design's tolerance, 12 hashes are
# too few; if it is tiny, hashes can be cut.
#
# Fully hash-oracled because the audit family's PORTABLE md5 MinHash
# (h_i = (a_i * md5int(shingle) + b_i) mod p) is bit-identical on both
# engines — unlike the xxhash64 production signature, whose estimate
# cannot be recomputed in DuckDB. Same budget gate, so the pair work
# is O(budget^2) at any corpus size.
# ---------------------------------------------------------------------------

_CAL_MATCHES_SQL = " + ".join(
    f"CASE WHEN x.h{i} = y.h{i} THEN 1 ELSE 0 END" for i in range(AUDIT_N_HASHES)
)

_MINHASH_CAL_ORACLE = f"""
    WITH smod AS (
        SELECT greatest((count(*) * {AUDIT_SAMPLE_KEEP})
                        // {AUDIT_SAMPLE_BUDGET}, 1) AS m
        FROM documents
    ),
    sample_docs AS MATERIALIZED (
        SELECT doc_id, text FROM documents
        WHERE {_SQL_MD5INT_DOC} % (SELECT m FROM smod) < {AUDIT_SAMPLE_KEEP}
    ),
    sh AS MATERIALIZED (
        SELECT doc_id,
               unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
                      for i in generate_series(1, len(toks)-2)])) AS shingle
        FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM sample_docs)
    ),
    hashed AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) % {1 << 30} AS hx
        FROM sh
    ),
    sig AS MATERIALIZED (
        SELECT doc_id,
               {_AUDIT_MINS_SQL}
        FROM hashed GROUP BY doc_id
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS MATERIALIZED (
        SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT p.i, p.j,
               p.c * 1000000 // (sa.n + sb.n - p.c) AS jaccard_ppm,
               ({_CAL_MATCHES_SQL}) * 1000000 // {AUDIT_N_HASHES} AS est_ppm
        FROM pairs p
        JOIN sz sa ON p.i = sa.doc_id
        JOIN sz sb ON p.j = sb.doc_id
        JOIN sig x ON p.i = x.doc_id
        JOIN sig y ON p.j = y.doc_id
    )
    SELECT CAST(jaccard_ppm // 100000 AS BIGINT) AS bin,
           CAST((jaccard_ppm // 100000) * 100000 AS BIGINT) AS lo_ppm,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(jaccard_ppm) // count(*) AS BIGINT) AS avg_exact_ppm,
           CAST(sum(est_ppm) // count(*) AS BIGINT) AS avg_est_ppm,
           CAST(sum(CASE WHEN est_ppm >= jaccard_ppm
                         THEN est_ppm - jaccard_ppm
                         ELSE jaccard_ppm - est_ppm END) // count(*) AS BIGINT)
               AS mae_ppm
    FROM scored GROUP BY 1, 2 ORDER BY bin
"""


def minhash_calibration(docs: DataFrame) -> DataFrame:
    """Core calibration over a (doc_id, text) frame: per exact-Jaccard
    decile of the shingle-sharing pairs, the mean portable-MinHash
    estimate and mean absolute error in ppm. Factored so planted tests
    (identical docs -> bin 10 with est 1e6 / mae 0) drive the exact
    production signature + pair arithmetic."""
    sh = docs.select(
        "doc_id", F.explode(shingle_col(F.col("text"))).alias("shingle")
    ).persist()
    hashed = sh.select("doc_id", (_md5int(F.col("shingle")) % (1 << 30)).alias("hx"))
    sig = hashed.groupBy("doc_id").agg(
        *[
            F.min((F.col("hx") * a + b) % AUDIT_P).alias(f"h{i}")
            for i, (a, b) in enumerate(_AUDIT_AB)
        ]
    )
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    pairs = (
        sh.select(F.col("doc_id").alias("i"), "shingle")
        .join(sh.select(F.col("doc_id").alias("j"), "shingle"), "shingle")
        .filter(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count("*").alias("c"))
    )
    matches = " + ".join(
        f"CASE WHEN xh{i} = yh{i} THEN 1 ELSE 0 END" for i in range(AUDIT_N_HASHES)
    )
    scored = (
        pairs.join(sz.select(F.col("doc_id").alias("i"), F.col("n").alias("na")), "i")
        .join(sz.select(F.col("doc_id").alias("j"), F.col("n").alias("nb")), "j")
        .join(
            sig.select(
                F.col("doc_id").alias("i"),
                *[F.col(f"h{k}").alias(f"xh{k}") for k in range(AUDIT_N_HASHES)],
            ),
            "i",
        )
        .join(
            sig.select(
                F.col("doc_id").alias("j"),
                *[F.col(f"h{k}").alias(f"yh{k}") for k in range(AUDIT_N_HASHES)],
            ),
            "j",
        )
        .select(
            F.expr("c * 1000000 div (na + nb - c)").alias("jaccard_ppm"),
            F.expr(f"({matches}) * 1000000 div {AUDIT_N_HASHES}").alias("est_ppm"),
        )
    )
    out = (
        scored.select(
            F.expr("jaccard_ppm div 100000").alias("bin"),
            "jaccard_ppm",
            "est_ppm",
            F.expr(
                "CASE WHEN est_ppm >= jaccard_ppm THEN est_ppm - jaccard_ppm"
                " ELSE jaccard_ppm - est_ppm END"
            ).alias("abs_err"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.expr("CAST(sum(jaccard_ppm) div count(*) AS BIGINT)").alias(
                "avg_exact_ppm"
            ),
            F.expr("CAST(sum(est_ppm) div count(*) AS BIGINT)").alias("avg_est_ppm"),
            F.expr("CAST(sum(abs_err) div count(*) AS BIGINT)").alias("mae_ppm"),
        )
        .select(
            "bin",
            (F.col("bin") * 100000).cast("long").alias("lo_ppm"),
            "n_pairs",
            "avg_exact_ppm",
            "avg_est_ppm",
            "mae_ppm",
        )
        .orderBy("bin")
    )
    out = out.localCheckpoint(eager=True)
    sh.unpersist(blocking=False)
    return out


@query(
    "dedup_minhash_calibration",
    oracle=_MINHASH_CAL_ORACLE,
    tags=("llm", "dedup", "lsh", "audit"),
)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration curve on the budget md5 sample:
    per exact-Jaccard decile of shingle-sharing pairs, the mean
    12-hash agreement estimate and mean |error| in ppm. The number
    that tunes N_HASHES — the recall audit asks whether bands FIND
    the true pairs; this asks whether the signature's Jaccard
    estimate is honest enough to rank them. Same fixed-SIZE gate, so
    pair work is O(budget^2) at any corpus size."""
    d = load_tables(spark, sf_dir)["documents"]
    return minhash_calibration(budget_sample(d))


# ---------------------------------------------------------------------------
# lsh_similar_topk (built round 9 session 3, registered round 10 per
# the r9->r10 handoff): the SERVING side of the LSH
# machinery this module audits. "Find the 3 most similar documents to
# X" is the interactive lookup every dedup/retrieval UI needs; the
# threshold queries (dedup_minhash_lsh) answer set membership, not
# ranking. Built on the PORTABLE md5 MinHash (bit-identical on both
# engines) over the FULL corpus: band candidates (4x3), bucket-capped
# like production (buckets > LSH_TOPK_MAX_BUCKET dropped — at 100 TB
# a hot bucket is boilerplate whose members direct dedup already
# groups; the cap is deterministic so both engines drop the same
# buckets), symmetrized, ranked per doc by estimated Jaccard
# (matching components / 12, integer ppm; ties broken by neighbor
# id), top LSH_TOPK kept.
#
# Scale: signatures are one map pass; the band join is an equi-join
# whose per-bucket fan-out is capped; ranking is one row_number
# window per doc over <= cap*bands candidates. No all-pairs stage.
# ---------------------------------------------------------------------------

LSH_TOPK = 3
LSH_TOPK_MAX_BUCKET = 32

_LSH_TOPK_ORACLE = f"""
    WITH sh AS MATERIALIZED (
        SELECT doc_id,
               unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
                      for i in generate_series(1, len(toks)-2)])) AS shingle
        FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
    ),
    hashed AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) % {1 << 30} AS hx
        FROM sh
    ),
    sig AS MATERIALIZED (
        SELECT doc_id,
               {_AUDIT_MINS_SQL}
        FROM hashed GROUP BY doc_id
    ),
    bands AS ({_AUDIT_BANDS_SQL}),
    keep AS (
        SELECT band, sig FROM bands
        GROUP BY band, sig HAVING count(*) <= {LSH_TOPK_MAX_BUCKET}
    ),
    cand AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        FROM bands a
        JOIN keep k ON a.band = k.band AND a.sig = k.sig
        JOIN bands b ON a.band = b.band AND a.sig = b.sig
                    AND a.doc_id < b.doc_id
    ),
    sym AS (
        SELECT i, j FROM cand UNION ALL SELECT j AS i, i AS j FROM cand
    ),
    scored AS (
        SELECT s.i, s.j,
               ({_CAL_MATCHES_SQL}) * 1000000 // {AUDIT_N_HASHES} AS est_ppm
        FROM sym s
        JOIN sig x ON s.i = x.doc_id
        JOIN sig y ON s.j = y.doc_id
    ),
    ranked AS (
        SELECT i, j, est_ppm,
               row_number() OVER (PARTITION BY i ORDER BY est_ppm DESC, j) AS rank
        FROM scored
    )
    SELECT CAST(i AS BIGINT) AS doc_id,
           CAST(j AS BIGINT) AS neighbor,
           CAST(est_ppm AS BIGINT) AS est_ppm,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {LSH_TOPK}
    ORDER BY doc_id, rank
"""


def lsh_similar_topk_from(docs: DataFrame) -> DataFrame:
    """Core top-k similar-documents lookup over a (doc_id, text)
    frame via the portable md5 MinHash bands. Factored so planted
    tests (identical docs rank each other first at est 1e6) drive the
    production join + rank."""
    sh = docs.select(
        "doc_id", F.explode(shingle_col(F.col("text"))).alias("shingle")
    ).persist()
    hashed = sh.select("doc_id", (_md5int(F.col("shingle")) % (1 << 30)).alias("hx"))
    sig = hashed.groupBy("doc_id").agg(
        *[
            F.min((F.col("hx") * a + b) % AUDIT_P).alias(f"h{i}")
            for i, (a, b) in enumerate(_AUDIT_AB)
        ]
    )
    stack_args = ", ".join(
        "{band}, concat_ws('|', {hs})".format(
            band=band,
            hs=", ".join(f"h{band * AUDIT_ROWS + r}" for r in range(AUDIT_ROWS)),
        )
        for band in range(AUDIT_BANDS)
    )
    bands = sig.select(
        "doc_id", F.expr(f"stack({AUDIT_BANDS}, {stack_args}) AS (band, sig)")
    )
    keep = (
        bands.groupBy("band", "sig")
        .agg(F.count("*").alias("bn"))
        .filter(F.col("bn") <= LSH_TOPK_MAX_BUCKET)
        .select("band", "sig")
    )
    kept = bands.join(keep, ["band", "sig"], "left_semi")
    cand = (
        kept.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
        .distinct()
    )
    sym = cand.unionAll(cand.select(F.col("j").alias("i"), F.col("i").alias("j")))
    matches = " + ".join(
        f"CASE WHEN xh{i} = yh{i} THEN 1 ELSE 0 END" for i in range(AUDIT_N_HASHES)
    )
    scored = (
        sym.join(
            sig.select(
                F.col("doc_id").alias("i"),
                *[F.col(f"h{k}").alias(f"xh{k}") for k in range(AUDIT_N_HASHES)],
            ),
            "i",
        )
        .join(
            sig.select(
                F.col("doc_id").alias("j"),
                *[F.col(f"h{k}").alias(f"yh{k}") for k in range(AUDIT_N_HASHES)],
            ),
            "j",
        )
        .select(
            "i",
            "j",
            F.expr(f"({matches}) * 1000000 div {AUDIT_N_HASHES}").alias("est_ppm"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("i").orderBy(F.col("est_ppm").desc(), F.col("j"))
    out = (
        scored.select("i", "j", "est_ppm", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= LSH_TOPK)
        .select(
            F.col("i").cast("long").alias("doc_id"),
            F.col("j").cast("long").alias("neighbor"),
            F.col("est_ppm").cast("long").alias("est_ppm"),
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("doc_id", "rank")
    )
    out = out.localCheckpoint(eager=True)
    sh.unpersist(blocking=False)
    return out


@query(
    "lsh_similar_topk",
    oracle=_LSH_TOPK_ORACLE,
    tags=("pipeline", "dedup", "serving"),
)
def lsh_similar_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most similar documents per document, ranked by portable
    MinHash estimated Jaccard over band candidates — the serving
    lookup behind every "view near-duplicates" UI. Cross-engine
    pinned at all three SFs by
    test_lsh_similar_topk_matches_duckdb_oracle."""
    d = load_tables(spark, sf_dir)["documents"]
    return lsh_similar_topk_from(d.select("doc_id", "text"))


# ---------------------------------------------------------------------------
# Dedup threshold sweep (round 10): the tuning curve for the ONE
# number every near-dedup deployment argues about — the Jaccard
# threshold. One pass computes the exact pair count at each candidate
# threshold (50/60/70/80/90% as integer permyriad), so the operator
# answers "how much MORE would 0.6 remove than 0.8?" without five
# reruns. Pairs come from the production banded-LSH candidate path
# verified with EXACT INTEGER permyriad Jaccard (inter·10000 div
# union — no float boundary anywhere, unlike the rounded-double
# jaccard the membership query publishes); the bands are tuned for
# the 0.5 floor, and every higher threshold's pair set is a subset,
# so one candidate generation serves the whole curve.
#
# Scale: the banded candidate join + one exact verify (the
# dedup_minhash_lsh plan) + a 5-row conditional fold. Output: one row
# per threshold.
# ---------------------------------------------------------------------------

SWEEP_THRESHOLDS_PM = (5000, 6000, 7000, 8000, 9000)

_SWEEP_ORACLE = f"""
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
    scored AS (
        SELECT i, j,
               c * 10000 // (sa.n + sb.n - c) AS jac_pm
        FROM inter
        JOIN sz sa ON i = sa.doc_id
        JOIN sz sb ON j = sb.doc_id
    )
    SELECT CAST(t.thr AS BIGINT) AS threshold_pm,
           CAST(count(CASE WHEN s.jac_pm >= t.thr THEN 1 END) AS BIGINT)
               AS n_pairs
    FROM (SELECT unnest([{", ".join(str(t) for t in SWEEP_THRESHOLDS_PM)}]) AS thr) t
    CROSS JOIN scored s
    GROUP BY t.thr
    ORDER BY threshold_pm
"""


@query(
    "dedup_threshold_sweep",
    oracle=_SWEEP_ORACLE,
    tags=("llm", "dedup", "audit", "tuning"),
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pair counts at Jaccard thresholds 0.5-0.9 (one
    row per integer-permyriad threshold) from ONE banded-LSH candidate
    pass — the threshold tuning curve that decides how aggressive the
    dedup pass should be."""
    from flume_source_spark.pipeline.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
        shingle_col,
        spread,
    )

    d = spread(load_tables(spark, sf_dir)["documents"])
    docs = d.select("doc_id", shingle_col(F.col("text")).alias("shingles"))
    sig = minhash_signature(docs, "doc_id", "shingles")
    # Round-13 single-corpus-pass re-shape (guide §2.4; live-scan
    # audit: this plan carried 14 documents scans / 52 Exchanges —
    # the banded candidate generation re-ran for the id projection
    # and again under BOTH sides of the verify join, and the shingle
    # projection re-ran per reference). Materialize the two BOUNDED
    # frames once each with eager localCheckpoint (the house builder
    # discipline — unlike the bare persist ADVICE r10 item 4 banned,
    # a checkpoint needs no unpersist pairing): `cand` is the LSH
    # candidate pair list (band-capped), `cdocs` the shingle arrays
    # of candidate-touched docs only. Leaves 2 live corpus scans
    # (signature chain + candidate-doc projection).
    cand = lsh_candidate_pairs(sig, "doc_id").localCheckpoint(eager=True)
    ids = cand.select(F.col("i").alias("doc_id")).union(cand.select("j")).distinct()
    cdocs = docs.join(F.broadcast(ids), "doc_id").localCheckpoint(eager=True)
    left = cdocs.select(F.col("doc_id").alias("i"), F.col("shingles").alias("sh_i"))
    right = cdocs.select(F.col("doc_id").alias("j"), F.col("shingles").alias("sh_j"))
    inter = F.size(F.array_intersect("sh_i", "sh_j"))
    union = F.size("sh_i") + F.size("sh_j") - inter
    scored = (
        cand.join(F.broadcast(left), "i")
        .join(F.broadcast(right), "j")
        .select(
            "i",
            "j",
            (inter.cast("long") * 10000).alias("inter_scaled"),
            union.cast("long").alias("union_sz"),
        )
        .select(
            "i",
            "j",
            F.expr("CAST(inter_scaled div union_sz AS BIGINT)").alias("jac_pm"),
        )
    )
    thr = docs.sparkSession.createDataFrame(
        [(t,) for t in SWEEP_THRESHOLDS_PM], "thr long"
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .groupBy(F.col("thr").alias("threshold_pm"))
        .agg(
            F.count(F.when(F.col("jac_pm") >= F.col("thr"), 1))
            .cast("long")
            .alias("n_pairs")
        )
        .orderBy("threshold_pm")
    )


# ---------------------------------------------------------------------------
# sim_ann_nprobe_curve (round 10): sim_ann_recall_audit is the
# one-point evaluator its own docstring calls "the tuning curve's
# evaluator" — this IS the curve: aggregate recall@k of the
# integer-lattice IVF machinery at nprobe ∈ {1, 2, 4, 8}, one hashed
# row per setting. The serving question it answers is the only one
# that matters when sizing an IVF deployment: how much recall does
# each extra probed list buy? Monotone nondecreasing in nprobe by
# construction (candidate sets are nested), which a model test pins.
#
# One candidate generation serves the whole curve: every (query,
# candidate) pair is tagged with the PROBE RANK of the cell it came
# from (rank of that cell in the query's distance order), so
# "nprobe = p" is a filter, not a re-run; the per-setting top-k
# rerank is a window over the bounded candidate panel.
#
# Scale: the corpus-side work (assignment + one scan against the
# Q_MAX-bounded broadcast panel) is paid ONCE; per-setting cost is a
# window over ≤ Q_MAX · maxprobe · cell-size candidate rows. The
# exact side is the recall audit's linear budget-bounded scan.
# ---------------------------------------------------------------------------

NPROBE_CURVE = (1, 2, 4, 8)

_NPROBE_CURVE_ORACLE = f"""
    WITH {_IVFX_CTES.rsplit("    qprobe AS MATERIALIZED", 1)[0]}
    qcells AS MATERIALIZED (
        SELECT vec_id AS qid, j, CAST(rn AS BIGINT) AS cell_rank FROM dist
        WHERE rn <= {max(NPROBE_CURVE)}
          AND vec_id IN (SELECT vec_id FROM e WHERE {_QWHERE_SQL})
    ),
    cand8 AS MATERIALIZED (
        SELECT qc.qid, a.vec_id AS cid, min(qc.cell_rank) AS cell_rank
        FROM qcells qc JOIN assign a ON qc.j = a.j
        WHERE qc.qid <> a.vec_id
        GROUP BY qc.qid, a.vec_id
    ),
    scored8 AS MATERIALIZED (
        SELECT c.qid, c.cid, c.cell_rank,
               CAST(list_dot_product(
                   list_transform(qq.xq, x -> CAST(x AS DOUBLE)),
                   list_transform(cc.xq, x -> CAST(x AS DOUBLE))) AS BIGINT) AS score
        FROM cand8 c
        JOIN q0 qq ON qq.vec_id = c.qid
        JOIN q0 cc ON cc.vec_id = c.cid
    ),
    percfg AS (
        SELECT np.np, s.qid, s.cid,
               row_number() OVER (
                   PARTITION BY np.np, s.qid
                   ORDER BY s.score DESC, s.cid) AS rn
        FROM (SELECT unnest([{", ".join(str(p) for p in NPROBE_CURVE)}]) AS np) np
        JOIN scored8 s ON s.cell_rank <= np.np
    ),
    ivf_topk AS MATERIALIZED (
        SELECT np, qid, cid FROM percfg WHERE rn <= {IVFX_TOP_K}
    ),
    exact_scored AS (
        SELECT q.vec_id AS qid, c.vec_id AS cid,
               CAST(list_dot_product(
                   list_transform(q.xq, x -> CAST(x AS DOUBLE)),
                   list_transform(c.xq, x -> CAST(x AS DOUBLE))) AS BIGINT) AS score
        FROM q0 q JOIN q0 c ON q.vec_id <> c.vec_id
        WHERE q.vec_id IN (SELECT vec_id FROM e WHERE {_QWHERE_SQL})
    ),
    exact_topk AS MATERIALIZED (
        SELECT qid, cid FROM (
            SELECT qid, cid,
                   row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rn
            FROM exact_scored) WHERE rn <= {IVFX_TOP_K}
    ),
    grid AS (
        SELECT np.np, e.qid, e.cid
        FROM (SELECT unnest([{", ".join(str(p) for p in NPROBE_CURVE)}]) AS np) np
        CROSS JOIN exact_topk e
    )
    SELECT CAST(g.np AS BIGINT) AS nprobe,
           CAST(count(DISTINCT g.qid) AS BIGINT) AS n_queries,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(i.cid) AS BIGINT) AS hits,
           CAST(count(i.cid) * 1000000 // count(*) AS BIGINT) AS recall_ppm
    FROM grid g
    LEFT JOIN ivf_topk i ON i.np = g.np AND i.qid = g.qid AND i.cid = g.cid
    GROUP BY g.np
    ORDER BY nprobe
"""


@query(
    "sim_ann_nprobe_curve",
    oracle=_NPROBE_CURVE_ORACLE,
    tags=("llm", "similarity", "ann", "audit", "tuning"),
)
def sim_ann_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate recall@k of the integer-lattice IVF machinery at
    nprobe = 1, 2, 4, 8 — the tuning curve behind every IVF
    deployment's latency/recall trade, from ONE candidate generation
    (each candidate tagged with the probe rank of its cell; a setting
    is a filter + rerank, not a re-run)."""
    from pyspark.sql import Window as W

    from flume_source_spark.pipeline.similarity2 import (
        _IVFX_A,
        _IVFX_C,
        IVFX_NLIST,
    )

    e = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", _dvec("embedding").alias("v")
    )
    sq = F.aggregate(
        F.transform("xq", lambda x: x * x), F.lit(0).cast("long"), lambda a, x: a + x
    )
    q0 = (
        e.select(
            "vec_id",
            F.transform("v", lambda x: F.floor(x * F.lit(1000)).cast("long")).alias("xq"),
        )
        .withColumn("na", sq)
        .localCheckpoint(eager=True)
    )
    jcol = F.col("j")
    cent = spark.range(IVFX_NLIST).select(
        F.col("id").cast("long").alias("j"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda d: ((jcol * _IVFX_A + d.cast("long") * _IVFX_C) % 2001 - 1000).cast("long"),
        ).alias("carr"),
    )
    cent = cent.withColumn(
        "nc",
        F.aggregate(
            F.transform("carr", lambda c: c * c), F.lit(0).cast("long"), lambda a, x: a + x
        ),
    )
    dot_xc = F.aggregate(
        F.zip_with("xq", "carr", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dist = q0.crossJoin(F.broadcast(cent)).select(
        "vec_id", "j", (F.col("na") + F.col("nc") - F.lit(2) * dot_xc).alias("dist")
    )
    rn = F.row_number().over(
        W.partitionBy("vec_id").orderBy(F.col("dist").asc(), F.col("j").asc())
    )
    ranked_lists = dist.select("vec_id", "j", rn.alias("rn")).localCheckpoint(
        eager=True
    )
    assign = ranked_lists.where(F.col("rn") == 1).select(
        F.col("vec_id").alias("cid"), "j"
    )
    qids = e.filter(_query_filter()).select(F.col("vec_id").alias("qid"))
    qcells = (
        ranked_lists.where(F.col("rn") <= max(NPROBE_CURVE))
        .join(F.broadcast(qids), ranked_lists.vec_id == qids.qid)
        .select("qid", "j", F.col("rn").cast("long").alias("cell_rank"))
    )
    cand8 = (
        assign.join(F.broadcast(qcells), "j")
        .where(F.col("qid") != F.col("cid"))
        .groupBy("qid", "cid")
        .agg(F.min("cell_rank").alias("cell_rank"))
    )
    qx = q0.filter(_query_filter()).select(
        F.col("vec_id").alias("qid"), F.col("xq").alias("qxq")
    )
    cx = q0.select(F.col("vec_id").alias("cid"), F.col("xq").alias("cxq"))
    score = F.aggregate(
        F.zip_with("qxq", "cxq", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored8 = (
        cand8.join(F.broadcast(qx), "qid")
        .join(cx, "cid")
        .select("qid", "cid", "cell_rank", score.alias("score"))
    )
    nps = spark.createDataFrame([(p,) for p in NPROBE_CURVE], "np long")
    percfg = (
        scored8.join(F.broadcast(nps), F.col("cell_rank") <= F.col("np"))
        .select(
            "np",
            "qid",
            "cid",
            F.row_number()
            .over(
                W.partitionBy("np", "qid").orderBy(F.col("score").desc(), F.col("cid"))
            )
            .alias("rnk"),
        )
        .where(F.col("rnk") <= IVFX_TOP_K)
        .select("np", "qid", "cid", F.lit(1).alias("hit"))
    )
    exact_scored = (
        q0.crossJoin(F.broadcast(qx))
        .where(F.col("qid") != F.col("vec_id"))
        .select(
            "qid",
            F.col("vec_id").alias("cid"),
            F.aggregate(
                F.zip_with("qxq", "xq", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("score"),
        )
    )
    exact_topk = (
        exact_scored.select(
            "qid",
            "cid",
            F.row_number()
            .over(W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("cid")))
            .alias("rnk"),
        )
        .where(F.col("rnk") <= IVFX_TOP_K)
        .select("qid", "cid")
    )
    grid = exact_topk.crossJoin(F.broadcast(nps))
    return (
        grid.join(percfg, ["np", "qid", "cid"], "left")
        .groupBy("np")
        .agg(
            F.countDistinct("qid").cast("long").alias("n_queries"),
            F.count("*").cast("long").alias("n_exact"),
            F.count("hit").cast("long").alias("hits"),
        )
        .select(
            F.col("np").alias("nprobe"),
            "n_queries",
            "n_exact",
            "hits",
            F.expr("CAST(hits * 1000000 div n_exact AS BIGINT)").alias("recall_ppm"),
        )
        .orderBy("nprobe")
    )
