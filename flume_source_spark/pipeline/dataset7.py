"""Dataset-prep wave 7: uniform-mix rebalancing and collocation
mining.

``ds_domain_mix_rebalance`` completes the mixture-control family:
``ds_mixture_weighted`` applies EXTERNALLY-GIVEN per-source rates,
``ds_mixture_temperature`` softens corpus proportions by T=2
sqrt-scaling (emitting duplication factors for upsampling); this
operator is the remaining corner — rates computed FROM the corpus to
hit an exactly UNIFORM language mix (the T→∞ limit) by downsampling
every language to the rarest one's level, and the output is the
before/after audit a curation run logs. The keep-gate is the house
content-addressed hash (md5(doc_id) mod 1e6 < rate_ppm) so the kept
subset is reproducible across engines, runs, and cluster sizes — the
same determinism contract as ``ds_deterministic_sample``, extended
with a per-group rate table.

``text_cooccurrence_pmi`` — collocation mining: which token pairs
co-occur in DOCUMENTS far more often than independence predicts (PMI
ranking over doc-level co-occurrence — the unordered any-distance
complement of ``text_bigram_lm``'s adjacent-token conditional
probabilities). The classic corpus-analytics query whose naive form
is an O(vocab²) blow-up; the scalable form bounds the pair space to a
top-V vocabulary first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.dedup import spread
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# Acceptance rates are expressed in parts-per-million against the
# md5-bucket (uniform over ids — up to the ~1e-5 relative mod bias of
# 2^32 % 1e6), so the realized per-language keep probability tracks
# rate_ppm / 1e6 independent of skew.
MIX_MOD = 1_000_000

# Collocation bounds: pair space is (top PMI_VOCAB doc-frequency
# tokens)², reported pairs need PMI_MIN_PAIR co-occurrences (rare-pair
# PMI is noise — a 1-in-N coincidence scores arbitrarily high).
PMI_VOCAB = 40
PMI_MIN_PAIR = 5
PMI_TOP = 50


@query(
    "ds_domain_mix_rebalance",
    oracle=f"""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n_before FROM documents GROUP BY lang
    ),
    rates AS (
        SELECT lang, n_before,
               CAST(({MIX_MOD} * (SELECT MIN(n_before) FROM counts))
                    // n_before AS BIGINT) AS rate_ppm
        FROM counts
    ),
    kept AS (
        SELECT d.lang
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
              % {MIX_MOD} < r.rate_ppm
    )
    SELECT r.lang, CAST(r.n_before AS BIGINT) AS n_before, r.rate_ppm,
           CAST(COALESCE(k.n_after, 0) AS BIGINT) AS n_after
    FROM rates r
    LEFT JOIN (SELECT lang, COUNT(*) AS n_after FROM kept GROUP BY lang) k
           ON r.lang = k.lang
    ORDER BY r.lang
    """,
    tags=("llm", "dataset", "mixture"),
)
def ds_domain_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-mix rebalance: rate_ppm(lang) = floor(1e6 · min_count /
    n_lang), then keep docs whose md5-bucket falls under the rate.
    Threshold (not quota-rank) sampling on purpose: a per-language
    rank window would shuffle the whole corpus into #languages
    reducers — the worst skew shape possible — while the threshold
    gate needs only the tiny broadcast rate table and stays map-side.
    The realized count is binomial around the target (reported as
    n_after so the mix is auditable), and the kept SET is stable under
    corpus growth within each language's unchanged rate.

    100 TB shape: one map-side-combinable count per language (output
    rows = #languages), a broadcast back, and a whole-stage-codegen
    scan filter — zero corpus shuffles. Integer headroom: 1e6 ·
    min_count needs min_count < 2^43, far above any per-language
    document count; `div` on non-negative operands matches DuckDB //
    exactly (house rule, env-limits)."""
    docs = load_tables(spark, sf_dir)["documents"]
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_before"))
    m = counts.agg(F.min("n_before").alias("m_min"))
    # the rate table feeds BOTH the keep-gate join and the audit
    # join-back; checkpointing the #langs-row result pins the corpus
    # count scan to exactly one execution instead of one per consumer
    rates = (
        counts.crossJoin(F.broadcast(m))
        .select(
            "lang",
            "n_before",
            F.expr(f"({MIX_MOD} * m_min) div n_before").alias("rate_ppm"),
        )
        .localCheckpoint(eager=True)
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % MIX_MOD
    )
    kept = (
        docs.select("doc_id", "lang")
        .join(F.broadcast(rates.select("lang", "rate_ppm")), "lang")
        .where(bucket < F.col("rate_ppm"))
    )
    after = kept.groupBy("lang").agg(F.count("*").alias("n_after"))
    # the checkpointed rates side carries no stats, so without the
    # hint the #langs-row audit join falls back to a sort-merge plan
    return (
        rates.join(F.broadcast(after), "lang", "left")
        .select(
            "lang",
            "n_before",
            "rate_ppm",
            F.coalesce("n_after", F.lit(0)).cast("long").alias("n_after"),
        )
        .orderBy("lang")
    )


@query(
    "text_cooccurrence_pmi",
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, tok
        FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> ''
    ),
    df AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok),
    vocab AS (SELECT tok, df FROM df ORDER BY df DESC, tok LIMIT {PMI_VOCAB}),
    vt AS (SELECT t.doc_id, t.tok, v.df FROM toks t JOIN vocab v ON t.tok = v.tok),
    pairs AS (
        SELECT a.tok AS tok_a, b.tok AS tok_b,
               a.df AS df_a, b.df AS df_b, COUNT(*) AS c_ab
        FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY 1, 2, 3, 4
    )
    SELECT tok_a, tok_b, CAST(c_ab AS BIGINT) AS c_ab,
           CAST(df_a AS BIGINT) AS df_a, CAST(df_b AS BIGINT) AS df_b,
           CAST(({MIX_MOD} * c_ab * (SELECT COUNT(*) FROM documents))
                // (df_a * df_b) AS BIGINT) AS lift_ppm
    FROM pairs
    WHERE c_ab >= {PMI_MIN_PAIR}
    ORDER BY lift_ppm DESC, tok_a, tok_b
    LIMIT {PMI_TOP}
    """,
    tags=("llm", "text", "collocation"),
)
def text_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by integer-scaled PMI lift: lift_ppm =
    floor(1e6 · P(a,b) / (P(a)·P(b))) computed entirely in BIGINT —
    floor(1e6 · c_ab · N / (df_a · df_b)) — so both engines rank
    identically with zero float drift (the house exact-twin
    arithmetic; log() would only monotone-transform the ordering).

    The pair space is bounded BEFORE any pairing: document-frequency
    ranking picks the top-V (V=40) vocabulary (one wordcount-shaped
    agg, output rows = distinct tokens), the vocabulary broadcasts,
    and only vocabulary tokens survive into the per-document token
    SET — so pair generation is a map-side array expansion bounded at
    C(V,2) per document, independent of document length or
    corpus size. Deliberately NOT a doc_id self-join (the textbook
    formulation): that plan exchanges the (doc, tok∈V) table by
    doc_id twice and sorts both sides; collecting the ≤V-element
    sorted token set per document instead needs ONE exchange, and the
    ordered pairs fall out of a nested array transform with no join
    at all. The pair aggregation is then map-side combinable on a key
    space capped at V², and each token's document frequency joins
    back from the 2·V-row broadcast vocabulary.

    Array-pair guard: sequence(1, n) runs DESCENDING for n < 1 (house
    gotcha), so single-token documents short-circuit via the size ≥ 2
    filter — they contribute no pairs by definition.

    Integer headroom: 1e6 · c_ab · N ≤ 1e6 · N² < 2^63 needs
    N < ~3.0e6 (2^21.5) documents per partition-of-analysis; beyond
    that drop the ppm scale (the ratio ordering is scale-invariant)
    or switch the lift to double — the BOUND is on the reported
    scalar, not the plan shape."""
    d = spread(load_tables(spark, sf_dir)["documents"])
    # empty tokens (double/leading/trailing spaces) would otherwise
    # claim the top document-frequency vocab slot (house precedent:
    # text4/text10 filter the same artifact)
    toks = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
    )
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    vocab = dfreq.orderBy(F.col("df").desc(), "tok").limit(PMI_VOCAB)
    doc_sets = (
        toks.join(F.broadcast(vocab.select("tok")), "tok")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("tok")).alias("ts"))
        .where(F.size("ts") >= 2)
    )
    pairs = (
        doc_sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, size(ts) - 1), i -> "
                    "transform(slice(ts, i + 1, size(ts) - i), t2 -> "
                    "struct(element_at(ts, i) AS tok_a, t2 AS tok_b))))"
                )
            ).alias("p")
        )
        .select("p.tok_a", "p.tok_b")
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("c_ab"))
        .where(F.col("c_ab") >= PMI_MIN_PAIR)
    )
    va = vocab.select(F.col("tok").alias("tok_a"), F.col("df").alias("df_a"))
    vb = vocab.select(F.col("tok").alias("tok_b"), F.col("df").alias("df_b"))
    n = d.agg(F.count("*").alias("n_docs"))
    return (
        pairs.join(F.broadcast(va), "tok_a")
        .join(F.broadcast(vb), "tok_b")
        .crossJoin(F.broadcast(n))
        .select(
            "tok_a",
            "tok_b",
            "c_ab",
            "df_a",
            "df_b",
            F.expr(f"({MIX_MOD} * c_ab * n_docs) div (df_a * df_b)").alias(
                "lift_ppm"
            ),
        )
        .orderBy(F.col("lift_ppm").desc(), "tok_a", "tok_b")
        .limit(PMI_TOP)
    )
