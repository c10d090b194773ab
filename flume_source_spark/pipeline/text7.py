"""Text analysis wave 7: information-theoretic and statistical-LM
document scoring — the model-free quality signals a pretraining
pipeline computes before any neural filter.

- ``text_char_entropy`` — per-doc Shannon entropy (bits) of the
  letter distribution. Near-zero entropy = degenerate/repeated
  content, near-uniform = random noise; both ends get filtered.
  Shape: explode letters → (doc, ch) hash-agg → per-doc entropy
  aggregate. Two shuffles, both keyed by doc_id (the second reuses
  the first's partitioning) — linear at 100 TB.
- ``text_readability`` — Flesch reading-ease from pure regexp
  counts (words, sentence marks, vowel-group syllable proxy). The
  fixture corpus has no sentence punctuation, so the pinned behavior
  includes the ``greatest(1, …)`` sentence floor — exactly the
  degenerate-input path a web-scale corpus hits constantly.
- ``text_zipf_fit`` — Zipf slope of the corpus rank-frequency
  curve: regr_slope(log2 freq, log2 rank) over the top-100 words
  (unique (cnt DESC, word) ranking so both engines rank ties
  identically). Natural text ≈ −1; synthetic/boilerplate corpora
  deviate — a one-number corpus-health signal. Word-count agg is
  map-side combinable; the regression runs on 100 rows.
- ``text_bigram_lm`` — add-one-smoothed corpus bigram LM,
  re-scored over the corpus itself: per-doc mean log2 P(w2|w1),
  P = (c(w1,w2)+1)/(c(w1·)+V). The canonical perplexity-ish
  quality score (KenLM-shaped, pure SQL). Shape: bigram explode →
  two count aggs (bigram, context) → two equi-joins back on the
  bigram stream → per-doc avg. All joins are on count-table keys
  (vocabulary²-bounded, Zipf-concentrated → AQE handles the hot
  'the'-row skew); V is a scalar broadcast.

Floats: entropies/logs are doubles rounded 4 dp on both engines;
identical expression trees give identical IEEE results well inside
the rounding guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_ENTROPY_ORACLE = """
    WITH ch AS (
        SELECT doc_id, x AS ch, CAST(count(*) AS DOUBLE) AS c
        FROM documents, unnest(regexp_extract_all(lower(text), '[a-z]')) AS t(x)
        GROUP BY doc_id, x
    ),
    tot AS (
        SELECT doc_id, sum(c) AS n FROM ch GROUP BY doc_id
    )
    SELECT ch.doc_id,
           CAST(sum(ch.c) AS BIGINT) AS n_letters,
           CAST(count(*) AS BIGINT) AS n_distinct_letters,
           CAST(round(-sum((ch.c / tot.n) * log2(ch.c / tot.n)), 4) AS DOUBLE)
               AS entropy_bits
    FROM ch JOIN tot ON ch.doc_id = tot.doc_id
    GROUP BY ch.doc_id ORDER BY ch.doc_id
"""


@query("text_char_entropy", oracle=_ENTROPY_ORACLE, tags=("llm", "text", "entropy"))
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc letter-distribution Shannon entropy: explode → count →
    -Σ p·log2(p), both shuffles on doc_id."""
    d = load_tables(spark, sf_dir)["documents"]
    ch = (
        d.select(
            "doc_id",
            F.explode(F.regexp_extract_all(F.lower("text"), F.lit("[a-z]"), 0)).alias("ch"),
        )
        .groupBy("doc_id", "ch")
        .agg(F.count("*").cast("double").alias("c"))
    )
    tot = ch.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        ch.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_letters"),
            F.count("*").cast("long").alias("n_distinct_letters"),
            F.round(-F.sum(p * F.log2(p)), 4).alias("entropy_bits"),
        )
        .orderBy("doc_id")
    )


_READABILITY_ORACLE = """
    WITH m AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS DOUBLE) AS words,
               greatest(1.0, CAST(len(regexp_extract_all(text, '[.!?]+')) AS DOUBLE))
                   AS sentences,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)
                   AS syllables
        FROM documents
    )
    SELECT doc_id,
           CAST(words AS BIGINT) AS n_words,
           CAST(sentences AS BIGINT) AS n_sentences,
           CAST(syllables AS BIGINT) AS n_syllables,
           -- floor(x*100+0.5)/100, NOT round(): Spark rounds doubles
           -- via BigDecimal-of-binary-expansion, DuckDB via libm —
           -- they disagree exactly at half-ulp boundaries (85.165).
           -- floor over identical IEEE multiply+add is bit-portable.
           CAST(floor((206.835 - 1.015 * (words / sentences)
                       - 84.6 * (syllables / greatest(words, 1.0))) * 100 + 0.5)
                / 100 AS DOUBLE) AS flesch
    FROM m ORDER BY doc_id
"""


@query("text_readability", oracle=_READABILITY_ORACLE, tags=("llm", "text", "quality"))
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease from regexp counts (vowel-group syllable
    proxy); pure narrow map, codegen the whole way."""
    d = load_tables(spark, sf_dir)["documents"]
    words = F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)).cast("double")
    sentences = F.greatest(
        F.lit(1.0), F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), 0)).cast("double")
    )
    syllables = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), 0)
    ).cast("double")
    wsafe = F.greatest(words, F.lit(1.0))
    raw = F.lit(206.835) - 1.015 * (words / sentences) - 84.6 * (syllables / wsafe)
    # floor-based half-up rounding: bit-portable across engines where
    # round() is not (see oracle comment).
    flesch = F.floor(raw * 100 + 0.5) / 100
    return d.select(
        "doc_id",
        words.cast("long").alias("n_words"),
        sentences.cast("long").alias("n_sentences"),
        syllables.cast("long").alias("n_syllables"),
        flesch.alias("flesch"),
    ).orderBy("doc_id")


_ZIPF_ORACLE = """
    WITH wc AS (
        SELECT x AS word, CAST(count(*) AS BIGINT) AS cnt
        FROM documents, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t(x)
        GROUP BY x
    ),
    ranked AS (
        SELECT word, cnt,
               row_number() OVER (ORDER BY cnt DESC, word) AS rnk
        FROM wc
    )
    SELECT CAST(count(*) AS BIGINT) AS n_words_fit,
           CAST(round(regr_slope(log2(CAST(cnt AS DOUBLE)),
                                 log2(CAST(rnk AS DOUBLE))), 4) AS DOUBLE)
               AS zipf_slope,
           CAST(max(cnt) AS BIGINT) AS top_freq
    FROM ranked WHERE rnk <= 100
"""


@query("text_zipf_fit", oracle=_ZIPF_ORACLE, tags=("llm", "text", "stats"))
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf slope via regr_slope(log2 f, log2 r) over the unique-ranked
    top-100 vocabulary — natural text ≈ −1."""
    from pyspark.sql.window import Window

    d = load_tables(spark, sf_dir)["documents"]
    wc = (
        d.select(F.explode(F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    # Round 11: top-100 via orderBy().limit() (TakeOrderedAndProject —
    # per-partition partial top-k) instead of ranking the WHOLE vocab
    # through one window; the rank window then covers 100 rows only.
    top = wc.orderBy(F.desc("cnt"), F.asc("word")).limit(100)
    ranked = top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("word")))
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_words_fit"),
        F.round(
            F.regr_slope(F.log2(F.col("cnt").cast("double")), F.log2(F.col("rnk").cast("double"))),
            4,
        ).alias("zipf_slope"),
        F.max("cnt").cast("long").alias("top_freq"),
    )


_BIGRAM_ORACLE = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                           x -> length(x) > 0) AS t
        FROM documents
    ),
    bg AS (
        -- series bound driven by len(t) (ADVICE r11): the old fixed
        -- generate_series(1, 128) silently truncated docs past 129
        -- tokens; the scalar-unnest form enumerates every bigram of
        -- every doc, exactly like the Spark side's posexplode.
        SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM (SELECT doc_id, t,
                     unnest(generate_series(1, len(t) - 1)) AS i
              FROM toks)
    ),
    bgc AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c FROM bg GROUP BY w1, w2),
    ctx AS (SELECT w1, CAST(count(*) AS DOUBLE) AS n FROM bg GROUP BY w1),
    v AS (SELECT CAST(count(DISTINCT x) AS DOUBLE) AS v
          FROM toks, unnest(t) AS u(x))
    SELECT bg.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(round(avg(log2((bgc.c + 1) / (ctx.n + v.v))), 4) AS DOUBLE)
               AS mean_log2_prob
    FROM bg JOIN bgc ON bg.w1 = bgc.w1 AND bg.w2 = bgc.w2
            JOIN ctx ON bg.w1 = ctx.w1
            CROSS JOIN v
    GROUP BY bg.doc_id ORDER BY bg.doc_id
"""


@query("text_bigram_lm", oracle=_BIGRAM_ORACLE, tags=("llm", "text", "lm"))
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram LM (add-one smoothing) scoring each doc's mean
    log2 P(w2|w1) — the statistical-LM quality signal. Count tables
    join back on vocabulary keys; V is a broadcast scalar."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = d.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda x: F.length(x) > 0).alias("t"),
    )
    bg = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").cast("double").alias("c"))
    ctx = bg.groupBy("w1").agg(F.count("*").cast("double").alias("n"))
    v = toks.select(F.explode("t").alias("x")).agg(
        F.countDistinct("x").cast("double").alias("v")
    )
    scored = (
        bg.join(bgc, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(v))
        .withColumn("lp", F.log2((F.col("c") + 1) / (F.col("n") + F.col("v"))))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg("lp"), 4).alias("mean_log2_prob"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Vocabulary growth curve (round 11): the Heaps'-law companion to
# text_zipf_fit — Zipf describes the frequency RANKS of a vocabulary,
# Heaps describes how the vocabulary GROWS as the corpus is consumed
# (V(n) ~ K·n^β, β≈0.5 for natural text; a flat tail means the corpus
# stopped contributing new types — the "is more data still buying new
# vocabulary" curation signal). Exact, shuffle-light formulation: no
# per-prefix distinct-count — each token TYPE has one first-appearance
# position, so the whole curve is min(position) per type + one
# 10-row cumulative window:
#   decile(doc)   = exact NTILE(10) over doc_id (the distributed
#                   global-order helper — no single-partition sort),
#   first(type)   = min decile over the docs containing it,
#   new_types(i)  = #types with first = i;  vocab_cum = prefix sum.
# new_per_kilotoken = new_types·1000 div decile token volume is the
# integer growth-rate signal (falling ⇒ Heaps tail).
# ---------------------------------------------------------------------------

_VOCAB_GROWTH_ORACLE = """
    WITH dec AS (
        SELECT doc_id, ntile(10) OVER (ORDER BY doc_id) AS decile, text
        FROM documents
    ),
    toks AS (
        SELECT decile, unnest(str_split(text, ' ')) AS tok FROM dec
    ),
    vol AS (
        SELECT decile, CAST(count(*) AS BIGINT) AS n_tokens
        FROM toks GROUP BY decile
    ),
    first_seen AS (
        SELECT tok, min(decile) AS first_decile FROM toks GROUP BY tok
    ),
    growth AS (
        SELECT first_decile AS decile,
               CAST(count(*) AS BIGINT) AS new_types
        FROM first_seen GROUP BY first_decile
    )
    SELECT CAST(v.decile AS INT) AS decile,
           v.n_tokens,
           CAST(coalesce(g.new_types, 0) AS BIGINT) AS new_types,
           CAST(sum(coalesce(g.new_types, 0))
                OVER (ORDER BY v.decile) AS BIGINT) AS vocab_cum,
           CAST(coalesce(g.new_types, 0) * 1000 // v.n_tokens AS BIGINT)
               AS new_per_kilotoken
    FROM vol v LEFT JOIN growth g ON g.decile = v.decile
    ORDER BY decile
"""


@query(
    "text_vocab_growth",
    oracle=_VOCAB_GROWTH_ORACLE,
    tags=("llm", "text", "stats", "vocab"),
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-style vocabulary growth over the corpus in doc_id order:
    per ingest decile, the token volume, the count of NEVER-before-
    seen token types, the cumulative vocabulary, and the integer
    new-types-per-1000-tokens rate — computed from one min-position
    aggregate per type (no per-prefix distinct), with the decile
    assignment on the distributed global-order helper."""
    from pyspark.sql.window import Window

    from flume_source_spark.global_order import with_global_ntile
    from flume_source_spark.tables import load_tables

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    dec = with_global_ntile(
        d, 10, [F.col("doc_id")], F.col("doc_id"), tile_col="decile"
    )
    toks = dec.select("decile", F.explode(F.split("text", " ")).alias("tok"))
    vol = toks.groupBy("decile").agg(F.count("*").cast("long").alias("n_tokens"))
    growth = (
        toks.groupBy("tok")
        .agg(F.min("decile").alias("first_decile"))
        .groupBy(F.col("first_decile").alias("decile"))
        .agg(F.count("*").cast("long").alias("new_types"))
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        vol.join(growth, "decile", "left")
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_tokens",
            F.coalesce(F.col("new_types"), F.lit(0)).cast("long").alias("new_types"),
        )
        # the cumulative window runs over EXACTLY 10 rows
        .withColumn("vocab_cum", F.sum("new_types").over(w).cast("long"))
        .withColumn(
            "new_per_kilotoken",
            F.expr("CAST(new_types * 1000 div n_tokens AS BIGINT)"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Held-out bigram LM scoring (round 11): text_bigram_lm trains and
# scores on the SAME corpus — the self-scored form every quality
# pipeline starts with, but it cannot see memorization or distribution
# drift. This is the cross-split form: the LM (bigram counts, context
# counts, vocabulary V) is fit on the TRAIN split of
# ds_split_deterministic (md5 bucket < 80) and scores the TEST split
# (bucket ≥ 90) — "how surprising is unseen data under the training
# distribution", the signal that (a) ranks held-out docs for
# curation and (b) collapses toward the in-corpus score when test
# leaks into train (the decontamination check's LM-side companion to
# text_decontaminate).
#
# OOV handling is add-one smoothing's: an unseen bigram scores
# (0+1)/(n(w1)+V), an unseen CONTEXT (0+1)/(0+V) — both well-defined
# via left joins + coalesce, and n_unseen_bigrams is emitted per doc
# so the surprise decomposes. Same count-table join shape as
# text_bigram_lm (map-side-combinable counts, vocabulary-keyed joins,
# broadcast scalar V); the split predicates are pure functions of
# doc_id (the md5 identity convention), pushed to the scans.
# ---------------------------------------------------------------------------

_HELDOUT_LM_ORACLE = """
    WITH split AS (
        SELECT doc_id, text,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   % 100 AS bucket
        FROM documents
    ),
    toks AS (
        SELECT doc_id, bucket,
               list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                           x -> length(x) > 0) AS t
        FROM split
    ),
    bg AS (
        -- len(t)-driven bound (ADVICE r11), matching the Spark side's
        -- full size(t)-1 bigram enumeration on docs of any length
        SELECT doc_id, bucket, t[i] AS w1, t[i + 1] AS w2
        FROM (SELECT doc_id, bucket, t,
                     unnest(generate_series(1, len(t) - 1)) AS i
              FROM toks)
    ),
    bgc AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c
            FROM bg WHERE bucket < 80 GROUP BY w1, w2),
    ctx AS (SELECT w1, CAST(count(*) AS DOUBLE) AS n
            FROM bg WHERE bucket < 80 GROUP BY w1),
    v AS (SELECT CAST(count(DISTINCT x) AS DOUBLE) AS v
          FROM toks, unnest(t) AS u(x) WHERE bucket < 80),
    test_bg AS (SELECT doc_id, w1, w2 FROM bg WHERE bucket >= 90)
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(count(CASE WHEN bgc.c IS NULL THEN 1 END) AS BIGINT)
               AS n_unseen_bigrams,
           CAST(round(avg(log2((coalesce(bgc.c, 0) + 1)
                               / (coalesce(ctx.n, 0) + v.v))), 4) AS DOUBLE)
               AS mean_log2_prob
    FROM test_bg b
    LEFT JOIN bgc ON b.w1 = bgc.w1 AND b.w2 = bgc.w2
    LEFT JOIN ctx ON b.w1 = ctx.w1
    CROSS JOIN v
    GROUP BY b.doc_id ORDER BY b.doc_id
"""


@query(
    "text_bigram_lm_heldout",
    oracle=_HELDOUT_LM_ORACLE,
    tags=("llm", "text", "lm", "split"),
)
def text_bigram_lm_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split LM surprise: the add-one bigram LM fit on the
    deterministic TRAIN split scores every TEST-split doc — per doc,
    the bigram count, the count the training LM never saw, and the
    mean log2 probability under the training distribution."""
    from flume_source_spark.pipeline.dataset import (
        TRAIN_PCT,
        VAL_PCT,
        split_bucket,
    )

    d = load_tables(spark, sf_dir)["documents"]
    toks = d.select(
        "doc_id",
        split_bucket(F.col("doc_id")).alias("bucket"),
        F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda x: F.length(x) > 0).alias("t"),
    )
    bg = toks.select(
        "doc_id",
        "bucket",
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("p"),
    ).select("doc_id", "bucket", "p.w1", "p.w2")
    train_bg = bg.filter(F.col("bucket") < TRAIN_PCT)
    bgc = train_bg.groupBy("w1", "w2").agg(F.count("*").cast("double").alias("c"))
    ctx = train_bg.groupBy("w1").agg(F.count("*").cast("double").alias("n"))
    v = (
        toks.filter(F.col("bucket") < TRAIN_PCT)
        .select(F.explode("t").alias("x"))
        .agg(F.countDistinct("x").cast("double").alias("v"))
    )
    test_bg = bg.filter(F.col("bucket") >= TRAIN_PCT + VAL_PCT).select(
        "doc_id", "w1", "w2"
    )
    scored = (
        test_bg.join(bgc, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .crossJoin(F.broadcast(v))
        .withColumn(
            "lp",
            F.log2(
                (F.coalesce(F.col("c"), F.lit(0.0)) + 1)
                / (F.coalesce(F.col("n"), F.lit(0.0)) + F.col("v"))
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.count(F.when(F.col("c").isNull(), 1)).cast("long").alias("n_unseen_bigrams"),
            F.round(F.avg("lp"), 4).alias("mean_log2_prob"),
        )
        .orderBy("doc_id")
    )
