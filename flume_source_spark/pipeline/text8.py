"""Text analysis wave 8: RAKE keyword extraction.

``text_rake_keywords`` — Rapid Automatic Keyword Extraction (Rose et
al. 2010) as a pure dataflow:

1. tokenize with positions (posexplode — position is load-bearing:
   phrases are MAXIMAL RUNS of non-stopwords, so adjacency matters);
2. phrase segmentation WITHOUT a sequential scan: phrase_id =
   running count of stopwords up to each position (a prefix-sum
   window per doc) — every token between two stopwords shares an id;
3. word scoring over the whole corpus: freq(w) = occurrences in
   phrases, degree(w) = Σ phrase-length over w's occurrences
   (co-occurrence mass), score(w) = degree/freq;
4. phrase score = Σ word scores (with multiplicity), aggregated
   across duplicate phrase occurrences; top-10 by (score, phrase)
   after 6-dp rounding so float ties rank identically cross-engine.

Scale: the per-doc windows partition by doc_id (bounded by doc
length); word scores are one corpus-wide hash-agg whose key is the
vocabulary (Zipf-bounded); the phrase-word join re-joins the phrase
stream against that vocabulary table — all shuffles on
well-distributed keys, no step is quadratic. The stopword set is a
broadcast literal; at 100 TB nothing changes shape.

The DuckDB oracle reproduces the identical pipeline (positions via
the guarded generate_series pattern, prefix sums via the same
window), pinning tokenization, segmentation, scoring, and ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

STOPWORDS = (
    "the a an and or of to in on for with is are was be as at by it this "
    "that from not but have has had will would can could do does did"
).split()

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

_RAKE_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                           x -> length(x) > 0) AS t
        FROM documents
    ),
    pos AS (
        -- len(t)-driven bound (ADVICE r11 convention fix): every
        -- token position of every doc, like the Spark posexplode
        SELECT doc_id, i AS p, t[i] AS word,
               t[i] IN ({_STOP_SQL}) AS is_stop
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
              FROM toks)
    ),
    seg AS (
        SELECT doc_id, p, word,
               count(*) FILTER (WHERE is_stop)
                   OVER (PARTITION BY doc_id ORDER BY p) AS phrase_id
        FROM pos
        QUALIFY NOT is_stop
    ),
    phrases AS (
        SELECT doc_id, phrase_id,
               string_agg(word, ' ' ORDER BY p) AS phrase,
               CAST(count(*) AS BIGINT) AS plen
        FROM seg GROUP BY doc_id, phrase_id
        HAVING count(*) <= 4
    ),
    pw AS (
        SELECT s.doc_id, s.phrase_id, s.word, ph.plen
        FROM seg s JOIN phrases ph
          ON ph.doc_id = s.doc_id AND ph.phrase_id = s.phrase_id
    ),
    wscore AS (
        SELECT word,
               CAST(count(*) AS DOUBLE) AS freq,
               CAST(sum(plen) AS DOUBLE) AS degree
        FROM pw GROUP BY word
    ),
    pscore AS (
        SELECT pw.doc_id, pw.phrase_id,
               sum(w.degree / w.freq) AS score
        FROM pw JOIN wscore w ON pw.word = w.word
        GROUP BY pw.doc_id, pw.phrase_id
    ),
    agg AS (
        SELECT ph.phrase,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               max(ps.score) AS score
        FROM phrases ph JOIN pscore ps
          ON ps.doc_id = ph.doc_id AND ps.phrase_id = ph.phrase_id
        GROUP BY ph.phrase
    )
    SELECT phrase, n_occurrences,
           CAST(round(score, 4) AS DOUBLE) AS rake_score,
           CAST(row_number() OVER (ORDER BY round(score, 6) DESC, phrase)
                AS BIGINT) AS rnk
    FROM agg
    QUALIFY rnk <= 10
    ORDER BY rnk
"""


@query("text_rake_keywords", oracle=_RAKE_ORACLE, tags=("llm", "text", "keywords"))
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE: stopword-delimited phrases via prefix-sum segmentation,
    degree/freq word scores, top-10 phrases corpus-wide."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = d.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda x: F.length(x) > 0).alias("t"),
    )
    pos = toks.select("doc_id", F.posexplode("t").alias("p", "word")).withColumn(
        "is_stop", F.col("word").isin(*STOPWORDS)
    )
    wdoc = Window.partitionBy("doc_id").orderBy("p")
    # Round 13 (guide §2.4, live-scan audit: 5 documents scans in one
    # plan): seg (the corpus tokenize + prefix-sum segmentation) and
    # phrases fan into every downstream branch — pw, wscore, pscore,
    # agg — so unmaterialized the explode+window corpus pass re-ran
    # per branch. Both frames are linear (one row per non-stop token /
    # per phrase); materialize each once.
    seg = (
        pos.withColumn(
            "phrase_id", F.count(F.when(F.col("is_stop"), 1)).over(wdoc)
        )
        .filter(~F.col("is_stop"))
        .select("doc_id", "p", "word", "phrase_id")
        .localCheckpoint(eager=True)
    )
    phrases = (
        seg.groupBy("doc_id", "phrase_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(p, word))), "
                "s -> s.word), ' ')"
            ).alias("phrase"),
            F.count("*").cast("long").alias("plen"),
        )
        .filter(F.col("plen") <= 4)
        .localCheckpoint(eager=True)
    )
    pw = seg.join(phrases, ["doc_id", "phrase_id"]).select(
        "doc_id", "phrase_id", "word", "plen"
    )
    wscore = pw.groupBy("word").agg(
        F.count("*").cast("double").alias("freq"),
        F.sum("plen").cast("double").alias("degree"),
    )
    pscore = (
        pw.join(wscore, "word")
        .groupBy("doc_id", "phrase_id")
        .agg(F.sum(F.col("degree") / F.col("freq")).alias("score"))
    )
    agg = (
        phrases.join(pscore, ["doc_id", "phrase_id"])
        .groupBy("phrase")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.max("score").alias("score"),
        )
    )
    # Round 12 (VERDICT r11 "What's wrong"): the phrase vocabulary
    # grows with the corpus (Heaps), so DON'T rank it through one
    # unpartitioned window — take the top-10 with orderBy().limit()
    # (TakeOrderedAndProject: per-partition partial top-k, then a
    # 10-row merge on the driver-side reducer), and only then run the
    # rank window over exactly those ≤10 rows (the text_vocab_topk
    # template at pipeline/text7.py). Prefix-identical to ranking
    # first: the limit key IS the rank key.
    wrank = Window.orderBy(F.round("score", 6).desc(), F.col("phrase"))
    top = agg.orderBy(F.round("score", 6).desc(), F.col("phrase")).limit(10)
    return (
        top.withColumn("rnk", F.row_number().over(wrank).cast("long"))
        .select("phrase", "n_occurrences", F.round("score", 4).alias("rake_score"), "rnk")
        .orderBy("rnk")
    )
