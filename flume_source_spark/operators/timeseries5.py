"""Batch time-series wave 5: sequence pattern matching and robust
(MAD) outlier detection.

- ``ts_event_pattern_regex`` — MATCH_RECOGNIZE-style event-sequence
  pattern mining, reformulated for engines without the clause (Spark
  has no MATCH_RECOGNIZE): encode each user's time-ordered event
  stream as a STRING (one char per event: c/e/p/s/v), then count
  regex matches. A row-pattern query like
  ``PATTERN (V ANY* C ANY* P)`` becomes the lazy regex ``v.*?c.*?p``
  over the encoded sequence — leftmost non-overlapping match counting
  is identical in RE2 (DuckDB) and the Java regex engine for this
  construct class (see scalars2.py's RE2∩Java flavor contract).
  Patterns: the view→click→purchase funnel (with arbitrary
  intervening events) and error bursts (``ee+`` runs). The encode is
  an ordered string_agg per user — one shuffle; the regex scan is
  executor-local, O(sequence length) per user. At 100 TB, per-user
  sequences are bounded by session windows first (``ts_sessionize_
  gaps``) so no single string grows unbounded.
- ``ts_outlier_mad`` — robust outlier detection: flag points beyond
  3× the Median Absolute Deviation from the per-type median. Medians
  of integers land on .5 — so the whole test runs in SCALED INTEGER
  arithmetic: with cents x_i, med2 = 2·median(x) and dev_i =
  |2·x_i − med2| are exact integers, mad4 = 2·median(dev) is an
  exact integer = 4·MAD, and the flag |x−med| > 3·MAD is EXACTLY
  ``2·dev_i > 3·mad4`` — no float comparison anywhere, so the
  boundary (a point at exactly 3 MAD) is tie-free cross-engine.
  Exact medians need a per-group sort (percentile is not mergeable);
  at 100 TB swap percentile → approx_percentile and keep the same
  integer contract, or accept the per-key sort where keys are many
  and groups modest — the same trade ``agg_percentile_exact``
  documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_PATTERN_ORACLE = """
    WITH seq AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
        FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(length(s) AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(s, 'v.*?c.*?p')) AS BIGINT) AS n_funnels,
           CAST(len(regexp_extract_all(s, 'ee+')) AS BIGINT) AS n_error_bursts
    FROM seq
    ORDER BY user_id
"""


@query("ts_event_pattern_regex", oracle=_PATTERN_ORACLE, tags=("timeseries", "pattern"))
def ts_event_pattern_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-sequence pattern counts: view→click→purchase
    funnels (lazy-quantified, non-overlapping) and error bursts, via
    ordered sequence encoding + regexp_count."""
    e = load_tables(spark, sf_dir)["events"]
    seq = (
        e.select(
            "user_id",
            F.struct(F.col("ts"), F.col("event_id"), F.substring("event_type", 1, 1).alias("ch")).alias("evt"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("evt")), lambda x: x["ch"]), ""
            ).alias("s")
        )
    )
    return seq.select(
        "user_id",
        F.length("s").cast("long").alias("n_events"),
        F.regexp_count("s", F.lit("v.*?c.*?p")).cast("long").alias("n_funnels"),
        F.regexp_count("s", F.lit("ee+")).cast("long").alias("n_error_bursts"),
    ).orderBy("user_id")


_MAD_ORACLE = """
    WITH c AS (
        SELECT event_type, event_id,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
    med AS (
        SELECT event_type,
               CAST(2 * median(cents) AS BIGINT) AS med2
        FROM c GROUP BY event_type),
    dev AS (
        SELECT c.event_type, c.event_id, c.cents, m.med2,
               abs(2 * c.cents - m.med2) AS dev
        FROM c JOIN med m USING (event_type)),
    mad AS (
        SELECT event_type, CAST(2 * median(dev) AS BIGINT) AS mad4
        FROM dev GROUP BY event_type)
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n_points,
           any_value(d.med2) AS med2_cents,
           any_value(a.mad4) AS mad4_cents,
           CAST(count(*) FILTER (2 * d.dev > 3 * a.mad4) AS BIGINT) AS n_outliers,
           CAST(max(CASE WHEN 2 * d.dev > 3 * a.mad4 THEN d.cents END) AS BIGINT)
               AS max_outlier_cents
    FROM dev d JOIN mad a USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
"""


@query("ts_outlier_mad", oracle=_MAD_ORACLE, tags=("timeseries", "anomaly"))
def ts_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type robust outlier census: points beyond 3 MAD of the
    median, decided entirely in scaled-integer arithmetic (2·dev vs
    3·mad4) so the boundary is exact on both engines."""
    e = load_tables(spark, sf_dir)["events"]
    c = e.select(
        "event_type", "event_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    med = c.groupBy("event_type").agg(
        (2 * F.expr("percentile(cents, 0.5)")).cast("long").alias("med2")
    )
    dev = c.join(med, "event_type").withColumn(
        "dev", F.abs(2 * F.col("cents") - F.col("med2"))
    )
    mad = dev.groupBy("event_type").agg(
        (2 * F.expr("percentile(dev, 0.5)")).cast("long").alias("mad4")
    )
    d = dev.join(mad, "event_type")
    is_out = 2 * F.col("dev") > 3 * F.col("mad4")
    return (
        d.groupBy("event_type")
        .agg(
            F.count("*").alias("n_points"),
            F.any_value("med2").alias("med2_cents"),
            F.any_value("mad4").alias("mad4_cents"),
            F.count_if(is_out).alias("n_outliers"),
            F.max(F.when(is_out, F.col("cents"))).alias("max_outlier_cents"),
        )
        .orderBy("event_type")
    )


_TRANSITION_ORACLE = """
    WITH ordered AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events),
    trans AS (
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(count(*) AS BIGINT) AS n
        FROM ordered WHERE next_type IS NOT NULL
        GROUP BY 1, 2),
    tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total
            FROM trans GROUP BY from_type)
    SELECT t.from_type, t.to_type, t.n,
           t.n * 10000 // o.row_total AS prob_permyriad
    FROM trans t JOIN tot o USING (from_type)
    ORDER BY t.from_type, t.to_type
"""


@query("ts_transition_matrix", oracle=_TRANSITION_ORACLE, tags=("timeseries", "markov"))
def ts_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream:
    (from_type → to_type) counts over per-user time-ordered
    successions, with integer-permyriad row-normalized probabilities.
    One window shuffle on user_id (transitions never cross users) +
    one tiny (|types|²) aggregate — the census that powers next-event
    prediction and anomaly scoring over session streams."""
    e = load_tables(spark, sf_dir)["events"]
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    trans = (
        ordered.where(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
    tot = trans.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    return (
        trans.join(tot, "from_type")
        .select(
            "from_type", "to_type", "n",
            ((F.col("n") * 10000) / F.col("row_total")).cast("long").alias("prob_permyriad"),
        )
        .orderBy("from_type", "to_type")
    )


_PEAK_ORACLE = """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               sum(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2),
    nb AS (
        SELECT event_type, bucket, cents,
               lag(cents) OVER w AS prev,
               lead(cents) OVER w AS nxt
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
    peaks AS (
        SELECT event_type, bucket, cents,
               cents - greatest(prev, nxt) AS prominence
        FROM nb
        WHERE prev IS NOT NULL AND nxt IS NOT NULL
          AND cents > prev AND cents > nxt)
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           CAST(cents AS BIGINT) AS cents,
           CAST(prominence AS BIGINT) AS prominence
    FROM peaks
    WHERE prominence >= 500
    ORDER BY event_type, bucket
"""


@query("ts_peak_detection", oracle=_PEAK_ORACLE, tags=("timeseries", "anomaly"))
def ts_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum peak detection with a minimum prominence: hourly
    cents per type, a peak = strictly above BOTH neighbors with
    margin ≥ 500 cents over the higher one. Integer comparisons only
    (strict > excludes plateaus deterministically — a plateau run has
    no row above both neighbors, the standard discrete-peak
    convention); one lag+lead window over the pre-aggregated series.
    Interior points only (series endpoints have one neighbor — not
    classifiable)."""
    from pyspark.sql import Window as W

    e = load_tables(spark, sf_dir)["events"]
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    w = W.partitionBy("event_type").orderBy("bucket")
    nb = hourly.select(
        "event_type", "bucket", "cents",
        F.lag("cents").over(w).alias("prev"),
        F.lead("cents").over(w).alias("nxt"),
    )
    return (
        nb.where(
            F.col("prev").isNotNull()
            & F.col("nxt").isNotNull()
            & (F.col("cents") > F.col("prev"))
            & (F.col("cents") > F.col("nxt"))
        )
        .select(
            "event_type",
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "cents",
            (F.col("cents") - F.greatest("prev", "nxt")).cast("long").alias("prominence"),
        )
        .where(F.col("prominence") >= 500)
        .orderBy("event_type", "bucket")
    )
