"""The Observation / df.observe() metrics API — free pipeline
telemetry: named aggregates computed DURING a job (piggybacking the
existing pass, no second scan) and delivered to the driver when the
action finishes. The operational backbone for row-count reconciliation
and DQ counters in production pipelines (batch here; on streams the
same observe() surfaces per-batch in StreamingQueryProgress
.observedMetrics)."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from flume_source_spark.tables import load_tables


def test_observe_matches_direct_aggregates(spark, sf_dir):
    """observe() metrics on the scan must equal directly computed
    aggregates — and must reflect the PRE-filter stream when attached
    before the filter (input-side reconciliation counts)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    obs = Observation("scan_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_in"),
        F.count_if(F.col("l_quantity") > 45).alias("high_qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("price_cents"),
    )
    out = observed.filter(F.col("l_quantity") > 45).groupBy().count().collect()
    expected_rows = li.count()
    expected_high = li.filter(F.col("l_quantity") > 45).count()
    expected_cents = li.select(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("s")
    ).collect()[0]["s"]
    got = obs.get
    assert got["rows_in"] == expected_rows  # pre-filter: observe sees all rows
    assert got["high_qty"] == expected_high
    assert got["price_cents"] == expected_cents
    assert out[0]["count"] == expected_high


def test_observe_zero_extra_jobs(spark, sf_dir):
    """The observed metrics ride the SAME action: one collect drives
    both the result and the metrics (no second scan/job for obs.get)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    obs = Observation()
    df = li.observe(obs, F.count(F.lit(1)).alias("n"))
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None) or []
    n_rows = df.count()
    # snapshot BETWEEN the action and obs.get: the delta across obs.get
    # itself is the claim under test (must be empty)
    after_count = set(tracker.getJobIdsForGroup(None) or [])
    metrics = obs.get
    after_get = set(tracker.getJobIdsForGroup(None) or [])
    assert metrics["n"] == n_rows
    assert after_get == after_count, (
        f"obs.get launched job(s): {sorted(after_get - after_count)}"
    )
    assert after_count - set(before), "sanity: the count() did create a job"
    n_check = df.count()  # a second action re-fires the plan...
    after2 = set(tracker.getJobIdsForGroup(None) or [])
    assert after2 - after_get, "sanity: actions do create jobs"
    assert n_check == n_rows
