#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...}

Execution is measured end-to-end per query with a noop-format write
(full plan runs on executors, nothing collects to the driver), after a
JVM/codegen warmup pass. The headline set spans the engine's cost
classes: scan+agg, broadcast-join pipelines, top-k, windows,
rollup, streaming batch-twin, dedup (LSH), similarity, text quality.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q07_nation_volume",
    "q09_product_type_profit",
    "q10_returned_items",
    "q18_large_volume_customers",
    "q21_waiting_supplier",
    "join_broadcast_hint",
    "join_shuffle_fact_fact",
    "join_asof",
    "window_topk_per_group",
    "agg_rollup",
    "subquery_exists_correlated",
    "streaming_tumbling_window",
    "merge_upsert_emulation",
    "dedup_minhash_lsh",
    "dedup_cluster_cc_lsh",
    "sim_cosine_topk",
    "text_quality",
    "text_tfidf_topk",
    "text_dup_ngram_fraction",
    "ts_gap_fill",
    "ts_sessionize_gaps",
    # round-3 additions (new cost classes: bar windows over events,
    # pure-HOF per-row text scoring)
    "ts_ohlc_bars",
    "text_gopher_rules",
    # round-4 additions (new cost classes: positional-gram span
    # merge with gaps-and-islands windows; iterative k-means training
    # + cluster-blocked pairwise cosine — latency-bound at fixture
    # scale: ~8 sequential jobs with Python-worker barriers, which is
    # the cost that AMORTIZES at real scale, steady ≈ 6 s at sf0.1)
    "text_substring_dedup_spans",
    "ds_semdedup",
    # round-4 session-2 additions (new cost classes: one-pass
    # multi-metric profiling with Expand for exact NDV; corpus bigram
    # LM — explode → two count aggs → double join-back on vocab keys;
    # RAKE — per-doc prefix-sum windows + vocabulary join; time-RANGE
    # frame windows per user)
    "profile_summary",
    "text_bigram_lm",
    "text_rake_keywords",
    "window_range_interval",
    # round-4 session-3 additions (new cost classes: corpus-level
    # segment-frequency dedup — explode + countDistinct + dictionary
    # join; bloom build+probe — bit_or word aggregate + broadcast
    # probe + verify semi-join; grid-blocked spatial equi-join with
    # constant 9× replication)
    "text_line_dedup",
    "ds_bloom_dedup",
    "geo_grid_join",
    # round-5 additions (VERDICT r4 item 6 — the never-benched cost
    # classes, one per family so a profile_summary-style plan bug
    # cannot hide): partitioned-upsert + time-travel read (write-path
    # amplification class); PQ/ADC scan (codebook-in-closure Arrow
    # kernel); triangle census + k-core peel (wedge join / iterative
    # peel over the shared similarity edge set — latency-bound at
    # sf0.1: ~6-8 sequential jobs, the constant that amortizes at
    # scale); spatial density rollup; scaled-integer PageRank
    # (bounded-rollup iterative class, the hash-checkable twin)
    "upsert_time_travel",
    "sim_ann_pq_adc",
    "graph_triangle_count",
    "graph_kcore",
    "geo_heatmap_grid",
    "graph_pagerank_exact",
    # round-6 additions (the new hash-checkable twins — different
    # cost classes from their rows-only siblings: 64×-explode +
    # broadcast-lattice partial agg; 32-conditional-sum bit pack +
    # banded self-join with popcount filter)
    "emb_quantize_pq_exact",
    "dedup_simhash_hamming_exact",
    "sim_ann_lsh_exact",
    # round-6 session-2 additions (new cost classes: N×-replicated
    # salted fact-fact join — the explicit hot-key lever, exchanges
    # hash on (key, salt); broadcast-centroid IVF assign + probe —
    # argmin collapses map-side, corpus never shuffles for candidates)
    "skew_salted_join",
    "sim_ann_ivf_exact",
    # (new cost class: per-row 64×64 outer-product flatten into a
    # 4096-key map-side-combinable Gram agg + corpus-independent
    # integer matvec rounds)
    "emb_pca_power_exact",
    # (new cost class: broadcast-LUT (sub, code) equi-join over the
    # corpus code table + map-side-collapsed (qid, cid) sum)
    "sim_ann_adc_exact",
    # round-7 additions, solo-probed ~0.8 s / ~1.8 s steady (new cost
    # classes: two-level mergeable-bitmap rollup — per-group bit_or
    # word tables re-merged globally off a checkpointed partial, no
    # base rescan; iterative string-rewrite trainer — 3 rounds of
    # vocabulary pair-count agg + 1-row argmax + literal-replace map)
    "agg_sketch_merge_exact",
    "text_bpe_merges_exact",
    # round-7 late additions, solo-probed ~0.8 s / ~0.5 s steady (new
    # cost classes: broadcast-bitmap runtime-filtered fact join — the
    # ≤1 MB bloom word table prunes lineitem map-side pre-exchange;
    # bit_and/bit_or set expressions over checkpointed sketch partials)
    "join_bloom_prefilter",
    "agg_sketch_intersect_exact",
    # round-7 session-4 additions, solo-probed ~1.2 s / ~1.5 s steady
    # (new cost classes: data-dependent rate table broadcast back over
    # a map-side keep-gate; doc-set collect + bounded array pair
    # expansion — one corpus exchange, no self-join)
    "ds_domain_mix_rebalance",
    "text_cooccurrence_pmi",
    # release-QA pair, solo-probed ~0.4 s / ~0.25 s steady (new cost
    # classes: full-outer id-diff with per-source rollup; chained
    # QI-cardinality aggregations)
    "ds_snapshot_diff",
    "ds_k_anonymity_audit",
    # round-7 session-5 approximation-quality audits, solo-probed
    # ~1.9 s / ~2.0 s steady (new cost classes: persisted-shingle
    # exact-truth join on the md5-bucket sample + banded candidate
    # self-join + count rollup; brute-force broadcast top-k vs IVF
    # twin with per-query set-intersection)
    "dedup_lsh_recall_audit",
    "sim_ann_recall_audit",
    # round-8 admission: capped-IVF bulk k-NN graph (solo 2.43 s,
    # 8× probe 1.5× — scripts/scale_probe_r8.py)
    "sim_knn_graph",
    # round-7 session-6 addition, solo-probed ~3.0 s under a ~1.7×-
    # contended canary (clean-host ≈1.5-2 s; new cost class: persisted
    # (doc, token) wordcount fanned to three consumers — panel
    # TakeOrdered, doc-length rollup, broadcast-panel-pruned scoring
    # probe — then an 8-key top-K window)
    "text_bm25_topk",
    # round-7 session-6 late addition, solo-probed ~1.2-1.5 s steady
    # (new cost class: checkpointed per-group histogram partials
    # rolled up at two grains + cumulative windows over BIN space +
    # broadcast quantile-panel join — the quantile-sketch workflow)
    "agg_quantile_hist_exact",
    # round-7 session-7 additions, solo-probed ~0.75 s / ~1.6 s
    # (new cost classes: rank-statistic reduction — distinct-score
    # map-side collapse, cumulative window + final agg on GROUP space;
    # 500 cd proximity pair join (~205k edges at sf0.1 — the radius
    # where the key-derived lattice first yields a non-empty graph)
    # + two membership joins + exact BIGINT community accounting)
    "dq_roc_auc_exact",
    "graph_modularity_exact",
    # round-9 admissions, solo + 8x probed (scripts/scale_probe_r9.py):
    # NN-descent refinement round over the registered k-NN graph —
    # candidate-expansion equi-joins + rerank (solo 3.98 s, 8x 1.76x)
    "sim_knn_descent_round",
    # the k-NN ladder's quality audit: two bounded views + descent +
    # budget-gated exact side (solo 6.34 s, 8x 1.44x — the exact side
    # is ~150 sampled nodes x N dots, modulus self-scales)
    "sim_knn_refined_recall_audit",
    # sequential per-shard MG fold via applyInPandas — the python-
    # kernel-per-group cost class (solo 0.88 s, 8x 1.75x)
    "mg_shard_summaries_exact",
    # calendar-bounded day-pair self-join + tie rollup (solo 0.57 s,
    # 8x 1.14x — daily collapse absorbs row growth map-side)
    "ts_mann_kendall",
    # shingle first-occurrence join (posting lists grow with dup
    # factor: 8x replicated text measured 2.55x — adversarial shape)
    "text_novelty_curve",
    # round-9 session-2 admission (scripts/scale_probe_r9b.py): the
    # vectorized-DP-kernel cost class — hash-blocked applyInPandas
    # running an exact int64 band DP across all users in a block +
    # one 25-row rollup collect for the reference profile (solo
    # 2.2 s, 8x users 0.72x — the bigger shuffle escapes AQE's
    # single-partition coalesce and parallelizes the kernel)
    "ts_dtw_band",
    # round-9 session-3: NO admissions (scripts/scale_probe_r9c.py,
    # SCALE.md part 9c). All six new queries were solo + 8x probed
    # and every cost class is already represented in HEADLINE:
    # dq_cohens_kappa 0.88x / dq_gini_impurity 1.22x (4-counter
    # map-side folds — the dq_chi2 precedent), ts_spearman_corr 1.0x
    # (rank windows over the collapsed daily frame — dq_roc_auc's
    # class), ts_theil_sen 0.90x (calendar-bounded day-pair join —
    # ts_mann_kendall's class), graph_local_clustering 8.67x /
    # graph_bfs_layers 4.92x (output-bound under cosine-identical
    # 64x-edge replication — the triangle-census caveat class, NOT
    # admitted for the same reason as graph_two_hop_reach).
    # round-10 admission (scripts/scale_probe_r10.py, SCALE.md part
    # 10): the recurrence-kernel + scoring-join cost class — the HW
    # applyInPandas kernel feeding window-join WAPE scoring against
    # the trailing-mean baseline (solo 1.28 s, 8x events 0.88x —
    # calendar-bounded after the daily collapse)
    "ts_hw_backtest_wape",
    # round-11 admissions (scripts/scale_probe_r11.py, SCALE.md part
    # 11): (a) the distributed global-order helper cost class —
    # percentile_approx boundary pass + bucket-partitioned window
    # rank + broadcast offset join (solo 6.33 s, 1.31× at 8×
    # lineitem; the plan all four global-window re-shapes ride);
    # (b) the survival-statistics fold — per-user lag window into a
    # calendar-bounded life table, reverse-cumulative at-risk windows,
    # DECIMAL ppm fold (solo 0.64 s, 1.28× at 8× events)
    "agg_equidepth_histogram",
    "ts_logrank",
]


# Documented per-entry noise bands (VERDICT r9 item 5): entries whose
# recorded history shows structural burst sensitivity carry an
# expected [lo, hi] min-of-3 band, and the contract line reports each
# banded entry's measured value against it — so the artifact itself
# says "in-band" and no round needs prose to adjudicate the number.
# ds_semdedup: the engine's most sequential-stage-heavy entry (seed
# collect + 2 fused Lloyd rounds + decisions — ~8 back-to-back jobs
# whose per-job latency floor, not throughput, sets the time; the
# constant that amortizes at real scale). Recorded min-of-3 history:
# 3.48 s (r8 driver) / 3.5-4.3 s solo / 3.7 s and 8.1 s in the same
# r9 session / 6.48 s (r9 contended driver window) / 9.43 in a
# contended r12 local window whose immediate solo re-check read
# 5.86 min-of-3 (first sample 12.2 — the job-latency floor under
# burst load) — band [3.3, 10.0].
#
# Round-11 additions (VERDICT r10 item 4 — the other chronically
# window-sensitive entries, banded from their recorded solo/driver
# history so BENCH movers self-adjudicate in-artifact):
# - graph_kcore: iterative 6-round peel on a shrinking checkpointed
#   edge set. History: 4.83 solo (SCALE part 5) / 5.26 (r8 driver) /
#   4.98 (r9) / 6.57 at spread 26.9 (r10 contended) — band [4.5, 8.0].
# - graph_triangle_count: canonical i<j<k wedge join, untouched since
#   r4. History: 3.46 solo min (r8 adjudication) / 4.22 / 4.67 / 4.47
#   (r8-r10 drivers) — band [3.3, 5.8].
# - sim_knn_descent_round: one NN-descent round, equi-joins + one
#   top-k window. History: 3.98 solo (SCALE part 8) / 3.9 (r9) / 4.84
#   (r10 contended) — band [3.5, 6.0].
# - sim_knn_refined_recall_audit: the full ladder audit incl. the
#   budget-gated exact side. History: 6.34 solo (SCALE part 8) / 6.46
#   (r9) / 7.53 (r10 contended) — band [6.0, 9.5].
NOISE_BANDS: dict[str, tuple[float, float]] = {
    "ds_semdedup": (3.3, 10.0),
    "graph_kcore": (4.5, 8.0),
    "graph_triangle_count": (3.3, 5.8),
    "sim_knn_descent_round": (3.5, 6.0),
    "sim_knn_refined_recall_audit": (6.0, 9.5),
}


def _bench_filemeta_drain(spark, n_files: int = 5000) -> float:
    """Drain a 5000-file spool directory through the filemeta source
    (oldest-first, full metadata rows). The reference's model for the
    same drain is one O(n) directory re-list + linear min-scan PER
    EVENT on one thread (CephFSEventReader.java:108-156) plus a 500 ms
    poll floor — structurally minutes; here it is one listing + one
    sort + distributed emission."""
    import shutil
    import tempfile

    from flume_source_spark.sources.filemeta import register

    register(spark)
    d = tempfile.mkdtemp(prefix="filemeta_bench_")
    try:
        for i in range(n_files):
            with open(os.path.join(d, f"f{i:05d}"), "w") as f:
                f.write("x")
        def drain() -> float:
            t0 = time.perf_counter()
            n = (
                spark.read.format("filemeta")
                .option("path", d)
                .option("consumeOrder", "oldest")
                .option("canary", "false")
                .load()
                .count()
            )
            assert n == n_files, (n, n_files)
            return time.perf_counter() - t0

        return min(drain(), drain())
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_session(app_name="flume_source_spark_bench")
    specs = load_all()

    def run_once(name: str) -> float:
        # builder INSIDE the timer: for declarative queries it only
        # constructs a lazy plan (sub-ms), but iterative builders
        # (connected components' checkpointed loop, IVF's Lloyd
        # rounds) do real cluster work during construction — timing
        # from the builder call is what a user actually waits.
        t0 = time.perf_counter()
        df = specs[name].builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Contention protocol (round-3 lesson: BENCH_r03 recorded 83.7 s
    # of which ~65 s was noisy-neighbor burst, unfalsifiable after the
    # fact). Three defenses:
    #   1. THREE samples per query minimum, min-of-N reported; a 4th
    #      sample when the three disagree >3× (all three may sit
    #      inside one burst).
    #   2. Samples for a query are NOT back-to-back: the sweep runs
    #      the whole headline list three times end-to-end, so one
    #      multi-second burst inflates one PASS, not every sample of
    #      one query.
    #   3. A CANARY (q06, a fixed ~0.1 s scan+agg) is timed before
    #      each pass and recorded — the next reader can see which
    #      passes ran contended without re-running anything.
    def sweep(names: list[str]) -> tuple[dict[str, list[float]], list[float]]:
        samples: dict[str, list[float]] = {n: [] for n in names}
        canary: list[float] = []

        def one_pass() -> None:
            canary.append(round(run_once("q06_forecast_revenue"), 3))
            for n in names:
                samples[n].append(run_once(n))

        for _pass in range(3):
            one_pass()
        # Round-13 hardening (VERDICT r12 item 2): in the r12 driver
        # window a single long burst owned ALL THREE passes — the
        # canary rose monotonically 0.461→0.543→0.679 and the
        # per-entry 3×-spread hatch below never fired because every
        # sample was equally inflated. A rising canary TREND is the
        # one signal that survives that failure mode, so it triggers
        # one extra full pass (its canary recorded like the others —
        # the artifact shows why the pass ran).
        if canary[-1] > 1.3 * canary[0]:
            one_pass()
        for n in names:  # escape hatch: all samples inside one burst
            if max(samples[n]) > 3 * min(samples[n]):
                samples[n].append(run_once(n))
        return samples, canary

    # warmup: JVM + parquet footer cache (q01), the codegen-heaviest
    # expression shape (64-wide zip_with cosine) whose first compile
    # otherwise dominates its own measurement, and the Arrow Python
    # worker pool (one tiny mapInPandas pass) — without the last one
    # the FIRST Python-kernel entry in HEADLINE order absorbs the
    # 32-worker spawn cost into its own pass-1 sample (observed as a
    # 14 s first call vs 4 s steady on ds_semdedup)
    run_once("q01_pricing_summary")
    run_once("sim_cosine_topk")
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    samples, canary = sweep(HEADLINE)
    # 2-decimal entry timings: host contention noise is ≫ 10 ms, so
    # the third decimal carried no information, and at 58 entries its
    # ~60 bytes are the difference between the spread diagnostics
    # fitting the tail budget or not (total keeps 3 dp).
    timings = {n: round(min(s), 2) for n, s in samples.items()}
    timings["filemeta_drain_5k_files"] = round(_bench_filemeta_drain(spark), 2)
    total = round(sum(timings.values()), 3)
    # Artifact-survivability discipline (VERDICT r5 item 4 + r6 item
    # 3): the driver records only a fixed-size 2000-BYTE TAIL of
    # stdout (measured: every BENCH_r*.json has len(tail) == 2000),
    # and round 5's single combined line (timings + full spread +
    # canary) overflowed it — the first ~16 entries' timings were
    # truncated away. Round 6's fix (diagnostics on an earlier line)
    # kept the contract line alive but dropped the diagnostics OUT of
    # the artifact, making the r6 ±15-33% drift unfalsifiable after
    # the fact. Round 7: the contract line carries a SIZE-BUDGETED
    # diagnostics payload — the 3 per-pass canaries always, plus the
    # LARGEST per-entry spreads (max/min over samples) at/above
    # SPREAD_FLOOR, greedily added while the serialized line stays
    # under TAIL_BUDGET bytes. "spread_n_over_floor" records the
    # total over-floor count so a trimmed map is never mistaken for
    # the full picture (no silent caps). The full spread map stays on
    # the earlier line for local readers.
    SPREAD_FLOOR = 1.3
    TAIL_BUDGET = 1900  # driver tail window is 2000 bytes; leave margin
    # Key-shortening scheme (BASELINE.md round-7 session-4 note): at 58
    # entries the full-name contract line fills the budget to the byte,
    # so further headline admissions would silently evict the spread
    # diagnostics. When the timings-only line passes BASE_BUDGET, keys
    # compress to minimal unique prefixes (floor 10 chars — readable,
    # deterministic, reversible against the registry) and the line
    # carries "key_scheme" so a reader knows to expand; the earlier
    # full-fidelity line always keeps the full-name timings.
    BASE_BUDGET = 1600

    def _short_keys(names: list[str]) -> dict[str, str]:
        out = {}
        for n in names:
            for ln in range(10, len(n) + 1):
                p = n[:ln]
                if sum(1 for m in names if m[: len(p)] == p) == 1:
                    out[n] = p
                    break
            else:
                out[n] = n
        return out

    def _prior_timings(full_names: list[str]) -> dict[str, float]:
        """Per-entry timings from the LATEST prior BENCH_r*.json, keyed
        back to full names (prior artifacts may carry unique-prefix
        keys). Never raises — a missing/malformed artifact just means
        no mover detection this run."""
        import glob
        import re

        best = None
        here = os.path.dirname(os.path.abspath(__file__))
        for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
            m = re.search(r"BENCH_r(\d+)\.json$", path)
            if not m:
                continue
            rn = int(m.group(1))
            try:
                with open(path) as f:
                    q = (json.load(f).get("parsed") or {}).get("queries") or {}
            except Exception:
                continue
            if q and (best is None or rn > best[0]):
                best = (rn, q)
        if best is None:
            return {}
        _, q = best
        # a prior short key maps to a current full name ONLY if it
        # prefixes exactly one current name — prior keys were unique
        # within the PRIOR round's name set, so a later admission
        # sharing the prefix (e.g. x_v2 beside x) would otherwise
        # inherit the other query's timing and fake/mask a mover
        out = {}
        for k, v in q.items():
            matches = [f for f in full_names if f.startswith(k)]
            if len(matches) == 1:
                out[matches[0]] = v
        return out

    spread = {n: round(max(s) / max(min(s), 1e-9), 2) for n, s in samples.items()}
    print(
        json.dumps(
            {"sample_spread_full": spread, "timings_full": timings},
            separators=(",", ":"),
        )
    )
    spark.stop()
    # Guaranteed retention for round-over-round MOVERS (VERDICT r7
    # item 6): the r7 artifact trimmed graph_triangle_count's spread
    # out of the retained top-N, making its +30% the one delta the
    # diagnostics couldn't adjudicate after the fact. Any entry whose
    # min moved >20% against the latest prior BENCH artifact now gets
    # a guaranteed spread slot AHEAD of the by-value ordering, so a
    # mover always ships its own contention evidence.
    MOVER_PCT = 0.20
    prior = _prior_timings(list(timings))
    movers = {
        n
        for n, v in timings.items()
        if n in prior and prior[n] > 0 and abs(v / prior[n] - 1) > MOVER_PCT
        # a banded entry measuring at or under its documented hi
        # carries its adjudication in the noise_band field — no slot
        and not (n in NOISE_BANDS and v <= NOISE_BANDS[n][1])
    }
    over = sorted(
        ((n, v) for n, v in spread.items() if v >= SPREAD_FLOOR or n in movers),
        key=lambda kv: (kv[0] not in movers, -kv[1]),
    )
    # spread_n_over_floor keeps its pre-r8 meaning (entries at/above
    # the floor) so the field stays comparable across round artifacts;
    # the mover-union above only affects RETENTION ordering
    n_over_floor = sum(1 for v in spread.values() if v >= SPREAD_FLOOR)
    contract = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # a canary ≫ its own min flags that pass as contended
        "canary_q06_per_pass": canary,
        "spread_floor": SPREAD_FLOOR,
        "spread_n_over_floor": n_over_floor,
        "n_movers_gt20pct": len(movers),
        # self-adjudicating noise bands: [lo, hi, measured, ok] per
        # documented burst-sensitive entry (see NOISE_BANDS). ok means
        # "not slower than the recorded hi" — a faster-than-band run
        # needs no adjudication, so the lo bound is informational only
        "noise_band": {
            n: [lo, hi, timings[n], timings[n] <= hi]
            for n, (lo, hi) in NOISE_BANDS.items()
            if n in timings
        },
        "spread": {},
    }
    if len(json.dumps(dict(contract, spread={}), separators=(",", ":"))) > BASE_BUDGET:
        short = _short_keys(list(timings))
        contract["key_scheme"] = "uniq-prefix-10"
        contract["queries"] = {short[n]: v for n, v in timings.items()}
        contract["noise_band"] = {
            short.get(n, n): v for n, v in contract["noise_band"].items()
        }
        over = [(short[n], v) for n, v in over]
    for n, v in over:
        candidate = dict(contract, spread=dict(contract["spread"], **{n: v}))
        if len(json.dumps(candidate, separators=(",", ":"))) > TAIL_BUDGET:
            # skip, don't stop: entries are ordered by spread VALUE,
            # so a long-NAMED over-budget entry must not truncate
            # shorter-named ones that still fit
            continue
        contract = candidate
    line = json.dumps(contract, separators=(",", ":"))
    if len(line) > 2000:
        # never crash the bench over diagnostics — drop spread wholesale
        # (the base timings dict is what the round's artifact cannot
        # lose; it reaches ~1.6 KB at 52 entries, so headline growth
        # past ~60 entries needs a key-shortening scheme first)
        contract["spread"] = {}
        line = json.dumps(contract, separators=(",", ":"))
        print(f"WARN contract line over tail budget even without spread: {len(line)}B", file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()
