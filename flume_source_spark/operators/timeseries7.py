"""Time-series wave 7: banded dynamic time warping, exact.

``ts_dtw_band`` — Sakoe-Chiba banded DTW distance between every
user's hour-of-day activity profile and the corpus reference profile.
DTW is the standard shape-distance for behavioral series (two users
with the same daily rhythm shifted by an hour are DTW-close but
Euclidean-far); the band (radius r = 2 here) is what makes it a
production operator rather than a quadratic toy: per series the DP
touches n·(2r+1) cells instead of n², and a warp of more than r
positions is disallowed by construction — the standard speed/sanity
constraint (Sakoe & Chiba 1978, the banding every production DTW
library defaults to).

Semantics, pinned exactly:
  x_u[p] = count of user u's events in hour-of-day p (p = 1..24,
           dense, zero-filled),
  y[p]   = (total corpus events in hour p) DIV n_users — the floor
           "average user" profile, kept integer so every DP cell is
           an exact BIGINT,
  cost(i, j) = |x_u[i] − y[j]|,
  dp[i][j] = cost + min(dp[i−1][j], dp[i][j−1], dp[i−1][j−1]) over
             the |i − j| ≤ 2 band (outside = +INF, INF = 1<<40 —
             additive headroom: ≤ 24 adds of ≤ 2·INF stay far under
             2^63), answer = dp[24][24].

Execution shape at 100 TB:
1. One map-side-combinable groupBy collapses any event volume to
   ≤ n_users·24 rows.
2. The reference profile is a 24-row aggregate collected to the
   driver and closed over by the kernel — the bounded-collect
   discipline the centroid operators use (≤ 24 rows + 1 scalar).
3. The DP is sequential in i but embarrassingly parallel across
   users, and the per-user work is tiny (24×5 cells) — so the kernel
   is NOT one Arrow batch per user (measured: 1500 sub-millisecond
   python invocations serialized behind AQE's coalesce of the tiny
   shuffle, ~3.7 s at sf0.1). Users are hash-blocked
   (pmod(xxhash64(user_id), nblocks)) and one ``applyInPandas`` call
   runs the band DP VECTORIZED across every user in the block: the
   loop is over the 24×5 cells, each step an exact int64 numpy op
   over a U-length vector. Blocking is output-invariant (any
   partition of users gives identical rows — pinned by a test);
   nblocks scales with the session's parallelism so blocks stay
   bounded (~N_users/nblocks·24 rows each) on any cluster.

The DuckDB oracle is an independent formulation: the band row is
pivoted to five offset columns (j = i−2 .. i+2) and a recursive CTE
steps i → i+1, resolving the intra-row dependency (dp[i][j−1]) by
expanding the lower-offset expression inline — five chained least()
terms, the textbook recurrence unrolled across the band.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_N = 24  # series length: hour-of-day positions 1..24
_INF = 1 << 40

# Recursive-step expressions: cur[o] = cost[o] + least(prev[o+1],
# prev[o], cur[o−1]). prev[o+1] is dp[i−1][j] (the band recenters by
# one per row), prev[o] is dp[i−1][j−1], cur[o−1] is dp[i][j−1]; the
# cur[o−1] reference is expanded textually (recursive CTEs cannot
# lateral-reference sibling aliases portably).
_M2 = "c.cm2 + least(r.m1, r.m2)"
_M1 = f"c.cm1 + least(r.z0, r.m1, {_M2})"
_Z0 = f"c.c0 + least(r.p1, r.z0, {_M1})"
_P1 = f"c.cp1 + least(r.p2, r.p1, {_Z0})"
_P2 = f"c.cp2 + least(r.p2, {_P1})"

_DTW_ORACLE = f"""
    WITH RECURSIVE users AS (SELECT DISTINCT user_id FROM events),
    hours AS (SELECT CAST(unnest(generate_series(1, {_N})) AS BIGINT) AS pos),
    hc AS (
        SELECT user_id,
               CAST(hour(CAST(ts AS TIMESTAMP)) + 1 AS BIGINT) AS pos,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    xs AS (
        SELECT u.user_id, h.pos, coalesce(c.c, 0) AS x
        FROM users u CROSS JOIN hours h
        LEFT JOIN hc c ON c.user_id = u.user_id AND c.pos = h.pos
    ),
    nu AS (SELECT CAST(count(*) AS BIGINT) AS n FROM users),
    ys AS (
        SELECT pos, CAST(sum(x) // (SELECT n FROM nu) AS BIGINT) AS y
        FROM xs GROUP BY pos
    ),
    cb AS (
        SELECT x.user_id, x.pos AS i,
               coalesce(max(CASE WHEN y.pos = x.pos - 2 THEN abs(x.x - y.y) END), {_INF}) AS cm2,
               coalesce(max(CASE WHEN y.pos = x.pos - 1 THEN abs(x.x - y.y) END), {_INF}) AS cm1,
               coalesce(max(CASE WHEN y.pos = x.pos     THEN abs(x.x - y.y) END), {_INF}) AS c0,
               coalesce(max(CASE WHEN y.pos = x.pos + 1 THEN abs(x.x - y.y) END), {_INF}) AS cp1,
               coalesce(max(CASE WHEN y.pos = x.pos + 2 THEN abs(x.x - y.y) END), {_INF}) AS cp2
        FROM xs x JOIN ys y ON y.pos BETWEEN x.pos - 2 AND x.pos + 2
        GROUP BY 1, 2
    ),
    rec AS (
        SELECT user_id, i,
               CAST({_INF} AS BIGINT) AS m2,
               CAST({_INF} AS BIGINT) AS m1,
               c0 AS z0,
               c0 + cp1 AS p1,
               c0 + cp1 + cp2 AS p2
        FROM cb WHERE i = 1
        UNION ALL
        SELECT c.user_id, c.i,
               {_M2} AS m2,
               {_M1} AS m1,
               {_Z0} AS z0,
               {_P1} AS p1,
               {_P2} AS p2
        FROM rec r JOIN cb c ON c.user_id = r.user_id AND c.i = r.i + 1
    ),
    tot AS (SELECT user_id, CAST(sum(x) AS BIGINT) AS n_events FROM xs GROUP BY user_id)
    SELECT r.user_id, t.n_events, CAST(r.z0 AS BIGINT) AS dtw_cost
    FROM rec r JOIN tot t ON t.user_id = r.user_id
    WHERE r.i = {_N}
    ORDER BY r.user_id
"""


def _dtw_band_block(xm, y, r: int = 2):
    """Vectorized banded DTW: ``xm`` is a (U, n) int64 matrix of user
    series, ``y`` the length-n reference. Returns the length-U cost
    vector. The DP loops over the n·(2r+1) band cells; every step is
    one exact int64 numpy op across all U users at once."""
    import numpy as np

    u, n = xm.shape
    prev = np.full((u, n), _INF, dtype=np.int64)
    for i in range(1, n + 1):
        cur = np.full((u, n), _INF, dtype=np.int64)
        for j in range(max(1, i - r), min(n, i + r) + 1):
            c = np.abs(xm[:, i - 1] - y[j - 1])
            if i == 1 and j == 1:
                cur[:, 0] = c
                continue
            best = np.full(u, _INF * 4, dtype=np.int64)
            np.minimum(best, prev[:, j - 1], out=best)  # dp[i-1][j]
            if j > 1:
                np.minimum(best, prev[:, j - 2], out=best)  # dp[i-1][j-1]
                np.minimum(best, cur[:, j - 2], out=best)  # dp[i][j-1]
            cur[:, j - 1] = c + best
        prev = cur
    return prev[:, n - 1]


def _dtw_band_cost(x: list[int], y: list[int], r: int = 2) -> int:
    """Exact banded DTW in python ints — the kernel's inner DP. Same
    cell order as the oracle (row-major, left-to-right in the band)."""
    n = len(x)
    prev = [_INF] * n  # dp[i-1][j-1] indexed by j-1
    for i in range(1, n + 1):
        cur = [_INF] * n
        for j in range(max(1, i - r), min(n, i + r) + 1):
            c = abs(x[i - 1] - y[j - 1])
            if i == 1 and j == 1:
                cur[j - 1] = c
                continue
            best = _INF * 4
            if i > 1 and abs(i - 1 - j) <= r:
                best = min(best, prev[j - 1])  # dp[i-1][j]
            if i > 1 and j > 1 and abs(i - j) <= r + 1:
                best = min(best, prev[j - 2])  # dp[i-1][j-1]
            if j > 1 and abs(i - (j - 1)) <= r:
                best = min(best, cur[j - 2])  # dp[i][j-1]
            cur[j - 1] = c + best
        prev = cur
    return prev[n - 1]


@query("ts_dtw_band", oracle=_DTW_ORACLE, tags=("timeseries", "similarity", "exact-twin"))
def ts_dtw_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded (r=2) DTW distance from each user's hour-of-day profile
    to the integer "average user" reference profile — the behavioral
    outlier score (bot/scraper rhythms warp far from the reference even
    when their volumes look normal). Exact BIGINT DP per user inside
    one applyInPandas pass; hash-pinned against a recursive-CTE oracle
    replaying the identical band recurrence."""
    import numpy as np

    ev = load_tables(spark, sf_dir)["events"]
    counts = ev.groupBy(
        "user_id", (F.hour("ts") + 1).cast("long").alias("pos")
    ).agg(F.count("*").cast("long").alias("c"))

    # Reference profile: ONE bounded collect (≤ 25 rows) — rollup("pos")
    # yields the 24 per-hour totals AND the grand-total row, whose
    # exact count(distinct user_id) is n_users, in a single pass.
    ref_rows = (
        ev.select((F.hour("ts") + 1).cast("long").alias("pos"), "user_id")
        .rollup("pos")
        .agg(F.count("*").alias("t"), F.countDistinct("user_id").alias("nu"))
        .collect()
    )
    totals = {int(r["pos"]): int(r["t"]) for r in ref_rows if r["pos"] is not None}
    n_users = next(int(r["nu"]) for r in ref_rows if r["pos"] is None)
    y = np.array([totals.get(p, 0) // n_users for p in range(1, _N + 1)], dtype=np.int64)
    nblocks = max(256, spark.sparkContext.defaultParallelism * 8)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        uids, uidx = np.unique(pdf["user_id"].to_numpy(), return_inverse=True)
        xm = np.zeros((len(uids), _N), dtype=np.int64)
        xm[uidx, pdf["pos"].to_numpy() - 1] = pdf["c"].to_numpy()
        return pd.DataFrame(
            {
                "user_id": uids,
                "n_events": xm.sum(axis=1),
                "dtw_cost": _dtw_band_block(xm, y),
            }
        )

    return (
        counts.groupBy(F.pmod(F.xxhash64("user_id"), F.lit(nblocks)))
        .applyInPandas(kernel, schema="user_id long, n_events long, dtw_cost long")
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Last-touch attribution (round 9, session 2): for every conversion
# (purchase), find the same user's most recent preceding touch event
# (click/view) and attribute the conversion to it when the touch falls
# inside the 7-day lookback. The standard marketing/behavior join —
# and the canonical "carry the last non-null over an ordered stream"
# window shape (last(..., ignorenulls) over ROWS UNBOUNDED PRECEDING
# .. 1 PRECEDING), which none of the other ts queries exercise.
#
# Determinism: the per-user order is (event timestamp, event_id) — a
# total order. Timestamps are compared at MICROSECOND precision on
# both engines (Spark reads the fixture nanos truncated to micros,
# tables.py; the oracle applies the same CAST). Lags are exact BIGINT
# microseconds (unix_micros / epoch_us), never a date_diff whose
# boundary-crossing semantics could diverge.
#
# Scale: one window pass per user partition — the engine's bread-and-
# butter sessionization shape (sort within user, single carry); no
# join, no python. The three carried columns share one window frame,
# so Catalyst evaluates them in a single Window operator.
# ---------------------------------------------------------------------------

_ATTR_LOOKBACK_US = 7 * 86_400 * 1_000_000

_ATTR_ORACLE = f"""
    WITH o AS (
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN event_id END IGNORE NULLS) OVER w AS aid,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN event_type END IGNORE NULLS) OVER w AS atype,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN epoch_us(CAST(ts AS TIMESTAMP))
                          END IGNORE NULLS) OVER w AS aus
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id,
           CASE WHEN us - aus <= {_ATTR_LOOKBACK_US} THEN aid END AS attr_event_id,
           CASE WHEN us - aus <= {_ATTR_LOOKBACK_US} THEN atype END AS attr_type,
           CASE WHEN us - aus <= {_ATTR_LOOKBACK_US} THEN us - aus END AS lag_us
    FROM o
    WHERE event_type = 'purchase'
    ORDER BY event_id
"""


@query("ts_attribution_last_touch", oracle=_ATTR_ORACLE, tags=("timeseries", "llm"))
def ts_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the same
    user's most recent strictly-preceding click/view within a 7-day
    lookback (NULL attribution columns otherwise — unattributed
    conversions stay visible). One ignore-nulls carry window per user;
    lags are exact BIGINT microseconds."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("click", "view")
    o = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.last(F.when(is_touch, F.col("event_id")), ignorenulls=True).over(w).alias("aid"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True).over(w).alias("atype"),
        F.last(F.when(is_touch, F.unix_micros("ts")), ignorenulls=True).over(w).alias("aus"),
    )
    within = F.col("us") - F.col("aus") <= F.lit(_ATTR_LOOKBACK_US)
    return (
        o.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.when(within, F.col("aid")).alias("attr_event_id"),
            F.when(within, F.col("atype")).alias("attr_type"),
            F.when(within, F.col("us") - F.col("aus")).alias("lag_us"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival (round 10): the engine's first SURVIVAL
# surface — the re-engagement curve over inter-event gaps. Question:
# "a user has been silent for t hours — what is the probability the
# silence lasts longer?" Durations are the consecutive-event gaps in
# whole hours (observed = death); each user's final OPEN gap (last
# event → corpus max ts) is right-CENSORED — discarding it would bias
# the curve down, the textbook reason KM exists (Kaplan & Meier 1958).
#
#     S(t) = Π_{t_i ≤ t, d_i > 0} (n_i − d_i) / n_i
#
# published as surv_ppm via the recursive integral-div product
# S_i = S_{i−1}·(n_i − d_i) div n_i (floor per death-step, identical
# on both engines; drift vs the true product < #steps ppm —
# documented formulation, the dq_cramers per-cell-floor convention).
# n_i (at risk) is the reverse cumulative count of durations ≥ t_i.
#
# Execution: gaps = one lag window; censored tails = one per-user
# aggregate vs the broadcast 1-row corpus max; the life table is a
# calendar-bounded aggregate (distinct whole-hour durations); the
# recursive product runs in a SINGLE applyInPandas group over that
# ≤ few-hundred-row table (the DTW 24-row-profile bounded-kernel
# discipline — the corpus never enters the kernel). Oracle: recursive
# CTE stepping the ordered life table (the Holt list-state pattern).
# ---------------------------------------------------------------------------

_KM_ORACLE = """
    WITH RECURSIVE ev AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    gmax AS (SELECT max(ts) AS g FROM ev),
    gaps AS (
        -- elapsed WHOLE hours via epoch_us floor-div, matching the
        -- Spark side: date_diff('hour', ...) counts calendar-boundary
        -- CROSSINGS (10:59 -> 11:01 is 1), not elapsed hours (0)
        SELECT user_id,
               (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts))
                - epoch_us(ts)) // 3600000000 AS t
        FROM ev
    ),
    died AS (SELECT CAST(t AS BIGINT) AS t, 1 AS died FROM gaps WHERE t IS NOT NULL),
    cens AS (
        SELECT CAST((epoch_us(gm.g) - epoch_us(max(e.ts))) // 3600000000
                    AS BIGINT) AS t, 0 AS died
        FROM ev e CROSS JOIN gmax gm
        GROUP BY e.user_id, gm.g
    ),
    lt AS (
        SELECT t,
               CAST(sum(died) AS BIGINT) AS d,
               CAST(count(*) - sum(died) AS BIGINT) AS c
        FROM (SELECT * FROM died UNION ALL SELECT * FROM cens)
        GROUP BY t
    ),
    ordered AS (
        SELECT t, d, c,
               CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS i,
               CAST(sum(d + c) OVER (ORDER BY t DESC) AS BIGINT) AS n
        FROM lt
    ),
    rec AS (
        SELECT i, t, d, c, n,
               CAST(CASE WHEN d > 0 THEN (1000000 * (n - d)) // n
                         ELSE 1000000 END AS BIGINT) AS s
        FROM ordered WHERE i = 1
        UNION ALL
        SELECT o.i, o.t, o.d, o.c, o.n,
               CAST(CASE WHEN o.d > 0 THEN (rec.s * (o.n - o.d)) // o.n
                         ELSE rec.s END AS BIGINT) AS s
        FROM rec JOIN ordered o ON o.i = rec.i + 1
    )
    SELECT t AS t_hours, n AS n_at_risk, d AS n_events, c AS n_censored,
           s AS surv_ppm
    FROM rec ORDER BY t_hours
"""


def _km_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sequential KM product over the ORDERED life table (python ints;
    one bounded Arrow batch — the table is calendar-sized)."""
    pdf = pdf.sort_values("t")
    s = 1_000_000
    out = []
    for t, d, c, n in zip(pdf["t"], pdf["d"], pdf["c"], pdf["n"]):
        t, d, c, n = int(t), int(d), int(c), int(n)
        if d > 0:
            s = (s * (n - d)) // n
        out.append((t, n, d, c, s))
    return pd.DataFrame(
        out, columns=["t_hours", "n_at_risk", "n_events", "n_censored", "surv_ppm"]
    )


def survival_durations(ev: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """``(*extra_cols, t, died)`` whole-hour gap durations over a
    ``(user_id, ts [, extras])`` event projection in ONE window pass —
    the shared input of the whole survival family (KM, Nelson-Aalen,
    Greenwood, log-rank, per-arm curves, the A/B report).

    Round-12 single-corpus-pass re-shape: the previous formulation
    built died rows from a lead window and censor rows from a separate
    per-user ``groupBy(max(ts))`` branch crossed with a global-max
    aggregate — three plan branches over the events projection, so
    every survival query re-scanned events 3× (and the composed
    consumers up to 15×, live-scan audit). Here the SAME lead window
    yields both: a row with a successor is a died=1 gap; each user's
    window-LAST row (lead IS NULL — exactly the per-user max(ts) row,
    and for tied maxima a row with the identical ts value) is the
    right-censored open gap to the corpus max, which is collected once
    as a driver literal (a deterministic 1-value agg — the
    global_order boundary-literal class). Byte-identical durations,
    one corpus branch + one tiny scalar job, and the per-user groupBy
    shuffle is gone (the window already shuffles on user_id).

    NOT used by the stratified log-rank: its censor rows carry a
    tie-broken ``max_by`` stratum whose tiebreak is not expressible as
    "the window-last row" under duplicate timestamps — that builder
    keeps its two-branch shape and materializes it instead.

    Precondition: ``ts`` must be non-null on every row (true of the
    events table by construction). The pre-r12 formulation's
    ``t IS NOT NULL`` filter dropped null-ts rows; here a null ts
    would instead emit a (t=NULL, died=1) life-table row (ADVICE
    r12) — byte-identical outputs are guaranteed only for non-null
    ts, including tied per-user maxima."""
    from pyspark.sql import Window as W

    gmax_us = ev.agg(F.max(F.unix_micros("ts"))).first()[0]
    nxt = F.unix_micros(
        F.lead("ts", 1).over(W.partitionBy("user_id").orderBy("ts"))
    )
    base = ev.select(
        *extra_cols,
        (F.coalesce(nxt, F.lit(gmax_us)) - F.unix_micros("ts")).alias("__dur_us"),
        F.when(nxt.isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("died"),
    )
    return base.select(
        *extra_cols,
        F.expr("CAST(__dur_us div 3600000000 AS BIGINT)").alias("t"),
        "died",
    )


def kaplan_meier(durations: DataFrame) -> DataFrame:
    """Core KM fold over a ``(t, died)`` duration frame (t BIGINT,
    died 0/1). Factored so closed-form model tests (no censoring →
    S = empirical survival; censored-only tail never drops S; a
    censored duration reduces later n without a step) drive the
    production life-table + recursion."""
    from pyspark.sql import Window as W

    lt = durations.groupBy("t").agg(
        F.sum("died").cast("long").alias("d"),
        (F.count("*") - F.sum("died")).cast("long").alias("c"),
    )
    ordered = lt.select(
        "t",
        "d",
        "c",
        F.sum(F.col("d") + F.col("c"))
        .over(W.orderBy(F.col("t").desc()).rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("n"),
    )
    return (
        ordered.groupBy(F.lit(1).alias("_g"))
        .applyInPandas(
            lambda pdf: _km_kernel(pdf),
            schema="t_hours long, n_at_risk long, n_events long,"
            " n_censored long, surv_ppm long",
        )
        .orderBy("t_hours")
    )


@query(
    "ts_kaplan_meier",
    oracle=_KM_ORACLE,
    tags=("timeseries", "survival", "exact-twin"),
)
def ts_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier re-engagement curve over inter-event gaps (whole
    hours): observed gaps are events, each user's final open gap is
    right-censored, and surv_ppm(t) is the survival product in exact
    recursive integer ppm — the probability a silence outlasts t."""
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    return kaplan_meier(survival_durations(ev))
