"""Streaming heavy hitters with bounded state: sharded Misra-Gries.

``mg_heavy_hitters_stream`` — the streaming complement to the batch
``agg_heavy_hitters``: track the frequent keys of an unbounded stream
with O(k) state per shard instead of O(distinct keys). A plain
``groupBy(key).count()`` in update mode IS the exact answer but its
state grows with every key ever seen; Misra-Gries (the classic
frequent-items summary) keeps at most K counters per shard and
guarantees:

  - SUPERSET: every key with true count > total/(K+1) within its
    shard survives in the summary (no false negatives for true heavy
    hitters);
  - UNDERCOUNT ONLY: each surviving counter is a LOWER bound on the
    true count, short by at most total/(K+1);
  - MERGEABILITY: two MG summaries merge by counter addition + the
    same decrement step, so shard summaries can roll up downstream.

Sharding: keys hash into N_SHARDS groups (``pmod(xxhash64(key), N)``),
each an ``applyInPandasWithState`` group holding one MG summary —
state is K rows of (key, count) serialized as parallel arrays. At
100 TB the shard count scales with executors while per-shard state
stays K entries; the per-batch work is one pass over the batch's
rows. Rows within a micro-batch are processed in (ts, event_id)
order, making the summary DETERMINISTIC for a given batch
partitioning — pinned by the python-reference test (MG output is
inherently processing-order-dependent, so this operator is rows-only
by construction: its correctness evidence is the guarantee test +
reference-implementation pin, the documented policy for sequential
state machines like the BPE trainer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flume_source_spark.registry import query

MG_K = 8  # counters per shard
N_SHARDS = 4


def mg_update(keys: list, counts: list, item, k: int = MG_K):
    """One Misra-Gries step (pure python, arbitrary items): increment
    if tracked, insert if room, else decrement ALL counters (evicting
    zeros). Returns the same lists, mutated."""
    if item in keys:
        counts[keys.index(item)] += 1
    elif len(keys) < k:
        keys.append(item)
        counts.append(1)
    else:
        for i in range(len(counts)):
            counts[i] -= 1
        live = [(ky, c) for ky, c in zip(keys, counts) if c > 0]
        keys[:] = [ky for ky, _ in live]
        counts[:] = [c for _, c in live]
    return keys, counts


def mg_reference(items, k: int = MG_K):
    """Reference MG over an ordered item list — the third
    implementation the streaming kernel is pinned against."""
    keys: list = []
    counts: list = []
    for it in items:
        mg_update(keys, counts, it, k)
    return dict(zip(keys, counts))


def mg_merge(a: dict, b: dict, k: int = MG_K) -> dict:
    """Merge two MG summaries (Agarwal et al., "Mergeable Summaries",
    PODS'12): add counters keywise; if more than k keys survive,
    subtract the (k+1)-th largest count from every counter and drop
    the non-positive ones. The result is a valid MG summary of the
    concatenated input: ≤ k counters, undercount-only, per-key error
    ≤ (n_a + n_b)/(k+1), and every true heavy hitter above that
    threshold survives — which is what makes the SHARDED operator
    composable: shard summaries roll up to a global summary without
    ever revisiting the stream (property-pinned in tests)."""
    m = dict(a)
    for key, c in b.items():
        m[key] = m.get(key, 0) + c
    if len(m) > k:
        kth = sorted(m.values(), reverse=True)[k]  # (k+1)-th largest
        m = {key: c - kth for key, c in m.items() if c - kth > 0}
    return m


def mg_rollup(summaries, k: int = MG_K) -> dict:
    """Fold shard summaries into one global MG summary. Shard count
    scales with executors (bounded — N_SHARDS here), so this is a
    bounded driver-side fold over ≤ shards·k counters, the standard
    final step of a sharded frequent-items pipeline. Per-key error of
    the result is ≤ Σ n_shard/(k+1) = n_total/(k+1) — the same bound
    an unsharded MG over the whole stream would carry."""
    out: dict = {}
    for s in summaries:
        out = mg_merge(out, s, k)
    return out


def mg_heavy_hitters_stream(events: DataFrame, k: int = MG_K, n_shards: int = N_SHARDS) -> DataFrame:
    """Sharded streaming Misra-Gries over ``user_id``: each shard
    keeps ≤ k (key, lower_bound) counters across micro-batches and
    emits its summary every batch (update mode). Batch rows are
    consumed in (ts, event_id) order for determinism."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        if state.exists:
            keys, counts, total = state.get
            keys, counts = list(keys), list(counts)
        else:
            keys, counts, total = [], [], 0
        # Arrow delivers the group's batch as MULTIPLE chunks (split at
        # maxRecordsPerBatch, chunk order following nondeterministic
        # post-shuffle row order) — sorting per chunk would make the
        # summary order-dependent across runs; materialize the whole
        # batch and sort ONCE so the documented (ts, event_id) order
        # is batch-global. Batch size per shard is bounded by the
        # trigger, so the concat is the already-admitted batch, not
        # unbounded state.
        chunks = list(pdfs)
        batch = pd.concat(chunks) if chunks else pd.DataFrame()
        if len(batch):
            batch = batch.sort_values(["ts", "event_id"])
            for item in batch["user_id"].astype("int64"):
                mg_update(keys, counts, int(item), k)
                total += 1
        state.update((keys, counts, total))
        yield pd.DataFrame(
            {
                "shard": [int(key[0])] * len(keys),
                "user_id": keys,
                "lower_bound": counts,
                "shard_total": [total] * len(keys),
            }
        )

    sharded = events.withColumn(
        "shard", F.pmod(F.xxhash64("user_id"), F.lit(n_shards)).cast("long")
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType="shard long, user_id long, lower_bound long, shard_total long",
        stateStructType="keys array<long>, counts array<long>, total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Batch EXACT TWINS of the sharded-MG pipeline (round 9). The streaming
# operator above is rows-only by construction (update-mode output across
# micro-batches); these twins pin the identical per-shard fold and the
# PODS'12 rollup as hash-green registered queries: the SAME mg_reference /
# mg_rollup python kernels run distributed (one applyInPandas group per
# shard, a bounded ≤ shards·k driver fold for the rollup) against a DuckDB
# recursive-CTE oracle that re-derives every MG step independently (the
# ts_holt_exact sequential-kernel precedent). The twin shard key is the
# PORTABLE md5 hash (house cross-engine idiom) where the streaming path
# uses xxhash64 — documented divergence: the stream keeps the faster
# Spark-native hash, the twin needs an oracle both engines can compute.

def _mg_step_sql(pairs: str, item: str, k: int) -> str:
    """One Misra-Gries step over a STRUCT(k,c)[] state list in DuckDB
    SQL — the list-lambda mirror of :func:`mg_update`."""
    return f"""CASE
        WHEN len(list_filter({pairs}, p -> p.k = {item})) > 0
        THEN list_transform({pairs}, p -> CASE WHEN p.k = {item}
             THEN struct_pack(k := p.k, c := p.c + 1) ELSE p END)
        WHEN len({pairs}) < {k}
        THEN list_append({pairs}, struct_pack(k := {item}, c := CAST(1 AS BIGINT)))
        ELSE list_filter(list_transform({pairs},
                 p -> struct_pack(k := p.k, c := p.c - 1)), p -> p.c > 0)
    END"""


def _mg_merge_sql(a: str, b: str, k: int) -> str:
    """The Agarwal et al. PODS'12 merge over two STRUCT(k,c)[] lists —
    keywise counter sum, then subtract the (k+1)-th largest count and
    drop non-positives when more than k keys survive (the list-lambda
    mirror of :func:`mg_merge`; ``combined`` is inlined thrice because
    the fold runs inside a recursive CTE where no LATERAL alias is
    available)."""
    combined = f"""list_transform(
        list_distinct(list_concat(
            list_transform({a}, p -> p.k), list_transform({b}, p -> p.k))),
        kk -> struct_pack(k := kk,
            c := CAST(coalesce((list_filter({a}, p -> p.k = kk))[1].c, 0)
               + coalesce((list_filter({b}, p -> p.k = kk))[1].c, 0) AS BIGINT)))"""
    kth = f"list_sort(list_transform({combined}, p -> p.c), 'DESC')[{k + 1}]"
    return f"""CASE WHEN len({combined}) > {k}
        THEN list_filter(list_transform({combined},
                 p -> struct_pack(k := p.k, c := p.c - {kth})), p -> p.c > 0)
        ELSE {combined}
    END"""


# md5-derived shard id, identical syntax on both engines
_MG_SHARD_DUCK = (
    "(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)"
    f" % {N_SHARDS})"
)

_MG_ORACLE_PREFIX = f"""
    WITH RECURSIVE ev AS MATERIALIZED (
        SELECT shard, item,
               row_number() OVER (PARTITION BY shard ORDER BY ts, event_id)
                   AS t
        FROM (SELECT {_MG_SHARD_DUCK} AS shard,
                     CAST(user_id AS BIGINT) AS item, ts, event_id
              FROM events)),
    tot AS (SELECT shard, CAST(count(*) AS BIGINT) AS shard_total
            FROM ev GROUP BY shard),
    rec AS (
        SELECT shard, CAST(0 AS BIGINT) AS t,
               CAST([] AS STRUCT(k BIGINT, c BIGINT)[]) AS pairs
        FROM (SELECT DISTINCT shard FROM ev)
        UNION ALL
        SELECT r.shard, e.t, {_mg_step_sql("r.pairs", "e.item", MG_K)} AS pairs
        FROM rec r JOIN ev e ON e.shard = r.shard AND e.t = r.t + 1),
    fin AS (
        SELECT shard, pairs
        FROM (SELECT shard, pairs,
                     row_number() OVER (PARTITION BY shard ORDER BY t DESC)
                         AS rn
              FROM rec)
        WHERE rn = 1)
"""

_MG_SHARDS_ORACLE = (
    _MG_ORACLE_PREFIX
    + """,
    ex AS (SELECT shard, unnest(pairs) AS p FROM fin)
    SELECT e.shard, (e.p).k AS user_id, (e.p).c AS lower_bound,
           t.shard_total
    FROM ex e JOIN tot t ON e.shard = t.shard
    ORDER BY e.shard, user_id
"""
)

_MG_ROLLUP_ORACLE = (
    _MG_ORACLE_PREFIX
    + f""",
    shards AS (SELECT shard, pairs,
                      row_number() OVER (ORDER BY shard) AS si
               FROM fin),
    roll AS (
        SELECT CAST(0 AS BIGINT) AS si,
               CAST([] AS STRUCT(k BIGINT, c BIGINT)[]) AS acc
        UNION ALL
        SELECT s.si, {_mg_merge_sql("r.acc", "s.pairs", MG_K)} AS acc
        FROM roll r JOIN shards s ON s.si = r.si + 1),
    gfin AS (SELECT acc FROM roll ORDER BY si DESC LIMIT 1),
    gex AS (SELECT unnest(acc) AS p FROM gfin),
    gtot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM ev)
    SELECT (g.p).k AS user_id, (g.p).c AS lower_bound, t.n_total
    FROM gex g, gtot t
    ORDER BY user_id
"""
)


def _mg_twin_sharded(spark, sf_dir: str) -> DataFrame:
    """Per-shard MG summaries as a BATCH frame: md5-sharded events,
    one applyInPandas group per shard running the exact
    :func:`mg_reference` fold over the (ts, event_id)-ordered items.
    Work: one shuffle on the shard key; per-shard state is K counters
    regardless of distinct keys — the same bound the streaming
    operator carries."""
    import pandas as pd

    from flume_source_spark.tables import load_tables

    ev = load_tables(spark, sf_dir)["events"].select("event_id", "ts", "user_id")
    shard = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % N_SHARDS
    )
    k = MG_K

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        summ = mg_reference([int(u) for u in pdf["user_id"]], k)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])] * len(summ),
                "user_id": list(summ.keys()),
                "lower_bound": list(summ.values()),
                "shard_total": [len(pdf)] * len(summ),
            }
        )

    return (
        ev.withColumn("shard", shard)
        .groupBy("shard")
        .applyInPandas(
            kernel,
            schema="shard long, user_id long, lower_bound long, shard_total long",
        )
    )


@query(
    "mg_shard_summaries_exact",
    oracle=_MG_SHARDS_ORACLE,
    tags=("streaming", "sketch", "exact-twin"),
)
def mg_shard_summaries_exact(spark, sf_dir: str) -> DataFrame:
    """Sharded Misra-Gries summaries, batch exact twin (K=8 counters,
    4 md5 shards): each shard's (key, lower_bound) counter set after
    folding its (ts, event_id)-ordered items — hash-pinned against a
    DuckDB recursive-CTE replay of every MG step. Pins the streaming
    operator's per-shard fold semantics with driver-hashable
    evidence (the MG stream itself is rows-only by construction)."""
    return _mg_twin_sharded(spark, sf_dir).orderBy("shard", "user_id")


@query(
    "mg_rollup_exact",
    oracle=_MG_ROLLUP_ORACLE,
    tags=("streaming", "sketch", "exact-twin"),
)
def mg_rollup_exact(spark, sf_dir: str) -> DataFrame:
    """Global rollup of the shard summaries via the PODS'12 mergeable
    fold (shard-ascending order): ≤ shards·k counters reach the
    driver — a bounded collect by topology, the standard final step
    of any sharded frequent-items pipeline — and the merged summary
    carries the same n_total/(K+1) error bound an unsharded MG would.
    Hash-pinned against the DuckDB recursive merge fold."""
    rows = _mg_twin_sharded(spark, sf_dir).collect()
    by_shard: dict[int, dict[int, int]] = {}
    n_total = 0
    seen = set()
    for r in rows:
        by_shard.setdefault(r.shard, {})[r.user_id] = r.lower_bound
        if r.shard not in seen:
            seen.add(r.shard)
            n_total += r.shard_total
    merged = mg_rollup([by_shard[s] for s in sorted(by_shard)], MG_K)
    out = [(int(u), int(c), int(n_total)) for u, c in merged.items()]
    return spark.createDataFrame(
        sorted(out), "user_id long, lower_bound long, n_total long"
    )
