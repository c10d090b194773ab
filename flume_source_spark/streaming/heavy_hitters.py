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
