"""Model tests for text wave 3 (dup-n-gram fraction, URL parse) and
the shard manifest. Oracle equivalence is in test_oracle.py; these pin
semantic invariants the oracle can't express."""

from __future__ import annotations


from flume_source_spark.pipeline.dataset import N_SHARDS, ds_shard_manifest
from flume_source_spark.pipeline.dedup import dedup_ngram_jaccard
from flume_source_spark.pipeline.text3 import text_dup_ngram_fraction
from flume_source_spark.tables import load_tables
from tests.conftest import SF_DIR


def test_dup_fraction_bounds_and_exact_dups_score_one(spark):
    frac = text_dup_ngram_fraction(spark, SF_DIR)
    rows = frac.collect()
    assert all(0.0 <= r.dup_fraction <= 1.0 for r in rows)
    assert all((r.dup_fraction > 0.5) == r.is_flagged for r in rows)
    # if docs i,j have Jaccard J, then |S_i ∩ S_j| / |S_i| ≥ J, so each
    # member's corpus-wide dup fraction is at least its best pair's J
    pairs = dedup_ngram_jaccard(spark, SF_DIR).collect()
    assert pairs, "fixture should contain planted near-dups"
    best: dict[int, float] = {}
    for p in pairs:
        best[p.i] = max(best.get(p.i, 0.0), p.jaccard)
        best[p.j] = max(best.get(p.j, 0.0), p.jaccard)
    by_id = {r.doc_id: r for r in rows}
    for did, j in best.items():
        # both sides round to 4 dp, allow one ulp of that grid
        assert by_id[did].dup_fraction >= j - 1e-4


def test_shard_manifest_partitions_the_corpus(spark):
    m = ds_shard_manifest(spark, SF_DIR).collect()
    total = load_tables(spark, SF_DIR)["documents"].count()
    assert sum(r.n_docs for r in m) == total
    assert {r.shard_id for r in m} <= set(range(N_SHARDS))
    # identity-hash sharding keeps shards balanced (binomial): no
    # shard more than 3x the mean on the fixture
    mean = total / len(m)
    assert max(r.n_docs for r in m) < 3 * mean
