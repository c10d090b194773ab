"""Every registered query vs its DuckDB oracle — the local mirror of
the driver's t2 correctness gate (run at sf0.001 by default for speed;
set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the t2 tier)."""

from __future__ import annotations

import pytest

from flume_source_spark.oracle import run_spec
from flume_source_spark.registry import load_all

SPECS = sorted(load_all().values(), key=lambda s: s.name)


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_matches_oracle(spark, duck, sf_dir, spec):
    res = run_spec(spark, duck, spec, sf_dir)
    assert res.ok, f"{spec.name}: {res.detail}"
    assert res.spark_rows >= 0
