from __future__ import annotations

import os

import pytest

from flume_source_spark.oracle import duck_connection
from flume_source_spark.session import get_session

# t1 smoke / unit tests run at sf0.001 for speed; the oracle suite can
# be pointed at sf0.01 (the driver's t2 tier) via SPARK_GRAFT_TEST_SF_DIR.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_T2 = os.environ.get("SPARK_GRAFT_T2_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    # The TEST session is pinned to local[8] regardless of
    # $SPARK_GRAFT_CPUS (round-13, VERDICT r12 item 1): the suite is
    # per-job-latency-bound at sf0.001, not throughput-bound, and
    # long 32-core sessions on this sandbox hit multi-second
    # scheduling/Python-worker stalls that an 8-core session does not
    # (the r12 driver pytest window expired at ~63% while the same
    # suite passes locally at 8 cores — diagnosis in
    # OPTIMIZATION_r13.md). shuffle_partitions was already pinned to
    # 8; this makes the master consistent with it. The bench keeps
    # honoring $SPARK_GRAFT_CPUS — only tests are pinned.
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    # SPARK_GRAFT_TEST_EXTRA_CONF: JSON dict of session confs layered
    # on the test session only — the config-experiment hook used to
    # measure suite-runtime knobs (round-13); empty by default.
    import json

    extra = json.loads(os.environ.get("SPARK_GRAFT_TEST_EXTRA_CONF", "{}"))
    spark = get_session(
        app_name="flume_source_spark_tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf=extra,
    )
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
