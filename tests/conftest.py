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
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_session(app_name="flume_source_spark_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
