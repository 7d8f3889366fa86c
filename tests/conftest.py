from __future__ import annotations

import os

# Narrow the TEST session (r10): the suite's inputs are KB-sized
# createDataFrame fixtures and the sf0.001 smoke dir, where a
# local[32]/32-shuffle-partition session pays 32-wide task launches per
# action for rows of data — measured 21% slower than local[4] on the
# slow property-test subset with identical results. Set BEFORE the
# session module is imported (it reads the env at import time).
# setdefault only: an explicit SPARK_GRAFT_CPUS from the caller wins,
# and bench/driver runs (which set their own CPUS) are unaffected.
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

import pytest

from impala_refresher_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
