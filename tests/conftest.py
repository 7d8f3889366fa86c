from __future__ import annotations

import os

# Narrow the TEST session (r10): the suite's inputs are KB-sized
# createDataFrame fixtures and the sf0.001 smoke dir, where a
# local[32]/32-shuffle-partition session pays 32-wide task launches per
# action for rows of data — measured 21% slower than local[4] on the
# slow property-test subset with identical results (full suite: 32:24
# → 17:31). Set BEFORE the session module is imported (it reads the
# env at import time). This deliberately OVERRIDES an inherited
# SPARK_GRAFT_CPUS: that variable is the bench/driver contract for
# bench.py, not for the test harness, and an environment that exports
# it globally (the driver does, for its bench passes) would silently
# put the suite back on the 32-wide session that blew the r09 verify
# budget. SPARK_GRAFT_TEST_CPUS is the explicit knob for running the
# SUITE at another width.
os.environ["SPARK_GRAFT_CPUS"] = os.environ.get("SPARK_GRAFT_TEST_CPUS", "4")

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
