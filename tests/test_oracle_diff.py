"""Differential test: every declared query with a SQL oracle must
hash-match DuckDB on the sf0.001 fixtures (the driver runs the same
check at sf0.01 — this is the fast local gate)."""

from __future__ import annotations

import pytest

from impala_refresher_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle_util import compare, duckdb_conn


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, con, name):
    df = QUERIES[name](spark, SF_SMOKE)
    compare(df, con, ORACLES[name])


def test_every_query_runs(spark):
    """Queries without an oracle still must execute and be stable.

    Restricted to the non-oracled registry slice: every oracled query
    is already EXECUTED (collected and hash-compared) by its own
    test_query_matches_oracle[name] parametrization above, so looping
    over all 248 here re-ran 246 of them a second time for no extra
    assertion — ~2 min of the suite's former 32-min wall (r09
    VERIFY tests_ok=false was a budget timeout, not a failure)."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0, name
