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
    """Queries without an oracle still must execute and be stable."""
    for name, fn in QUERIES.items():
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0, name
