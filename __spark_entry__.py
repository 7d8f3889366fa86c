"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship star query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full declared-operator
registry (impala_refresher_spark.queries) for the sf0.01 DuckDB
differential check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from impala_refresher_spark.operators.relational import revenue_by_region_year
from impala_refresher_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return revenue_by_region_year(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each SQL-expressible query."""
    return dict(ORACLES)
