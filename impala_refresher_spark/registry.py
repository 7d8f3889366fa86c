"""Query registry: every declared operator pairs a Spark callable with
an ANSI-SQL oracle (DuckDB dialect) over the same parquet tables.

The driver harness (``__spark_entry__.py``) runs both at sf0.01 and
compares row-count + schema + order-insensitive value-hash. Ops whose
semantics are not SQL-expressible (LSH banding, streaming watermarks)
register with ``oracle=None`` and get a rows-only check.

Conventions that keep the differential honest:

- Alias every computed column identically on both sides (the compare
  sorts columns by name before hashing).
- Round floating aggregates (``F.round(x, 2)`` / ``ROUND(x, 2)``) so
  summation order can't flip the hash.
- Cast integer-family results so Spark and DuckDB types line up
  (DuckDB ``sum(BIGINT)`` is HUGEINT → ``CAST(... AS BIGINT)``;
  DuckDB ``year()`` is BIGINT → cast one side to match).
"""

from __future__ import annotations

from collections.abc import Callable
from textwrap import dedent

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is DuckDB SQL or None."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = dedent(oracle).strip()
        return fn

    return deco
