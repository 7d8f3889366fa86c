"""Local mirror of the driver's DuckDB differential check.

Runs a declared Spark query and its DuckDB oracle SQL on the same
parquet fixtures and compares row count, column names, and values
(order-insensitive; floats to 6 FIXED decimal places).

Float canonicalization history: through r04 this used ``{v:.6g}`` —
6 *significant* digits — which is provably weaker than the driver's
value hash: the driver failed ``subsample_ci_revenue`` on a one-cent
difference at magnitude 2.5e5 (250562.07 vs 250562.08) that ``.6g``
canonicalizes identically ("250562"). Any absolute error below ~1 unit
on values ≥ 1e5 was invisible locally. The canon is now FIXED decimal
places (``{v:.6f}``), which resolves cents (and micro-units) at any
money magnitude, while still absorbing benign sub-1e-6 ulp noise
(e.g. 4e-12 OLS intercept drift). Queries whose outputs can't survive
this precision cross-engine must be made integer-exact, not excused.
"""

from __future__ import annotations

import math

import duckdb

from impala_refresher_spark.sources.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


_NULL = "\x00<null>"


def _canon(v):
    if v is None:
        return _NULL
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        # Fixed decimal places (driver-strength): resolves absolute
        # differences ≥ 1e-6 at ANY magnitude, unlike significant-digit
        # formatting which is blind to cents on ≥1e5-scale money values.
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str) -> None:
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duckdb={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    a = _canon_rows(spark_cols, spark_rows)
    b = _canon_rows(duck_cols, duck_rows)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:5]
        diff_b = [r for r in b if r not in set(a)][:5]
        raise AssertionError(
            f"value mismatch: spark-only={diff_a} duckdb-only={diff_b}"
        )
