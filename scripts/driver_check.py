"""Replicates the driver's correctness pass: run every __spark_entry__
declared query at sf0.01 next to its DuckDB oracle and report
row-count + column + value agreement. Usage:

    python scripts/driver_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from impala_refresher_spark.session import get_spark  # noqa: E402
from impala_refresher_spark.sources.tables import TABLES  # noqa: E402

_NULL = "\x00<null>"


def _canon(v):
    if v is None:
        return _NULL
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("driver_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        try:
            df = queries[name](spark, sf_dir)
            cols = sorted(df.columns)
            rows = df.collect()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        if sorted(dcols) != cols:
            failures.append(name)
            print(f"FAIL  {name}: columns spark={cols} duckdb={sorted(dcols)}")
            continue
        if len(drows) != len(rows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(rows)} duckdb={len(drows)}")
            continue
        order = sorted(range(len(cols)), key=lambda i: df.columns.index(cols[i]))
        s_canon = sorted(tuple(_canon(r[c]) for c in cols) for r in (row.asDict() for row in rows))
        d_canon = sorted(
            tuple(_canon(dict(zip(dcols, r))[c]) for c in cols) for r in drows
        )
        if s_canon != d_canon:
            failures.append(name)
            sa = [r for r in s_canon if r not in set(d_canon)][:3]
            db = [r for r in d_canon if r not in set(s_canon)][:3]
            print(f"FAIL  {name}: values spark-only={sa} duckdb-only={db}")
        else:
            print(f"OK    {name}: {len(rows)} rows hash-match")

    print(f"\n{len(failures)} failures / {len(queries)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
