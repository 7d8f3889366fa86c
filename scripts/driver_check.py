"""Replicates the driver's correctness pass through the __spark_entry__
contract surface: run every declared query at sf0.01 next to its DuckDB
oracle and report row-count + column + value agreement. Usage:

    python scripts/driver_check.py [sf_dir] [name ...]

Comparison is delegated to tests/oracle_util.compare — the ONE local
canon (pandas-path marshaling + shape gates). This script previously
carried its own weaker copy (.6g floats, fetchall), which is exactly
the comparator-drift class that produced the r04/r05 local-vs-driver
splits; scripts/driver_sim.py is the richer harness (vanilla-session
mode, first-N windows) and also uses oracle_util. This one stays as
the __spark_entry__-surface spelling of the same check.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import __spark_entry__ as entry_mod  # noqa: E402
from impala_refresher_spark.session import get_spark  # noqa: E402
from oracle_util import compare, duckdb_conn  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("driver_check")
    con = duckdb_conn(sf_dir)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        try:
            df = queries[name](spark, sf_dir)
            if name not in oracles:
                print(f"rows  {name}: {df.count()} rows (no oracle)")
                continue
            compare(df, con, oracles[name])
            print(f"OK    {name}: hash-match")
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:300]}")

    print(f"\n{len(failures)} failures / {len(queries)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
