"""Simulate the driver's correctness pass under a VANILLA SparkSession.

The r01 driver ran queries under its own plain ``SparkSession.builder
.getOrCreate()`` (none of our session.py confs), so anything that relies
on a session-build-time conf fails there even if our tests are green.
This script reproduces that environment: default confs, first N registry
entries, DuckDB oracle comparison at sf0.01.

Usage: python scripts/driver_sim.py [N] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

# Runnable from anywhere: `python scripts/driver_sim.py` puts scripts/
# (not the repo root) on sys.path, so add the root explicitly.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # arg 1: a count (first-N registry entries, the driver-window shape)
    # or a comma-separated name list for fast re-runs of known failures;
    # arg 2: fixture dir. `--vanilla` anywhere uses a fully-default
    # session (local[*], 200 shuffle partitions — the DRIVER's
    # accumulation-order regime) instead of the local[8]/8 sim.
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    spec = args[0] if args else "55"
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    if vanilla:
        spark = SparkSession.builder.getOrCreate()
    else:
        spark = (
            SparkSession.builder.master("local[8]")
            .appName("driver-sim")
            .config("spark.sql.shuffle.partitions", "8")
            .getOrCreate()
        )

    from impala_refresher_spark.queries import ORACLES, QUERIES

    sys.path.insert(0, "tests")
    from oracle_util import compare, duckdb_conn

    con = duckdb_conn(sf_dir)
    # Any non-numeric spec is a name list, so a single misspelled name
    # reports "unknown query names" instead of an int() traceback.
    if spec.isdigit():
        names = list(QUERIES)[: int(spec)]
    else:
        names = [s for s in spec.split(",") if s]
        unknown = [s for s in names if s not in QUERIES]
        if unknown:
            print("unknown query names:", unknown)
            sys.exit(2)
    ok, rows_only, failed = [], [], []
    for name in names:
        t0 = time.monotonic()
        try:
            df = QUERIES[name](spark, sf_dir)
            if name in ORACLES:
                compare(df, con, ORACLES[name])
                ok.append(name)
                tag = "ok"
            else:
                cnt = df.count()
                rows_only.append(name)
                tag = f"rows_only({cnt})"
        except Exception as e:
            failed.append(name)
            tag = f"FAIL: {type(e).__name__}: {e}"
            traceback.print_exc(limit=3)
        print(f"{name}: {tag} [{time.monotonic() - t0:.1f}s]", flush=True)

    print(f"\nchecked={len(names)} ok={len(ok)} rows_only={len(rows_only)} failed={len(failed)}")
    if failed:
        print("FAILED:", failed)
        sys.exit(1)

    # A clean FULL-registry vanilla sweep is the evidence gen_ledger's
    # --rebaseline requires (r08): record it, tied to the exact package
    # sources it exercised via the content hash.
    if vanilla and set(ok) >= set(ORACLES):
        import json

        from scripts.gen_ledger import _package_hash

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cert = {
            "sf_dir": sf_dir,
            "n_checked": len(names),
            "ok": sorted(ok),
            "rows_only": sorted(rows_only),
            "failed": [],
            "package_hash": _package_hash(),
        }
        json.dump(cert, open(os.path.join(root, "SWEEP_CERT.json"), "w"), indent=1)
        print(f"SWEEP_CERT.json written (package_hash={cert['package_hash']})")


if __name__ == "__main__":
    main()
