"""Regenerate the driver-verification ledger section of COVERAGE.md.

Reads every CORRECTNESS_r0N.json in the repo root, computes each
registered query's last driver-green round, and rewrites the
"## Driver verification ledger" section (everything from that heading
to the end of COVERAGE.md). Run after each round's CORRECTNESS file
lands so the steady-state policy (SURVEY §7) stays auditable:

    python scripts/gen_ledger.py

Status legend:
- "green, unchanged"      — has a green driver row; code untouched since.
- "rNN window (...)"      — scheduled in the CURRENT round's 50-slot
                            registry window (first check or re-verify).
- "BACKLOG"               — oracled but never hash-checked and NOT in
                            the current window (must be empty).
- "rows-only by design"   — no SQL oracle on purpose; pytest contract.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HEADING = "## Driver verification ledger (last green round per query)"


def main() -> None:
    from impala_refresher_spark.queries import ORACLES, QUERIES

    corr_files = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    last_green: dict[str, int] = {}
    for path in corr_files:
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for name, row in json.load(open(path)).items():
            if row.get("hash_match"):
                last_green[name] = max(last_green.get(name, 0), rnd)
    cur = max(
        (int(re.search(r"_r(\d+)\.json$", p).group(1)) for p in corr_files),
        default=0,
    ) + 1

    names = list(QUERIES)
    window = set(names[:50])
    lines = [
        HEADING,
        "",
        f"Generated from {len(corr_files)} CORRECTNESS files by "
        "`scripts/gen_ledger.py`; regenerate after each round. "
        f"`r{cur:02d}` rows are scheduled in the current round's driver "
        "window (registry slots 1-50). Policy (SURVEY §7): any code or "
        "oracle change to a driver-green query re-queues it for the next "
        "window; the BACKLOG status must never appear.",
        "",
        "| Query | Last driver-green | Status |",
        "|---|---|---|",
    ]
    backlog = []
    for n in names:
        if n not in ORACLES:
            lg, status = "—", "rows-only by design (pytest accuracy contract)"
        elif n in last_green:
            lg = f"r{last_green[n]:02d}"
            status = (
                f"r{cur:02d} window (re-verify)"
                if n in window
                else "green, unchanged"
            )
        else:
            lg = "never"
            if n in window:
                status = f"r{cur:02d} window (first hash check)"
            else:
                status = "BACKLOG"
                backlog.append(n)
        lines.append(f"| `{n}` | {lg} | {status} |")

    cov_path = os.path.join(ROOT, "COVERAGE.md")
    text = open(cov_path).read()
    idx = text.find(HEADING)
    base = text[:idx].rstrip() + "\n\n" if idx >= 0 else text.rstrip() + "\n\n"
    open(cov_path, "w").write(base + "\n".join(lines) + "\n")
    print(f"ledger: {len(names)} queries, {len(last_green)} ever-green, "
          f"window={len(window & set(names))}, backlog={len(backlog)}")
    if backlog:
        print("BACKLOG (oracled, never checked, outside window):", backlog)
        sys.exit(1)


if __name__ == "__main__":
    main()
