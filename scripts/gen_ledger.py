"""Regenerate the driver-verification ledger section of COVERAGE.md.

Reads every CORRECTNESS_r0N.json in the repo root, computes each
registered query's last driver-green round, and rewrites the
"## Driver verification ledger" section (everything from that heading
to the end of COVERAGE.md). Run after each round's CORRECTNESS file
lands so the steady-state policy (SURVEY §7) stays auditable:

    python scripts/gen_ledger.py

Status legend:
- "green, unchanged"      — has a green driver row; code untouched since
                            (ENFORCED: source+oracle content hash matches
                            the one recorded at that green — see below).
- "rNN window (...)"      — scheduled in the CURRENT round's 50-slot
                            registry window (first check or re-verify).
- "STALE GREEN"           — has a green row but the query's source or
                            oracle changed since, and it is NOT in the
                            current window (must be empty — a forgotten
                            re-queue; exits nonzero).
- "BACKLOG"               — oracled but never hash-checked and NOT in
                            the current window (must be empty).
- "rows-only by design"   — no SQL oracle on purpose; pytest contract.

Hash enforcement (r05 ADVICE): the ledger used to TRUST that green
evidence referred to the current code — the SURVEY §7 re-queue policy
was manual. Now LEDGER_HASHES.json records, per query, a sha256 of
``inspect.getsource(fn)`` + the oracle SQL as of the last time that
query's green round advanced; on regeneration, a query whose current
hash differs from the recorded one is downgraded out of
"green, unchanged" and must sit in the current window.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HEADING = "## Driver verification ledger (last green round per query)"
HASHES_PATH = os.path.join(ROOT, "LEDGER_HASHES.json")


def _source_hash(fn, oracle: str | None) -> str:
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = repr(fn)
    h = hashlib.sha256()
    h.update(src.encode())
    h.update((oracle or "").encode())
    return h.hexdigest()[:16]


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

    stored: dict[str, dict] = {}
    if os.path.exists(HASHES_PATH):
        stored = json.load(open(HASHES_PATH))
    current = {
        n: _source_hash(QUERIES[n], ORACLES.get(n)) for n in names
    }
    # Advance the recorded hash whenever a query's green round advanced
    # (that green certified the code as it exists NOW — gen_ledger runs
    # right after each round's CORRECTNESS file lands, before new edits).
    for n in names:
        lg = last_green.get(n)
        if lg is None:
            continue
        rec = stored.get(n)
        if rec is None or lg > rec.get("green_round", 0):
            stored[n] = {"green_round": lg, "hash": current[n]}
    json.dump(
        {n: stored[n] for n in sorted(stored)}, open(HASHES_PATH, "w"), indent=1
    )

    lines = [
        HEADING,
        "",
        f"Generated from {len(corr_files)} CORRECTNESS files by "
        "`scripts/gen_ledger.py`; regenerate after each round. "
        f"`r{cur:02d}` rows are scheduled in the current round's driver "
        "window (registry slots 1-50). Policy (SURVEY §7): any code or "
        "oracle change to a driver-green query re-queues it for the next "
        "window — now ENFORCED by source hashes (LEDGER_HASHES.json): "
        "\"green, unchanged\" additionally asserts the query's source + "
        "oracle hash matches the one recorded at its last green. The "
        "BACKLOG and STALE GREEN statuses must never appear.",
        "",
        "| Query | Last driver-green | Status |",
        "|---|---|---|",
    ]
    backlog, stale = [], []
    for n in names:
        if n not in ORACLES:
            lg, status = "—", "rows-only by design (pytest accuracy contract)"
        elif n in last_green:
            lg = f"r{last_green[n]:02d}"
            changed = stored.get(n, {}).get("hash") != current[n]
            if n in window:
                status = f"r{cur:02d} window (re-verify)"
            elif changed:
                status = "STALE GREEN (source changed since green; re-queue!)"
                stale.append(n)
            else:
                status = "green, unchanged"
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
          f"window={len(window & set(names))}, backlog={len(backlog)}, "
          f"stale={len(stale)}")
    if backlog or stale:
        if backlog:
            print("BACKLOG (oracled, never checked, outside window):", backlog)
        if stale:
            print("STALE GREEN (source changed, outside window):", stale)
        sys.exit(1)


if __name__ == "__main__":
    main()
