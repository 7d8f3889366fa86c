"""Dump .explain("formatted") for named queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python scripts/dump_plans.py q1,q2 before|after [sf_dir] [tag]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    tag = sys.argv[4] if len(sys.argv) > 4 else "r09"

    from impala_refresher_spark.queries import QUERIES
    from impala_refresher_spark.session import get_spark

    spark = get_spark("dump-plans")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        import contextlib
        import io

        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} chars -> {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
