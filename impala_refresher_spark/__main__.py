"""CLI front-end (A8): the reference's flag surface re-expressed for
the Spark catalog.

Reference contract (``impala-refresher.go:148-181``):
``-timeout`` (seconds, default 60), ``-table`` + ``-nodes`` (required;
missing → usage + exit 1), ``-concurrency`` (0 = unlimited); exit 0
iff every target refreshed, else 1.

Spark has one centralized catalog, so "N nodes × 1 table" collapses to
"N tables × 1 catalog" (SURVEY.md §2A): ``--tables`` is the target
list. ``--sf-dir`` optionally registers the fixture parquet tables as
views first, so the CLI is runnable end-to-end against the test data.
"""

from __future__ import annotations

import argparse
import sys
from collections.abc import Sequence


class _Parser(argparse.ArgumentParser):
    """argparse exits 2 on bad args; the reference exits 1 — match it."""

    def error(self, message: str) -> None:  # type: ignore[override]
        self.print_usage(sys.stderr)
        print(f"error: {message}", file=sys.stderr)
        raise SystemExit(1)


def build_parser() -> argparse.ArgumentParser:
    p = _Parser(
        prog="python -m impala_refresher_spark",
        description="Concurrently refresh Spark catalog tables "
        "(per-target timeout, bounded concurrency window, exit 0 iff all refreshed).",
    )
    p.add_argument(
        "--tables",
        required=True,
        help="comma-separated list of tables to refresh (the reference's -nodes × -table targets)",
    )
    p.add_argument(
        "--timeout",
        type=float,
        default=60.0,
        help="per-target refresh timeout in seconds (default 60)",
    )
    p.add_argument(
        "--concurrency",
        type=int,
        default=0,
        help="max refreshes in flight at once (0: unlimited)",
    )
    p.add_argument(
        "--sf-dir",
        default=None,
        help="optional fixture dir: register <sf-dir>/<table>.parquet as views before refreshing",
    )
    return p


def main(argv: Sequence[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    tables = [t.strip() for t in args.tables.split(",") if t.strip()]
    if not tables:
        build_parser().print_usage(sys.stderr)
        print("error: --tables must name at least one table", file=sys.stderr)
        return 1

    from impala_refresher_spark.operators.refresh import all_refreshed, refresh_many
    from impala_refresher_spark.session import get_spark

    spark = get_spark("impala-refresher-cli")
    if args.sf_dir:
        from impala_refresher_spark.sources.tables import register_views

        for t in tables:  # best-effort per table: an unregistrable target
            try:  # must surface as a per-target refresh FAILURE, not a crash
                register_views(spark, args.sf_dir, (t,))
            except Exception as exc:
                print(f"warning: could not register {t}: {exc}", file=sys.stderr)

    results = refresh_many(
        spark, tables, timeout=args.timeout, concurrency=args.concurrency
    )
    for r in results:  # per-target report lines, as the reference prints per node
        status = "refreshed" if r.refreshed else f"FAILED ({r.error})"
        print(f"{r.target}: {status} in {r.duration_ms}ms")
    return 0 if all_refreshed(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
