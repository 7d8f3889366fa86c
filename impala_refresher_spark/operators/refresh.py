"""Reference-faithful surface: catalog refresh orchestration (R1-R3).

The reference (``/root/reference/impala-refresher.go``) fans out
``impala-shell -i <host> -q "refresh <table>"`` to N Impala daemons
concurrently, with a per-target timeout, an optional bounded
concurrency window, per-target success/duration reporting, and
overall success = AND of all targets (``impala-refresher.go:46-88,
108-135, 148-181``).

Spark has one centralized catalog per session, so the faithful
re-expression collapses "N nodes x 1 table" into "1 catalog call" and
generalizes to "N tables x 1 catalog": concurrent multi-table refresh
with the same timeout / concurrency-window / fail-any semantics.

Deliberate divergence (SURVEY.md §2A quirks): the reference leaks a
goroutine on timeout (its inner send on an unbuffered channel blocks
forever after the timeout branch wins, ``impala-refresher.go:62`` vs
``:81-86``); here timed-out futures are cancelled/abandoned safely —
a ThreadPoolExecutor worker never blocks on result delivery.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from concurrent.futures import ThreadPoolExecutor, TimeoutError as FutureTimeout
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from impala_refresher_spark.registry import query

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("target", T.StringType(), False),
        T.StructField("refreshed", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("duration_ms", T.LongType(), False),
    ]
)


@dataclass
class RefreshResult:
    """Per-target outcome — the ImpalaNode struct of the reference
    (``impala-refresher.go:28-40``) as an immutable record."""

    target: str
    refreshed: bool
    error: str | None
    duration_ms: int


def refresh_table(spark: SparkSession, name: str) -> RefreshResult:
    """R1: refresh one table's cached metadata + data (A1 semantics,
    ``impala-refresher.go:46-88``). Error text mirrors the reference's
    normalized message (``impala-refresher.go:59-61``)."""
    t0 = time.monotonic()
    try:
        spark.catalog.refreshTable(name)
        return RefreshResult(name, True, None, int((time.monotonic() - t0) * 1000))
    except Exception as exc:  # any failure -> normalized error, never raises
        return RefreshResult(
            name,
            False,
            f"{name}'s catalog did not refresh: {exc}",
            int((time.monotonic() - t0) * 1000),
        )


def refresh_many(
    spark: SparkSession,
    tables: Sequence[str],
    *,
    timeout: float = 60.0,
    concurrency: int = 0,
    refresh_fn: Callable[[SparkSession, str], RefreshResult] | None = None,
) -> list[RefreshResult]:
    """R2: concurrent multi-target refresh with bounded window.

    Faithful semantics (``impala-refresher.go:108-135, 148-181``):

    - ``concurrency=0`` means unlimited — all targets in flight at
      once (flag default, ``impala-refresher.go:153``).
    - ``timeout`` is per-target, not global (``impala-refresher.go:81``).
    - A timed-out or failed target is reported, never raised; overall
      success is the AND over targets (``impala-refresher.go:97``).

    ``refresh_fn`` is an injection point for tests (slow/failing
    targets) — defaults to the real catalog call.

    Timeout fidelity (two upgrades over the round-1 shape):

    - The clock starts at each target's ACTUAL start (recorded by the
      worker), not at reap time — a target can never be flagged before
      it has had ``timeout`` seconds of its own, and a still-queued
      target (bounded window) is never reported timed out unrun.
    - A timed-out target is really CANCELLED: each worker runs inside
      its own Spark job group (thread-local in pinned-thread mode) and
      the reaper calls ``cancelJobGroup``, interrupting any running
      Spark jobs — matching the reference's process kill
      (``impala-refresher.go:81-86``) without its goroutine leak.
    """
    fn = refresh_fn or refresh_table
    sc = spark.sparkContext
    max_workers = concurrency if concurrency > 0 else max(len(tables), 1)
    starts: dict[str, float] = {}
    groups = {t: f"refresh-{i}-{t}" for i, t in enumerate(tables)}

    def run_target(target: str) -> RefreshResult:
        starts[target] = time.monotonic()
        try:
            sc.setJobGroup(groups[target], f"refresh {target}", interruptOnCancel=True)
        except Exception:
            pass  # job-group bookkeeping must never fail the refresh
        try:
            return fn(spark, target)
        finally:
            try:
                sc.setJobGroup("", "")
            except Exception:
                pass

    results: list[RefreshResult] = []
    pool = ThreadPoolExecutor(max_workers=max_workers)
    try:
        futures = {pool.submit(run_target, t): t for t in tables}
        for fut, target in futures.items():
            while True:
                started_at = starts.get(target)
                if started_at is None:
                    # queued behind the concurrency window: its clock
                    # has not started — poll until a worker picks it up
                    try:
                        results.append(fut.result(timeout=0.05))
                        break
                    except FutureTimeout:
                        continue
                remaining = timeout - (time.monotonic() - started_at)
                if remaining <= 0:
                    fut.cancel()
                    try:  # stop the target's running Spark jobs for real
                        sc.cancelJobGroup(groups[target])
                    except Exception:
                        pass
                    results.append(
                        RefreshResult(
                            target,
                            False,
                            f"{target}'s catalog did not refresh (timeout after {timeout}s)",
                            int(timeout * 1000),
                        )
                    )
                    break
                try:
                    results.append(fut.result(timeout=remaining))
                    break
                except FutureTimeout:
                    continue  # re-check: another target may have started meanwhile
                except Exception as exc:
                    results.append(
                        RefreshResult(
                            target, False, f"{target}'s catalog did not refresh: {exc}", 0
                        )
                    )
                    break
    finally:
        # Do NOT wait for abandoned (timed-out) workers — the reference
        # leaks a blocked goroutine here; we just let the worker finish
        # in the background and reap the thread at process exit.
        pool.shutdown(wait=False, cancel_futures=True)
    return results


def all_refreshed(results: Sequence[RefreshResult]) -> bool:
    """Overall status: AND over targets (``impala-refresher.go:97,
    176-180``). Maps to the reference's process exit code."""
    return all(r.refreshed for r in results)


def results_df(spark: SparkSession, results: Sequence[RefreshResult]) -> DataFrame:
    """Status result set — one row per target, the reference's per-node
    report lines (``impala-refresher.go:96-101``) as a DataFrame."""
    rows = [(r.target, r.refreshed, r.error, r.duration_ms) for r in results]
    return spark.createDataFrame(rows, RESULT_SCHEMA)


def recover_partitions(spark: SparkSession, name: str) -> int:
    """R3: re-discover partition directories (the README's stated
    intent, ``/root/reference/README.md:10-11`` — "full retrieve of
    all the partitions on a given table"). Returns partition count."""
    spark.catalog.recoverPartitions(name)
    return spark.sql(f"SHOW PARTITIONS {name}").count()


# ---------------------------------------------------------------------------
# Declared queries — deterministic projections of the above, so the
# refresh surface is oracle-checked too (duration_ms is dropped: it is
# the one nondeterministic column).
# ---------------------------------------------------------------------------

_FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _register_fixture_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = _FIXTURE_TABLES
) -> None:
    from impala_refresher_spark.sources.tables import load_table

    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@query(
    "refresh_table_status",
    """
    SELECT 'lineitem' AS target, TRUE AS refreshed, CAST(NULL AS VARCHAR) AS error
    """,
)
def refresh_table_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 as a declared query: refresh the lineitem view, report status."""
    _register_fixture_views(spark, sf_dir, ("lineitem",))
    r = refresh_table(spark, "lineitem")
    return results_df(spark, [r]).select("target", "refreshed", "error")


@query(
    "refresh_many_status",
    """
    SELECT t AS target, TRUE AS refreshed, CAST(NULL AS VARCHAR) AS error
    FROM (VALUES ('customer'), ('lineitem'), ('nation'), ('orders'), ('region')) v(t)
    """,
)
def refresh_many_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 as a declared query: bounded-window concurrent refresh of five
    tables (window=2, the reference's --concurrency semantics)."""
    _register_fixture_views(spark, sf_dir, ("customer", "lineitem", "nation", "orders", "region"))
    results = refresh_many(
        spark,
        ["customer", "lineitem", "nation", "orders", "region"],
        timeout=60.0,
        concurrency=2,
    )
    return results_df(spark, results).select("target", "refreshed", "error")


@query(
    "catalog_list_tables",
    """
    SELECT t AS table_name, TRUE AS is_temporary
    FROM (VALUES ('lineitem'), ('nation'), ('orders'), ('region')) v(t)
    """,
)
def catalog_list_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog introspection (the SHOW TABLES an Impala user runs
    constantly): register four fixture views, list the catalog,
    project the deterministic columns. ``spark.catalog.listTables``
    is the programmatic twin of ``SHOW TABLES``."""
    wanted = ("lineitem", "nation", "orders", "region")
    _register_fixture_views(spark, sf_dir, wanted)
    rows = [
        (t.name, t.isTemporary)
        for t in spark.catalog.listTables()
        if t.name in wanted
    ]
    return spark.createDataFrame(
        sorted(rows),
        T.StructType(
            [
                T.StructField("table_name", T.StringType(), False),
                T.StructField("is_temporary", T.BooleanType(), False),
            ]
        ),
    )


@query(
    "catalog_describe_table",
    """
    SELECT c AS col_name, dt AS data_type
    FROM (VALUES ('o_orderkey', 'bigint'), ('o_custkey', 'bigint'),
                 ('o_orderstatus', 'string'), ('o_totalprice', 'double'),
                 ('o_orderdate', 'timestamp_ntz'), ('o_orderpriority', 'string')) v(c, dt)
    """,
)
def catalog_describe_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE <table> via the catalog API: column names + Spark SQL
    type strings for the orders view — schema introspection as a
    result set, matching Impala's DESCRIBE workflow."""
    _register_fixture_views(spark, sf_dir, ("orders",))
    cols = [(c.name, c.dataType) for c in spark.catalog.listColumns("orders")]
    return spark.createDataFrame(
        cols,
        T.StructType(
            [
                T.StructField("col_name", T.StringType(), False),
                T.StructField("data_type", T.StringType(), False),
            ]
        ),
    )


@query(
    "recover_partitions_status",
    """
    SELECT 'events_partitioned' AS table_name,
           TRUE AS recovered,
           CAST(COUNT(DISTINCT event_type) AS INTEGER) AS n_partitions
    FROM events
    """,
)
def recover_partitions_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 as a declared query: write events partitioned by event_type,
    register an external table over it, recover partitions (MSCK
    REPAIR semantics), report the discovered partition count.

    At 100 TB this is exactly the ingest pattern: files land under
    ``.../event_type=X/`` from an external writer and recoverPartitions
    makes them queryable without rewriting data.
    """
    from impala_refresher_spark.sources.tables import load_table

    path = "/root/repo/_scratch/events_partitioned"
    events = load_table(spark, sf_dir, "events")
    # Shuffle on the partition column before a partitionBy write: each
    # task then writes whole partitions (one file per partition instead
    # of tasks x partitions small files) and the write parallelizes
    # across the partition values — the standard ingest-write pattern.
    events.repartition("event_type").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(path)

    spark.sql("DROP TABLE IF EXISTS events_partitioned")
    spark.sql(
        f"""
        CREATE TABLE events_partitioned
        (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE, props STRING)
        USING PARQUET PARTITIONED BY (event_type STRING)
        LOCATION '{path}'
        """
    )
    n = recover_partitions(spark, "events_partitioned")
    return spark.createDataFrame(
        [("events_partitioned", True, n)],
        T.StructType(
            [
                T.StructField("table_name", T.StringType(), False),
                T.StructField("recovered", T.BooleanType(), False),
                T.StructField("n_partitions", T.IntegerType(), False),
            ]
        ),
    )


_EVENT_CATEGORIES = [
    ("click", "engagement"),
    ("view", "engagement"),
    ("purchase", "conversion"),
    ("signup", "conversion"),
    ("error", "ops"),
]

_EVENT_CATEGORIES_SQL = (
    "(VALUES "
    + ", ".join(f"('{t}', '{c}')" for t, c in _EVENT_CATEGORIES)
    + ") dim(event_type, category)"
)


@query(
    "dpp_partitioned_events",
    f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    JOIN {_EVENT_CATEGORIES_SQL} USING (event_type)
    WHERE category = 'conversion'
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def dpp_partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning over the partitioned events copy: the
    fact side is partitioned by ``event_type`` (the layout
    ``recover_partitions_status`` ingests, README.md:10-11's whole
    point), the dim side carries a ``category`` attribute the fact
    lacks, and the only filter is ON THE DIM. Catalyst inserts a
    ``dynamicpruningexpression`` into the fact scan (locked by
    ``tests/test_plans.py::test_dpp_prunes_partitioned_scan``), so at
    runtime only the partitions whose event_type survives the dim
    filter are read — at 100 TB this is the difference between
    scanning 2/5 of the table and all of it, with zero user-side
    predicate rewriting.

    Both sides are parquet scans on purpose: a literal local dim gets
    constant-folded by ``ConvertToLocalRelation``, which strips the
    Filter node DPP keys on. Writes are freshness-keyed scratch
    materializations (skipped when current).
    """
    import os

    from impala_refresher_spark.sources.tables import load_table, scratch_path

    fact_path = scratch_path("/root/repo/_scratch", "events_dpp", sf_dir, "events")
    if not os.path.exists(os.path.join(fact_path, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "events")
            .repartition("event_type")
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(fact_path)
        )
    dim_path = scratch_path("/root/repo/_scratch", "events_dpp_dim", sf_dir, "events")
    if not os.path.exists(os.path.join(dim_path, "_SUCCESS")):
        spark.createDataFrame(
            _EVENT_CATEGORIES, "event_type string, category string"
        ).coalesce(1).write.mode("overwrite").parquet(dim_path)

    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("category") == "conversion")
    return (
        fact.join(F.broadcast(dim), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )
