"""Semantics tests for the reference-faithful refresh surface —
mirrors impala-refresher.go behaviors: per-target timeout (:81-86),
bounded concurrency window (:122-131), fail-any status fold (:97,
176-180), error normalization (:59-61)."""

from __future__ import annotations

import threading
import time

import pytest

from impala_refresher_spark.operators.refresh import (
    RefreshResult,
    all_refreshed,
    recover_partitions,
    refresh_many,
    refresh_table,
    results_df,
)


def _ok(spark, name):
    return RefreshResult(name, True, None, 1)


def test_refresh_table_success(spark, sf_dir):
    spark.read.parquet(f"{sf_dir}/region.parquet").createOrReplaceTempView("region")
    r = refresh_table(spark, "region")
    assert r.refreshed and r.error is None
    assert r.duration_ms >= 0


def test_refresh_table_missing_is_reported_not_raised(spark):
    r = refresh_table(spark, "no_such_table_xyz")
    assert not r.refreshed
    assert "did not refresh" in r.error  # normalized message, go:59-61


def test_refresh_many_all_success_and_fold(spark, sf_dir):
    for t in ("region", "nation"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    results = refresh_many(spark, ["region", "nation"], concurrency=1)
    assert all_refreshed(results)
    df = results_df(spark, results)
    assert df.count() == 2
    assert df.filter("refreshed").count() == 2


def test_refresh_many_timeout_marks_failed_without_raising(spark):
    def slow(s, name):
        time.sleep(5)
        return _ok(s, name)

    t0 = time.monotonic()
    results = refresh_many(spark, ["a", "b"], timeout=0.2, refresh_fn=slow)
    assert time.monotonic() - t0 < 4  # did not wait for the sleeps
    assert not all_refreshed(results)
    assert all("did not refresh" in r.error for r in results)


def test_refresh_many_fail_any_semantics(spark):
    def flaky(s, name):
        if name == "bad":
            return RefreshResult(name, False, f"{name}'s catalog did not refresh", 1)
        return _ok(s, name)

    results = refresh_many(spark, ["good1", "bad", "good2"], refresh_fn=flaky)
    assert not all_refreshed(results)  # one failure ANDs to False
    by_name = {r.target: r for r in results}
    assert by_name["good1"].refreshed and by_name["good2"].refreshed
    assert not by_name["bad"].refreshed


def test_refresh_many_bounded_window(spark):
    """The in-flight count must never exceed the concurrency window
    (reference sliding-window check, go:122)."""
    lock = threading.Lock()
    state = {"now": 0, "max": 0}

    def tracked(s, name):
        with lock:
            state["now"] += 1
            state["max"] = max(state["max"], state["now"])
        time.sleep(0.05)
        with lock:
            state["now"] -= 1
        return _ok(s, name)

    refresh_many(spark, [f"t{i}" for i in range(8)], concurrency=3, refresh_fn=tracked)
    assert state["max"] <= 3


def test_refresh_many_unlimited_concurrency(spark):
    """concurrency=0 = all in flight at once (go:153: 0 means the
    window check never trips)."""
    barrier = threading.Barrier(6, timeout=5)

    def rendezvous(s, name):
        barrier.wait()  # only passes if all 6 run simultaneously
        return _ok(s, name)

    results = refresh_many(spark, [f"t{i}" for i in range(6)], concurrency=0, refresh_fn=rendezvous)
    assert all_refreshed(results)


def test_refresh_timeout_clock_starts_at_target_start(spark):
    """With a bounded window, a queued target's timeout clock must not
    start until a worker actually picks it up: 4 targets × 0.3 s behind
    a 1-wide window take ~1.2 s wall total, but each is well under the
    0.6 s per-target timeout — all must succeed."""

    def slowish(s, name):
        time.sleep(0.3)
        return _ok(s, name)

    results = refresh_many(
        spark, [f"t{i}" for i in range(4)], timeout=0.6, concurrency=1, refresh_fn=slowish
    )
    assert all_refreshed(results), [r.error for r in results]


def test_refresh_timeout_only_flags_the_slow_target(spark):
    """One genuinely slow target times out ~timeout after ITS start;
    the targets before and after it stay green."""

    def mixed(s, name):
        time.sleep(3 if name == "slow" else 0.05)
        return _ok(s, name)

    results = refresh_many(
        spark, ["fast1", "slow", "fast2"], timeout=0.4, concurrency=1, refresh_fn=mixed
    )
    by_name = {r.target: r for r in results}
    assert by_name["fast1"].refreshed and by_name["fast2"].refreshed
    assert not by_name["slow"].refreshed
    assert "timeout" in by_name["slow"].error


def test_refresh_timeout_cancels_running_spark_job(spark):
    """A timed-out target's underlying Spark job must actually STOP
    (cancelJobGroup), matching the reference's process kill
    (impala-refresher.go:81-86) — not keep burning executors."""
    interrupted = threading.Event()

    def runs_long_spark_job(s, name):
        try:
            # single-partition job that would run ~30 s uncancelled
            s.range(300, numPartitions=1).foreach(lambda _: time.sleep(0.1))
            return _ok(s, name)
        except Exception:
            interrupted.set()  # cancellation surfaced inside the job
            return RefreshResult(name, False, "cancelled", 0)

    results = refresh_many(
        spark, ["longjob"], timeout=1.0, refresh_fn=runs_long_spark_job
    )
    assert not all_refreshed(results)
    assert interrupted.wait(timeout=10), "Spark job was not cancelled on timeout"


def test_recover_partitions_discovers_all(spark, sf_dir, tmp_path_factory):
    from impala_refresher_spark.sources.tables import load_table

    path = "/root/repo/_scratch/test_events_part"
    events = load_table(spark, sf_dir, "events")
    events.write.mode("overwrite").partitionBy("event_type").parquet(path)
    spark.sql("DROP TABLE IF EXISTS test_events_part")
    spark.sql(
        "CREATE TABLE test_events_part "
        "(event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE, props STRING) "
        f"USING PARQUET PARTITIONED BY (event_type STRING) LOCATION '{path}'"
    )
    n = recover_partitions(spark, "test_events_part")
    expected = events.select("event_type").distinct().count()
    assert n == expected
    # the recovered table is queryable and partition-prunes
    got = spark.table("test_events_part").filter("event_type = 'click'").count()
    want = events.filter("event_type = 'click'").count()
    assert got == want
    spark.sql("DROP TABLE IF EXISTS test_events_part")
