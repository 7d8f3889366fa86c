"""As-of (point-in-time) join — a custom operator the reference's
Impala-adjacent SQL surface lacks (SURVEY.md §2B: the reference has no
joins at all; this extends §2C's join family with the time-series
staple).

Semantics: for each left row, attach the single most recent right row
with the same key whose timestamp is <= the left row's timestamp
(NULLs when no such row — left-join flavor).

Scale design — the union trick, not a range join: a naive
``l JOIN r ON key AND r.ts <= l.ts`` + max-per-group explodes to every
(left, earlier-right) pair before pruning — quadratic per key. Instead
tag both sides, union, and take a running ``last(right cols, ignore
nulls)`` over (key ORDER BY ts, side): ONE shuffle on the key, linear
state, no row multiplication. This is the same plan shape a dedicated
as-of operator (e.g. a Flink temporal join or kdb aj) materializes
internally; Catalyst runs it as Exchange + WindowExec.

Demonstrated on the events stream: each ``purchase`` event picks up
the same user's most recent preceding ``click`` (attribution join).
Oracle: DuckDB's native ``ASOF LEFT JOIN``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from impala_refresher_spark.registry import query
from impala_refresher_spark.sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """Generic as-of join: left rows keep all their columns and gain
    ``right_value_cols`` from the latest right row at-or-before their
    ``ts`` (same ``on`` key). Right side must be unique per (on, ts) —
    pre-aggregate if not, or the pick is nondeterministic.
    """
    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.withColumn("_side", F.lit(0))
    # Align schemas for the union: left lacks right's value columns,
    # right lacks left's payload — fill with typed NULLs.
    for c in right_value_cols:
        l_tag = l_tag.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    for c in left.columns:
        if c not in (on, ts) and c not in right_value_cols:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tag.select(*l_tag.columns).unionByName(r_tag.select(*l_tag.columns))

    # Right rows sort before left rows at equal ts (_side 0 < 1), so a
    # right row AT the left timestamp is visible to it ("<=", matching
    # ASOF's p.ts >= c.ts).
    w = (
        W.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        *[c for c in unioned.columns if c not in right_value_cols],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_value_cols],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


@query(
    "asof_click_attribution",
    """
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts AS click_ts, CAST(MAX(event_id) AS BIGINT) AS click_event_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts, p.value, c.click_ts, c.click_event_id
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution: each purchase joined to the same user's most recent
    click at-or-before it (NULLs when the user never clicked before).
    Clicks are pre-aggregated to one per (user, ts) so the as-of pick
    is deterministic on both engines."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_event_id"))
        .withColumn("ts", F.col("click_ts"))
        .select("user_id", "ts", "click_ts", "click_event_id")
    )
    return asof_join(
        purchases, clicks, on="user_id", ts="ts",
        right_value_cols=["click_ts", "click_event_id"],
    ).select("event_id", "user_id", "ts", "value", "click_ts", "click_event_id")


# ---------------------------------------------------------------------------
# Point-in-time (PIT) feature join — the feature-store training join
# ---------------------------------------------------------------------------

@query(
    "pit_feature_join",
    """
    WITH feats AS (
      SELECT user_id, ts, event_id,
             CAST(COUNT(*) OVER w AS BIGINT) AS n_views_cum,
             SUM(value) OVER w AS view_value_cum
      FROM events WHERE event_type = 'view'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    labels AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ),
    u AS (
      SELECT user_id, ts, event_id, 1 AS side, n_views_cum, view_value_cum
      FROM feats
      UNION ALL
      SELECT user_id, ts, event_id, 0 AS side,
             CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
      FROM labels
    ),
    pit AS (
      SELECT user_id, ts, event_id, side,
             last_value(n_views_cum IGNORE NULLS) OVER w AS n_prior_views,
             last_value(view_value_cum IGNORE NULLS) OVER w AS prior_view_value
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id AS label_id, user_id, ts AS label_ts,
           COALESCE(n_prior_views, 0) AS n_prior_views,
           COALESCE(prior_view_value, 0.0) AS prior_view_value
    FROM pit WHERE side = 0
    """,
)
def pit_feature_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature join: every purchase (the label
    event) picks up the user's view-stream features — cumulative view
    count and view value — as of STRICTLY BEFORE the label timestamp.
    This is the feature-store training join; the strict `<` is the
    leakage guard (`asof_join`'s `<=` would let a same-instant feature
    update see the label).

    Strictness is encoded in the sort, not a range predicate: labels
    carry side=0 and features side=1, the PIT window orders by
    (ts, side, event_id), so a feature AT the label's timestamp sorts
    AFTER the label and is invisible to it. Plan: two window passes
    over ONE user_id shuffle each (feature build, then PIT fill) —
    linear state, no label×history row multiplication, the same
    union-trick shape as `asof_join`. The running feature sums are
    window aggregates (sequential, order-pinned), so the unrounded
    doubles match the oracle bitwise."""
    e = load_table(spark, sf_dir, "events")
    wf = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    feats = (
        e.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.lit(1).alias("side"),
            F.count("*").over(wf).alias("n_views_cum"),
            F.sum("value").over(wf).alias("view_value_cum"),
        )
    )
    labels = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("side"),
        F.lit(None).cast("bigint").alias("n_views_cum"),
        F.lit(None).cast("double").alias("view_value_cum"),
    )
    u = feats.unionByName(labels)
    wp = (
        W.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        u.select(
            "user_id",
            "ts",
            "event_id",
            "side",
            F.last("n_views_cum", ignorenulls=True).over(wp).alias("n_prior_views"),
            F.last("view_value_cum", ignorenulls=True)
            .over(wp)
            .alias("prior_view_value"),
        )
        .filter(F.col("side") == 0)
        .select(
            F.col("event_id").alias("label_id"),
            "user_id",
            F.col("ts").alias("label_ts"),
            F.coalesce("n_prior_views", F.lit(0)).alias("n_prior_views"),
            F.coalesce("prior_view_value", F.lit(0.0)).alias("prior_view_value"),
        )
    )


# ---------------------------------------------------------------------------
# Nearest-event join (bidirectional as-of) — sensor-fusion alignment
# ---------------------------------------------------------------------------

@query(
    "nearest_event_join",
    """
    WITH p AS (SELECT event_id AS pid, user_id, ts AS pts
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS cid, user_id, ts AS cts
          FROM events WHERE event_type = 'click'),
    pairs AS (
      SELECT p.pid, p.user_id, p.pts, c.cid,
             abs(epoch_us(p.pts) - epoch_us(c.cts)) AS ad,
             ROW_NUMBER() OVER (PARTITION BY p.pid
                                ORDER BY abs(epoch_us(p.pts) - epoch_us(c.cts)),
                                         c.cts, c.cid) AS rk
      FROM p JOIN c USING (user_id)
    )
    SELECT pid AS purchase_id, user_id, pts AS purchase_ts,
           cid AS click_id, CAST(ad AS BIGINT) AS abs_us
    FROM pairs WHERE rk = 1
    """,
)
def nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional as-of: each purchase aligns to the same user's
    NEAREST click in either time direction (min |Δt|; tie prefers the
    earlier click) — the log/sensor alignment join where "most recent
    before" is the wrong answer half the time.

    Plan: the union trick run both ways — one (ts, side)-sorted pass
    per user yields the latest preceding click (running last) AND the
    earliest following click (running first); a CASE picks the nearer.
    ONE shuffle on user_id, linear state — never the purchases×clicks
    pair blowup. The oracle IS that quadratic pair join (rank by
    |Δt|), so the differential proves the two-window rewrite exact,
    same method as `range_join_count_orderstat`. Purchases of users
    with no clicks drop (inner semantics, both sides). Fixture
    timestamps are unique per user at µs grain, so the tie branches are
    unreachable here; the tie rules are still pinned in both plans —
    including clicks SHARING a timestamp (second-grain logs make this
    plausible): the winner is the smallest click_id, which needs
    opposite event_id sort directions in the two windows (a running
    ``last`` keeps the final row of the frame, a running ``first`` the
    initial one, so "min id at the boundary ts" is event_id DESC
    backward but ASC forward; edge-pinned in test_edge_cases)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("side"), F.col("event_id")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), F.col("event_id")
    )
    u = clicks.unionByName(purchases)
    wb = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("side").asc(), F.col("event_id").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("side").asc(), F.col("event_id").asc())
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    is_click = F.col("side") == 0
    cid = F.when(is_click, F.col("event_id"))
    cts = F.when(is_click, F.col("ts"))
    annotated = u.select(
        "user_id",
        "ts",
        "side",
        "event_id",
        F.last(cid, ignorenulls=True).over(wb).alias("prev_cid"),
        F.last(cts, ignorenulls=True).over(wb).alias("prev_cts"),
        F.first(cid, ignorenulls=True).over(wf).alias("next_cid"),
        F.first(cts, ignorenulls=True).over(wf).alias("next_cts"),
    ).filter(F.col("side") == 1)
    us = F.unix_micros
    ad_prev = us(F.col("ts")) - us(F.col("prev_cts"))
    ad_next = us(F.col("next_cts")) - us(F.col("ts"))
    take_prev = F.col("next_cts").isNull() | (
        F.col("prev_cts").isNotNull() & (ad_prev <= ad_next)
    )
    return (
        annotated.filter(F.col("prev_cts").isNotNull() | F.col("next_cts").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.when(take_prev, F.col("prev_cid")).otherwise(F.col("next_cid")).alias("click_id"),
            F.when(take_prev, ad_prev).otherwise(ad_next).cast("bigint").alias("abs_us"),
        )
    )
