"""Data-profiling and statistical data-quality operators: ANALYZE-style
single-pass column profiling, Benford first-digit conformance, robust
(median/MAD) outlier detection, CUSUM changepoint scoring, and
time-weighted averages over irregular event timelines.

The reference has no data plane (its whole surface is ``refresh
<table>``, impala-refresher.go:49); these extend the engine per
SURVEY.md §2C — every operator a pure DataFrame pipeline.

Scale notes (100 TB):
- ``profile_table_stats`` is ONE scan: all per-column aggregates fold
  into a single partial-aggregable Aggregate; the multi-``count
  (distinct)`` lowers to Catalyst's Expand (input ×k for k distinct
  aggs) whose partials still combine map-side. At 100 TB swap the
  exact distincts for ``approx_count_distinct`` (HLL, constant state)
  — the plan shape is otherwise identical; kept exact here so the
  DuckDB differential can hash-match.
- ``benford_first_digit`` is a 9-group aggregate — pure map-side
  combine; the share denominator comes from a window over the 9-row
  aggregate, never a second scan of the fact.
- ``mad_outlier_accounts`` works in integer cents so the median /
  MAD interpolation ((a+b)/2 of int64 cents) is EXACT IEEE — the
  strict threshold compare is bit-identical across engines, no
  float-boundary flakes. Medians use Spark's exact ``median`` (sort-
  based per group); at 100 TB substitute ``approx_percentile`` with
  a documented error bound — plan shape unchanged.
- ``cusum_daily_revenue`` aggregates to date grain FIRST (one
  shuffle), then runs both windows over the tiny date-grain frame;
  the unpartitioned windows are bounded by calendar days, not data
  size. Per-entity CUSUM at scale = add the entity to every
  partitionBy — same plan.
- ``time_weighted_avg_value`` shuffles once on user_id; the lead()
  window and the final groupBy reuse that partitioning (no second
  exchange — same argument as sessionize, analytics.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from impala_refresher_spark.registry import query
from impala_refresher_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# ANALYZE-style one-pass column profile
# ---------------------------------------------------------------------------

@query(
    "profile_table_stats",
    """
    WITH agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT)   AS d_status,
               CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS d_prio,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT)       AS d_cust,
               CAST(COUNT(DISTINCT o_totalprice) AS BIGINT)    AS d_price,
               CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT)   AS z_status,
               CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z_prio,
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)       AS z_cust,
               CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)    AS z_price,
               CAST(MIN(o_custkey) AS DOUBLE) AS min_cust,
               CAST(MAX(o_custkey) AS DOUBLE) AS max_cust,
               ROUND(MIN(o_totalprice), 2) AS min_price,
               ROUND(MAX(o_totalprice), 2) AS max_price
        FROM orders
    )
    SELECT 'o_orderstatus' AS col_name, n_rows, z_status AS n_nulls,
           d_status AS n_distinct, CAST(NULL AS DOUBLE) AS min_val,
           CAST(NULL AS DOUBLE) AS max_val FROM agg
    UNION ALL
    SELECT 'o_orderpriority', n_rows, z_prio, d_prio,
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM agg
    UNION ALL
    SELECT 'o_custkey', n_rows, z_cust, d_cust, min_cust, max_cust FROM agg
    UNION ALL
    SELECT 'o_totalprice', n_rows, z_price, d_price, min_price, max_price
    FROM agg
    ORDER BY col_name
    """,
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-TABLE-style profile: one row per column with row count,
    null count, exact distinct count, numeric min/max.

    ONE scan of orders: every statistic folds into a single Aggregate
    (the multi-distinct lowers to Expand — input ×4 but still
    map-side-combinable partials). The wide 1-row aggregate is then
    unpivoted driver-free with ``stack``. At 100 TB replace the exact
    distincts with ``approx_count_distinct``; nothing else changes."""
    o = load_table(spark, sf_dir, "orders")
    nul = lambda c: F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long")
    agg = o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderstatus").alias("d_status"),
        F.countDistinct("o_orderpriority").alias("d_prio"),
        F.countDistinct("o_custkey").alias("d_cust"),
        F.countDistinct("o_totalprice").alias("d_price"),
        nul("o_orderstatus").alias("z_status"),
        nul("o_orderpriority").alias("z_prio"),
        nul("o_custkey").alias("z_cust"),
        nul("o_totalprice").alias("z_price"),
        F.min("o_custkey").cast("double").alias("min_cust"),
        F.max("o_custkey").cast("double").alias("max_cust"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )
    return (
        agg.select(
            F.expr(
                """
                stack(4,
                  'o_orderstatus',   n_rows, z_status, d_status,
                      CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                  'o_orderpriority', n_rows, z_prio,   d_prio,
                      CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                  'o_custkey',       n_rows, z_cust,   d_cust,
                      min_cust, max_cust,
                  'o_totalprice',    n_rows, z_price,  d_price,
                      min_price, max_price
                ) AS (col_name, n_rows, n_nulls, n_distinct, min_val, max_val)
                """
            )
        )
        .orderBy("col_name")
    )


# ---------------------------------------------------------------------------
# Benford first-digit conformance (fraud/DQ screen)
# ---------------------------------------------------------------------------

@query(
    "benford_first_digit",
    """
    WITH digits AS (
        SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INTEGER) AS digit
        FROM orders
        WHERE o_totalprice >= 1
    ),
    counts AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
        FROM digits GROUP BY digit
    )
    SELECT digit, n,
           ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 4) AS obs_freq,
           ROUND(LOG10(1.0 + 1.0 / digit), 4) AS benford_freq,
           ROUND(ABS(CAST(n AS DOUBLE) / SUM(n) OVER ()
                     - LOG10(1.0 + 1.0 / digit)), 4) AS abs_dev
    FROM counts
    ORDER BY digit
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of o_totalprice vs the
    Benford expectation log10(1 + 1/d) — the classic accounting-fraud
    / data-quality screen.

    The digit is extracted via exact integer→string arithmetic (NOT
    ``floor(log10(x))``, whose 1-ulp wobble near powers of ten could
    flip the digit across engines). One 9-group aggregate — map-side
    combine carries nine counters per task; the share denominator is
    a window over the 9-row result, never a second fact scan."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    counts = (
        o.select(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy())
    obs = F.col("n").cast("double") / total
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    return counts.select(
        "digit",
        "n",
        F.round(obs, 4).alias("obs_freq"),
        F.round(benford, 4).alias("benford_freq"),
        F.round(F.abs(obs - benford), 4).alias("abs_dev"),
    ).orderBy("digit")


# ---------------------------------------------------------------------------
# Robust outliers: median / MAD in exact integer cents
# ---------------------------------------------------------------------------

@query(
    "mad_outlier_accounts",
    """
    WITH cents AS (
        SELECT c_custkey, c_nationkey,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer
    ),
    med AS (
        SELECT c_nationkey, MEDIAN(bal_cents) AS med_cents
        FROM cents GROUP BY c_nationkey
    ),
    dev AS (
        SELECT c.c_custkey, c.c_nationkey, c.bal_cents,
               ABS(c.bal_cents - m.med_cents) AS dev_cents
        FROM cents c JOIN med m ON c.c_nationkey = m.c_nationkey
    ),
    mad AS (
        SELECT c_nationkey, MEDIAN(dev_cents) AS mad_cents
        FROM dev GROUP BY c_nationkey
    )
    SELECT d.c_custkey,
           d.c_nationkey AS nationkey,
           ROUND(d.bal_cents / 100.0, 2) AS acctbal,
           ROUND(d.dev_cents / (1.4826 * a.mad_cents), 3) AS robust_z
    FROM dev d JOIN mad a ON d.c_nationkey = a.c_nationkey
    WHERE a.mad_cents > 0
      AND d.dev_cents > 3 * 1.4826 * a.mad_cents
    ORDER BY robust_z DESC, d.c_custkey
    """,
)
def mad_outlier_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation robust outliers: |x − median| > 3·1.4826·MAD.

    All arithmetic runs in integer CENTS so the even-count median
    interpolation ((a+b)/2 of int64) is exact IEEE — the strict
    threshold compare is bit-identical in Spark and DuckDB, immune to
    the float-boundary flakes the repo's float discipline guards
    against. Two grouped exact medians (sort-within-group) + two
    broadcast-sized joins on nationkey (25 rows — Spark broadcasts
    them); the customer scan shuffles once on nationkey. At 100 TB
    swap exact median for ``approx_percentile(…, 0.5)`` — constant
    sketch state, same plan shape."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    med = c.groupBy("c_nationkey").agg(F.median("bal_cents").alias("med_cents"))
    dev = c.join(F.broadcast(med), "c_nationkey").select(
        "c_custkey",
        "c_nationkey",
        "bal_cents",
        F.abs(F.col("bal_cents") - F.col("med_cents")).alias("dev_cents"),
    )
    mad = dev.groupBy("c_nationkey").agg(F.median("dev_cents").alias("mad_cents"))
    return (
        dev.join(F.broadcast(mad), "c_nationkey")
        .filter(
            (F.col("mad_cents") > 0)
            & (F.col("dev_cents") > 3 * 1.4826 * F.col("mad_cents"))
        )
        .select(
            "c_custkey",
            F.col("c_nationkey").alias("nationkey"),
            F.round(F.col("bal_cents") / 100.0, 2).alias("acctbal"),
            F.round(
                F.col("dev_cents") / (1.4826 * F.col("mad_cents")), 3
            ).alias("robust_z"),
        )
        .orderBy(F.desc("robust_z"), "c_custkey")
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint score over daily revenue
# ---------------------------------------------------------------------------

@query(
    "cusum_daily_revenue",
    """
    WITH daily AS (
        SELECT CAST(DATE_TRUNC('day', o_orderdate) AS DATE) AS day,
               ROUND(SUM(o_totalprice), 2) AS rev
        FROM orders GROUP BY 1
    ),
    centered AS (
        SELECT day, rev,
               rev - ROUND(AVG(rev) OVER (), 2) AS delta
        FROM daily
    )
    SELECT day, rev,
           ROUND(SUM(delta) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS cusum
    FROM centered
    ORDER BY day
    """,
)
def cusum_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint score: cumulative sum of (daily revenue −
    grand mean), the classic drift detector — a sustained level shift
    shows as a monotone cusum ramp.

    ONE scan: aggregate to date grain first (the only data-sized
    shuffle), then BOTH windows (grand mean, running sum) run over the
    tiny date-grain frame — no second pass over orders, no broadcast
    round-trip. Daily revs are rounded to cents before the running sum
    and the sum is evaluated in date order on both engines, so the
    accumulation sequence — hence the hash — is identical. Per-entity
    CUSUM at 100 TB: add the entity key to both partitionBys."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.date_trunc("day", "o_orderdate").cast("date").alias("day")
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    mean_r = F.round(F.avg("rev").over(Window.partitionBy()), 2)
    run = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        daily.withColumn("delta", F.col("rev") - mean_r)
        .select(
            "day",
            "rev",
            F.round(F.sum("delta").over(run), 2).alias("cusum"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Time-weighted average over irregular event timelines
# ---------------------------------------------------------------------------

@query(
    "time_weighted_avg_value",
    """
    WITH stepped AS (
        SELECT user_id, value,
               epoch_us(ts) AS t_us,
               LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS t_next
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           ROUND(SUM(t_next - t_us) / 1e6, 1) AS span_sec,
           ROUND(SUM(value * (t_next - t_us))
                 / NULLIF(SUM(t_next - t_us), 0), 4) AS twa_value
    FROM stepped
    WHERE t_next IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per user: each reading is
    held until the next one, weighted by its holding time — the
    correct average for irregularly-sampled telemetry (a plain AVG
    over-weights bursts).

    Timestamps become exact integer MICROSECONDS (``unix_micros`` /
    ``epoch_us``) so interval widths are integer-exact cross-engine.
    One shuffle on user_id; the lead() window and the final groupBy
    reuse the same partitioning (no second exchange). The weighted
    sums are partial-aggregable — at 100 TB this is a sessionize-
    shaped plan: one exchange + window + combine."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = e.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("t_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("t_next"),
    ).filter(F.col("t_next").isNotNull())
    dt = F.col("t_next") - F.col("t_us")
    return (
        stepped.groupBy("user_id")
        .agg(
            F.count("*").alias("n_intervals"),
            F.round(F.sum(dt) / F.lit(1e6), 1).alias("span_sec"),
            # try_divide: a user whose events ALL share one timestamp
            # has a zero total span — ANSI Spark errors on the division
            # while DuckDB's NULLIF form yields NULL; unreachable on
            # µs-unique fixtures, real on second-grain logs (found by
            # the hypothesis differential in tests/test_properties.py)
            F.round(F.try_divide(F.sum(F.col("value") * dt), F.sum(dt)), 4).alias(
                "twa_value"
            ),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands over calendar days
# ---------------------------------------------------------------------------

@query(
    "gap_islands_active_days",
    """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS day
        FROM events
    ),
    anchored AS (
        SELECT user_id, day,
               day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                             ORDER BY day) AS INTEGER)
                   AS anchor
        FROM days
    )
    SELECT user_id,
           MIN(day) AS island_start,
           MAX(day) AS island_end,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM anchored
    GROUP BY user_id, anchor
    ORDER BY user_id, island_start
    """,
)
def gap_islands_active_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-active-day islands per user — the calendar-grain
    complement of timestamp-gap sessionization (``analytics.py``):
    ``day − row_number()`` is constant within a run of consecutive
    days, so grouping by that anchor yields each island in one window
    pass + one aggregate.

    Only the first exchange is fact-sized, and it is map-side-combined:
    the (user_id, day) distinct partially dedups before shuffling, so
    the wire carries at most users×days pairs. The window and island
    aggregate re-shuffle only that collapsed relation — orders of
    magnitude smaller than the event volume at 100 TB. Day arithmetic
    is integer (DATE ± INT) — no float, nothing to round."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    anchored = days.select(
        "user_id",
        "day",
        F.date_sub("day", F.row_number().over(w)).alias("anchor"),
    )
    return (
        anchored.groupBy("user_id", "anchor")
        .agg(
            F.min("day").alias("island_start"),
            F.max("day").alias("island_end"),
            F.count("*").alias("n_days"),
        )
        .drop("anchor")
        .orderBy("user_id", "island_start")
    )


# ---------------------------------------------------------------------------
# Rolling windowed correlation (drift of a relationship over time)
# ---------------------------------------------------------------------------

@query(
    "rolling_corr_qty_price",
    """
    WITH keyed AS (
        SELECT l_returnflag,
               DATEDIFF('day', DATE '1970-01-01',
                        CAST(l_shipdate AS DATE)) AS day_i,
               CAST(DATE_TRUNC('day', l_shipdate) AS DATE) AS day,
               l_quantity, l_extendedprice
        FROM lineitem
    )
    SELECT DISTINCT l_returnflag, day,
           ROUND(CORR(l_quantity, l_extendedprice)
                 OVER (PARTITION BY l_returnflag ORDER BY day_i
                       RANGE BETWEEN 29 PRECEDING AND CURRENT ROW), 4) + 0.0
               AS corr_30d
    FROM keyed
    ORDER BY l_returnflag, day
    """,
)
def rolling_corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day rolling Pearson correlation of quantity vs extended
    price per return flag — the relationship-drift monitor (global
    CORR is in ``agg_stats_moments``; this is its windowed form).

    Spark-first REWRITE: the fact table collapses to DAILY sufficient
    statistics (n, Σx, Σy, Σxy, Σx², Σy² — one partial-aggregable
    pass), the 30-day RANGE window rolls those six sums over the
    DATE-GRAIN frame (flags×days rows, not fact rows), and corr comes
    from the closed form — the `ols_per_nation` trick applied to a
    sliding frame. The oracle is the NAIVE definition (engine CORR
    over a per-row RANGE frame), so the differential proves the
    rewrite. At sf0.1 the gain is modest (the fact scan dominates
    either way); the point is structural — the naive plan's window
    input grows with the fact table, the rewrite's stays at
    flags×days forever. RANGE frames are
    value-defined, so the result is independent of intra-day row
    order. `+ 0.0` collapses IEEE negative zero (-0.0 + 0.0 = +0.0),
    which DID diverge across engines for frames whose correlation
    rounds to zero."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    daily = (
        li.groupBy(
            "l_returnflag",
            F.datediff(
                F.col("l_shipdate").cast("date"), F.lit("1970-01-01")
            ).alias("day_i"),
            F.date_trunc("day", "l_shipdate").cast("date").alias("day"),
        )
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * y).alias("sxy"),
            F.sum(x * x).alias("sxx"),
            F.sum(y * y).alias("syy"),
        )
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("day_i")
        .rangeBetween(-29, Window.currentRow)
    )
    N = F.sum("n").over(w)
    SX, SY = F.sum("sx").over(w), F.sum("sy").over(w)
    SXY = F.sum("sxy").over(w)
    SXX, SYY = F.sum("sxx").over(w), F.sum("syy").over(w)
    # try_divide: a zero-variance frame (e.g. a single-row day with no
    # 29-day history) has no defined correlation — NULL, matching what
    # both engines' CORR returns there, instead of an ANSI error.
    # greatest(0, ·): the n·Var factors are mathematically >= 0 but
    # float cancellation can leave -1e-9 residue on a zero-variance
    # frame; Spark's sqrt(neg) is NaN (poisoning try_divide into NaN,
    # not NULL) while the oracle's CORR returns NULL — clamping to 0
    # routes both engines to the same NULL and is a no-op otherwise.
    corr = F.try_divide(
        SXY - SX * SY / N,
        F.sqrt(
            F.greatest(F.lit(0.0), SXX - SX * SX / N)
            * F.greatest(F.lit(0.0), SYY - SY * SY / N)
        ),
    )
    return (
        daily.select(
            "l_returnflag",
            "day",
            (F.round(corr, 4) + F.lit(0.0)).alias("corr_30d"),
        )
        .orderBy("l_returnflag", "day")
    )



# ---------------------------------------------------------------------------
# Cumulative distinct users (the first-occurrence rewrite)
# ---------------------------------------------------------------------------

@query(
    "cumulative_distinct_users",
    """
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(DATE_TRUNC('day', ts) AS DATE) AS day
        FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud)
    SELECT d.day,
           CAST((SELECT COUNT(DISTINCT u.user_id)
                 FROM ud u WHERE u.day <= d.day) AS BIGINT) AS cum_users
    FROM days d
    ORDER BY day
    """,
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the growth-curve metric.
    COUNT(DISTINCT) over a running window cannot partial-aggregate
    (the reducer would need every id ever seen); the Spark-first
    REWRITE is: distinct (user, day) → first-occurrence flag via a
    per-user row_number → new users per day → running SUM — every
    stage partial-aggregable, ONE scan of the fact (the per-day
    aggregate over the distinct relation keeps every active day, so
    no day-spine join is needed; zero-new-user days come out as
    sum(flag)=0), and the cumsum window runs over the calendar-day
    frame.

    The oracle is the NAIVE per-day correlated COUNT(DISTINCT …
    WHERE day <= d) definition, so the differential proves the
    first-occurrence rewrite exact. At 100 TB the same shape serves
    cumulative-distinct per tenant by adding the tenant key to every
    grouping."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    first = Window.partitionBy("user_id").orderBy("day")
    flagged = ud.withColumn(
        "is_first", (F.row_number().over(first) == 1).cast("long")
    )
    run = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        flagged.groupBy("day")
        .agg(F.sum("is_first").alias("new_users"))
        .select(
            "day",
            F.sum("new_users").over(run).cast("long").alias("cum_users"),
        )
        .orderBy("day")
    )



# ---------------------------------------------------------------------------
# Referential-integrity audit across the star schema
# ---------------------------------------------------------------------------

@query(
    "fk_orphans_audit",
    """
    SELECT 'lineitem.l_orderkey->orders' AS fk,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey))
                AS BIGINT)
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    ORDER BY fk
    """,
)
def fk_orphans_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan count per foreign-key edge
    of the star schema (facts referencing a missing dimension row) —
    the cross-TABLE data-quality complement of the single-table
    ``dq_rule_violations``.

    Each edge is an ANTI-JOIN + count. The three lineitem edges share
    one cached scan; every dimension side is broadcast (orders at
    true scale falls back to a shuffle join, where Spark's runtime
    bloom filter — plan-locked elsewhere, test_plans C3 — kills
    non-orphans before the exchange, which is exactly the right
    100 TB shape because orphans are rare). Counts union into one
    4-row report."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def orphans(fact, key, dim, dim_key, label):
        n = (
            fact.join(
                F.broadcast(dim.select(F.col(dim_key).alias(key)).distinct()),
                key,
                "left_anti",
            )
            .agg(F.count("*").cast("long").alias("n_orphans"))
        )
        return n.select(F.lit(label).alias("fk"), "n_orphans")

    parts = [
        orphans(li, "l_orderkey", o, "o_orderkey",
                "lineitem.l_orderkey->orders"),
        orphans(li, "l_partkey", load_table(spark, sf_dir, "part"),
                "p_partkey", "lineitem.l_partkey->part"),
        orphans(li, "l_suppkey", load_table(spark, sf_dir, "supplier"),
                "s_suppkey", "lineitem.l_suppkey->supplier"),
        orphans(o, "o_custkey", load_table(spark, sf_dir, "customer"),
                "c_custkey", "orders.o_custkey->customer"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("fk")


# ---------------------------------------------------------------------------
# Period-over-period change report
# ---------------------------------------------------------------------------

@query(
    "revenue_mom_change",
    """
    WITH monthly AS (
        SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
               ROUND(SUM(o_totalprice), 2) AS rev
        FROM orders GROUP BY 1
    )
    SELECT month, rev,
           ROUND(rev - LAG(rev) OVER (ORDER BY month), 2) AS mom_delta,
           ROUND(100.0 * (rev - LAG(rev) OVER (ORDER BY month))
                 / LAG(rev) OVER (ORDER BY month), 2) AS mom_pct
    FROM monthly
    ORDER BY month
    """,
)
def revenue_mom_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue report: absolute and percent change
    via lag over the month grain — the period-over-period staple.

    Same shape discipline as CUSUM above: ONE fact-sized shuffle (the
    month aggregate), then the lag window runs over the dozens-of-rows
    month frame. Revenue is rounded to cents BEFORE the delta/percent
    arithmetic so both engines difference identical doubles; the
    quotient is rounded last."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month")
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    w = Window.orderBy("month")
    prev = F.lag("rev").over(w)
    return (
        monthly.select(
            "month",
            "rev",
            F.round(F.col("rev") - prev, 2).alias("mom_delta"),
            F.round(100.0 * (F.col("rev") - prev) / prev, 2).alias("mom_pct"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Classical time-series decomposition (trend + day-of-week + residual)
# ---------------------------------------------------------------------------

@query(
    "timeseries_decompose_daily",
    """
    WITH daily AS (
        SELECT CAST(DATE_TRUNC('day', o_orderdate) AS DATE) AS day,
               CAST(DAYOFWEEK(CAST(o_orderdate AS DATE)) + 1 AS INTEGER)
                   AS dow,
               ROUND(SUM(o_totalprice), 2) AS rev
        FROM orders GROUP BY 1, 2
    ),
    trended AS (
        SELECT day, dow, rev,
               CASE WHEN COUNT(*) OVER w = 7
                    THEN ROUND(AVG(rev) OVER w, 2) END AS trend
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    seasonal AS (
        SELECT day, dow, rev, trend,
               ROUND(AVG(rev - trend) OVER (PARTITION BY dow), 2)
                   AS seasonal
        FROM trended
    )
    SELECT day, rev, trend, seasonal,
           ROUND(rev - trend - seasonal, 2) AS residual
    FROM seasonal
    WHERE trend IS NOT NULL
    ORDER BY day
    """,
)
def timeseries_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of daily revenue: trend =
    centered 7-day moving average (full windows only — edges yield
    NULL and drop symmetrically), seasonal = mean detrended value per
    day-of-week, residual = the rest. The anomaly-hunting complement
    of `seasonal_dow_anomaly`: that op SCORES days against a dow
    baseline; this one SEPARATES the series into interpretable parts
    (is growth trend or seasonality?).

    All three components run on the date grain after one fact-sized
    aggregate — the CUSUM/MoM discipline; the centered MA is a
    ROWS-bounded window (calendar-dense daily grain makes rows ≡
    days), the seasonal means partition by dow (7 partitions), and
    every component is cents-rounded BEFORE entering the next stage
    so cross-engine float drift cannot compound through the
    pipeline."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.date_trunc("day", "o_orderdate").cast("date").alias("day"),
            F.dayofweek(F.col("o_orderdate").cast("date")).alias("dow"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    ma = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.select(
        "day",
        "dow",
        "rev",
        F.when(
            F.count("*").over(ma) == 7, F.round(F.avg("rev").over(ma), 2)
        ).alias("trend"),
    )
    seas = Window.partitionBy("dow")
    seasonal = trended.select(
        "day",
        "rev",
        "trend",
        F.round(F.avg(F.col("rev") - F.col("trend")).over(seas), 2).alias(
            "seasonal"
        ),
    )
    return (
        seasonal.filter(F.col("trend").isNotNull())
        .select(
            "day",
            "rev",
            "trend",
            "seasonal",
            F.round(
                F.col("rev") - F.col("trend") - F.col("seasonal"), 2
            ).alias("residual"),
        )
        .orderBy("day")
    )
