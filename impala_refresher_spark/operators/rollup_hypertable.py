"""Hypertable-style continuous aggregate: materialize a fine-grained
time-bucket rollup of the event stream, then serve coarser queries
from the rollup instead of the raw data — the pre-aggregation pattern
that makes 100 TB of events queryable interactively.

Correct two-level aggregation discipline: the materialized layer keeps
MERGEABLE partials (sum, count — never avg); the serving layer derives
final metrics from merged partials (avg = sum/count re-divided). The
oracle aggregates the RAW events directly, proving the rollup path is
lossless for these metrics.

Scale notes: the rollup writes partitioned by event date, so serving
queries prune to the requested time range at the directory level; an
incremental refresh appends only closed buckets (append-only event
time + watermark — cf. streaming/windows.py). Rollup size is
#buckets x #types, orders of magnitude below raw, so the serving scan
is tiny regardless of raw volume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impala_refresher_spark.registry import query
from impala_refresher_spark.sources.tables import load_table, scratch_path

_SCRATCH = "/root/repo/_scratch"


def hourly_rollup(events: DataFrame) -> DataFrame:
    """The materialized layer: hourly buckets of mergeable partials."""
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("bucket_hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .withColumn("bucket_date", F.to_date("bucket_hour"))
    )


@query(
    "hypertable_rollup_daily",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total_value,
           ROUND(ROUND(SUM(value), 2) / COUNT(*), 2) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def hypertable_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-level serving query answered FROM the hourly rollup:
    merge hourly partials (sum of counts, sum of sums) up to days and
    derive avg from the merged partials — dividing the CENT-ROUNDED
    total so both engines divide bit-identical doubles (partial
    summation order differs from the raw-scan order, so dividing the
    full-precision sums could straddle a rounding boundary). The oracle aggregates raw
    events — if the two-level path dropped or double-counted anything,
    every value column would diverge."""
    path = scratch_path(_SCRATCH, "events_hourly_rollup", sf_dir, "events")
    if not os.path.exists(f"{path}/_SUCCESS"):
        events = load_table(spark, sf_dir, "events")
        (
            hourly_rollup(events)
            .repartition("bucket_date")
            .write.mode("overwrite")
            .partitionBy("bucket_date")
            .parquet(path)
        )
    rollup = spark.read.parquet(path)
    return _serve_daily(rollup)


def _serve_daily(rollup: DataFrame) -> DataFrame:
    return (
        rollup.groupBy(
            F.to_date(F.date_trunc("day", "bucket_hour")).alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("sum_value"), 2).alias("total_value"),
            F.round(F.round(F.sum("sum_value"), 2) / F.sum("n"), 2).alias("avg_value"),
        )
    )


def refresh_rollup_incremental(
    spark: SparkSession, events: DataFrame, path: str, days
) -> None:
    """Append/overwrite ONLY the given days' partitions of the hourly
    rollup at ``path`` — the continuous-aggregate maintenance step.

    Dynamic partition overwrite makes the refresh idempotent per day
    (re-running a day replaces exactly that day's files, never the
    whole table), and the day filter prunes the source scan — at
    100 TB the refresh reads one day of events and writes one
    partition directory, regardless of table history size."""
    day_list = [str(d) for d in days]
    if not day_list:
        return
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            hourly_rollup(events.filter(F.to_date("ts").isin(day_list)))
            .repartition("bucket_date")
            .write.mode("overwrite")
            .partitionBy("bucket_date")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


@query(
    "hypertable_rollup_incremental",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def hypertable_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-maintenance correctness, end to end: build the
    rollup WITHOUT the last day, refresh that day through the
    incremental path (dynamic partition overwrite), and serve the
    daily aggregate from the result. The oracle aggregates ALL raw
    events — if the incremental append dropped, duplicated, or
    double-merged anything, the last day's rows diverge.
    """
    events = load_table(spark, sf_dir, "events")
    path = scratch_path(_SCRATCH, "events_rollup_incr", sf_dir, "events")
    last_day = events.agg(F.max(F.to_date("ts")).alias("d")).collect()[0].d
    if not os.path.exists(f"{path}/_SUCCESS"):
        (
            hourly_rollup(events.filter(F.to_date("ts") < F.lit(str(last_day))))
            .repartition("bucket_date")
            .write.mode("overwrite")
            .partitionBy("bucket_date")
            .parquet(path)
        )
    # the maintenance step under test: bring the last day in incrementally
    # (idempotent: re-runs replace exactly that day's partition)
    refresh_rollup_incremental(spark, events, path, [last_day])
    return _serve_daily(spark.read.parquet(path)).select(
        "day", "event_type", "n", "total_value"
    )


# ---------------------------------------------------------------------------
# Mergeable-sketch rollup: daily HLL sketches → union → estimate
# ---------------------------------------------------------------------------

@query("hll_sketch_rollup")  # rows-only: sketch binaries are engine-specific
def hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level distinct-count rollup with MERGEABLE sketches: build a
    per-(day, event_type) HyperLogLog sketch of user_ids (DataSketches
    `hll_sketch_agg`), then answer the per-type question by UNIONING
    the daily sketches (`hll_union_agg`) — never re-touching raw data.

    This is the materialized-aggregate pattern `hypertable_rollup_daily`
    uses for sums, extended to DISTINCT counts, which plain partial
    aggregation cannot merge (yesterday's distinct + today's distinct
    ≠ total distinct). At 100 TB the daily sketch layer is the stored
    rollup (KBs per bucket); serving any date range is a sketch union
    over bucket rows. Engine-specific sketch bytes → rows-only driver
    check; accuracy vs exact distinct is asserted in pytest.
    """
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            F.date_trunc("day", "ts").alias("day"),
            "event_type",
        )
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.count("*").alias("n_days"),
        )
        .orderBy("event_type")
    )


@query(
    "cms_frequency_estimate",
    """
    WITH hashed AS (
        SELECT h.row_i,
               ((o_custkey * h.a + h.b) % 1000003) % 512 AS col_i
        FROM orders
        CROSS JOIN (VALUES (0, 2654435761, 97),
                           (1, 2246822519, 1009),
                           (2, 3266489917, 8191),
                           (3,  668265263, 131071)) AS h(row_i, a, b)
    ),
    sketch AS (
        SELECT row_i, col_i, CAST(COUNT(*) AS BIGINT) AS cell
        FROM hashed GROUP BY row_i, col_i
    ),
    probes AS (
        SELECT o_custkey AS probe_key,
               CAST(COUNT(*) AS BIGINT) AS exact_n
        FROM orders WHERE o_custkey < 15 GROUP BY o_custkey
    ),
    probe_cells AS (
        SELECT p.probe_key, p.exact_n, s.cell
        FROM probes p
        CROSS JOIN (VALUES (0, 2654435761, 97),
                           (1, 2246822519, 1009),
                           (2, 3266489917, 8191),
                           (3,  668265263, 131071)) AS h(row_i, a, b)
        JOIN sketch s
          ON s.row_i = h.row_i
         AND s.col_i = ((p.probe_key * h.a + h.b) % 1000003) % 512
    )
    SELECT probe_key, exact_n,
           MIN(cell) AS cms_n,
           MIN(cell) - exact_n AS overcount
    FROM probe_cells
    GROUP BY probe_key, exact_n
    ORDER BY probe_key
    """,
)
def cms_frequency_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch: a 4×512 mergeable frequency synopsis of
    o_custkey built in one aggregate pass, then point-queried for the
    first 15 keys (estimate = min over the 4 hashed cells, always ≥
    the true count). Companion to the HLL rollup above: HLL answers
    "how many distinct", CMS answers "how often does key k occur"
    from the same kind of constant-size, unionable state.

    The hash family is portable integer arithmetic ((k·a + b) mod
    1000003 mod 512 with 32-bit multipliers — products stay < 2^63,
    so Spark and DuckDB agree bit-for-bit and the ENTIRE sketch,
    not just its contract, is oracle-checked; engine-specific
    xxhash64 would have forced a rows-only check like the HLL
    binaries. At 100 TB: the sketch is a 2048-cell partial-aggregable
    group-by (map-side combine carries at most 2048 counters per
    task); sketches for different shards/days union by cell-wise SUM,
    and the probe join broadcasts the KB-sized sketch."""
    o = load_table(spark, sf_dir, "orders")
    fam = [(0, 2654435761, 97), (1, 2246822519, 1009),
           (2, 3266489917, 8191), (3, 668265263, 131071)]
    hrows = spark.createDataFrame(fam, "row_i int, a long, b long")

    def cell_of(key):
        return ((key * F.col("a") + F.col("b")) % 1000003) % 512

    sketch = (
        o.crossJoin(F.broadcast(hrows))
        .groupBy("row_i", cell_of(F.col("o_custkey")).alias("col_i"))
        .agg(F.count("*").alias("cell"))
    )
    probes = (
        o.filter(F.col("o_custkey") < 15)
        .groupBy(F.col("o_custkey").alias("probe_key"))
        .agg(F.count("*").alias("exact_n"))
    )
    pr = probes.crossJoin(F.broadcast(hrows)).withColumn(
        "probe_col", cell_of(F.col("probe_key"))
    )
    sk = sketch.select(
        F.col("row_i").alias("s_row"),
        F.col("col_i").alias("s_col"),
        "cell",
    )
    probe_cells = pr.join(
        F.broadcast(sk),
        (F.col("s_row") == F.col("row_i"))
        & (F.col("s_col") == F.col("probe_col")),
    )
    return (
        probe_cells.groupBy("probe_key", "exact_n")
        .agg(F.min("cell").alias("cms_n"))
        .select(
            "probe_key",
            "exact_n",
            "cms_n",
            (F.col("cms_n") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy("probe_key")
    )


@query(
    "linear_counting_distinct",
    """
    WITH hashed AS (
        SELECT c_nationkey, c_custkey,
               ((c_custkey * 2654435761 + 97) % 1000003) % 1024 AS bucket
        FROM customer
    ),
    agg AS (
        SELECT c_nationkey,
               CAST(COUNT(DISTINCT bucket) AS BIGINT) AS occupied,
               CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS exact_n
        FROM hashed GROUP BY c_nationkey
    )
    SELECT c_nationkey AS nationkey, occupied, exact_n,
           CAST(ROUND(-1024 * LN(1.0 - LEAST(occupied, 1023) / 1024.0))
                AS BIGINT) AS lc_estimate
    FROM agg
    ORDER BY nationkey
    """,
)
def linear_counting_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-counting distinct estimation per nation (Whang et al.
    1990): hash ids into m=1024 buckets, count occupied buckets V,
    estimate n̂ = −m·ln(1 − V/m). The third sketch in this module's
    family — HLL (G14, engine-opaque bytes → rows-only) answers the
    same question at higher compression; THIS one uses the portable
    integer hash family (see `cms_frequency_estimate`), so bucket
    occupancy — and hence the whole estimate — is oracle-checked
    cross-engine, with the exact count joined alongside for a
    self-auditing error view.

    Scale shape: occupancy is a (nation, bucket) distinct → per-nation
    count — both partial-aggregable; the sketch state is ≤m bits per
    group and merges by bitmap OR (union the occupied-bucket sets), so
    shard sketches fold like the HLL rollup. The ln() rounds to an
    integer estimate; a boundary flip would need the true estimate
    within ~1e-12 of x.5 — outside the repo's float-risk envelope.

    Saturation: at occupied == m (certain per-nation at sf >= 1 with
    m=1024) the raw formula hits ln(0) — NULL in Spark vs error/-inf
    in DuckDB. Both sides clamp occupancy to m-1 (the standard LC
    saturated fallback), capping the estimate at -m*ln(1/m) ≈ 7098
    and signalling "switch to a bigger m or HLL" rather than
    diverging. At small SF occupied < 1024, so the clamp is inert."""
    c = load_table(spark, sf_dir, "customer")
    bucket = ((F.col("c_custkey") * 2654435761 + 97) % 1000003) % 1024
    # both distincts in ONE aggregate: single scan, one Expand (x2) --
    # the join-of-two-aggregates alternative reads customer twice
    agg = (
        c.select("c_nationkey", "c_custkey", bucket.alias("bucket"))
        .groupBy("c_nationkey")
        .agg(
            F.countDistinct("bucket").alias("occupied"),
            F.countDistinct("c_custkey").alias("exact_n"),
        )
    )
    # clamp occupancy to m-1: saturated sketches cap the estimate
    # instead of hitting ln(0) (NULL on Spark, error on DuckDB)
    est = F.round(
        -1024
        * F.log(1.0 - F.least(F.col("occupied"), F.lit(1023)) / F.lit(1024.0))
    ).cast("long")
    return agg.select(
        F.col("c_nationkey").alias("nationkey"),
        "occupied",
        "exact_n",
        est.alias("lc_estimate"),
    ).orderBy("nationkey")
