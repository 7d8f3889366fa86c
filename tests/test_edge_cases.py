"""Edge-case unit tests on inline DataFrames (SURVEY.md §5.3): the
corner semantics a fixture-scale DuckDB diff can miss by luck."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from impala_refresher_spark.operators.asof import asof_join
from impala_refresher_spark.operators.dedup import _shingles
from impala_refresher_spark.sources.tables import fan_out


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


def test_asof_no_earlier_match_yields_nulls(spark):
    left = spark.createDataFrame([(1, _ts(5), "L1")], "k long, ts timestamp, payload string")
    right = spark.createDataFrame([(1, _ts(9), 100)], "k long, ts timestamp, v int")
    out = asof_join(left, right, on="k", ts="ts", right_value_cols=["v"]).collect()
    assert len(out) == 1 and out[0].v is None  # right row is LATER: no match


def test_asof_exact_timestamp_tie_is_matched(spark):
    """A right row AT the left timestamp counts ('<=', ASOF semantics)."""
    left = spark.createDataFrame([(1, _ts(5), "L1")], "k long, ts timestamp, payload string")
    right = spark.createDataFrame([(1, _ts(5), 7)], "k long, ts timestamp, v int")
    out = asof_join(left, right, on="k", ts="ts", right_value_cols=["v"]).collect()
    assert out[0].v == 7


def test_asof_picks_latest_not_first_and_isolates_keys(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (2, _ts(10), "b")], "k long, ts timestamp, payload string"
    )
    right = spark.createDataFrame(
        [(1, _ts(1), 1), (1, _ts(9), 9), (2, _ts(3), 3)],
        "k long, ts timestamp, v int",
    )
    got = {r.k: r.v for r in asof_join(left, right, on="k", ts="ts", right_value_cols=["v"]).collect()}
    assert got == {1: 9, 2: 3}  # latest per key; key 2 never sees key 1's rows


def test_shingles_short_doc_is_empty_not_descending(spark):
    """Docs shorter than n tokens must give [], not a wrapped-around
    F.sequence artifact (the bug the guard in _shingles exists for)."""
    df = spark.createDataFrame([("a b",), ("a b c",), ("",)], "text string")
    rows = df.select(F.size(_shingles(F.col("text"))).alias("n")).collect()
    assert [r.n for r in rows] == [0, 1, 0]


def test_fan_out_noop_when_already_parallel(spark):
    """fan_out must NOT inject a shuffle when the input already has
    >= cores partitions — the 100 TB no-op guarantee."""
    want = spark.sparkContext.defaultParallelism
    wide = spark.range(10_000, numPartitions=want + 4)
    assert fan_out(wide.toDF("id")).rdd.getNumPartitions() == want + 4


def test_fan_out_parallelizes_small_scan(spark, sf_dir):
    """A single tiny parquet file scans as ~1 split; fan_out must widen
    it to cores via the plan-side (inputFiles) estimate, no RDD probe."""
    from impala_refresher_spark.sources.tables import load_table

    want = spark.sparkContext.defaultParallelism
    df = fan_out(load_table(spark, sf_dir, "region"))
    assert df.rdd.getNumPartitions() == want


def test_events_reads_under_vanilla_session_conf(spark, sf_dir):
    """The driver checks queries under ITS OWN SparkSession, which does
    not set spark.sql.legacy.parquet.nanosAsLong — load_table must be
    self-sufficient. Simulate by unsetting the runtime conf first."""
    from impala_refresher_spark.sources.tables import load_table

    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = load_table(spark, sf_dir, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert df.limit(1).count() == 1
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_topk_tiebreak_is_deterministic(spark):
    """row_number top-k with a tie on the ranking key must break ties
    by the declared secondary key, not partition luck."""
    from pyspark.sql import Window as W

    df = spark.createDataFrame(
        [("g", 10, 3), ("g", 10, 1), ("g", 10, 2)], "grp string, score int, id int"
    )
    w = W.partitionBy("grp").orderBy(F.col("score").desc(), F.col("id").asc())
    top2 = df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 2)
    assert sorted(r.id for r in top2.collect()) == [1, 2]


def test_incremental_rollup_refresh_is_idempotent(spark, sf_dir):
    """Re-running the incremental maintenance step must replace the
    refreshed day's partition, not duplicate it (dynamic partition
    overwrite) — same served rows on every run."""
    from impala_refresher_spark.operators.rollup_hypertable import (
        hypertable_rollup_incremental,
    )

    a = sorted(map(tuple, hypertable_rollup_incremental(spark, sf_dir).collect()))
    b = sorted(map(tuple, hypertable_rollup_incremental(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_except_all_keeps_multiplicity(spark):
    """exceptAll is bag semantics: {a,a,b} minus {a} = {a,b}."""
    left = spark.createDataFrame([(1,), (1,), (2,)], "x int")
    right = spark.createDataFrame([(1,)], "x int")
    assert sorted(r.x for r in left.exceptAll(right).collect()) == [1, 2]


def test_clamped_balance_floors_at_zero_and_recovers(spark):
    """The clamp must bind mid-sequence: a debit below zero floors at
    0 and later credits build from 0, not from the negative — the
    exact behavior a plain windowed SUM (min-clamped at the end)
    would get wrong."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from impala_refresher_spark.operators.analytics import clamped_running_balance

    # user 1: +5.00, -20.00 (floors to 0), +3.00 -> 3.00 final.
    # an end-clamped sum would give max(0, -12.00) = 0 -> wrong.
    t = lambda m: datetime(2024, 1, 1) + timedelta(minutes=m)
    rows = [
        (1, t(0), 1, "purchase", 5.0, "{}"),
        (2, t(1), 1, "error", 20.0, "{}"),
        (3, t(2), 1, "purchase", 3.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r.user_id: r for r in clamped_running_balance(spark, d).collect()}
    assert out[1].balance_cents == 300
    assert out[1].n_txns == 3


def test_pareto_keeps_duplicate_optimal_points(spark):
    """Two parts with identical (price, size) on the frontier are
    mutually non-dominating (no strict inequality) — BOTH must
    survive; collapsing duplicates would under-report the frontier."""
    from impala_refresher_spark.operators.analytics import pareto_frontier_parts

    rows = [
        (1, "a", "B", "T", 10, 100.0),
        (2, "b", "B", "T", 10, 100.0),  # duplicate optimal point
        (3, "c", "B", "T", 5, 100.0),   # same price, smaller -> dominated
        (4, "d", "B", "T", 12, 200.0),  # bigger but pricier -> frontier
    ]
    df = spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    )
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(f"{d}/part.parquet")
    keys = {r.p_partkey for r in pareto_frontier_parts(spark, d).collect()}
    assert keys == {1, 2, 4}


def test_km_survival_zero_factor_cutover(spark, tmp_path):
    """Kaplan-Meier degenerate factor (ADVICE r03): when d == n at a
    duration — here the longest-surviving user churned, so the final
    risk set is exactly the deaths — survival must be EXACTLY 0.0 from
    that point, on BOTH engines. Unguarded, Spark's F.log(0) -> NULL
    silently vanishes from the SUM (survival stays positive — wrong)
    while DuckDB's LN(0) errors; this pins the guarded cutover and the
    Spark/oracle agreement on a manufactured d == n input the fixture
    may never produce."""
    import sys

    from impala_refresher_spark.operators.evaluation import survival_user_retention
    from impala_refresher_spark.registry import ORACLES

    sys.path.insert(0, "tests")
    from oracle_util import compare

    from datetime import timedelta

    def ev(eid, day, uid):
        return (eid, datetime(2024, 1, 1) + timedelta(days=day), uid, "click", 1.0, "{}")

    rows = [
        # user 10: single event at corpus end -> duration 0, censored
        ev(1, 40, 10),
        # user 20: span 30 days, last seen day 30 -> churned; risk set
        # at t=30 is only user 20 => d == n == 1 (the zero factor)
        ev(2, 0, 20), ev(3, 30, 20),
        # user 30: span 10 days, churned -> ordinary factor 1 - 1/2
        ev(4, 0, 30), ev(5, 10, 30),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(f"{d}/events.parquet")

    out = {r["t"]: r for r in survival_user_retention(spark, d).collect()}
    assert out[10]["survival"] == 0.5 and out[10]["n"] == 2
    assert out[30]["d"] == 1 and out[30]["n"] == 1
    assert out[30]["survival"] == 0.0  # cutover, not NULL / not 0.5
    # and the DuckDB oracle agrees on the same degenerate input
    # (register just the events view; the tmpdir has no other tables)
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet/*.parquet')"
    )
    compare(survival_user_retention(spark, d), con, ORACLES["survival_user_retention"])


def test_zscore_zero_variance_group_yields_no_rows_not_error(spark, tmp_path):
    """Division-by-zero discipline (r04 sweep): ANSI Spark ERRORS on
    double x/0 while DuckDB 1.0 yields NULL, so every data-dependent
    denominator (stddev, class counts, variance terms, 1-pe, k-1) is
    guarded with try_divide. This pins the canonical case: a segment
    whose prices are all identical has stddev 0.0 — the z-score must
    come back NULL (row filtered) on BOTH engines, never raise."""
    from impala_refresher_spark.operators.analytics import outlier_orders_zscore
    from impala_refresher_spark.registry import ORACLES

    d = str(tmp_path)
    # segment A: constant price (sd = 0); segment B: varied prices
    orders = [(i, 100 + i % 3, 50.0 if i < 6 else float(10 * i), "O") for i in range(12)]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double, o_orderstatus string"
    ).coalesce(1).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(100, "CONST"), (101, "CONST"), (102, "VAR")],
        "c_custkey long, c_mktsegment string",
    ).coalesce(1).write.parquet(f"{d}/customer.parquet")

    rows = outlier_orders_zscore(spark, d).collect()  # must not raise
    # no order from a zero-variance group can be flagged
    assert all(r.o_custkey == 102 or r.zscore is not None for r in rows)
    import duckdb

    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet/*.parquet')"
        )
    import sys

    sys.path.insert(0, "tests")
    from oracle_util import compare

    compare(outlier_orders_zscore(spark, d), con, ORACLES["outlier_orders_zscore"])


def test_char_entropy_degenerate_texts(spark, tmp_path):
    """Empty and single-symbol texts sit outside the fixture's 44+-char
    floor, and they are exactly where the engines could split: Spark's
    split('', '') and DuckDB's string_split('', '') BOTH yield [''] (one
    empty element, n=1), so entropy is 0.0 — but only measurement proves
    it. Pin the parity plus the hand-computable values (uniform text ->
    0.0, two balanced symbols -> 1.0 bit)."""
    import duckdb

    from impala_refresher_spark.operators.text import quality_char_entropy
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare

    d = str(tmp_path)
    docs = [
        (1, "", "en", "web", 0),
        (2, "aaaa", "en", "web", 4),
        (3, "abab", "en", "web", 4),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")

    got = {r.doc_id: r.char_entropy for r in quality_char_entropy(spark, d).collect()}
    assert got == {1: 0.0, 2: 0.0, 3: 1.0}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    compare(quality_char_entropy(spark, d), con, ORACLES["quality_char_entropy"])


def test_int8_quantize_zero_vector_excluded(spark, tmp_path):
    """An all-zero embedding has max|x| = 0: the scale divide would be
    0/0 (ANSI error on Spark, NULL on DuckDB) — both sides must filter
    it BEFORE the divide, and the surviving codes must be exact."""
    import duckdb

    from impala_refresher_spark.operators.similarity import (
        embed_int8_quantize,
        int8_quantize_vectors,
    )
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare

    d = str(tmp_path)
    spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0], 0), (2, [1.5, -3.0, 0.75], 1)],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.parquet(f"{d}/embeddings.parquet")

    rows = int8_quantize_vectors(spark, d).collect()
    assert [r.vec_id for r in rows] == [2]  # zero vector filtered, no error
    assert rows[0].q == [64, -127, 32]  # round(x/3.0*127)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet/*.parquet')"
    )
    # declared (exploded, scalar-only) form against the zipped-UNNEST oracle
    compare(embed_int8_quantize(spark, d), con, ORACLES["embed_int8_quantize"])


def test_nearest_event_same_ts_clicks_pick_min_id(spark, tmp_path):
    """Two clicks at the IDENTICAL timestamp (plausible in second-grain
    logs; fixture ts are µs-unique) must resolve to the smallest
    click_id on both engines — the backward running-last needs event_id
    DESC in its window order to agree with the oracle's ORDER BY cid."""
    import duckdb
    from datetime import datetime

    from impala_refresher_spark.operators.asof import nearest_event_join
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    d = str(tmp_path)
    events = [
        # user 1: two clicks share ts=8 (before), expect click_id 100
        (100, t(8), 1, "click", 0.0, "{}"),
        (101, t(8), 1, "click", 0.0, "{}"),
        (300, t(10), 1, "purchase", 9.9, "{}"),
        # user 2: two clicks share ts=12 (after), expect click_id 200
        (201, t(12), 2, "click", 0.0, "{}"),
        (200, t(12), 2, "click", 0.0, "{}"),
        (301, t(10), 2, "purchase", 9.9, "{}"),
        # user 3: equidistant before/after -> prefer the EARLIER click
        (400, t(7), 3, "click", 0.0, "{}"),
        (401, t(13), 3, "click", 0.0, "{}"),
        (302, t(10), 3, "purchase", 9.9, "{}"),
    ]
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(f"{d}/events.parquet")

    out = nearest_event_join(spark, d)
    got = {r.purchase_id: r.click_id for r in out.collect()}
    assert got == {300: 100, 301: 200, 302: 400}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet/*.parquet')"
    )
    compare(out, con, ORACLES["nearest_event_join"])


def test_zero_norm_embedding_cosine_family_matches_oracle(spark, tmp_path):
    """An all-zero embedding has no direction: its cosine against
    anything is NULL (DuckDB's x/0.0), NOT an ANSI divide-by-zero
    crash (what unguarded Spark did — the `time_weighted_avg_value`
    guard-gap class, found by injecting a zero vector). Both engines
    must rank the NULL sims last / fail thresholds with them, so every
    cosine-family query returns identical rows with the zero vector
    present — including the degenerate corpus whose QUERY vector
    (vec_id 0) is itself zero."""
    import duckdb

    from impala_refresher_spark.operators.dedup import dedup_embedding_cosine
    from impala_refresher_spark.operators.similarity import (
        cosine_similarity_join,
        cosine_topk,
        knn_join_topk,
    )
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare

    def base_vec(seed: int) -> list:
        # exact-quarter floats: float32 -> double conversion is lossless
        return [((seed * (i + 3)) % 9 - 4) / 4.0 for i in range(64)]

    d = str(tmp_path / "main")
    vecs = [(i, base_vec(i + 1), i % 2) for i in range(6)]
    vecs.append((6, vecs[4][1], 0))  # near-twin of vec 4 -> a real pair
    vecs.append((7, [0.0] * 64, 0))  # the zero vector
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{d}/embeddings.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet/*.parquet')"
    )
    for q in (cosine_topk, cosine_similarity_join, knn_join_topk, dedup_embedding_cosine):
        compare(q(spark, d), con, ORACLES[q.__name__])

    # degenerate corpus: the QUERY vector itself is zero -> every sim is
    # NULL and the top-k falls back to the vec_id tiebreak on both sides
    d0 = str(tmp_path / "zeroq")
    vecs0 = [(0, [0.0] * 64, 0)] + [(i, base_vec(i), i % 2) for i in range(1, 4)]
    spark.createDataFrame(
        vecs0, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{d0}/embeddings.parquet")
    con0 = duckdb.connect()
    con0.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d0}/embeddings.parquet/*.parquet')"
    )
    out = cosine_topk(spark, d0)
    assert [r.cos_sim for r in out.collect()] == [None, None, None]
    compare(out, con0, ORACLES["cosine_topk"])


def test_zero_total_revenue_ratios_null_not_error(spark, tmp_path):
    """Division-by-zero discipline, ratio-of-TOTAL class: a corpus whose
    every price is 0.0 zeroes the grand-total denominator in the Gini/
    Lorenz report, the HHI market-concentration report, and the
    percent-of-total revenue share — ANSI Spark errors on the double /0
    where DuckDB yields NULL. All three are try_divide-guarded so the
    degenerate corpus answers NULL identically on both engines (found by
    the same sweep as the kappa empty-marginal COALESCE)."""
    import duckdb

    from impala_refresher_spark.operators.analytics import (
        hhi_supplier_concentration,
        revenue_concentration_gini,
        revenue_share_by_nation,
    )
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare

    d = str(tmp_path)
    spark.createDataFrame(
        [(i, 100 + i % 3, 0.0, "O") for i in range(9)],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderstatus string",
    ).coalesce(1).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(100, 0), (101, 0), (102, 1)],
        "c_custkey long, c_nationkey int",
    ).coalesce(1).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [(0, "ALPHA"), (1, "BETA")], "n_nationkey int, n_name string"
    ).coalesce(1).write.parquet(f"{d}/nation.parquet")
    spark.createDataFrame(
        [(i, 200 + i % 2, 0.0) for i in range(8)],
        "l_orderkey long, l_suppkey long, l_extendedprice double",
    ).coalesce(1).write.parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame(
        [(200, 0), (201, 1)], "s_suppkey long, s_nationkey int"
    ).coalesce(1).write.parquet(f"{d}/supplier.parquet")

    con = duckdb.connect()
    for t in ("orders", "customer", "nation", "lineitem", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet/*.parquet')"
        )

    gini = revenue_concentration_gini(spark, d)
    assert all(r.gini is None and r.lorenz_cum_share is None for r in gini.collect())
    compare(gini, con, ORACLES["revenue_concentration_gini"])

    hhi = hhi_supplier_concentration(spark, d)
    assert all(r.hhi is None for r in hhi.collect())
    compare(hhi, con, ORACLES["hhi_supplier_concentration"])

    share = revenue_share_by_nation(spark, d)
    assert all(r.share is None for r in share.collect())
    compare(share, con, ORACLES["revenue_share_by_nation"])


def test_pivot_unpivot_null_edges_match_oracle(spark, tmp_path):
    """Pivot/unpivot NULL semantics pinned cross-engine: DataFrame
    .unpivot RETAINS null values (like the oracle's UNION ALL — SQL
    UNPIVOT would drop them); pivot cells for absent (priority, status)
    combinations coalesce to 0.00 on both engines; NULL grouping keys
    and NULL pivot-column values survive as ordinary groups / are
    excluded from every listed pivot value identically."""
    import duckdb

    from impala_refresher_spark.operators.relational import agg_pivot, unpivot_metrics
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare

    d = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "1-URGENT", "F", 10.5),
            (2, "1-URGENT", None, 20.0),   # NULL pivot value: in no column
            (3, None, "O", 7.25),          # NULL grouping key
            (4, "2-HIGH", "P", 0.0),
        ],
        "o_orderkey long, o_orderpriority string, o_orderstatus string, o_totalprice double",
    ).coalesce(1).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(1, None, 3), (2, 5.5, 4)],
        "c_custkey long, c_acctbal double, c_nationkey int",
    ).coalesce(1).write.parquet(f"{d}/customer.parquet")

    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet/*.parquet')"
        )

    piv = agg_pivot(spark, d)
    rows = {r.o_orderpriority: (r.f_total, r.o_total, r.p_total) for r in piv.collect()}
    assert rows["1-URGENT"] == (10.5, 0.0, 0.0)  # NULL status in no bucket
    assert rows[None] == (0.0, 7.25, 0.0)
    compare(piv, con, ORACLES["agg_pivot"])

    unp = unpivot_metrics(spark, d)
    assert sum(1 for r in unp.collect() if r.val is None) == 1  # retained
    compare(unp, con, ORACLES["unpivot_metrics"])


def test_rollup_grouping_sets_null_values_match_oracle(spark, tmp_path):
    """ROLLUP and GROUPING SETS over columns that themselves hold NULL:
    the aggregated-out marker and genuine NULL group values must
    coexist identically on both engines (the CUBE case is property-
    tested; rollup/sets share the Expand but different enumerations)."""
    import duckdb

    from impala_refresher_spark.operators.relational import (
        agg_grouping_sets,
        agg_rollup,
    )
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare

    d = str(tmp_path)
    spark.createDataFrame(
        [
            ("R", None, 1.5, 10.0),
            (None, "O", 2.0, 20.0),
            (None, None, 3.25, 30.0),
            ("R", "F", 4.0, 40.0),
        ],
        "l_returnflag string, l_linestatus string, l_quantity double, l_extendedprice double",
    ).coalesce(1).write.parquet(f"{d}/lineitem.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet/*.parquet')"
    )
    compare(agg_rollup(spark, d), con, ORACLES["agg_rollup"])
    compare(agg_grouping_sets(spark, d), con, ORACLES["agg_grouping_sets"])


def test_csv_roundtrip_embedded_newlines_lossless(spark, tmp_path):
    """CSV sink round-trip with embedded newlines, quotes, and commas
    in string fields: the writer quotes them; the multiLine reader must
    restore every row byte-identically (the default reader shreds a
    quoted newline into two mangled rows — measured)."""
    import duckdb

    from impala_refresher_spark.registry import ORACLES
    from impala_refresher_spark.sources.sinks import sink_csv_roundtrip
    from oracle_util import compare

    d = str(tmp_path)
    rows = [
        (1, "alice\nbob", "SEG,A", 10.5),
        (2, 'quote "x" name', "SEG\nB", -3.0),  # negative: filtered out
        (3, "plain", "SEGC", 0.0),
    ]
    spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_mktsegment string, c_acctbal double"
    ).coalesce(1).write.parquet(f"{d}/customer.parquet")

    out = sink_csv_roundtrip(spark, d)
    got = sorted(tuple(r) for r in out.collect())
    assert got == [
        (1, "alice\nbob", "SEG,A", 10.5),
        (3, "plain", "SEGC", 0.0),
    ]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{d}/customer.parquet/*.parquet')"
    )
    compare(out, con, ORACLES["sink_csv_roundtrip"])


def test_join_family_null_keys_match_oracle(spark, tmp_path):
    """Every join shape over NULL join keys on BOTH sides: inner drops
    them, left/right/full preserve them unmatched, semi never matches
    them, anti KEEPS them (NOT EXISTS over a NULL key is no-match) —
    pinned cross-engine."""
    import duckdb

    from impala_refresher_spark.operators.relational import (
        join_anti,
        join_full_outer,
        join_inner,
        join_left_outer,
        join_right_outer,
        join_semi,
    )
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare

    d = str(tmp_path)
    spark.createDataFrame(
        [
            (1, 10, "F", 200000.0),
            (2, None, "F", 150000.0),   # NULL key, passes filters
            (3, 11, "O", 50000.0),
            (4, None, "O", 99.0),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
    ).coalesce(1).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(10, "C10", "SEG"), (None, "CNULL", "SEG"), (12, "C12", "SEG")],
        "c_custkey long, c_name string, c_mktsegment string",
    ).coalesce(1).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [(0, "N0"), (None, "NNULL"), (2, "N2")], "n_nationkey long, n_name string"
    ).coalesce(1).write.parquet(f"{d}/nation.parquet")
    spark.createDataFrame(
        [(100, "S100", 0), (101, "S101", None), (102, "S102", 7)],
        "s_suppkey long, s_name string, s_nationkey long",
    ).coalesce(1).write.parquet(f"{d}/supplier.parquet")

    con = duckdb.connect()
    for t in ("orders", "customer", "nation", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet/*.parquet')"
        )

    for q in (join_inner, join_left_outer, join_right_outer, join_full_outer,
              join_semi, join_anti):
        compare(q(spark, d), con, ORACLES[q.__name__])
    # the NULL-keyed never-ordered customer survives the anti join
    assert {r.c_name for r in join_anti(spark, d).collect()} == {"CNULL", "C12"}


def test_date_functions_boundary_dates_match_oracle(spark, tmp_path):
    """Date dialect parity on calendar boundaries: leap day, Dec-31/
    Jan-1, and a week-truncation anchor crossing the year boundary —
    fn_dates and the week-cohort rollup against the oracle."""
    import duckdb
    from datetime import datetime

    from impala_refresher_spark.functions.scalar import fn_dates
    from impala_refresher_spark.operators.analytics import cohort_retention
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare
    import impala_refresher_spark.functions.scalar as sc

    d = str(tmp_path)
    dates = [
        datetime(1996, 2, 29),   # leap day
        datetime(1995, 12, 31),
        datetime(1996, 1, 1),    # week of Jan 1 truncates into 1995
        datetime(1996, 3, 1),
        datetime(2000, 2, 29),   # century leap
    ]
    spark.createDataFrame(
        [(i, ts) for i, ts in enumerate(dates)], "o_orderkey long, o_orderdate timestamp"
    ).coalesce(1).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(i, i % 2, ts, "purchase", 1.0) for i, ts in enumerate(dates)],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    ).coalesce(1).write.parquet(f"{d}/events.parquet")

    con = duckdb.connect()
    for t in ("orders", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet/*.parquet')"
        )
    compare(fn_dates(spark, d), con, ORACLES["fn_dates"])
    compare(cohort_retention(spark, d), con, ORACLES["cohort_retention"])


def test_unicode_text_hashing_and_lengths_match_oracle(spark, tmp_path):
    """Multi-byte text parity: md5 must hash identical UTF-8 bytes on
    both engines, length() must count CHARACTERS not bytes, splitting
    and entropy must agree on non-ASCII tokens — pinned through the
    fingerprint, regex token count, char entropy, and exact-dedup ops."""
    import duckdb

    from impala_refresher_spark.operators.dedup import dedup_exact_hash
    from impala_refresher_spark.operators.text import (
        doc_fingerprint,
        quality_char_entropy,
        token_count_regex,
    )
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare

    d = str(tmp_path)
    docs = [
        (1, "héllo wörld", "de", "web", 11),
        (2, "naïve café déjà vu", "fr", "web", 18),
        (3, "日本語 テスト", "ja", "web", 7),
        (4, "héllo wörld", "de", "api", 11),   # exact dup of 1
        (5, "emoji 🎉 mix", "en", "web", 11),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    for q in (doc_fingerprint, token_count_regex, quality_char_entropy, dedup_exact_hash):
        compare(q(spark, d), con, ORACLES[q.__name__])


def test_fn_math_negative_price_log_domain_matches_oracle(spark, tmp_path):
    """ln() domain guard: a credit-priced part (retailprice <= -1)
    makes the log argument non-positive — NULL in Spark but an ERROR
    in DuckDB unless gated; negative keys also pin the pmod-vs-%%
    sign convention."""
    import duckdb

    from impala_refresher_spark.functions.scalar import fn_math
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare

    d = str(tmp_path)
    spark.createDataFrame(
        [(-3, -5.0, 2), (1, -1.0, 3), (2, 0.0, 4), (3, 12.5, 5)],
        "p_partkey long, p_retailprice double, p_size int",
    ).coalesce(1).write.parquet(f"{d}/part.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM read_parquet('{d}/part.parquet/*.parquet')"
    )
    out = fn_math(spark, d)
    got = {r.p_partkey: (r.log_price, r.bucket) for r in out.collect()}
    assert got[-3][0] is None and got[1][0] is None  # gated domain
    assert got[-3][1] == 4  # pmod(-3, 7) = ((-3 % 7) + 7) % 7 = 4
    compare(out, con, ORACLES["fn_math"])


def test_scale2_round_diverges_and_scale0_cents_round_agrees(spark):
    """Pins the r05 scale-0 money-rounding discipline by demonstrating
    the underlying engine divergence: ROUND(double, 2) at a
    representability-boundary half-cent tie rounds a cent APART on
    identical doubles (Spark rounds the shortest-decimal repr via
    BigDecimal.valueOf; DuckDB rounds the exact binary value), while
    the scale-0 form ROUND(cents)/100 agrees because k.5 cents is
    exactly representable and both engines round it half-away.

    If this test ever fails, either engine changed its double-rounding
    semantics — re-audit every ROUND site before trusting the sweep.
    Discipline users: subsample_ci_revenue, agg_percentiles,
    histogram_equidepth, rolling_7day_revenue, tpch_q9."""
    import duckdb

    # 61394107 cents / 2 = 30697053.5 cents = 306970.535 dollars; the
    # dollars double is 306970.53499999997...
    x = 61394107 / 2 / 100

    spark_scale2 = spark.sql(f"SELECT ROUND(CAST({x!r} AS DOUBLE), 2) AS v").collect()[0].v
    duck_scale2 = duckdb.sql(f"SELECT ROUND(CAST({x!r} AS DOUBLE), 2) AS v").fetchone()[0]
    assert spark_scale2 == 306970.54  # shortest repr "306970.535" HALF_UP
    assert duck_scale2 == 306970.53  # exact binary value is below the tie
    assert spark_scale2 != duck_scale2  # the trap scale-2 rounding sets

    s0 = "SELECT ROUND(CAST(61394107 AS DOUBLE) / 2) / 100 AS v"
    spark_scale0 = spark.sql(s0).collect()[0].v
    duck_scale0 = duckdb.sql(s0).fetchone()[0]
    assert spark_scale0 == duck_scale0 == 306970.54


def test_chunk_sliding_boundary_docs_match_oracle(spark, tmp_path):
    """Chunk-count boundaries: a doc of exactly W tokens is ONE chunk;
    W + k*S tokens fit exactly (last chunk full); one token past adds a
    short chunk; a single-token doc is one 1-token chunk. Differential
    proves Spark slice(start, W) and DuckDB l[a:b] clamp identically."""
    import duckdb

    from impala_refresher_spark.operators.text import (
        _CHUNK_S,
        _CHUNK_W,
        text_chunk_sliding,
    )
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare

    d = str(tmp_path)
    W, S = _CHUNK_W, _CHUNK_S
    sizes = [1, W - 1, W, W + 1, W + S, W + S + 1, W + 2 * S, 3 * W]
    rows = [(i + 1, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(sizes)]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        f"{d}/documents.parquet"
    )

    out = text_chunk_sliding(spark, d)
    per_doc = {
        r.doc_id: r.n for r in out.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()
    }
    import math

    for (doc_id, text), n in zip(rows, sizes):
        assert per_doc[doc_id] == 1 + math.ceil(max(0, n - W) / S), (doc_id, n)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    compare(out, con, ORACLES["text_chunk_sliding"])


def test_rrf_fusion_one_sided_candidates_match_oracle(spark, tmp_path):
    """RRF membership edges: a doc with BM25 hits but NO embedding row
    appears lexical-only (dense_rank NULL, single-term score); an
    embedding whose doc has no query-term hits appears dense-only; a
    BM25 TIE (identical texts) must break by doc_id identically on both
    engines. Differential on a corpus built to hit all three."""
    import duckdb

    from impala_refresher_spark.operators.text import retrieval_rrf_fusion
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare

    d = str(tmp_path)
    docs = [
        (0, "the query vector doc"),          # vec_id 0 = query, excluded from dense
        (1, "customer table fast customer"),  # strong lexical, HAS embedding
        (2, "customer table fast customer"),  # identical text -> bm25 tie with 1
        (3, "customer fast"),                 # lexical, NO embedding row
        (4, "nothing relevant here at all"),  # no hits, HAS embedding (dense-only)
        (5, "table"),                         # weak lexical, HAS embedding
    ]
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.parquet(
        f"{d}/documents.parquet"
    )
    embs = [
        (0, [1.0, 0.0, 0.5, 0.25], 0),
        (1, [1.0, 0.0, 0.5, 0.25], 0),   # identical to query -> sim 1.0
        (2, [0.0, 1.0, 0.0, 0.0], 1),
        (4, [0.5, 0.5, 0.5, 0.5], 1),
        (5, [-1.0, 0.0, -0.5, -0.25], 1),  # anti-parallel -> sim -1
    ]
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{d}/embeddings.parquet")

    out = retrieval_rrf_fusion(spark, d)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[3].dense_rank is None and rows[3].lex_rank is not None
    assert rows[4].lex_rank is None and rows[4].dense_rank is not None
    assert rows[1].lex_rank < rows[2].lex_rank  # bm25 tie -> doc_id order
    assert 0 not in rows  # the query vector's own doc has no hits/candidacy

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet/*.parquet')"
        )
    compare(out, con, ORACLES["retrieval_rrf_fusion"])


def test_new_dedup_family_degenerate_docs(spark, tmp_path):
    """NULL text, empty text, and sub-shingle docs sit outside the
    fixture's 44+-token floor — run the r06 dedup additions (winnowing,
    incremental LSH, quote containment) against their oracles on a
    corpus full of them, plus hand-pinned structure: identical 3-token
    docs share ONE winnowing fingerprint (below the >=2 pair
    threshold), the near-dup batch doc resolves its argmax TIE to the
    smaller corpus id, and a snippet of an exactly-duplicated doc is
    contained in both copies at 1.0."""
    import duckdb

    from impala_refresher_spark.operators.dedup import (
        dedup_minhash_incremental,
        fingerprint_winnowing,
        quote_containment_join,
    )
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare

    d = str(tmp_path)
    doc_a = " ".join(f"t{i}" for i in range(1, 21))       # 20 tokens
    doc_b = " ".join(f"t{i}" for i in range(1, 20)) + " zz"  # near-dup of A
    docs = [
        (0, None),        # batch + snippet source: NULL text
        (7, "a b"),       # 2 tokens: no shingles anywhere
        (10, "x y z"),    # batch: exactly one gram / one fingerprint
        (14, "x y z"),    # corpus + snippet source: exact dup of 10
        (3, doc_a),       # corpus
        (21, doc_a),      # corpus + snippet source: exact dup of 3
        (30, doc_b),      # batch: near-dup of BOTH 3 and 21 (tie)
        (35, ""),         # snippet source: empty text
    ]
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.parquet(
        f"{d}/documents.parquet"
    )

    win = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in fingerprint_winnowing(spark, d).collect()
    }
    # identical 20-token docs pair up; the single-fingerprint pair
    # (10, 14) stays below the >=2 threshold
    assert (3, 21) in win and win[(3, 21)] >= 2
    assert (10, 14) not in win

    inc = {
        r.doc_id: (r.dup_of, r.jaccard)
        for r in dedup_minhash_incremental(spark, d).collect()
    }
    assert inc[10] == (14, 1.0)
    # 30 matches 3 and 21 with the SAME jaccard: tie resolves low
    assert inc[30][0] == 3
    assert inc[30][1] < 1.0

    quo = {
        (r.snip_id, r.doc_id): r.containment
        for r in quote_containment_join(spark, d).collect()
    }
    # snippet of the duplicated doc is fully contained in BOTH copies
    assert quo[(21, 3)] == 1.0 and quo[(21, 21)] == 1.0
    assert quo[(14, 10)] == 1.0 and quo[(14, 14)] == 1.0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    for fn, name in (
        (fingerprint_winnowing, "fingerprint_winnowing"),
        (dedup_minhash_incremental, "dedup_minhash_incremental"),
        (quote_containment_join, "quote_containment_join"),
    ):
        compare(fn(spark, d), con, ORACLES[name])


def test_fn_json_adversarial_props(spark, tmp_path):
    """Fixture props are always valid {"k": <int>} — adversarial JSON
    is where the engines split: DuckDB's json functions RAISE on
    malformed input where get_json_object NULLs, and DuckDB's
    JSON→INTEGER cast coerces quoted/float/bool values ("12"→12,
    2.7→3, true→1) where Spark's from_json(k INT) is type-strict
    (NULL for all three). The r06-hardened oracle (json_valid guard +
    json_type gate) must match Spark on every class."""
    import duckdb

    from impala_refresher_spark.functions.scalar import fn_json
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare

    d = str(tmp_path)
    rows = [
        (1, '{"k": 5}'),
        (2, '{"k": "12"}'),     # quoted number: typed parse NULLs
        (3, '{"k": "abc"}'),
        (4, '{"k": null}'),
        (5, '{"k": {"nested": 1}}'),
        (6, '{"k": [1,2]}'),
        (7, 'not json at all'),  # DuckDB raises without json_valid
        (8, None),
        (9, ''),
        (10, '{"K": 1}'),        # path is case-sensitive on both
        (11, '{"k": 2.7}'),      # DOUBLE: strict INT parse NULLs
        (12, '{"k": true}'),     # BOOLEAN: strict INT parse NULLs
        (13, '{"k": "é中"}'),
        (14, '{"k": -7}'),
    ]
    spark.createDataFrame(rows, "event_id long, props string").coalesce(1).write.parquet(
        f"{d}/events.parquet"
    )
    got = {r.event_id: (r.k_str, r.k_int, r.absent) for r in fn_json(spark, d).collect()}
    assert got[1] == ("5", 5, None)
    assert got[2] == ("12", None, None)
    assert got[7] == (None, None, None)
    assert got[11] == ("2.7", None, None)
    assert got[12] == ("true", None, None)
    assert got[14] == ("-7", -7, None)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet/*.parquet')"
    )
    compare(fn_json(spark, d), con, ORACLES["fn_json"])


def test_fn_variant_shred_adversarial_props(spark, tmp_path):
    """VARIANT shredding on JSON the fixtures never produce: malformed
    docs (parse_json would CRASH the job; try_parse_json NULLs),
    doubles (Spark's variant int cast TRUNCATES toward zero where
    DuckDB's plain JSON cast ROUNDS — 2.7 -> 2 vs 3), quoted integral
    strings (coerced), non-integral strings / overflow / arrays /
    objects (try_variant_get NULLs where the non-try form raises).
    The oracle's per-json_type coercion table must match Spark on
    every class."""
    import duckdb

    from impala_refresher_spark.functions.scalar import fn_variant_shred
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare

    d = str(tmp_path)
    rows = [
        (1, "a", '{"k": 5}'),
        (2, "a", '{"k": "12"}'),
        (3, "a", '{"k": 2.7}'),
        (4, "b", '{"k": -2.7}'),
        (5, "b", '{"k": true}'),
        (6, "b", '{"k": false}'),
        (7, "c", '{"k": "abc"}'),
        (8, "c", '{"k": "2.9"}'),
        (9, "c", '{"k": null}'),
        (10, "c", '{"k": 99999999999}'),
        (11, "d", '{"k": [1]}'),
        (12, "d", '{"k": {"a": 1}}'),
        (13, "d", "not json at all"),
        (14, "d", None),
        (15, "d", '{"missing": "present!"}'),
        (16, "e", '{"k": "+12"}'),   # signed/padded integral strings
        (17, "e", '{"k": "007"}'),   # parse on BOTH engines
        (18, "e", '{"k": "1e3"}'),   # scientific: Spark NULL, regex-gated
    ]
    spark.createDataFrame(
        rows, "event_id long, event_type string, props string"
    ).coalesce(1).write.parquet(f"{d}/events.parquet")

    got = {
        r.event_type: (r.sum_k, r.max_k, r.n_missing, r.n)
        for r in fn_variant_shred(spark, d).collect()
    }
    assert got["a"] == (5 + 12 + 2, 12, 3, 3)
    assert got["b"] == (-2 + 1 + 0, 1, 3, 3)
    assert got["c"] == (None, None, 4, 4)
    assert got["d"] == (None, None, 4, 5)  # row 15 has the path
    assert got["e"] == (12 + 7, 12, 3, 3)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet/*.parquet')"
    )
    compare(fn_variant_shred(spark, d), con, ORACLES["fn_variant_shred"])


def test_levenshtein_unicode_dialect_limitation(spark, tmp_path):
    """Spark's levenshtein counts CODEPOINT edits; DuckDB 1.x's is
    BYTE-based ('é' vs 'e': 1 vs 2; '中文' vs '中': 1 vs 3). The
    fixtures are ASCII so the fuzzy-join differential never sees it —
    pin (a) exact oracle parity on an adversarial ASCII vocabulary
    (ties, block edges, the distance-3 boundary) and (b) the ENGINE's
    codepoint semantics on non-ASCII names with hand-computed values,
    documenting that only the DuckDB side is byte-limited (see the
    linkage module docstring)."""
    import duckdb

    from impala_refresher_spark.operators.linkage import fuzzy_join_part_names
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare
    from pyspark.sql import functions as F

    d = str(tmp_path)
    names = [
        "small brass widget", "smell brass widget",   # dist 1, same block
        "smalle brass widget",                        # insert, dist 1/2
        "tiny brass widget",                          # dist 4+ to small: cut
        "small brass gadget",                         # different block
        "x widget",                                   # short, same block
    ]
    spark.createDataFrame([(n,) for n in names], "p_name string").coalesce(1).write.parquet(
        f"{d}/part.parquet"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM read_parquet('{d}/part.parquet/*.parquet')"
    )
    compare(fuzzy_join_part_names(spark, d), con, ORACLES["fuzzy_join_part_names"])

    # engine-side codepoint semantics on non-ASCII (no oracle compare)
    uni = spark.createDataFrame(
        [("café widget", "cafe widget"), ("中文 widget", "中 widget")],
        "a string, b string",
    )
    got = [r.d for r in uni.select(F.levenshtein("a", "b").alias("d")).collect()]
    assert got == [1, 1]


def test_fn_strings_ascii_parity_and_case_mapping_limitation(spark, tmp_path):
    """fn_strings vs its oracle on adversarial-but-ASCII documents
    (empty text, 1-char, whitespace runs, regex-special chars) — plus
    the documented exotic-case-mapping divergence (scalar.py module
    docstring): Spark upper('ß') = 'SS' (Java full case mapping) where
    DuckDB yields 'ẞ', so the oracle contract holds for ASCII and
    plain-accent text ('café' ↔ 'CAFÉ' agrees) while exotic locale
    forms keep engine semantics."""
    import duckdb

    from impala_refresher_spark.functions.scalar import fn_strings
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare
    from pyspark.sql import functions as F

    d = str(tmp_path)
    docs = [
        (1, "", "en", "web"),
        (2, "x", "EN", "web"),
        (3, "   spaced   out   ", "En", "books"),
        (4, "a.b*c(d)e|f", "fr", "web"),
        (5, "café au lait", "FR", "books"),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    compare(fn_strings(spark, d), con, ORACLES["fn_strings"])

    # the documented divergence class, engine side (no oracle compare)
    got = spark.createDataFrame([("ß",)], "s string").select(
        F.upper("s").alias("u")
    ).first()
    assert got.u == "SS"
    assert con.execute("SELECT upper('ß')").fetchone()[0] == "ẞ"


def test_span_removal_interval_union_hand_values(spark, tmp_path):
    """Coverage must be the interval UNION, not a per-gram sum: a doc
    fully duplicated elsewhere has ratio 1.0 even though its 3
    overlapping dup grams would naively sum to 24 of 10 tokens; a doc
    sharing exactly one 8-gram counts exactly 8 covered tokens; short
    (<8 tokens) and unique docs count 0."""
    import duckdb

    from impala_refresher_spark.operators.dedup import dedup_span_removal
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare

    d = str(tmp_path)
    shared = " ".join(f"t{i}" for i in range(10))  # t0..t9
    partial = "x1 x2 " + " ".join(f"t{i}" for i in range(8)) + " x3 x4"
    docs = [
        (1, shared, "en", "web", len(shared)),
        (2, shared, "en", "web", len(shared)),
        (3, " ".join(f"u{i}" for i in range(10)), "en", "web", 29),
        (4, partial, "en", "web", len(partial)),
        (5, "a b c d e", "en", "web", 9),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")

    got = {
        r.doc_id: (r.n_tokens, r.n_dup_tokens, r.dup_ratio)
        for r in dedup_span_removal(spark, d).collect()
    }
    assert got[1] == (10, 10, 1.0)
    assert got[2] == (10, 10, 1.0)
    assert got[3] == (10, 0, 0.0)
    assert got[4] == (12, 8, 0.6667)
    assert got[5] == (5, 0, 0.0)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    compare(dedup_span_removal(spark, d), con, ORACLES["dedup_span_removal"])


def test_random_projection_basis_and_zero_vectors(spark, tmp_path):
    """A basis vector e_0 projects to exactly sign(j, 0)/4 in every
    output dim (the sign matrix is deterministic md5, so the expected
    values are computable in the test); the zero vector projects to
    exactly zero; every vector emits exactly _RP_K rows."""
    import duckdb

    from impala_refresher_spark.operators.similarity import (
        _RP_K,
        _rp_sign,
        embed_random_projection,
    )
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare

    d = str(tmp_path)
    basis = [1.0] + [0.0] * 63
    rows = [(1, basis, 0), (2, [0.0] * 64, 1)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{d}/embeddings.parquet")

    out = embed_random_projection(spark, d).collect()
    assert len(out) == 2 * _RP_K
    got = {(r.vec_id, r.pos): r.proj_val for r in out}
    for j in range(_RP_K):
        assert got[(1, j)] == _rp_sign(j, 0) * 0.25
        assert got[(2, j)] == 0.0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet/*.parquet')"
    )
    compare(embed_random_projection(spark, d), con, ORACLES["embed_random_projection"])


def test_ngram_jaccard_df_cap_parity_when_cap_fires(spark, tmp_path, monkeypatch):
    """The _MAX_DF posting-list cap must change ENGINE and ORACLE
    identically when it actually fires (the fixtures' max df never
    trips it): with a hot shingle shared by 5 docs and the cap
    shrunk to 3, the (A, B) pair whose jaccard reaches 0.4 only
    THROUGH the hot shingle must disappear on BOTH sides — set sizes
    stay full, only intersections lose the capped shingle."""
    import duckdb

    from impala_refresher_spark.operators import dedup
    from impala_refresher_spark.registry import ORACLES
    from oracle_util import compare

    d = str(tmp_path)
    docs = [
        (1, "p q r s t", "en", "web", 9),   # {pqr, qrs, rst}
        (2, "p q r s u", "en", "web", 9),   # {pqr, qrs, rsu} — j(1,2)=0.5 with pqr
        (3, "p q r v1 v2", "en", "web", 10),
        (4, "p q r w1 w2", "en", "web", 10),
        (5, "p q r y1 y2", "en", "web", 10),  # pqr df=5
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )

    # uncapped semantics first: the hot shingle carries (1,2) to 0.5
    uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.dedup_ngram_jaccard(spark, d).collect()
    }
    assert uncapped[(1, 2)] == 0.5

    # shrink the cap so pqr (df=5) trips it; engine reads _MAX_DF at
    # plan-build time, the registered oracle gets the same cap spliced
    monkeypatch.setattr(dedup, "_MAX_DF", 3)
    capped_oracle = ORACLES["dedup_ngram_jaccard"].replace("<= 1000", "<= 3")
    assert "<= 3" in capped_oracle
    got = dedup.dedup_ngram_jaccard(spark, d)
    assert (1, 2) not in {
        (r.doc_a, r.doc_b) for r in got.collect()
    }, "capped engine must drop the hot-shingle-dependent pair"
    compare(got, con, capped_oracle)
