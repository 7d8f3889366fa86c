"""Physical-plan assertions: the properties that make these queries
scale are locked in here so a refactor can't silently regress them —
predicate pushdown into the parquet scan, column pruning, broadcast
join selection, top-k without a global sort, and whole-stage codegen.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from impala_refresher_spark.operators.relational import (
    filter_compound,
    join_broadcast_dim,
    order_topn,
    project_computed,
    revenue_by_region_year,
)
from tests.conftest import SF_SMOKE


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(filter_compound(spark, SF_SMOKE))
    assert "PushedFilters" in plan
    # the BETWEEN bounds and IN-list must be pushed, not post-filtered
    assert "GreaterThanOrEqual(o_totalprice,1000.0)" in plan
    assert "In(o_orderstatus" in plan


def test_column_pruning_in_scan(spark):
    plan = plan_of(project_computed(spark, SF_SMOKE))
    # ReadSchema must contain only the 6 referenced columns — reading
    # all 11 lineitem columns for this projection would be wrong
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax"):
        assert col in read_schema
    for col in ("l_shipdate", "l_returnflag", "l_partkey", "l_suppkey"):
        assert col not in read_schema


def test_dimension_join_is_broadcast(spark):
    plan = plan_of(join_broadcast_dim(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # fact table must not shuffle-sort


def test_star_join_broadcasts_bounded_dims(spark):
    plan = plan_of(revenue_by_region_year(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region at minimum


def test_topn_avoids_global_sort(spark):
    plan = plan_of(order_topn(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_whole_stage_codegen_active(spark):
    plan = plan_of(project_computed(spark, SF_SMOKE), "simple")
    # the "*(n)" prefix marks operators fused into a codegen stage
    assert "*(1) Project" in plan


def test_bucketed_join_has_no_exchange(spark):
    """Both sides pre-bucketed on the join key => the SMJ and the
    following same-key aggregate must run with ZERO shuffles."""
    from impala_refresher_spark.operators.relational import join_bucketed

    plan = plan_of(join_bucketed(spark, SF_SMOKE))
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan


def test_asof_join_has_no_join_operator(spark):
    """The as-of join must compile to union + window — any Join node
    means the plan regressed to a (quadratic) range join."""
    from impala_refresher_spark.operators.asof import asof_click_attribution

    plan = plan_of(asof_click_attribution(spark, SF_SMOKE))
    assert "Window" in plan and "Union" in plan
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                    "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_op not in plan


def test_blocked_pair_joins_are_triangle_partitioned(spark):
    """The embedding pair joins must key on (block, pair_cell) — the
    triangle-salt guard that stops one hot label from pinning a single
    task to a near-cartesian. A plan whose join keys lack pair_cell
    has regressed to the unguarded block² join."""
    from impala_refresher_spark.operators.dedup import dedup_embedding_cosine
    from impala_refresher_spark.operators.pipeline import pipeline_training_corpus
    from impala_refresher_spark.operators.similarity import cosine_similarity_join

    for fn in (cosine_similarity_join, dedup_embedding_cosine, pipeline_training_corpus):
        plan = plan_of(fn(spark, SF_SMOKE))
        assert "pair_cell" in plan, fn.__name__
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, fn.__name__


def test_blocked_pair_join_emits_each_pair_once(spark):
    """Triangle partitioning must reproduce the unguarded join's output
    exactly: every within-block pair once, regardless of salt cell."""
    from pyspark.sql import functions as F

    from impala_refresher_spark.operators.similarity import blocked_pair_join

    rows = [(i, "blk" if i < 20 else "other") for i in range(25)]
    u = spark.createDataFrame(rows, "vec_id long, label string")
    got = (
        blocked_pair_join(u, "label", "vec_id")
        .select(F.col("a.vec_id").alias("x"), F.col("b.vec_id").alias("y"))
        .collect()
    )
    pairs = [(r.x, r.y) for r in got]
    want = [(x, y) for x in range(20) for y in range(20) if x < y]
    want += [(x, y) for x in range(20, 25) for y in range(20, 25) if x < y]
    assert sorted(pairs) == sorted(want)
    assert len(pairs) == len(set(pairs))  # no duplicate emissions


def test_tpch_q6_predicates_all_push_to_scan(spark):
    """Q6 must be scan-bound: every predicate in PushedFilters, no join
    anywhere — the one-pass partial-aggregate shape."""
    from impala_refresher_spark.operators.tpch import tpch_q6_forecast_revenue

    plan = plan_of(tpch_q6_forecast_revenue(spark, SF_SMOKE))
    assert "PushedFilters" in plan
    for frag in ("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
                 "GreaterThanOrEqual(l_discount", "LessThan(l_quantity"):
        assert frag in plan, frag
    assert "Join" not in plan


def test_tpch_q10_broadcasts_nation(spark):
    from impala_refresher_spark.operators.tpch import tpch_q10_returned_items

    plan = plan_of(tpch_q10_returned_items(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-20 without a global sort


def test_exists_subqueries_decorrelate_to_semi_anti_joins(spark):
    """Correlated EXISTS / NOT EXISTS must compile to one semi and one
    anti join — never per-row subquery re-execution or a cartesian."""
    from impala_refresher_spark.operators.relational import sql_exists_subquery

    plan = plan_of(sql_exists_subquery(spark, SF_SMOKE))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_redact_pii_is_map_only(spark):
    """The redaction pass is a pure projection+filter: any Exchange in
    the plan means a shuffle crept into what must be a map-only job."""
    from impala_refresher_spark.operators.text import text_redact_pii

    plan = plan_of(text_redact_pii(spark, SF_SMOKE))
    # fan_out's round-robin widening is allowed; keyed shuffles are not
    assert "hashpartitioning" not in plan.lower()
    assert "rangepartitioning" not in plan.lower()


def test_dedup_pair_generation_has_no_self_join(spark):
    """Jaccard + MinHash dedup must generate candidate pairs from
    posting lists (single shuffle), never via an exploded self-join."""
    from impala_refresher_spark.operators.dedup import dedup_minhash_lsh, dedup_ngram_jaccard

    plan = plan_of(dedup_ngram_jaccard(spark, SF_SMOKE))
    # only the two broadcast size-lookup joins may appear
    assert "SortMergeJoin" not in plan
    # minhash: candidate generation itself is join-free; the verify
    # stage joins shingle arrays back, which is expected
    mh = plan_of(dedup_minhash_lsh(spark, SF_SMOKE))
    assert "CartesianProduct" not in mh and "BroadcastNestedLoopJoin" not in mh


def test_top_tokens_avoids_global_sort(spark):
    """Global heavy hitters must compile to TakeOrderedAndProject
    (per-partition top-k + driver merge), never a full Exchange
    rangepartitioning + Sort of the whole vocabulary."""
    from impala_refresher_spark.operators.text import text_top_tokens

    plan = plan_of(text_top_tokens(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_incremental_dedup_prunes_corpus_scan(spark):
    """The corpus side of the incremental anti-join must read ONLY the
    text column (hash input) — scanning full documents for a hash-set
    membership check would move documents, not hashes, at 100 TB."""
    from impala_refresher_spark.operators.dedup import dedup_incremental_batch

    plan = plan_of(dedup_incremental_batch(spark, SF_SMOKE))
    assert "LeftAnti" in plan
    # every documents scan in this plan reads at most doc_id + text
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "lang" not in line and "source" not in line and "n_chars" not in line


def test_decontamination_broadcasts_eval_shingles(spark):
    """The eval-set shingle side must broadcast (benchmarks are tiny
    vs the corpus): a shuffled semi-join here would re-shuffle the
    entire training corpus's shingles."""
    from impala_refresher_spark.operators.dedup import decontaminate_train_set

    plan = plan_of(decontaminate_train_set(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_tpch_q5_pushes_filters_and_broadcasts_bounded_dims(spark):
    from impala_refresher_spark.operators.tpch import tpch_q5_local_supplier_volume

    plan = plan_of(tpch_q5_local_supplier_volume(spark, SF_SMOKE))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan  # date range reached the scan
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region at minimum


def test_q18_aggregates_fact_before_join(spark):
    """Q18's HAVING aggregate must collapse lineitem BEFORE the join —
    a plan that joins the raw fact table first has lost the point."""
    from impala_refresher_spark.operators.tpch import tpch_q18_large_volume_customers

    plan = plan_of(tpch_q18_large_volume_customers(spark, SF_SMOKE), "simple")
    agg_pos = plan.find("HashAggregate")
    join_pos = plan.find("Join")
    assert agg_pos != -1 and join_pos != -1
    # explain prints top-down: the join consumes the aggregate, so the
    # first Join node appears ABOVE (before) the aggregate's scan but
    # the aggregate must exist under the join subtree; cheap proxy:
    # lineitem's scan appears after the aggregate marker
    assert "TakeOrderedAndProject" in plan


def test_tpch_q19_disjunctive_predicates_push_to_both_scans(spark):
    """The OR-of-ANDs spans both join sides; Catalyst must DERIVE the
    single-side disjunctions and push them into each parquet scan —
    part rows filter on (brand AND size-range) disjuncts, lineitem rows
    on the quantity-range disjuncts — instead of filtering after the
    join."""
    from impala_refresher_spark.operators.tpch import tpch_q19_discounted_revenue

    plan = plan_of(tpch_q19_discounted_revenue(spark, SF_SMOKE))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    part_pushed = [l for l in pushed if "p_brand" in l]
    line_pushed = [l for l in pushed if "l_quantity" in l]
    assert part_pushed and "Or(" in part_pushed[0] and "Brand#12" in part_pushed[0]
    assert line_pushed and "Or(" in line_pushed[0]


def test_tpch_q21_decorrelates_to_two_lineitem_scans(spark):
    """The literal EXISTS / NOT EXISTS SQL implies THREE lineitem
    scans (l1, l2, l3). The implementation decorrelates both
    subqueries into one per-order aggregate, so the physical plan must
    read lineitem exactly twice (once for late lines, once for the
    per-order supplier counts) — the property that keeps the query at
    two fact shuffles at 100 TB."""
    from impala_refresher_spark.operators.tpch import (
        tpch_q21_suppliers_who_kept_waiting,
    )

    plan = plan_of(tpch_q21_suppliers_who_kept_waiting(spark, SF_SMOKE))
    assert plan.count("lineitem.parquet") == 2


def test_tpch_q22_anti_join_prunes_orders_scan(spark):
    """NOT EXISTS compiles to a left-anti join whose build side reads
    only the correlation + filter columns of orders — scanning more
    would ship the whole fact table to every executor at scale."""
    from impala_refresher_spark.operators.tpch import (
        tpch_q22_global_sales_opportunity,
    )

    plan = plan_of(tpch_q22_global_sales_opportunity(spark, SF_SMOKE))
    assert "LeftAnti" in plan
    # every orders read must carry ONLY the correlation + filter
    # columns — asserted as "no other o_ column appears", not an exact
    # plan-format string (brittle to Spark formatting changes).
    orders_reads = [
        l.strip()
        for l in plan.splitlines()
        if "ReadSchema" in l and "o_custkey" in l
    ]
    assert orders_reads, plan
    allowed = {"o_custkey", "o_orderpriority"}
    import re

    for line in orders_reads:
        cols = set(re.findall(r"(o_\w+):", line))
        assert cols <= allowed, line


def test_lakehouse_ops_are_pure_jvm(spark):
    """MERGE upsert, SCD2, and the Z-order Morton code must compile to
    pure Catalyst expressions — a Python UDF in any of them would put
    an Arrow/pickle serialization barrier in what codegen otherwise
    fuses into single stages (the Morton interleave in particular is
    32 shift/mask terms folded into one projection). AQE plans hide
    the ``*(n)`` codegen markers before execution, so the barrier's
    ABSENCE is the assertable property."""
    from impala_refresher_spark.operators.lakehouse import (
        merge_upsert_orders,
        scd2_user_value_history,
        zorder_cluster_stats,
    )

    for fn in (merge_upsert_orders, scd2_user_value_history, zorder_cluster_stats):
        plan = plan_of(fn(spark, SF_SMOKE), "simple")
        assert "EvalPython" not in plan, fn.__name__


def test_merge_upsert_is_single_join(spark):
    """The MERGE plan must be ONE full-outer join of base vs updates —
    a naive matched/not-matched implementation as two separate joins
    (inner + anti) doubles the fact shuffle."""
    from impala_refresher_spark.operators.lakehouse import merge_upsert_orders

    plan = plan_of(merge_upsert_orders(spark, SF_SMOKE), "simple")
    joins = plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") + plan.count(
        "ShuffledHashJoin"
    )
    assert joins == 1, plan


def test_dpp_prunes_partitioned_scan(spark):
    """The partitioned-events fact scan must carry a
    ``dynamicpruningexpression`` partition filter fed by the dim-side
    category predicate — at 100 TB this reads 2/5 of the table instead
    of all of it, with no user-side predicate rewriting."""
    from impala_refresher_spark.operators.refresh import dpp_partitioned_events

    plan = plan_of(dpp_partitioned_events(spark, SF_SMOKE))
    assert "dynamicpruningexpression" in plan.lower(), plan


def test_tpch_q2_part_filter_prunes_aggregate_input(spark):
    """Catalyst can't push the part filter through the costs
    aggregate-then-join, so the query does it by hand: lineitem is
    LEFT SEMI joined against the broadcast filtered part keys BEFORE
    the groupBy. The lock: a LeftSemi broadcast join exists, and every
    lineitem scan feeds through it below the aggregate (i.e. the plan
    has the semi join at all — without it the aggregate folds ALL of
    lineitem at 100 TB)."""
    from impala_refresher_spark.operators.tpch import tpch_q2_min_cost_supplier

    plan = plan_of(tpch_q2_min_cost_supplier(spark, SF_SMOKE))
    assert "LeftSemi" in plan, plan
    # the part-side scan of the semi join must push the p_size/p_type
    # filters into parquet
    assert "EqualTo(p_size,15)" in plan, plan


def test_minhash_verify_scan_is_candidate_filtered(spark):
    """The exact-Jaccard verify stage must NOT shuffle full-corpus
    shingle arrays: the documents scan feeding it is semi-joined down
    to candidate ids first (broadcast LeftSemi), so verification cost
    is O(candidates) regardless of corpus size."""
    from impala_refresher_spark.operators.dedup import dedup_minhash_lsh

    plan = plan_of(dedup_minhash_lsh(spark, SF_SMOKE))
    assert "LeftSemi" in plan, plan


def test_text_tfidf_n_docs_is_plan_side(spark):
    """n_docs must stay plan-side: the old implementation ran a
    driver-side ``d.count()`` (an extra serial Spark job and a
    planning barrier) and baked the result in as a literal. The fixed
    plan carries the 1-row count aggregate as a broadcast cross join —
    so the plan must contain a broadcast nested-loop join AND a
    count(1) aggregate feeding it."""
    from impala_refresher_spark.operators.text import text_tfidf

    plan = plan_of(text_tfidf(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "count(1)" in plan, plan


def test_aqe_splits_unsalted_skew_join(spark):
    """The at-scale skew story: before reaching for manual salting
    (`join_skew_salted`), AQE's skew-join split must actually fire on
    an unsalted hot-key sort-merge join. Thresholds are lowered so the
    fixture-scale skew crosses them (at 100 TB the 256 MB defaults do
    the same job); the executed adaptive plan must show the skewed
    shuffle read — i.e. the oversized partition was split at runtime,
    no plan change and no row replication required."""
    from pyspark.sql import functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        # 90% of fact rows share key 0 -> one melted shuffle partition.
        fact = spark.range(0, 300_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            (F.col("id") * 7 % 100).alias("v"),
        )
        dim = spark.range(0, 1000).select(F.col("id").alias("k"))
        j = fact.join(dim, "k").groupBy().agg(F.sum("v").alias("s"))
        [row] = j.collect()
        executed = j._jdf.queryExecution().executedPlan().toString()
        assert "AQEShuffleRead skewed" in executed, executed
        assert "skew=true" in executed, executed
        # and the split did not change the answer (every k hits the dim)
        expect = sum(i * 7 % 100 for i in range(300_000))
        assert row.s == expect
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_pair_salts_derived_from_block_width(spark):
    """Triangle width S must track the data (S ~ w_max / rows-per-cell,
    clamped), not a constant: a hot block 5 cells wide must get S=5,
    and the replicated relation must actually use all S*(S+1)/2 grid
    cells so no task owns the whole block."""
    from pyspark.sql import functions as F

    from impala_refresher_spark.operators.similarity import (
        _PAIR_ROWS_PER_CELL,
        _PAIR_SALTS_MAX,
        _PAIR_SALTS_MIN,
        _pair_salts_for,
        blocked_pair_join,
    )

    hot = spark.range(5 * _PAIR_ROWS_PER_CELL).select(
        F.col("id").alias("vec_id"), F.lit("hot").alias("label")
    )
    assert _pair_salts_for(hot, "label") == 5

    tiny = spark.range(10).select(
        F.col("id").alias("vec_id"), F.lit("t").alias("label")
    )
    assert _pair_salts_for(tiny, "label") == _PAIR_SALTS_MIN

    wide = spark.range(2 * _PAIR_SALTS_MAX * _PAIR_ROWS_PER_CELL).select(
        F.col("id").alias("vec_id"), F.lit("w").alias("label")
    )
    assert _pair_salts_for(wide, "label") == _PAIR_SALTS_MAX

    # With an explicit S the replicated side must populate the full
    # S*(S+1)/2 triangle grid (50 ids, 5 salts -> 15 distinct cells).
    s = 5
    u = spark.range(50).select(F.col("id").alias("vec_id"), F.lit("b").alias("label"))
    pairs = blocked_pair_join(u, "label", "vec_id", n_salts=s)
    cells = pairs.select(F.col("a.pair_cell")).distinct().count()
    assert cells == s * (s + 1) // 2
    # and output is still exactly the ordered within-block pairs
    n_pairs = pairs.count()
    assert n_pairs == 50 * 49 // 2


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Third 100 TB pruning lever (after DPP and AQE skew): when a
    selective dim-side filter feeds a shuffle join, Catalyst must
    inject a runtime bloom filter — `bloom_filter_agg` built from the
    filtered dim, `might_contain` applied at the fact scan — so fact
    rows that cannot join are dropped BEFORE the shuffle. Thresholds
    are lowered to fixture scale (the 10 GB application-side default
    exists precisely because this pays off on huge scans)."""
    import os

    from pyspark.sql import functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    base = "/root/repo/_scratch/bloom_plan_test"
    try:
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fact = spark.range(0, 200_000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v")
        )
        dim = spark.range(0, 10_000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("cat")
        )
        fact.write.mode("overwrite").parquet(f"{base}/fact")
        dim.write.mode("overwrite").parquet(f"{base}/dim")
        f = spark.read.parquet(f"{base}/fact")
        d = spark.read.parquet(f"{base}/dim").filter(F.col("cat") == 3)
        j = f.join(d, "k").agg(F.sum("v").alias("s"))
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized, optimized
        physical = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in physical, physical
        [row] = j.collect()
        expect = sum(i % 97 for i in range(10_000) if i % 7 == 3)
        assert row.s == expect
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_pit_feature_join_is_union_window_not_join(spark):
    """The PIT feature join must keep the as-of union-trick shape: two
    window passes over user_id shuffles, ZERO join operators — a
    regression to a label×history range join would be quadratic per
    hot user."""
    from impala_refresher_spark.operators.asof import pit_feature_join

    plan = plan_of(pit_feature_join(spark, SF_SMOKE))
    assert "Window" in plan and "Union" in plan
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                    "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_op not in plan, join_op


def test_range_orderstat_has_no_pair_join(spark):
    """The order-statistics range-join count must never materialize
    supplier×customer pairs: the only join allowed is the broadcast
    attach of the 25-row nation dim; the heavy lifting is one merged
    window pass."""
    from impala_refresher_spark.operators.relational import range_join_count_orderstat

    plan = plan_of(range_join_count_orderstat(spark, SF_SMOKE))
    assert "Window" in plan and "Union" in plan
    assert "BroadcastHashJoin" in plan  # nation name attach only
    for join_op in ("SortMergeJoin", "ShuffledHashJoin",
                    "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_op not in plan, join_op


def test_inverted_index_lookup_prunes_to_one_bucket(spark):
    """The term lookup must hit ONE index partition: the bucket
    predicate (partition col = constant-folded xxhash64 literal) has
    to appear in the scan's PartitionFilters — without it the 'index'
    is just a second copy of the corpus."""
    from impala_refresher_spark.operators.lakehouse import inverted_index_serve

    plan = plan_of(inverted_index_serve(spark, SF_SMOKE))
    assert "PartitionFilters" in plan
    import re
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "tok_bucket" in pf.group(1), plan


def test_pipeline_v2_gate_keeps_hofs_out_of_scan_filters(spark):
    """The Gopher gate must never leak its higher-order folds into the
    scan's DataFilters: Catalyst re-evaluates pushed conjuncts per row
    interpreted (CodegenFallback), measured 365× slower at sf0.1. The
    aggregate-form gate keeps scans' DataFilters lambda-free."""
    import re

    from impala_refresher_spark.operators.pipeline import pipeline_training_corpus_v2

    plan = plan_of(pipeline_training_corpus_v2(spark, SF_SMOKE))
    for m in re.finditer(r"DataFilters: \[([^\]]*)\]", plan):
        assert "lambdafunction" not in m.group(1), m.group(1)[:200]


def test_market_basket_avoids_fact_self_join(spark):
    """The pair expansion must happen inside codegen (flatten/
    transform over the basket array), never as a lineitem self-join:
    the only join in the plan is the broadcast semi-join of the
    apriori prune, so there is no basket-squared shuffle to regress
    into."""
    from impala_refresher_spark.operators.analytics import market_basket_pairs

    import re

    plan = plan_of(market_basket_pairs(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan
    # one join NODE total (formatted plans print each node twice:
    # once in the tree, once in the numbered detail section)
    join_nodes = re.findall(r"^\(\d+\) \w*Join", plan, re.M)
    assert len(join_nodes) == 1, plan
    assert "LeftSemi" in plan  # the apriori prune survives
    assert "Generate explode" in plan or "explode" in plan


def test_semdedup_pair_join_is_cluster_blocked(spark):
    """SemDeDup's pair join must carry the cluster id + triangle cell
    in its equi-keys (bounded per-task width); an unkeyed cross join
    here is the n^2 scale failure the clustering exists to prevent."""
    from impala_refresher_spark.operators.dedup import semdedup_embeddings

    plan = plan_of(semdedup_embeddings(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "pair_cell" in plan  # triangle grid key present in the join


def test_profile_stats_is_single_scan_with_expand(spark):
    """The ANALYZE-style profile must stay ONE pass over orders: all
    stats fold into a single Aggregate whose multi-distinct lowers to
    Expand. A second FileScan would mean per-column re-reads — the
    anti-pattern this operator exists to avoid at 100 TB."""
    import re

    from impala_refresher_spark.operators.profiling import profile_table_stats

    plan = plan_of(profile_table_stats(spark, SF_SMOKE))
    # formatted plans list each node once in the tree and once in the
    # numbered detail section — count the detail entries
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert "Expand" in plan  # the multi-count(distinct) lowering


def test_cusum_single_scan_date_grain_windows(spark):
    """CUSUM must aggregate to date grain FIRST and run both windows
    over that tiny frame — exactly one scan of orders and exactly one
    data-sized exchange (the date-grain hash aggregate)."""
    import re

    from impala_refresher_spark.operators.profiling import cusum_daily_revenue

    plan = plan_of(cusum_daily_revenue(spark, SF_SMOKE))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan


def test_time_weighted_avg_reuses_user_partitioning(spark):
    """The lead() window and the per-user aggregate must share ONE
    hashpartitioning(user_id) exchange; a second data-sized shuffle
    between them would double the dominant cost at scale."""
    import re

    from impala_refresher_spark.operators.profiling import time_weighted_avg_value

    plan = plan_of(time_weighted_avg_value(spark, SF_SMOKE))
    exchanges = re.findall(r"hashpartitioning\(user_id", plan)
    # formatted plans print each node once in the tree and once in the
    # detail listing — one logical exchange appears at most twice
    assert len(exchanges) <= 2, plan


def test_mad_outliers_broadcast_median_frames(spark):
    """Both median frames (25 nation rows) must broadcast back onto
    the customer relation — a SortMergeJoin here would shuffle the
    full customer table twice for KB-sized per-group medians."""
    from impala_refresher_spark.operators.profiling import mad_outlier_accounts

    plan = plan_of(mad_outlier_accounts(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_fuzzy_join_is_blocked_equi_join(spark):
    """Candidate pairs must come from an equi-join on the blocking key
    — an all-pairs nested-loop over the name vocabulary is the n²
    failure blocking exists to prevent."""
    from impala_refresher_spark.operators.linkage import fuzzy_join_part_names

    plan = plan_of(fuzzy_join_part_names(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "block" in plan  # the blocking key is in the join keys


def test_gap_islands_distinct_combines_map_side(spark):
    """The only fact-sized shuffle is the (user_id, day) distinct and
    it must partially aggregate BEFORE the exchange — shuffling raw
    events to dedup them reducer-side would move the full fact volume
    at 100 TB."""
    import re

    from impala_refresher_spark.operators.profiling import gap_islands_active_days

    plan = plan_of(gap_islands_active_days(spark, SF_SMOKE))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    # partial-aggregate node sits below the first exchange in the tree
    tree = plan[: plan.find("(1) Scan")]
    first_exchange = tree.find("Exchange")
    first_agg = tree.rfind("HashAggregate")
    assert first_agg > first_exchange >= 0, plan


def test_snapshot_diff_is_single_key_join(spark):
    """The diff must be ONE full-outer join on the snapshot key; the
    change filter runs post-join in codegen, never as extra joins or
    subquery re-scans of either snapshot."""
    import re

    from impala_refresher_spark.operators.lakehouse import snapshot_diff_orders

    plan = plan_of(snapshot_diff_orders(spark, SF_SMOKE))
    join_nodes = re.findall(r"^\(\d+\) \w*Join", plan, re.M)
    assert len(join_nodes) == 1, plan
    assert "FullOuter" in plan


def test_pareto_sweep_windows_over_value_domain(spark, monkeypatch):
    """The skyline sweep must window over the per-price aggregate
    (value-domain cardinality) and broadcast the verdict back to the
    fact side — a window or sort over the raw part relation regresses
    the rewrite toward the quadratic definition. Pinned at the
    two-level regime (threshold forced to 0: the shape a corpus-scale
    input gets); at smoke SF the r09 adaptive gate degenerates to one
    bucket, where the offsets join is a 1-row broadcast."""
    import impala_refresher_spark.operators.prefix as prefix_mod
    from impala_refresher_spark.operators.analytics import pareto_frontier_parts

    monkeypatch.setattr(prefix_mod, "_TWO_LEVEL_MIN_ROWS", 0)
    plan = plan_of(pareto_frontier_parts(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_partition_checksums_single_pass(spark):
    """The fingerprint is ONE partial-aggregable scan: no joins, no
    window, exactly one parquet scan node."""
    import re

    from impala_refresher_spark.operators.lakehouse import partition_checksums

    plan = plan_of(partition_checksums(spark, SF_SMOKE))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert "Join" not in plan
    assert "Window" not in plan


def test_cumulative_distinct_is_single_scan(spark):
    """The first-occurrence rewrite must read the fact ONCE: the
    distinct, the per-user first flag, and the per-day aggregate all
    chain off one scan (the naive day-spine variant read it twice)."""
    import re

    from impala_refresher_spark.operators.profiling import cumulative_distinct_users

    plan = plan_of(cumulative_distinct_users(spark, SF_SMOKE))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan


def test_revenue_mom_single_scan_month_grain_window(spark):
    """Period-over-period must aggregate to month grain first; the lag
    window runs over the month frame — one scan, no join."""
    import re

    from impala_refresher_spark.operators.profiling import revenue_mom_change

    plan = plan_of(revenue_mom_change(spark, SF_SMOKE))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert "Join" not in plan


def test_rolling_corr_windows_over_date_grain(spark):
    """The sufficient-statistics rewrite must aggregate BEFORE the
    window: exactly one scan, and the window input is the daily
    aggregate (a HashAggregate below the Window in the tree), never
    raw fact rows."""
    import re

    from impala_refresher_spark.operators.profiling import rolling_corr_qty_price

    plan = plan_of(rolling_corr_qty_price(spark, SF_SMOKE))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    tree = plan[: plan.find("(1) Scan")]
    assert 0 <= tree.find("Window") < tree.rfind("HashAggregate"), plan


def test_linear_counting_single_scan_one_expand(spark):
    """Occupancy and the exact count must fold into ONE aggregate —
    a single customer scan with the multi-distinct Expand, not a
    join of two separately-scanned aggregates."""
    import re

    from impala_refresher_spark.operators.rollup_hypertable import (
        linear_counting_distinct,
    )

    plan = plan_of(linear_counting_distinct(spark, SF_SMOKE))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert "Expand" in plan
    assert "Join" not in plan


def test_cms_probe_join_broadcasts_sketch(spark):
    """The probe lookup must broadcast the KB-sized sketch — a
    SortMergeJoin would shuffle the probe side against 2048 cells."""
    from impala_refresher_spark.operators.rollup_hypertable import (
        cms_frequency_estimate,
    )

    plan = plan_of(cms_frequency_estimate(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_confusion_metrics_scan_corpus_once(spark):
    """kappa / precision-recall derive everything from the
    checkpointed confusion matrix: the documents scan must appear at
    most once in each plan (the matrix derivations read the
    materialized KB relation, not the corpus)."""
    import re

    from impala_refresher_spark.operators.evaluation import (
        langid_confusion_kappa,
        langid_precision_recall,
    )

    for fn in (langid_confusion_kappa, langid_precision_recall):
        plan = plan_of(fn(spark, SF_SMOKE))
        assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 0, (
            fn.__name__,
            plan,
        )  # matrix checkpointed -> no parquet scan remains in the plan


def test_seasonal_anomaly_single_scan(spark):
    """Date-grain-first discipline: one orders scan; both baseline
    windows run over the day frame."""
    import re

    from impala_refresher_spark.operators.analytics import seasonal_dow_anomaly

    plan = plan_of(seasonal_dow_anomaly(spark, SF_SMOKE))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert "Join" not in plan


def test_top_event_paths_single_scan(spark):
    """The ranking window, first-3 filter, and both aggregates chain
    off ONE events scan."""
    import re

    from impala_refresher_spark.operators.analytics import top_event_paths

    plan = plan_of(top_event_paths(spark, SF_SMOKE))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert "Join" not in plan


def test_trending_reference_day_broadcasts(spark):
    """The max-day reference must come back as a broadcast 1-row
    frame (the repo's scalar pattern) — never a SortMergeJoin and
    never a driver-side collect in the query path."""
    from impala_refresher_spark.operators.analytics import trending_decayed_counts

    plan = plan_of(trending_decayed_counts(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan
    assert "Broadcast" in plan


def test_connected_components_lineage_stays_bounded(spark):
    """Checkpoint discipline on the iterative min-label loop (shared
    by dedup_cluster_components, dedup_cluster_survivors, and
    entity_resolution_clusters): each round must start from the
    PREVIOUS round's materialized checkpoint, never replay rounds
    1..N-1. The failure mode (dropping a localCheckpoint) is invisible
    at sf0.01 — plans grow linearly but still finish — and fatal at
    scale. Locked here: (a) the loop converges in <= diameter + 1
    rounds and early-exits well under max_iter; (b) the pre-checkpoint
    optimized-plan size is flat across rounds (a growing plan means
    lineage is accumulating)."""
    from impala_refresher_spark.operators.dedup import connected_components

    # path graph 0-1-...-9 plus an isolated edge: diameter 9 forces a
    # multi-round run; min-label needs ceil(log2(9)) rounds only if
    # labels hop multiple steps -- with 1-hop propagation it needs up
    # to 9 rounds + 1 convergence-confirming round.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)] + [(100, 101)], "a: long, b: long"
    )
    stats: list[int] = []
    labels = connected_components(edges, "a", "b", max_iter=20, round_stats=stats)
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert got == {**{i: 0 for i in range(10)}, 100: 100, 101: 100}
    # (a) round count bounded by diameter + 1 and early exit fired
    assert 2 <= len(stats) <= 10, stats
    # (b) per-round plan size flat: every round within 25% of round 1
    # (plans differ only in RDD ids / cosmetic suffixes)
    base = stats[0]
    assert all(abs(s - base) <= 0.25 * base for s in stats), stats


def test_bfs_frontier_loop_lineage_truncated(spark):
    """Same checkpoint discipline for the Pregel-style BFS frontier
    loop: every round's frontier and visited set are localCheckpoint-
    materialized, so the FINAL plan must read only checkpointed RDDs —
    zero parquet scans and no replay of the window/edge derivation.
    Without the per-round cuts the final plan would embed the events
    scan + lag-window + joins once per hop."""
    import re

    from impala_refresher_spark.operators.graph import bfs_event_transitions

    df = bfs_event_transitions(spark, SF_SMOKE)
    plan = plan_of(df)
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 0, plan
    assert "Window" not in plan, plan  # lag-window never replayed
    # the whole plan is sort + project over checkpointed RDDs — a few
    # dozen lines, not O(hops * subplan)
    assert len(plan.splitlines()) < 60, len(plan.splitlines())


def test_hll_rollup_serves_from_materialized_registers(spark):
    """The portable-register HLL rollup materializes the daily register
    layer (the stored rollup at scale) with localCheckpoint; BOTH
    serving aggregates — the MAX-merge and the day count — must read
    that KB-sized state, so the final plan contains zero parquet scans
    (without the cut, each branch re-scans the raw events: 2x the
    100 TB scan for one query)."""
    import re

    from impala_refresher_spark.operators.rollup_hypertable import hll_sketch_rollup

    plan = plan_of(hll_sketch_rollup(spark, SF_SMOKE))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 0, plan


def test_ann_bucket_joins_broadcast_queries_no_cartesian(spark):
    """LSH and IVF candidate generation must be an equi-join on the
    bucket/cell id with the KB-sized query side BROADCAST — the shape
    whose cost is the probed buckets' sizes. A refactor that loses the
    equi-key degenerates to a corpus-wide nested-loop join: fatal at
    scale, invisible at sf0.001."""
    from impala_refresher_spark.operators.similarity import (
        ann_ivf_topk,
        ann_lsh_topk,
    )

    for fn in (ann_lsh_topk, ann_ivf_topk):
        plan = plan_of(fn(spark, SF_SMOKE))
        assert "BroadcastHashJoin" in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
        # the corpus side must never be the broadcast side of a
        # nested-loop fallback
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__


def test_pagerank_iterations_read_checkpointed_edges_once(spark):
    """pagerank_bipartite materializes the degree-weighted edge relation
    ONCE (localCheckpoint) before iterating; the constant-folded first
    contribution AND the second iteration's rank join must BOTH consume
    that RDD, so the final plan contains zero parquet scans — without
    the cut each iteration replays the orders⋈lineitem distinct (2x the
    fact-table scan per extra iteration at 100 TB)."""
    import re

    from impala_refresher_spark.operators.graph import pagerank_bipartite

    plan = plan_of(pagerank_bipartite(spark, SF_SMOKE))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 0, plan
    # degree window computed before the cut, never replayed per round
    assert "Window" not in plan, plan


def test_tpch_q9_pushes_part_filter_and_broadcasts_nation(spark):
    """The integer-cents profit rewrite must not disturb Q9's join
    tree: the %bolt% part filter reaches the parquet scan as a
    StringContains pushdown (pruning the probe side before any join),
    nation stays broadcast, and each of the five tables is scanned
    exactly once — the per-row exact-cents expression is map-side
    arithmetic, free at any scale."""
    import re

    from impala_refresher_spark.operators.tpch import (
        tpch_q9_product_type_profit,
    )

    plan = plan_of(tpch_q9_product_type_profit(spark, SF_SMOKE))
    assert "StringContains(p_name,bolt)" in plan
    assert "BroadcastHashJoin" in plan
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 5, plan


def test_rolling_7day_aggregates_to_day_grain_before_single_window(spark):
    """The BIGINT-cents rewrite must keep the scale shape: one orders
    scan, the day-grain hash aggregate BELOW the (single) range-frame
    window — the windowed relation stays ~one row per day however big
    the fact table — and no join anywhere."""
    import re

    from impala_refresher_spark.operators.analytics import (
        rolling_7day_revenue,
    )

    plan = plan_of(rolling_7day_revenue(spark, SF_SMOKE))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert "Join" not in plan
    tree = plan[: plan.find("(1) Scan")]
    assert 0 <= tree.find("Window") < tree.rfind("HashAggregate"), plan


def test_percentile_queries_single_scan_single_aggregate(spark):
    """agg_percentiles and histogram_equidepth over BIGINT cents must
    stay one parquet scan feeding one (object-)hash aggregate — the
    cents conversion is a map-side projection, not an extra pass —
    with no window and no join."""
    import re

    from impala_refresher_spark.operators.analytics import (
        histogram_equidepth,
    )
    from impala_refresher_spark.operators.relational import agg_percentiles

    for fn in (agg_percentiles, histogram_equidepth):
        plan = plan_of(fn(spark, SF_SMOKE))
        assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
        assert "ObjectHashAggregate" in plan  # percentile buffer agg
        assert "Join" not in plan and "Window (" not in plan


def test_subsample_ci_single_scan_two_level_aggregate(spark):
    """The integer-cents CI folds out of ONE orders scan through the
    16-bucket aggregate and the 1-row moments aggregate — no join, no
    window, and the only shuffles are the two aggregate exchanges."""
    import re

    from impala_refresher_spark.operators.evaluation import (
        subsample_ci_revenue,
    )

    plan = plan_of(subsample_ci_revenue(spark, SF_SMOKE))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert "Join" not in plan and "Window (" not in plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) <= 2, plan


def test_int8_quantize_exploded_form_stays_map_only(spark):
    """The declared (posexplode) quantize form must keep the array
    form's scale shape: ONE embeddings scan, the Generate directly over
    the projection, no keyed shuffle (fan_out's round-robin widening is
    allowed), no join, and no Python in the data path — the explode
    multiplies rows by the dim but never moves them."""
    import re

    from impala_refresher_spark.operators.similarity import embed_int8_quantize

    plan = plan_of(embed_int8_quantize(spark, SF_SMOKE))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert "Generate" in plan
    assert "hashpartitioning" not in plan.lower(), plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert "Join" not in plan and "Window (" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunk_sliding_is_map_only_generate(spark):
    """Chunking must stay a pure map stage: ONE documents scan, the
    Generate (explode over chunk ids) with slices computed in codegen,
    no keyed shuffle, no join, no window, no Python — the shape that
    lets chunking pipeline into an embedding UDF at 100 TB without a
    repartition."""
    import re

    from impala_refresher_spark.operators.text import text_chunk_sliding

    plan = plan_of(text_chunk_sliding(spark, SF_SMOKE))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert "Generate" in plan
    assert "hashpartitioning" not in plan.lower(), plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert "Join" not in plan and "Window (" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rrf_fusion_join_is_candidate_sized(spark):
    """RRF's fusion join must run over the two 50-row candidate lists,
    never the corpus: each ranker's top-50 cut is TakeOrderedAndProject
    (per-partition heap + driver merge — NEVER a corpus-sized single-
    partition sort), the rank windows run over the already-cut 50 rows,
    and the dense side's one-row query vector attaches by broadcast
    (no cartesian)."""
    import re

    from impala_refresher_spark.operators.text import retrieval_rrf_fusion

    plan = plan_of(retrieval_rrf_fusion(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # both candidate cuts are distributed top-k, not global sorts
    assert len(re.findall(r"^\(\d+\) TakeOrderedAndProject", plan, re.M)) == 2, plan
    assert "rangepartitioning" not in plan.lower(), plan
    # ranks assigned AFTER the cut: each Window sits above a top-k
    assert plan.lower().count("lex_rank") >= 2 and plan.lower().count("dense_rank") >= 2


def test_budget_selection_window_is_bucket_partitioned(spark, monkeypatch):
    """The corpus-grain cumulative sum in select_corpus_token_budget
    must run two-level: its window is PARTITIONED by the quality
    bucket (hash exchange), never a corpus-wide single-partition sort;
    the only unpartitioned window is the <=32-row bucket-offsets one.
    Pinned at the two-level regime (threshold 0 — the corpus-scale
    shape under the r09 adaptive gate)."""
    import re

    import impala_refresher_spark.operators.prefix as prefix_mod
    from impala_refresher_spark.operators.pipeline import select_corpus_token_budget

    monkeypatch.setattr(prefix_mod, "_TWO_LEVEL_MIN_ROWS", 0)
    plan = plan_of(select_corpus_token_budget(spark, SF_SMOKE))
    assert re.search(r"hashpartitioning\(_bkt", plan), plan
    # the row-grain window carries the bucket as its partition spec
    assert re.search(r"windowspecdefinition\(_bkt#\d+, quality", plan), plan
    # and no window orders the corpus without a partition column
    assert not re.search(r"windowspecdefinition\(quality", plan), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_gini_ranking_is_bucket_partitioned(spark, monkeypatch):
    """revenue_concentration_gini's customer-grain row_number must be
    two-level (bucket-partitioned window + offset) with NTILE recovered
    by closed form — no global ntile/row_number window over customers;
    single-partition exchanges may only feed the tiny offsets/decile
    rollups."""
    import re

    import impala_refresher_spark.operators.prefix as prefix_mod
    from impala_refresher_spark.operators.analytics import revenue_concentration_gini

    monkeypatch.setattr(prefix_mod, "_TWO_LEVEL_MIN_ROWS", 0)
    plan = plan_of(revenue_concentration_gini(spark, SF_SMOKE))
    assert re.search(r"hashpartitioning\(_bkt", plan), plan
    assert re.search(r"windowspecdefinition\(_bkt#\d+, rev_cents", plan), plan
    assert not re.search(r"windowspecdefinition\(rev_cents", plan), plan
    assert "ntile(" not in plan, plan


def test_evaluation_rank_windows_are_bucket_partitioned(spark, monkeypatch):
    """The three corpus/value-grain evaluation rankings (AUC rank, gain
    deciles' NTILE replacement, the KS CDFs) must run two-level: their
    row-grain windows are PARTITIONED by the percentile bucket, with no
    unpartitioned window over score/v and no global ntile."""
    import re

    import impala_refresher_spark.operators.prefix as prefix_mod
    from impala_refresher_spark.operators.evaluation import (
        ks_statistic_status,
        score_auc_quality,
        score_gain_deciles,
    )

    monkeypatch.setattr(prefix_mod, "_TWO_LEVEL_MIN_ROWS", 0)
    for fn, key in (
        (score_auc_quality, "score"),
        (score_gain_deciles, "score"),
        (ks_statistic_status, "v"),
    ):
        plan = plan_of(fn(spark, SF_SMOKE))
        assert re.search(r"hashpartitioning\(_bkt", plan), fn.__name__
        assert re.search(rf"windowspecdefinition\(_bkt#\d+, {key}", plan), fn.__name__
        assert not re.search(rf"windowspecdefinition\({key}#\d+(?: ASC| DESC)", plan), fn.__name__
        assert "ntile(" not in plan, fn.__name__


def test_rfm_and_pareto_windows_are_bucket_partitioned(spark, monkeypatch):
    """customer_rfm_segments' three NTILEs and pareto_frontier_parts'
    price sweep must run two-level: row-grain windows partitioned by
    the percentile bucket, no global ntile, no unpartitioned window
    over the ranked column. Pinned at the two-level regime (threshold
    forced to 0 — the corpus-scale shape; the r09 adaptive gate
    degenerates small inputs to one bucket, covered by
    test_prefix_degenerates_to_one_bucket_below_threshold)."""
    import re

    import impala_refresher_spark.operators.prefix as prefix_mod
    from impala_refresher_spark.operators.analytics import (
        customer_rfm_segments,
        pareto_frontier_parts,
    )

    monkeypatch.setattr(prefix_mod, "_TWO_LEVEL_MIN_ROWS", 0)
    plan = plan_of(customer_rfm_segments(spark, SF_SMOKE))
    assert re.search(r"hashpartitioning\(_bkt", plan), plan
    assert "ntile(" not in plan, plan
    for key in ("last_order_days", "frequency", "monetary"):
        assert not re.search(rf"windowspecdefinition\({key}#\d+ DESC", plan), key

    plan = plan_of(pareto_frontier_parts(spark, SF_SMOKE))
    assert re.search(r"hashpartitioning\(_bkt", plan), plan
    assert re.search(r"windowspecdefinition\(_bkt#\d+, p_retailprice", plan), plan
    assert not re.search(r"windowspecdefinition\(p_retailprice#\d+ ASC", plan), plan


def test_prefix_degenerates_to_one_bucket_below_threshold(spark):
    """r09 adaptive gate: below _TWO_LEVEL_MIN_ROWS the prefix helpers
    must skip the cut-point machinery (one bucket, no percentile agg,
    no _bkt hash partitioning) AND produce values identical to the
    forced two-level plan — the module's any-bucketing invariant."""
    import impala_refresher_spark.operators.prefix as prefix_mod
    from pyspark.sql import functions as F

    df = spark.range(500).select(
        F.col("id"), (F.col("id") * 7 % 101).alias("k")
    )
    out_small = prefix_mod.with_global_running(
        df, "k", True, ["id"], {"rn": F.lit(1).cast("long")}
    )
    plan = plan_of(out_small)
    assert "percentile_approx" not in plan, plan
    small = sorted(map(tuple, out_small.collect()))

    orig = prefix_mod._TWO_LEVEL_MIN_ROWS
    try:
        prefix_mod._TWO_LEVEL_MIN_ROWS = 0
        big = sorted(
            map(
                tuple,
                prefix_mod.with_global_running(
                    df, "k", True, ["id"], {"rn": F.lit(1).cast("long")}
                ).collect(),
            )
        )
    finally:
        prefix_mod._TWO_LEVEL_MIN_ROWS = orig
    assert small == big


def test_winnowing_selection_shares_one_doc_exchange(spark):
    """fingerprint_winnowing's sliding-min windows and the per-doc
    fingerprint-set aggregate must share ONE doc-grain exchange (the
    collect_set partial/final pair runs on the window's partitioning),
    with no nested-HOF minimum (array_min over a slice re-evaluates
    the whole md5 gram array per window — measured O(n²)) and no
    cartesian product."""
    import re

    from impala_refresher_spark.operators.dedup import fingerprint_winnowing

    plan = plan_of(fingerprint_winnowing(spark, SF_SMOKE))
    assert "array_min" not in plan and "slice(h" not in plan
    assert "Cartesian" not in plan
    # exactly one doc_id-grain exchange: the window's; collect_set
    # reuses it (fan_out's round-robin + the two posting/pair
    # exchanges are the only others)
    assert len(re.findall(r"hashpartitioning\(doc_id", plan)) == 1, plan
    assert re.search(r"windowspecdefinition\(doc_id#\d+L?, pos", plan), plan


def test_incremental_lsh_and_containment_plan_shapes(spark):
    """dedup_minhash_incremental's verify tail must consume the
    checkpointed candidate set (ExistingRDD — the corpus-sized LSH
    pipeline ran exactly once, eagerly) through broadcast joins with
    no cartesian; quote_containment_join must broadcast the snippet
    shingles against the corpus scan (hash join on the shingle key,
    never a nested-loop)."""
    from impala_refresher_spark.operators.dedup import (
        dedup_minhash_incremental,
        quote_containment_join,
    )

    plan = plan_of(dedup_minhash_incremental(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "Scan ExistingRDD" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan

    plan = plan_of(quote_containment_join(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan, plan


def test_random_projection_is_map_only(spark):
    """JL projection must compile to a pure map stage: the sign matrix
    is plan-time literals (no broadcast, no join), each output dim one
    zip_with/aggregate fold in codegen, posexplode the only Generate —
    no keyed shuffle, no window, no Python. At 100 TB this pipelines
    into the LSH/IVF index builds without a repartition."""
    from impala_refresher_spark.operators.similarity import (
        embed_random_projection,
    )

    plan = plan_of(embed_random_projection(spark, SF_SMOKE))
    assert "hashpartitioning" not in plan.lower(), plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert "Join" not in plan and "Window (" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate" in plan


def test_span_removal_windows_share_one_doc_exchange(spark):
    """dedup_span_removal's interval-union pass (lag + running island
    sum + per-island and per-doc aggregates) must all run on ONE
    doc-grain exchange — HashPartitioning(doc_id) satisfies the
    (doc_id, isl_id) and (doc_id) clusterings — with windows always
    PARTITIONED (never single-partition), no cartesian, no Python."""
    import re

    from impala_refresher_spark.operators.dedup import dedup_span_removal

    plan = plan_of(dedup_span_removal(spark, SF_SMOKE))
    assert "SinglePartition" not in plan, plan
    assert "Cartesian" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert re.search(r"windowspecdefinition\(doc_id#\d+L?, pos", plan), plan
    assert len(re.findall(r"hashpartitioning\(doc_id#\d+L?, \d+", plan)) == 1, plan


def test_dedup_scoreboard_tail_is_pair_sized(spark):
    """dedup_quality_scoreboard's composition tail must add no
    quadratic stage on top of the three audited detector pipelines:
    no CartesianProduct, no Python eval, and the lone nested-loop join
    the 1-row broadcast truth-count (the grid crossJoin) — every
    pair-set join is a hash join."""
    from impala_refresher_spark.operators.dedup import dedup_quality_scoreboard

    import re

    plan = plan_of(dedup_quality_scoreboard(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # formatted mode lists each node once in the detail section
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 1, plan


def test_delta_merge_serves_both_segments_pruned(spark):
    """M13's serve path must prune BOTH segments (base and delta) to
    one bucket directory each: the constant-folded bucket predicate is
    pushed below the union, so the plan carries a tok_bucket
    PartitionFilter on two separate parquet scans — otherwise the
    'incremental' index degrades to two corpus copies per lookup."""
    import re

    from impala_refresher_spark.operators.lakehouse import (
        inverted_index_delta_merge,
    )

    plan = plan_of(inverted_index_delta_merge(spark, SF_SMOKE))
    assert "Union" in plan
    pfs = [
        m.group(1)
        for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan)
        if "tok_bucket" in m.group(1)
    ]
    assert len(pfs) >= 2, plan


def test_knn_symmetrization_joins_once(spark):
    """knn_join_topk's symmetric pair view must come from ONE pair
    join: the r09 unionByName form let Catalyst inline the full
    scan→normalize→triangle-join→dot subtree into BOTH union branches,
    computing every dot product twice (r10 before-plan: two joins,
    16 exchanges). Locked: exactly one join operator, no Union, and a
    Generate emits the two pair directions in place."""
    import re

    from impala_refresher_spark.operators.similarity import knn_join_topk

    plan = plan_of(knn_join_topk(spark, SF_SMOKE))
    # operator-detail headers only (the tree section repeats each name)
    joins = re.findall(
        r"^\(\d+\) (?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)",
        plan,
        re.M,
    )
    assert len(joins) == 1, (joins, plan)
    assert "Union" not in plan, plan
    assert "Generate" in plan  # the explode of both directions


def test_int8_quantize_filter_stays_cheap(spark):
    """embed_int8_quantize must explode the RAW embedding column, not
    the computed q array: InferFiltersFromGenerate synthesizes
    size()/isnotnull() predicates over the Generate input and re-inlines
    its full expression below the projection — over q that evaluated
    the max-|x| fold INSIDE a per-element lambda, O(dim²) per row in
    the scan-stage Filter (r10 before-plan). Locked: no Filter
    condition contains the quantize arithmetic (the *127 transform —
    the max-abs>0 guard legitimately carries ONE fold), and the fold
    appears at most twice plan-wide (guard + quantize projection)."""
    import re

    from impala_refresher_spark.operators.similarity import embed_int8_quantize

    plan = plan_of(embed_int8_quantize(spark, SF_SMOKE))
    conditions = re.findall(r"Condition : (.*)", plan)
    assert conditions, plan
    for cond in conditions:
        assert "127" not in cond, cond
    assert plan.count("aggregate(") <= 2, plan


def test_pipeline_v2_span_branch_fans_out_and_hashes(spark):
    """pipeline_training_corpus_v2's span-drop branch must (a) fan the
    8-gram explode out to the full core count — without the round-robin
    repartition the whole corpus exploded on the scan's single split
    (profiled: 1.8 s on one task at sf0.1) — and (b) shuffle/sort the
    8-byte xxhash64 of the gram, never the 8-word span text."""
    import re

    from impala_refresher_spark.operators.pipeline import (
        pipeline_training_corpus_v2,
    )

    plan = plan_of(pipeline_training_corpus_v2(spark, SF_SMOKE))
    assert re.search(r"xxhash64\(gram", plan), plan
    # the span window partitions by the hashed key
    assert re.search(r"windowspecdefinition\(gh#\d+L", plan), plan
    # no exchange hash-partitions on the raw gram string
    assert not re.search(r"hashpartitioning\(gram#\d+[,)]", plan), plan
