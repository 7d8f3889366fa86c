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
