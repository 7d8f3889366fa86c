"""Assembles the full declared-query registry.

Importing this module imports every operator module, which registers
its queries/oracles via the ``@query`` decorator into
``impala_refresher_spark.registry``.
"""

from __future__ import annotations

import importlib

from impala_refresher_spark.registry import ORACLES, QUERIES

_OPERATOR_MODULES = [
    "impala_refresher_spark.operators.relational",
    "impala_refresher_spark.operators.refresh",
    "impala_refresher_spark.operators.windows",
    "impala_refresher_spark.operators.udfs",
    "impala_refresher_spark.operators.text",
    "impala_refresher_spark.operators.dedup",
    "impala_refresher_spark.operators.similarity",
    "impala_refresher_spark.operators.multimodal",
    "impala_refresher_spark.operators.asof",
    "impala_refresher_spark.operators.pipeline",
    "impala_refresher_spark.operators.rollup_hypertable",
    "impala_refresher_spark.operators.analytics",
    "impala_refresher_spark.operators.profiling",
    "impala_refresher_spark.operators.linkage",
    "impala_refresher_spark.operators.evaluation",
    "impala_refresher_spark.operators.lakehouse",
    "impala_refresher_spark.operators.graph",
    "impala_refresher_spark.operators.tpch",
    "impala_refresher_spark.functions.scalar",
    "impala_refresher_spark.sources.sinks",
    "impala_refresher_spark.streaming.windows",
]


def _load() -> None:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


# The driver's correctness pass walks the registry in order and checks
# ~50 entries per round (r01: first 50, r02: first 50 after reorder).
# Cumulative r01+r02 coverage = 98 names, 93 green / 5 rows-only / 0
# fails; 72 declared queries have never been in a driver window. The
# r03 order puts exactly those first: all TPC-H shapes, the lakehouse
# MERGE/SCD2/Z-order ops, the parked sinks, streaming T6-T12, the
# kNN/k-means/centroid family, catalog introspection, the new DPP
# query, plus the queries whose code changed this round
# (tpch_q2/tpch_q11/sample_weighted_reservoir). The ~22 lowest-risk
# analytics/pipeline names stay after slot 50 for the r04 window —
# as do the round-3 late additions (profiling/linkage/graph/sketch
# families, the recursive-CTE and pipe-syntax front-end twins), which
# register after the priority block and are pytest-oracle-green at
# sf0.001 and sf0.01.
_R03_PRIORITY = [
    # TPC-H: 21 shapes never driver-checked + the new Q20 adaptation.
    # q2/q11 changed this round (aggregate pruning / HAVING rounding).
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_type_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_priority_shipping",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_parts_supplier_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_discounted_revenue",
    "tpch_q20_excess_stock_parts",
    "tpch_q21_suppliers_who_kept_waiting",
    "tpch_q22_global_sales_opportunity",
    # Lakehouse M1-M3.
    "merge_upsert_orders",
    "scd2_user_value_history",
    "zorder_cluster_stats",
    # Sinks parked since r01 + format ops.
    "sink_json_roundtrip",
    "sink_orc_roundtrip",
    "multi_format_union",
    "compact_small_files",
    # Streaming T6-T12 (multi-batch readStream shapes).
    "stream_dedup_within_wm_counts",
    "stream_stream_join",
    "stream_static_enrich",
    "stream_windowed_topk",
    "stream_stateful_ewma",
    "hypertable_rollup_incremental",
    # Similarity/clustering family.
    "knn_join_topk",
    "kmeans_refine_assignments",
    "label_centroids",
    # Catalog introspection C1.
    "catalog_list_tables",
    "catalog_describe_table",
    # New this round: dynamic partition pruning demonstration.
    "dpp_partitioned_events",
    # Changed this round (ln-key rounding) — re-verify under driver.
    "sample_weighted_reservoir",
    # New this round: map-only Gopher rule battery + hypertable-style
    # linear interpolation — new code, verify in the r03 window.
    "quality_gopher_rules",
    "timeseries_interpolate_linear",
    "dup_span_ngrams",
    "text_bm25_score",
    "stream_stream_left_outer",
    "pagerank_bipartite",
    "pit_feature_join",
    "range_join_count_orderstat",
    "pca_power_iteration",
    "dedup_cluster_survivors",
    "ols_per_nation",
    "fn_try_safe",
    "pipeline_training_corpus_v2",
    "hll_sketch_rollup",
    "schema_evolution_merge",
    "inverted_index_serve",
    "fn_variant_shred",
    "nearest_event_join",
    "merge_overlapping_intervals",
    # Remaining never-checked, highest-value first.
    "sql_exists_subquery",
    "cogroup_reconcile",
    "dedup_cluster_components",
    "dedup_incremental_batch",
    "decontaminate_train_set",
    "text_redact_pii",
    "window_dedup_keep_first",
    "aqp_revenue_estimate",
    "train_val_test_split",
    # ---- slot ~51+: r04 candidates (driver window ends near here) ----
    "text_tfidf",  # changed this round (broadcast n_docs); r02 green
    "outlier_orders_zscore",
    "agg_ewma_per_user",
    "funnel_conversion",
    "cohort_retention",
    "revenue_share_by_nation",
    "daily_events_zero_filled",
    "customer_rfm_segments",
    "nations_covering_all_segments",
    "dq_rule_violations",
    "join_cardinality_estimate",
    "histogram_equidepth",
    "join_key_skew_profile",
    "sample_stratified_by_source",
    "corpus_shuffle_interleave",
    "corpus_source_quota",
    "pack_sequences_greedy",
    "select_corpus_token_budget",
    "text_top_tokens",
    "quality_char_entropy",
    "quality_lm_trigram",
    "text_keyword_in_context",
    "embed_int8_quantize",
    "agg_approx_percentiles",
    "ann_pq_topk",
]


def _reorder() -> None:
    known = set(_R03_PRIORITY)
    ordered = [n for n in _R03_PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in known]
    for reg in (QUERIES, ORACLES):
        snap = {n: reg[n] for n in ordered if n in reg}
        reg.clear()
        reg.update(snap)


_load()
_reorder()

__all__ = ["QUERIES", "ORACLES"]
