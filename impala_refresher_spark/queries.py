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
# the FIRST 50 entries per round (r01-r04 each covered exactly the
# first 50 after that round's reorder; r04 = 49 green + the
# subsample_ci_revenue hash fail). Cumulative r01-r04 coverage
# (computed from the four CORRECTNESS_r0N.json files): 198 distinct
# names checked, 192 hash-green, 1 hash-fail (fixed this round),
# 4 checked pre-oracle as `no_oracle`, 43 oracled names never hash-
# checked. The r05 order drains that ENTIRE backlog in one window:
#
#   slot  1     : subsample_ci_revenue — the only driver hash failure
#                 ever; rewritten this round with exact integer-cents
#                 sufficient statistics (both engines now feed
#                 identical BIGINTs into an identical double chain).
#   slots  2-40 : the 39 SQL-oracled names never in any driver window
#                 (the parked-since-r02/r03 analytics/pipeline block
#                 plus hll_sketch_rollup and ann_pq_topk, whose
#                 oracles are new in r04).
#   slots 41-44 : the 4 names r02 checked as `no_oracle` BEFORE their
#                 portable-hash SQL oracles existed (md5-SimHash,
#                 md5-MinHash-LSH, seeded-hyperplane LSH, IVF) — their
#                 first-ever hash check.
#   slots 45-50 : re-verification insurance — queries whose code or
#                 oracle was touched in r05 (multimodal_features ADVICE
#                 None-guard; agg_stats_moments oracle annotation) and
#                 the VERDICT's money-magnitude ROUND(...,2) watch list
#                 (revenue_mom_change, cusum_daily_revenue,
#                 timeseries_decompose_daily, tpch_q22), re-swept
#                 locally under the r05-hardened fixed-decimal canon at
#                 sf0.01 AND sf0.1.
#
# After r05 the steady state is: every SQL-oracled query has a green
# driver row in some round; POLICY — any code change to a driver-green
# query re-queues it into the next round's 50-slot window (see
# SURVEY §7 verification schedule).
#
# The 2 rows-only queries (`agg_approx_percentiles`,
# `agg_approx_distinct` — native GK/HLL++ sketch API demos, engine-
# specific by definition) sit at the very tail so they never burn a
# window slot as `err: no_oracle`; their accuracy contracts live in
# pytest (tests/test_llm_ops.py).
_R05_PRIORITY = [
    # -- slot 1: the r04 hash failure, fixed this round -------------
    "subsample_ci_revenue",
    # -- slots 2-40: never in any driver window ----------------------
    "inverted_index_serve",
    "dedup_cluster_components",
    "dedup_cluster_survivors",
    "nearest_event_join",
    "merge_overlapping_intervals",
    "ols_per_nation",
    "fn_try_safe",
    "sql_exists_subquery",
    "cogroup_reconcile",
    "dedup_incremental_batch",
    "decontaminate_train_set",
    "text_redact_pii",
    "window_dedup_keep_first",
    "aqp_revenue_estimate",
    "train_val_test_split",
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
    "hll_sketch_rollup",
    "ann_pq_topk",
    # -- slots 41-44: r02-checked pre-oracle; first hash check -------
    "dedup_simhash",
    "dedup_minhash_lsh",
    "ann_lsh_topk",
    "ann_ivf_topk",
    # -- slots 45-50: r05 re-verification insurance ------------------
    "multimodal_features",
    "agg_stats_moments",
    "revenue_mom_change",
    "cusum_daily_revenue",
    "timeseries_decompose_daily",
    "tpch_q22_global_sales_opportunity",
    # -- the r01-r04 driver-green surface (unchanged code) -----------
    # Kept in r04 window order after the r05 window; every name below
    # has a green hash row in CORRECTNESS_r01-r04 at unchanged code.
    "sql_recursive_reachability",
    "sql_pipe_syntax_summary",
    "sql_parameterized_filter",
    "pandas_api_summary",
    "fn_structs",
    "stream_cdc_merge",
    "stream_stream_full_outer",
    "source_binaryfile_ingest",
    "survival_user_retention",
    "linear_counting_distinct",
    "trending_decayed_counts",
    "revenue_concentration_gini",
    "fuzzy_join_part_names",
    "entity_resolution_clusters",
    "bfs_event_transitions",
    "langid_confusion_kappa",
    "langid_precision_recall",
    "score_auc_quality",
    "score_gain_deciles",
    "chisq_segment_status",
    "anova_segment_acctbal",
    "mutual_information_lang_source",
    "ks_statistic_status",
    "profile_table_stats",
    "benford_first_digit",
    "mad_outlier_accounts",
    "time_weighted_avg_value",
    "gap_islands_active_days",
    "rolling_corr_qty_price",
    "cumulative_distinct_users",
    "fk_orphans_audit",
    "snapshot_diff_orders",
    "partition_checksums",
    "semdedup_embeddings",
    "corpus_mixture_temperature",
    "cms_frequency_estimate",
    "market_basket_pairs",
    "markov_event_transitions",
    "pareto_frontier_parts",
    "seasonal_dow_anomaly",
    "top_event_paths",
    "clamped_running_balance",
    "hhi_supplier_concentration",
    "pipeline_training_corpus_v2",
    "fn_variant_shred",
    "schema_evolution_merge",
    # -- rows-only by design: kept out of every driver window ------
    # (both exist to demonstrate Spark's NATIVE sketch APIs — GK
    # approx_percentile and HLL++ approx_count_distinct — whose
    # internals are engine-specific by definition; accuracy contracts
    # live in pytest. Portable twins ARE oracled: percentile_exact
    # shapes, linear_counting_distinct, hll_sketch_rollup.)
    "agg_approx_percentiles",
    "agg_approx_distinct",
]


def _reorder() -> None:
    known = set(_R05_PRIORITY)
    ordered = [n for n in _R05_PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in known]
    for reg in (QUERIES, ORACLES):
        snap = {n: reg[n] for n in ordered if n in reg}
        reg.clear()
        reg.update(snap)


_load()
_reorder()

__all__ = ["QUERIES", "ORACLES"]
