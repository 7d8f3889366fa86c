from impala_refresher_spark.streaming.windows import (
    enrich_with_customer,
    run_stream_to_memory,
    session_window_agg,
    sliding_window_agg,
    stateful_user_totals,
    stream_dedup,
    tumbling_window_counts,
    view_purchase_join,
    watermarked_counts,
)

__all__ = [
    "enrich_with_customer",
    "run_stream_to_memory",
    "session_window_agg",
    "sliding_window_agg",
    "stateful_user_totals",
    "stream_dedup",
    "tumbling_window_counts",
    "view_purchase_join",
    "watermarked_counts",
]
