from .events import (
    EVENTS_TABLE_SCHEMA,
    dedup_stream,
    ingest_stream_to_table,
    purchase_click_attribution,
    read_events_stream,
    sessionize_batch,
    sessionized_stream,
    sliding_counts,
    stateful_running_totals,
    stateful_user_stats_tws,
    tumbling_aggregate,
    user_stats_batch,
)

__all__ = [
    "EVENTS_TABLE_SCHEMA",
    "dedup_stream",
    "ingest_stream_to_table",
    "purchase_click_attribution",
    "read_events_stream",
    "sessionize_batch",
    "sessionized_stream",
    "sliding_counts",
    "stateful_running_totals",
    "stateful_user_stats_tws",
    "tumbling_aggregate",
    "user_stats_batch",
]
