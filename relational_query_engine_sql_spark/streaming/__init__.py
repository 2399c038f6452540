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
    tumbling_aggregate,
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
    "tumbling_aggregate",
]
