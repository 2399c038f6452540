from .events import (
    dedup_stream,
    read_events_stream,
    sessionize_batch,
    sessionized_stream,
    sliding_counts,
    stateful_running_totals,
    tumbling_aggregate,
)

__all__ = [
    "dedup_stream",
    "read_events_stream",
    "sessionize_batch",
    "sessionized_stream",
    "sliding_counts",
    "stateful_running_totals",
    "tumbling_aggregate",
]
