from .events import (
    attribution_stream,
    dedup_events_stream,
    enriched_stream,
    hourly_tumbling_counts_stream,
    read_events_stream,
    run_stream_to_memory,
    sliding_counts_stream,
)
from .sink import stream_merge_to_table
from .stateful import sessionize_stream

__all__ = [
    "read_events_stream",
    "hourly_tumbling_counts_stream",
    "sliding_counts_stream",
    "dedup_events_stream",
    "attribution_stream",
    "enriched_stream",
    "run_stream_to_memory",
    "sessionize_stream",
    "stream_merge_to_table",
]
