from sum_spark.streaming.windows import (
    dedup_events,
    read_event_stream,
    run_to_memory,
    sessionized,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "dedup_events",
    "read_event_stream",
    "run_to_memory",
    "sessionized",
    "sliding_counts",
    "tumbling_counts",
]
