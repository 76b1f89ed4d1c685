from hadoop_app_spark.streaming.events import (
    EVENTS_SCHEMA,
    dedup_stream,
    read_event_stream,
    run_to_memory_sink,
    session_aggregates,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_event_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_aggregates",
    "dedup_stream",
    "run_to_memory_sink",
]
