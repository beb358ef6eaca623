from tagminder_spark.streaming.ingest import (
    run_stream_to_memory,
    sessionized_stream,
    windowed_event_counts,
)

__all__ = [
    "run_stream_to_memory",
    "sessionized_stream",
    "windowed_event_counts",
]
