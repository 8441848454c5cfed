from shuttle_spark.streaming.core import (
    events_stream,
    run_available_now,
    session_agg_stream,
    stream_dedup,
    stream_keep_latest,
    stream_stream_join,
    windowed_agg_stream,
)

__all__ = [
    "events_stream",
    "run_available_now",
    "session_agg_stream",
    "stream_dedup",
    "stream_keep_latest",
    "stream_stream_join",
    "windowed_agg_stream",
]
