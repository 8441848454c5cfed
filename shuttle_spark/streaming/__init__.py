from shuttle_spark.streaming.core import (
    events_stream,
    events_stream_multi,
    run_available_now,
    run_stream_decontaminate,
    run_upsert_sink,
    staged_documents_files,
    staged_events_files,
    session_agg_stream,
    stream_dedup,
    stream_keep_latest,
    stream_stream_join,
    windowed_agg_stream,
)

__all__ = [
    "events_stream",
    "events_stream_multi",
    "run_available_now",
    "run_stream_decontaminate",
    "run_upsert_sink",
    "staged_documents_files",
    "staged_events_files",
    "session_agg_stream",
    "stream_dedup",
    "stream_keep_latest",
    "stream_stream_join",
    "windowed_agg_stream",
]
