from gmail_etl_spark.streaming.jobs import (
    dedup_events_stream,
    read_events_stream,
    read_raw_stream,
    stream_raw_to_stage1,
    windowed_event_counts,
)

__all__ = [
    "dedup_events_stream",
    "read_events_stream",
    "read_raw_stream",
    "stream_raw_to_stage1",
    "windowed_event_counts",
]
