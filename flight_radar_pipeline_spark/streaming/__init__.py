"""Structured Streaming surface."""

from flight_radar_pipeline_spark.streaming.events import (
    hourly_counts_stream,
    read_events_stream,
    run_stream_to_memory,
)

__all__ = ["read_events_stream", "hourly_counts_stream", "run_stream_to_memory"]
