"""Structured Streaming wrappers over the engine's semantics."""

from ctcityscraper_spark.streaming.events import (
    sliding_window_counts,
    stream_from_directory,
    tumbling_window_agg,
    write_scd2_stream,
)
from ctcityscraper_spark.streaming.stateful import (
    streaming_change_filter,
    streaming_sessionize,
)

__all__ = [
    "sliding_window_counts",
    "stream_from_directory",
    "tumbling_window_agg",
    "write_scd2_stream",
    "streaming_change_filter",
    "streaming_sessionize",
]
