"""Structured Streaming surface (beyond the reference, which is
batch-only — SURVEY.md §2.8: no windows/watermarks/streams there)."""

from .jobs import (decode_stream, dedup_stream, interval_join,
                   running_sum_stream, streaming_encode_sink,
                   windowed_event_counts)

__all__ = ["decode_stream", "dedup_stream", "interval_join",
           "running_sum_stream", "streaming_encode_sink",
           "windowed_event_counts"]
