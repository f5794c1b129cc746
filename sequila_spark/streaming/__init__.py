from sequila_spark.streaming.ops import (
    read_events_stream,
    windowed_event_agg,
    windowed_read_counts,
    window_coverage,
    window_mismatches,
    sessionize,
    sessionize_stream,
    running_user_totals_stream,
)

__all__ = [
    "read_events_stream",
    "windowed_event_agg",
    "windowed_read_counts",
    "window_coverage",
    "window_mismatches",
    "sessionize",
    "sessionize_stream",
    "running_user_totals_stream",
]
