from .incremental import (
    drain_available_now_to_files,
    run_available_now,
    stream_enriched_counts,
    stream_stream_interval_join,
    stream_event_sessions,
    stream_rasterize_cell_type,
)

__all__ = [
    "stream_rasterize_cell_type",
    "stream_event_sessions",
    "stream_enriched_counts",
    "stream_stream_interval_join",
    "run_available_now",
    "drain_available_now_to_files",
]
