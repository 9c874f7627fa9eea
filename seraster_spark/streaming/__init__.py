from .incremental import (
    drain_available_now_to_files,
    run_available_now,
    stream_rasterize_cell_type,
)

__all__ = [
    "stream_rasterize_cell_type",
    "run_available_now",
    "drain_available_now_to_files",
]
