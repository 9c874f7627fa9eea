from .incremental import stream_rasterize_cell_type, run_available_now

__all__ = ["stream_rasterize_cell_type", "run_available_now"]
