"""seraster_spark — a from-scratch PySpark-native rasterization +
spatial-join engine with the capabilities of JEFworks-Lab/SEraster,
re-expressed Spark-first (closed-form tile encoding + single-shuffle
aggregation instead of materialized grids + spatial-index joins)."""

from .bbox import BBox, compute_bbox, grid_spec_for
from .grid import GridSpec
from .permutate import angle_schedule, midrange_origin, permutate_by_rotation
from .rasterize import (
    assign_tiles,
    rasterize_cell_type,
    rasterize_gene_expression,
    relative_enrichment,
    tile_meta,
)

__all__ = [
    "BBox",
    "GridSpec",
    "compute_bbox",
    "grid_spec_for",
    "assign_tiles",
    "tile_meta",
    "rasterize_cell_type",
    "rasterize_gene_expression",
    "relative_enrichment",
    "permutate_by_rotation",
    "angle_schedule",
    "midrange_origin",
]
