"""seraster_spark — a from-scratch PySpark-native rasterization +
spatial-join engine with the capabilities of JEFworks-Lab/SEraster,
re-expressed Spark-first (closed-form tile encoding + single-shuffle
aggregation instead of materialized grids + spatial-index joins)."""

from .bbox import BBox, compute_bbox, grid_spec_for
from .datasets import rasterize_datasets, union_datasets
from .focal import (
    binomial_kernel,
    focal_stats,
    getis_ord_gi_star,
    grid_distance,
    grid_distance_coarse,
    label_regions,
    local_morans_i,
    morans_i,
    quadrat_vmr,
    terrain,
    viewshed,
)
from .grid import GridSpec
from .joins import asof_join, asof_join_bucketed, interval_join
from .knn import knn_join
from .sketch import (
    bloom_filter_build,
    bloom_filter_merge,
    bloom_maybe_contains,
    hash_sample,
    heavy_hitters,
    histogram_quantiles,
    kmv_distinct,
    md5_uniform,
)
from .permutate import angle_schedule, midrange_origin, permutate_by_rotation
from .pointpat import grid_centers, kde_raster, knox, nn_stats, pair_stats
from .rasterize import (
    RasterizedMatrix,
    assign_tiles,
    rasterize_cell_type,
    rasterize_gene_expression,
    rasterize_gene_expression_deterministic,
    rasterize_matrix,
    relative_enrichment,
    rollup_tiles,
    tile_meta,
)
from .segments import rasterize_segments, segment_tile_fractions
from .vector import (
    filter_by_polygon,
    raster_algebra,
    rasterize_polygons,
    spatial_join,
    spatial_join_corpus,
    tiles_geojson,
    write_geojson_lines,
    zonal_weighted,
    tiles_with_wkt,
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
    "rasterize_gene_expression_deterministic",
    "rasterize_matrix",
    "RasterizedMatrix",
    "relative_enrichment",
    "rollup_tiles",
    "permutate_by_rotation",
    "angle_schedule",
    "midrange_origin",
    "union_datasets",
    "rasterize_datasets",
    "knn_join",
    "asof_join",
    "asof_join_bucketed",
    "interval_join",
    "binomial_kernel",
    "focal_stats",
    "getis_ord_gi_star",
    "grid_distance",
    "grid_distance_coarse",
    "viewshed",
    "label_regions",
    "morans_i",
    "local_morans_i",
    "quadrat_vmr",
    "pair_stats",
    "nn_stats",
    "kde_raster",
    "knox",
    "grid_centers",
    "terrain",
    "heavy_hitters",
    "histogram_quantiles",
    "kmv_distinct",
    "md5_uniform",
    "hash_sample",
    "bloom_filter_build",
    "bloom_filter_merge",
    "bloom_maybe_contains",
    "spatial_join",
    "spatial_join_corpus",
    "raster_algebra",
    "rasterize_polygons",
    "rasterize_segments",
    "segment_tile_fractions",
    "filter_by_polygon",
    "tiles_with_wkt",
    "tiles_geojson",
    "write_geojson_lines",
    "zonal_weighted",
]
