"""Raster ↔ vector round-trips.

Raster → vector: every tile polygonized to WKT / GeoJSON in closed form from
its cell id (reference keeps sfc_POLYGON geometry in colData,
``R/main.R:191-193``; we synthesize the ring on demand instead of ever
materializing a grid).

Vector → raster: a polygon is mapped to its covering cell set (bbox → ring of
candidate cells → centroid-in-polygon filter + vertex cells), then used as a
semi-join filter on the documents table — an equi-join on cell_id, never a
per-row geometry test against the big table.
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame, functions as F

from .grid import GridSpec, covering_cells, polygon_vertices
from .udfs import wkt_udf


def tiles_with_wkt(tiles: DataFrame, spec: GridSpec, decimals: int = 6) -> DataFrame:
    """Attach a ``geometry_wkt`` column (Arrow-batched numpy polygonizer)."""
    return tiles.withColumn("geometry_wkt", wkt_udf(spec, decimals)(F.col("cell_id")))


def tiles_geojson(tiles: DataFrame, spec: GridSpec, properties: list[str] | None = None) -> str:
    """Driver-side GeoJSON FeatureCollection export of a (small) tiles result.

    Distributed part = the tiles DataFrame itself; the serialization is a
    driver sink like the reference's plot path (R/main.R:791-849).
    """
    props = properties or [c for c in tiles.columns if c != "cell_id"]
    rows = tiles.select("cell_id", *props).collect()
    cell_ids = np.array([r["cell_id"] for r in rows], dtype=np.int64)
    verts = polygon_vertices(cell_ids, spec) if len(rows) else np.zeros((0, 5, 2))
    feats = []
    for r, ring in zip(rows, verts):
        feats.append(
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[float(vx), float(vy)] for vx, vy in ring]],
                },
                "properties": {p: r[p] for p in props},
            }
        )
    return json.dumps({"type": "FeatureCollection", "features": feats})


def polygon_covering_cells(ring_vertices: list[tuple[float, float]], spec: GridSpec) -> list[int]:
    """Driver-side: cell ids covering a polygon (closed ring). Small result —
    the grid arithmetic is O(bbox cells), not O(data)."""
    ring = np.asarray(ring_vertices, dtype=np.float64)
    if not (ring[0] == ring[-1]).all():
        ring = np.vstack([ring, ring[:1]])
    return [int(c) for c in covering_cells(ring, spec)]


def filter_by_polygon(
    docs_with_cell: DataFrame,
    ring_vertices: list[tuple[float, float]],
    spec: GridSpec,
    exact: bool = True,
) -> DataFrame:
    """Vector → raster join: keep docs inside the polygon.

    Stage 1 (coarse): semi-join on the covering cell set (partition-prunable,
    pure equi-join). Stage 2 (exact, optional): vectorized ray-casting PIP on
    the survivors only — the expensive geometry test touches a tiny fraction
    of the table.
    """
    cells = polygon_covering_cells(ring_vertices, spec)
    coarse = docs_with_cell.filter(F.col("cell_id").isin(cells))
    if not exact:
        return coarse
    from .udfs import pip_udf

    ring = list(ring_vertices)
    if ring[0] != ring[-1]:
        ring = ring + [ring[0]]
    return coarse.filter(pip_udf(ring)(F.col("x"), F.col("y")))
