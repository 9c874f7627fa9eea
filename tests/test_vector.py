"""raster<->vector round-trip tests (reference keeps polygons in colData,
R/main.R:191-193; engine synthesizes them in closed form)."""

import json

import numpy as np
from pyspark.sql import functions as F

from seraster_spark import rasterize, vector
from seraster_spark.bbox import grid_spec_for
from seraster_spark.grid import point_in_polygon


def test_tiles_with_wkt(spark, docs):
    spec = grid_spec_for(docs, 100.0, square=True)
    tiles = rasterize.rasterize_cell_type(docs, 100.0, fun="sum", spec=spec)
    wkts = vector.tiles_with_wkt(tiles, spec).select("cell_id", "geometry_wkt").distinct()
    pdf = wkts.toPandas()
    assert pdf["geometry_wkt"].str.startswith("POLYGON ((").all()
    # one WKT per tile
    assert pdf["cell_id"].nunique() == len(pdf)


def test_geojson_export(spark, docs):
    spec = grid_spec_for(docs, 200.0, square=False)
    tiles = (
        rasterize.rasterize_cell_type(docs, 200.0, spec=spec, fun="sum")
        .select("cell_id", "num_cell")
        .distinct()
    )
    gj = json.loads(vector.tiles_geojson(tiles, spec))
    assert gj["type"] == "FeatureCollection"
    assert len(gj["features"]) == tiles.count()
    f0 = gj["features"][0]
    ring = f0["geometry"]["coordinates"][0]
    assert len(ring) == 7 and ring[0] == ring[-1]  # closed hex
    assert "num_cell" in f0["properties"]


def test_filter_by_polygon_vs_oracle(spark, docs, docs_pdf):
    spec = grid_spec_for(docs, 100.0, square=True)
    ring = [(500.0, 300.0), (1500.0, 400.0), (1400.0, 1500.0), (600.0, 1300.0)]
    with_cell = rasterize.assign_tiles(docs, spec)
    got = set(
        r[0]
        for r in vector.filter_by_polygon(with_cell, ring, spec).select("doc_id").collect()
    )
    closed = np.array(ring + [ring[0]], dtype=float)
    inside = point_in_polygon(
        docs_pdf.x.to_numpy(), docs_pdf.y.to_numpy(), closed
    )
    exp = set(docs_pdf.doc_id[inside])
    assert got == exp


def test_coarse_filter_superset(spark, docs):
    spec = grid_spec_for(docs, 100.0, square=True)
    ring = [(500.0, 300.0), (1500.0, 400.0), (1400.0, 1500.0), (600.0, 1300.0)]
    with_cell = rasterize.assign_tiles(docs, spec)
    coarse = vector.filter_by_polygon(with_cell, ring, spec, exact=False)
    exact = vector.filter_by_polygon(with_cell, ring, spec, exact=True)
    assert exact.join(coarse, "doc_id", "left_anti").count() == 0


import pytest as _pytest


@_pytest.mark.parametrize("square", [True, False])
def test_geojson_lines_writer_matches_driver_export(spark, docs, tmp_path, square):
    """Distributed GeoJSONL sink: same features (geometry + properties) as
    the driver-side FeatureCollection export, one JSON Feature per line,
    written without any driver collect — square (5-point rings) and hex
    (7-point rings)."""
    spec = grid_spec_for(docs, 200.0, square=square)
    tiles = (
        rasterize.rasterize_cell_type(docs, 200.0, spec=spec, fun="sum")
        .select("cell_id", "num_cell")
        .distinct()
    )
    path = str(tmp_path / f"gjl_{square}")
    vector.write_geojson_lines(tiles, spec, path)
    lines = [json.loads(r["value"]) for r in spark.read.text(path).collect()]
    gj = json.loads(vector.tiles_geojson(tiles, spec))

    def key(feat):
        return json.dumps(feat["geometry"]) + "|" + str(feat["properties"]["num_cell"])

    assert sorted(map(key, lines)) == sorted(map(key, gj["features"]))
    assert all(f["type"] == "Feature" for f in lines)


def test_tiles_geojson_row_cap(spark, docs):
    import pytest

    spec = grid_spec_for(docs, 100.0, square=True)
    tiles = (
        rasterize.rasterize_cell_type(docs, 100.0, spec=spec, fun="sum")
        .select("cell_id", "num_cell")
        .distinct()
    )
    with pytest.raises(ValueError, match="max_rows"):
        vector.tiles_geojson(tiles, spec, max_rows=5)


def test_geojson_lines_null_properties_serialized(spark, docs):
    """NULL property values must appear as explicit JSON nulls (to_json
    drops them by default — per-line schema drift vs the driver export)."""
    spec = grid_spec_for(docs, 500.0, square=True)
    tiles = (
        rasterize.rasterize_cell_type(docs, 500.0, spec=spec, fun="sum")
        .select("cell_id", F.lit(None).cast("string").alias("tag"), "num_cell")
        .distinct()
    )
    import tempfile, os
    out = os.path.join(tempfile.mkdtemp(), "gjl_null")
    vector.write_geojson_lines(tiles, spec, out)
    feats = [json.loads(r["value"]) for r in spark.read.text(out).collect()]
    assert all("tag" in f["properties"] and f["properties"]["tag"] is None for f in feats)
