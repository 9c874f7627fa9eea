"""Multi-dataset list-path tests (reference R/main.R:292-341;
test-main.R:63-68, 83-88: names inherited, common grid shared)."""

import warnings

import pytest
from pyspark.sql import functions as F

from seraster_spark import fixtures
from seraster_spark.bbox import grid_spec_for
from seraster_spark.datasets import rasterize_datasets, union_datasets


@pytest.fixture(scope="module")
def two_sets(spark):
    a = fixtures.documents_df(spark, n=400, seed=1, skew=False)
    b = fixtures.documents_df(spark, n=300, seed=2, skew=False)
    return {"setA": a, "setB": b}


def test_names_inherited(spark, two_sets):
    tiles = rasterize_datasets(two_sets, 100.0, fun="sum")
    names = {r[0] for r in tiles.select("dataset").distinct().collect()}
    assert names == {"setA", "setB"}


def test_common_grid_shared(spark, two_sets):
    """Both datasets bin on ONE bbox: a tile id present in both datasets has
    identical centroid — and the union bbox is at least as wide as each
    dataset's own (R/main.R:294-308)."""
    tiles = rasterize_datasets(two_sets, 100.0, fun="sum")
    per_tile = tiles.groupBy("cell_id").agg(
        F.countDistinct("cx").alias("nx"), F.countDistinct("cy").alias("ny")
    )
    assert per_tile.filter((F.col("nx") != 1) | (F.col("ny") != 1)).count() == 0
    u = union_datasets(two_sets)
    union_spec = grid_spec_for(u, 100.0)
    a_spec = grid_spec_for(two_sets["setA"], 100.0)
    assert union_spec.xmin <= a_spec.xmin and union_spec.xmax >= a_spec.xmax


def test_per_dataset_totals(spark, two_sets):
    tiles = rasterize_datasets(two_sets, 100.0, fun="sum")
    tot = (
        tiles.select("dataset", "cell_id", "num_cell")
        .distinct()
        .groupBy("dataset")
        .agg(F.sum("num_cell").alias("t"))
        .collect()
    )
    d = {r["dataset"]: r["t"] for r in tot}
    assert d == {"setA": 400, "setB": 300}


def test_resolution_extent_warning(spark, two_sets):
    """W1 (R/main.R:120-124): resolution >= extent warns."""
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        grid_spec_for(two_sets["setA"], 50000.0)
    assert any("resolution" in str(x.message) for x in w)
