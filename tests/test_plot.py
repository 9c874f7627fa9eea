"""plotRaster parity: reduction semantics (colSums/colMeans/single feature,
R/main.R:805-813) and discrete factor mode (R/main.R:815-830)."""

import pytest
from pyspark.sql import functions as F

from seraster_spark import plot, rasterize
from seraster_spark.bbox import grid_spec_for

RES = 100.0


def test_reduce_mean_is_colmeans(spark, docs):
    """'mean' divides by the TOTAL feature count (reference colMeans over the
    dense matrix — absent features are structural zeros in the denominator),
    not by the per-tile present-feature count."""
    tiles = rasterize.rasterize_cell_type(docs, RES, fun="sum")
    n_kinds = tiles.select("kind").distinct().count()
    got = {r["cell_id"]: r["val"] for r in plot.reduce_tiles(tiles, "mean").collect()}
    sums = {
        r["cell_id"]: r["s"]
        for r in tiles.groupBy("cell_id").agg(F.sum("pixelval").alias("s")).collect()
    }
    assert got.keys() == sums.keys()
    for cid, v in got.items():
        assert v == pytest.approx(sums[cid] / n_kinds)


def test_reduce_single_feature_validates(spark, docs):
    tiles = rasterize.rasterize_cell_type(docs, RES, fun="sum")
    with pytest.raises(ValueError, match="does not exist"):
        plot.reduce_tiles(tiles, "no_such_kind").collect()
    one = plot.reduce_tiles(tiles, "sum")
    assert one.count() == tiles.select("cell_id").distinct().count()


def test_plot_raster_discrete_factor_levels(spark, docs, tmp_path):
    pytest.importorskip("matplotlib")
    spec = grid_spec_for(docs, RES, square=True)
    tiles = rasterize.rasterize_cell_type(docs, RES, fun="sum", spec=spec)
    re = rasterize.relative_enrichment(tiles).join(
        tiles.select("cell_id", "kind", "cx", "cy").distinct(), ["cell_id", "kind"]
    )
    one_kind = re.filter(F.col("kind") == "ct00").withColumn(
        "pixelval", F.col("re_bin").cast("string")
    )
    fig = plot.plot_raster(
        one_kind.withColumn("kind", F.lit("re_bin")),
        spec,
        feature_name="re_bin",
        factor_levels=["0", "1"],
        show_legend=True,
        show_axis=False,
        title="binarized RE",
        out_path=str(tmp_path / "re.png"),
    )
    assert (tmp_path / "re.png").exists()
    assert fig is not None
    # values absent from factor_levels render as NA (grey50) — the
    # reference's factor(fill, levels=...) coercion (R/main.R:822)
    fig_na = plot.plot_raster(
        one_kind.withColumn("kind", F.lit("re_bin")),
        spec,
        feature_name="re_bin",
        factor_levels=["1"],  # '0' values coerce to NA, still rendered
    )
    pc = fig_na.axes[0].collections[0]
    colors = pc.get_facecolors()
    grey = [c for c in colors if abs(c[0] - 0.5) < 1e-9 and abs(c[1] - 0.5) < 1e-9]
    assert len(grey) > 0  # the out-of-level tiles are grey50
    assert len(grey) < len(colors)  # the in-level tiles are not
