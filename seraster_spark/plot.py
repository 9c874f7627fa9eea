"""Driver-side plotRaster analogue (reference ``R/main.R:791-849``).

The distributed part is the per-tile reduction (sum / mean / single-feature
select — main.R:805-813); rendering is a driver sink over the (small) tiles
result, matplotlib if available. Correctness-irrelevant; kept thin."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .grid import GridSpec, polygon_vertices


def reduce_tiles(
    tiles: DataFrame, feature_name: str = "sum", value_col: str = "pixelval"
) -> DataFrame:
    """Feature reduction per tile: 'sum' → colSums, 'mean' → colMeans,
    else select a single feature row (main.R:805-813)."""
    if feature_name == "sum":
        return tiles.groupBy("cell_id", "cx", "cy").agg(F.sum(value_col).alias("val"))
    if feature_name == "mean":
        return tiles.groupBy("cell_id", "cx", "cy").agg(F.avg(value_col).alias("val"))
    return tiles.filter(
        (F.col("feature") == feature_name)
        if "feature" in tiles.columns
        else (F.col("kind") == feature_name)
    ).select("cell_id", "cx", "cy", F.col(value_col).alias("val"))


def plot_raster(
    tiles: DataFrame,
    spec: GridSpec,
    feature_name: str = "sum",
    value_col: str = "pixelval",
    title: str | None = None,
    out_path: str | None = None,
):
    """Render tile polygons colored by the reduced value. Returns the
    matplotlib figure (or raises ImportError if matplotlib is absent)."""
    import numpy as np

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.collections import PolyCollection
    except ImportError as e:  # pragma: no cover
        raise ImportError("plot_raster needs matplotlib (driver-side only)") from e

    pdf = reduce_tiles(tiles, feature_name, value_col).toPandas()
    cells = pdf["cell_id"].to_numpy(np.int64)
    verts = polygon_vertices(cells, spec)[:, :-1, :]  # drop closing vertex
    fig, ax = plt.subplots(figsize=(8, 6))
    pc = PolyCollection(list(verts), array=pdf["val"].to_numpy(), cmap="viridis")
    ax.add_collection(pc)
    ax.autoscale()
    ax.set_aspect("equal")
    fig.colorbar(pc, ax=ax, label=feature_name)
    if title:
        ax.set_title(title)
    if out_path:
        fig.savefig(out_path, dpi=100)
    return fig
