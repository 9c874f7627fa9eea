"""Driver-side plotRaster analogue (reference ``R/main.R:791-849``).

The distributed part is the per-tile reduction (sum / mean / single-feature
select — main.R:805-813); rendering is a driver sink over the (small) tiles
result, matplotlib if available. Correctness-irrelevant; kept thin."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .grid import GridSpec, polygon_vertices


def _feature_col(tiles: DataFrame) -> str | None:
    if "feature" in tiles.columns:
        return "feature"
    if "kind" in tiles.columns:
        return "kind"
    return None


def reduce_tiles(
    tiles: DataFrame, feature_name: str = "sum", value_col: str = "pixelval"
) -> DataFrame:
    """Feature reduction per tile: 'sum' → colSums, 'mean' → colMeans,
    else select a single feature row (main.R:805-813).

    'mean' divides the per-tile sum by the TOTAL feature count — the
    reference's ``colMeans`` over the dense matrix, where a feature absent
    from a tile is a structural zero in the denominator (main.R:807-808) —
    not by the count of present (tile, feature) rows."""
    if feature_name == "sum":
        return tiles.groupBy("cell_id", "cx", "cy").agg(F.sum(value_col).alias("val"))
    if feature_name == "mean":
        feat = _feature_col(tiles)
        if feat is None:  # no feature dimension → plain per-tile mean
            return tiles.groupBy("cell_id", "cx", "cy").agg(F.avg(value_col).alias("val"))
        n_feat = tiles.select(F.countDistinct(feat).alias("_nf"))
        return (
            tiles.groupBy("cell_id", "cx", "cy")
            .agg(F.sum(value_col).alias("_s"))
            .crossJoin(F.broadcast(n_feat))
            .select("cell_id", "cx", "cy", (F.col("_s") / F.col("_nf")).alias("val"))
        )
    feat = _feature_col(tiles)
    if feat is None:
        raise ValueError(
            f"feature_name {feature_name!r} given but tiles have no feature/kind column"
        )
    sel = tiles.filter(F.col(feat) == feature_name)
    # eager validation mirroring the reference's stopifnot (main.R:810-811)
    if sel.limit(1).isEmpty():
        raise ValueError(
            f"feature_name {feature_name!r} does not exist in the input "
            f"(column {feat!r}; R/main.R:810-811)"
        )
    return sel.select("cell_id", "cx", "cy", F.col(value_col).alias("val"))


def plot_raster(
    tiles: DataFrame,
    spec: GridSpec,
    feature_name: str = "sum",
    value_col: str = "pixelval",
    factor_levels: list | None = None,
    show_legend: bool = True,
    show_axis: bool = True,
    title: str | None = None,
    out_path: str | None = None,
):
    """Render tile polygons colored by the reduced value. Returns the
    matplotlib figure (or raises ImportError if matplotlib is absent).

    ``factor_levels`` switches to the reference's discrete mode
    (main.R:815-830): values are treated as categorical in the given level
    order and colored with a discrete viridis palette (scale_fill_viridis_d);
    values absent from the levels are coerced to NA and rendered grey50,
    exactly like R's ``factor(fill, levels=...)`` (main.R:822);
    ``show_legend``/``show_axis`` mirror showLegend/showAxis
    (main.R:832-849)."""
    import numpy as np
    from pandas import isna as pd_isna

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
    if factor_levels is not None:
        cmap = matplotlib.colormaps["viridis"].resampled(max(len(factor_levels), 1))
        level_idx = {lv: i for i, lv in enumerate(factor_levels)}
        idx = pdf["val"].map(level_idx)
        # reference parity: factor(fill, levels=...) coerces values absent
        # from the levels to NA and still renders (R/main.R:822); ggplot's
        # default na.value is grey50
        _NA_COLOR = (0.5, 0.5, 0.5, 1.0)
        pc = PolyCollection(
            list(verts),
            facecolors=[
                _NA_COLOR if pd_isna(i) else cmap(int(i)) for i in idx.to_numpy()
            ],
        )
        ax.add_collection(pc)
        if show_legend:
            from matplotlib.patches import Patch

            ax.legend(
                handles=[
                    Patch(facecolor=cmap(i), label=str(lv))
                    for lv, i in level_idx.items()
                ],
                title=feature_name,
                loc="upper right",
            )
    else:
        pc = PolyCollection(list(verts), array=pdf["val"].to_numpy(), cmap="viridis")
        ax.add_collection(pc)
        if show_legend:
            fig.colorbar(pc, ax=ax, label=feature_name)
    ax.autoscale()
    ax.set_aspect("equal")
    if not show_axis:
        ax.set_axis_off()
    if title:
        ax.set_title(title)
    if out_path:
        fig.savefig(out_path, dpi=100)
    return fig
