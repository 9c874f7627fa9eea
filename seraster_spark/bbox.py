"""Bounding-box aggregates with the reference's half-pixel pad.

Reference semantics (``R/main.R:345-351``; common bbox for list inputs
``R/main.R:294-308``):

    xmin = floor(min(x) - res/2);  xmax = ceiling(max(x) + res/2)
    (same for y)

For multi-dataset / multi-permutation inputs the bbox is computed over the
UNION of all coordinates so every dataset shares one grid
(``R/main.R:294-308``; vignette:245). The bbox is a single 4-number aggregate
— one job, one row collected, then broadcast to executors inside the
GridSpec closure.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .grid import GridSpec


@dataclass(frozen=True)
class BBox:
    xmin: float
    ymin: float
    xmax: float
    ymax: float

    def padded(self, resolution: float) -> "BBox":
        """Reference pad: floor(min - res/2) / ceil(max + res/2)
        (``R/main.R:346-351``)."""
        h = resolution / 2.0
        return BBox(
            xmin=math.floor(self.xmin - h),
            ymin=math.floor(self.ymin - h),
            xmax=math.ceil(self.xmax + h),
            ymax=math.ceil(self.ymax + h),
        )


def compute_bbox(df: DataFrame, x_col: str = "x", y_col: str = "y") -> BBox:
    """Global min/max aggregate — one row collected to the driver."""
    row = df.agg(
        F.min(x_col).alias("xmin"),
        F.min(y_col).alias("ymin"),
        F.max(x_col).alias("xmax"),
        F.max(y_col).alias("ymax"),
    ).collect()[0]
    if row["xmin"] is None:
        raise ValueError("cannot compute bbox of an empty DataFrame")
    return BBox(float(row["xmin"]), float(row["ymin"]), float(row["xmax"]), float(row["ymax"]))


def grid_spec_for(
    df: DataFrame,
    resolution: float,
    square: bool = True,
    level: int = 0,
    x_col: str = "x",
    y_col: str = "y",
    bbox: BBox | None = None,
) -> GridSpec:
    """Compute the padded common bbox and freeze it into a GridSpec.

    Emits the reference's sanity warning when resolution exceeds the data
    extent (``R/main.R:120-124``).
    """
    raw = bbox or compute_bbox(df, x_col, y_col)
    pad = raw.padded(resolution)
    # warn against the RAW data extent (the padded one grows by `resolution`
    # by construction and would never trigger)
    extent_x = raw.xmax - raw.xmin
    extent_y = raw.ymax - raw.ymin
    if resolution >= min(extent_x, extent_y):
        import warnings

        warnings.warn(
            f"resolution {resolution} >= data extent ({extent_x} x {extent_y}); "
            "the whole dataset may fall into very few tiles (R/main.R:120-124)"
        )
    return GridSpec(
        xmin=pad.xmin,
        ymin=pad.ymin,
        xmax=pad.xmax,
        ymax=pad.ymax,
        resolution=float(resolution),
        square=square,
        level=level,
    )
