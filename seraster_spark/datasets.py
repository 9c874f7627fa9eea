"""Multi-dataset (list-input) paths — reference list handling
(``R/main.R:292-341, 467-521``): several SPEs rasterized on ONE common grid,
output list names inherited from input names.

Spark shape: the named DataFrames are unioned with a ``dataset`` literal
column, the common bbox is a single aggregate over the union
(``R/main.R:294-308``), and the kernel runs once with
``group_cols=["dataset"]`` — all datasets in one shuffle instead of the
reference's sequential per-dataset lapply (``R/main.R:311``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .bbox import grid_spec_for
from .grid import GridSpec
from .rasterize import rasterize_cell_type, rasterize_gene_expression


def union_datasets(datasets: dict[str, DataFrame]) -> DataFrame:
    """Tag each named DataFrame and union them (name inheritance: the
    ``dataset`` column IS the list name, R/main.R:336-338)."""
    if not datasets:
        raise ValueError("datasets must be a non-empty dict of name -> DataFrame")
    out = None
    for name, df in datasets.items():
        tagged = df.withColumn("dataset", F.lit(name))
        out = tagged if out is None else out.unionByName(tagged)
    return out


def rasterize_datasets(
    datasets: dict[str, DataFrame],
    resolution: float = 100.0,
    square: bool = True,
    fun: str = "sum",
    kind: str = "cell_type",
    **kwargs,
) -> DataFrame:
    """Rasterize a named list of document sets on one shared grid.

    Returns one tiles DataFrame with a ``dataset`` column; per-dataset
    results are ``.filter(F.col('dataset') == name)`` — same content as the
    reference's per-SPE outputs (R/main.R:327-331)."""
    u = union_datasets(datasets)
    spec = kwargs.pop("spec", None) or grid_spec_for(u, resolution, square=square)
    fn = rasterize_cell_type if kind == "cell_type" else rasterize_gene_expression
    return fn(
        u, resolution, square=square, fun=fun, group_cols=["dataset"], spec=spec, **kwargs
    )
