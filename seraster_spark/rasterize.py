"""Core rasterization operators — SEraster's kernel re-expressed as
single-shuffle Spark aggregation.

Reference dataflow (``R/main.R:98-197`` ``rasterizeMatrix``): materialize a
polygon grid → spatial-index join points→pixels → per-pixel task fan-out
(``bplapply``) slicing the matrix → driver-side assembly. The Spark engine
replaces all of that with:

    docs → cell_id = closed-form encode (JVM Column math or Arrow UDF)
         → ONE hash aggregate groupBy(cell_id[, feature]) with map-side
           partial combine
         → broadcast-join per-tile num_cell (mean denominator)
         → project centroid / pixel name / WKT (all closed-form)

Semantics preserved from the reference:

* ``fun="mean"`` divides by the number of docs in the tile — including docs
  with a structural zero for the feature — NOT by the count of present
  triplets (``R/main.R:146-150``; SURVEY.md §2.1-A1). So mean =
  sum(value) / num_cell, never ``F.avg``.
* Empty tiles are dropped, so #tiles ≤ #docs (``R/main.R:179``;
  test-main.R:46) — a natural consequence of groupBy.
* Tile roster ``cellID_list`` is sorted for determinism (``R/main.R:155``;
  collect_list is order-nondeterministic → always sort_array).
* Pixel names follow full-grid row-major numbering, 1-based, and keep their
  index after empty tiles are dropped (``R/main.R:127-129,175``).
* Output carries ``type`` ∈ {square,hexagon} and ``resolution`` literals
  (``R/main.R:183-189``).

Scale notes (100 TB design):

* The heavy ``spans`` payload NEVER enters the shuffle: aggregation runs on a
  slim (cell_id, kind / feature, value) projection; Parquet column pruning
  keeps spans off the scan wherever the query doesn't need them.
* sum/count aggregates get map-side partial combine for free; the only
  skew-sensitive aggregate is ``collect_list`` (roster), which supports a
  salted two-phase mode (``salt_buckets``) — stage 1 groupBy(cell_id, salt)
  builds partial lists, stage 2 flattens; AQE skew-join splitting covers the
  join side.
* num_cell side-table is broadcast (tiles ≪ docs — the premise of
  rasterization); at extreme tile cardinality pass broadcast_meta=False to
  fall back to a shuffled join co-partitioned on cell_id.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from . import expressions as X
from .bbox import BBox, grid_spec_for
from .grid import GridSpec
from .udfs import cell_id_udf

VALID_FUNS = ("sum", "mean")


def _resolve_assay(
    docs: DataFrame,
    assay_col: str | None,
    assay_name: str | None,
    validate: bool = True,
) -> DataFrame:
    """Reference assay selection semantics (``R/main.R:315-321,354-359``):
    validate ``assay_name`` against the assays actually present (eager, one
    column-pruned distinct over a low-cardinality column) and default to the
    first (lexicographically, for determinism — a DataFrame has no slot
    order) when unspecified.

    ``validate=False`` skips the eager distinct job entirely (for callers
    looping over many rasterizations of the same validated input) — then
    ``assay_name`` must be explicit, since the default-to-first rule is what
    needs the distinct; a misspelled assay simply yields an empty result,
    exactly like any other non-matching filter."""
    if assay_col is None:
        if assay_name is not None:
            raise ValueError("assay_name given but no assay_col to select on")
        return docs
    if not validate:
        if assay_name is None:
            raise ValueError(
                "validate_assay=False requires an explicit assay_name (the "
                "default-to-first rule needs the eager distinct scan)"
            )
        return docs.filter(F.col(assay_col) == assay_name)
    avail = sorted(
        v for (v,) in docs.select(assay_col).distinct().collect() if v is not None
    )
    if not avail:
        raise ValueError(f"assay column {assay_col!r} has no non-null values")
    if assay_name is None:
        assay_name = avail[0]
    elif assay_name not in avail:
        raise ValueError(
            f"assay_name {assay_name!r} does not exist in the input; "
            f"available: {avail} (R/main.R:318-319)"
        )
    return docs.filter(F.col(assay_col) == assay_name)


def assign_tiles(
    df: DataFrame,
    spec: GridSpec,
    x_col: str = "x",
    y_col: str = "y",
    out_col: str = "cell_id",
    use_udf: bool = False,
) -> DataFrame:
    """Attach the closed-form tile id. Default path is pure Column math
    (whole-stage codegen); ``use_udf=True`` routes through the Arrow-batched
    numpy kernel instead (bit-identical; used for cross-checks)."""
    if use_udf:
        return df.withColumn(out_col, cell_id_udf(spec)(F.col(x_col), F.col(y_col)))
    return df.withColumn(out_col, X.cell_id_expr(F.col(x_col), F.col(y_col), spec))


def _with_tile_decor(tiles: DataFrame, spec: GridSpec) -> DataFrame:
    """Add centroid, pixel name, type, resolution (R/main.R:127-129,183-189)."""
    cx, cy = X.centroid_expr(F.col("cell_id"), spec)
    idx = X.grid_index_expr(F.col("cell_id"), spec)
    if spec.square:
        name = F.format_string("pixel%d", (idx + 1).cast("long"))
    else:
        row, col = X.unpack_rowcol(F.col("cell_id"))
        name = F.format_string("hex_%d_%d", row.cast("long"), col.cast("long"))
    return (
        tiles.withColumn("cx", cx)
        .withColumn("cy", cy)
        .withColumn("grid_index", idx.cast("long"))
        .withColumn("pixel_name", name)
        .withColumn("type", F.lit("square" if spec.square else "hexagon"))
        .withColumn("resolution", F.lit(float(spec.resolution)))
    )


def tile_meta(
    docs_with_cell: DataFrame,
    spec: GridSpec,
    group_cols: list[str] | None = None,
    id_col: str = "doc_id",
    collect_roster: bool = True,
    salt_buckets: int = 0,
) -> DataFrame:
    """Per-tile metadata: num_cell + sorted doc roster
    (``R/main.R:153-155``). ``salt_buckets > 0`` enables the two-phase salted
    aggregate for hot tiles (SURVEY.md §4.3.1)."""
    keys = list(group_cols or []) + ["cell_id"]
    if not collect_roster:
        return docs_with_cell.groupBy(*keys).agg(F.count(F.lit(1)).alias("num_cell"))
    if salt_buckets and salt_buckets > 1:
        salted = docs_with_cell.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
        )
        partial = salted.groupBy(*keys, "_salt").agg(
            F.count(F.lit(1)).alias("_n"),
            F.collect_list(id_col).alias("_ids"),
        )
        return partial.groupBy(*keys).agg(
            F.sum("_n").cast("long").alias("num_cell"),
            F.sort_array(F.flatten(F.collect_list("_ids"))).alias("cellID_list"),
        )
    return docs_with_cell.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("num_cell"),
        F.sort_array(F.collect_list(id_col)).alias("cellID_list"),
    )


def rasterize_cell_type(
    docs: DataFrame,
    resolution: float = 100.0,
    square: bool = True,
    fun: str = "sum",
    label_col: str = "kind",
    group_cols: list[str] | None = None,
    bbox: BBox | None = None,
    spec: GridSpec | None = None,
    collect_roster: bool = False,
    salt_buckets: int = 0,
    broadcast_meta: bool = True,
) -> DataFrame:
    """Categorical rasterization (reference ``rasterizeCellType``,
    ``R/main.R:466-559``; default fun="sum", R/main.R:466).

    One-hot encoding is free in long form: each doc row IS the triplet
    (doc, label, 1) (``R/main.R:496-498`` builds a sparse model matrix; here
    ``groupBy(cell_id, kind).count()`` is the same thing). fun="mean" yields
    per-tile label proportions count/num_cell (``R/main.R:405-409``).

    Output: (group_cols..., cell_id, <label_col>, pixelval, num_cell,
    cx, cy, grid_index, pixel_name, type, resolution).
    """
    if fun not in VALID_FUNS:
        raise ValueError(f"fun must be one of {VALID_FUNS} (R/main.R:33-36)")
    gcols = list(group_cols or [])
    spec = spec or grid_spec_for(docs, resolution, square=square, bbox=bbox)
    slim = docs.select(*gcols, "doc_id", "x", "y", label_col)
    with_cell = assign_tiles(slim, spec)
    keys = gcols + ["cell_id"]

    counts = with_cell.groupBy(*keys, label_col).agg(
        F.count(F.lit(1)).cast("double").alias("_cnt")
    )
    if collect_roster:
        # roster needs the doc ids → second aggregate + broadcast join
        meta = tile_meta(
            with_cell, spec, gcols, collect_roster=True, salt_buckets=salt_buckets
        )
        meta_j = F.broadcast(meta) if broadcast_meta else meta
        joined = counts.join(meta_j, on=keys, how="inner")
    else:
        # every doc has exactly one label, so num_cell = Σ_label counts — a
        # window over the ALREADY-AGGREGATED tiles replaces a second full
        # scan + join (the window exchange moves tiles×labels rows, not docs)
        from pyspark.sql import Window as W

        joined = counts.withColumn(
            "num_cell", F.sum("_cnt").over(W.partitionBy(*keys)).cast("long")
        )
    pixelval = (
        F.col("_cnt") if fun == "sum" else F.col("_cnt") / F.col("num_cell").cast("double")
    )
    out = joined.withColumn("pixelval", pixelval).drop("_cnt")
    return _with_tile_decor(out, spec)


def rasterize_gene_expression(
    docs: DataFrame,
    resolution: float = 100.0,
    square: bool = True,
    fun: str = "mean",
    values_col: str = "values",
    group_cols: list[str] | None = None,
    bbox: BBox | None = None,
    spec: GridSpec | None = None,
    collect_roster: bool = False,
    salt_buckets: int = 0,
    broadcast_meta: bool = True,
    assay_col: str | None = None,
    assay_name: str | None = None,
    validate_assay: bool = True,
    keep_empty_feature_tiles: bool = False,
) -> DataFrame:
    """Continuous-feature rasterization (reference
    ``rasterizeGeneExpression``, ``R/main.R:291-375``; default fun="mean",
    R/main.R:291).

    Input carries a sparse feature vector as ``values:
    array<struct<feature,value>>`` (long/triplet form after explode — absent
    feature = structural zero, preserving the reference's dgCMatrix sparsity,
    ``R/main.R:157-161``).

    mean = sum(value)/num_cell with num_cell including structural zeros
    (``R/main.R:146-150``) — the denominator comes from the doc-level tile
    counts, broadcast-joined in.

    Multi-assay inputs: pass ``assay_col`` (a discriminator column) and
    optionally ``assay_name`` — validated eagerly against the assays present,
    defaulting to the first (``R/main.R:315-321``). Loop callers rasterizing
    many assays/resolutions of the same already-validated input can pass
    ``validate_assay=False`` (with an explicit ``assay_name``) to skip the
    eager distinct job per invocation.

    By default an occupied tile whose member docs ALL have empty ``values``
    arrays yields no output row (sparse long form has nothing to emit),
    whereas the reference keeps an all-zero pixel column with num_cell
    metadata (R/main.R:153-176). Pass ``keep_empty_feature_tiles=True`` for
    reference semantics: such tiles are emitted with ``feature = NULL`` and
    ``pixelval = 0.0`` (the long-form encoding of the all-zero column),
    num_cell metadata intact. Implemented as a tile-cardinality anti-join
    from ``tile_meta`` unioned back in — never a re-scan of the corpus, and
    the big fact side stays streamable (a broadcast right-outer is not a
    plannable shape; the anti+union is).
    """
    if fun not in VALID_FUNS:
        raise ValueError(f"fun must be one of {VALID_FUNS} (R/main.R:33-36)")
    gcols = list(group_cols or [])
    # grid spec from the FULL (unfiltered) docs so every assay shares one
    # grid — the reference's common-bbox invariant (R/main.R:294-308); the
    # assay filter applies only after the grid is fixed
    spec = spec or grid_spec_for(docs, resolution, square=square, bbox=bbox)
    docs = _resolve_assay(docs, assay_col, assay_name, validate=validate_assay)
    slim = docs.select(*gcols, "doc_id", "x", "y", values_col)
    with_cell = assign_tiles(slim, spec)
    keys = gcols + ["cell_id"]

    meta = tile_meta(
        with_cell, spec, gcols, collect_roster=collect_roster, salt_buckets=salt_buckets
    )

    triplets = with_cell.select(
        *keys, F.explode(values_col).alias("_kv")
    ).select(*keys, F.col("_kv.feature").alias("feature"), F.col("_kv.value").alias("value"))

    sums = triplets.groupBy(*keys, "feature").agg(F.sum("value").alias("_sum"))
    meta_j = F.broadcast(meta) if broadcast_meta else meta
    joined = sums.join(meta_j, on=keys, how="inner")
    if keep_empty_feature_tiles:
        # tiles present in meta but absent from the sparse sums: all member
        # docs had empty `values`. Both sides of this anti-join are
        # tile-cardinality (sums is already aggregated), so it is cheap at
        # any scale; the union adds one row per all-empty tile.
        dtypes = dict(sums.dtypes)
        # broadcast the distinct tile keys (tile-cardinality) so the
        # anti-join stays shuffle-free like the meta join it mirrors
        empty = meta.join(
            F.broadcast(sums.select(*keys).distinct()), on=keys, how="left_anti"
        ).withColumns(
            {
                # cast BOTH literals to the sparse side's dtypes: a bare 0.0
                # would widen an integer-valued _sum to double for every row
                # through the union (schema drift + driver-hash mismatch)
                "feature": F.lit(None).cast(dtypes["feature"]),
                "_sum": F.lit(0.0).cast(dtypes["_sum"]),
            }
        )
        joined = joined.unionByName(empty)
    pixelval = (
        F.col("_sum") if fun == "sum" else F.col("_sum") / F.col("num_cell").cast("double")
    )
    out = joined.withColumn("pixelval", pixelval).drop("_sum")
    return _with_tile_decor(out, spec)


def rasterize_gene_expression_deterministic(
    docs: DataFrame,
    resolution: float = 100.0,
    square: bool = True,
    fun: str = "mean",
    values_col: str = "values",
    bbox: BBox | None = None,
    spec: GridSpec | None = None,
) -> DataFrame:
    """Bit-for-bit reproducible variant (north_star: "match ... bit-for-bit
    on aggregated pixel values"; SURVEY.md §4.3.4): per-tile values are
    summed in CANONICAL ORDER — member docs sorted by (feature, doc_id)
    inside an applyInPandas group — so the result is byte-identical across
    partitionings, cluster sizes, and reruns. Tiles are small by the very
    premise of rasterization, so per-tile pandas groups are cheap.

    This path is NOT the hot 100 TB aggregate: the default
    rasterize_gene_expression (single codegen shuffle, order-free exact or
    near-exact sums) is; use this variant only when last-ulp float
    reproducibility across reruns/cluster sizes is a hard requirement."""
    import numpy as np
    import pandas as pd

    if fun not in VALID_FUNS:
        raise ValueError(f"fun must be one of {VALID_FUNS} (R/main.R:33-36)")
    spec = spec or grid_spec_for(docs, resolution, square=square, bbox=bbox)
    with_cell = assign_tiles(docs.select("doc_id", "x", "y", values_col), spec)
    triplets = with_cell.select(
        "cell_id",
        "doc_id",
        F.explode(values_col).alias("_kv"),
    ).select(
        "cell_id",
        "doc_id",
        F.col("_kv.feature").alias("feature"),
        F.col("_kv.value").alias("value"),
    )
    num = with_cell.groupBy("cell_id").agg(F.count(F.lit(1)).alias("num_cell"))

    out_schema = "cell_id long, feature string, pixel_sum double"

    def tile_sum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["feature", "doc_id"], kind="mergesort")
        recs = []
        # dropna=False: the default (JVM) path keeps a NULL-feature group,
        # so the deterministic twin must too — pandas groupby silently
        # drops NaN keys by default, which would diverge the result sets
        for feat, grp in pdf.groupby("feature", sort=True, dropna=False):
            if pd.isna(feat):
                feat = None
            # np.cumsum is a strict sequential accumulation (no pairwise
            # reassociation), so its last element is bit-identical to a
            # left-to-right Python fold — at vector speed
            vals = grp["value"].to_numpy(np.float64)
            s = float(np.cumsum(vals)[-1]) if len(vals) else 0.0
            recs.append((int(pdf["cell_id"].iloc[0]), feat, s))
        return pd.DataFrame(recs, columns=["cell_id", "feature", "pixel_sum"])

    sums = triplets.groupBy("cell_id").applyInPandas(tile_sum, out_schema)
    joined = sums.join(F.broadcast(num), "cell_id")
    pixelval = (
        F.col("pixel_sum")
        if fun == "sum"
        else F.col("pixel_sum") / F.col("num_cell").cast("double")
    )
    out = joined.withColumn("pixelval", pixelval).drop("pixel_sum")
    return _with_tile_decor(out, spec)


@dataclass(frozen=True)
class RasterizedMatrix:
    """Spark-native analogue of the reference's rasterizeMatrix output list
    (``R/main.R:194-196`` list(data_rast, pos_rast, meta_rast)):

    * ``data_rast`` — long-form feature×pixel matrix
      (cell_id, pixel_name, feature, pixelval); absent (pixel, feature)
      pairs are structural zeros, like the reference's sparse columns.
    * ``pos_rast``  — pixel centroids (cell_id, pixel_name, x, y)
      (``R/main.R:126-129``).
    * ``meta_rast`` — per-pixel num_cell, sorted cellID_list, type,
      resolution, geometry_wkt (``R/main.R:152-189``). Covers EVERY occupied
      pixel, including pixels whose docs contribute no feature triplets.
    """

    data_rast: DataFrame
    pos_rast: DataFrame
    meta_rast: DataFrame


def rasterize_matrix(
    data: DataFrame,
    pos: DataFrame,
    resolution: float = 100.0,
    square: bool = True,
    fun: str = "mean",
    bbox: BBox | None = None,
    spec: GridSpec | None = None,
    id_col: str = "doc_id",
    feature_col: str = "feature",
    value_col: str = "value",
    salt_buckets: int = 0,
    broadcast_meta: bool = True,
) -> RasterizedMatrix:
    """The reference's 5th export, ``rasterizeMatrix`` (NAMESPACE:7,
    ``R/main.R:98-197``): rasterize a feature×cell matrix given separate
    positions, returning the (data_rast, pos_rast, meta_rast) triple.

    ``data`` is the matrix in Spark-native sparse long form — one row per
    nonzero (cell, feature, value) triplet (the reference's dgCMatrix,
    column-compressed, is the same set of triplets); ``pos`` is
    (id_col, x, y). fun="mean" divides by num_cell — rowMeans over the
    pixel's full cell set incl. structural zeros (``R/main.R:146-150``).

    Plan shape: pos → closed-form tile encode → ONE aggregate for meta
    (num_cell + salted roster); triplets pick up their tile by an equi-join
    on the unique doc id (uniform key), then ONE aggregate per
    (tile, feature); num_cell attaches by broadcast (tiles ≪ docs).
    """
    if fun not in VALID_FUNS:
        raise ValueError(f"fun must be one of {VALID_FUNS} (R/main.R:33-36)")
    spec = spec or grid_spec_for(pos, resolution, square=square, bbox=bbox)
    with_cell = assign_tiles(pos.select(id_col, "x", "y"), spec)
    meta = tile_meta(
        with_cell, spec, id_col=id_col, collect_roster=True, salt_buckets=salt_buckets
    )
    meta = _with_tile_decor(meta, spec)
    from .vector import tiles_with_wkt

    meta = tiles_with_wkt(meta, spec)

    triplets = data.select(
        F.col(id_col), F.col(feature_col).alias("feature"), F.col(value_col).alias("value")
    ).join(with_cell.select(id_col, "cell_id"), id_col)
    sums = triplets.groupBy("cell_id", "feature").agg(F.sum("value").alias("_sum"))
    meta_slim = meta.select("cell_id", "num_cell", "pixel_name")
    meta_j = F.broadcast(meta_slim) if broadcast_meta else meta_slim
    pixelval = (
        F.col("_sum") if fun == "sum" else F.col("_sum") / F.col("num_cell").cast("double")
    )
    data_rast = (
        sums.join(meta_j, "cell_id")
        .select("cell_id", "pixel_name", "feature", pixelval.alias("pixelval"))
    )
    pos_rast = meta.select(
        "cell_id", "pixel_name", F.col("cx").alias("x"), F.col("cy").alias("y")
    )
    meta_rast = meta.select(
        "cell_id", "pixel_name", "num_cell", "cellID_list", "type", "resolution",
        "geometry_wkt",
    )
    return RasterizedMatrix(data_rast=data_rast, pos_rast=pos_rast, meta_rast=meta_rast)


def rollup_tiles(
    tiles: DataFrame,
    spec: GridSpec,
    factor: int = 2,
    keys: list[str] | None = None,
    sum_cols: tuple[str, ...] = ("pixelval",),
) -> tuple[DataFrame, GridSpec]:
    """Hierarchical tile rollup (pyramid level): aggregate res-r tiles into
    res-(factor·r) parent tiles by INTEGER ARITHMETIC on the packed cell ids
    — parent row/col = floor(child/factor) — with no re-scan of the source
    docs. The multi-resolution sweep re-bins the corpus once per level; the
    rollup instead derives each coarser level from the previous one
    (tiles ≪ docs, so each level is ~factor² cheaper than the last — the
    standard tile-pyramid construction). Square grids only: axial hex cells
    do not nest. Additive aggregates only (sum/count roll up exactly; mean
    must be re-derived as rolled sum / rolled num_cell).

    Returns (parent_tiles, parent_spec); parent_spec.level = spec.level+1
    keeps pyramid levels distinct inside the packed id space."""
    if not spec.square:
        raise ValueError("rollup_tiles requires a square grid (hex cells do not nest)")
    if factor < 2:
        raise ValueError("factor must be >= 2")
    if spec.level >= 63:
        # clamping would alias two pyramid levels into one (mode, level)
        # packed-id space — fail instead of silently colliding tile ids
        raise ValueError(
            "rollup_tiles: parent level would exceed the 6-bit level space "
            f"(spec.level={spec.level}, max parent level is 63)"
        )
    ks = list(keys or [])
    row, col = X.unpack_rowcol(F.col("cell_id"))
    prow = F.floor(row / F.lit(float(factor))).cast("long")
    pcol = F.floor(col / F.lit(float(factor))).cast("long")
    parent_spec = GridSpec(
        spec.xmin,
        spec.ymin,
        spec.xmax,
        spec.ymax,
        spec.resolution * factor,
        square=True,
        level=spec.level + 1,
    )
    parent_id = X._pack(parent_spec.mode, parent_spec.level, prow, pcol)
    rolled = (
        tiles.withColumn("cell_id", parent_id)
        .groupBy("cell_id", *ks)
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
    )
    return _with_tile_decor(rolled, parent_spec), parent_spec


def regrid(
    tiles: DataFrame,
    spec_from: GridSpec,
    spec_to: GridSpec,
    value_cols: tuple[str, ...] = ("pixelval",),
    keys: list[str] | None = None,
    fun: str = "sum",
) -> DataFrame:
    """Resample a raster onto an ARBITRARY new grid (any resolution, any
    non-nesting ratio, square→hex or hex→square) by nearest-cell (centroid)
    assignment — the gdalwarp-near analog, and the step that aligns two
    rasters of different provenance for raster algebra. Complements
    ``rollup_tiles``, which only handles integer-factor nesting.

    Each source tile's value is re-addressed to the target cell containing
    the source tile's centroid (closed-form both ways: unpack → centroid →
    encode, whole-stage-codegen Column math, the lowest-index boundary
    tie-break shared with all binning). Semantics: ``sum`` re-distributes
    additive surfaces (counts); ``mean``/``min``/``max`` aggregate the
    contributing source-tile VALUES (equal-weight, i.e. nearest-cell
    resampling, not area weighting).

    Scale shape: tile-cardinality map + ONE groupBy on the target cell id;
    the corpus is never re-scanned. ``spec_to`` must cover ``spec_from``'s
    bbox (centroids outside would pack out-of-range indexes).
    """
    funs = {"sum": F.sum, "mean": F.avg, "min": F.min, "max": F.max}
    if fun not in funs:
        raise ValueError(f"fun must be one of {sorted(funs)}, got {fun!r}")
    ks = list(keys or [])
    cx, cy = X.centroid_expr(F.col("cell_id"), spec_from)
    new_id = X.cell_id_expr(cx, cy, spec_to)
    out = (
        tiles.withColumn("cell_id", new_id)
        .groupBy("cell_id", *ks)
        .agg(*[funs[fun](c).alias(c) for c in value_cols])
    )
    return _with_tile_decor(out, spec_to)


def relative_enrichment(cell_type_tiles: DataFrame, label_col: str = "kind") -> DataFrame:
    """Vignette's relative-enrichment metric (vignette:307-311):
    RE[ct, px] = mat[ct,px] / ( (sum(mat[ct,:]) / sum(mat)) * colSums(mat)[px] )
    computed with window aggregates over the fun="sum" cell-type raster."""
    from pyspark.sql import Window as W

    mat = cell_type_tiles.select("cell_id", label_col, "pixelval")
    w_ct = W.partitionBy(label_col)
    w_px = W.partitionBy("cell_id")
    # grand total as a 1-row aggregate broadcast back in — NEVER
    # `Window.partitionBy()` (an empty partitionBy collapses all tiles×labels
    # rows into ONE window partition: a single-task exchange that serializes
    # at scale). Same pattern as focal.py's global-moment broadcasts.
    grand = mat.agg(F.sum("pixelval").alias("_grand"))
    return (
        mat.withColumn("_ct_total", F.sum("pixelval").over(w_ct))
        .withColumn("_px_total", F.sum("pixelval").over(w_px))
        .crossJoin(F.broadcast(grand))
        .withColumn(
            "re",
            F.col("pixelval")
            / ((F.col("_ct_total") / F.col("_grand")) * F.col("_px_total")),
        )
        .withColumn("re_bin", F.when(F.col("re") >= 1.0, 1).otherwise(0))
        .drop("_ct_total", "_px_total", "_grand")
    )
