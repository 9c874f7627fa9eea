"""Line-segment (trajectory) rasterization: apportion each segment to the
square tiles it crosses, weighted by the *fraction of the segment's length*
inside each tile.

Reference parity: SEraster rasterizes points only (``R/main.R:118-139``
bins ``spatialCoords`` — a point matrix); this operator extends the same
closed-form grid to 1-D geometries, the ``terra::rasterizeGeom(lines)``
analog a trajectory workload needs (GPS tracks, ship lanes, migration
paths at 100 TB: "which tiles does each trip cross, with what share").

Spark-first design — **zero UDFs, zero joins**:

* Candidate tiles come from a two-stage ``explode(sequence(...))``
  *supercover*: first the column strips the segment's x-extent touches,
  then — per strip — only the rows its y-extent *within that strip*
  touches (±1 safety row for float rounding at boundaries). Fan-out is
  O(ncols + nrows + crossings) per segment, NOT O(bbox area); a diagonal
  crossing a 1000×1000-tile extent generates ~2000 candidates, not 10^6.
* The in-tile fraction is a closed-form Liang–Barsky clip in pure Column
  arithmetic (``least``/``greatest``/one guarded division per axis), so
  the whole pipeline is one WholeStageCodegen map followed by ONE
  hash-aggregate shuffle on slim ``(cell_id, frac, value)`` rows with
  map-side partial combine — the same 100 TB shape as point binning.
* Hot tiles are benign: partial aggregation bounds any single reducer's
  input by the number of map partitions, exactly like the count rasters.

Conventions (consistent with :mod:`seraster_spark.grid`):

* A segment's fraction in a tile is the Lebesgue measure of its parameter
  interval ``t ∈ [0, 1]`` inside the tile — off-grid portions count
  toward no tile, so in-grid segments satisfy ``Σ_tiles frac == 1``.
* Boundary tie-break follows the point rule (``R/main.R:134-135``, lower
  cell) wherever the measure itself is ambiguous: an axis-parallel
  segment lying exactly ON an interior gridline, and a degenerate
  (point) segment on a tile corner, are assigned via the SAME
  ``square_rowcol_expr`` tie-break the point encoder uses. For
  non-degenerate crossings the measure is unambiguous (the boundary
  overlap has measure zero) and no tie-break is needed.
* ``quantize_bits=b`` rounds each per-(segment, tile) fraction to the
  dyadic grid ``2^-b`` (``floor(frac·2^b + 0.5)/2^b``) *before*
  aggregation. With b ≤ 20 and integer value columns the summed terms
  are exact in float64, so aggregate results are independent of
  partitioning/summation order — the same bit-determinism contract as
  ``rasterize_gene_expression_deterministic`` (SURVEY §4.3.4), and what
  lets a SQL twin reproduce the aggregate bit-for-bit. Default ``None``
  keeps full double precision (last-ulp order sensitivity, like any
  float sum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .expressions import _pack, square_rowcol_expr
from .grid import GridSpec


def _quantized(frac: Column, quantize_bits: int | None) -> Column:
    if quantize_bits is None:
        return frac
    scale = F.lit(float(1 << quantize_bits))
    return F.floor(frac * scale + F.lit(0.5)) / scale


def _capped(span: Column, bound: Column, cap: int, what: str) -> Column:
    """Loud runtime guard (never silent truncation): raise if one segment's
    candidate span along ONE axis (column strips, or rows within a strip)
    exceeds ``cap``. Note the bound is per-axis, not per-segment-total: a
    long diagonal passes with colspan ≤ cap and ~3 rows per strip, so total
    exploded candidates can reach a small multiple of ``cap`` (≈ colspan·3
    for diagonals, colspan·rowspan only for near-degenerate steep strips,
    which the row check catches)."""
    return F.when(
        span <= F.lit(cap), bound
    ).otherwise(
        F.raise_error(
            f"segment {what} span exceeds max_tiles_per_seg={cap}; "
            "coarsen the grid or split the segment"
        ).cast("long")
    )


def segment_tile_fractions(
    segs: DataFrame,
    spec: GridSpec,
    max_tiles_per_seg: int = 65536,
    quantize_bits: int | None = None,
    x0: str = "x0",
    y0: str = "y0",
    x1: str = "x1",
    y1: str = "y1",
) -> DataFrame:
    """Per-(segment, tile) exploded fractions: the input columns plus
    ``cell_id`` and ``frac`` (> 0; with ``quantize_bits`` set, crossings
    smaller than half the dyadic step round to 0 and are dropped, so the
    contract holds at the quantized precision). This is the trajectory↔tile
    membership relation; :func:`rasterize_segments` is its groupBy.

    ``max_tiles_per_seg`` bounds each axis's candidate span separately
    (see :func:`_capped`) — size executors for a worst-case fan-out of a
    few × the cap, not exactly the cap."""
    if not spec.square:
        raise ValueError("segment rasterization is defined for square grids")
    res = F.lit(float(spec.resolution))
    xmn = F.lit(float(spec.xmin))
    ymn = F.lit(float(spec.ymin))
    ncols, nrows = spec.ncols, spec.nrows

    px0, py0, px1, py1 = (F.col(c) for c in (x0, y0, x1, y1))
    sdx = px1 - px0
    sdy = py1 - py0
    # point-rule tie-break cells for the axis-degenerate branches
    tie_row, tie_col = square_rowcol_expr(px0, py0, spec)

    bxmin = F.least(px0, px1)
    bxmax = F.greatest(px0, px1)
    c_lo_raw = F.when(sdx != 0, F.floor((bxmin - xmn) / res)).otherwise(tie_col)
    c_hi_raw = F.when(sdx != 0, F.floor((bxmax - xmn) / res)).otherwise(tie_col)
    c_lo = F.greatest(c_lo_raw, F.lit(0).cast("long"))
    c_hi = F.least(c_hi_raw, F.lit(ncols - 1).cast("long"))

    d = (
        segs.withColumn("_c_lo", c_lo)
        .withColumn("_c_hi", c_hi)
        .filter(F.col("_c_lo") <= F.col("_c_hi"))  # sequence() steps -1 on inverted bounds
        .withColumn(
            "_ci",
            F.explode(
                F.sequence(
                    F.col("_c_lo"),
                    _capped(
                        F.col("_c_hi") - F.col("_c_lo") + F.lit(1),
                        F.col("_c_hi"),
                        max_tiles_per_seg,
                        "column",
                    ),
                )
            ),
        )
    )

    lo_x = xmn + F.col("_ci").cast("double") * res
    hi_x = lo_x + res
    # x-axis clip of the parameter interval (try_divide: the sdx==0 branch
    # never consumes it, but ANSI mode must not raise while evaluating)
    ta = F.try_divide(lo_x - px0, sdx)
    tb = F.try_divide(hi_x - px0, sdx)
    tx_en = F.when(sdx != 0, F.least(ta, tb)).otherwise(F.lit(0.0))
    tx_ex = F.when(sdx != 0, F.greatest(ta, tb)).otherwise(F.lit(1.0))
    u0 = F.greatest(tx_en, F.lit(0.0))
    u1 = F.least(tx_ex, F.lit(1.0))
    # rows this strip can touch: y-extent of the segment WITHIN the strip,
    # widened ±1 against float rounding at row boundaries (over-generation
    # is filtered by frac > 0; under-generation would be a correctness bug)
    ya = py0 + u0 * sdy
    yb = py0 + u1 * sdy
    r_lo_raw = F.when(
        sdy != 0, F.floor((F.least(ya, yb) - ymn) / res) - F.lit(1)
    ).otherwise(tie_row)
    r_hi_raw = F.when(
        sdy != 0, F.floor((F.greatest(ya, yb) - ymn) / res) + F.lit(1)
    ).otherwise(tie_row)

    d = (
        d.withColumn("_u0", u0)
        .withColumn("_u1", u1)
        .filter(F.col("_u0") <= F.col("_u1"))
        .withColumn("_r_lo", F.greatest(r_lo_raw, F.lit(0).cast("long")))
        .withColumn("_r_hi", F.least(r_hi_raw, F.lit(nrows - 1).cast("long")))
        .filter(F.col("_r_lo") <= F.col("_r_hi"))
        .withColumn(
            "_ri",
            F.explode(
                F.sequence(
                    F.col("_r_lo"),
                    _capped(
                        F.col("_r_hi") - F.col("_r_lo") + F.lit(1),
                        F.col("_r_hi"),
                        max_tiles_per_seg,
                        "row",
                    ),
                )
            ),
        )
    )

    lo_y = ymn + F.col("_ri").cast("double") * res
    hi_y = lo_y + res
    tya = F.try_divide(lo_y - py0, sdy)
    tyb = F.try_divide(hi_y - py0, sdy)
    ty_en = F.when(sdy != 0, F.least(tya, tyb)).otherwise(F.lit(0.0))
    ty_ex = F.when(sdy != 0, F.greatest(tya, tyb)).otherwise(F.lit(1.0))
    t0 = F.greatest(F.col("_u0"), ty_en)
    t1 = F.least(F.col("_u1"), ty_ex)

    out = (
        d.withColumn("_frac_raw", t1 - t0)
        .filter(F.col("_frac_raw") > 0.0)
        .withColumn("frac", _quantized(F.col("_frac_raw"), quantize_bits))
        # sub-quantum crossings round to 0 — drop them so frac > 0 holds
        .filter(F.col("frac") > 0.0)
        .withColumn("cell_id", _pack(0, spec.level, F.col("_ri"), F.col("_ci")))
    )
    return out.drop("_c_lo", "_c_hi", "_u0", "_u1", "_r_lo", "_r_hi", "_frac_raw")


def rasterize_segments(
    segs: DataFrame,
    spec: GridSpec,
    value_cols: tuple[str, ...] = (),
    length_weighted: bool = False,
    max_tiles_per_seg: int = 65536,
    quantize_bits: int | None = None,
    x0: str = "x0",
    y0: str = "y0",
    x1: str = "x1",
    y1: str = "y1",
) -> DataFrame:
    """Segment-coverage raster: per tile, ``n_segs`` (segments with positive
    in-tile measure), ``frac_sum`` (Σ in-tile fractions — the unit-normalized
    line density), one ``w_<c>`` = Σ frac·c per value column, and — with
    ``length_weighted=True`` — ``len_sum`` = Σ frac·‖segment‖ (true crossing
    length; involves one sqrt per row, so it is float-deterministic but not
    dyadic-exact and is excluded from the bit-exact oracle contract)."""
    ft = segment_tile_fractions(
        segs,
        spec,
        max_tiles_per_seg=max_tiles_per_seg,
        quantize_bits=quantize_bits,
        x0=x0,
        y0=y0,
        x1=x1,
        y1=y1,
    )
    aggs = [
        F.count(F.lit(1)).alias("n_segs"),
        F.sum("frac").alias("frac_sum"),
    ]
    for c in value_cols:
        aggs.append(F.sum(F.col("frac") * F.col(c)).alias(f"w_{c}"))
    if length_weighted:
        seg_len = F.sqrt(
            (F.col(x1) - F.col(x0)) * (F.col(x1) - F.col(x0))
            + (F.col(y1) - F.col(y0)) * (F.col(y1) - F.col(y0))
        )
        aggs.append(F.sum(F.col("frac") * seg_len).alias("len_sum"))
    return ft.groupBy("cell_id").agg(*aggs)
