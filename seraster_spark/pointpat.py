"""Point-pattern pair statistics: Ripley's K pair counts + semivariogram.

The classic second-order point-pattern statistics (Ripley 1977; Matheron's
semivariogram) over a point corpus — the point-side counterpart of the
tile-based spatial stats in :mod:`focal` (Moran's I, Gi*). Not in the
reference (SEraster rasterizes *for* downstream spatial statistics,
vignette:253-257; R/main.R has no point-pattern stats); first-class here
because pair structure is exactly what rasterization trades away.

Algorithm (exact within ``max(radii)``, no sampling, no edge correction —
the naive estimator; counts are raw ordered pairs):

1. Bucket every point into a square grid of cell size ``max(radii)``
   (pure Column ``floor`` math). Any pair within distance r_max lies in
   the same or 8-adjacent buckets — the candidate join is provably
   complete.
2. Fan each point out to its 9 neighbor buckets (literal-offset
   ``explode`` of a slim (id, x, y, v) projection) and equi-join back on
   the bucket key. Each unordered pair matches exactly once per
   direction (a point owns ONE bucket; the 9 neighbor keys are
   distinct), so no dedup pass is needed.  ``broadcast_side=True``
   broadcasts the un-exploded side for dimension-sized inputs; the
   default shuffle shape is the corpus-scale plan (slim payload, AQE
   skew split on hot buckets).
3. One global hash aggregate with map-side combine: candidates stream
   through partial aggregation and never materialize. Per radius r:
   ``pc_<r>``  ordered pair count with d² ≤ r²,
   ``sv_<r>``  Σ (vᵢ−vⱼ)² over those pairs (exact BIGINT when
   ``exact_int``), ``gamma_<r>`` = sv / (2·pc) — the semivariogram
   estimate γ̂(r), and (when ``area`` is given) ``khat_<r>`` =
   area·pc / (n·(n−1)) — the naive Ripley K̂(r).

Scale shape: the only shuffles are the bucket equi-join (slim columns,
9× fan-out on one side) and the 1-row final aggregate; no window over
the pair set, no driver collect. At 100 TB the statistic itself is the
bound — pairs within r grow with n·density·r², so pick radii that keep
the REAL pair count tractable, not this plan's overhead.

Bit-exactness (with ``exact_int=True``, integer-valued coords/values):
every dx/dy/dv, d², squared diff, and sum is BIGINT (Spark ANSI raises
loudly on overflow rather than wrapping); γ̂ and K̂ are single
correctly-rounded IEEE divisions on exact integers — bit-identical in
any engine that replays the same expression, which is what the DuckDB
twin in driver_queries does via a full quadratic self-join (genuinely
independent: no bucketing).  With ``exact_int=False`` all per-pair
arithmetic is correctly-rounded double ops in a fixed order — still
deterministic per pair, but the Σ(vᵢ−vⱼ)² aggregate is order-sensitive
for non-integer values (documented; counts stay exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _rlabel(r: float) -> str:
    """Column-name-safe radius label: 50.0 → '50', 2.5 → '2p5'."""
    return str(int(r)) if float(r).is_integer() else str(r).replace(".", "p")


def pair_stats(
    points: DataFrame,
    radii: list[float],
    value_col: str = "val",
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "doc_id",
    area: float | None = None,
    broadcast_side: bool = False,
    exact_int: bool = True,
) -> DataFrame:
    """1-row DataFrame of cumulative pair statistics at each radius.

    Columns: ``n_pts`` then per radius r (label via :func:`_rlabel`):
    ``pc_<r>`` (BIGINT ordered pair count), ``sv_<r>`` (BIGINT squared
    value-difference sum), ``gamma_<r>`` (DOUBLE, NULL when no pairs),
    and ``khat_<r>`` (DOUBLE) when ``area`` is given.

    Rows with NULL/non-finite coordinates or NULL value are dropped
    (both sides of every pair must be well-defined); duplicate
    coordinates are fine. Self-pairs are excluded by ``id_col``
    inequality, so ids must be unique for exact semantics.
    """
    if not radii:
        raise ValueError("radii must be non-empty")
    radii = sorted(float(r) for r in radii)
    if radii[0] <= 0:
        raise ValueError(f"radii must be positive, got {radii[0]}")
    r_max = radii[-1]

    xc, yc = F.col(x_col), F.col(y_col)
    slim = points.select(
        F.col(id_col).alias("_pid"),
        xc.cast("double").alias("_x"),
        yc.cast("double").alias("_y"),
        F.col(value_col).cast("long" if exact_int else "double").alias("_v"),
    ).where(
        F.col("_x").isNotNull()
        & F.col("_y").isNotNull()
        & ~F.isnan("_x")
        & ~F.isnan("_y")
        & F.col("_v").isNotNull()
    )

    bx = F.floor(F.col("_x") / F.lit(r_max))
    by = F.floor(F.col("_y") / F.lit(r_max))
    right = slim.select(
        F.col("_pid").alias("_bid"),
        F.col("_x").alias("_bx_pt"),
        F.col("_y").alias("_by_pt"),
        F.col("_v").alias("_bv"),
        bx.alias("_jx"),
        by.alias("_jy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("ox"), F.lit(dy).alias("oy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = slim.select(
        "_pid", "_x", "_y", "_v", bx.alias("_bx0"), by.alias("_by0")
    ).select(
        "_pid",
        "_x",
        "_y",
        "_v",
        F.explode(offsets).alias("_o"),
        (F.col("_bx0")).alias("_bx0"),
        (F.col("_by0")).alias("_by0"),
    ).select(
        "_pid",
        "_x",
        "_y",
        "_v",
        (F.col("_bx0") + F.col("_o.ox")).alias("_jx"),
        (F.col("_by0") + F.col("_o.oy")).alias("_jy"),
    )
    rhs = F.broadcast(right) if broadcast_side else right
    cand = left.join(rhs, ["_jx", "_jy"]).where(F.col("_pid") != F.col("_bid"))

    if exact_int:
        dx = F.col("_x").cast("long") - F.col("_bx_pt").cast("long")
        dy = F.col("_y").cast("long") - F.col("_by_pt").cast("long")
    else:
        dx = F.col("_x") - F.col("_bx_pt")
        dy = F.col("_y") - F.col("_by_pt")
    d2 = (dx * dx + dy * dy).alias("_d2")
    dv = F.col("_v") - F.col("_bv")
    sq = (dv * dv).alias("_sq")
    cand = cand.select(d2, sq)

    aggs = []
    for r in radii:
        lbl = _rlabel(r)
        r2 = F.lit(r * r) if not exact_int else F.lit(int(round(r * r)))
        within = F.col("_d2") <= r2
        aggs.append(
            F.coalesce(F.sum(within.cast("long")), F.lit(0).cast("long")).alias(
                f"pc_{lbl}"
            )
        )
        sv = F.sum(F.when(within, F.col("_sq")).otherwise(F.lit(0)))
        if exact_int:
            sv = sv.cast("long")
        aggs.append(F.coalesce(sv, F.lit(0).cast("long" if exact_int else "double")).alias(f"sv_{lbl}"))
    stats = cand.agg(*aggs)

    n_row = slim.agg(F.count(F.lit(1)).alias("n_pts"))
    out = n_row.crossJoin(stats)

    cols = [F.col("n_pts")]
    for r in radii:
        lbl = _rlabel(r)
        pc = F.col(f"pc_{lbl}")
        sv = F.col(f"sv_{lbl}")
        cols += [
            pc,
            sv,
            F.try_divide(sv.cast("double"), (pc * F.lit(2)).cast("double")).alias(
                f"gamma_{lbl}"
            ),
        ]
        if area is not None:
            cols.append(
                F.try_divide(
                    F.lit(float(area)) * pc.cast("double"),
                    (F.col("n_pts") * (F.col("n_pts") - F.lit(1))).cast("double"),
                ).alias(f"khat_{lbl}")
            )
    return out.select(*cols)
