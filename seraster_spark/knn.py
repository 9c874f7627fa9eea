"""Exact kNN via grid k-ring expansion + broadcast candidate join.

Not present in the reference (SEraster defers neighbor analysis to nnSVG,
vignette:253-257); mandated by BASELINE.json north_star: *"kNN neighbor
queries answered by H3 k-ring expansion with a broadcast tile index."*

Algorithm (exact, provably complete):

1. Encode each query point's tile; fan out its ring-R neighborhood as a
   literal offset array (pure Column math — offsets are compile-time
   constants, the fan-out is ``explode``; no Python boundary).
2. Equi-join candidates ↔ the big points table on ``cell_id`` with the
   (small) exploded query side broadcast — the spatial join becomes a
   broadcast hash join, no shuffle of the points table beyond its scan.
3. Per query: exact top-k by Euclidean distance via window ``row_number``,
   ties broken by neighbor id for determinism.
4. Completeness check: a point outside square ring R is at Euclidean
   distance > R·res from the query (hex ring R: > (R+1)·res − 2·res/√3).
   Queries whose k-th distance exceeds that bound (or with < k candidates)
   re-run at doubled radius — a short driver loop; each round is one job
   touching only unresolved queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from . import expressions as X
from .grid import SQRT3, GridSpec

_OFF = 1 << 27
_AXIS_BITS = 28


def _ring_offsets(radius: int, square: bool) -> list[tuple[int, int]]:
    if square:
        return [
            (dr, dc)
            for dr in range(-radius, radius + 1)
            for dc in range(-radius, radius + 1)
        ]
    offs = []
    for dq in range(-radius, radius + 1):
        for dr in range(max(-radius, -dq - radius), min(radius, -dq + radius) + 1):
            offs.append((dr, dq))
    return offs


def _neighbor_array(cell_id, spec: GridSpec, radius: int):
    """Array column of ring-`radius` neighbor cell ids (literal offsets).
    Only for SMALL radii — the expression count is (2r+1)^2; knn_join uses
    the broadcast-offsets crossJoin instead, which is O(1) expressions at
    any radius."""
    row, col = X.unpack_rowcol(cell_id)
    mode = 0 if spec.square else 1
    head = F.lit((mode << 62) | ((spec.level & 0x3F) << 56)).cast("long")
    exprs = []
    for dr, dc in _ring_offsets(radius, spec.square):
        r = (row + F.lit(dr + _OFF)).cast("long")
        c = (col + F.lit(dc + _OFF)).cast("long")
        exprs.append(head.bitwiseOR(F.shiftleft(r, _AXIS_BITS)).bitwiseOR(c))
    return F.array(*exprs)


def _candidate_cells(spark, qdf, spec: GridSpec, radius: int):
    """Query rows fanned out to their ring-`radius` neighbor cells via a
    broadcast crossJoin with the (small) offsets table — constant plan size
    regardless of radius."""
    offs = spark.createDataFrame(
        _ring_offsets(radius, spec.square), "dr long, dc long"
    )
    row, col = X.unpack_rowcol(F.col("_qcell"))
    mode = 0 if spec.square else 1
    head = F.lit((mode << 62) | ((spec.level & 0x3F) << 56)).cast("long")
    r = (row + F.col("dr") + F.lit(_OFF)).cast("long")
    c = (col + F.col("dc") + F.lit(_OFF)).cast("long")
    return (
        qdf.crossJoin(F.broadcast(offs))
        .withColumn(
            "cell_id", head.bitwiseOR(F.shiftleft(r, _AXIS_BITS)).bitwiseOR(c)
        )
        .drop("dr", "dc", "_qcell")
    )


def _complete_bound(spec: GridSpec, radius: int) -> float:
    """Max k-th distance for which ring `radius` provably contains the true
    top-k (see module docstring)."""
    if spec.square:
        return radius * spec.resolution
    return max(0.0, (radius + 1) * spec.resolution - 2.0 * spec.resolution / SQRT3)


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    spec: GridSpec,
    point_id: str = "doc_id",
    query_id: str = "query_id",
    initial_radius: int = 1,
    max_radius: int = 64,
) -> DataFrame:
    """Exact k nearest `points` for each query point.

    points: (point_id, x, y [, ...]); queries: (query_id, x, y).
    Returns (query_id, point_id, dist, rank) with rank 1..k — deterministic
    (distance ties broken by point id). The result for all queries is exact;
    raises if max_radius is hit before completeness (pathologically sparse
    data → raise max_radius or coarsen the grid).
    """
    spark = points.sparkSession
    pts = points.select(
        F.col(point_id).alias("_pid"), F.col("x").alias("_px"), F.col("y").alias("_py")
    )
    pts = pts.withColumn("cell_id", X.cell_id_expr(F.col("_px"), F.col("_py"), spec))

    # The query side is small by contract (it is broadcast into the join), so
    # the per-round pending set and the k·Q result rows live on the driver —
    # each round is exactly ONE job over the big points table, and lineage
    # never accumulates across rounds.
    pending_pdf = (
        queries.select(
            F.col(query_id).alias("_qid"), F.col("x").alias("_qx"), F.col("y").alias("_qy")
        ).toPandas()
    )
    result_frames = []
    radius = max(1, initial_radius)
    while radius <= max_radius and len(pending_pdf):
        qdf = spark.createDataFrame(pending_pdf)
        qdf = qdf.withColumn("_qcell", X.cell_id_expr(F.col("_qx"), F.col("_qy"), spec))
        cand_cells = _candidate_cells(spark, qdf, spec, radius)
        joined = pts.join(F.broadcast(cand_cells), on="cell_id", how="inner")
        ddx = F.col("_px") - F.col("_qx")
        ddy = F.col("_py") - F.col("_qy")
        # explicit products (not **2): bit-identical to the SQL oracle's x*x
        dist = F.sqrt(ddx * ddx + ddy * ddy)
        ranked_pdf = (
            joined.withColumn("dist", dist)
            .withColumn(
                "rank",
                F.row_number().over(
                    W.partitionBy("_qid").orderBy(F.col("dist").asc(), F.col("_pid").asc())
                ),
            )
            .filter(F.col("rank") <= k)
            .select("_qid", "_pid", "dist", "rank")
            .toPandas()
        )
        bound = _complete_bound(spec, radius)
        stats = ranked_pdf.groupby("_qid").agg(_n=("rank", "size"), _dmax=("dist", "max"))
        done = set(stats[(stats["_n"] >= k) & (stats["_dmax"] <= bound)].index)
        if done:
            result_frames.append(ranked_pdf[ranked_pdf["_qid"].isin(done)])
            pending_pdf = pending_pdf[~pending_pdf["_qid"].isin(done)]
        radius *= 2
    if len(pending_pdf):
        raise RuntimeError(
            f"kNN incomplete at max_radius={max_radius}; raise max_radius or coarsen the grid"
        )
    import pandas as pd
    from pyspark.sql import types as T

    out = pd.concat(result_frames, ignore_index=True)
    schema = T.StructType(
        [
            T.StructField(query_id, queries.schema[query_id].dataType),
            T.StructField(point_id, points.schema[point_id].dataType),
            T.StructField("dist", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )
    out.columns = [query_id, point_id, "dist", "rank"]
    return spark.createDataFrame(out, schema=schema)
