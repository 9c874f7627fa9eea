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
   distance > R·res from the query (hex ring R: > (√3/2)·(R+1)·res −
   2·res/√3 — see :func:`_complete_bound`). Queries whose k-th distance
   exceeds that bound (or with < k candidates) re-run at doubled radius —
   a short distributed loop; each round is one job touching only
   unresolved queries, and the pending set / results stay as DataFrames
   (driver traffic is O(1) per round).
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
    mask = F.lit((1 << _AXIS_BITS) - 1)
    for dr, dc in _ring_offsets(radius, spec.square):
        # mask to the axis field like expressions._pack — unmasked, a ring
        # cell near the +-2^27 coordinate edge bleeds into the level/mode
        # bits and can never equal the masked ids on the points side
        r = (row + F.lit(dr + _OFF)).cast("long").bitwiseAND(mask)
        c = (col + F.lit(dc + _OFF)).cast("long").bitwiseAND(mask)
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
    mask = F.lit((1 << _AXIS_BITS) - 1)
    r = (row + F.col("dr") + F.lit(_OFF)).cast("long").bitwiseAND(mask)
    c = (col + F.col("dc") + F.lit(_OFF)).cast("long").bitwiseAND(mask)
    return (
        qdf.crossJoin(F.broadcast(offs))
        .withColumn(
            "cell_id", head.bitwiseOR(F.shiftleft(r, _AXIS_BITS)).bitwiseOR(c)
        )
        .drop("dr", "dc", "_qcell")
    )


def _complete_bound(spec: GridSpec, radius: int) -> float:
    """Max k-th distance for which ring `radius` provably contains the true
    top-k.

    Square: a point whose cell is outside Chebyshev ring R is > R·res away.
    Hex (pointy-top, neighbor center distance = res, circumradius = res/√3):
    a point outside ring R sits in a hex whose CENTER is at hex-distance
    ≥ R+1, and centers at hex-distance d can be as close as (√3/2)·d·res
    (e.g. axial (2,−1) at √3·res for d=2 — NOT d·res); query and candidate
    each sit ≤ res/√3 from their centers, so the safe bound is
    (√3/2)·(R+1)·res − 2·res/√3. (The earlier (R+1)·res − 2·res/√3 bound
    overclaimed and could certify a query complete while its true NN lay in
    an unscanned hex-distance-(R+1) cell.)"""
    if spec.square:
        return radius * spec.resolution
    return max(
        0.0,
        (radius + 1) * spec.resolution * SQRT3 / 2.0 - 2.0 * spec.resolution / SQRT3,
    )


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    spec: GridSpec,
    point_id: str = "doc_id",
    query_id: str = "query_id",
    initial_radius: int = 1,
    max_radius: int = 64,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact k nearest `points` for each query point.

    points: (point_id, x, y [, ...]); queries: (query_id, x, y).
    Returns (query_id, point_id, dist, rank) with rank 1..k — deterministic
    (distance ties broken by point id). The result for all queries is exact;
    raises if max_radius is hit before completeness (pathologically sparse
    data → raise max_radius or coarsen the grid).

    Fully distributed rounds: the pending query set, per-round ranked
    candidates, and accumulated results all stay as DataFrames —
    ``localCheckpoint`` materializes each round's slim (qid, pid, dist,
    rank, done) output (ONE job over the big points table per round,
    lineage cut so rounds never re-trigger earlier joins) and the driver
    only ever sees per-round counts, so Q can be arbitrarily large (doc↔doc
    kNN). The per-query completeness flag is computed INSIDE the same
    window pass as the ranking (count/max windows over the identical
    partition key — no extra shuffle, no extra job), so a round costs
    exactly two jobs: the candidate join + one trivial aggregate over the
    checkpointed output.
    ``broadcast_queries=True`` (default) broadcast-hash-joins the exploded
    query rings into the points scan — right while pending×ring rows fit a
    broadcast; pass False to fall back to a shuffled equi-join on cell_id
    for very large Q.
    """
    spark = points.sparkSession
    pts = points.select(
        F.col(point_id).alias("_pid"), F.col("x").alias("_px"), F.col("y").alias("_py")
    )
    pts = pts.withColumn("cell_id", X.cell_id_expr(F.col("_px"), F.col("_py"), spec))

    pending = queries.select(
        F.col(query_id).alias("_qid"), F.col("x").alias("_qx"), F.col("y").alias("_qy")
    ).localCheckpoint(eager=True)
    pending_n = pending.count()
    done_frames: list[DataFrame] = []
    radius = max(1, initial_radius)
    while radius <= max_radius and pending_n > 0:
        qdf = pending.withColumn(
            "_qcell", X.cell_id_expr(F.col("_qx"), F.col("_qy"), spec)
        )
        cand_cells = _candidate_cells(spark, qdf, spec, radius)
        cand_side = F.broadcast(cand_cells) if broadcast_queries else cand_cells
        joined = pts.join(cand_side, on="cell_id", how="inner")
        ddx = F.col("_px") - F.col("_qx")
        ddy = F.col("_py") - F.col("_qy")
        # explicit products (not **2): bit-identical to the SQL oracle's x*x
        dist = F.sqrt(ddx * ddx + ddy * ddy)
        bound = _complete_bound(spec, radius)
        w_q = W.partitionBy("_qid")
        ranked = (
            joined.withColumn("dist", dist)
            .withColumn(
                "rank",
                F.row_number().over(
                    w_q.orderBy(F.col("dist").asc(), F.col("_pid").asc())
                ),
            )
            .filter(F.col("rank") <= k)
            # completeness flag in the SAME pass: unordered windows over the
            # identical partition key reuse the rank window's exchange/sort
            .withColumn(
                "_done",
                (F.count(F.lit(1)).over(w_q) >= k) & (F.max("dist").over(w_q) <= bound),
            )
            .select("_qid", "_pid", "dist", "rank", "_done")
            .localCheckpoint(eager=True)  # the one big job this round
        )
        done_frames.append(ranked.filter(F.col("_done")).drop("_done"))
        # one trivial aggregate over the checkpointed slim output
        n_done = (
            ranked.filter(F.col("_done")).select("_qid").distinct().count()
        )
        if n_done == pending_n:  # common case: one round resolves everything —
            pending_n = 0        # skip building/checkpointing an empty pending set
            break
        done_q = ranked.filter(F.col("_done")).select("_qid").distinct()
        pending = pending.join(done_q, "_qid", "left_anti").localCheckpoint(eager=True)
        pending_n -= n_done
        radius *= 2
    if pending_n > 0:
        raise RuntimeError(
            f"kNN incomplete at max_radius={max_radius}; raise max_radius or coarsen the grid"
        )
    if not done_frames:  # empty query set → empty result with correct types
        done_frames = [
            pending.select("_qid")
            .limit(0)
            .crossJoin(pts.select("_pid").limit(0))
            .select("_qid", "_pid", F.lit(0.0).alias("dist"), F.lit(0).alias("rank"))
        ]
    out = done_frames[0]
    for f in done_frames[1:]:
        out = out.unionByName(f)
    return out.select(
        F.col("_qid").alias(query_id),
        F.col("_pid").alias(point_id),
        "dist",
        "rank",
    )
