import numpy as np
import pytest
from pyspark.sql import functions as F

from seraster_spark.focal import focal_stats, morans_i, neighbor_offsets


def _raster(spark, cells):
    """cells: list of (row_i, col_i, value)."""
    return spark.createDataFrame(cells, "row_i long, col_i long, n long")


def _numpy_focal(cells, radius=1, include_center=True):
    vals = {(r, c): v for r, c, v in cells}
    out = {}
    for (r, c), v in vals.items():
        s = cnt = 0
        for dr in range(-radius, radius + 1):
            for dc in range(-radius, radius + 1):
                if dr == 0 and dc == 0 and not include_center:
                    continue
                if (r + dr, c + dc) in vals:
                    s += vals[(r + dr, c + dc)]
                    cnt += 1
        out[(r, c)] = (s, cnt)
    return out


def _numpy_moran(cells, queen=True):
    vals = {(r, c): v for r, c, v in cells}
    xs = np.array(list(vals.values()), dtype=float)
    xb = xs.mean()
    offs = neighbor_offsets(queen=queen)
    num = w = 0.0
    for (r, c), v in vals.items():
        for dr, dc in offs:
            if (r + dr, c + dc) in vals:
                num += (v - xb) * (vals[(r + dr, c + dc)] - xb)
                w += 1
    den = ((xs - xb) ** 2).sum()
    return (len(xs) / w) * num / den


CELLS = [
    (0, 0, 5), (0, 1, 1), (0, 2, 7),
    (1, 0, 2), (1, 2, 3),
    (2, 0, 9), (2, 1, 4), (5, 5, 11),
]


def test_focal_matches_naive(spark):
    got = {
        (r["row_i"], r["col_i"]): (r["focal_sum"], r["focal_n"], r["focal_mean"])
        for r in focal_stats(_raster(spark, CELLS), "n").collect()
    }
    want = _numpy_focal(CELLS)
    assert set(got) == set(want)
    for k, (s, cnt) in want.items():
        assert got[k] == (s, cnt, s / cnt)


def test_focal_arrow_impl_bitwise_parity(spark):
    """impl='arrow' (fused bincount partials) must equal impl='column'
    BITWISE on integer value columns — default stencil, a big radius-3
    queen window, and a weighted binomial kernel; multi-partition input so
    partial-aggregate merging is actually exercised."""
    from seraster_spark.focal import binomial_kernel

    raster = _raster(spark, CELLS).repartition(5)
    for kw in (
        {},
        {"radius": 3, "include_center": False},
        {"kernel": binomial_kernel(2)},
    ):
        a = {
            (r["row_i"], r["col_i"]): (r["focal_sum"], r["focal_n"], r["focal_mean"])
            for r in focal_stats(raster, "n", impl="column", **kw).collect()
        }
        b = {
            (r["row_i"], r["col_i"]): (r["focal_sum"], r["focal_n"], r["focal_mean"])
            for r in focal_stats(raster, "n", impl="arrow", **kw).collect()
        }
        assert a == b, kw


def test_focal_arrow_impl_double_values(spark):
    """Float value columns through the arrow impl: numerically equal to
    the column path (exact here — dyadic values, few terms)."""
    cells = [(r, c, v + 0.25) for r, c, v in CELLS]
    raster = spark.createDataFrame(cells, "row_i long, col_i long, n double")
    a = {
        (r["row_i"], r["col_i"]): (r["focal_sum"], r["focal_n"])
        for r in focal_stats(raster, "n", impl="column").collect()
    }
    b = {
        (r["row_i"], r["col_i"]): (r["focal_sum"], r["focal_n"])
        for r in focal_stats(raster, "n", impl="arrow").collect()
    }
    assert a == b


def test_focal_bad_impl_raises(spark):
    with pytest.raises(ValueError, match="impl"):
        focal_stats(_raster(spark, CELLS), "n", impl="nope")


def test_focal_arrow_null_values_match_column(spark):
    """NULL integer values must follow sum-ignores-NULL in BOTH impls —
    not wrap NaN to INT64_MIN (the nullable-int pandas widening trap)."""
    cells = [(0, 0, 5), (0, 1, None), (0, 2, 7), (1, 1, 3)]
    raster = spark.createDataFrame(cells, "row_i long, col_i long, n long")
    a = {
        (r["row_i"], r["col_i"]): (r["focal_sum"], r["focal_n"])
        for r in focal_stats(raster, "n", impl="column").collect()
    }
    b = {
        (r["row_i"], r["col_i"]): (r["focal_sum"], r["focal_n"])
        for r in focal_stats(raster, "n", impl="arrow").collect()
    }
    assert a == b
    # window of (0,0) holds (0,0)=5, (0,1)=NULL, (1,1)=3: the NULL tile
    # still counts as an existing neighbor, its value is ignored
    assert a[(0, 0)] == (5 + 3, 3)


def test_focal_arrow_fractional_weights_match_column(spark):
    """Fractional stencil weights must not truncate to int in the arrow
    impl; both impls widen to double like value * F.lit(0.5) does."""
    kern = [(0, 0, 1), (0, 1, 0.5), (0, -1, 0.5)]
    raster = _raster(spark, CELLS)
    a = {
        (r["row_i"], r["col_i"]): (r["focal_sum"], r["focal_n"])
        for r in focal_stats(raster, "n", kernel=kern, impl="column").collect()
    }
    b = {
        (r["row_i"], r["col_i"]): (r["focal_sum"], r["focal_n"])
        for r in focal_stats(raster, "n", kernel=kern, impl="arrow").collect()
    }
    assert a == b
    assert a[(0, 1)][0] == 1 + 0.5 * 5 + 0.5 * 7


def test_focal_arrow_reserved_column_guard(spark):
    df = _raster(spark, CELLS).withColumn("t_row", F.lit(1))
    with pytest.raises(ValueError, match="focal internals"):
        focal_stats(df, "n", impl="arrow")


def test_focal_empty_kernel_raises_both_impls(spark):
    """An empty stencil is degenerate: the column path would otherwise
    die in analysis (explode of a VOID array), the arrow path in numpy —
    both must raise the same clear error instead."""
    for impl in ("column", "arrow"):
        with pytest.raises(ValueError, match="empty focal stencil"):
            focal_stats(_raster(spark, CELLS), "n", kernel=[], impl=impl)


def test_focal_isolated_tile_counts_itself(spark):
    got = focal_stats(_raster(spark, CELLS), "n").filter(
        (F.col("row_i") == 5) & (F.col("col_i") == 5)
    ).first()
    assert (got["focal_sum"], got["focal_n"]) == (11, 1)


def test_focal_exclude_center_and_rook(spark):
    out = {
        (r["row_i"], r["col_i"]): (r["focal_sum"], r["focal_n"])
        for r in focal_stats(
            _raster(spark, CELLS), "n", queen=False, include_center=False
        ).collect()
    }
    # (1,0): rook neighbors present = (0,0)=5, (2,0)=9
    assert out[(1, 0)] == (14, 2)
    # isolated tile has NO neighbors -> absent from the result (no 0-div row)
    assert (5, 5) not in out


def test_focal_binomial_kernel_matches_naive(spark):
    from seraster_spark.focal import binomial_kernel

    kern = {(dr, dc): w for dr, dc, w in binomial_kernel(1)}
    assert kern[(0, 0)] == 4 and kern[(0, 1)] == 2 and kern[(1, 1)] == 1
    got = {
        (r["row_i"], r["col_i"]): (r["focal_sum"], r["focal_n"])
        for r in focal_stats(_raster(spark, CELLS), "n", kernel=binomial_kernel(1)).collect()
    }
    vals = {(r, c): v for r, c, v in CELLS}
    for (r, c), v in vals.items():
        s = sum(w * vals[(r + dr, c + dc)] for (dr, dc), w in kern.items() if (r + dr, c + dc) in vals)
        n = sum(w for (dr, dc), w in kern.items() if (r + dr, c + dc) in vals)
        assert got[(r, c)] == (s, n), (r, c)


def test_focal_uniform_kernel_equals_default(spark):
    uni = [(dr, dc, 1) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]
    a = sorted(map(tuple, focal_stats(_raster(spark, CELLS), "n").collect()))
    b = sorted(map(tuple, focal_stats(_raster(spark, CELLS), "n", kernel=uni).collect()))
    assert a == b


def test_moran_checkerboard_is_negative(spark):
    cells = [(r, c, 10 if (r + c) % 2 == 0 else 0) for r in range(6) for c in range(6)]
    # rook: orthogonal neighbors always opposite-colored -> strongly negative
    row = morans_i(_raster(spark, cells), "n", queen=False).first()
    assert row["moran_i"] < -0.9
    assert row["moran_i"] == pytest.approx(_numpy_moran(cells, queen=False), rel=1e-12)
    # queen: the 4 diagonal neighbors are SAME-colored, so only mildly negative
    qrow = morans_i(_raster(spark, cells), "n").first()
    assert -0.2 < qrow["moran_i"] < 0.0
    assert qrow["moran_i"] == pytest.approx(_numpy_moran(cells), rel=1e-12)


def test_moran_smooth_gradient_is_positive(spark):
    cells = [(r, c, r * 3 + c) for r in range(6) for c in range(6)]
    row = morans_i(_raster(spark, cells), "n").first()
    assert row["moran_i"] > 0.4
    assert row["moran_i"] == pytest.approx(_numpy_moran(cells), rel=1e-12)


def test_moran_rook_matches_naive(spark):
    row = morans_i(_raster(spark, CELLS[:7]), "n", queen=False).first()
    assert row["moran_i"] == pytest.approx(_numpy_moran(CELLS[:7], queen=False), rel=1e-12)


def _numpy_local_moran(cells, queen=True):
    vals = {(r, c): v for r, c, v in cells}
    xs = np.array(list(vals.values()), dtype=float)
    xb, n = xs.mean(), len(xs)
    m2 = ((xs - xb) ** 2).sum() / n
    offs = neighbor_offsets(queen=queen)
    out = {}
    for (r, c), v in vals.items():
        lag = sum(
            vals[(r + dr, c + dc)] - xb
            for dr, dc in offs
            if (r + dr, c + dc) in vals
        )
        out[(r, c)] = (v - xb) * lag / m2 if m2 else None
    return out


def test_local_moran_matches_naive_and_sums_to_global(spark):
    """LISA ≡ float replay on both contiguities; the exact integer
    decomposition Σ_i D_i·L_i = num_scaled (the GLOBAL morans_i
    numerator, both n-scaled) must hold bit-for-bit."""
    from seraster_spark.focal import local_morans_i

    for queen in (True, False):
        rows = local_morans_i(_raster(spark, CELLS), "n", queen=queen).collect()
        want = _numpy_local_moran(CELLS, queen=queen)
        assert len(rows) == len(want)
        for r in rows:
            assert r["local_i"] == pytest.approx(
                want[(r["row_i"], r["col_i"])], rel=1e-12
            ), (queen, r)
        g = morans_i(_raster(spark, CELLS), "n", queen=queen).first()
        assert (
            sum(r["dev_scaled"] * r["lag_scaled"] for r in rows) == g["num_scaled"]
        )


def test_local_moran_quadrants_and_isolated_tile(spark):
    """Checkerboard: every interior tile is a spatial outlier (HL/LH under
    rook); the isolated tile in CELLS gets lag 0, local_i 0.0, 'NS'."""
    from seraster_spark.focal import local_morans_i

    cells = [(r, c, 10 if (r + c) % 2 == 0 else 0) for r in range(4) for c in range(4)]
    rows = local_morans_i(_raster(spark, cells), "n", queen=False).collect()
    for r in rows:
        assert r["quadrant"] in ("HL", "LH"), r  # rook neighbors all opposite
        assert r["local_i"] < 0
    # isolated tile (5,5) in CELLS: no neighbors -> lag 0, NS, local_i 0
    iso = {
        (r["row_i"], r["col_i"]): r
        for r in local_morans_i(_raster(spark, CELLS), "n").collect()
    }[(5, 5)]
    assert iso["lag_n"] == 0 and iso["lag_scaled"] == 0
    assert iso["quadrant"] == "NS" and iso["local_i"] == 0.0


def test_quadrat_vmr_matches_naive(spark):
    """VMR ≡ numpy replay over the FULL grid (empty quadrats as zeros);
    a clustered pattern (all mass in one tile) reads VMR >> 1, a uniform
    one-per-cell pattern reads VMR = 0."""
    from seraster_spark.focal import quadrat_vmr

    rng = np.random.default_rng(97)
    cells = [
        (int(r), int(c), int(v))
        for r, c, v in zip(
            rng.integers(0, 6, 20), rng.integers(0, 6, 20), rng.integers(1, 9, 20)
        )
    ]
    # dedup tile keys (keep last) to mimic a raster
    cells = list({(r, c): (r, c, v) for r, c, v in cells}.values())
    n_cells = 36
    got = quadrat_vmr(_raster(spark, cells), "n", n_cells).collect()[0].asDict()
    xs = np.zeros(n_cells)
    for r, c, v in cells:
        xs[r * 6 + c] = v
    s, q = int(xs.sum()), int((xs * xs).sum())
    assert got["q_cells"] == n_cells and got["q_sum"] == s and got["q_sumsq"] == q
    assert got["q_vmr"] == (n_cells * q - s * s) / (n_cells * s)
    assert got["q_chi2"] == (n_cells * q - s * s) / s
    assert got["q_vmr"] == pytest.approx(xs.var() / xs.mean(), rel=1e-12)
    # X^2 = sum((x-mean)^2)/mean — the spatstat quadrat.test statistic
    assert got["q_chi2"] == pytest.approx(
        ((xs - xs.mean()) ** 2).sum() / xs.mean(), rel=1e-12
    )
    # clustered: one tile holds everything -> VMR = (N·S² − S²)/(N·S)
    clus = quadrat_vmr(_raster(spark, [(0, 0, 12)]), "n", 9).collect()[0]
    assert clus["q_vmr"] == pytest.approx((9 * 144 - 144) / (9 * 12.0))
    assert clus["q_vmr"] > 1
    # uniform one-per-cell: variance 0
    uni = [(r, c, 1) for r in range(3) for c in range(3)]
    assert quadrat_vmr(_raster(spark, uni), "n", 9).collect()[0]["q_vmr"] == 0.0


def test_quadrat_vmr_degenerate(spark):
    from seraster_spark.focal import quadrat_vmr

    empty = _raster(spark, [(0, 0, 1)]).filter("row_i > 99")
    row = quadrat_vmr(empty, "n", 4).collect()[0]
    assert row["q_sum"] == 0 and row["q_vmr"] is None and row["q_chi2"] is None
    with pytest.raises(ValueError, match="positive"):
        quadrat_vmr(empty, "n", 0)
    # undersized N (fewer cells than occupied tiles) must raise loudly,
    # not return an impossible negative VMR
    three = _raster(spark, [(0, 0, 1), (0, 1, 1), (0, 2, 1)])
    with pytest.raises(Exception, match="n_cells is smaller"):
        quadrat_vmr(three, "n", 2).collect()


def test_local_moran_constant_raster_null(spark):
    from seraster_spark.focal import local_morans_i

    cells = [(r, c, 7) for r in range(3) for c in range(3)]
    rows = local_morans_i(_raster(spark, cells), "n").collect()
    assert all(r["local_i"] is None and r["quadrant"] == "NS" for r in rows)


def test_gi_star_matches_naive_and_flags_hotspot(spark):
    from seraster_spark.focal import getis_ord_gi_star

    # flat field of 1s with a 2x2 block of 50s: the block must be the top z
    cells = [(r, c, 50 if (r in (2, 3) and c in (2, 3)) else 1)
             for r in range(8) for c in range(8)]
    vals = {(r, c): v for r, c, v in cells}
    xs = np.array([v for _, _, v in cells], dtype=float)
    n, xb, s = len(xs), xs.mean(), xs.std()  # population std

    def naive(r, c):
        w = [(r + dr, c + dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)
             if (r + dr, c + dc) in vals]
        m = len(w)
        return (sum(vals[p] for p in w) - xb * m) / (
            s * np.sqrt((n * m - m * m) / (n - 1))
        )

    got = {(r["row_i"], r["col_i"]): r["gi_star"]
           for r in getis_ord_gi_star(_raster(spark, cells), "n").collect()}
    for (r, c), z in got.items():
        assert z == pytest.approx(naive(r, c), rel=1e-10), (r, c)
    hot = max(got, key=got.get)
    assert hot in {(2, 2), (2, 3), (3, 2), (3, 3)}
    assert got[hot] > 4.0


def test_moran_partitioning_invariant(spark):
    cells = [(r, c, (r * 7 + c * 13) % 5) for r in range(8) for c in range(8)]
    a = morans_i(_raster(spark, cells), "n").first()
    b = morans_i(_raster(spark, cells).repartition(7), "n").first()
    assert (a["num_scaled"], a["den_scaled"], a["w_sum"], a["moran_i"]) == (
        b["num_scaled"], b["den_scaled"], b["w_sum"], b["moran_i"]
    )


def test_label_regions_rook(spark):
    from seraster_spark.focal import label_regions

    # two rook-regions: an L-shape {(0,0),(0,1),(1,1)} and {(3,3)};
    # (0,0)-(1,1) are diagonal ONLY via (0,1) so rook still joins them
    cells = [(0, 0, 1), (0, 1, 1), (1, 1, 1), (3, 3, 1)]
    got = {(r["row_i"], r["col_i"]): r["region_id"]
           for r in label_regions(_raster(spark, cells), queen=False).collect()}
    key = lambda r, c: (r + (1 << 30)) * (1 << 31) + (c + (1 << 30))
    assert got[(0, 0)] == got[(0, 1)] == got[(1, 1)] == key(0, 0)
    assert got[(3, 3)] == key(3, 3)


def test_label_regions_queen_merges_diagonals(spark):
    from seraster_spark.focal import label_regions

    cells = [(0, 0, 1), (1, 1, 1)]  # diagonal pair
    rook = label_regions(_raster(spark, cells), queen=False).collect()
    queen = label_regions(_raster(spark, cells), queen=True).collect()
    assert len({r["region_id"] for r in rook}) == 2
    assert len({r["region_id"] for r in queen}) == 1


def test_label_regions_matches_scipy_style_flood(spark):
    from seraster_spark.focal import label_regions

    rng = np.random.default_rng(12)
    cells = [(int(r), int(c), 1) for r in range(12) for c in range(12)
             if rng.random() < 0.45]
    got = {}
    for r in label_regions(_raster(spark, cells), queen=False).collect():
        got.setdefault(r["region_id"], set()).add((r["row_i"], r["col_i"]))
    # naive flood fill
    todo = {(r, c) for r, c, _ in cells}
    want = []
    while todo:
        seed = min(todo)
        comp, stack = set(), [seed]
        while stack:
            p = stack.pop()
            if p in comp or p not in todo and p != seed and p not in comp:
                continue
            if p not in todo and p not in comp:
                continue
            comp.add(p)
            todo.discard(p)
            r, c = p
            for q in ((r+1, c), (r-1, c), (r, c+1), (r, c-1)):
                if q in todo:
                    stack.append(q)
        want.append(frozenset(comp))
    assert {frozenset(v) for v in got.values()} == set(want)


def test_hex_focal_and_regions(spark):
    """Hex adjacency = the same machinery over axial (r, q) with the 6-offset
    stencil: (0,0)-(0,1) are axial neighbors; (0,0)-(1,1) are NOT (axial
    (1,1) is two steps away); (0,0)-(1,-1) ARE."""
    from seraster_spark.focal import focal_stats, hex_offsets, label_regions

    cells = [(0, 0, 10), (0, 1, 20), (1, 1, 40), (1, -1, 5)]
    f = {
        (r["row_i"], r["col_i"]): (r["focal_sum"], r["focal_n"])
        for r in focal_stats(
            _raster(spark, cells), "n", kernel=hex_offsets(include_center=True)
        ).collect()
    }
    # (0,0): itself + (0,1) + (1,-1) -> 35; (1,1): itself + (0,1)... wait
    # axial neighbors of (1,1): (1,2),(1,0),(2,1),(0,1),(2,0),(0,2) -> only (0,1)
    assert f[(0, 0)] == (35, 3)
    assert f[(1, 1)] == (60, 2)
    lab = {
        (r["row_i"], r["col_i"]): r["region_id"]
        for r in label_regions(_raster(spark, cells), offsets=hex_offsets()).collect()
    }
    # all four connect through (0,1)/(0,0): one region
    assert len(set(lab.values())) == 1


def test_rook_radius2_has_no_diagonals():
    offs = neighbor_offsets(radius=2, queen=False)
    assert all(dr == 0 or dc == 0 for dr, dc in offs)
    assert (0, 2) in offs and (2, 0) in offs and (1, 1) not in offs


def test_focal_reserved_column_guard(spark):
    with pytest.raises(ValueError, match="collide"):
        focal_stats(
            spark.createDataFrame([(0, 0, 1, 9)], "row_i long, col_i long, n long, t_row long"),
            "n",
        )


def test_gi_star_overflow_is_loud_never_silent(spark):
    """Out-of-range magnitudes must raise (either Spark's ANSI
    ARITHMETIC_OVERFLOW in the integer sums, or the operator's own
    double-arithmetic guard on the D product) — never return
    silently-wrong z-scores."""
    from seraster_spark.focal import getis_ord_gi_star

    big = 3_000_000_000
    cells = [(r, c, big if (r + c) % 2 == 0 else 0) for r in range(3) for c in range(3)]
    with pytest.raises(
        Exception, match="int64|variance core|ARITHMETIC_OVERFLOW|overflow"
    ):
        getis_ord_gi_star(_raster(spark, cells), "n").collect()


# --- multi-source BFS grid distance ----------------------------------------


def _naive_bfs(tiles, sources, offs):
    from collections import deque

    occ = set(tiles)
    dist = {s: 0 for s in sources if s in occ}
    q = deque(dist)
    while q:
        r, c = q.popleft()
        for dr, dc in offs:
            n = (r + dr, c + dc)
            if n in occ and n not in dist:
                dist[n] = dist[(r, c)] + 1
                q.append(n)
    return dist


@pytest.mark.parametrize("queen", [False, True])
def test_grid_distance_matches_naive(spark, queen):
    """Random occupied raster with gaps + an isolated island without a
    source (must stay absent), rook and queen adjacency."""
    from seraster_spark.focal import grid_distance, neighbor_offsets

    rng = np.random.default_rng(5)
    tiles = {(int(r), int(c)) for r, c in rng.integers(0, 14, (120, 2))}
    tiles |= {(30, 30), (30, 31), (31, 30)}  # far island, no source
    sources = [t for t in sorted(tiles) if (t[0] + t[1]) % 7 == 0 and t[0] < 20][:5]
    tdf = spark.createDataFrame(sorted(tiles), "row_i long, col_i long").repartition(5)
    sdf = spark.createDataFrame(sources, "row_i long, col_i long")
    got = {
        (r["row_i"], r["col_i"]): r["grid_dist"]
        for r in grid_distance(tdf, sdf, queen=queen).collect()
    }
    want = _naive_bfs(tiles, sources, neighbor_offsets(1, queen=queen))
    assert got == want
    assert (30, 30) not in got  # unreachable island absent


def test_grid_distance_hex_offsets(spark):
    """Hex adjacency: a straight axial line is reachable step by step."""
    from seraster_spark.focal import grid_distance, hex_offsets

    line = [(0, q) for q in range(6)]
    tdf = spark.createDataFrame(line, "row_i long, col_i long")
    sdf = spark.createDataFrame([(0, 0)], "row_i long, col_i long")
    got = {
        (r["row_i"], r["col_i"]): r["grid_dist"]
        for r in grid_distance(tdf, sdf, offsets=hex_offsets()).collect()
    }
    assert got == {(0, q): q for q in range(6)}


def test_grid_distance_sources_must_be_occupied(spark):
    from seraster_spark.focal import grid_distance

    tdf = spark.createDataFrame([(0, 0), (0, 1)], "row_i long, col_i long")
    sdf = spark.createDataFrame([(9, 9)], "row_i long, col_i long")  # not a tile
    assert grid_distance(tdf, sdf).count() == 0


def test_grid_distance_compaction_parity_and_block_release(spark):
    """compact_every=2 (several mid-loop compactions) returns the same
    distances as the naive BFS, and — ADVICE r4 — superseded round
    checkpoints are explicitly released: at most the final compacted
    frame's RDDs remain persisted after the call."""
    from seraster_spark.focal import grid_distance, neighbor_offsets

    rng = np.random.default_rng(11)
    tiles = {(int(r), int(c)) for r, c in rng.integers(0, 16, (160, 2))}
    sources = sorted(tiles)[:2]
    tdf = spark.createDataFrame(sorted(tiles), "row_i long, col_i long").repartition(4)
    sdf = spark.createDataFrame(sources, "row_i long, col_i long")

    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    out = grid_distance(tdf, sdf, compact_every=2)
    got = {(r["row_i"], r["col_i"]): r["grid_dist"] for r in out.collect()}
    leaked = set(jsc.getPersistentRDDs().keySet().toArray()) - before
    # only the returned frame's own checkpoint may remain
    assert len(leaked) <= 1, leaked

    want = _naive_bfs(tiles, sources, neighbor_offsets(1, queen=False))
    assert got == want


def test_grid_distance_coarse_recipe(spark):
    """Coarsen-first helper: on a solid raster the scaled estimate brackets
    the exact distance within one factor either side, every input tile
    gets a row, and the BFS round count drops by ~factor."""
    from seraster_spark.focal import grid_distance, grid_distance_coarse

    side, factor = 24, 4
    tiles = [(r, c) for r in range(side) for c in range(side)]
    tdf = spark.createDataFrame(tiles, "row_i long, col_i long")
    sdf = spark.createDataFrame([(0, 0)], "row_i long, col_i long")
    est = {
        (r["row_i"], r["col_i"]): (r["coarse_dist"], r["grid_dist_est"])
        for r in grid_distance_coarse(tdf, sdf, factor=factor).collect()
    }
    assert len(est) == side * side  # one row per input tile
    exact = {
        (r["row_i"], r["col_i"]): r["grid_dist"]
        for r in grid_distance(tdf, sdf).collect()
    }
    for t, d in exact.items():
        cd, de = est[t]
        assert de == cd * factor
        # rook distance on a solid grid: factor*cd <= d <= factor*(cd+2)-2
        # (in-cell slack up to factor-1 in EACH of the two coordinates)
        assert factor * cd <= d <= factor * (cd + 2) - 2, (t, d, cd)


def test_grid_distance_coarse_validation(spark):
    from seraster_spark.focal import grid_distance_coarse

    tdf = spark.createDataFrame([(0, 0)], "row_i long, col_i long")
    with pytest.raises(ValueError, match="factor"):
        grid_distance_coarse(tdf, tdf, factor=0)


# ---------------------------------------------------------------------------
# viewshed


def _vs(spark, rows, obs=(0, 0), **kw):
    from seraster_spark.focal import viewshed

    df = spark.createDataFrame(rows, "row_i long, col_i long, n_docs long")
    return {
        (r["row_i"], r["col_i"]): r["visible"]
        for r in viewshed(df, obs, **kw).collect()
    }


def test_viewshed_wall_occludes_low_but_not_tall(spark):
    # observer at (0,0) elev 0, eye height 1 -> h=1; wall elev 5 at col 2.
    # The low tile behind the wall is hidden; the 100-tower is not; the wall
    # itself and every tile at chebyshev distance <= 1 are visible.
    vis = _vs(
        spark,
        [(0, 0, 0), (0, 2, 5), (0, 4, 0), (0, 6, 100), (1, 1, 0)],
    )
    assert vis == {
        (0, 0): True,
        (0, 2): True,
        (0, 4): False,
        (0, 6): True,
        (1, 1): True,
    }


def test_viewshed_matches_naive_python(spark):
    # randomized raster vs a literal per-target python replay of the
    # contract (same parametric sampling + integer slope test)
    import random

    rng = random.Random(11)
    cells = {}
    for _ in range(160):
        cells[(rng.randrange(12), rng.randrange(12))] = rng.randrange(8)
    rows = [(r, c, e) for (r, c), e in cells.items()]
    obs, height = (5, 6), 2
    h = cells.get(obs, 0) + height

    def naive(tr, tc, te):
        n = max(abs(tr - obs[0]), abs(tc - obs[1]))
        if n <= 1:
            return True
        for t in range(1, n):
            sr = obs[0] + (2 * t * (tr - obs[0]) + n) // (2 * n)
            sc = obs[1] + (2 * t * (tc - obs[1]) + n) // (2 * n)
            if n * (cells.get((sr, sc), 0) - h) >= t * (te - h):
                return False
        return True

    got = _vs(spark, rows, obs, observer_height=height)
    assert got == {(r, c): naive(r, c, e) for r, c, e in rows}


def test_viewshed_max_radius_and_empty_observer_cell(spark):
    # observer on an ABSENT tile (elev 0 + height); max_radius drops the
    # far tile entirely (standard viewshed contract), keeps the near ones
    rows = [(0, 1, 3), (0, 3, 1), (0, 9, 2)]
    got = _vs(spark, rows, (0, 0), observer_height=2, max_radius=4)
    assert set(got) == {(0, 1), (0, 3)}
    assert got[(0, 1)] is True
    # h=2, wall elev 3 at t=1 of the n=3 line: 3*(3-2) >= 1*(1-2) -> blocked
    assert got[(0, 3)] is False


# ---------------------------------------------------------------------------
# terrain (Horn slope/aspect)


def test_terrain_matches_naive_python(spark):
    """Randomized raster vs a literal python replay of the Horn kernel +
    octant rule; isolated tiles survive with a flat gradient (NULL octant,
    slope 0)."""
    import math
    import random

    from seraster_spark.focal import terrain

    rng = random.Random(5)
    cells = {(rng.randrange(10), rng.randrange(10)): rng.randrange(50) for _ in range(60)}
    cells[(20, 20)] = 7  # isolated tile
    rows = [(r, c, e) for (r, c), e in cells.items()]
    df = spark.createDataFrame(rows, "row_i long, col_i long, n_docs long")
    got = {
        (r["row_i"], r["col_i"]): (
            r["ddx_num"], r["ddy_num"], r["slope_ratio"], r["aspect_octant"]
        )
        for r in terrain(df, "n_docs", resolution=100.0).collect()
    }
    assert set(got) == set(cells)

    def naive(r, c):
        gx = gy = 0
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                e = cells.get((r + dr, c + dc), 0)
                gx += e * dc * (2 - abs(dr))
                gy += e * dr * (2 - abs(dc))
        if gx == 0 and gy == 0:
            oct_ = None
        elif 2 * abs(gy) <= abs(gx):
            oct_ = 0 if gx > 0 else 4
        elif 2 * abs(gx) <= abs(gy):
            oct_ = 2 if gy > 0 else 6
        else:
            oct_ = {(1, 1): 1, (-1, 1): 3, (-1, -1): 5, (1, -1): 7}[
                (1 if gx > 0 else -1, 1 if gy > 0 else -1)
            ]
        return gx, gy, math.sqrt(gx * gx + gy * gy) / 800.0, oct_

    for (r, c), v in got.items():
        assert v == naive(r, c), (r, c, v, naive(r, c))
    assert got[(20, 20)] == (0, 0, 0.0, None)


def test_terrain_uniform_interior_is_flat(spark):
    """On a constant-elevation filled block, every INTERIOR tile is flat
    (the Horn kernel annihilates constants); edge tiles feel the implicit
    0-elevation outside."""
    from seraster_spark.focal import terrain

    rows = [(r, c, 9) for r in range(5) for c in range(5)]
    df = spark.createDataFrame(rows, "row_i long, col_i long, n_docs long")
    out = {
        (r["row_i"], r["col_i"]): (r["ddx_num"], r["ddy_num"], r["aspect_octant"])
        for r in terrain(df, "n_docs").collect()
    }
    for r in range(1, 4):
        for c in range(1, 4):
            assert out[(r, c)] == (0, 0, None)
    # west edge: outside is lower -> steepest ascent points east (octant 0)
    assert out[(2, 0)][2] == 0


def test_grid_distance_error_path_releases_checkpoints(spark):
    """r5 review fix: the max_rounds-exhaustion error (and any mid-loop
    failure) drains every tracked round checkpoint — repeated failed
    attempts must not accumulate executor storage. compact_every is also
    validated."""
    import pytest as _pt

    from seraster_spark.focal import grid_distance

    tiles = [(0, c, ) for c in range(12)]
    tdf = spark.createDataFrame([(r, c) for r, c in ((0, c) for c in range(12))],
                                "row_i long, col_i long")
    sdf = spark.createDataFrame([(0, 0)], "row_i long, col_i long")
    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    with _pt.raises(ValueError, match="max_rounds"):
        grid_distance(tdf, sdf, max_rounds=3)
    leaked = set(jsc.getPersistentRDDs().keySet().toArray()) - before
    assert leaked == set(), leaked
    with _pt.raises(ValueError, match="compact_every"):
        grid_distance(tdf, sdf, compact_every=0)


def test_terrain_null_elevation_gives_null_octant(spark):
    """r5 review fix: a NULL elevation makes the kernel numerators NULL —
    classified as NULL octant (no gradient information), never the
    .otherwise() fall-through octant 7."""
    from seraster_spark.focal import terrain

    df = spark.createDataFrame(
        [(5, 5, None), (0, 0, 3)], "row_i long, col_i long, n_docs long"
    )
    got = {
        (r["row_i"], r["col_i"]): (r["ddx_num"], r["aspect_octant"])
        for r in terrain(df, "n_docs").collect()
    }
    assert got[(5, 5)] == (None, None)
