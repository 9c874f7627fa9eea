"""Segment (trajectory) rasterization: Liang-Barsky tile fractions.

Oracle strategy: a brute-force numpy replay clips every segment against
EVERY tile in its bbox (no supercover shortcut), so the Spark op's
two-stage candidate generation is checked against an implementation that
cannot under-generate. Invariants: in-grid segments' fractions sum to 1;
tie-breaks match the point encoder on axis-degenerate segments."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from seraster_spark.grid import GridSpec, square_rowcol, unpack
from seraster_spark.segments import rasterize_segments, segment_tile_fractions

SPEC = GridSpec(xmin=0.0, ymin=0.0, xmax=1000.0, ymax=800.0, resolution=100.0)


def _numpy_fractions(segs, spec):
    """Brute-force replay: dict[(row, col)] -> [(seg_ix, frac)] via a
    Liang-Barsky clip of each segment against every bbox-candidate tile."""
    res = spec.resolution
    out = {}
    for ix, (x0, y0, x1, y1) in enumerate(segs):
        sdx, sdy = x1 - x0, y1 - y0
        if sdx == 0 and sdy == 0:
            r, c = square_rowcol(np.array([x0]), np.array([y0]), spec)
            r, c = int(r[0]), int(c[0])
            if 0 <= r < spec.nrows and 0 <= c < spec.ncols:
                out.setdefault((r, c), []).append((ix, 1.0))
            continue
        if sdx == 0:
            _, c = square_rowcol(np.array([x0]), np.array([y0]), spec)
            cols = [int(c[0])]
        else:
            cols = range(
                int(math.floor((min(x0, x1) - spec.xmin) / res)),
                int(math.floor((max(x0, x1) - spec.xmin) / res)) + 1,
            )
        if sdy == 0:
            r, _ = square_rowcol(np.array([x0]), np.array([y0]), spec)
            rows = [int(r[0])]
        else:
            rows = range(
                int(math.floor((min(y0, y1) - spec.ymin) / res)),
                int(math.floor((max(y0, y1) - spec.ymin) / res)) + 1,
            )
        for c in cols:
            if not (0 <= c < spec.ncols):
                continue
            for r in rows:
                if not (0 <= r < spec.nrows):
                    continue
                lox = spec.xmin + c * res
                loy = spec.ymin + r * res
                if sdx != 0:
                    ta, tb = (lox - x0) / sdx, (lox + res - x0) / sdx
                    tx_en, tx_ex = min(ta, tb), max(ta, tb)
                else:
                    tx_en, tx_ex = 0.0, 1.0
                if sdy != 0:
                    ta, tb = (loy - y0) / sdy, (loy + res - y0) / sdy
                    ty_en, ty_ex = min(ta, tb), max(ta, tb)
                else:
                    ty_en, ty_ex = 0.0, 1.0
                t0 = max(0.0, tx_en, ty_en)
                t1 = min(1.0, tx_ex, ty_ex)
                if t1 - t0 > 0:
                    out.setdefault((r, c), []).append((ix, t1 - t0))
    return out


def _collect_fracs(spark, segs, spec, impl="arrow", **kw):
    df = spark.createDataFrame(
        [(i, *s) for i, s in enumerate(segs)],
        "seg_id long, x0 double, y0 double, x1 double, y1 double",
    )
    ft = segment_tile_fractions(df, spec, impl=impl, **kw)
    got = {}
    for row in ft.collect():
        _, _, r, c = unpack(np.array([row["cell_id"]], dtype=np.int64))
        got.setdefault((int(r[0]), int(c[0])), []).append(
            (row["seg_id"], row["frac"])
        )
    return got


def test_matches_bruteforce_replay(spark):
    rng = np.random.default_rng(7)
    segs = []
    for _ in range(120):
        x0, x1 = rng.uniform(-50, 1050, 2)
        y0, y1 = rng.uniform(-50, 850, 2)
        segs.append((float(x0), float(y0), float(x1), float(y1)))
    want = _numpy_fractions(segs, SPEC)
    got = _collect_fracs(spark, segs, SPEC)
    assert set(got) == set(want)
    for key in want:
        w = dict(want[key])
        g = dict(got[key])
        assert set(w) == set(g), key
        for seg_ix in w:
            assert g[seg_ix] == pytest.approx(w[seg_ix], abs=1e-12)


def test_in_grid_fraction_sums_to_one(spark):
    rng = np.random.default_rng(11)
    segs = [
        tuple(float(v) for v in (rng.uniform(10, 990), rng.uniform(10, 790),
                                 rng.uniform(10, 990), rng.uniform(10, 790)))
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        [(i, *s) for i, s in enumerate(segs)],
        "seg_id long, x0 double, y0 double, x1 double, y1 double",
    )
    per_seg = (
        segment_tile_fractions(df, SPEC)
        .groupBy("seg_id")
        .agg(F.sum("frac").alias("tot"))
        .collect()
    )
    assert len(per_seg) == len(segs)
    for row in per_seg:
        assert row["tot"] == pytest.approx(1.0, abs=1e-9)


def test_vertical_on_gridline_takes_lower_column(spark):
    # x exactly on the interior boundary between col 1 and col 2 -> the
    # point rule sends boundary points to the LOWER cell; the whole
    # segment must land in col 1 only (never double-counted).
    got = _collect_fracs(spark, [(200.0, 110.0, 200.0, 290.0)], SPEC)
    cols = {c for (_, c) in got}
    assert cols == {1}
    total = sum(f for v in got.values() for _, f in v)
    assert total == pytest.approx(1.0, abs=1e-12)


def test_horizontal_on_gridline_takes_lower_row(spark):
    got = _collect_fracs(spark, [(110.0, 300.0, 350.0, 300.0)], SPEC)
    rows = {r for (r, _) in got}
    assert rows == {2}
    total = sum(f for v in got.values() for _, f in v)
    assert total == pytest.approx(1.0, abs=1e-12)


def test_degenerate_point_segment(spark):
    got = _collect_fracs(spark, [(250.0, 250.0, 250.0, 250.0)], SPEC)
    assert got == {(2, 2): [(0, 1.0)]}
    # corner point follows the point tie-break exactly
    got = _collect_fracs(spark, [(300.0, 300.0, 300.0, 300.0)], SPEC)
    r, c = square_rowcol(np.array([300.0]), np.array([300.0]), SPEC)
    assert got == {(int(r[0]), int(c[0])): [(0, 1.0)]}


def test_off_grid_segment_is_empty(spark):
    got = _collect_fracs(spark, [(-500.0, -500.0, -400.0, -450.0)], SPEC)
    assert got == {}


def test_partially_off_grid_counts_only_inside(spark):
    # enters the grid halfway: x from -100 to 100 at constant y
    got = _collect_fracs(spark, [(-100.0, 50.0, 100.0, 50.0)], SPEC)
    assert set(got) == {(0, 0)}
    assert got[(0, 0)][0][1] == pytest.approx(0.5, abs=1e-12)


def test_cap_raises_loudly(spark):
    df = spark.createDataFrame(
        [(0, 0.0, 0.0, 999.0, 799.0)],
        "seg_id long, x0 double, y0 double, x1 double, y1 double",
    )
    with pytest.raises(Exception, match="max_tiles_per_seg"):
        segment_tile_fractions(df, SPEC, max_tiles_per_seg=3).collect()


def test_quantized_fracs_are_dyadic(spark):
    rng = np.random.default_rng(3)
    segs = [
        tuple(float(v) for v in (rng.uniform(0, 990), rng.uniform(0, 790),
                                 rng.uniform(0, 990), rng.uniform(0, 790)))
        for _ in range(30)
    ]
    got = _collect_fracs(spark, segs, SPEC, quantize_bits=20)
    for v in got.values():
        for _, f in v:
            assert f * (1 << 20) == int(f * (1 << 20))


def test_sub_quantum_crossings_are_dropped(spark):
    # frac 0.125 in the end tiles rounds to 0 at quantize_bits=1 (step 0.5)
    # -> those rows must be dropped so the frac > 0 contract holds; the
    # 0.25 interior crossings round up to 0.5 and survive.
    got = _collect_fracs(
        spark, [(50.0, 50.0, 450.0, 50.0)], SPEC, quantize_bits=1
    )
    assert {c for (_, c) in got} == {1, 2, 3}
    for v in got.values():
        assert v == [(0, 0.5)]


def test_rasterize_segments_aggregates(spark):
    segs = [
        (50.0, 50.0, 250.0, 50.0),   # crosses cols 0,1,2 in row 0
        (150.0, 20.0, 150.0, 80.0),  # vertical inside (0,1)
    ]
    df = spark.createDataFrame(
        [(i, *s, 10.0 * (i + 1)) for i, s in enumerate(segs)],
        "seg_id long, x0 double, y0 double, x1 double, y1 double, v double",
    )
    out = rasterize_segments(df, SPEC, value_cols=("v",), length_weighted=True)
    rows = {}
    for row in out.collect():
        _, _, r, c = unpack(np.array([row["cell_id"]], dtype=np.int64))
        rows[(int(r[0]), int(c[0]))] = row
    assert set(rows) == {(0, 0), (0, 1), (0, 2)}
    assert rows[(0, 0)]["n_segs"] == 1
    assert rows[(0, 1)]["n_segs"] == 2
    assert rows[(0, 0)]["frac_sum"] == pytest.approx(0.25, abs=1e-12)
    assert rows[(0, 1)]["frac_sum"] == pytest.approx(0.5 + 1.0, abs=1e-12)
    assert rows[(0, 2)]["frac_sum"] == pytest.approx(0.25, abs=1e-12)
    # value weighting: seg0 v=10 spread 1/4,1/2,1/4; seg1 v=20 all in (0,1)
    assert rows[(0, 0)]["w_v"] == pytest.approx(2.5, abs=1e-12)
    assert rows[(0, 1)]["w_v"] == pytest.approx(5.0 + 20.0, abs=1e-12)
    # crossing length: seg0 len 200 -> 50/100/50; seg1 len 60 all in (0,1)
    assert rows[(0, 0)]["len_sum"] == pytest.approx(50.0, abs=1e-9)
    assert rows[(0, 1)]["len_sum"] == pytest.approx(100.0 + 60.0, abs=1e-9)


def test_column_impl_no_python_and_single_shuffle(spark):
    df = spark.createDataFrame(
        [(0, 1.0, 2.0, 900.0, 700.0)],
        "seg_id long, x0 double, y0 double, x1 double, y1 double",
    )
    out = rasterize_segments(df, SPEC, value_cols=(), impl="column")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # zero Python of any kind on the column path
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 2  # one hash-agg exchange (AQE may print reuse)


def test_arrow_impl_is_mapinpandas_single_shuffle(spark):
    df = spark.createDataFrame(
        [(0, 1.0, 2.0, 900.0, 700.0)],
        "seg_id long, x0 double, y0 double, x1 double, y1 double",
    )
    out = rasterize_segments(df, SPEC, value_cols=(), impl="arrow")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # Arrow-batched, never row-at-a-time
    assert plan.count("Exchange") <= 2


def test_arrow_column_bitwise_parity(spark):
    # the two impls must agree EXACTLY — same candidate set, bitwise-equal
    # fractions (every step is one correctly-rounded IEEE op on both sides)
    rng = np.random.default_rng(23)
    segs = []
    for _ in range(150):
        x0v, x1v = rng.uniform(-80, 1080, 2)
        y0v, y1v = rng.uniform(-80, 880, 2)
        segs.append((float(x0v), float(y0v), float(x1v), float(y1v)))
    segs += [
        (200.0, 110.0, 200.0, 290.0),   # vertical on a gridline
        (110.0, 300.0, 350.0, 300.0),   # horizontal on a gridline
        (250.0, 250.0, 250.0, 250.0),   # point
        (-500.0, -500.0, -400.0, -450.0),  # off-grid
    ]
    for kw in ({}, {"quantize_bits": 20}):
        a = _collect_fracs(spark, segs, SPEC, impl="arrow", **kw)
        c = _collect_fracs(spark, segs, SPEC, impl="column", **kw)
        assert set(a) == set(c)
        for key in a:
            assert sorted(a[key]) == sorted(c[key]), key  # exact, no approx


def test_fused_arrow_raster_matches_column_exactly_when_quantized(spark):
    # the fused per-batch bincount partials must reproduce the column
    # path's aggregate BIT-exactly under quantization (dyadic sums are
    # order-independent) — counts, fractions, and weighted values
    rng = np.random.default_rng(31)
    rows = []
    for i in range(200):
        x0v, x1v = rng.uniform(-80, 1080, 2)
        y0v, y1v = rng.uniform(-80, 880, 2)
        rows.append(
            (i, float(x0v), float(y0v), float(x1v), float(y1v), float(i % 37))
        )
    df = spark.createDataFrame(
        rows, "seg_id long, x0 double, y0 double, x1 double, y1 double, v double"
    ).repartition(5)
    outs = {}
    for impl in ("arrow", "column"):
        got = rasterize_segments(
            df, SPEC, value_cols=("v",), quantize_bits=20, impl=impl
        ).collect()
        outs[impl] = {
            r["cell_id"]: (r["n_segs"], r["frac_sum"], r["w_v"]) for r in got
        }
    assert outs["arrow"] == outs["column"]  # exact, not approx


def test_null_coordinate_rows_dropped_both_impls(spark):
    df = spark.createDataFrame(
        [(0, 10.0, 10.0, None, 20.0), (1, 10.0, 10.0, 20.0, 20.0)],
        "seg_id long, x0 double, y0 double, x1 double, y1 double",
    )
    for impl in ("arrow", "column"):
        got = segment_tile_fractions(df, SPEC, impl=impl).collect()
        assert {r["seg_id"] for r in got} == {1}, impl


def test_all_null_value_cell_yields_null_weighted_sum_both_impls(spark):
    """A tile crossed only by NULL-val segments reports w_v = NULL (SQL sum
    semantics) on BOTH impls — the arrow kernel used to coerce it to 0.0."""
    df = spark.createDataFrame(
        [
            # horizontal segment inside one tile, NULL value
            (10.0, 10.0, 40.0, 10.0, None),
            # another tile entirely, real value
            (110.0, 110.0, 140.0, 110.0, 3.0),
        ],
        "x0 double, y0 double, x1 double, y1 double, v double",
    )
    for impl in ("arrow", "column"):
        rows = {
            r["cell_id"]: (r["w_v"], r["n_segs"])
            for r in rasterize_segments(
                df, SPEC, value_cols=("v",), impl=impl
            ).collect()
        }
        vals = sorted(rows.values(), key=lambda t: (t[0] is not None, t[0]))
        assert len(rows) == 2, impl
        assert vals[0][0] is None and vals[0][1] == 1, impl
        assert vals[1][0] == pytest.approx(3.0) and vals[1][1] == 1, impl


def test_nonfinite_coordinate_rows_dropped_both_impls(spark):
    """NaN/Inf coordinates are dropped by BOTH impls (the column path used
    to pass them into floor()/sequence(); the docstring claimed parity)."""
    nan, inf = float("nan"), float("inf")
    df = spark.createDataFrame(
        [
            (0, nan, 10.0, 20.0, 20.0),
            (1, 10.0, inf, 20.0, 20.0),
            (2, 10.0, 10.0, -inf, 20.0),
            (3, 10.0, 10.0, 20.0, nan),
            (4, 10.0, 10.0, 20.0, 20.0),
        ],
        "seg_id long, x0 double, y0 double, x1 double, y1 double",
    )
    for impl in ("arrow", "column"):
        got = segment_tile_fractions(df, SPEC, impl=impl).collect()
        assert {r["seg_id"] for r in got} == {4}, impl
