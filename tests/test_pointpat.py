"""pair_stats: Ripley-K pair counts + semivariogram over a point corpus."""

import numpy as np
import pytest

from seraster_spark import pointpat


def _naive(px, py, v, radii, area=None):
    """Brute-force ordered-pair replay (the completeness oracle)."""
    dx = px[:, None] - px[None, :]
    dy = py[:, None] - py[None, :]
    d2 = dx * dx + dy * dy
    np.fill_diagonal(d2, np.inf)
    sq = (v[:, None] - v[None, :]) ** 2
    out = {"n_pts": len(px)}
    for r in radii:
        m = d2 <= r * r
        lbl = pointpat._rlabel(r)
        pc = int(m.sum())
        sv = int(sq[m].sum())
        out[f"pc_{lbl}"] = pc
        out[f"sv_{lbl}"] = sv
        out[f"gamma_{lbl}"] = sv / (2.0 * pc) if pc else None
        if area is not None:
            out[f"khat_{lbl}"] = (area * pc) / (len(px) * (len(px) - 1.0))
    return out


def _df(spark, px, py, v):
    rows = [
        (int(i), float(x), float(y), int(val))
        for i, (x, y, val) in enumerate(zip(px, py, v))
    ]
    return spark.createDataFrame(rows, "doc_id long, x double, y double, val long")


def test_pair_stats_matches_naive(spark):
    """Engine (bucketed candidate join) ≡ brute-force all-pairs replay on
    random integer points, both join shapes, multiple radii spanning
    sub-bucket to multi-bucket distances."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 400, 300).astype(float)
    py = rng.integers(0, 300, 300).astype(float)
    v = rng.integers(0, 50, 300)
    radii = [10.0, 40.0, 90.0]
    want = _naive(px, py, v, radii, area=400.0 * 300.0)
    for bc in (True, False):
        got = pointpat.pair_stats(
            _df(spark, px, py, v), radii, area=400.0 * 300.0, broadcast_side=bc
        ).collect()[0].asDict()
        for k, wv in want.items():
            if isinstance(wv, float):
                assert got[k] == pytest.approx(wv, abs=0, rel=0), (k, bc)
            else:
                assert got[k] == wv, (k, bc)


def test_pair_stats_boundary(spark):
    """Points EXACTLY r_max apart, straddling bucket gridlines — the
    9-neighbor cover must still find every pair (d ≤ r_max ⇒ adjacent
    buckets), and pairs at distance exactly r count as within."""
    # colinear points at exact bucket-size spacing, one pair diagonal
    px = np.array([0.0, 100.0, 200.0, 100.0])
    py = np.array([0.0, 0.0, 0.0, 100.0])
    v = np.array([1, 2, 3, 4])
    got = pointpat.pair_stats(_df(spark, px, py, v), [100.0]).collect()[0].asDict()
    want = _naive(px, py, v, [100.0])
    assert got["pc_100"] == want["pc_100"] == 6  # 3 unordered pairs at d=100
    assert got["sv_100"] == want["sv_100"]


def test_pair_stats_null_and_nonfinite_dropped(spark):
    rows = [
        (1, 0.0, 0.0, 5),
        (2, 3.0, 4.0, 7),
        (3, None, 1.0, 9),
        (4, float("nan"), 1.0, 9),
        (5, 1.0, 1.0, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, x double, y double, val long")
    got = pointpat.pair_stats(df, [10.0]).collect()[0].asDict()
    assert got["n_pts"] == 2
    assert got["pc_10"] == 2  # one unordered pair at d=5, ordered count 2
    assert got["sv_10"] == 2 * (7 - 5) ** 2
    assert got["gamma_10"] == pytest.approx(2.0)  # (7-5)^2 / 2


def test_pair_stats_no_pairs_in_radius(spark):
    px = np.array([0.0, 500.0])
    py = np.array([0.0, 0.0])
    v = np.array([1, 2])
    got = pointpat.pair_stats(_df(spark, px, py, v), [5.0]).collect()[0].asDict()
    assert got["pc_5"] == 0 and got["sv_5"] == 0
    assert got["gamma_5"] is None


def test_pair_stats_duplicate_coords_and_labels(spark):
    """Coincident points pair at d=0; fractional radius gets a safe label."""
    px = np.array([1.0, 1.0, 1.0])
    py = np.array([2.0, 2.0, 2.0])
    v = np.array([10, 20, 30])
    got = pointpat.pair_stats(_df(spark, px, py, v), [2.5]).collect()[0].asDict()
    assert got["pc_2p5"] == 6
    assert got["sv_2p5"] == 2 * (100 + 400 + 100)


def test_pair_stats_rejects_bad_radii(spark):
    df = _df(spark, np.array([0.0]), np.array([0.0]), np.array([1]))
    with pytest.raises(ValueError, match="non-empty"):
        pointpat.pair_stats(df, [])
    with pytest.raises(ValueError, match="positive"):
        pointpat.pair_stats(df, [0.0, 10.0])


def test_pair_stats_no_python_in_plan(spark):
    """Pure Column plan — no Arrow/Python eval nodes."""
    df = _df(spark, np.array([0.0, 1.0]), np.array([0.0, 1.0]), np.array([1, 2]))
    plan = pointpat.pair_stats(df, [10.0])._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
