import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from seraster_spark.joins import asof_join


def _frames(spark, seed=7, n_keys=5, n_left=80, n_right=120):
    rng = np.random.default_rng(seed)
    lpdf = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "ts": rng.integers(0, 1000, n_left),
            "lid": np.arange(n_left),
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "ts": rng.integers(0, 1000, n_right),
            "rid": np.arange(n_right),
            "v": rng.integers(0, 100, n_right),
        }
    )
    left = spark.createDataFrame(lpdf.astype(int))
    right = spark.createDataFrame(rpdf.astype(int))
    return lpdf, rpdf, left, right


def _naive_backward(lpdf, rpdf):
    out = {}
    for _, lrow in lpdf.iterrows():
        cand = rpdf[(rpdf.k == lrow.k) & (rpdf.ts <= lrow.ts)]
        if len(cand):
            best = cand.sort_values(["ts", "rid"]).iloc[-1]
            out[lrow.lid] = (best.rid, best.v, best.ts)
        else:
            out[lrow.lid] = (None, None, None)
    return out


def test_asof_backward_matches_naive(spark):
    lpdf, rpdf, left, right = _frames(spark)
    got = {
        r["lid"]: (r["asof_rid"], r["asof_v"], r["asof_ts"])
        for r in asof_join(
            left, right, on=["k"], ts_col="ts", right_cols=["rid", "v"], tiebreak="rid"
        ).collect()
    }
    want = _naive_backward(lpdf, rpdf)
    assert len(got) == len(lpdf)
    for lid, w in want.items():
        assert got[lid] == w, f"lid={lid}"


def test_asof_forward_matches_naive(spark):
    lpdf, rpdf, left, right = _frames(spark, seed=11)
    got = {
        r["lid"]: (r["asof_rid"], r["asof_ts"])
        for r in asof_join(
            left, right, on=["k"], ts_col="ts", right_cols=["rid"],
            tiebreak="rid", direction="forward",
        ).collect()
    }
    for _, lrow in lpdf.iterrows():
        cand = rpdf[(rpdf.k == lrow.k) & (rpdf.ts >= lrow.ts)]
        if len(cand):
            # smallest ts; ties -> highest rid wins (same rule as backward)
            best = cand.sort_values(["ts", "rid"], ascending=[False, True]).iloc[-1]
            assert got[lrow.lid] == (best.rid, best.ts), f"lid={lrow.lid}"
        else:
            assert got[lrow.lid] == (None, None)


def test_asof_equal_ts_right_is_visible_and_highest_tiebreak_wins(spark):
    left = spark.createDataFrame([(1, 100, 0)], "k long, ts long, lid long")
    right = spark.createDataFrame(
        [(1, 100, 7, 70), (1, 100, 9, 90), (1, 50, 5, 50)],
        "k long, ts long, rid long, v long",
    )
    row = asof_join(
        left, right, on=["k"], ts_col="ts", right_cols=["rid", "v"], tiebreak="rid"
    ).first()
    assert (row["asof_rid"], row["asof_v"]) == (9, 90)


def test_asof_no_match_keeps_left_row_with_nulls(spark):
    left = spark.createDataFrame([(1, 10, 0), (2, 10, 1)], "k long, ts long, lid long")
    right = spark.createDataFrame([(1, 99, 3, 1)], "k long, ts long, rid long, v long")
    rows = {r["lid"]: r for r in asof_join(
        left, right, on=["k"], ts_col="ts", right_cols=["rid", "v"]
    ).collect()}
    assert len(rows) == 2
    assert rows[0]["asof_rid"] is None and rows[1]["asof_rid"] is None


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame([(1, 100, 0), (1, 500, 1)], "k long, ts long, lid long")
    right = spark.createDataFrame([(1, 90, 3, 1)], "k long, ts long, rid long, v long")
    rows = {r["lid"]: r for r in asof_join(
        left, right, on=["k"], ts_col="ts", right_cols=["rid"], tolerance=F.lit(50)
    ).collect()}
    assert rows[0]["asof_rid"] == 3      # gap 10 <= 50
    assert rows[1]["asof_rid"] is None   # gap 410 > 50


def test_asof_single_shuffle_plan(spark):
    """The whole as-of is ONE exchange (hash on the key) — no join operator,
    no second shuffle: union is partition-local, the window sorts within
    the single hash partitioning."""
    _, _, left, right = _frames(spark)
    j = asof_join(left, right, on=["k"], ts_col="ts", right_cols=["rid"], tiebreak="rid")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan, plan


# --- interval (range) join -------------------------------------------------

from seraster_spark.joins import interval_join


def _interval_frames(spark, seed=3):
    rng = np.random.default_rng(seed)
    pts = pd.DataFrame({
        "ts": rng.integers(0, 500, 120),
        "pid": np.arange(120),
        "k": rng.integers(0, 3, 120),
    })
    sta = rng.integers(0, 480, 25)
    iv = pd.DataFrame({
        "istart": sta,
        "iend": sta + rng.integers(0, 60, 25),  # some empty (len 0)
        "iid": np.arange(25),
        "k": rng.integers(0, 3, 25),
    })
    return pts, iv, spark.createDataFrame(pts.astype(int)), spark.createDataFrame(iv.astype(int))


def _naive_pairs(pts, iv, keyed=False):
    out = set()
    for _, p in pts.iterrows():
        for _, i in iv.iterrows():
            if i.istart <= p.ts < i.iend and (not keyed or p.k == i.k):
                out.add((p.pid, i.iid))
    return out


def test_interval_join_matches_naive(spark):
    pts, iv, P, I = _interval_frames(spark)
    got = {(r["pid"], r["iid"]) for r in interval_join(
        P, I.drop("k"), "ts", "istart", "iend", bucket=32.0
    ).collect()}
    assert got == _naive_pairs(pts, iv)


def test_interval_join_bucket_width_invariant(spark):
    pts, iv, P, I = _interval_frames(spark, seed=9)
    want = _naive_pairs(pts, iv)
    for b in (7.0, 50.0, 1000.0):
        got = {(r["pid"], r["iid"]) for r in interval_join(
            P, I.drop("k"), "ts", "istart", "iend", bucket=b
        ).collect()}
        assert got == want, f"bucket={b}"


def test_interval_join_extra_key(spark):
    pts, iv, P, I = _interval_frames(spark, seed=5)
    got = {(r["pid"], r["iid"]) for r in interval_join(
        P, I, "ts", "istart", "iend", bucket=32.0, on=["k"]
    ).collect()}
    assert got == _naive_pairs(pts, iv, keyed=True)


def test_interval_join_half_open_and_empty(spark):
    P = spark.createDataFrame([(10, 0), (20, 1), (15, 2)], "ts long, pid long")
    I = spark.createDataFrame(
        [(10, 20, 0), (15, 15, 1)], "istart long, iend long, iid long"
    )
    got = {(r["pid"], r["iid"]) for r in interval_join(
        P, I, "ts", "istart", "iend", bucket=8.0
    ).collect()}
    # start inclusive, end exclusive; the empty interval matches nothing
    assert got == {(0, 0), (2, 0)}


def test_interval_join_left_keeps_unmatched_points(spark):
    P = spark.createDataFrame([(10, 0), (99, 1)], "ts long, pid long")
    I = spark.createDataFrame([(5, 20, 0)], "istart long, iend long, iid long")
    rows = {r["pid"]: r for r in interval_join(
        P, I, "ts", "istart", "iend", bucket=8.0, how="left"
    ).collect()}
    assert rows[0]["iid"] == 0
    assert rows[1]["iid"] is None


def test_interval_join_is_hash_join_not_nested_loop(spark):
    _, _, P, I = _interval_frames(spark)
    j = interval_join(P, I.drop("k"), "ts", "istart", "iend", bucket=32.0)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


# --- regression tests for review findings ---------------------------------


def test_asof_null_payload_value_carries_atomically(spark):
    """The matched right row's NULL payload must come back as NULL — not a
    chimera mixing columns from an older right row."""
    left = spark.createDataFrame([(1, 3, 0)], "k long, ts long, lid long")
    right = spark.createDataFrame(
        [(1, 1, 10, 5), (1, 2, 20, None)], "k long, ts long, rid long, v long"
    )
    row = asof_join(
        left, right, on=["k"], ts_col="ts", right_cols=["rid", "v"], tiebreak="rid"
    ).first()
    assert row["asof_rid"] == 20
    assert row["asof_v"] is None  # row 20's NULL, not row 10's 5


def test_asof_null_ts_right_rows_are_ignored(spark):
    left = spark.createDataFrame([(1, 50, 0)], "k long, ts long, lid long")
    right = spark.createDataFrame(
        [(1, None, 99, 1), (1, 100, 7, 2)], "k long, ts long, rid long, v long"
    )
    row = asof_join(left, right, on=["k"], ts_col="ts", right_cols=["rid"]).first()
    # the NULL-ts right can never satisfy ts <= 50; the ts=100 right is later
    assert row["asof_rid"] is None and row["asof_ts"] is None


def test_interval_join_left_null_payload_not_duplicated(spark):
    P = spark.createDataFrame([(10, 0, None), (99, 1, 5)], "ts long, pid long, payload long")
    I = spark.createDataFrame([(5, 20, 0)], "istart long, iend long, iid long")
    rows = interval_join(P, I, "ts", "istart", "iend", bucket=8.0, how="left").collect()
    assert len(rows) == 2  # matched NULL-payload row appears ONCE
    by_pid = {r["pid"]: r for r in rows}
    assert by_pid[0]["iid"] == 0 and by_pid[1]["iid"] is None


def test_interval_join_clashing_column_names_get_prefixed(spark):
    P = spark.createDataFrame([(10, 0, "pt")], "ts long, pid long, source string")
    I = spark.createDataFrame(
        [(5, 20, 0, "iv")], "istart long, iend long, iid long, source string"
    )
    out = interval_join(P, I, "ts", "istart", "iend", bucket=8.0)
    assert "ivl_source" in out.columns
    row = out.first()
    assert row["source"] == "pt" and row["ivl_source"] == "iv"


def test_interval_join_boundary_exact_at_epoch_scale(spark):
    """End-exclusive boundary decided exactly (no epsilon): an interval
    ending ON a bucket boundary at epoch magnitude must not cover that
    bucket's points."""
    t0 = 1_700_000_000
    P = spark.createDataFrame([(t0 + 3600, 0), (t0 + 3599, 1)], "ts long, pid long")
    I = spark.createDataFrame([(t0, t0 + 3600, 0)], "istart long, iend long, iid long")
    got = {r["pid"] for r in interval_join(P, I, "ts", "istart", "iend", bucket=3600.0).collect()}
    assert got == {1}


# ---------------------------------------------------------------------------
# skew escapes


def _hot_frames(spark, seed=3, n_left=400, n_right=600):
    """50% of both sides on ONE key; duplicate timestamps everywhere."""
    rng = np.random.default_rng(seed)
    hotl, hotr = n_left // 2, n_right // 2
    lpdf = pd.DataFrame(
        {
            "k": np.concatenate([np.zeros(hotl, int), rng.integers(1, 8, n_left - hotl)]),
            "ts": rng.integers(0, 500, n_left),
            "lid": np.arange(n_left),
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": np.concatenate([np.zeros(hotr, int), rng.integers(1, 8, n_right - hotr)]),
            "ts": rng.integers(0, 500, n_right),
            "rid": np.arange(n_right),
            "v": rng.integers(0, 100, n_right),
        }
    )
    left = spark.createDataFrame(lpdf.astype(int)).repartition(8)
    right = spark.createDataFrame(rpdf.astype(int)).repartition(8)
    return left, right


def test_asof_bucketed_matches_plain_on_hot_key(spark):
    """Result parity: the bucket-pre-split variant = the plain operator,
    row for row, on a 50%-hot-key fixture (boundary ties, empty buckets,
    leading buckets with no rights all exercised by the random draw)."""
    from seraster_spark.joins import asof_join_bucketed

    left, right = _hot_frames(spark)
    plain = asof_join(left, right, ["k"], "ts", ["rid", "v"], tiebreak="rid")
    bucketed = asof_join_bucketed(
        left, right, ["k"], "ts", ["rid", "v"], bucket=50.0, tiebreak="rid"
    )
    a = sorted(map(tuple, plain.toPandas().fillna(-1).to_numpy().tolist()))
    b = sorted(map(tuple, bucketed.toPandas().fillna(-1).to_numpy().tolist()))
    assert a == b
    assert sorted(plain.columns) == sorted(bucketed.columns)


def test_asof_bucketed_tolerance_matches_plain(spark):
    from seraster_spark.joins import asof_join_bucketed

    left, right = _hot_frames(spark, seed=9)
    tol = F.lit(30)
    plain = asof_join(
        left, right, ["k"], "ts", ["rid", "v"], tiebreak="rid", tolerance=tol
    )
    bucketed = asof_join_bucketed(
        left, right, ["k"], "ts", ["rid", "v"], bucket=64.0, tiebreak="rid",
        tolerance=tol,
    )
    a = sorted(map(tuple, plain.toPandas().fillna(-1).to_numpy().tolist()))
    b = sorted(map(tuple, bucketed.toPandas().fillna(-1).to_numpy().tolist()))
    assert a == b


def test_asof_bucketed_window_partitions_on_bucket(spark):
    """Plan shape: the big union+window pass must hash-partition on
    (key, _bkt) — the hot key actually splits — while the plain operator
    partitions on the key alone."""
    from seraster_spark.joins import asof_join_bucketed

    left, right = _hot_frames(spark)
    bucketed = asof_join_bucketed(
        left, right, ["k"], "ts", ["rid", "v"], bucket=50.0, tiebreak="rid"
    )
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert any(
        "hashpartitioning(k#" in line and "_bkt#" in line
        for line in plan.splitlines()
        if "Exchange" in line
    ), plan


def test_interval_join_outlier_sidechannel_matches_naive(spark):
    """A timeline-spanning interval must produce identical matches through
    the broadcast side-channel as through the explode path, and the explode
    path must not see it (bounded fan-out)."""
    points = spark.createDataFrame(
        pd.DataFrame({"ts": np.arange(0, 1000, 7), "pid": np.arange(143)})
    )
    ivals = pd.DataFrame(
        {
            "start": [0, 100, 350, 900],
            "end": [1000, 130, 410, 960],  # first spans the whole timeline
            "iv": ["wide", "a", "b", "c"],
        }
    )
    intervals = spark.createDataFrame(ivals)
    base = interval_join(points, intervals, "ts", "start", "end", bucket=50.0)
    esc = interval_join(
        points, intervals, "ts", "start", "end", bucket=50.0, outlier_buckets=4
    )
    a = sorted(map(tuple, base.toPandas()[["pid", "iv"]].to_numpy().tolist()))
    b = sorted(map(tuple, esc.toPandas()[["pid", "iv"]].to_numpy().tolist()))
    assert a == b
    assert len([x for x in b if x[1] == "wide"]) == 143
    # left mode parity too (unmatched points unaffected by the split)
    base_l = interval_join(
        points, intervals.filter(F.col("iv") != "wide"), "ts", "start", "end",
        bucket=50.0, how="left", outlier_buckets=4,
    )
    assert base_l.filter(F.col("iv").isNull()).count() > 0


def test_interval_join_outlier_rides_broadcast(spark):
    from seraster_spark.joins import interval_join as ij

    points = spark.createDataFrame(
        pd.DataFrame({"ts": np.arange(0, 1000, 7), "pid": np.arange(143)})
    )
    intervals = spark.createDataFrame(
        pd.DataFrame({"start": [0, 100], "end": [1000, 130], "iv": ["wide", "a"]})
    )
    out = ij(points, intervals, "ts", "start", "end", bucket=10.0, outlier_buckets=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_asof_bucketed_null_key_gets_cross_bucket_seed(spark):
    """A NULL `on` key is one group under the window's partitioning, so the
    seed join must be null-safe: the right row in an EARLIER bucket must
    still reach a NULL-keyed left row."""
    from seraster_spark.joins import asof_join_bucketed

    left = spark.createDataFrame([(None, 100, 1), ("a", 100, 2)], "k string, ts long, lid long")
    right = spark.createDataFrame(
        [(None, 5, 77, 9), ("a", 3, 88, 8)], "k string, ts long, rid long, v long"
    )
    plain = asof_join(left, right, ["k"], "ts", ["rid", "v"], tiebreak="rid")
    bucketed = asof_join_bucketed(
        left, right, ["k"], "ts", ["rid", "v"], bucket=10.0, tiebreak="rid"
    )
    a = sorted(map(tuple, plain.toPandas().astype(str).to_numpy().tolist()))
    b = sorted(map(tuple, bucketed.toPandas().astype(str).to_numpy().tolist()))
    assert a == b
    got = {r["lid"]: r["asof_rid"] for r in bucketed.collect()}
    assert got == {1: 77, 2: 88}


@pytest.mark.parametrize("seed,bucket", [(11, 7.0), (12, 33.0), (13, 250.0), (14, 1.0)])
def test_asof_bucketed_fuzz_parity(spark, seed, bucket):
    """Seeded-random parity sweep across bucket widths (1 = every ts its
    own bucket; 250 = several empty buckets between rows; ties and
    boundary-exact timestamps arise from the small ts range)."""
    from seraster_spark.joins import asof_join_bucketed

    rng = np.random.default_rng(seed)
    lpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 120),
            "ts": rng.integers(0, 300, 120),
            "lid": np.arange(120),
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 150),
            "ts": rng.integers(0, 300, 150),
            "rid": np.arange(150),
            "v": rng.integers(0, 50, 150),
        }
    )
    left = spark.createDataFrame(lpdf.astype(int)).repartition(5)
    right = spark.createDataFrame(rpdf.astype(int)).repartition(5)
    plain = asof_join(left, right, ["k"], "ts", ["rid", "v"], tiebreak="rid")
    bucketed = asof_join_bucketed(
        left, right, ["k"], "ts", ["rid", "v"], bucket=bucket, tiebreak="rid"
    )
    a = sorted(map(tuple, plain.toPandas().astype(str).to_numpy().tolist()))
    b = sorted(map(tuple, bucketed.toPandas().astype(str).to_numpy().tolist()))
    assert a == b


def test_asof_bucketed_timestamp_ts(spark):
    """Timestamp-typed ts column: bucket arithmetic goes through epoch
    seconds and the seed boundary cast (double -> timestamp) round-trips."""
    from seraster_spark.joins import asof_join_bucketed

    left = spark.createDataFrame(
        [("a", "2024-01-01 10:00:05", 1), ("a", "2024-01-01 12:30:00", 2)],
        "k string, ts_s string, lid long",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "lid")
    right = spark.createDataFrame(
        [("a", "2024-01-01 09:59:59", 70, 1), ("a", "2024-01-01 11:00:00", 71, 2)],
        "k string, ts_s string, rid long, v long",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "rid", "v")
    out = asof_join_bucketed(
        left, right, ["k"], "ts", ["rid", "v"], bucket=600.0, tiebreak="rid"
    )
    got = {r["lid"]: r["asof_rid"] for r in out.collect()}
    assert got == {1: 70, 2: 71}
    plain = asof_join(left, right, ["k"], "ts", ["rid", "v"], tiebreak="rid")
    exp = {r["lid"]: r["asof_rid"] for r in plain.collect()}
    assert got == exp


def test_asof_bucketed_no_keys(spark):
    """on=[] — a single global timeline: the spine window degrades to one
    (tiny, bucket-cardinality) partition while the big pass still splits
    across buckets."""
    from seraster_spark.joins import asof_join_bucketed

    left = spark.createDataFrame([(100, 1), (205, 2), (5, 3)], "ts long, lid long")
    right = spark.createDataFrame(
        [(90, 70, 1), (200, 71, 2)], "ts long, rid long, v long"
    )
    plain = asof_join(left, right, [], "ts", ["rid", "v"], tiebreak="rid")
    bucketed = asof_join_bucketed(
        left, right, [], "ts", ["rid", "v"], bucket=50.0, tiebreak="rid"
    )
    exp = {r["lid"]: r["asof_rid"] for r in plain.collect()}
    got = {r["lid"]: r["asof_rid"] for r in bucketed.collect()}
    assert got == exp == {1: 70, 2: 71, 3: None}


def test_interval_join_outlier_bucket_width_invariant(spark):
    """The outlier side-channel result is invariant to bucket width AND to
    the outlier threshold (same pairs whether the wide interval rides the
    explode or the broadcast)."""
    pts, iv, P, I = _interval_frames(spark, seed=21)
    iv_wide = pd.concat(
        [iv, pd.DataFrame({"istart": [0], "iend": [500], "iid": [99], "k": [0]})],
        ignore_index=True,
    )
    IW = spark.createDataFrame(iv_wide.astype(int))
    want = _naive_pairs(pts, iv_wide)
    for b, ob in ((7.0, 3), (50.0, 4), (200.0, 2)):
        got = {(r["pid"], r["iid"]) for r in interval_join(
            P, IW.drop("k"), "ts", "istart", "iend", bucket=b, outlier_buckets=ob
        ).collect()}
        assert got == want, f"bucket={b}, outlier_buckets={ob}"
