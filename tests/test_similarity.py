"""Embedding similarity-search tests vs numpy brute-force oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F, types as T

from seraster_spark import similarity as S

DIM = 16
N = 400


@pytest.fixture(scope="module")
def vecs_pdf():
    """Clustered embeddings (10 centers + small noise) — the regime ANN is
    for; isotropic random data has no meaningful neighbors."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((10, DIM)) * 3.0
    m = (
        centers[rng.integers(0, 10, N)] + rng.standard_normal((N, DIM)) * 0.3
    ).astype(np.float32)
    # inject exact near-dups
    m[N - 1] = m[0]
    m[N - 2] = m[1] + rng.standard_normal(DIM).astype(np.float32) * 0.01
    return m


@pytest.fixture(scope="module")
def items(spark, vecs_pdf):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    rows = [(i, [float(v) for v in vecs_pdf[i]]) for i in range(N)]
    return spark.createDataFrame(rows, schema).cache()


def np_topk(vecs, qidx, k):
    q = vecs[qidx].astype(np.float64)
    m = vecs.astype(np.float64)
    cos = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    order = np.lexsort((np.arange(len(m)), -cos))
    return list(order[:k]), cos


def test_brute_force_topk_matches_numpy(spark, items, vecs_pdf):
    queries = items.filter(F.col("vec_id").isin([0, 5, 17])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = S.brute_force_topk(items, queries, 5).toPandas()
    for qid in (0, 5, 17):
        grp = got[got["query_id"] == qid].sort_values("rank")
        exp_ids, cos = np_topk(vecs_pdf, qid, 5)
        assert list(grp["vec_id"]) == exp_ids
        np.testing.assert_allclose(
            grp["cosine"].to_numpy(), cos[exp_ids], atol=1e-6
        )


def test_lsh_topk_recall(spark, items, vecs_pdf):
    """LSH with multi-probe recovers most of the true top-5 (recall@5 >= 0.5
    on random gaussian data with 12 planes / 4 probes)."""
    qids = [0, 5, 17, 42, 99]
    queries = items.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = S.lsh_topk(items, queries, 5, dim=DIM, n_planes=10, n_probes=11).toPandas()
    hits = total = 0
    for qid in qids:
        exp_ids, _ = np_topk(vecs_pdf, qid, 5)
        grp = set(got[got["query_id"] == qid]["vec_id"])
        hits += len(grp & set(exp_ids))
        total += 5
    assert hits / total >= 0.6
    # rank-1 self hit always found (same bucket trivially)
    for qid in qids:
        top1 = got[(got["query_id"] == qid) & (got["rank"] == 1)]["vec_id"].iloc[0]
        assert top1 == min(qid, [i for i in range(N) if (vecs_pdf[i] == vecs_pdf[qid]).all()][0])


def test_cosine_near_duplicates(spark, items):
    dups = S.cosine_near_duplicates(items, threshold=0.99, dim=DIM).toPandas()
    pairs = {(r.id_a, r.id_b) for r in dups.itertuples()}
    assert (0, N - 1) in pairs  # exact copy
    assert (1, N - 2) in pairs  # 1% perturbed copy


def test_cosine_near_dup_bucket_cap(spark):
    """A constant-vector block hashes to ONE bucket (quadratic); the cap
    drops it while a genuine near-identical pair in another bucket
    survives. Planes chosen so the two groups provably bucket apart
    (all-ones dot with plane0 = 0 → bit 0; the 5.0-leading vectors → +4
    → bit 1)."""
    import numpy as np

    planes = np.array(
        [[1.0, -1.0, 0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0, 0, 1.0]]
    )
    rows = [(i, [1.0] * 8) for i in range(100)]
    rows += [
        (1000, [5.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
        (1001, [5.0, 1.02, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = S.cosine_near_duplicates(
        df, threshold=0.99, dim=8, planes=planes, max_bucket_size=20
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in capped}
    assert found == {(1000, 1001)}
    # uncapped produces the quadratic block
    n = S.cosine_near_duplicates(df, threshold=0.99, dim=8, planes=planes).count()
    assert n == 100 * 99 // 2 + 1


def test_arrow_topk_tie_break_deterministic(spark):
    """Tied cosines at the per-batch cut must keep the smallest ids (the
    global tie rule) — a bare argpartition splits ties arbitrarily."""
    import pandas as pd

    from seraster_spark.similarity import brute_force_topk_arrow

    # 30 identical vectors -> all cosines tie; top-3 must be ids 0,1,2
    rows = [(i, [1.0, 0.0]) for i in range(30)]
    items = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = pd.DataFrame({"query_id": ["q"], "embedding": [[1.0, 0.0]]})
    got = sorted(
        r["vec_id"]
        for r in brute_force_topk_arrow(items.repartition(5), q, 3).collect()
    )
    assert got == [0, 1, 2]


def test_arrow_topk_preserves_dtypes_and_empty_queries(spark):
    import pandas as pd

    from seraster_spark.similarity import brute_force_topk_arrow

    items = spark.createDataFrame(
        [("docA", [1.0, 0.0]), ("docB", [0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    q = pd.DataFrame({"query_id": [7], "embedding": [[1.0, 0.0]]})
    rows = brute_force_topk_arrow(items, q, 1).collect()
    assert rows[0]["query_id"] == 7          # int preserved, not "7"
    assert rows[0]["vec_id"] == "docA"       # string item ids work
    empty = brute_force_topk_arrow(items, q.iloc[0:0], 1)
    assert empty.count() == 0


def test_similarity_paths_skip_null_embeddings(spark):
    import pandas as pd

    from seraster_spark.similarity import (
        brute_force_topk_arrow,
        cosine_near_duplicates,
        ivf_topk,
    )

    items = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    q = pd.DataFrame({"query_id": ["q"], "embedding": [[1.0, 0.0]]})
    assert brute_force_topk_arrow(items, q, 2).count() == 2
    got = ivf_topk(items, q, 2, dim=2, n_centroids=1, sample_size=10).collect()
    assert {r["vec_id"] for r in got} == {1, 3}
    pairs = cosine_near_duplicates(items, threshold=0.9, dim=2).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 3)}


def test_ivf_dim_mismatch_raises(spark):
    import numpy as np
    import pandas as pd

    from seraster_spark.similarity import ivf_topk

    items = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    q = pd.DataFrame({"query_id": ["q"], "embedding": [[1.0, 0.0]]})
    with pytest.raises(ValueError, match="dim"):
        ivf_topk(items, q, 1, dim=5, centroids=np.zeros((2, 2)))


def test_ivf_training_reproducible_across_partitionings(spark):
    import numpy as np

    from seraster_spark.similarity import train_ivf_centroids

    rng = np.random.default_rng(0)
    rows = [(int(i), [float(x) for x in rng.normal(size=4)]) for i in range(500)]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = train_ivf_centroids(d.repartition(2), n_centroids=4, kmeans_iters=2, seed=7)
    b = train_ivf_centroids(d.repartition(11), n_centroids=4, kmeans_iters=2, seed=7)
    # sample membership + init are now partition-invariant (the former
    # df.sample seeded per PARTITION, silently changing the training set);
    # residual delta is float reassociation of partial sums across
    # different partition boundaries — tiny and bounded
    assert np.allclose(a, b, rtol=0, atol=1e-9)
    # and bitwise-identical for a FIXED partitioning
    c = train_ivf_centroids(d.repartition(11), n_centroids=4, kmeans_iters=2, seed=7)
    assert np.array_equal(b, c)


def test_cosine_arrow_hof_parity(spark):
    """The Arrow cosine kernel (default verify path) vs the HOF fold:
    BITWISE equal on integer-valued vectors (every partial sum exact — the
    oracle regime), ~1e-12 on random floats, and NULL — never NaN — for
    NULL vectors and zero norms on BOTH impls."""
    import numpy as np

    from seraster_spark.similarity import cosine_expr

    rng = np.random.default_rng(3)
    rows = []
    for i in range(200):
        a = [float(x) for x in rng.integers(1, 97, 16)]
        b = [float(x) for x in rng.integers(1, 97, 16)]
        rows.append((i, a, b))
    rows.append((900, None, [1.0] * 16))
    rows.append((901, [0.0] * 16, [1.0] * 16))
    df = spark.createDataFrame(
        rows, "i long, a array<double>, b array<double>"
    )
    got = df.select(
        "i",
        cosine_expr(F.col("a"), F.col("b"), "arrow").alias("ar"),
        cosine_expr(F.col("a"), F.col("b"), "hof").alias("ho"),
    ).collect()
    for r in got:
        if r["i"] >= 900:
            assert r["ar"] is None and r["ho"] is None, r
        else:
            assert r["ar"] == r["ho"], r  # bitwise: integer-valued inputs

    fl = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=16)],
          [float(x) for x in rng.normal(size=16)]) for i in range(100)],
        "i long, a array<double>, b array<double>",
    )
    for r in fl.select(
        cosine_expr(F.col("a"), F.col("b"), "arrow").alias("ar"),
        cosine_expr(F.col("a"), F.col("b"), "hof").alias("ho"),
    ).collect():
        assert abs(r["ar"] - r["ho"]) < 1e-12

    import pytest as _pt

    with _pt.raises(ValueError, match="exact_impl"):
        cosine_expr(F.col("a"), F.col("b"), "nope")


def test_cosine_arrow_survives_ragged_and_empty_vectors(spark):
    """r5 review fix: a truncated/corrupt embedding (mismatched pair
    lengths) or an empty vector yields NULL — never a task failure
    (np.stack on ragged input used to abort the whole scan) and never NaN
    (which would sort above every real cosine in a desc top-k)."""
    from seraster_spark.similarity import cosine_expr

    rows = [
        (0, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),   # clean -> 1.0
        (1, [1.0, 2.0], [1.0, 2.0, 3.0]),         # ragged -> NULL
        (2, [], []),                               # empty -> NULL
        (3, [float("nan"), 1.0], [1.0, 1.0]),      # NaN element -> NULL
        (4, None, [1.0]),                          # NULL side -> NULL
    ]
    df = spark.createDataFrame(rows, "i long, a array<double>, b array<double>")
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", cosine_expr(F.col("a"), F.col("b"), "arrow").alias("c")
        ).collect()
    }
    assert got[0] == 1.0
    assert got[1] is None and got[2] is None and got[3] is None and got[4] is None
