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
