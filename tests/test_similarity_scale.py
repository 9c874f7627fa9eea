"""Arrow fast-path ANN + IVF: same results as the exact fold / high recall."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F, types as T

from seraster_spark import similarity as S

DIM = 16
N = 500


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((8, DIM)) * 3.0
    m = (centers[rng.integers(0, 8, N)] + rng.standard_normal((N, DIM)) * 0.3).astype(
        np.float32
    )
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(
        [(i, [float(v) for v in m[i]]) for i in range(N)], schema
    ).cache()
    return df, m


def _np_topk(m, qidx, k):
    q = m[qidx].astype(np.float64)
    mm = m.astype(np.float64)
    cos = (mm @ q) / (np.linalg.norm(mm, axis=1) * np.linalg.norm(q))
    return list(np.lexsort((np.arange(len(mm)), -cos))[:k])


def test_arrow_topk_matches_numpy(spark, clustered):
    items, m = clustered
    qidx = [0, 7, 42]
    qpdf = pd.DataFrame(
        {"query_id": [str(i) for i in qidx], "embedding": [m[i] for i in qidx]}
    )
    got = S.brute_force_topk_arrow(items, qpdf, 5).toPandas()
    for i in qidx:
        grp = got[got["query_id"] == str(i)].sort_values("rank")
        assert list(grp["vec_id"]) == _np_topk(m, i, 5)


def test_ivf_topk_recall(spark, clustered):
    items, m = clustered
    qidx = [0, 7, 42, 99, 200]
    qpdf = pd.DataFrame(
        {"query_id": [str(i) for i in qidx], "embedding": [m[i] for i in qidx]}
    )
    got = S.ivf_topk(items, qpdf, 5, dim=DIM, n_centroids=8, n_probe=2).toPandas()
    hits = total = 0
    for i in qidx:
        exp = set(_np_topk(m, i, 5))
        grp = set(got[got["query_id"] == str(i)]["vec_id"])
        hits += len(exp & grp)
        total += 5
    assert hits / total >= 0.8  # clustered data, 2 probes over 8 lists
