"""kNN via k-ring expansion vs brute-force numpy oracle (FIXTURES.md T4)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from seraster_spark import fixtures, knn
from seraster_spark.bbox import grid_spec_for


@pytest.fixture(scope="module")
def queries_pdf():
    return fixtures.knn_queries_pdf(40, seed=7)


@pytest.fixture(scope="module")
def queries(spark, queries_pdf):
    return spark.createDataFrame(queries_pdf)


def brute_force(docs_pdf, queries_pdf, k):
    px = docs_pdf.x.to_numpy()
    py = docs_pdf.y.to_numpy()
    ids = docs_pdf.doc_id.to_numpy()
    out = {}
    for _, q in queries_pdf.iterrows():
        d = np.hypot(px - q.x, py - q.y)
        order = np.lexsort((ids, d))[:k]
        out[q.query_id] = [(ids[i], d[i]) for i in order]
    return out


@pytest.mark.parametrize("square,k", [(True, 1), (True, 5), (True, 15), (False, 5)])
def test_knn_matches_bruteforce(spark, docs, docs_pdf, queries, queries_pdf, square, k):
    spec = grid_spec_for(docs, 100.0, square=square)
    got = knn.knn_join(docs, queries, k, spec, initial_radius=2).toPandas()
    exp = brute_force(docs_pdf, queries_pdf, k)
    assert set(got["query_id"]) == set(queries_pdf["query_id"])
    for qid, grp in got.groupby("query_id"):
        grp = grp.sort_values("rank")
        assert len(grp) == k
        exp_ids = [t[0] for t in exp[qid]]
        exp_d = np.array([t[1] for t in exp[qid]])
        assert list(grp["doc_id"]) == exp_ids
        np.testing.assert_allclose(grp["dist"].to_numpy(), exp_d, atol=1e-9)


def test_knn_deterministic(spark, docs, queries):
    spec = grid_spec_for(docs, 100.0, square=True)
    a = knn.knn_join(docs, queries, 5, spec).toPandas().sort_values(["query_id", "rank"])
    b = knn.knn_join(docs, queries, 5, spec).toPandas().sort_values(["query_id", "rank"])
    assert (a.reset_index(drop=True)["doc_id"] == b.reset_index(drop=True)["doc_id"]).all()
