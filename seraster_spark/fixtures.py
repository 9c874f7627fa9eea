"""Deterministic synthetic fixtures (FIXTURES.md; seed=42, pure numpy).

T1 ``documents``: the input_hint-shaped interleaved-document table —
``(doc_id:string, x:double, y:double, kind:string,
spans:array<struct<kind,text,media_ref,offset>>,
values:array<struct<feature,value>>)``.

The span sequence is the order-carrying invariant payload (BASELINE.json):
offsets strictly increase, and the engine must never perturb
(kind, text, media_ref, offset-order) per document.

Boundary cases injected deterministically (FIXTURES.md):
* ≥50 docs with x or y exactly on a gridline at res ∈ {50,100,200}
  (tie-break, R/main.R:134-135),
* one hot cluster holding ~50% of docs inside a single res-100 tile
  (skew/salting),
* docs pinned at each bbox corner.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import types as T

SPAN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
)

VALUES_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("feature", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("x", T.DoubleType(), False),
        T.StructField("y", T.DoubleType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("spans", SPAN_SCHEMA),
        T.StructField("values", VALUES_SCHEMA),
    ]
)

_WORDS = np.array(
    "the of and to in is was for on that with cell tile raster spark grid hex "
    "span doc media text audio image offset index shuffle join agg".split()
)

N_KINDS = 16
N_FEATURES = 155
EXTENT_X = 3000.0
EXTENT_Y = 2000.0


def documents_pdf(n: int = 6509, seed: int = 42, skew: bool = True) -> pd.DataFrame:
    """Generate the T1 documents table as pandas (driver-side; fixture scale).

    Deterministic given (n, seed, skew)."""
    rng = np.random.default_rng(seed)
    doc_id = np.array(["doc%08d" % i for i in range(n)])
    x = rng.uniform(0.0, EXTENT_X, n)
    y = rng.uniform(0.0, EXTENT_Y, n)

    # hot cluster: ~50% of docs into one res-100 tile (skew fixture)
    if skew and n >= 200:
        n_hot = n // 2
        hot_idx = rng.choice(n, n_hot, replace=False)
        # padded grid origin is (-50,-50) at res 100 (corner docs pin the
        # bbox), so tile [1150,1250)x[850,950) fully contains this range
        x[hot_idx] = rng.uniform(1160.0, 1240.0, n_hot)
        y[hot_idx] = rng.uniform(860.0, 940.0, n_hot)

    # gridline boundary docs at res 50/100/200 (tie-break fixture)
    n_edge = min(60, n)
    edge_idx = np.arange(n_edge)
    for j, res in enumerate([50.0, 100.0, 200.0]):
        sel = edge_idx[j::3]
        x[sel] = np.round(x[sel] / res) * res
        y[sel[::2]] = np.round(y[sel[::2]] / res) * res
    # bbox corner docs
    if n >= 4:
        x[-4:] = [0.0, EXTENT_X - 1e-9, 0.0, EXTENT_X - 1e-9]
        y[-4:] = [0.0, 0.0, EXTENT_Y - 1e-9, EXTENT_Y - 1e-9]

    # Zipf-ish kind weights over 16 labels (plays celltype, R/main.R:493)
    w = 1.0 / np.arange(1, N_KINDS + 1)
    w /= w.sum()
    kind_idx = rng.choice(N_KINDS, n, p=w)
    kind = np.array(["ct%02d" % k for k in range(N_KINDS)])[kind_idx]

    span_kinds = np.array(["text", "image", "audio"])
    spans, values = [], []
    for i in range(n):
        n_span = int(rng.integers(1, 9))
        offs = np.cumsum(rng.integers(1, 100, n_span)).astype(int)
        sk = span_kinds[rng.integers(0, 3, n_span)]
        doc_spans = []
        for j in range(n_span):
            if sk[j] == "text":
                txt = " ".join(rng.choice(_WORDS, int(rng.integers(2, 7))))
                ref = ""
            else:
                txt = ""
                ref = "m://%012x" % int(rng.integers(0, 2**48))
            doc_spans.append(
                {"kind": str(sk[j]), "text": txt, "media_ref": ref, "offset": int(offs[j])}
            )
        spans.append(doc_spans)

        n_feat = int(rng.integers(5, 31))
        feats = rng.choice(N_FEATURES, n_feat, replace=False)
        feats.sort()
        vals = np.abs(rng.normal(0.0, 1.0, n_feat)) * 10.0
        values.append(
            [{"feature": "g%03d" % f, "value": float(v)} for f, v in zip(feats, vals)]
        )

    return pd.DataFrame(
        {"doc_id": doc_id, "x": x, "y": y, "kind": kind, "spans": spans, "values": values}
    )


def documents_df(spark, n: int = 6509, seed: int = 42, skew: bool = True):
    """T1 as a Spark DataFrame with the pinned schema."""
    return spark.createDataFrame(documents_pdf(n, seed, skew), schema=DOCUMENTS_SCHEMA)


def knn_queries_pdf(n_queries: int = 100, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "query_id": ["q%04d" % i for i in range(n_queries)],
            "x": rng.uniform(0.0, EXTENT_X, n_queries),
            "y": rng.uniform(0.0, EXTENT_Y, n_queries),
        }
    )
