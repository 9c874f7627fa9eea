"""permutateByRotation tests (reference R/main.R:616-707;
test-main.R:90-98) + span-sequence invariant."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from seraster_spark import permutate, rasterize
from seraster_spark.bbox import grid_spec_for


def test_angle_schedule():
    assert permutate.angle_schedule(1) == [0.0]
    assert permutate.angle_schedule(3) == [0.0, 120.0, 240.0]
    assert permutate.angle_schedule(4) == [0.0, 90.0, 180.0, 270.0]
    # n_perm=10: ten unique angles (test-main.R:94-97)
    a10 = permutate.angle_schedule(10)
    assert len(a10) == 10 and len(set(a10)) == 10


def test_fanout_length_and_unique_angles(spark, docs):
    n = docs.count()
    out = permutate.permutate_by_rotation(docs, n_perm=10)
    assert out.count() == 10 * n
    perms = [r[0] for r in out.select("perm").distinct().collect()]
    assert len(perms) == 10 and len(set(perms)) == 10
    assert "rotated_0" in perms and "rotated_36" in perms


def test_rotation_values_vs_numpy(spark, docs, docs_pdf):
    out = (
        permutate.permutate_by_rotation(docs, n_perm=4)
        .select("doc_id", "angle", "x", "y")
        .toPandas()
        .set_index(["doc_id", "angle"])
        .sort_index()
    )
    ox = (docs_pdf.x.min() + docs_pdf.x.max()) / 2
    oy = (docs_pdf.y.min() + docs_pdf.y.max()) / 2
    for ang in (0.0, 90.0, 180.0, 270.0):
        th = math.radians(ang)
        ex = (docs_pdf.x - ox) * math.cos(th) - (docs_pdf.y - oy) * math.sin(th) + ox
        ey = (docs_pdf.x - ox) * math.sin(th) + (docs_pdf.y - oy) * math.cos(th) + oy
        sub = out.xs(ang, level="angle").loc[docs_pdf.doc_id]
        np.testing.assert_allclose(sub["x"].to_numpy(), ex.to_numpy(), atol=1e-9)
        np.testing.assert_allclose(sub["y"].to_numpy(), ey.to_numpy(), atol=1e-9)


def test_zero_rotation_is_identity(spark, docs):
    out = permutate.permutate_by_rotation(docs, n_perm=1)
    orig = docs.select("doc_id", F.col("x").alias("x0"), F.col("y").alias("y0"))
    j = out.join(orig, "doc_id")
    bad = j.filter(
        (F.abs(F.col("x") - F.col("x0")) > 1e-9) | (F.abs(F.col("y") - F.col("y0")) > 1e-9)
    ).count()
    assert bad == 0


def test_payload_untouched(spark, docs):
    """spans / values / kind pass through byte-identical
    (R/main.R:659-663; BASELINE.json span-sequence invariant)."""
    orig = docs.select("doc_id", F.sha2(F.to_json(F.col("spans")), 256).alias("h0"))
    out = permutate.permutate_by_rotation(docs, n_perm=3)
    got = out.select(
        "doc_id", "perm", F.sha2(F.to_json(F.col("spans")), 256).alias("h1")
    )
    bad = got.join(orig, "doc_id").filter(F.col("h0") != F.col("h1")).count()
    assert bad == 0


def test_permutations_share_common_grid(spark, docs):
    """All rotated copies rasterize on ONE common bbox/grid
    (R/main.R:294-308; vignette:245): total num_cell per perm == docs."""
    fan = permutate.permutate_by_rotation(docs, n_perm=3)
    spec = grid_spec_for(fan, 100.0, square=True)
    ct = rasterize.rasterize_cell_type(
        fan, 100.0, fun="sum", group_cols=["perm"], spec=spec
    )
    per_perm = (
        ct.select("perm", "cell_id", "num_cell")
        .distinct()
        .groupBy("perm")
        .agg(F.sum("num_cell").alias("t"))
    )
    n = docs.count()
    assert all(r["t"] == n for r in per_perm.collect())
