"""Multi-polygon spatial join + raster algebra tests vs numpy oracles."""

import numpy as np
from pyspark.sql import functions as F

from seraster_spark import rasterize
from seraster_spark.bbox import grid_spec_for
from seraster_spark.grid import point_in_polygon
from seraster_spark.vector import raster_algebra, spatial_join

POLYS = {
    "quad": [(500.0, 300.0), (1500.0, 400.0), (1400.0, 1500.0), (600.0, 1300.0)],
    # concave L-shape
    "ell": [
        (1800.0, 200.0),
        (2800.0, 200.0),
        (2800.0, 700.0),
        (2300.0, 700.0),
        (2300.0, 1600.0),
        (1800.0, 1600.0),
    ],
    "tiny": [(100.0, 1800.0), (260.0, 1800.0), (180.0, 1950.0)],
}


def test_spatial_join_vs_oracle(spark, docs, docs_pdf):
    spec = grid_spec_for(docs, 100.0, square=True)
    wc = rasterize.assign_tiles(docs, spec)
    got = (
        spatial_join(wc, POLYS, spec)
        .select("doc_id", "poly_id")
        .toPandas()
    )
    got_pairs = set(map(tuple, got.itertuples(index=False)))
    exp_pairs = set()
    for pid, verts in POLYS.items():
        ring = np.asarray(verts + verts[:1], dtype=np.float64)
        inside = point_in_polygon(
            docs_pdf.x.to_numpy(), docs_pdf.y.to_numpy(), ring
        )
        exp_pairs |= {(d, pid) for d in docs_pdf.doc_id[inside]}
    assert got_pairs == exp_pairs
    # multi-membership possible: every polygon matched something
    assert {p for _, p in got_pairs} == set(POLYS)


def test_spatial_join_coarse_is_superset(spark, docs):
    spec = grid_spec_for(docs, 100.0, square=True)
    wc = rasterize.assign_tiles(docs, spec)
    coarse = spatial_join(wc, POLYS, spec, exact=False).select("doc_id", "poly_id")
    exact = spatial_join(wc, POLYS, spec, exact=True).select("doc_id", "poly_id")
    assert exact.exceptAll(coarse).count() == 0


def test_raster_algebra(spark, docs):
    spec = grid_spec_for(docs, 100.0, square=True)
    a = rasterize.rasterize_cell_type(
        docs.filter(F.col("kind") == "ct00"), 100.0, fun="sum", spec=spec
    ).select("cell_id", "pixelval")
    b = rasterize.rasterize_cell_type(
        docs.filter(F.col("kind") == "ct01"), 100.0, fun="sum", spec=spec
    ).select("cell_id", "pixelval")
    d = raster_algebra(a, b, "diff").toPandas().set_index("cell_id")["diff"]
    s = raster_algebra(a, b, "sum").toPandas().set_index("cell_id")["sum"]
    ap = a.toPandas().set_index("cell_id")["pixelval"]
    bp = b.toPandas().set_index("cell_id")["pixelval"]
    for cid in set(ap.index) | set(bp.index):
        av = float(ap.get(cid, 0.0))
        bv = float(bp.get(cid, 0.0))
        assert d[cid] == av - bv
        assert s[cid] == av + bv
    # structural zero: a tile present only in b shows diff = -bv
    only_b = set(bp.index) - set(ap.index)
    if only_b:
        cid = next(iter(only_b))
        assert d[cid] == -float(bp[cid])
