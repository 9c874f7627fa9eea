"""The reference vignette workflow
(/root/reference/vignettes/getting-started-with-SEraster.Rmd), step by
step, on this engine — a user of SEraster can run every vignette query here.

Run: python examples/vignette_parity.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import seraster_spark as srs
from seraster_spark.fixtures import documents_df
from seraster_spark.session import get_spark


def main() -> None:
    spark = get_spark("vignette", master="local[8]", shuffle_partitions=8)

    # data(merfish_mousePOA): 6,509 cells, 16 cell types (vignette:99)
    docs = documents_df(spark, n=6509, seed=42, skew=False).cache()
    print("cells:", docs.count(), "| kinds:", docs.select("kind").distinct().count())

    # rasterizeGeneExpression(spe, assay_name='volnorm', resolution=50)
    # (vignette:112-135): square res-50 mean raster
    ge50 = srs.rasterize_gene_expression(docs, 50.0, fun="mean")
    n_tiles = ge50.select("cell_id").distinct().count()
    print("res-50 square tiles (vignette anchor ~1,301 on the real data):", n_tiles)

    # rasterizeCellType(spe, col_name='celltype', resolution=50)
    # (vignette:139-149): counts per tile per type
    ct50 = srs.rasterize_cell_type(docs, 50.0, fun="sum")
    print("cell-type raster rows:", ct50.count())

    # cell-type-restricted rasterization (vignette:153-157)
    sub = srs.rasterize_gene_expression(docs.filter(F.col("kind") == "ct03"), 50.0)
    print("restricted (ct03) tiles:", sub.select("cell_id").distinct().count())

    # multi-resolution sweep, square + hexagonal (vignette:199-219)
    for lvl, res in enumerate((50.0, 100.0, 200.0)):
        for square in (True, False):
            spec = srs.grid_spec_for(docs, res, square=square, level=lvl)
            t = srs.rasterize_cell_type(docs, res, spec=spec, fun="sum")
            print(
                f"res={res:>5} {'square' if square else 'hex':7s}:",
                t.select("cell_id").distinct().count(),
                "tiles",
            )

    # permutateByRotation(spe, n_perm=3) then rasterize the list on a
    # common grid (vignette:223-245)
    fan = srs.permutate_by_rotation(docs, n_perm=3)
    spec = srs.grid_spec_for(fan, 100.0)
    perms = srs.rasterize_cell_type(fan, 100.0, group_cols=["perm"], spec=spec)
    print(
        "permutations:",
        [r[0] for r in perms.select("perm").distinct().orderBy("perm").collect()],
    )

    # relative enrichment + binarization (vignette:307-317)
    re = srs.relative_enrichment(srs.rasterize_cell_type(docs, 100.0, fun="sum"))
    print(
        "RE rows:", re.count(),
        "| enriched (re>=1):", re.filter(F.col("re_bin") == 1).count(),
    )

    # nnSVG-style neighbor analysis (vignette:253-257) → engine kNN
    queries = docs.limit(20).select(F.col("doc_id").alias("query_id"), "x", "y")
    knn = srs.knn_join(docs, queries, k=6, spec=srs.grid_spec_for(docs, 100.0))
    print("kNN rows:", knn.count())

    # raster → vector (geometry colData, R/main.R:191-193) → WKT/GeoJSON
    tiles = srs.rasterize_cell_type(docs, 200.0, fun="sum", spec=srs.grid_spec_for(docs, 200.0))
    wkt = srs.tiles_with_wkt(tiles.select("cell_id").distinct(), srs.grid_spec_for(docs, 200.0))
    print("WKT sample:", wkt.first()["geometry_wkt"][:60], "...")

    # rasterizeMatrix facade (R/main.R:98-197): separate data + pos inputs →
    # (data_rast, pos_rast, meta_rast) triple
    data = docs.select("doc_id", F.explode("values").alias("kv")).select(
        "doc_id", F.col("kv.feature").alias("feature"), F.col("kv.value").alias("value")
    )
    pos = docs.select("doc_id", "x", "y")
    rm = srs.rasterize_matrix(data, pos, 100.0, fun="mean")
    print(
        "rasterizeMatrix:",
        rm.data_rast.count(), "data rows |",
        rm.pos_rast.count(), "pixels |",
        "meta cols:", rm.meta_rast.columns,
    )

    # tile pyramid: derive coarser levels from tiles (no corpus re-scan)
    spec100 = srs.grid_spec_for(docs, 100.0)
    base = srs.assign_tiles(docs, spec100).groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("double").alias("pixelval")
    )
    lvl, s = base, spec100
    sizes = [lvl.count()]
    for _ in range(2):
        lvl, s = srs.rollup_tiles(lvl.select("cell_id", "pixelval"), s, factor=2)
        sizes.append(lvl.count())
    print("pyramid tile counts res 100→200→400:", sizes)

    spark.stop()


if __name__ == "__main__":
    main()
