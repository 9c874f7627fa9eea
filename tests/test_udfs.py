"""Arrow-UDF wrapper parity: centroid and k-ring UDFs match the Column
expressions / numpy kernels bit-for-bit."""

import numpy as np
from pyspark.sql import functions as F

from seraster_spark import expressions as X
from seraster_spark import grid, rasterize, udfs
from seraster_spark.bbox import grid_spec_for


def test_centroid_udf_matches_expr(spark, docs):
    for square in (True, False):
        spec = grid_spec_for(docs, 100.0, square=square)
        wc = rasterize.assign_tiles(docs.select("doc_id", "x", "y"), spec)
        cx, cy = X.centroid_expr(F.col("cell_id"), spec)
        both = wc.withColumn("c_udf", udfs.centroid_udf(spec)(F.col("cell_id"))).select(
            cx.alias("cx_e"), cy.alias("cy_e"),
            F.col("c_udf.cx").alias("cx_u"), F.col("c_udf.cy").alias("cy_u"),
        )
        bad = both.filter(
            (F.col("cx_e") != F.col("cx_u")) | (F.col("cy_e") != F.col("cy_u"))
        ).count()
        assert bad == 0


def test_kring_udf_matches_numpy(spark, docs):
    for square in (True, False):
        spec = grid_spec_for(docs, 100.0, square=square)
        wc = rasterize.assign_tiles(docs.select("doc_id", "x", "y"), spec).limit(50)
        pdf = wc.withColumn("ring", udfs.kring_udf(spec, 2)(F.col("cell_id"))).toPandas()
        cells = pdf["cell_id"].to_numpy(np.int64)
        exp = grid.kring(cells, 2, spec)
        for i in range(len(pdf)):
            assert sorted(pdf["ring"].iloc[i]) == sorted(exp[i].tolist())
