"""Bit-for-bit reproducibility: canonical-order tile aggregation gives
byte-identical doubles regardless of input partitioning (SURVEY §4.3.4)."""

import struct

from pyspark.sql import functions as F

from seraster_spark import rasterize
from seraster_spark.bbox import grid_spec_for


def _bits(pdf):
    return {
        (r.cell_id, r.feature): struct.pack("<d", r.pixelval)
        for r in pdf.itertuples()
    }


def test_canonical_aggregation_partitioning_invariant(spark, docs):
    spec = grid_spec_for(docs, 100.0, square=True)
    a = (
        rasterize.rasterize_gene_expression_deterministic(
            docs.repartition(3), 100.0, fun="mean", spec=spec
        )
        .select("cell_id", "feature", "pixelval")
        .toPandas()
    )
    b = (
        rasterize.rasterize_gene_expression_deterministic(
            docs.repartition(17, "kind"), 100.0, fun="mean", spec=spec
        )
        .select("cell_id", "feature", "pixelval")
        .toPandas()
    )
    ba, bb = _bits(a), _bits(b)
    assert ba.keys() == bb.keys() and len(ba) > 0
    assert all(ba[k] == bb[k] for k in ba)


def test_canonical_matches_default_within_fp(spark, docs):
    """Same math, different summation order: results agree to 1e-9."""
    spec = grid_spec_for(docs, 100.0, square=True)
    det = rasterize.rasterize_gene_expression_deterministic(
        docs, 100.0, fun="sum", spec=spec
    ).select("cell_id", "feature", F.col("pixelval").alias("a"))
    dflt = rasterize.rasterize_gene_expression(
        docs, 100.0, fun="sum", spec=spec
    ).select("cell_id", "feature", F.col("pixelval").alias("b"))
    j = det.join(dflt, ["cell_id", "feature"], "full")
    assert j.filter(F.col("a").isNull() | F.col("b").isNull()).count() == 0
    assert j.filter(F.abs(F.col("a") - F.col("b")) > 1e-9).count() == 0
