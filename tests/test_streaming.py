"""Structured-Streaming incremental rasterization: streaming counts ==
batch counts on the same input; state resumes across availableNow drains."""

import datetime

import pytest
from pyspark.sql import functions as F, types as T

from seraster_spark import rasterize
from seraster_spark.grid import GridSpec
from seraster_spark.streaming import run_available_now, stream_rasterize_cell_type

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("kind", T.StringType()),
    ]
)

SPEC = GridSpec(-50.0, -50.0, 3050.0, 2050.0, 100.0, square=True)


def _batch(spark, docs, start_id, n, minute):
    base = datetime.datetime(2026, 1, 1, 0, minute, 0)
    rows = [
        (
            f"s{start_id + i:06d}",
            base + datetime.timedelta(seconds=i % 50),
            float((start_id + i) * 7919 % 3000),
            float((start_id + i) * 104729 % 2000),
            f"ct{(start_id + i) % 4}",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_streaming_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "stream_in")
    ckpt = str(tmp_path / "ckpt")
    d1 = _batch(spark, None, 0, 300, minute=0)
    d1.write.mode("append").parquet(in_dir)

    sdf = stream_rasterize_cell_type(spark, in_dir, SCHEMA, SPEC, window_duration="1 minute")
    run_available_now(sdf, "tiles_stream", ckpt)
    got1 = spark.table("tiles_stream")
    batch1 = spark.read.parquet(in_dir)

    exp = (
        rasterize.assign_tiles(batch1, SPEC)
        .groupBy(F.window("ts", "1 minute"), "cell_id", "kind")
        .agg(F.count(F.lit(1)).cast("double").alias("pixelval"))
        .select(
            F.col("window.start").alias("window_start"),
            "cell_id",
            "kind",
            "pixelval",
        )
    )
    g = {
        (r["window_start"], r["cell_id"], r["kind"]): r["pixelval"]
        for r in got1.collect()
    }
    e = {
        (r["window_start"], r["cell_id"], r["kind"]): r["pixelval"]
        for r in exp.collect()
    }
    assert g == e and len(g) > 0

    # second drain with NEW files resumes from checkpoint and includes both
    d2 = _batch(spark, None, 1000, 200, minute=1)
    d2.write.mode("append").parquet(in_dir)
    sdf2 = stream_rasterize_cell_type(spark, in_dir, SCHEMA, SPEC, window_duration="1 minute")
    run_available_now(sdf2, "tiles_stream2", ckpt)
    got2 = spark.table("tiles_stream2")
    total = got2.agg(F.sum("pixelval")).collect()[0][0]
    assert total == 500  # all docs counted exactly once across both drains
