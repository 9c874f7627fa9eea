"""applyInPandasWithState running tile totals: state carries across
restarts (two availableNow drains from one checkpoint)."""

from pyspark.sql import functions as F, types as T

from seraster_spark.grid import GridSpec
from seraster_spark.streaming.stateful import drain_update, stream_running_tile_totals

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("kind", T.StringType()),
    ]
)
SPEC = GridSpec(-50.0, -50.0, 3050.0, 2050.0, 100.0, square=True)


def _rows(spark, start, n):
    return spark.createDataFrame(
        [
            (
                f"d{start + i:05d}",
                float((start + i) * 7919 % 3000),
                float((start + i) * 104729 % 2000),
                f"ct{(start + i) % 3}",
            )
            for i in range(n)
        ],
        SCHEMA,
    )


def test_running_totals_across_restarts(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    out1 = str(tmp_path / "out1")
    out2 = str(tmp_path / "out2")
    _rows(spark, 0, 200).write.mode("append").parquet(in_dir)

    s1 = stream_running_tile_totals(spark, in_dir, SCHEMA, SPEC)
    drain_update(s1, out1, ckpt)
    t1 = spark.read.parquet(out1)
    assert t1.agg(F.sum("batch_docs")).collect()[0][0] == 200
    assert t1.filter(F.col("total_docs") != F.col("batch_docs")).count() == 0

    # new arrivals + restart from the same checkpoint: state is restored,
    # only the new files flow, totals accumulate
    _rows(spark, 1000, 150).write.mode("append").parquet(in_dir)
    s2 = stream_running_tile_totals(spark, in_dir, SCHEMA, SPEC)
    drain_update(s2, out2, ckpt)
    t2 = spark.read.parquet(out2)
    assert t2.agg(F.sum("batch_docs")).collect()[0][0] == 150
    # a tile hit in both drains shows restored state: total > batch
    assert t2.filter(F.col("total_docs") > F.col("batch_docs")).count() > 0
    # global conservation: final totals over all touched tiles == 350 for
    # tiles updated in drain 2 plus drain-1 tiles untouched in drain 2
    latest = t2.select("cell_id", "total_docs").union(
        t1.join(t2.select("cell_id"), "cell_id", "left_anti").select(
            "cell_id", "total_docs"
        )
    )
    assert latest.agg(F.sum("total_docs")).collect()[0][0] == 350

    # the stateful emissions equal the batch cumulative replay exactly
    # (drain 1 = trigger/batch 0, drain 2 = trigger/batch 1)
    from seraster_spark.streaming.stateful import batch_replay_running_totals

    batch_in = _rows(spark, 0, 200).withColumn("batch_id", F.lit(0)).unionByName(
        _rows(spark, 1000, 150).withColumn("batch_id", F.lit(1))
    )
    replay = {
        (r["cell_id"], r["batch_id"]): (r["total_docs"], r["n_kinds"], r["batch_docs"])
        for r in batch_replay_running_totals(batch_in, SPEC).collect()
    }
    emitted = {
        (r["cell_id"], b): (r["total_docs"], r["n_kinds"], r["batch_docs"])
        for b, t in ((0, t1), (1, t2))
        for r in t.collect()
    }
    assert emitted == replay
