"""Streaming exact deduplication of a document feed — the ingestion-time
twin of :func:`seraster_spark.text.exact_dedup`.

A training-data pipeline rarely dedups a frozen corpus once; documents
arrive continuously and each arrival should be admitted only if its content
hash was not seen before (within a bounded state horizon). That is exactly
Spark's ``dropDuplicatesWithinWatermark``: state holds one row per content
hash, the event-time watermark bounds state size (hashes older than the
delay are evicted — at 100 TB/day unbounded dedup state is not an option),
and the checkpoint makes the operator kill-and-restart safe, so a hash seen
before a crash still suppresses its duplicates after resume.

Content hashing is the same md5-with-NULL-sentinel as the batch operator,
so batch and streaming admit the identical canonical set for in-horizon
duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def stream_exact_dedup(
    spark: SparkSession,
    input_path: str,
    schema: T.StructType,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Streaming DF of first-seen documents: one row per content hash within
    the watermark horizon; later arrivals with the same hash are dropped.
    State is bounded by the watermark (hash rows expire after the delay)."""
    docs = spark.readStream.schema(schema).parquet(input_path)
    from ..text import content_hash_expr

    hashed = docs.withColumn("content_hash", content_hash_expr(text_col))
    return hashed.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def drain_append(stream_df: DataFrame, out_dir: str, checkpoint_dir: str):
    """Drain available data in append mode via foreachBatch → parquet
    (checkpoint-recoverable, unlike the memory sink).

    foreachBatch is AT-LEAST-ONCE: a crash between the sink write and the
    checkpoint commit replays the batch on restart. A blind append would
    then re-emit the batch's rows — duplicates in the output of a DEDUP
    stream. Writing each batch to its own ``batch_id=`` partition with
    dynamic partition overwrite makes the replay idempotent: batch N's
    re-execution overwrites exactly batch N's directory."""

    def write_batch(batch_df: DataFrame, batch_id: int):
        spark = batch_df.sparkSession
        key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(key, "static")
        spark.conf.set(key, "dynamic")
        try:
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "overwrite"
            ).partitionBy("batch_id").parquet(out_dir)
        finally:
            spark.conf.set(key, prev)

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
