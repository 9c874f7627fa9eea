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


def test_append_mode_drops_late_beyond_watermark(spark, tmp_path):
    """True streaming watermark semantics (output_mode='append'): a row
    later than the persisted watermark is DROPPED; windows emit once the
    watermark passes them. Three availableNow drains over one checkpoint:
    batch1 (minute 10) → nothing emitted yet; batch2 (minute 20 + one LATE
    row at minute 5) → the minute-10 window emits WITHOUT any minute-5
    window ever appearing; batch3 (minute 30) → minute-20 window emits with
    only the on-time rows."""
    from seraster_spark.streaming import drain_available_now_to_files

    in_dir = str(tmp_path / "late_in")
    out_dir = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")

    def drain():
        sdf = stream_rasterize_cell_type(
            spark, in_dir, SCHEMA, SPEC, window_duration="1 minute", watermark="2 minutes"
        )
        drain_available_now_to_files(sdf, out_dir, ckpt)
        try:
            return spark.read.parquet(out_dir).collect()
        except Exception:  # no files emitted yet
            return []

    _batch(spark, None, 0, 40, minute=10).write.mode("append").parquet(in_dir)
    out1 = drain()
    assert out1 == []  # watermark hasn't passed the minute-10 window yet

    on_time = _batch(spark, None, 1000, 30, minute=20)
    late = _batch(spark, None, 9000, 5, minute=5)  # far below the watermark
    on_time.unionByName(late).write.mode("append").parquet(in_dir)
    out2 = drain()
    emitted2 = {r["window_start"].minute for r in out2}
    assert emitted2 == {10}
    assert sum(r["pixelval"] for r in out2) == 40  # late rows not resurrected

    _batch(spark, None, 2000, 10, minute=30).write.mode("append").parquet(in_dir)
    out3 = drain()
    emitted3 = {r["window_start"].minute for r in out3}
    assert 5 not in emitted3  # the late window never emits — rows dropped
    assert 20 in emitted3
    m20 = sum(r["pixelval"] for r in out3 if r["window_start"].minute == 20)
    assert m20 == 30  # only the on-time minute-20 rows


def test_streaming_session_windows_emit_on_close(spark, tmp_path):
    """Session windows in TRUE streaming (append mode): a session emits only
    once the watermark passes its end; gap-adjacent events merge into one
    session; a later burst both closes earlier sessions and opens new state.
    Session end = last event + gap (merge-iff-overlap — same semantics the
    batch oracle events_sessions proves against DuckDB)."""
    from seraster_spark.streaming import stream_event_sessions
    from seraster_spark.streaming.incremental import drain_available_now_to_files

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    in_dir = str(tmp_path / "sess_in")
    out_dir = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")

    def rows(pairs):
        return spark.createDataFrame(
            [(k, datetime.datetime(2026, 1, 1, 0, m, s)) for k, m, s in pairs], schema
        )

    def drain():
        sdf = stream_event_sessions(
            spark, in_dir, schema, key_col="event_type", gap="1 minute",
            watermark="2 minutes",
        )
        drain_available_now_to_files(sdf, out_dir, ckpt)
        try:
            return spark.read.parquet(out_dir).collect()
        except Exception:
            return []

    # 'a': three events 20s apart (one session); 'b': one event
    rows([("a", 0, 0), ("a", 0, 20), ("a", 0, 40), ("b", 0, 0)]).write.mode(
        "append"
    ).parquet(in_dir)
    assert drain() == []  # watermark hasn't passed the session ends yet

    # a burst 30 min later advances the watermark past the first sessions
    rows([("a", 30, 0)]).write.mode("append").parquet(in_dir)
    out = drain()
    got = {
        (r["event_type"], r["session_start"].second, r["n_events"]) for r in out
    }
    assert got == {("a", 0, 3), ("b", 0, 1)}
    # end = last event + gap: a's session [00:00:00, 00:01:40)
    enda = [r["session_end"] for r in out if r["event_type"] == "a"][0]
    assert (enda.minute, enda.second) == (1, 40)


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    """Stream-static join: per micro-batch the static dim is joined
    (broadcast) before the windowed agg; result equals the batch
    join+aggregate on the same input. Dim maps kinds onto coarser groups
    with weights; one kind (ct3) is absent from the dim -> inner join
    drops those events in BOTH paths."""
    from seraster_spark.streaming.incremental import stream_enriched_counts

    in_dir = str(tmp_path / "enrich_in")
    ckpt = str(tmp_path / "enrich_ckpt")
    _batch(spark, None, 0, 400, minute=0).write.mode("append").parquet(in_dir)

    # fractional (exactly binary) weights: regression for a long cast that
    # silently truncated non-integer weighted sums
    dim = spark.createDataFrame(
        [("ct0", "even", 0.5), ("ct2", "even", 2.5), ("ct1", "odd", 1.25)],
        "kind string, group_label string, weight double",
    )
    sdf = stream_enriched_counts(spark, in_dir, SCHEMA, dim)
    run_available_now(sdf, "enriched_stream", ckpt)
    got = {
        (r["window_start"], r["group_label"]): (r["n_docs"], r["weighted"])
        for r in spark.table("enriched_stream").collect()
    }
    exp = {
        (r["ws"], r["group_label"]): (r["n_docs"], r["weighted"])
        for r in (
            spark.read.parquet(in_dir)
            .join(dim, "kind")
            .groupBy(F.window("ts", "1 minute").alias("w"), "group_label")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("weight").alias("weighted"),
            )
            .select(F.col("w.start").alias("ws"), "group_label", "n_docs", "weighted")
            .collect()
        )
    }
    assert got == exp and len(got) > 0
    # ct3 events exist in the input but no group contains them
    assert {g for _, g in got} == {"even", "odd"}


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Both sides are live streams; the time-range condition + watermarks
    bound the join state. Inner matches equal the batch inequality join."""
    import datetime as _dt

    from pyspark.sql import types as T2

    from seraster_spark.streaming.incremental import stream_stream_interval_join

    schema = T2.StructType(
        [
            T2.StructField("event_id", T2.LongType()),
            T2.StructField("ts", T2.TimestampType()),
            T2.StructField("user_id", T2.LongType()),
        ]
    )
    base = _dt.datetime(2026, 1, 1, 12, 0, 0)
    lrows = [(i, base + _dt.timedelta(minutes=7 * i % 90), i % 5) for i in range(60)]
    rrows = [(1000 + i, base + _dt.timedelta(minutes=5 * i % 90), i % 5) for i in range(80)]
    ldir, rdir = str(tmp_path / "L"), str(tmp_path / "R")
    spark.createDataFrame(lrows, schema).write.mode("append").parquet(ldir)
    spark.createDataFrame(rrows, schema).write.mode("append").parquet(rdir)

    sdf = stream_stream_interval_join(spark, ldir, rdir, schema, lookback="15 minutes")
    q = (
        sdf.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["l_id"], r["r_id"]) for r in spark.table("ssj").collect()}

    L = spark.createDataFrame(lrows, schema)
    R = spark.createDataFrame(rrows, schema).selectExpr(
        "event_id AS r_event_id", "ts AS rts", "user_id"
    )
    exp = {
        (r["event_id"], r["r_event_id"])
        for r in L.join(R, "user_id")
        .filter(
            (F.col("rts") >= F.col("ts") - F.expr("INTERVAL 15 minutes"))
            & (F.col("rts") <= F.col("ts"))
        )
        .collect()
    }
    assert got == exp and len(got) > 50
