"""Streaming-native semantics the reference lacks entirely (SURVEY §2
"absent": watermarks, event-time windows, stateful dedup) — verified
against their batch twins where possible."""

from __future__ import annotations

from datetime import datetime, timedelta

import pyspark.sql.functions as F


def _event_rows(n=60, users=3):
    t0 = datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        rows.append(
            (i, t0 + timedelta(minutes=7 * i), i % users, float(i))
        )
    return rows


def _stream_from(spark, tmp_path, rows, schema):
    path = str(tmp_path / "in")
    spark.createDataFrame(rows, schema).write.mode("append").parquet(path)
    static = spark.read.parquet(path)
    return (
        spark.readStream.schema(static.schema).option("maxFilesPerTrigger", 1).parquet(path),
        static,
    )


def test_tumbling_window_with_watermark(spark, tmp_path):
    """Streaming tumbling-window counts equal the batch groupBy —
    append mode emits exactly the closed windows."""
    rows = _event_rows()
    stream, static = _stream_from(
        spark, tmp_path, rows, "event_id long, ts timestamp, user_id long, value double"
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").getField("start").alias("ws"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["ws"], r["n"])
            for r in spark.sql("select * from tumbling_stream").collect()
        }
    finally:
        q.stop()
    expect = {
        (r["ws"], r["n"])
        for r in static.groupBy(F.window("ts", "1 hour").getField("start").alias("ws"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == expect


def test_session_window_stream(spark, tmp_path):
    """session_window(): gap-closed sessions in streaming match the
    batch session_window aggregation."""
    t0 = datetime(2024, 1, 1)
    rows = []
    # user 0: two bursts separated by > 30 min → 2 sessions
    for m in (0, 5, 10, 60, 65):
        rows.append((m, t0 + timedelta(minutes=m), 0, 1.0))
    stream, static = _stream_from(
        spark, tmp_path, rows, "event_id long, ts timestamp, user_id long, value double"
    )
    agg_cols = [F.count("*").alias("n")]
    sess = lambda df: (  # noqa: E731
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(*agg_cols)
    )
    q = (
        sess(stream.withWatermark("ts", "2 hours"))
        .writeStream.format("memory")
        .queryName("session_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r["user_id"], r["n"]) for r in spark.sql("select * from session_stream").collect()
        )
    finally:
        q.stop()
    expect = sorted((r["user_id"], r["n"]) for r in sess(static).collect())
    assert got == expect == [(0, 2), (0, 3)]


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Streaming exact dedup with bounded state: duplicate event_ids
    arriving within the watermark are dropped."""
    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, 0, 1.0),
        (1, t0 + timedelta(minutes=1), 0, 1.0),  # dup within watermark
        (2, t0 + timedelta(minutes=2), 0, 1.0),
        (2, t0 + timedelta(minutes=2), 0, 1.0),  # dup same micro-batch
        (3, t0 + timedelta(minutes=3), 1, 1.0),
    ]
    stream, _ = _stream_from(
        spark, tmp_path, rows, "event_id long, ts timestamp, user_id long, value double"
    )
    dedup = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(["event_id"])
    q = (
        dedup.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(r["event_id"] for r in spark.sql("select * from dedup_stream").collect())
    finally:
        q.stop()
    assert got == [1, 2, 3]
