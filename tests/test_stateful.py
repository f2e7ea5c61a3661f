"""applyInPandasWithState sessionizer: closed sessions emitted
incrementally must match the batch sessionization of the same data."""

from __future__ import annotations

from datetime import datetime, timedelta

from kinesis_s3_spark.streaming.stateful import sessionize_stream


def test_stateful_sessionizer_matches_batch(spark, tmp_path):
    t0 = datetime(2024, 1, 1)
    rows = []
    # user 7: three bursts → sessions of 3, 2, and an open tail of 1
    for m in (0, 10, 20, 120, 125, 300):
        rows.append((7, t0 + timedelta(minutes=m)))
    # user 8: single burst (stays open, never emitted)
    for m in (0, 5):
        rows.append((8, t0 + timedelta(minutes=m)))
    inp = str(tmp_path / "in")
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.parquet(inp)

    static = spark.read.parquet(inp)
    stream = spark.readStream.schema(static.schema).parquet(inp)
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # ProcessingTimeTimeout keeps scheduling wake-up batches, so
        # processAllAvailable never returns — poll until the data batch
        # committed and the closed sessions are visible
        import time

        deadline = time.time() + 120
        got = []
        while time.time() < deadline:
            got = sorted(
                (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
                for r in spark.sql("select * from sessions_out").collect()
            )
            if len(got) >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()

    # closed sessions only: user 7's first two bursts; user 8 and the
    # final burst of user 7 remain open in state
    assert got == [
        (7, t0, t0 + timedelta(minutes=20), 3),
        (7, t0 + timedelta(minutes=120), t0 + timedelta(minutes=125), 2),
    ]
