"""Stream-stream join with watermarks (the last streaming-semantics
gap vs SURVEY §2's absent list): clicks joined to views within a
bounded event-time interval, state pruned by watermark."""

from __future__ import annotations

from datetime import datetime, timedelta

import pyspark.sql.functions as F


def test_stream_stream_interval_join(spark, tmp_path):
    t0 = datetime(2024, 1, 1)
    views = [(i, t0 + timedelta(minutes=2 * i)) for i in range(10)]
    # each click lands 1 minute after its view → joins; click 99 has no view
    clicks = [(i, t0 + timedelta(minutes=2 * i, seconds=60)) for i in range(0, 10, 2)]
    clicks.append((99, t0 + timedelta(minutes=5)))

    vpath, cpath = str(tmp_path / "views"), str(tmp_path / "clicks")
    spark.createDataFrame(views, "item_id long, v_ts timestamp").write.parquet(vpath)
    spark.createDataFrame(clicks, "item_id long, c_ts timestamp").write.parquet(cpath)

    v_static = spark.read.parquet(vpath)
    c_static = spark.read.parquet(cpath)
    v = spark.readStream.schema(v_static.schema).parquet(vpath).withWatermark("v_ts", "1 hour")
    c = spark.readStream.schema(c_static.schema).parquet(cpath).withWatermark("c_ts", "1 hour")

    joined = v.join(
        c,
        (v["item_id"] == c["item_id"])
        & (c["c_ts"] >= v["v_ts"])
        & (c["c_ts"] <= v["v_ts"] + F.expr("INTERVAL 5 MINUTES")),
    ).select(v["item_id"], "v_ts", "c_ts")

    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(r["item_id"] for r in spark.sql("select * from ss_join").collect())
    finally:
        q.stop()

    assert got == [0, 2, 4, 6, 8]  # every click matched its view; 99 dropped
