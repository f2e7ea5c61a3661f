"""Streaming materialized-view maintenance: the incremental state must
be indistinguishable from recomputation at every point, across
restarts and replays (the streaming arm of etl_incremental_agg_merge)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from kinesis_s3_spark.config import from_dict
from kinesis_s3_spark.streaming.loader import run_loader
from kinesis_s3_spark.streaming.mv import ParquetMaterializedView


def _rows(view_df):
    return {
        r["view_key"]: (r["n_records"], r["total_bytes"])
        for r in view_df.collect()
    }


def test_mv_merge_equals_recompute(spark, tmp_path):
    mv = ParquetMaterializedView(
        spark, str(tmp_path / "state"), key_col=F.substring("value", 1, 1)
    )
    b0 = spark.createDataFrame([("apple",), ("avocado",), ("banana",)], "value string")
    b1 = spark.createDataFrame([("apricot",), ("blueberry",)], "value string")
    mv.update(b0, 0)
    mv.update(b1, 1)
    want = {"a": (3, 5 + 7 + 7), "b": (2, 6 + 9)}
    assert _rows(mv.read()) == want

    # replay of an applied batch id is a no-op
    mv.update(b1, 1)
    assert _rows(mv.read()) == want


def test_mv_survives_restart_and_skips_redelivery(spark, tmp_path):
    state = str(tmp_path / "state")
    mv = ParquetMaterializedView(spark, state)
    mv.update(spark.createDataFrame([("xx",)], "value string"), 0)

    # fresh instance on the same dir = process restart
    mv2 = ParquetMaterializedView(spark, state)
    assert mv2.last_batch_id == 0
    mv2.update(spark.createDataFrame([("xx",)], "value string"), 0)  # redelivery
    mv2.update(spark.createDataFrame([("yyy",), ("z",)], "value string"), 1)
    assert _rows(mv2.read()) == {"all": (3, 2 + 3 + 1)}
    # old state versions are pruned after the pointer moves
    assert len(glob.glob(f"{state}/state_v*")) == 1


def test_mv_on_loader_path(spark, tmp_path):
    """Wired into run_loader like the sketch accumulators: after the
    stream drains, the view equals a recompute over every input row."""
    inp = str(tmp_path / "in")
    rows = ["alpha", "beta", "gamma", "beta2"]
    spark.createDataFrame([(r,) for r in rows], "value string").coalesce(
        1
    ).write.parquet(inp)
    cfg = from_dict(
        {
            "purpose": "RAW",
            "input": {"stream_name": "t", "kind": "file", "path": inp, "format": "parquet"},
            "output": {"s3": {"path": str(tmp_path / "out"), "compression": "GZIP"}},
            "buffer": {"time_limit_ms": 250},
            "checkpoint_location": str(tmp_path / "ckpt"),
        }
    )
    mv = ParquetMaterializedView(
        spark, str(tmp_path / "state"), key_col=F.substring("value", 1, 1)
    )
    q = run_loader(spark, cfg, accumulators=(mv,), query_name="mv-test")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _rows(mv.read()) == {"a": (1, 5), "b": (2, 4 + 5), "g": (1, 5)}
