"""Archive-replay streaming source: emit() tree → incremental stream.

The backfill contract: everything already archived is replayed once,
in batch order, with layout columns recovered; a checkpoint-restarted
query sees ONLY batches archived since (the same resume guarantee the
loader's own checkpoint gives the forward path)."""

from __future__ import annotations

import pytest

from kinesis_s3_spark.config import from_dict
from kinesis_s3_spark.sinks import emitter
from kinesis_s3_spark.sinks.emitter import emit
from kinesis_s3_spark.sources import replay
from kinesis_s3_spark.sources.replay import (
    _plan_batch,
    register_replay_source,
)


def test_no_subtype_sentinel_pinned():
    """replay.py duplicates the emitter sentinel (must stay
    import-free for by-value worker pickling) — pin the equality."""
    assert replay.NO_SUBTYPE == emitter.NO_SUBTYPE

SDJ = [
    '{"schema":"iglu:com.acme1/example1/jsonschema/2-0-1","data":{"a":1}}',
    '{"schema":"iglu:com.acme2/other/jsonschema/1-0-0","data":null}',
    "plain junk",
]


def _cfg(tmp_path):
    return from_dict(
        {
            "purpose": "SELF_DESCRIBING",
            "input": {"stream_name": "t"},
            "output": {
                "s3": {"path": str(tmp_path / "out"), "compression": "GZIP"},
                "bad_path": str(tmp_path / "bad"),
            },
        }
    )


def _drain(spark, tree, checkpoint, table):
    q = (
        spark.readStream.format("archive_replay")
        .option("path", tree)
        .load()
        .writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()


@pytest.fixture()
def tree(spark, tmp_path):
    cfg = _cfg(tmp_path)
    emit(spark.createDataFrame([(v,) for v in SDJ], "value string"), batch_id=0, cfg=cfg)
    emit(
        spark.createDataFrame([(SDJ[0],)], "value string"), batch_id=1, cfg=cfg
    )
    return str(tmp_path / "out"), cfg


def test_replay_full_tree(spark, tmp_path, tree):
    root, _ = tree
    register_replay_source(spark)
    _drain(spark, root, str(tmp_path / "ckpt"), "replay_all")
    rows = spark.sql(
        "SELECT value, batch_id, row_type FROM replay_all ORDER BY batch_id, value"
    ).collect()
    # all 3 batch-0 records are good: the schemaless one archives under
    # row_type=unpartitioned (only NULL payloads dead-letter)
    assert [r.batch_id for r in rows] == [0, 0, 0, 1]
    assert {r.value for r in rows if r.batch_id == 0} == set(SDJ)
    # combined RowType string recovered from the directory pair; bare
    # (no slash) when the subtype sentinel '-' was stored
    assert {r.row_type for r in rows} == {
        "com.acme1.example1/jsonschema-2",
        "com.acme2.other/jsonschema-1",
        "unpartitioned",
    }


def test_replay_resumes_from_checkpoint(spark, tmp_path, tree):
    """Restart sees ONLY batches archived since the checkpoint — the
    exactly-once half of the backfill contract (memory sink can't
    recover, so the durable parquet sink carries this test)."""
    root, cfg = tree
    register_replay_source(spark)
    ckpt = str(tmp_path / "ckpt2")
    sink = str(tmp_path / "sink")

    def run_once():
        q = (
            spark.readStream.format("archive_replay")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()

    run_once()
    assert spark.read.parquet(sink).count() == 4

    # a new batch lands after the first run finished
    emit(
        spark.createDataFrame([(SDJ[1],)], "value string"), batch_id=2, cfg=cfg
    )
    run_once()
    back = spark.read.parquet(sink)
    # exactly one new row: ids 0/1 are behind the checkpoint, batch 2
    # is replayed once, nothing is duplicated
    assert back.count() == 5
    assert [
        (r.batch_id, r.value)
        for r in back.filter("batch_id = 2").collect()
    ] == [(2, SDJ[1])]


def test_starting_batch_id_floor(spark, tmp_path, tree):
    root, _ = tree
    register_replay_source(spark)
    q = (
        spark.readStream.format("archive_replay")
        .option("path", root)
        .option("startingBatchId", "1")
        .load()
        .writeStream.format("memory")
        .queryName("replay_floor")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    assert [r.batch_id for r in spark.table("replay_floor").collect()] == [1]


def test_partition_planning_unit(tmp_path, spark, tree):
    """One InputPartition per gzip object; layout folded at plan time."""
    root, _ = tree
    parts = _plan_batch(root, 0)
    assert len(parts) == 3
    assert {p.row_type for p in parts} == {
        "com.acme1.example1/jsonschema-2",
        "com.acme2.other/jsonschema-1",
        "unpartitioned",
    }
    assert all(p.path.endswith(".gz") and p.batch_id == 0 for p in parts)
