"""emit() → read_archive() round-trip: the downstream read path sees
exactly the bytes and partition keys the loader wrote."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_s3_spark.sinks.badrows_sink import build_bad_sink
from kinesis_s3_spark.sinks.emitter import emit
from kinesis_s3_spark.sources.archive import read_archive, read_bad_archive
from tests.test_emitter import SDJ_ROWS, _cfg


def test_bad_row_archive_roundtrip_through_emitter(spark, tmp_path):
    """The FULL failure path: emit() dead-letters undeserializable
    records through the file bad sink, and read_bad_archive recovers
    the original payload bytes plus the envelope's typed fields."""
    cfg = _cfg(tmp_path)
    rows = SDJ_ROWS + [None]  # a NULL value is the undeserializable case
    df = spark.createDataFrame([(v,) for v in rows], "value string")
    meta = emit(df, batch_id=3, cfg=cfg, bad_sink=build_bad_sink(cfg))
    assert meta.bad_count >= 1

    back = read_bad_archive(spark, str(tmp_path / "bad")).collect()
    assert len(back) == meta.bad_count
    for r in back:
        assert r["batch_id"] == 3
        assert r["schema_uri"].endswith("generic_error/jsonschema/1-0-0")
        assert r["artifact"] == "kinesis-s3-spark"
        assert r["errors"] == ["Cannot deserialize record"]
        assert r["payload"] == ""  # NULL payload dead-letters as empty


def test_gzip_roundtrip(spark, tmp_path):
    cfg = _cfg(tmp_path)
    df = spark.createDataFrame([(v,) for v in SDJ_ROWS], "value string")
    emit(df, batch_id=7, cfg=cfg)
    emit(df, batch_id=8, cfg=cfg)

    back = read_archive(spark, str(tmp_path / "out"))
    rows = back.collect()
    assert sorted(r["value"] for r in rows) == sorted(SDJ_ROWS * 2)
    assert {r["batch_id"] for r in rows} == {7, 8}
    # combined reference RowType string is reconstructed
    types = {r["row_type"] for r in rows}
    assert "com.acme1.example1/jsonschema-2" in types
    assert "unpartitioned" in types


def test_partition_pruning_on_batch_id(spark, tmp_path):
    cfg = _cfg(tmp_path)
    df = spark.createDataFrame([(v,) for v in SDJ_ROWS], "value string")
    emit(df, batch_id=1, cfg=cfg)
    emit(df, batch_id=2, cfg=cfg)
    back = read_archive(spark, str(tmp_path / "out")).filter(F.col("batch_id") == 2)
    assert back.count() == len(SDJ_ROWS)
    # the batch_id predicate prunes directories, not just rows
    plan = back.queryExecution if False else back._jdf.queryExecution().executedPlan().toString()
    assert "batch_id" in plan


def test_parquet_roundtrip(spark, tmp_path):
    cfg = _cfg(tmp_path, compression="PARQUET")  # the LZO substitution format
    df = spark.createDataFrame([(v,) for v in SDJ_ROWS], "value string")
    emit(df, batch_id=0, cfg=cfg)
    back = read_archive(spark, str(tmp_path / "out"), compression="PARQUET")
    assert sorted(r["value"] for r in back.collect()) == sorted(SDJ_ROWS)
