"""Emit-path round-trip tests (GZipSerializerSpec.scala:33-74 analogue:
serialize → read back with an INDEPENDENT decompressor → byte
equality), plus partitioning and bad-row dead-lettering."""

from __future__ import annotations

import base64
import glob
import gzip
import json

from kinesis_s3_spark.config import from_dict
from kinesis_s3_spark.sinks.emitter import emit


def _cfg(tmp_path, purpose="SELF_DESCRIBING", compression="GZIP", **s3extra):
    return from_dict(
        {
            "purpose": purpose,
            "input": {"stream_name": "t"},
            "output": {
                "s3": {"path": str(tmp_path / "out"), "compression": compression, **s3extra},
                "bad_path": str(tmp_path / "bad"),
            },
        }
    )


def _read_gzip_lines(pattern):
    lines = []
    for f in sorted(glob.glob(pattern, recursive=True)):
        with gzip.open(f, "rt", encoding="utf-8") as fh:
            lines.extend(fh.read().splitlines())
    return lines


SDJ_ROWS = [
    '{"schema":"iglu:com.acme1/example1/jsonschema/2-0-1","data":{"a":1}}',
    '{"schema":"iglu:com.acme1/example1/jsonschema/2-0-0","data":{"b":[1,2]}}',
    '{"schema":"iglu:com.acme2/other/jsonschema/1-0-0","data":null}',
    '{"no":"schema"}',
    "plain junk",
]


def test_gzip_roundtrip_partitioned(spark, tmp_path):
    """Good records land newline-delimited under gzip, grouped by
    row_type — decompressed with Python's gzip (independent reader,
    like the reference shelling out to gunzip)."""
    cfg = _cfg(tmp_path)
    df = spark.createDataFrame([(v,) for v in SDJ_ROWS], "value string")
    meta = emit(df, batch_id=7, cfg=cfg)

    assert meta.count == 5 and meta.bad_count == 0
    base = str(tmp_path / "out" / "batch_id=7")
    # nested key layout: vendor.name / format-model as TWO directory
    # levels (RowType.scala:28 partition string, un-escaped)
    acme1 = _read_gzip_lines(
        f"{base}/row_type=com.acme1.example1/row_subtype=jsonschema-2/*.gz"
    )
    assert sorted(acme1) == sorted(SDJ_ROWS[:2])
    unpart = _read_gzip_lines(f"{base}/row_type=unpartitioned/*/*.gz")
    assert sorted(unpart) == sorted(SDJ_ROWS[3:])
    # every input byte shows up in exactly one partition
    everything = _read_gzip_lines(f"{base}/**/*.gz")
    assert sorted(everything) == sorted(SDJ_ROWS)


def test_bad_rows_dead_lettered(spark, tmp_path):
    """NULL payloads (unreadable records) become generic_error bad rows
    in the dead-letter path (ISerializer.scala:46-74 semantics)."""
    cfg = _cfg(tmp_path)
    df = spark.createDataFrame([(SDJ_ROWS[0],), (None,)], "value string")
    meta = emit(df, batch_id=1, cfg=cfg)
    assert meta.count == 2 and meta.bad_count == 1

    bad_lines = _read_gzip_lines(str(tmp_path / "bad" / "batch_id=1" / "*.gz"))
    assert len(bad_lines) == 1
    env = json.loads(bad_lines[0])
    assert env["schema"].startswith("iglu:com.snowplowanalytics.snowplow.badrows/generic_error")
    assert env["data"]["processor"]["artifact"] == "kinesis-s3-spark"
    assert env["data"]["failure"]["errors"] == ["Cannot deserialize record"]


def test_parquet_output(spark, tmp_path):
    """PARQUET compression: splittable columnar output (the LZO
    replacement, SURVEY §7 risk 4) re-read via Spark."""
    cfg = _cfg(tmp_path, compression="PARQUET")
    df = spark.createDataFrame([(v,) for v in SDJ_ROWS], "value string")
    emit(df, batch_id=0, cfg=cfg)
    back = spark.read.parquet(str(tmp_path / "out" / "batch_id=0"))
    assert sorted(r["value"] for r in back.collect()) == sorted(SDJ_ROWS)
    assert "row_type" in back.columns


def test_enriched_meta_earliest_tstamp(spark, tmp_path):
    """ENRICHED purpose: Meta carries min(collector_tstamp) parsed from
    TSV field index 3 (Batch.fromEnriched, processing/Batch.scala:36-40)."""
    cfg = _cfg(tmp_path, purpose="ENRICHED_EVENTS")
    rows = [
        ("app\tpc\t0\t2021-10-04 12:00:01\tx",),
        ("app\tpc\t0\t2021-10-02 09:30:00\ty",),
        ("app\tpc\t0\tnot-a-time\tz",),
    ]
    df = spark.createDataFrame(rows, "value string")
    meta = emit(df, batch_id=2, cfg=cfg)
    assert meta.count == 3 and meta.bad_count == 0
    assert meta.earliest_tstamp.strftime("%Y-%m-%d %H:%M:%S") == "2021-10-02 09:30:00"


def test_unpartitioned_purpose_raw(spark, tmp_path):
    """RAW purpose never inspects payloads (Purpose.Raw,
    Config.scala:115): everything lands under row_type=unpartitioned."""
    cfg = _cfg(tmp_path, purpose="RAW")
    df = spark.createDataFrame([("anything",), ("at all",)], "value string")
    emit(df, batch_id=3, cfg=cfg)
    lines = _read_gzip_lines(
        str(tmp_path / "out" / "batch_id=3" / "row_type=unpartitioned" / "*" / "*.gz")
    )
    # RAW frames as base64 lines (byte-faithful contract); decode back
    assert sorted(base64.b64decode(x).decode() for x in lines) == [
        "anything",
        "at all",
    ]


def test_replay_is_idempotent(spark, tmp_path):
    """Re-running the same batch_id (crash-replay) overwrites the
    per-batch directory instead of appending duplicates — the
    idempotent upgrade over the reference's at-least-once."""
    cfg = _cfg(tmp_path)
    df = spark.createDataFrame([(v,) for v in SDJ_ROWS], "value string")
    emit(df, batch_id=9, cfg=cfg)
    emit(df, batch_id=9, cfg=cfg)  # replay
    everything = _read_gzip_lines(str(tmp_path / "out" / "batch_id=9" / "**" / "*.gz"))
    assert sorted(everything) == sorted(SDJ_ROWS)


def test_bad_rows_without_bad_path_warns(spark, tmp_path, caplog):
    """No bad_path configured (RAW purpose permits it): dropped bad
    rows must be loudly logged, never silent data loss."""
    import logging

    cfg = from_dict(
        {
            "purpose": "RAW",
            "input": {"stream_name": "t"},
            "output": {"s3": {"path": str(tmp_path / "out")}},
        }
    )
    df = spark.createDataFrame([("ok",), (None,)], "value string")
    with caplog.at_level(logging.WARNING, logger="kinesis_s3_spark.sinks.emitter"):
        meta = emit(df, batch_id=4, cfg=cfg)
    assert meta.bad_count == 1
    assert any("DROPPING 1 bad rows" in r.message for r in caplog.records)


def test_fractional_second_tstamp(spark, tmp_path):
    """Millisecond collector timestamps parse (reference Instant.parse
    accepts '[.SSS]'); the earliest-tstamp metric must not lose them."""
    cfg = _cfg(tmp_path, purpose="ENRICHED_EVENTS")
    rows = [("app\tpc\t0\t2020-11-26 00:01:05.123\tx",), ("app\tpc\t0\t2020-11-26 00:01:06\ty",)]
    meta = emit(spark.createDataFrame(rows, "value string"), batch_id=5, cfg=cfg)
    assert meta.earliest_tstamp is not None
    assert meta.earliest_tstamp.strftime("%H:%M:%S.%f") == "00:01:05.123000"


def test_byte_limit_bounds_object_size(spark, tmp_path):
    """O4 buffer.byteLimit: every output object's uncompressed payload
    must stay within byteLimit (one oversized record still gets its own
    object, like the reference's flush-of-at-least-one)."""
    byte_limit = 200
    cfg = from_dict(
        {
            "purpose": "RAW",
            "input": {"stream_name": "t"},
            "output": {
                "s3": {"path": str(tmp_path / "out"), "compression": "GZIP"},
                "bad_path": str(tmp_path / "bad"),
            },
            "buffer": {"byte_limit": byte_limit},
        }
    )
    rows = [(f"record-{i:04d}-" + "x" * 40,) for i in range(40)]  # ~52 B each
    emit(spark.createDataFrame(rows, "value string"), batch_id=11, cfg=cfg)

    files = sorted(glob.glob(str(tmp_path / "out" / "batch_id=11" / "**" / "*.gz"), recursive=True))
    assert len(files) > 4  # the roll actually fired (40*52 B ≈ 10 × limit)
    seen = []
    for f in files:
        with gzip.open(f, "rt", encoding="utf-8") as fh:
            lines = fh.read().splitlines()
        payload = sum(len(line) + 1 for line in lines)
        assert payload <= byte_limit or len(lines) == 1, (f, payload)
        seen.extend(base64.b64decode(x).decode() for x in lines)
    assert sorted(seen) == sorted(r[0] for r in rows)  # nothing lost to the roll


def test_runmeta_replay_stable(spark, tmp_path):
    """RunMeta: run_id survives re-instantiation on the same checkpoint
    (crash-restart) and batch times replay verbatim; a wiped checkpoint
    mints a FRESH run_id so batch_id=0 of the new run can never
    overwrite the old run's commits."""
    from kinesis_s3_spark.streaming.runmeta import RunMeta

    ckpt = str(tmp_path / "ckpt")
    m1 = RunMeta(spark, ckpt)
    t0 = m1.batch_time(0)
    m2 = RunMeta(spark, ckpt)  # restart against same checkpoint
    assert m2.run_id == m1.run_id
    assert m2.batch_time(0) == t0  # replayed batch keeps its decoration time

    m3 = RunMeta(spark, str(tmp_path / "ckpt2"))  # checkpoint reset
    assert m3.run_id != m1.run_id


def test_replay_idempotent_with_date_format(spark, tmp_path):
    """The round-2 defect: with date_format set, a replay using the
    RunMeta-stable time must land in (and overwrite) the SAME
    time-decorated directory — no duplicate output across dirs."""
    from kinesis_s3_spark.streaming.runmeta import RunMeta

    cfg = _cfg(tmp_path, date_format="{YYYY}/{MM}/{dd}/{HH}")
    meta = RunMeta(spark, str(tmp_path / "ckpt"))
    df = spark.createDataFrame([(v,) for v in SDJ_ROWS], "value string")
    emit(df, batch_id=2, cfg=cfg, now=meta.batch_time(2), run_id=meta.run_id)
    emit(df, batch_id=2, cfg=cfg, now=meta.batch_time(2), run_id=meta.run_id)  # replay

    everything = _read_gzip_lines(str(tmp_path / "out" / "**" / "*.gz"))
    assert sorted(everything) == sorted(SDJ_ROWS)  # exactly once, not twice
    # and the run namespace is part of the layout
    dirs = glob.glob(str(tmp_path / "out" / "**" / f"run={meta.run_id}" / "batch_id=2"), recursive=True)
    assert len(dirs) == 1
