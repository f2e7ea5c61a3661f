"""Byte-faithful Purpose.RAW emit path (VERDICT r5 tasks #1/#2).

The reference's record is an opaque Array[Byte] (package.scala:28) and
its serializers write those bytes verbatim (GZipSerializer.scala:29-40);
the LZO path exists precisely for binary Thrift CollectorPayload
records (LzoSerializerSpec.scala:39-82). These tests prove the engine
carries NON-UTF-8 bytes and embedded newlines through every sink and
back:

- RAW + PARQUET: binary column stored verbatim;
- RAW + GZIP: base64 line framing, decoded by read_archive(raw=True);
- RAW + GZIP_INDEXED: same framing through the split-indexed sink,
  reassembled purely from independent mid-file split reads;
- the LzoSerializerSpec analogue: hand-rolled TBinaryProtocol
  CollectorPayload structs round-tripped byte-equal and field-equal.
"""

from __future__ import annotations

import base64
import glob
import gzip
import json
import struct

import pytest

from kinesis_s3_spark.config import from_dict
from kinesis_s3_spark.sinks.emitter import emit
from kinesis_s3_spark.sinks.indexed_gzip import read_all_via_splits, read_index
from kinesis_s3_spark.sources.archive import read_archive

# non-UTF-8 sequences (0xFF/0xFE invalid, lone continuation bytes),
# embedded newlines and carriage returns, NULs, an empty payload, and
# one > 3 KiB blob so base64's would-be MIME chunking (76-char lines)
# is exercised
RAW_PAYLOADS = [
    b"\x00\xff\xfe\xfd binary \x80\x81\x82",
    b"line1\nline2\r\nline3",
    b"\n\n\n",
    b"",
    b"plain ascii",
    bytes(range(256)) * 13,  # 3328 bytes, every byte value
]


def _cfg(tmp_path, compression):
    return from_dict(
        {
            "purpose": "RAW",
            "input": {"stream_name": "t"},
            "output": {
                "s3": {"path": str(tmp_path / "out"), "compression": compression},
                "bad_path": str(tmp_path / "bad"),
            },
        }
    )


def _raw_df(spark, payloads=RAW_PAYLOADS):
    return spark.createDataFrame([(p,) for p in payloads], "value binary")


@pytest.mark.parametrize("compression", ["PARQUET", "GZIP", "GZIP_INDEXED"])
def test_raw_roundtrip_all_sinks(spark, tmp_path, compression):
    """Every sink carries every byte value, empty payloads, and
    embedded newlines back out unchanged."""
    cfg = _cfg(tmp_path, compression)
    meta = emit(_raw_df(spark), batch_id=3, cfg=cfg)
    assert meta.count == len(RAW_PAYLOADS) and meta.bad_count == 0

    back = read_archive(
        spark, str(tmp_path / "out"), compression=compression, raw=True
    )
    rows = back.collect()
    assert back.schema["value"].dataType.typeName() == "binary"
    got = sorted(bytes(r["value"]) for r in rows)
    assert got == sorted(RAW_PAYLOADS)
    assert all(r["batch_id"] == 3 for r in rows)


def test_raw_indexed_gzip_split_reads(spark, tmp_path):
    """The GZIP_INDEXED RAW objects reassemble byte-identically from
    INDEPENDENT mid-file split reads (the LZO .index contract), with
    no state shared between splits."""
    cfg = _cfg(tmp_path, "GZIP_INDEXED")
    emit(_raw_df(spark), batch_id=0, cfg=cfg)
    gz_files = glob.glob(str(tmp_path / "out" / "batch_id=0" / "**" / "*.gz"), recursive=True)
    assert gz_files
    got = []
    for gz in gz_files:
        for line in read_all_via_splits(gz):
            got.append(base64.b64decode(line))
    assert sorted(got) == sorted(RAW_PAYLOADS)


def test_raw_gzip_is_standard_gzip(tmp_path, spark):
    """The RAW gzip objects stay gunzip-readable text (one base64 line
    per record, no CR/LF inside a record's framing) — an independent
    Python-gzip reader decodes them without the engine."""
    cfg = _cfg(tmp_path, "GZIP")
    emit(_raw_df(spark), batch_id=1, cfg=cfg)
    got = []
    for f in glob.glob(str(tmp_path / "out" / "batch_id=1" / "**" / "*.gz"), recursive=True):
        with gzip.open(f, "rt", encoding="ascii") as fh:
            for line in fh.read().splitlines():
                got.append(base64.b64decode(line))
    assert sorted(got) == sorted(RAW_PAYLOADS)


def test_raw_byte_limit_rolls_files(spark, tmp_path):
    """buffer.byteLimit still bounds per-object payload for RAW — the
    roll is sized from the FRAMED (base64) record length."""
    cfg = from_dict(
        {
            "purpose": "RAW",
            "input": {"stream_name": "t"},
            "output": {
                "s3": {
                    "path": str(tmp_path / "out"),
                    "compression": "GZIP",
                    "writers_per_partition": 1,
                },
                "bad_path": str(tmp_path / "bad"),
            },
            "buffer": {"byte_limit": 600},
        }
    )
    payloads = [bytes([i]) * 300 for i in range(6)]  # b64-framed ~401 B each
    emit(spark.createDataFrame([(p,) for p in payloads], "value binary"), 0, cfg)
    files = glob.glob(str(tmp_path / "out" / "batch_id=0" / "**" / "*.gz"), recursive=True)
    # 401 B framed, 600 B limit -> 1 record per file
    assert len(files) >= 6
    got = []
    for f in files:
        with gzip.open(f, "rt", encoding="ascii") as fh:
            got.extend(base64.b64decode(x) for x in fh.read().splitlines())
    assert sorted(got) == sorted(payloads)


def test_raw_null_payload_dead_lettered(spark, tmp_path):
    """NULL payloads in a RAW batch still dead-letter as generic_error
    envelopes; good bytes are unaffected."""
    cfg = _cfg(tmp_path, "PARQUET")
    df = spark.createDataFrame([(RAW_PAYLOADS[0],), (None,)], "value binary")
    meta = emit(df, batch_id=9, cfg=cfg)
    assert meta.count == 2 and meta.bad_count == 1
    bad = []
    for f in glob.glob(str(tmp_path / "bad" / "batch_id=9" / "*.gz")):
        with gzip.open(f, "rt") as fh:
            bad.extend(fh.read().splitlines())
    assert len(bad) == 1
    env = json.loads(bad[0])
    assert env["schema"].startswith(
        "iglu:com.snowplowanalytics.snowplow.badrows/generic_error"
    )


# --- Thrift CollectorPayload parity (LzoSerializerSpec.scala:39-82) ---------
#
# Hand-rolled TBinaryProtocol framing for the public CollectorPayload
# schema (collector-payload.thrift, iglu
# com.snowplowanalytics.snowplow/CollectorPayload/thrift/1-0-0):
#   31337: string schema, 100: string ipAddress, 200: i64 timestamp,
#   210: string encoding, 220: string collector
# No thrift dependency: TBinaryProtocol is 1 type byte + i16 field id
# (BE) + payload (strings: i32 BE length + bytes; i64: 8 bytes BE),
# terminated by a 0x00 stop byte.

_TSTRING, _TI64, _TSTOP = 11, 10, 0


def thrift_encode_collector_payload(
    schema: str, ip: str, timestamp: int, encoding: str, collector: str
) -> bytes:
    def sfield(fid: int, s: str) -> bytes:
        b = s.encode("utf-8")
        return struct.pack(">bhi", _TSTRING, fid, len(b)) + b

    return (
        sfield(31337, schema)
        + sfield(100, ip)
        + struct.pack(">bhq", _TI64, 200, timestamp)
        + sfield(210, encoding)
        + sfield(220, collector)
        + bytes([_TSTOP])
    )


def thrift_decode_collector_payload(raw: bytes) -> dict:
    out, pos = {}, 0
    while raw[pos] != _TSTOP:
        ftype, fid = struct.unpack_from(">bh", raw, pos)
        pos += 3
        if ftype == _TSTRING:
            (n,) = struct.unpack_from(">i", raw, pos)
            pos += 4
            out[fid] = raw[pos : pos + n].decode("utf-8")
            pos += n
        elif ftype == _TI64:
            (out[fid],) = struct.unpack_from(">q", raw, pos)
            pos += 8
        else:  # pragma: no cover - fixture only emits the two types
            raise ValueError(f"unexpected thrift type {ftype}")
    return out


def test_thrift_collector_payload_roundtrip(spark, tmp_path):
    """The LzoSerializerSpec analogue on the O11 replacement: encode
    real Thrift-framed CollectorPayloads (the reference's
    ("A","B",1000,"a","b") / ("X","Y",2000,"x","y") fixtures), write
    through RAW + GZIP_INDEXED, read back via independent split reads,
    byte-compare, then DECODE the structs and compare field-by-field —
    proving the replacement sink carries the payload type the LZO path
    existed for."""
    events = [
        ("iglu:A", "B", 1000, "a", "b"),
        ("iglu:X", "Y", 2000, "x", "y"),
    ]
    blobs = [thrift_encode_collector_payload(*e) for e in events]
    # thrift framing includes non-UTF-8 byte runs (i64 BE of 1000 has
    # \x03\xe8 after NULs) — assert the fixture is genuinely binary
    assert all(b"\x00" in b for b in blobs)

    cfg = _cfg(tmp_path, "GZIP_INDEXED")
    emit(spark.createDataFrame([(b,) for b in blobs], "value binary"), 0, cfg)

    got = []
    for gz in glob.glob(
        str(tmp_path / "out" / "batch_id=0" / "**" / "*.gz"), recursive=True
    ):
        points, n_rec, _ = read_index(gz + ".index")
        assert n_rec >= 1
        got.extend(base64.b64decode(x) for x in read_all_via_splits(gz))
    assert sorted(got) == sorted(blobs)

    decoded = sorted(sorted(thrift_decode_collector_payload(b).items()) for b in got)
    expect = sorted(
        [(100, ip), (200, ts), (210, enc), (220, col), (31337, sch)]
        for sch, ip, ts, enc, col in events
    )
    assert decoded == expect
