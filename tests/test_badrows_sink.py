"""Kinesis dead-letter sink tests with a fake (file-recording) client:
startup probe semantics, batched put_records transport, fire-and-forget
failure handling. The fake records calls to disk because
foreachPartition runs in Python worker processes, not the test process.
"""

from __future__ import annotations

import functools
import glob
import json
import sys
import uuid
from pathlib import Path

import pytest
from pyspark import cloudpickle

# the fake client must reach Python workers, which cannot import this
# test module by name — ship it by value instead
cloudpickle.register_pickle_by_value(sys.modules[__name__])

from kinesis_s3_spark.sinks.badrows_sink import (
    PUT_RECORDS_BATCH,
    BadRowSinkError,
    KinesisBadRowSink,
)


class _FakeKinesisClient:
    def __init__(self, record_dir: str, status: str = "ACTIVE", mode: str = "ok"):
        self.record_dir = record_dir
        self.status = status
        self.mode = mode

    def describe_stream(self, StreamName):
        if self.mode == "auth-error":
            raise RuntimeError("AccessDeniedException: not authorized")
        if self.mode == "not-found":
            err = type("ResourceNotFoundException", (Exception,), {})
            raise err(f"stream {StreamName} not found")
        return {"StreamDescription": {"StreamStatus": self.status}}

    def put_records(self, StreamName, Records):
        out = Path(self.record_dir) / f"call-{uuid.uuid4().hex}.json"
        out.write_text(
            json.dumps([r["Data"].decode("utf-8") for r in Records])
        )
        return {"FailedRecordCount": 0}


def _factory(record_dir: str, status: str = "ACTIVE", mode: str = "ok"):
    return functools.partial(_FakeKinesisClient, record_dir, status, mode)


def test_probe_requires_active_stream(tmp_path):
    with pytest.raises(BadRowSinkError, match="doesn't exist"):
        KinesisBadRowSink(
            stream_name="bad", client_factory=_factory(str(tmp_path), status="CREATING")
        )


def test_probe_missing_stream_is_sink_error(tmp_path):
    with pytest.raises(BadRowSinkError, match="doesn't exist"):
        KinesisBadRowSink(
            stream_name="bad", client_factory=_factory(str(tmp_path), mode="not-found")
        )


def test_probe_auth_error_propagates(tmp_path):
    """Round-2 ADVICE defect: credential/endpoint failures must surface
    with their real message, not masquerade as 'stream doesn't exist'."""
    with pytest.raises(RuntimeError, match="AccessDeniedException"):
        KinesisBadRowSink(
            stream_name="bad", client_factory=_factory(str(tmp_path), mode="auth-error")
        )


def test_put_records_batching(spark, tmp_path):
    """1200 bad rows on one partition → exactly 3 PutRecords calls
    (500+500+200), every row delivered exactly once."""
    calls_dir = tmp_path / "calls"
    calls_dir.mkdir()
    sink = KinesisBadRowSink(
        stream_name="bad-stream", client_factory=_factory(str(calls_dir))
    )
    n = 2 * PUT_RECORDS_BATCH + 200
    rows = [(f"bad-row-{i}",) for i in range(n)]
    bad_df = spark.createDataFrame(rows, "value string").coalesce(1)
    sink.store_batch(bad_df, batch_id=1)

    calls = [json.loads(Path(f).read_text()) for f in glob.glob(str(calls_dir / "*.json"))]
    assert len(calls) == 3
    assert sorted(len(c) for c in calls) == [200, PUT_RECORDS_BATCH, PUT_RECORDS_BATCH]
    delivered = sorted(r for c in calls for r in c)
    assert delivered == sorted(r[0] for r in rows)
