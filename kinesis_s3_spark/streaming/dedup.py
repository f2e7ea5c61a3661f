"""Streaming incremental dedup (SURVEY §7 risk 6): the streaming twin
of operators/dedup.py:dedup_incremental.

The batch operator anti-joins a new corpus against a seen-hash set;
the stream equivalent keeps the seen-hash set as WATERMARK-BOUNDED
operator state via ``dropDuplicatesWithinWatermark`` — a record whose
content hash matched anything seen within the watermark window is
dropped, state older than the watermark is evicted, and the whole set
survives query restarts through the checkpoint (proved by
tests/test_stateful.py::test_stream_incremental_dedup_checkpoint_resume).

100 TB design: state is hash-partitioned by content hash across
executors (one 32-byte sha256 + timestamp per distinct record in the
window, RocksDB-spillable), and the watermark bounds it — the unbounded
"remember everything forever" variant (plain ``dropDuplicates``) is
exactly the state-discipline failure the survey warns about, so it is
deliberately NOT offered on the loader path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_s3_spark.functions.timestamps import collector_tstamp_col


def with_incremental_dedup(stream: DataFrame, watermark_delay: str = "1 hour") -> DataFrame:
    """value-stream → value-stream with duplicate payloads dropped.

    Dedup key = sha256 of the raw payload (the same key
    dedup_incremental uses). Event time = the payload's own
    collector_tstamp when it parses (enriched TSV, reference O7),
    else the batch's processing time — so both enriched and raw/JSON
    loader purposes dedup without schema knowledge."""
    # sha2(NULL) is NULL, and dropDuplicatesWithinWatermark treats NULL
    # keys as equal — which would silently swallow every corrupt/NULL
    # payload after the first before it reaches the bad-row path in
    # emit(). Give each NULL payload a unique sentinel key instead so
    # dedup never drops it.
    keyed = stream.withColumn(
        "_dedup_hash",
        F.coalesce(
            F.sha2(F.col("value").cast("binary"), 256),
            F.concat(F.lit("null-payload#"), F.expr("uuid()")),
        ),
    ).withColumn(
        "_dedup_ts",
        F.coalesce(collector_tstamp_col(F.col("value")), F.current_timestamp()),
    )
    deduped = keyed.withWatermark("_dedup_ts", watermark_delay).dropDuplicatesWithinWatermark(
        ["_dedup_hash"]
    )
    return deduped.drop("_dedup_hash", "_dedup_ts")
