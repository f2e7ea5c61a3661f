"""Micro-batch emit: the reference's flush path as one foreachBatch body
(reference O5, O8-O11, O15, O16 — KinesisS3Emitter.emit at
KinesisS3Emitter.scala:65-86 and emitRecords at :156-175).

Per flushed batch the reference: groups records by row type, serializes
each group to one compressed in-memory stream, uploads to a
time-decorated key, and dead-letters per-record failures as bad rows.

Spark-first translation:
- grouping           → a ``row_type`` column + ``partitionBy`` on write
                       (one dynamic-partition write, no driver loop);
- gzip serializer    → the text sink with gzip codec (O10,
                       GZipSerializer.scala:24-49) — newline-delimited
                       records, byte-identical framing;
- LZO serializer     → parquet+zstd (splittable output; SURVEY §7
                       risk 4 documents LZO as out of scope);
- in-memory streams + manual retry loop (O14) → task-local streaming
  writers + the file-sink commit protocol (exactly-once, strictly
  stronger than the reference's at-least-once);
- time-decorated key → ``decorate_directory_with_time`` on the batch's
  upload instant, driver-side (O12);
- bad rows           → ``bad_row_json_col`` JSON to the dead-letter
                       path (O16/O17).

Scale: the only shuffle is the optional pre-write repartition on
``row_type`` (keeps one writer task per partition value instead of
#tasks × #partitions small files — the 100 TB file-count guard).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_s3_spark.config import Compression, LoaderConfig, Purpose
from kinesis_s3_spark.functions.badrows import bad_row_json_col
from kinesis_s3_spark.functions.paths import decorate_directory_with_time
from kinesis_s3_spark.functions.schema_key import row_type_col
from kinesis_s3_spark.functions.timestamps import collector_tstamp_col

ROW_TYPE_COL = "row_type"


@dataclass
class BatchMeta:
    """Batch.Meta (processing/Batch.scala:21-34): what the emitter
    reports to monitoring after each flush."""

    batch_id: int
    count: int
    bad_count: int
    earliest_tstamp: datetime | None
    output_path: str


def _with_result_columns(df: DataFrame, cfg: LoaderConfig) -> DataFrame:
    """IdentityTransformer + Result split (O2/O3,
    IdentityTransformer.scala:29-37): normalize to a string ``value``
    column and a boolean ``is_bad`` (NULL payload = unreadable record,
    the ReadingError branch of Common.scala:68-70)."""
    if "value" not in df.columns:
        raise ValueError(f"input batch must carry a 'value' column; got {df.columns}")
    value = F.col("value").cast("string")
    out = df.withColumn("value", value).withColumn("is_bad", F.col("value").isNull())
    if cfg.purpose is Purpose.SELF_DESCRIBING and cfg.output.s3.partition_for_purpose:
        out = out.withColumn(
            ROW_TYPE_COL, row_type_col(F.col("value"), is_failed=F.col("is_bad"))
        )
    else:
        out = out.withColumn(ROW_TYPE_COL, F.lit("unpartitioned"))
    if cfg.purpose is Purpose.ENRICHED_EVENTS:
        out = out.withColumn("_tstamp", collector_tstamp_col(F.col("value")))
    else:
        out = out.withColumn("_tstamp", F.lit(None).cast("timestamp"))
    return out


def emit(
    batch_df: DataFrame,
    batch_id: int,
    cfg: LoaderConfig,
    now: datetime | None = None,
) -> BatchMeta:
    """The foreachBatch body. Returns the flush Meta that monitoring
    consumes (KinesisS3Emitter.scala:74-75 → StatsD.report)."""
    now = now or datetime.now(timezone.utc)
    df = _with_result_columns(batch_df, cfg).cache()
    try:
        agg = df.agg(
            F.count("*").alias("n"),
            F.sum(F.col("is_bad").cast("int")).alias("n_bad"),
            F.min("_tstamp").alias("earliest"),
        ).collect()[0]
        n, n_bad = agg["n"] or 0, agg["n_bad"] or 0

        out_dir = cfg.output.s3.path.rstrip("/")
        if cfg.output.s3.date_format:
            out_dir = f"{out_dir}/{decorate_directory_with_time(cfg.output.s3.date_format, now)}"
        batch_dir = f"{out_dir}/batch_id={batch_id}"

        good = df.filter(~F.col("is_bad"))
        if n - n_bad > 0:
            # bounded writer fan-out: k tasks per row_type value — the
            # file-count vs compression-parallelism knob (k=1 reproduces
            # the reference's one-object-per-partition-per-flush,
            # KinesisS3Emitter.scala:72; k>1 keeps all cores compressing
            # when there are few row types)
            k = max(1, cfg.output.s3.writers_per_partition)
            routed = good.select(ROW_TYPE_COL, "value").repartition(
                F.col(ROW_TYPE_COL), F.pmod(F.crc32(F.col("value")), F.lit(k))
            )
            if cfg.output.s3.compression is Compression.GZIP:
                # the text sink emits newline-delimited gzip members
                # exactly like GZIPOutputStream framing in the reference
                (
                    routed.write.partitionBy(ROW_TYPE_COL)
                    .option("compression", "gzip")
                    .mode("append")
                    .text(batch_dir)
                )
            else:
                (
                    routed.write.partitionBy(ROW_TYPE_COL)
                    .option("compression", "zstd")
                    .mode("append")
                    .parquet(batch_dir)
                )

        if n_bad > 0 and cfg.output.bad_path:
            bad = df.filter(F.col("is_bad")).select(
                bad_row_json_col(
                    F.coalesce(F.col("value"), F.lit("")),
                    F.array(F.lit("Cannot deserialize record")),
                ).alias("value")
            )
            (
                bad.coalesce(1)
                .write.mode("append")
                .option("compression", "gzip")
                .text(f"{cfg.output.bad_path.rstrip('/')}/batch_id={batch_id}")
            )

        return BatchMeta(
            batch_id=batch_id,
            count=int(n),
            bad_count=int(n_bad),
            earliest_tstamp=agg["earliest"],
            output_path=batch_dir,
        )
    finally:
        df.unpersist()
