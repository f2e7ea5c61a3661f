"""Binary-column ingestion (VERDICT r4 'what's missing' #3): the edge
between stored bytes and the multimodal decode operators.

Two real ingestion paths, both distributed:

* loose binary FILES via ``spark.read.format("binaryFile")`` — the
  layout a crawled image/audio corpus actually arrives in (one object
  per asset on S3/HDFS). Fixtures are written task-parallel by
  ``foreachPartition`` (each task encodes and writes its own rows'
  files); at 100 TB the same code targets shared storage and the
  binaryFile scan parallelizes over files with pathGlobFilter pruning
  non-assets.
* a BINARY PARQUET COLUMN — the layout a curated multimodal dataset
  ships in (bytes inline next to metadata). The fixture parquet is
  written by Spark itself (mapInPandas encode → ``.write.parquet``),
  so the write is distributed and splittable like any other table.

Fixture bytes are deterministic per doc_id (codecs.synth_pixels /
synth_samples), which is what lets the decode-from-storage operators
keep arithmetic DuckDB oracles: the oracle predicts what a correct
encode→store→scan→decode round-trip must produce without ever seeing
the files. Fixture directories are keyed by Spark applicationId (the
etl_bad_row_archive concurrency lesson) and written once per session
behind a marker file.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_s3_spark.sources.tables import load_table

FIXTURE_MARKER = "_FIXTURES_OK"


def fixture_dir(spark: SparkSession, sf_dir: str, kind: str) -> str:
    """Per-session, per-sf, per-kind fixture root under the system tmp
    dir — concurrent sessions (gate + bench) never share a path."""
    return os.path.join(
        tempfile.gettempdir(),
        "kinesis_s3_spark_binfix",
        spark.sparkContext.applicationId,
        os.path.basename(sf_dir.rstrip("/")),
        kind,
    )


def write_image_fixture_files(spark: SparkSession, sf_dir: str) -> str:
    """One deterministic .bmp per document row, written task-parallel
    (foreachPartition: each task encodes its partition's doc_ids and
    writes `doc_<id>.bmp`). Returns the directory; idempotent within a
    session via a count-carrying marker file."""
    out = fixture_dir(spark, sf_dir, "bmp")
    marker = os.path.join(out, FIXTURE_MARKER)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    expected = docs.count()
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == str(expected):
                return out
    os.makedirs(out, exist_ok=True)

    def _write_partition(rows) -> None:
        # import inside the task: executors deserialize this closure
        # without the driver's module state
        from kinesis_s3_spark.multimodal.codecs import encode_bmp, synth_pixels

        for row in rows:
            doc_id = int(row["doc_id"])
            path = os.path.join(out, f"doc_{doc_id:08d}.bmp")
            with open(path, "wb") as fh:
                fh.write(encode_bmp(synth_pixels(doc_id)))

    docs.foreachPartition(_write_partition)
    with open(marker, "w") as fh:
        fh.write(str(expected))
    return out


def write_audio_fixture_parquet(spark: SparkSession, sf_dir: str) -> str:
    """A parquet table (doc_id bigint, content binary) holding one
    deterministic WAV clip per document — written BY Spark (mapInPandas
    encode → write.parquet), so the binary column arrives through the
    same distributed writer any production multimodal table would."""
    out = fixture_dir(spark, sf_dir, "wav_parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out

    def _encode_batches(batches):
        import pandas as pd

        from kinesis_s3_spark.multimodal.codecs import encode_wav, synth_samples

        for pdf in batches:
            ids = [int(d) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "content": [encode_wav(*synth_samples(d)) for d in ids],
                }
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    docs.mapInPandas(_encode_batches, schema="doc_id bigint, content binary").write.mode(
        "overwrite"
    ).parquet(out)
    return out


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """binaryFile scan: (path, modificationTime, length, content) —
    one row per object, scan parallelism = file count, pathGlobFilter
    pushed into file listing so markers/sidecars are never read."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def with_doc_id_from_filename(df: DataFrame, pattern: str = r"doc_(\d+)\.[a-z0-9]+$") -> DataFrame:
    """Recover the document key from the object name — the join edge
    between a loose-file corpus and its metadata table."""
    return df.withColumn(
        "doc_id", F.regexp_extract(F.col("path"), pattern, 1).cast("bigint")
    )


def le_uint32(col: F.Column, offset: int) -> F.Column:
    """Little-endian uint32 read from a binary column at 1-based byte
    ``offset``, entirely JVM-side: slice 4 bytes, hex them (big-endian
    pair order), swap the pairs, parse base-16. No Python UDF."""
    h = F.hex(F.substring(col, offset, 4))
    swapped = F.concat(
        F.substring(h, 7, 2), F.substring(h, 5, 2), F.substring(h, 3, 2), F.substring(h, 1, 2)
    )
    return F.conv(swapped, 16, 10).cast("bigint")
