"""Multimodal-column operators: binary payload metadata, stub decode
through mapInPandas, frame sampling.

The binary column is synthesized in-query (UTF-8 bytes of documents
text) because the driver tables are text-only; the plumbing — binary
type, Arrow batching, metadata struct schema — is the real thing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_s3_spark.multimodal.codecs import IMAGE_META_SCHEMA, decode_image_batches
from kinesis_s3_spark.operators.registry import query
from kinesis_s3_spark.sources.tables import load_table


@query(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    """,
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column — length + content
    hash, all JVM-side (the dedup key for multimodal payloads)."""
    docs = load_table(spark, sf_dir, "documents")
    content = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.length(content).cast("int").alias("n_bytes"),
        F.sha2(content, 256).alias("sha256"),
    )


@query(
    "mm_image_decode_stub",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           sha256(text) AS sha256,
           'bin' AS magic,
           CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
           CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INT) AS height,
           3 AS channels
    FROM documents
    """,
)
def mm_image_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode operator: binary column → metadata struct via
    Arrow-batched mapInPandas (the real 100 TB plumbing; pixel decode
    itself is the documented stub — multimodal/codecs.py).

    Scale: mapInPandas streams Arrow batches executor-side; decode
    parallelism = scan partitions; no driver involvement. The oracle
    reproduces the deterministic fake decode in SQL, verifying batch
    shape, schema and per-row alignment."""
    docs = load_table(spark, sf_dir, "documents")
    binary = docs.select("doc_id", F.col("text").cast("binary").alias("content"))
    return binary.mapInPandas(decode_image_batches, schema=IMAGE_META_SCHEMA)


@query(
    "mm_frame_offsets",
    oracle="""
    SELECT doc_id, CAST(f AS INT) AS frame_idx, CAST(f * 100 AS INT) AS byte_offset
    FROM (
      SELECT doc_id, unnest(range(0, octet_length(encode(text)) // 100 + 1)) AS f
      FROM documents
    )
    """,
)
def mm_frame_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for audio/video payloads: one row per fixed-size
    frame window (every 100 bytes) — the explode pattern a real
    frame-extract UDF would feed. Pure sequence arithmetic, so the
    oracle checks the explode exactly."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.length(F.col("text").cast("binary"))
    frames = F.sequence(F.lit(0), (n / 100).cast("int"))
    return docs.select(
        "doc_id", F.explode(frames).alias("f")
    ).select(
        "doc_id",
        F.col("f").cast("int").alias("frame_idx"),
        (F.col("f") * 100).cast("int").alias("byte_offset"),
    )
