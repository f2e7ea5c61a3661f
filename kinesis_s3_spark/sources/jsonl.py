"""JSONL corpus source: line-delimited JSON documents with
corrupt-line capture routed through the bad-row envelope (O16).

Training corpora overwhelmingly arrive as JSONL (one document object
per line); the reference's only text format is the TSV enriched-event
stream, so this is a north-star source extension. The read is a text
scan + ``from_json`` expression — JVM-side Jackson parsing, splittable
across executors at any scale; malformed lines surface via PERMISSIVE
mode's ``columnNameOfCorruptRecord`` instead of failing the job,
mirroring the good/bad split the S3 loader applies to its own stream
(KinesisS3Emitter.scala:83-105).

Batch and streaming variants share one schema/option set so a corpus
directory can be replayed (batch backfill) or tailed (file-watch
stream) through identical semantics — the same ``readStream``-parity
rule loader.py follows for O1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_s3_spark.functions.badrows import bad_row_json_col

CORRUPT_COL = "_corrupt_record"

# documents-table shape (TESTDATA.md) as the default corpus schema
DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _with_corrupt(schema: T.StructType) -> T.StructType:
    """PERMISSIVE mode only captures corrupt lines when the corrupt
    column is part of the read schema."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_JSONL_SCHEMA,
    streaming: bool = False,
) -> DataFrame:
    """Read a JSONL file/directory with an explicit schema (never
    inferSchema — a schema inference pass is a full extra scan of 100
    TB and nondeterministic under corpus drift). Malformed lines come
    back with all data fields NULL and the raw line in _corrupt_record.
    """
    reader = spark.readStream if streaming else spark.read
    # text scan + from_json EXPRESSION rather than the JSON file
    # source: identical schema semantics, but (a) batch and streaming
    # take the exact same parse path, and (b) it sidesteps Spark's
    # QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction, so a dead-letter
    # query projecting only bad lines stays legal. Parsing is still
    # JVM-side codegen (JacksonParser per task), split by text lines.
    parsed = reader.text(path).select(
        F.from_json(
            F.col("value"),
            _with_corrupt(schema),
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("d")
    )
    return parsed.select("d.*")


def split_good_bad(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, bad): good rows drop the corrupt column; bad rows are
    wrapped in the O16 generic_error envelope with the raw line as the
    base64 payload — the same dead-letter contract the streaming
    loader applies, so JSONL corpora and Kinesis streams share one
    bad-row pipeline downstream.

    A line is bad when the parser left the raw text in _corrupt_record
    (PERMISSIVE contract: data fields NULL + raw line captured)."""
    is_bad = F.col(CORRUPT_COL).isNotNull()
    good = df.filter(~is_bad).drop(CORRUPT_COL)
    bad = df.filter(is_bad).select(
        bad_row_json_col(
            F.col(CORRUPT_COL),
            F.array(F.lit("jsonl: malformed line")),
        ).alias("bad_row")
    )
    return good, bad


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_JSONL_SCHEMA,
    streaming: bool = False,
    sep: str = ",",
    header: bool = False,
) -> DataFrame:
    """CSV twin of read_jsonl — same explicit-schema, PERMISSIVE,
    corrupt-line-capture contract, same downstream split_good_bad.
    Uses the CSV file source directly (the corrupt column is part of
    the read schema, so the dead-letter projection stays legal without
    the from_json detour; Spark's UnivocityParser fills it for
    malformed/arity-mismatched lines)."""
    reader = spark.readStream if streaming else spark.read
    return (
        reader.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("sep", sep)
        .option("header", str(header).lower())
        .csv(path)
    )
