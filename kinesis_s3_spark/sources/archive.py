"""Read back what the emitter wrote — the downstream half of the
reference's contract.

The reference's S3 objects are consumed by downstream batch jobs
(shredder / warehouse loaders reading
``s3://.../row_type=vendor.name/row_subtype=format-model/...``). A
user switching engines needs the same read path: this module turns an
emit() output tree back into a DataFrame, with the directory layout
recovered as real columns and the reference's combined RowType
partition string (``vendor.name/format-model``, RowType.scala:28)
reconstructed.

Scale: Spark's file source does the listing/partition discovery in
parallel and prunes ``batch_id``/``row_type`` predicates at the
directory level — filtering on a recovered partition column never
touches the excluded objects' bytes (the same trick the §2 inventory
uses for parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_s3_spark.sinks.emitter import NO_SUBTYPE, ROW_SUBTYPE_COL, ROW_TYPE_COL


def read_archive(
    spark: SparkSession,
    path: str,
    compression: str = "GZIP",
    raw: bool = False,
) -> DataFrame:
    """Load an emit() output tree rooted at ``path`` (the directory
    holding ``batch_id=*/`` or ``run=*/batch_id=*/`` children; with
    ``date_format`` set, point at one decorated directory — mixed
    literal/partition layouts are a Hive-layout limitation, not ours).

    ``raw=True`` reads a Purpose.RAW tree: gzip lines are the
    emitter's base64 framing and are decoded back to the exact
    payload BYTES (``value`` comes back BinaryType); parquet RAW
    trees already store the binary column verbatim.

    Returns columns:
    - ``value``      the record line (GZIP), payload bytes (raw),
                     or stored columns (parquet)
    - ``batch_id``   recovered from the directory name (long)
    - ``row_type``   the reference's combined partition string,
                     ``vendor.name/format-model`` (or ``unpartitioned``
                     / ``reading_error`` with no subtype)
    - plus ``run`` when the tree is run-namespaced.
    """
    reader = spark.read.option("basePath", path)
    if compression.upper() in ("GZIP", "GZIP_INDEXED"):
        # pathGlobFilter: a GZIP_INDEXED tree interleaves ``.index``
        # sidecars with the ``.gz`` objects — only the latter are data
        df = reader.option("pathGlobFilter", "*.gz").text(path)
        if raw:
            df = df.withColumn("value", F.unbase64("value"))
    else:
        df = reader.parquet(path)
    combined = F.when(
        F.col(ROW_SUBTYPE_COL) != NO_SUBTYPE,
        F.concat_ws("/", ROW_TYPE_COL, ROW_SUBTYPE_COL),
    ).otherwise(F.col(ROW_TYPE_COL))
    keep = [c for c in df.columns if c not in (ROW_TYPE_COL, ROW_SUBTYPE_COL)]
    return df.select(*keep, combined.alias(ROW_TYPE_COL)).withColumn(
        "batch_id", F.col("batch_id").cast("long")
    )


# generic_error envelope schema (functions/badrows.py writes exactly
# this shape; ISerializer.scala:46-74)
BAD_ROW_READ_SCHEMA = (
    "schema string, data struct<"
    "processor: struct<artifact: string, version: string>, "
    "failure: struct<timestamp: string, errors: array<string>>, "
    "payload: string>"
)


def read_bad_archive(spark: SparkSession, path: str) -> DataFrame:
    """Read a dead-letter tree (FileBadRowSink's gzip NDJSON under
    ``path/batch_id=N``) back into typed columns — the failure-path
    counterpart of read_archive, i.e. the replay/triage read an
    operator runs against the bad bucket:

    - ``batch_id``    recovered from the directory name (long)
    - ``schema_uri``  the envelope's self-describing schema key
    - ``artifact``/``version``  processor identity
    - ``failure_ts``  the failure timestamp string
    - ``errors``      array<string> of failure messages
    - ``payload``     the ORIGINAL raw record, base64-decoded

    Scale: same parallel listing/partition pruning as read_archive;
    from_json + unbase64 run inside the scan, JVM-side."""
    df = spark.read.option("basePath", path).text(path)
    parsed = df.select(
        F.col("batch_id").cast("long").alias("batch_id"),
        F.from_json("value", BAD_ROW_READ_SCHEMA).alias("r"),
    )
    return parsed.select(
        "batch_id",
        F.col("r.schema").alias("schema_uri"),
        F.col("r.data.processor.artifact").alias("artifact"),
        F.col("r.data.processor.version").alias("version"),
        F.col("r.data.failure.timestamp").alias("failure_ts"),
        F.col("r.data.failure.errors").alias("errors"),
        F.unbase64(F.col("r.data.payload")).cast("string").alias("payload"),
    )
