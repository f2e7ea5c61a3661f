"""kinesis_s3_spark — a PySpark-native analytics engine with the
capabilities of snowplow/kinesis-s3 (reference: /root/reference).

The reference (Snowplow S3 Loader 2.0.0, Scala) is a streaming ETL sink:
Kinesis records → buffer → partition-by-schema → compressed S3 objects,
with a bad-row dead letter stream and StatsD/Snowplow/Sentry monitoring.

This package re-expresses that dataflow Spark-first (Structured
Streaming + DataFrame API, Catalyst optimizes the plan), and extends it
with the full relational query surface (joins, windows, aggregations,
set ops) plus LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Layout:
    config        — loader config (mirrors reference Config.scala:42)
    session       — SparkSession factory with scale-tuned defaults
    functions/    — scalar column functions (schema key, tstamps, paths,
                    bad rows, text analysis, vector similarity)
    operators/    — composable DataFrame operators (partition-by-type,
                    batch meta, dedup family, ANN, relational queries)
    sources/      — table loaders + stream source abstraction
    sinks/        — the emit() micro-batch sink (serialize + partition)
    streaming/    — readStream→foreachBatch loader + monitoring listeners
    multimodal/   — binary-column plumbing with real BMP/WAV/MV01 codecs
"""

__version__ = "0.1.0"
