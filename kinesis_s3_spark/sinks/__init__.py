from kinesis_s3_spark.sinks.emitter import BatchMeta, emit

__all__ = ["BatchMeta", "emit"]
