from kinesis_s3_spark.streaming.loader import build_stream, run_loader
from kinesis_s3_spark.streaming.monitoring import LoaderListener, StatsDClient

__all__ = ["build_stream", "run_loader", "LoaderListener", "StatsDClient"]
