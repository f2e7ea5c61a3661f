from kinesis_s3_spark.operators.registry import ORACLES, QUERIES, query

__all__ = ["ORACLES", "QUERIES", "query"]
