from kinesis_s3_spark.functions.schema_key import (
    row_type_col,
    schema_key_parts,
)
from kinesis_s3_spark.functions.timestamps import collector_tstamp_col
from kinesis_s3_spark.functions.paths import (
    base_filename,
    decorate_directory_with_time,
)
from kinesis_s3_spark.functions.badrows import bad_row_json_col

__all__ = [
    "row_type_col",
    "schema_key_parts",
    "collector_tstamp_col",
    "base_filename",
    "decorate_directory_with_time",
    "bad_row_json_col",
]
