from kinesis_s3_spark.plans.inspect import (
    assert_no_cartesian,
    explain_str,
    pushed_filters,
    scan_columns,
    uses_broadcast,
)

__all__ = [
    "assert_no_cartesian",
    "explain_str",
    "pushed_filters",
    "scan_columns",
    "uses_broadcast",
]
