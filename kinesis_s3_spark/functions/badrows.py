"""Bad-row envelope (reference O16).

Failed records are wrapped as a Snowplow generic_error bad row: a
self-describing JSON with processor identity, failure timestamp +
messages, and the base64 of the raw payload
(serializers/ISerializer.scala:46-74, emitted as compact JSON at
KinesisS3Emitter.scala:100-105).

Expressed as a single column expression (to_json over a struct) so
dead-letter wrapping stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BAD_ROW_SCHEMA_URI = (
    "iglu:com.snowplowanalytics.snowplow.badrows/generic_error/jsonschema/1-0-0"
)
PROCESSOR_ARTIFACT = "kinesis-s3-spark"
PROCESSOR_VERSION = "0.1.0"


def bad_row_json_col(
    payload: Column,
    errors: Column,
    timestamp: Column | None = None,
) -> Column:
    """Build the bad-row JSON string.

    ``payload`` is the raw record (string or binary — base64-encoded
    into the envelope, mirroring RawPayload at ISerializer.scala:66),
    ``errors`` an array<string> of failure messages, ``timestamp``
    defaults to processing time (pass a literal for deterministic
    tests).
    """
    if timestamp is None:
        timestamp = F.current_timestamp()
    data = F.struct(
        F.struct(
            F.lit(PROCESSOR_ARTIFACT).alias("artifact"),
            F.lit(PROCESSOR_VERSION).alias("version"),
        ).alias("processor"),
        F.struct(
            F.date_format(timestamp, "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("timestamp"),
            errors.alias("errors"),
        ).alias("failure"),
        F.base64(payload.cast("binary")).alias("payload"),
    )
    return F.to_json(
        F.struct(F.lit(BAD_ROW_SCHEMA_URI).alias("schema"), data.alias("data"))
    )
