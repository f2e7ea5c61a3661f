"""Enriched-event shredding as an oracle-checked round-trip.

Builds a full 131-field enriched TSV line from the events table
(values at their canonical positions, everything else empty — the
FIXTURES.md F3 mapping), runs it through ``parse_enriched``, and
returns the typed columns. The oracle computes the EXPECTED values
directly from the source columns, so the gate proves
build → split → position → cast is the identity on every typed branch
(timestamps at s and ms precision, ints, doubles via shortest-repr
string round-trip, "0"/"1" booleans, JSON carried opaquely).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_s3_spark.functions.enriched import ENRICHED_FIELDS, parse_enriched
from kinesis_s3_spark.operators.registry import query
from kinesis_s3_spark.sources.tables import load_table

# field → source expression (Spark SQL string) for TSV synthesis
_FIELD_EXPRS: dict[str, str] = {
    "app_id": "event_type",
    "platform": "'web'",
    "collector_tstamp": "date_format(ts, 'yyyy-MM-dd HH:mm:ss')",
    "true_tstamp": "date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSS')",
    "txn_id": "cast(event_id as string)",
    "domain_sessionidx": "cast(user_id as string)",
    "se_value": "cast(value as string)",
    "br_features_pdf": "cast(event_id % 2 as string)",
    "dvce_ismobile": "case when user_id % 2 = 0 then '1' else '0' end",
    "contexts": "props",
    "event_fingerprint": "md5(props)",
    "event_vendor": "'com.snowplowanalytics.snowplow'",
}


def synthesize_enriched_line() -> F.Column:
    parts = [F.expr(_FIELD_EXPRS.get(name, "''")) for name in ENRICHED_FIELDS]
    return F.concat_ws("\t", *parts)


@query(
    "etl_enriched_parse",
    oracle="""
    SELECT event_type AS app_id,
           date_trunc('second', ts) AS collector_tstamp,
           date_trunc('milliseconds', ts) AS true_tstamp,
           CAST(event_id AS INT) AS txn_id,
           CAST(user_id AS INT) AS domain_sessionidx,
           value AS se_value,
           (event_id % 2 = 1) AS br_features_pdf,
           (user_id % 2 = 0) AS dvce_ismobile,
           props AS contexts,
           md5(props) AS event_fingerprint,
           'com.snowplowanalytics.snowplow' AS event_vendor,
           CAST(NULL AS VARCHAR) AS page_url
    FROM events
    """,
)
def etl_enriched_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purpose.Enriched upgraded from opaque carriage to typed
    shredding (reference only parses index 3; here all 131 positions
    get model types — SURVEY §1.2).

    Scale: one split + one projection per row, all codegen; Catalyst
    column-prunes the other 119 fields because this query selects 12.
    """
    e = load_table(spark, sf_dir, "events")
    lines = e.select(synthesize_enriched_line().alias("value"))
    parsed = parse_enriched(lines)
    return parsed.select(
        "app_id",
        "collector_tstamp",
        "true_tstamp",
        "txn_id",
        "domain_sessionidx",
        F.col("se_value").cast("double").alias("se_value"),
        "br_features_pdf",
        "dvce_ismobile",
        "contexts",
        "event_fingerprint",
        "event_vendor",
        F.col("page_url"),
    )
