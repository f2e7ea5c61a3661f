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

# field → source expression (Spark SQL string) for TSV synthesis;
# together these exercise every typed branch of the parser: timestamps
# at s and ms precision, ints, doubles, "0"/"1" booleans, strings, and
# the three opaque JSON columns (one of which the query then extracts
# from — the schema-on-read contract)
_FIELD_EXPRS: dict[str, str] = {
    "app_id": "event_type",
    "platform": "'web'",
    "etl_tstamp": "date_format(ts, 'yyyy-MM-dd HH:mm:ss')",
    "collector_tstamp": "date_format(ts, 'yyyy-MM-dd HH:mm:ss')",
    "dvce_created_tstamp": "date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSS')",
    "true_tstamp": "date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSS')",
    "txn_id": "cast(event_id as string)",
    "domain_sessionidx": "cast(user_id as string)",
    "ti_quantity": "cast(event_id % 10 as string)",
    "br_viewwidth": "cast(1024 + user_id % 512 as string)",
    "page_urlport": "'8080'",
    "doc_width": "cast(user_id % 1920 as string)",
    "se_value": "cast(value as string)",
    "geo_latitude": "cast(value as string)",
    # 0 - value (not unary minus) so value == 0.0 yields +0.0 on BOTH
    # engines: the oracle mirrors the same expression shape — unary
    # negation of +0.0 is IEEE -0.0 and the bit-exact compare catches
    # the sign (6 rows at sf0.1 where value == 0.0)
    "geo_longitude": "cast(0 - value as string)",
    "tr_total": "cast(user_id * 1.5 as string)",
    "br_features_pdf": "cast(event_id % 2 as string)",
    "br_features_java": "case when event_id % 3 = 0 then '1' else '0' end",
    "br_cookies": "'1'",
    "dvce_ismobile": "case when user_id % 2 = 0 then '1' else '0' end",
    "geo_country": "case when user_id % 3 = 0 then 'US' when user_id % 3 = 1 then 'DE' else 'FR' end",
    "page_urlhost": "concat('shop-', cast(user_id % 5 as string), '.example.com')",
    "v_etl": "'spark-0.1.0'",
    "event_name": "event_type",
    "contexts": "props",
    "unstruct_event": "props",
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
           'web' AS platform,
           date_trunc('second', ts) AS etl_tstamp,
           date_trunc('second', ts) AS collector_tstamp,
           date_trunc('milliseconds', ts) AS dvce_created_tstamp,
           date_trunc('milliseconds', ts) AS true_tstamp,
           CAST(event_id AS INT) AS txn_id,
           CAST(user_id AS INT) AS domain_sessionidx,
           CAST(event_id % 10 AS INT) AS ti_quantity,
           CAST(1024 + user_id % 512 AS INT) AS br_viewwidth,
           8080 AS page_urlport,
           CAST(user_id % 1920 AS INT) AS doc_width,
           value AS se_value,
           value AS geo_latitude,
           0 - value AS geo_longitude,
           CAST(user_id AS DOUBLE) * 1.5 AS tr_total,
           (event_id % 2 = 1) AS br_features_pdf,
           (event_id % 3 = 0) AS br_features_java,
           TRUE AS br_cookies,
           (user_id % 2 = 0) AS dvce_ismobile,
           CASE WHEN user_id % 3 = 0 THEN 'US' WHEN user_id % 3 = 1 THEN 'DE' ELSE 'FR' END
             AS geo_country,
           concat('shop-', CAST(user_id % 5 AS VARCHAR), '.example.com') AS page_urlhost,
           'spark-0.1.0' AS v_etl,
           event_type AS event_name,
           props AS contexts,
           CAST(json_extract_string(props, '$.k') AS INT) AS ctx_k,
           md5(props) AS event_fingerprint,
           'com.snowplowanalytics.snowplow' AS event_vendor,
           CAST(NULL AS VARCHAR) AS page_url
    FROM events
    """,
)
def etl_enriched_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purpose.Enriched upgraded from opaque carriage to typed
    shredding (reference only parses index 3; here all 131 positions
    get model types — SURVEY §1.2). The gate value-checks 29 columns
    across every typed branch — timestamps at both precisions, ints,
    doubles, booleans, strings, an absent field (NULL), and a JSON
    extraction out of the carried ``contexts`` column (``ctx_k``), the
    schema-on-read contract downstream queries rely on.

    Scale: one split + one projection per row, all codegen; Catalyst
    column-prunes the other ~100 fields because this query selects 29.
    """
    e = load_table(spark, sf_dir, "events")
    lines = e.select(synthesize_enriched_line().alias("value"))
    parsed = parse_enriched(lines)
    return parsed.select(
        "app_id",
        "platform",
        "etl_tstamp",
        "collector_tstamp",
        "dvce_created_tstamp",
        "true_tstamp",
        "txn_id",
        "domain_sessionidx",
        "ti_quantity",
        "br_viewwidth",
        "page_urlport",
        "doc_width",
        "se_value",
        "geo_latitude",
        "geo_longitude",
        "tr_total",
        "br_features_pdf",
        "br_features_java",
        "br_cookies",
        "dvce_ismobile",
        "geo_country",
        "page_urlhost",
        "v_etl",
        "event_name",
        "contexts",
        F.get_json_object("contexts", "$.k").cast("int").alias("ctx_k"),
        "event_fingerprint",
        "event_vendor",
        "page_url",
    )
