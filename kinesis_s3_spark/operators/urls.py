"""URL decomposition + bad-row recovery.

The enriched-event model carries pre-shredded URL components
(page_urlscheme/host/port/path/query/fragment — functions/enriched.py);
this module provides the shredding itself for raw URLs, with a
portable regex grammar (RFC-3986 shaped) evaluated identically by
Spark (Java regex) and DuckDB (RE2). Bad-row recovery closes the O16
loop: the dead-letter envelope's base64 payload decodes back to the
original record, so a replay job is a plain query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_s3_spark.operators.registry import query
from kinesis_s3_spark.sources.tables import load_table

_URL_RE = r"^([a-z]+)://([^/:?#]+)(?::([0-9]+))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"


@query(
    "fn_url_suite",
    oracle=f"""
    WITH u AS (
      SELECT event_id,
             concat('https://shop', CAST(user_id % 5 AS VARCHAR),
                    '.example.com:', CAST(8000 + user_id % 3 AS VARCHAR),
                    '/product/', event_type, '?id=', CAST(event_id AS VARCHAR),
                    '&ref=mail#sec', CAST(event_id % 4 AS VARCHAR)) AS url
      FROM events
    )
    SELECT event_id,
           regexp_extract(url, '{_URL_RE}', 1) AS scheme,
           regexp_extract(url, '{_URL_RE}', 2) AS host,
           CAST(regexp_extract(url, '{_URL_RE}', 3) AS INT) AS port,
           regexp_extract(url, '{_URL_RE}', 4) AS path,
           regexp_extract(url, '{_URL_RE}', 5) AS query,
           regexp_extract(url, '{_URL_RE}', 6) AS fragment,
           regexp_extract(url, 'id=([0-9]+)', 1) AS id_param
    FROM u
    """,
)
def fn_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL → scheme/host/port/path/query/fragment + a query param
    (the page_url* shredding of the enriched model, as an operator)."""
    e = load_table(spark, sf_dir, "events")
    url = F.concat(
        F.lit("https://shop"),
        (F.col("user_id") % 5).cast("string"),
        F.lit(".example.com:"),
        (8000 + F.col("user_id") % 3).cast("string"),
        F.lit("/product/"),
        F.col("event_type"),
        F.lit("?id="),
        F.col("event_id").cast("string"),
        F.lit("&ref=mail#sec"),
        (F.col("event_id") % 4).cast("string"),
    )
    u = e.select("event_id", url.alias("url"))
    return u.select(
        "event_id",
        F.regexp_extract("url", _URL_RE, 1).alias("scheme"),
        F.regexp_extract("url", _URL_RE, 2).alias("host"),
        F.regexp_extract("url", _URL_RE, 3).cast("int").alias("port"),
        F.regexp_extract("url", _URL_RE, 4).alias("path"),
        F.regexp_extract("url", _URL_RE, 5).alias("query"),
        F.regexp_extract("url", _URL_RE, 6).alias("fragment"),
        F.regexp_extract("url", r"id=([0-9]+)", 1).alias("id_param"),
    )


@query(
    "etl_bad_row_roundtrip",
    oracle="""
    WITH bad AS (
      SELECT event_id,
             concat(
               '{"schema":"iglu:com.snowplowanalytics.snowplow.badrows/generic_error/jsonschema/1-0-0",',
               '"data":{"failure":{"timestamp":"2026-01-01T00:00:00Z",',
               '"errors":["Cannot deserialize record"]},',
               '"payload":"', to_base64(encode(props)), '"}}'
             ) AS bad_row,
             props AS original
      FROM events WHERE event_type = 'error'
    )
    SELECT event_id,
           decode(from_base64(json_extract_string(bad_row, '$.data.payload')))
             AS recovered,
           (decode(from_base64(json_extract_string(bad_row, '$.data.payload')))
             = original) AS matches
    FROM bad
    """,
)
def etl_bad_row_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O16 closed loop: dead-lettered envelope → JSON-extract the
    base64 payload → decode → byte-identical original record. This is
    the replay query an operator runs against the bad bucket
    (ISerializer.scala:66 RawPayload recovery)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    bad = e.select(
        "event_id",
        F.concat(
            F.lit(
                '{"schema":"iglu:com.snowplowanalytics.snowplow.badrows/generic_error/jsonschema/1-0-0",'
                '"data":{"failure":{"timestamp":"2026-01-01T00:00:00Z",'
                '"errors":["Cannot deserialize record"]},'
                '"payload":"'
            ),
            F.base64(F.col("props").cast("binary")),
            F.lit('"}}'),
        ).alias("bad_row"),
        F.col("props").alias("original"),
    )
    recovered = F.unbase64(F.get_json_object("bad_row", "$.data.payload")).cast("string")
    return bad.select(
        "event_id",
        recovered.alias("recovered"),
        (recovered == F.col("original")).alias("matches"),
    )
