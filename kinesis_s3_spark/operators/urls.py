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


# --- URL canonicalization dedup ----------------------------------------------
#
# The crawl-frontier / web-corpus dedup step that runs BEFORE content
# hashing: the same page arrives as https://Shop1.example.com:443/p?b=2&a=1&utm_source=mail#frag
# and https://shop1.example.com/p?a=1&b=2 — byte-distinct, content-
# identical. Canonical form: lowercase host, default port dropped,
# tracking params (utm_*, fbclid, gclid) stripped, remaining query
# params SORTED, fragment dropped (RFC 3986 §6 normalization + the
# conventional tracking-param blocklist). Everything is in-scan string
# work (regex shred → list filter/sort/join) on both engines; the
# dedup itself is one groupBy on the canonical string.

_DROP_PARAMS = ("utm_", "fbclid", "gclid")


@query(
    "curation_url_dedup",
    oracle=f"""
    WITH u AS (
      SELECT event_id,
             concat(
               'https://',
               CASE WHEN event_id % 2 = 0 THEN 'Shop' ELSE 'shop' END,
               CAST(user_id % 5 AS VARCHAR), '.Example.com',
               CASE WHEN event_id % 3 = 0 THEN ':443' ELSE '' END,
               '/product/', event_type,
               CASE WHEN event_id % 2 = 0
                    THEN concat('?a=', CAST(user_id % 7 AS VARCHAR),
                                '&utm_source=mail&b=2')
                    ELSE concat('?b=2&utm_campaign=x&a=',
                                CAST(user_id % 7 AS VARCHAR)) END,
               CASE WHEN event_id % 4 = 0 THEN '#frag' ELSE '' END
             ) AS url
      FROM events
    ),
    parts AS (
      SELECT event_id, url,
             regexp_extract(url, '{_URL_RE}', 1) AS scheme,
             lower(regexp_extract(url, '{_URL_RE}', 2)) AS host,
             regexp_extract(url, '{_URL_RE}', 3) AS port,
             regexp_extract(url, '{_URL_RE}', 4) AS path,
             regexp_extract(url, '{_URL_RE}', 5) AS query
      FROM u
    ),
    canon AS (
      SELECT event_id, url,
             concat(
               scheme, '://', host,
               CASE WHEN port <> '' AND NOT (scheme = 'https' AND port = '443')
                    THEN concat(':', port) ELSE '' END,
               path,
               CASE WHEN kept <> '' THEN concat('?', kept) ELSE '' END
             ) AS canonical_url
      FROM (
        SELECT *,
               array_to_string(list_sort(list_filter(string_split(query, '&'),
                 p -> NOT (starts_with(p, 'utm_') OR starts_with(p, 'fbclid')
                           OR starts_with(p, 'gclid')))), '&') AS kept
        FROM parts
      )
    )
    SELECT canonical_url,
           COUNT(*) AS n_hits,
           COUNT(DISTINCT url) AS n_raw_variants,
           MIN(event_id) AS keep_event_id
    FROM canon GROUP BY canonical_url
    """,
)
def curation_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup over a synthetic noisy URL stream (case-
    varied hosts, sometimes-explicit default ports, shuffled +
    tracking-polluted query strings, stray fragments — all derived
    deterministically from events so both engines build the identical
    input).

    Plan: shred + canonicalize entirely in-scan (regex extract,
    higher-order filter/sort on the split query — codegen, zero
    Python), then ONE groupBy on the canonical string (uniform hash
    key). At 100 TB this is the same linear shape as dedup_exact; the
    canonical key is what a crawl frontier would partition on."""
    e = load_table(spark, sf_dir, "events")
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("event_id") % 2 == 0, F.lit("Shop")).otherwise(F.lit("shop")),
        (F.col("user_id") % 5).cast("string"),
        F.lit(".Example.com"),
        F.when(F.col("event_id") % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/product/"),
        F.col("event_type"),
        F.when(
            F.col("event_id") % 2 == 0,
            F.concat(
                F.lit("?a="), (F.col("user_id") % 7).cast("string"),
                F.lit("&utm_source=mail&b=2"),
            ),
        ).otherwise(
            F.concat(
                F.lit("?b=2&utm_campaign=x&a="), (F.col("user_id") % 7).cast("string")
            )
        ),
        F.when(F.col("event_id") % 4 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    u = e.select("event_id", url.alias("url"))
    scheme = F.regexp_extract("url", _URL_RE, 1)
    host = F.lower(F.regexp_extract("url", _URL_RE, 2))
    port = F.regexp_extract("url", _URL_RE, 3)
    path = F.regexp_extract("url", _URL_RE, 4)
    qstr = F.regexp_extract("url", _URL_RE, 5)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(qstr, "&"),
                lambda p: ~(
                    p.startswith("utm_")
                    | p.startswith("fbclid")
                    | p.startswith("gclid")
                ),
            )
        ),
        "&",
    )
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(
            (port != "") & ~((scheme == "https") & (port == "443")),
            F.concat(F.lit(":"), port),
        ).otherwise(F.lit("")),
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )
    return (
        u.select("event_id", "url", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_hits"),
            F.countDistinct("url").cast("long").alias("n_raw_variants"),
            F.min("event_id").alias("keep_event_id"),
        )
    )
