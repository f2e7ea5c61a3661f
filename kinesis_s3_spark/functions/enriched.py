"""Snowplow enriched-event TSV schema and parser.

The reference carries enriched events as opaque TSV lines and only
ever parses field index 3 (collector_tstamp — Common.scala:88-96,
StatsD.scala:19); the full 131-field positional layout is fixed by the
Snowplow enriched-event format (public; mirrored in the reference test
fixture BatchSpec.scala:178-310). A Spark-first engine can do better
than opaque carriage: this module shreds the TSV into a typed
DataFrame — one split per row, columns projected by position, lazy
casts — turning the loader's sink into a queryable table.

Types follow the published enriched-event model: timestamps
(``yyyy-MM-dd HH:mm:ss[.SSS]`` UTC), ints, doubles, "0"/"1" booleans,
and three embedded JSON columns (contexts, unstruct_event,
derived_contexts) kept as strings for schema-on-read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Positional field names (the 131-field enriched TSV layout).
ENRICHED_FIELDS: tuple[str, ...] = (
    "app_id", "platform", "etl_tstamp", "collector_tstamp",
    "dvce_created_tstamp", "event", "event_id", "txn_id", "name_tracker",
    "v_tracker", "v_collector", "v_etl", "user_id", "user_ipaddress",
    "user_fingerprint", "domain_userid", "domain_sessionidx",
    "network_userid", "geo_country", "geo_region", "geo_city",
    "geo_zipcode", "geo_latitude", "geo_longitude", "geo_region_name",
    "ip_isp", "ip_organization", "ip_domain", "ip_netspeed", "page_url",
    "page_title", "page_referrer", "page_urlscheme", "page_urlhost",
    "page_urlport", "page_urlpath", "page_urlquery", "page_urlfragment",
    "refr_urlscheme", "refr_urlhost", "refr_urlport", "refr_urlpath",
    "refr_urlquery", "refr_urlfragment", "refr_medium", "refr_source",
    "refr_term", "mkt_medium", "mkt_source", "mkt_term", "mkt_content",
    "mkt_campaign", "contexts", "se_category", "se_action", "se_label",
    "se_property", "se_value", "unstruct_event", "tr_orderid",
    "tr_affiliation", "tr_total", "tr_tax", "tr_shipping", "tr_city",
    "tr_state", "tr_country", "ti_orderid", "ti_sku", "ti_name",
    "ti_category", "ti_price", "ti_quantity", "pp_xoffset_min",
    "pp_xoffset_max", "pp_yoffset_min", "pp_yoffset_max", "useragent",
    "br_name", "br_family", "br_version", "br_type", "br_renderengine",
    "br_lang", "br_features_pdf", "br_features_flash",
    "br_features_java", "br_features_director", "br_features_quicktime",
    "br_features_realplayer", "br_features_windowsmedia",
    "br_features_gears", "br_features_silverlight", "br_cookies",
    "br_colordepth", "br_viewwidth", "br_viewheight", "os_name",
    "os_family", "os_manufacturer", "os_timezone", "dvce_type",
    "dvce_ismobile", "dvce_screenwidth", "dvce_screenheight",
    "doc_charset", "doc_width", "doc_height", "tr_currency",
    "tr_total_base", "tr_tax_base", "tr_shipping_base", "ti_currency",
    "ti_price_base", "base_currency", "geo_timezone", "mkt_clickid",
    "mkt_network", "etl_tags", "dvce_sent_tstamp", "refr_domain_userid",
    "refr_dvce_tstamp", "derived_contexts", "domain_sessionid",
    "derived_tstamp", "event_vendor", "event_name", "event_format",
    "event_version", "event_fingerprint", "true_tstamp",
)

COLLECTOR_TSTAMP_IDX = ENRICHED_FIELDS.index("collector_tstamp")  # == 3

TIMESTAMP_FIELDS = frozenset(f for f in ENRICHED_FIELDS if f.endswith("_tstamp"))
INT_FIELDS = frozenset(
    {
        "txn_id", "domain_sessionidx", "page_urlport", "refr_urlport",
        "ti_quantity", "pp_xoffset_min", "pp_xoffset_max",
        "pp_yoffset_min", "pp_yoffset_max", "br_viewwidth",
        "br_viewheight", "dvce_screenwidth", "dvce_screenheight",
        "doc_width", "doc_height",
    }
)
DOUBLE_FIELDS = frozenset(
    {
        "geo_latitude", "geo_longitude", "se_value", "tr_total", "tr_tax",
        "tr_shipping", "ti_price", "tr_total_base", "tr_tax_base",
        "tr_shipping_base", "ti_price_base",
    }
)
BOOL_FIELDS = frozenset(f for f in ENRICHED_FIELDS if f.startswith("br_features_")) | {
    "br_cookies", "dvce_ismobile",
}
JSON_FIELDS = frozenset({"contexts", "unstruct_event", "derived_contexts"})


def _typed(name: str, raw: Column) -> Column:
    """Cast one raw TSV field to its model type; empty string → NULL
    (the TSV encodes absent as empty), unparseable → NULL (try_ casts
    — the reference's Either.Left degrades the same way)."""
    v = F.when(raw == "", F.lit(None)).otherwise(raw)
    if name in TIMESTAMP_FIELDS:
        # seconds or milliseconds variants both appear (fixture
        # BatchSpec.scala:181-183); try the longer pattern first
        return F.coalesce(
            F.try_to_timestamp(v, F.lit("yyyy-MM-dd HH:mm:ss.SSS")),
            F.try_to_timestamp(v, F.lit("yyyy-MM-dd HH:mm:ss")),
        ).alias(name)
    if name in INT_FIELDS:
        return v.try_cast("int").alias(name)
    if name in DOUBLE_FIELDS:
        return v.try_cast("double").alias(name)
    if name in BOOL_FIELDS:
        return (
            F.when(v == "1", F.lit(True)).when(v == "0", F.lit(False)).otherwise(F.lit(None))
        ).alias(name)
    return v.alias(name)  # strings + JSON columns (schema-on-read)


def parse_enriched(df: DataFrame, value_col: str = "value") -> DataFrame:
    """TSV line column → fully typed 131-column DataFrame.

    One split per row (materialized via withColumn so the array is
    computed once — see ngrams_from_tokens note on lambda CSE), then a
    single projection; Catalyst prunes unused columns upstream when
    callers select a subset, so "parse everything" costs only what is
    actually read."""
    arr = df.withColumn("_f", F.split(F.col(value_col), "\t", -1))
    cols = [_typed(name, F.get(F.col("_f"), i)) for i, name in enumerate(ENRICHED_FIELDS)]
    return arr.select(*cols)
