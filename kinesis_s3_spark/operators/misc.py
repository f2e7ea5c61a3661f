"""Inventory stragglers: bag semantics set ops, argmin/argmax
aggregates, regexp function family."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_s3_spark.operators.registry import query
from kinesis_s3_spark.sources.tables import load_table


@query(
    "setop_intersect_all",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F'
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag (multiplicity-preserving) intersection."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    b = li.filter(F.col("l_linestatus") == "F").select("l_suppkey")
    return a.intersectAll(b)


@query(
    "agg_argminmax",
    oracle="""
    SELECT o_orderpriority,
           MAX(struct_pack(p := o_totalprice, k := o_orderkey)).k AS priciest_order,
           MIN(struct_pack(p := o_totalprice, k := o_orderkey)).k AS cheapest_order,
           MAX(o_totalprice) AS max_price,
           MIN(o_totalprice) AS min_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax/argmin via struct max/min: both engines order structs
    lexicographically (price first, then orderkey), so ties on price
    deterministically resolve to the largest (argmax) / smallest
    (argmin) orderkey — unlike max_by/min_by, which pick an arbitrary
    row on ties."""
    o = load_table(spark, sf_dir, "orders")
    pk = F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    return o.groupBy("o_orderpriority").agg(
        F.max(pk)["k"].alias("priciest_order"),
        F.min(pk)["k"].alias("cheapest_order"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@query(
    "fn_regex_suite",
    oracle="""
    SELECT doc_id,
           CASE WHEN regexp_matches(text, '(spark|flink)') THEN 1 ELSE 0 END AS mentions_engine,
           regexp_replace(text, '[0-9]+', '#', 'g') AS masked,
           regexp_extract(text, '([a-z]+) (join|merge)', 1) AS word_before_join,
           len(regexp_extract_all(text, '[a-z]+ scan')) AS scan_bigrams
    FROM documents
    """,
)
def fn_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family: match test, global replace, group extract,
    extract-all count — same pattern grammar both engines (keep to the
    RE2-safe subset: no backrefs, no lookaround)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(F.col("text").rlike("(spark|flink)"), 1).otherwise(0).alias("mentions_engine"),
        F.regexp_replace("text", "[0-9]+", "#").alias("masked"),
        F.regexp_extract("text", "([a-z]+) (join|merge)", 1).alias("word_before_join"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+ scan"), 0)).alias("scan_bigrams"),
    )


@query(
    "agg_mode_per_user",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           MAX(struct_pack(n := n, t := event_type)).t AS modal_type,
           MAX(struct_pack(n := n, t := event_type)).n AS n_modal
    FROM c GROUP BY user_id
    """,
)
def agg_mode_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group, with a deterministic
    tie-break: count first, then the lexicographically largest value —
    encoded as struct-max so both engines resolve ties identically
    (DuckDB's native mode() picks an arbitrary value on ties, like
    max_by; see agg_argminmax for the same pattern).

    Two map-side-combinable aggregations on uniform keys
    ((user, type) then user) — no Expand, no window, scales as two
    shrinking shuffles."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    nt = F.struct(F.col("n"), F.col("event_type").alias("t"))
    return c.groupBy("user_id").agg(
        F.max(nt)["t"].alias("modal_type"),
        F.max(nt)["n"].alias("n_modal"),
    )


@query(
    "agg_listagg",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / string_agg with a DETERMINISTIC element order:
    collect_list is partition-order-dependent, so the list is sorted
    before joining — the only portable way to make string aggregation
    reproducible across engines and run-to-run on a cluster."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n_nations"),
        )
    )
