"""Pivot/unpivot reshaping and approximate aggregates.

Approximate ops (HyperLogLog++ count-distinct, t-digest percentiles)
are the bounded-memory path for streaming and monster groups; their
results are ALGORITHM-specific, so they carry no DuckDB oracle (the
driver records the weaker rows-only check) — instead
tests/test_approx.py asserts relative error against the exact
operators, which IS the meaningful contract for a sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_s3_spark.operators.registry import query
from kinesis_s3_spark.sources.tables import load_table


@query(
    "reshape_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS F,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS O,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def reshape_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot: status values become columns. The explicit value list
    keeps it one pass (no extra distinct-values job) — the required
    form at scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@query(
    "reshape_unpivot",
    oracle="""
    SELECT c_custkey, metric, CAST(val AS DOUBLE) AS val
    FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val FROM customer
    )
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt: wide → long without a shuffle (Expand node)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")


@query("approx_distinct_users")
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct actives per event_type (rsd 1%) — the bounded-
    state twin of events_hourly_active's exact countDistinct. No SQL
    oracle (sketch results are engine-specific); accuracy contract in
    tests/test_approx.py."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count("*").alias("n_events"),
    )


@query("approx_percentile_price")
def approx_percentile_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (bounded-memory quantiles) — the huge-group /
    streaming twin of agg_percentiles. Accuracy asserted in tests."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_median"),
        F.percentile_approx("o_totalprice", 0.9, 10000).alias("approx_p90"),
    )
