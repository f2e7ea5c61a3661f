"""Additional TPC-H-shaped query patterns (Q4/Q10/Q12/Q14/Q19
adapted to the driver schema) and advanced window frames.

These widen the relational inventory with the plan shapes that stress
different Catalyst strategies: correlated EXISTS → semi join,
selective fact join + top-k, conditional aggregation over a join,
single-row global ratios from decimal sums, multi-predicate OR joins,
and RANGE window frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_s3_spark.operators.registry import query
from kinesis_s3_spark.operators._decimal import DEC, DSUM, dsum
from kinesis_s3_spark.sources.tables import load_table


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_cnt
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with an inequality on both
    tables' columns → Catalyst plans a left-semi join on orderkey with
    the date predicate as join condition (no row multiplication)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    slow = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return slow.groupBy("o_orderpriority").agg(F.count("*").alias("order_cnt"))


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue,
           n_name AS nation
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, top-20 customers."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_cnt,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_cnt
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts over a fact-fact join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_cnt"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_cnt"),
        )
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT ROUND(
             100.0 * {DSUM("CASE WHEN p_type = 'ECONOMY' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
             / {DSUM('l_extendedprice * (1 - l_discount)')}, 6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: single-row global ratio from two conditional
    sums (decimal-exact numerator and denominator, one division)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0.0))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0 * F.sum(promo.cast(DEC)).cast("double")
                / F.sum(rev.cast(DEC)).cast("double"),
                6,
            ).alias("promo_pct")
        )
    )


@query(
    "q19_disjunctive_join",
    oracle=f"""
    SELECT {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS match_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10)
       OR (p_type = 'SMALL' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20)
    """,
)
def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: equi-join + a 3-way disjunction of range
    predicates. Catalyst keeps the equi-join hashable and evaluates
    the OR as a post-join filter (common factor extraction)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 10))
        | ((F.col("p_type") == "SMALL") & F.col("p_size").between(20, 50) & (F.col("l_quantity") >= 20))
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("match_cnt"),
        )
    )


@query(
    "window_distribution",
    oracle="""
    SELECT o_orderkey,
           ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice), 6)
             AS pct_rank,
           ROUND(CUME_DIST() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice), 6)
             AS cume,
           NTH_VALUE(o_orderkey, 3) OVER (
             PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_cheapest
    FROM orders
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist (tie
    semantics identical across engines) + nth_value with an explicit
    deterministic frame."""
    o = load_table(spark, sf_dir, "orders")
    w_ties = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    w_det = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        F.round(F.percent_rank().over(w_ties), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w_ties), 6).alias("cume"),
        F.nth_value("o_orderkey", 3).over(w_det).alias("third_cheapest"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(COUNT(*) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1995-01-01', o_orderdate)
             RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS orders_last_90d
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: orders in the trailing 90 days per
    customer (value-based frame, not row-based — duplicate dates share
    a frame). Ordered on integer day offsets, which keeps the range
    arithmetic timezone-free (epoch micros would drag the session TZ
    through the NTZ→LTZ cast)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")))
        .rangeBetween(-90, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count("*").over(w).cast("long").alias("orders_last_90d"),
    )
