"""Correlated-subquery TPC-H shapes (Q2/Q11/Q15/Q16/Q17/Q18/Q20/Q21/
Q22 adapted to the driver schema, which has no partsupp): the patterns
that stress Catalyst's subquery decorrelation — correlated scalar
MIN/aggregates, group-vs-global-scalar thresholds, NOT IN blacklists,
HAVING-gated IN subqueries, multi-EXISTS with inequality correlation,
and aggregate-vs-aggregate comparison. Together with relational.py
(Q1/Q3/Q5) and tpch_extra.py (Q4/Q6-Q10/Q12-Q14/Q19), all 22 TPC-H
query shapes are registered and oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_s3_spark.operators.registry import query
from kinesis_s3_spark.operators._decimal import DSUM
from kinesis_s3_spark.sources.tables import load_table


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {DSUM('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: CTE reused twice (revenue + its max) — the scalar
    subquery over the same derived table. Spark reuses the aggregated
    subplan (ReusedExchange/Subquery) instead of recomputing."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)"))
        .cast("double")
        .alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity))
        FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar AVG per partkey → decorrelates to
    an aggregate-then-join. Written as the decorrelated form directly
    (the plan Catalyst produces for the SQL): one agg over lineitem,
    broadcast-joined back."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (
            F.lit(0.2)
            * (F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double") / F.count("l_quantity"))
        ).alias("threshold")
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    GROUP BY c_custkey, o_orderkey, o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: IN over a HAVING-filtered aggregate → semi join
    against the pre-aggregated key set (never materializing the
    full group-by into the outer join input)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(big.withColumnRenamed("l_orderkey", "bk"), F.col("o_orderkey") == F.col("bk"), "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("total_qty"))
    )


@query(
    "q22_global_balance",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(c_acctbal)
        FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    """,
)
def q22_global_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global avg) + anti join —
    rich customers with no recent (2000+) orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double") / F.count("c_acctbal")).alias("a")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double").alias("totacctbal"),
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    rcost AS (
      SELECT l_partkey, l_suppkey, unit_cost
      FROM cost
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT p_partkey, p_name, s_name, s_acctbal, unit_cost
    FROM part
    JOIN rcost    ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_size = 15
      AND unit_cost = (SELECT MIN(unit_cost) FROM rcost x
                       WHERE x.l_partkey = rcost.l_partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part of a given size, the cheapest
    supplier within a region — the correlated-scalar-MIN pattern. The
    driver schema has no partsupp, so the part↔supplier link and unit
    cost come from lineitem history (min extendedprice/quantity per
    pair); the join graph and decorrelation shape are Q2's.

    Spark plan: per-pair min (one shuffle on (part, supp)), region
    prune via broadcast dims, then the correlated MIN becomes a
    per-part min + equi-join back — ties (both engines) return every
    minimal supplier, like the original query. Doubles compare
    bit-equal because both engines compute the same IEEE division and
    min."""
    li = load_table(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    rcost = (
        cost.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_partkey", "l_suppkey", "unit_cost")
    )
    best = rcost.groupBy(F.col("l_partkey").alias("bp")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    return (
        rcost.join(
            best,
            (F.col("l_partkey") == F.col("bp")) & (F.col("unit_cost") == F.col("best_cost")),
        )
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "unit_cost")
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH value AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, val
    FROM value
    WHERE val > (SELECT CAST(SUM(CAST(val AS DECIMAL(18,6))) AS DOUBLE) * 0.001
                 FROM value)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value exceeds a fraction of
    the GLOBAL total — group-level aggregate gated by a scalar
    aggregate over the same derived table (no partsupp; value =
    lineitem extendedprice within a nation set).

    The per-part aggregate is computed once and reused for both sides
    (Spark reuses the exchange); the global sum is a 1-row broadcast,
    so the gate adds no second scan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    value = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double").alias("val"))
    )
    threshold = value.agg(
        (F.sum(F.col("val").cast("decimal(18,6)")).cast("double") * 0.001).alias("thr")
    )
    return (
        value.join(F.broadcast(threshold), F.col("val") > F.col("thr"))
        .select(F.col("l_partkey").alias("partkey"), "val")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many suppliers can supply each part
    profile, excluding a blacklist via NOT IN (negative balance stands
    in for the original's complaint-comment filter; the part↔supplier
    relation comes from lineitem).

    NOT IN over a non-nullable key → left-anti join against the tiny
    blacklist (broadcast); count-distinct collapses duplicate
    (part, supp) pairs with the standard two-phase Expand plan."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_part_promotion",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM shipped a
      WHERE qty > (SELECT CAST(SUM(CAST(qty AS DECIMAL(18,6))) AS DOUBLE) * 0.3
                   FROM shipped b WHERE b.l_partkey = a.l_partkey)
    )
    """,
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who dominated (>30% of) a year's
    shipments of any 'small%' part — correlated aggregate-vs-aggregate
    gate feeding a semi join (availqty>½·shipped in the original; the
    dominance ratio keeps the same nested-subquery decorrelation).

    Plan: one (part, supp) aggregate, a per-part total derived FROM
    that aggregate (re-aggregation of the small intermediate, not a
    rescan), equi-join gate, then a semi join into supplier."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    shipped = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("qty"))
    )
    totals = shipped.groupBy(F.col("l_partkey").alias("tp")).agg(
        (F.sum(F.col("qty").cast("decimal(18,6)")).cast("double") * 0.3).alias("thr")
    )
    dominant = shipped.join(
        totals, (F.col("l_partkey") == F.col("tp")) & (F.col("qty") > F.col("thr"))
    ).select("l_suppkey")
    s = load_table(spark, sf_dir, "supplier")
    return s.join(
        dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the LAST to ship in
    multi-supplier finalized orders (shipdate stands in for the
    missing commit/receipt dates) — the EXISTS + NOT-EXISTS pair with
    inequality correlation, the hardest decorrelation in the suite.

    r12 rewrite (guide §2.4): both correlated subqueries range only
    over the line's OWN order, so they decorrelate into per-order
    window aggregates on ONE l_orderkey exchange instead of the former
    semi + anti hash joins (each a further full shuffle of lineitem).
    EXISTS(other supplier) = min(suppkey) != max(suppkey) over the
    order. NOT EXISTS(other supplier shipping later than d1) =
    max(shipdate over OTHER suppliers) <= d1, split on whether the
    order's max shipdate m1 is attained by more than one supplier:
    if it is (smin != smax among the lines at m1), every line has some
    other supplier at m1, so only lines with d1 = m1 qualify; if one
    supplier sk* owns m1, its lines qualify iff d1 >= m2 (the max
    shipdate over suppliers != sk*) and no other supplier's line can
    qualify (sk* ships later than all of them). The three window
    passes share one partitioning, so Catalyst plans a single
    Exchange + Sort. Top-20 with (numwait, s_name) tie-break plans as
    TakeOrderedAndProject."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    w = Window.partitionBy("l_orderkey")
    lw = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .withColumn("m1", F.max("l_shipdate").over(w))
        .withColumn(
            "has_other", F.min("l_suppkey").over(w) != F.max("l_suppkey").over(w)
        )
    )
    at_max = F.when(F.col("l_shipdate") == F.col("m1"), F.col("l_suppkey"))
    lw = lw.withColumn("smin", F.min(at_max).over(w)).withColumn(
        "smax", F.max(at_max).over(w)
    )
    lw = lw.withColumn(
        "m2",
        F.max(
            F.when(F.col("l_suppkey") != F.col("smin"), F.col("l_shipdate"))
        ).over(w),
    )
    last_to_ship = F.when(
        F.col("smin") != F.col("smax"), F.col("l_shipdate") == F.col("m1")
    ).otherwise(
        (F.col("l_suppkey") == F.col("smin"))
        & (F.col("l_shipdate") >= F.col("m2"))
    )
    waiting = lw.filter(F.col("has_other") & last_to_ship).select(
        "l_orderkey", "l_suppkey"
    )
    base = waiting.join(
        o.select("o_orderkey"), F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    ).join(s, F.col("s_suppkey") == F.col("l_suppkey"))
    return (
        base.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
