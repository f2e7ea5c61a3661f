"""Bucketing: the co-located-join strategy for repeated fact-fact
joins at scale (SURVEY §2 join mapping). Writing both sides bucketed
by the join key lets Spark hash-join WITHOUT a shuffle — the single
biggest cost remover for a join repeated every batch at 100 TB."""

from __future__ import annotations

import pyspark.sql.functions as F

from kinesis_s3_spark.plans.inspect import explain_str
from kinesis_s3_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_bucketed_join_avoids_shuffle(spark):
    # warehouse dir is a static conf — bucketed tables land in the
    # default ./spark-warehouse (gitignored); dropped in finally
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # sf0.001 tables auto-broadcast (also shuffle-free, but that
        # hides the bucketing effect) — force the shuffle-join path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        (
            orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").saveAsTable("orders_b")
        )
        (
            lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .mode("overwrite").saveAsTable("lineitem_b")
        )

        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        joined = (
            ob.join(lb, ob.o_orderkey == lb.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("cnt"))
        )
        plan = explain_str(joined)
        # the join itself must not introduce an Exchange: the bucket
        # layout IS the partitioning (only the final tiny groupBy may
        # shuffle)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Bucketed: true" in plan
        # tree nodes render as "Exchange (n)"; the only one allowed is
        # the final aggregation, never the join inputs
        assert plan.count("Exchange (") <= 1, plan

        # and the bucketed join returns the same result
        plain = (
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("cnt"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
