"""Accuracy contracts for the approximate operators: relative error
vs the exact operators (the meaningful check for sketches, which have
no cross-engine oracle)."""

from __future__ import annotations

import pyspark.sql.functions as F

import __spark_entry__ as entrymod

from tests.conftest import SF_CORRECT

Q = entrymod.queries()


def test_approx_distinct_contract(spark):
    """approx_distinct_users now carries its own accuracy contract:
    every group's HLL estimate must sit within 4·rsd of the exact
    countDistinct (within_bound TRUE), and the exact column must agree
    with an independent exact aggregation."""
    rows = Q["approx_distinct_users"](spark, SF_CORRECT).collect()
    assert rows and all(r["within_bound"] for r in rows)

    from kinesis_s3_spark.sources.tables import load_table

    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, SF_CORRECT, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert {r["event_type"]: r["exact_users"] for r in rows} == exact


def test_approx_percentile_rank_contract(spark):
    """The query now carries its accuracy contract inline (the
    approx_distinct_users pattern): exact quantiles match
    agg_percentiles and every rank-tolerance flag is TRUE."""
    rows = {
        r["o_orderpriority"]: r
        for r in Q["approx_percentile_price"](spark, SF_CORRECT).collect()
    }
    exact = {
        r["o_orderpriority"]: (r["median_price"], r["p90_price"])
        for r in Q["agg_percentiles"](spark, SF_CORRECT).collect()
    }
    assert rows.keys() == exact.keys()
    for k, (em, e9) in exact.items():
        r = rows[k]
        assert r["exact_median"] == em and r["exact_p90"] == e9, (k, r)
        assert r["median_rank_ok"] and r["p90_rank_ok"], (k, r)
