"""Every registered query must run end-to-end at sf0.001 and return a
stable non-empty-schema DataFrame (the driver's t1 smoke analogue).
Oracle value equality is covered by tools/check_correctness.py."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from tests.conftest import SF_CORRECT, SF_SMOKE

_QUERIES = entrymod.queries()


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns  # stable, non-empty schema


def test_every_query_has_registration():
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(_QUERIES)
    assert len(_QUERIES) >= 30


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_runs(spark, name):
    df = _QUERIES[name](spark, SF_SMOKE)
    assert df.columns
    df.limit(5).collect()


def test_scd2_invariants(spark):
    """SCD2 merge: exactly one current row per key, history rows
    carry a valid_to equal to the successor's valid_from, and
    untouched keys keep a single open-ended row."""
    import pyspark.sql.functions as F

    import __spark_entry__ as entrymod

    df = entrymod.queries()["etl_scd2_merge"](spark, SF_CORRECT).cache()
    per_key = df.groupBy("c_custkey").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_cur"),
        F.count("*").alias("n"),
    )
    assert per_key.filter(F.col("n_cur") != 1).count() == 0
    assert per_key.filter((F.col("c_custkey") % 10 == 0) & (F.col("n") != 2)).count() == 0
    assert per_key.filter((F.col("c_custkey") % 10 != 0) & (F.col("n") != 1)).count() == 0
    closed = df.filter(~F.col("is_current"))
    succ = df.filter(F.col("is_current")).select(
        "c_custkey", F.col("valid_from").alias("succ_from")
    )
    bad = (
        closed.join(succ, "c_custkey")
        .filter(F.col("valid_to") != F.col("succ_from"))
        .count()
    )
    assert bad == 0
    df.unpersist()


def test_zorder_skipping_separation(spark):
    """Z-order must dominate the time-linear layout where it is
    supposed to: the value-only predicate prunes nothing under
    time-linear layout but prunes most files under Z-order, and the
    2-D box opens strictly fewer files under Z-order."""
    rows = entrymod.queries()["etl_zorder_skipping"](spark, SF_CORRECT).collect()
    hit = {(r["layout"], r["box"]): (r["files_hit"], r["n_files"]) for r in rows}
    lin_v, lin_n = hit[("linear_time", "value_box")]
    zo_v, zo_n = hit[("zorder", "value_box")]
    assert lin_v == lin_n  # linear layout cannot prune on value
    assert zo_v <= zo_n // 2  # zorder prunes at least half
    assert hit[("zorder", "time_value_box")][0] < hit[("linear_time", "time_value_box")][0]
