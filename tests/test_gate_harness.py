"""Meta-tests of the correctness harness itself: the gate must FAIL
when a query is wrong — a comparator that can't catch value drift,
row-order illusions, or column renames would make every green row
meaningless."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_correctness import compare, frame_signature  # noqa: E402
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("region", "nation", "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{SF_CORRECT}/{t}.parquet')"
        )
    return c


def test_gate_passes_identical(spark, con):
    df = spark.sql("SELECT 1 AS a, 2.5 AS b")
    out = compare("t", df, "SELECT 1 AS a, 2.5 AS b", con)
    assert out["values_match"]


def test_gate_catches_value_drift(spark, con):
    """A 1-ulp float difference must fail (bit-exact contract)."""
    df = spark.sql("SELECT CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE) AS x")
    out = compare("t", df, "SELECT 0.3::DOUBLE AS x", con)  # vs 0.30000000000000004
    assert not out["values_match"]


def test_gate_catches_wrong_rows(spark, con):
    df = spark.sql("SELECT explode(array(1, 2)) AS x")
    out = compare("t", df, "SELECT 1 AS x", con)
    assert not out["rows_match"]


def test_gate_catches_column_rename(spark, con):
    df = spark.sql("SELECT 1 AS total")
    out = compare("t", df, "SELECT 1 AS sum_qty", con)
    assert not out["cols_match"]


def test_gate_is_row_order_insensitive(spark, con):
    df = spark.sql("SELECT explode(array(2, 1, 3)) AS x")
    out = compare("t", df, "SELECT unnest([3, 1, 2]) AS x", con)
    assert out["values_match"]


def test_gate_distinguishes_null_and_nan():
    import numpy as np
    import pandas as pd

    a = pd.DataFrame({"x": [None]}, dtype=object)
    b = pd.DataFrame({"x": [np.nan]})
    assert frame_signature(a) != frame_signature(b)
