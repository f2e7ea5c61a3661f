"""Every registered query must run end-to-end at sf0.001 and return a
stable non-empty-schema DataFrame (the driver's t1 smoke analogue).
Oracle value equality is covered by tools/check_correctness.py."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from tests.conftest import SF_SMOKE

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
