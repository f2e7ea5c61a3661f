"""Query registry: every operator the engine claims is registered here
as a named (spark_fn, oracle_sql) pair.

The driver's correctness gate runs each Spark query and its DuckDB
oracle side-by-side and hash-compares values (see __spark_entry__.py).
Keeping both definitions adjacent (one decorator per operator) is what
makes the inventory auditable line-by-line against SURVEY.md §2.

Determinism rules enforced by convention here:
- every aggregate / computed column is aliased identically in both the
  DataFrame code and the oracle SQL;
- floating-point SUMs go through DECIMAL(18,6) so the result does not
  depend on addition order (Spark and DuckDB both sum decimals
  exactly, then the cast to DOUBLE picks the same nearest double);
- rankings / top-k always carry a unique tie-break column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle.

    Queries without an oracle (custom stateful / iterative ops) get the
    driver's weaker rows-only check — keep those rare.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
