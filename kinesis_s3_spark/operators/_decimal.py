"""Deterministic float-aggregation helpers shared by operator modules.

Kept in a registration-free module so importing a helper never pulls in
another module's @query registrations (registry insertion order is the
driver's correctness-gate order — see __spark_entry__.py).

Pattern: exact decimal accumulation, then ONE cast to double, so the
result does not depend on partition/addition order and bit-matches the
DuckDB oracle's CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent SUM over doubles: exact decimal accumulation,
    then one cast to the nearest double. Matches the oracle pattern
    CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """avg = decimal-sum / count, evaluated in double (deterministic)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def DSUM(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"


def DAVG(expr: str) -> str:
    return f"(CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr}))"
