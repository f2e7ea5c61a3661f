"""Physical-plan inspection helpers: the engine's "did Catalyst do
what we designed for" checks (SURVEY §4 — pushdown, pruning, join
strategy are the whole argument for the DataFrame-first design, so
tests assert them instead of hoping).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (PushedFilters: [...])."""
    plan = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column sets read by each scan (ReadSchema) — pruning evidence."""
    plan = explain_str(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def uses_broadcast(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_str(df)
    if "CartesianProduct" in plan:
        raise AssertionError(f"plan contains a CartesianProduct:\n{plan}")
