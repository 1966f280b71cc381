"""Physical-plan introspection — the engine's own scale linter.

Operators are only "done" when their plan is the one that survives a
100× scale-up: filters pushed into the scan, columns pruned, dims
broadcast, aggregation partial+final, no accidental cartesian
products. These helpers turn those judgments into assertions
(tests/test_plans.py) and interactive checks.

The reference's one genuine optimization — filter before deserialize
"to avoid wasting resources" (reference neurons/miner.py:108-111) —
is `pushed_filters`; the factor-K partial-aggregation claim (reference
README.md:20,22) is `has_partial_aggregation`.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (explain('formatted'))."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def count_operator(df: DataFrame, name: str) -> int:
    """Count physical operators by node name (tree-detail lines only,
    so each operator counts once)."""
    plan = formatted_plan(df)
    return sum(
        1
        for ln in plan.splitlines()
        if ln.startswith("(") and name in ln
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of SHUFFLE exchanges — the scale cost driver.
    BroadcastExchange is deliberately excluded: shipping a dim to every
    executor is the cheap alternative to shuffling the fact side."""
    plan = formatted_plan(df)
    return sum(
        1
        for ln in plan.splitlines()
        if re.match(r"\(\d+\) Exchange\b", ln.strip())
    )


def has_cartesian(df: DataFrame) -> bool:
    return count_operator(df, "CartesianProduct") > 0


def has_broadcast_join(df: DataFrame) -> bool:
    return count_operator(df, "BroadcastHashJoin") > 0


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine present (partial_* before the exchange)."""
    return "partial_" in formatted_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (row-group skipping)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column sets actually read from each parquet scan (pruning)."""
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
        schemas.append(cols)
    return schemas
