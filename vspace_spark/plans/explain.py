"""Physical-plan inspection helpers — the ".explain and iterate" loop
(SURVEY.md §4) captured as assertable predicates, so plan quality is a
TEST, not a one-time observation: filters must reach the parquet scan,
column pruning must shrink ReadSchema, dimension joins must broadcast,
aggregations must partial-combine map-side.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of every parquet scan in the plan."""
    return "\n".join(
        line
        for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line
    )


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names appearing in scan ReadSchema entries (pruning
    check: narrower is better)."""
    cols: list[str] = []
    for line in formatted_plan(df).splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(
                part.split(":")[0].strip()
                for part in inner.split(",")
                if ":" in part
            )
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine present (HashAggregate appears in partial then
    final mode around the exchange)."""
    plan = formatted_plan(df)
    return plan.count("HashAggregate") >= 2 or "partial_" in plan
