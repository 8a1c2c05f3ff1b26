"""Physical-plan inspection — assertable scale properties.

A plan that is correct at sf0.01 can still be a 100 TB disaster (cartesian
joins, global sorts, full-column scans). These helpers turn the properties
PLANS.md documents into assertions tests can pin, so a regression in plan
shape fails CI instead of surfacing as a cluster incident:

- `physical_plan(df)`: executed-plan text (post-AQE where available).
- `has_cartesian(df)`: any CartesianProduct / BroadcastNestedLoopJoin —
  the O(n^2) shapes an equi-join formulation must never degrade into.
- `single_partition_exchanges(df)`: count of `Exchange SinglePartition`
  stages — each one is a task that owns ALL rows flowing through it.
- `pushed_filters(df)` / `read_schemas(df)`: what actually reached the
  parquet scans — predicate pushdown and column pruning, the two
  properties that keep a 100 TB scan from reading 100 TB.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, formatted: bool = False) -> str:
    if formatted:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()
    return df._jdf.queryExecution().executedPlan().toString()


def has_cartesian(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def single_partition_exchanges(df: DataFrame) -> int:
    return physical_plan(df).count("Exchange SinglePartition")


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists of every parquet scan in the plan (one string
    per scan, '[]' when nothing was pushed)."""
    plan = physical_plan(df, formatted=True)
    return [m.strip() for m in re.findall(r"PushedFilters: (\[.*?\])", plan)]


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every parquet scan — audit column pruning."""
    plan = physical_plan(df, formatted=True)
    return [m.strip() for m in re.findall(r"ReadSchema: (struct<.*?>)", plan)]
