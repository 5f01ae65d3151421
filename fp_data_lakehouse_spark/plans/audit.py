"""Helpers for inspecting a DataFrame's executed physical plan.

String-level checks over ``executedPlan`` — deliberately simple so they
survive Spark version bumps; every helper takes the DataFrame, not a
plan string, so call sites stay one-liners.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Operators that should never appear in a production plan of this
# engine: cartesian products (unbounded blowup) and row-at-a-time
# Python evaluation (the slow path; Arrow/Pandas evaluation is fine).
FORBIDDEN_OPS = ("CartesianProduct", "BatchEvalPython")


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-prep) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_op(df: DataFrame, op: str) -> int:
    return physical_plan(df).count(op)


def has_op(df: DataFrame, op: str) -> bool:
    return op in physical_plan(df)


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters annotations of every scan in the plan
    (empty string when nothing was pushed)."""
    return " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", physical_plan(df)))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema annotation of every file scan — the ground truth for
    column pruning (a scan reading columns the query never touches is a
    planning bug at 100 TB, whatever the local runtime says)."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", physical_plan(df))
