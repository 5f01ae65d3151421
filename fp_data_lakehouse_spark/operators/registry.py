"""Query registry: every implemented operator is a named query with an
optional DuckDB oracle-SQL twin.

This is the contract surface the driver consumes via
``__spark_entry__.queries()`` / ``oracle_sql()``: for each name, the
Spark builder and the ANSI-SQL string must produce column-name-identical,
value-identical results at any scale factor (order-insensitive).
Queries whose semantics are not SQL-expressible (approximate LSH family,
streaming-stateful ops) register with ``oracle=None`` and are covered by
pytest invariants instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
