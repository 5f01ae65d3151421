"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``fp_data_lakehouse_spark`` package; this
module only adapts its query registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fp_data_lakehouse_spark.operators import oracle_sql as _oracle_sql
from fp_data_lakehouse_spark.operators import queries as _queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: top-10 customers by revenue-weighted
    average item value (3-way broadcast star join, ratio-of-sums agg,
    round, deterministic top-k) — the largest operator cluster of
    SURVEY.md §2 in one plan."""
    from fp_data_lakehouse_spark.operators.relational import (
        q02_top10_customers_by_avg_item_value,
    )

    return q02_top10_customers_by_avg_item_value(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for non-SQL ops)."""
    return _oracle_sql()
