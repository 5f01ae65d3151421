"""Grouped-map (``applyInPandas``) batch operator — the UDAF-shaped
escape hatch for per-group computations the aggregate DSL can't
express (model fits, per-entity curves, custom state folds). This is
the batch sibling of the streaming ``applyInPandasWithState``
sessionizer: one Arrow batch per group, pandas in, pandas out.

The example operator fits a least-squares spend trend per customer.
Arithmetic is EXACT: the classic slope formula over integer sums
(cents × epoch-seconds), with the x-axis shifted by the group minimum
so (Σx)² stays far under int64 — Python ints are arbitrary-precision
anyway, and the DuckDB oracle states the identical shifted formula, so
the only float op on either side is the single final division.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register


def _slope_of_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) over (epoch-shifted,
    cents) pairs — NULL (empty frame semantics: n<2 or zero variance
    yields None) matches SQL division semantics in the oracle."""
    n = len(pdf)
    xs = [int(v) for v in pdf["x"]]
    ys = [int(v) for v in pdf["y"]]
    x0 = min(xs)
    xs = [x - x0 for x in xs]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / den if den != 0 else None
    return pd.DataFrame(
        {"c_custkey": [int(pdf["c_custkey"].iloc[0])], "n_orders": [n], "slope": [slope]}
    )


@register(
    "ag01_customer_spend_slope",
    oracle="""
    WITH pts AS (
        SELECT o_custkey AS c_custkey,
               CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) AS x,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
        FROM orders
    ),
    shifted AS (
        SELECT c_custkey, x - MIN(x) OVER (PARTITION BY c_custkey) AS x, y
        FROM pts
    ),
    sums AS (
        SELECT c_custkey,
               COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM shifted GROUP BY c_custkey
    )
    SELECT c_custkey, CAST(n AS BIGINT) AS n_orders,
           CASE WHEN n * sxx - sx * sx != 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)
           END AS slope
    FROM sums
    """,
)
def ag01_customer_spend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer linear spend trend (cents per second) via
    ``applyInPandas`` — one Arrow batch per customer group, exact
    integer sums inside, a single float division out. Oracle states the
    identical shifted-sum formula, proving the grouped-map path against
    plain SQL."""
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("x"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    return pts.groupBy("c_custkey").applyInPandas(
        _slope_of_group, schema="c_custkey long, n_orders long, slope double"
    )
