"""Storage-layout operators: z-order (Morton curve) clustering and the
zone maps it produces.

At 100 TB the dominant cost of most queries is the scan, and the
dominant scan optimization is file skipping: each parquet file carries
min/max zone maps per column, and a predicate prunes every file whose
range misses. Skipping only works if the layout CLUSTERS the filter
columns — and a sort on one column destroys locality on the other.
The z-order (bit-interleaved Morton) curve is the standard
multi-dimensional compromise (Delta ``OPTIMIZE ZORDER BY``, Iceberg
sort orders): files get tight ranges on BOTH dimensions at once.

Everything here is integer arithmetic (range-bucket by integer
division, interleave by shift/mask), so the whole layout decision is
engine-exact and carries a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

_BITS = 8  # per-dimension bucket resolution (256 buckets)
_FILE_SHIFT = 10  # 16-bit z-value >> 10 -> 64 target files


def _interleave_expr(x: str, y: str, shr: str, shl: str) -> str:
    """Morton interleave of two _BITS-bit ints; generated once and
    rendered for either engine's shift syntax ({shr}/{shl} are format
    templates like 'shiftright({v}, {n})' / '(({v}) << {n})')."""
    terms = []
    for i in range(_BITS):
        xb = f"({shr.format(v=x, n=i)} & 1)"
        yb = f"({shr.format(v=y, n=i)} & 1)"
        terms.append(shl.format(v=xb, n=2 * i))
        terms.append(shl.format(v=yb, n=2 * i + 1))
    return " + ".join(terms)


_SPARK_Z = _interleave_expr(
    "x_bucket", "y_bucket", "shiftright({v}, {n})", "shiftleft({v}, {n})"
)
_DUCK_Z = _interleave_expr(
    "x_bucket", "y_bucket", "(({v}) >> {n})", "(({v}) << {n})"
)


@register(
    "ly01_zorder_layout",
    oracle=f"""
    WITH bounds AS (
        SELECT MIN(o_custkey) AS ck_min, MAX(o_custkey) AS ck_max,
               MIN(CAST(o_orderdate AS DATE)) AS d_min,
               MAX(CAST(o_orderdate AS DATE)) AS d_max
        FROM orders
    ),
    bucketed AS (
        SELECT ((o.o_custkey - b.ck_min) * {2**_BITS})
                   // (b.ck_max - b.ck_min + 1) AS x_bucket,
               (date_diff('day', b.d_min, CAST(o.o_orderdate AS DATE)) * {2**_BITS})
                   // (date_diff('day', b.d_min, b.d_max) + 1) AS y_bucket
        FROM orders o CROSS JOIN bounds b
    ),
    zvals AS (
        SELECT x_bucket, y_bucket, ({_DUCK_Z}) AS z FROM bucketed
    )
    SELECT z >> {_FILE_SHIFT} AS file_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(x_bucket) AS x_min, MAX(x_bucket) AS x_max,
           MIN(y_bucket) AS y_min, MAX(y_bucket) AS y_max
    FROM zvals
    GROUP BY file_id
    ORDER BY file_id
    """,
)
def ly01_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout planner: bucket orders into a 256x256 grid on
    (customer key, order date), interleave the bucket bits into a
    16-bit Morton value, assign 64 target files by z-range, and emit
    each file's zone map (row count + min/max per dimension).

    The zone maps are the point: every file covers a narrow square of
    the (custkey, date) plane, so a predicate on EITHER column prunes
    ~7/8 of the files (vs no pruning at all on the non-sort column of
    a linear sort). On a cluster this is the plan for a compaction
    write — compute z, ``repartitionByRange(z)``, write — and the
    per-file min/max emitted here is exactly what the parquet footers
    would carry. Bounds arrive as a broadcast 1-row aggregate (no
    collect); bucketing and interleaving are pure integer column
    arithmetic in the scan stage; the only shuffle is the 64-group
    zone-map rollup."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_custkey").alias("ck_min"),
        F.max("o_custkey").alias("ck_max"),
        F.min(F.col("o_orderdate").cast("date")).alias("d_min"),
        F.max(F.col("o_orderdate").cast("date")).alias("d_max"),
    )
    bucketed = (
        orders.crossJoin(F.broadcast(bounds))
        .select(
            F.expr(
                f"((o_custkey - ck_min) * {2**_BITS}) div (ck_max - ck_min + 1)"
            ).alias("x_bucket"),
            F.expr(
                f"(datediff(cast(o_orderdate as date), d_min) * {2**_BITS})"
                " div (datediff(d_max, d_min) + 1)"
            ).alias("y_bucket"),
        )
    )
    zvals = bucketed.withColumn("z", F.expr(_SPARK_Z))
    return (
        zvals.groupBy(
            F.expr(f"shiftright(z, {_FILE_SHIFT})").alias("file_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x_bucket").alias("x_min"),
            F.max("x_bucket").alias("x_max"),
            F.min("y_bucket").alias("y_min"),
            F.max("y_bucket").alias("y_max"),
        )
        .orderBy("file_id")
    )
