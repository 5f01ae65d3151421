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


# Shared oracle CTEs: ONE definition of the grid bucketing both layout
# operators build on (the bucket formula is the correctness-critical
# piece — edge-bucket and degenerate-range behavior live here).
_BUCKETED_CTES_SQL = f"""
    bounds AS (
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
    )"""


def _bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> (x_bucket, y_bucket) on the 256x256 (custkey, date)
    grid; bounds ride a broadcast 1-row aggregate, bucketing is
    scan-fused integer math. The Spark twin of _BUCKETED_CTES_SQL."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_custkey").alias("ck_min"),
        F.max("o_custkey").alias("ck_max"),
        F.min(F.col("o_orderdate").cast("date")).alias("d_min"),
        F.max(F.col("o_orderdate").cast("date")).alias("d_max"),
    )
    return orders.crossJoin(F.broadcast(bounds)).select(
        F.expr(
            f"((o_custkey - ck_min) * {2**_BITS}) div (ck_max - ck_min + 1)"
        ).alias("x_bucket"),
        F.expr(
            f"(datediff(cast(o_orderdate as date), d_min) * {2**_BITS})"
            " div (datediff(d_max, d_min) + 1)"
        ).alias("y_bucket"),
    )



@register(
    "ly01_zorder_layout",
    oracle=f"""
    WITH {_BUCKETED_CTES_SQL},
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
    zvals = _bucketed(spark, sf_dir).withColumn("z", F.expr(_SPARK_Z))
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


# Date-slice predicate for the skipping comparison: one 16-bucket band
# of the 256-bucket date axis (~1/16 of the data).
_PRED_Y_LO = 64
_PRED_Y_HI = 79


@register(
    "ly02_skipping_comparison",
    oracle=f"""
    WITH {_BUCKETED_CTES_SQL},
    assigned AS (
        SELECT x_bucket, y_bucket,
               ({_DUCK_Z}) >> {_FILE_SHIFT} AS zorder_file,
               x_bucket // 4 AS custsort_file
        FROM bucketed
    ),
    layouts AS (
        SELECT 'zorder' AS layout, zorder_file AS file_id, x_bucket, y_bucket FROM assigned
        UNION ALL
        SELECT 'custkey_sort' AS layout, custsort_file AS file_id, x_bucket, y_bucket FROM assigned
    ),
    zonemaps AS (
        SELECT layout, file_id,
               MIN(y_bucket) AS y_min, MAX(y_bucket) AS y_max,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN y_bucket BETWEEN {_PRED_Y_LO} AND {_PRED_Y_HI}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_match
        FROM layouts GROUP BY layout, file_id
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN y_max >= {_PRED_Y_LO} AND y_min <= {_PRED_Y_HI}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_files_scanned,
           CAST(SUM(CASE WHEN y_max >= {_PRED_Y_LO} AND y_min <= {_PRED_Y_HI}
                         THEN n_rows ELSE 0 END) AS BIGINT) AS n_rows_scanned,
           CAST(SUM(n_match) AS BIGINT) AS n_rows_matching
    FROM zonemaps
    GROUP BY layout
    """,
)
def ly02_skipping_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The payoff measurement for ly01: assign every order row to a
    64-file layout twice — once by the z-order curve, once by a plain
    customer-key sort — build each layout's per-file date zone maps,
    and evaluate the SAME date-slice predicate (a 16/256 bucket band)
    against both. The z-order layout scans only the files whose Morton
    block intersects the date band (~1/4 of files for a 1/16 slice at
    this resolution); the custkey-sorted layout scans ALL of them
    (every file spans the full date range — sorting on one column
    destroys zone maps on every other). n_rows_matching is identical
    by construction: layout changes what is READ, never what is true.

    This is the query a table-format OPTIMIZE decision is made from;
    everything is the same broadcast-bounds + scan-fused integer
    arithmetic as ly01, one (layout, file) rollup and a 2-row final
    aggregate."""
    assigned = _bucketed(spark, sf_dir).select(
        "x_bucket",
        "y_bucket",
        F.expr(f"({_SPARK_Z}) >> {_FILE_SHIFT}").alias("zorder_file"),
        F.expr("x_bucket div 4").alias("custsort_file"),
    )
    layouts = assigned.select(
        F.lit("zorder").alias("layout"),
        F.col("zorder_file").alias("file_id"),
        "x_bucket",
        "y_bucket",
    ).unionAll(
        assigned.select(
            F.lit("custkey_sort").alias("layout"),
            F.col("custsort_file").alias("file_id"),
            "x_bucket",
            "y_bucket",
        )
    )
    in_band = F.col("y_bucket").between(_PRED_Y_LO, _PRED_Y_HI)
    zonemaps = layouts.groupBy("layout", "file_id").agg(
        F.min("y_bucket").alias("y_min"),
        F.max("y_bucket").alias("y_max"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(in_band, 1).otherwise(0)).alias("n_match"),
    )
    overlaps = (F.col("y_max") >= _PRED_Y_LO) & (F.col("y_min") <= _PRED_Y_HI)
    return zonemaps.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.when(overlaps, 1).otherwise(0)).alias("n_files_scanned"),
        F.sum(F.when(overlaps, F.col("n_rows")).otherwise(0)).alias(
            "n_rows_scanned"
        ),
        F.sum("n_match").alias("n_rows_matching"),
    )


# Compaction target: merge the 64 z-files into ~8 right-sized outputs.
# Greedy sequential packing by running row count — group =
# cum_rows_before // target — preserves z-order adjacency (merged files
# stay Morton-contiguous, so the merged zone maps stay tight) and is a
# pure prefix-sum, unlike bin-packing heuristics that need global state.
_LY03_TARGET_GROUPS = 8


@register(
    "ly03_compaction_plan",
    oracle=f"""
    WITH {_BUCKETED_CTES_SQL},
    files AS (
        SELECT ({_DUCK_Z}) >> {_FILE_SHIFT} AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM bucketed GROUP BY file_id
    ),
    sized AS (
        SELECT file_id, n_rows,
               COALESCE(SUM(n_rows) OVER (ORDER BY file_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
               (SUM(n_rows) OVER () + {_LY03_TARGET_GROUPS - 1})
                   // {_LY03_TARGET_GROUPS} AS target
        FROM files
    )
    SELECT CAST(cum_before // target AS BIGINT) AS compact_group,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           MIN(file_id) AS file_lo, MAX(file_id) AS file_hi
    FROM sized
    GROUP BY compact_group
    ORDER BY compact_group
    """,
)
def ly03_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: roll the 64-file z-order manifest
    (ly01's output) into ~8 merge groups of near-equal row count by
    greedy prefix-sum packing — the plan an OPTIMIZE/compaction job
    executes, with z-adjacency preserved so merged files keep tight
    zone maps (see the note on _LY03_TARGET_GROUPS). Emits one row per
    merge group: file span, file count, total rows.

    Scale shape: the packing runs over the FILE MANIFEST, not the data
    — 64 rows here, ~10^5 rows for a 100 TB table — so the
    single-partition prefix-sum window is metadata-sized by
    construction (the only data-scale work is the same 64-group
    zone-map rollup ly01 already does). This separation — plan on
    manifests, execute on data — is exactly how table-format OPTIMIZE
    scales."""
    from pyspark.sql import Window

    zvals = _bucketed(spark, sf_dir).withColumn("z", F.expr(_SPARK_Z))
    files = zvals.groupBy(
        F.expr(f"shiftright(z, {_FILE_SHIFT})").alias("file_id")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    w_run = Window.orderBy("file_id").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("file_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sized = files.select(
        "file_id",
        "n_rows",
        F.coalesce(F.sum("n_rows").over(w_run), F.lit(0)).alias("cum_before"),
        F.sum("n_rows").over(w_all).alias("total"),
    ).withColumn(
        "target",
        F.expr(f"(total + {_LY03_TARGET_GROUPS - 1}) div {_LY03_TARGET_GROUPS}"),
    )
    return (
        sized.select(
            F.expr("cum_before div target").alias("compact_group"),
            "file_id",
            "n_rows",
        )
        .groupBy("compact_group")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.min("file_id").alias("file_lo"),
            F.max("file_id").alias("file_hi"),
        )
        .orderBy("compact_group")
    )
