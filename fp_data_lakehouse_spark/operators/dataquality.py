"""Data-quality constraint audit over the warehouse tables — the
validation pass (completeness, uniqueness, range, referential
integrity) a lakehouse runs before publishing a snapshot, in the spirit
of Deequ/Great Expectations check suites.

Scale design: every per-table check family computes in ONE pass over
that table (conditional sums inside a single aggregate — adding a check
adds a column, not a scan); the referential check is the only join and
builds on the dimension side being broadcast-small. Output is O(#checks)
rows regardless of corpus size."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

_DQ01_SQL = """
SELECT 'orders_custkey_null' AS check_name,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'orders_orderkey_dup',
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders_totalprice_nonpositive',
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders_orphan_custkey',
       CAST(COUNT(*) AS BIGINT)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL AND o.o_custkey IS NOT NULL
UNION ALL
SELECT 'lineitem_quantity_out_of_range',
       CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem_discount_out_of_range',
       CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem_ship_before_order',
       CAST(COUNT(*) AS BIGINT)
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate < o.o_orderdate
UNION ALL
SELECT 'customer_acctbal_null',
       CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM customer
"""


@register("dq01_constraint_audit", oracle=_DQ01_SQL)
def dq01_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-audit suite: completeness (null counts), uniqueness
    (key duplication), range (quantity/discount domains), cross-column
    temporal sanity (shipped before ordered), and referential integrity
    (orders -> customer orphans), reported as one (check_name,
    n_violations) row each.

    The three orders-side scalar checks share one aggregate pass, the
    two lineitem range checks share another; the orphan check is an
    anti-join against the broadcast customer dimension and the temporal
    check a broadcast-ready fact-fact join pruned to two columns per
    side. A clean audit returns all-zero counts — the healthy-pipeline
    fast path a scheduler gates a publish on."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    def one(name: str, col: F.Column) -> F.Column:
        return F.sum(F.when(col, 1).otherwise(0)).cast("long").alias(name)

    o = orders.agg(
        one("orders_custkey_null", F.col("o_custkey").isNull()),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("orders_orderkey_dup"),
        one("orders_totalprice_nonpositive", F.col("o_totalprice") <= 0),
    )
    li = lineitem.agg(
        one(
            "lineitem_quantity_out_of_range",
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
        ),
        one(
            "lineitem_discount_out_of_range",
            (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
        ),
    )
    orphans = (
        orders.filter(F.col("o_custkey").isNotNull())
        .join(F.broadcast(customer.select("c_custkey")),
              F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("orders_orphan_custkey"))
    )
    ship_before = (
        lineitem.select("l_orderkey", "l_shipdate")
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") < F.col("o_orderdate"))
        .agg(F.count(F.lit(1)).alias("lineitem_ship_before_order"))
    )
    cu = customer.agg(one("customer_acctbal_null", F.col("c_acctbal").isNull()))

    def unpivot(df: DataFrame) -> DataFrame:
        cols = df.columns
        stack = ", ".join(f"'{c}', {c}" for c in cols)
        return df.selectExpr(
            f"stack({len(cols)}, {stack}) AS (check_name, n_violations)"
        )

    parts = [unpivot(o), unpivot(li), unpivot(orphans), unpivot(ship_before), unpivot(cu)]
    return reduce(DataFrame.unionAll, parts)


# Column-profile spec for the orders table: (column, kind) where kind
# picks the engine-portable string rendering of min/max. Doubles are
# profiled as floor(x*100) integer cents — a monotone integer mapping
# both engines compute bit-identically (raw float-to-string rendering
# differs between engines; monotone integerization sidesteps it).
_DQ02_COLS = (
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "cents"),
    ("o_orderdate", "date"),
    ("o_orderpriority", "str"),
)


def _dq02_oracle() -> str:
    parts = []
    for col, kind in _DQ02_COLS:
        if kind == "cents":
            mn = f"CAST(CAST(FLOOR(MIN({col}) * 100) AS BIGINT) AS VARCHAR)"
            mx = f"CAST(CAST(FLOOR(MAX({col}) * 100) AS BIGINT) AS VARCHAR)"
        elif kind == "date":
            mn = f"CAST(CAST(MIN({col}) AS DATE) AS VARCHAR)"
            mx = f"CAST(CAST(MAX({col}) AS DATE) AS VARCHAR)"
        else:
            mn = f"CAST(MIN({col}) AS VARCHAR)"
            mx = f"CAST(MAX({col}) AS VARCHAR)"
        parts.append(
            f"""SELECT '{col}' AS column_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_null,
                   CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
                   {mn} AS min_value,
                   {mx} AS max_value
            FROM orders"""
        )
    return "\nUNION ALL\n".join(parts)


@register("dq02_column_profile", oracle=_dq02_oracle())
def dq02_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the orders table — row count, null count,
    distinct cardinality, min/max — one row per column: the statistics
    pass behind schema-drift alerts, NDV-based join planning, and
    zone-map construction.

    Two hash passes over the same pruned scan, however many columns are
    profiled (never a per-column scan loop): one Expand-free
    HashAggregate for counts/nulls/min/max, and one skinny unpivoted
    distinct-count for the NDVs (see the in-body note for why the
    tempting single-aggregate form is slower). Min/max of DOUBLE
    columns report as floor(x*100) integer cents and timestamps as
    dates, keeping every rendered string bit-identical across
    engines."""
    orders = load_table(spark, sf_dir, "orders")
    # Pass 1 — moments: counts/nulls/min/max for every column in ONE
    # codegen'd HashAggregate over one scan (no distincts, so no Expand).
    aggs = []
    for col, kind in _DQ02_COLS:
        if kind == "cents":
            mn = F.floor(F.min(col) * 100).cast("long").cast("string")
            mx = F.floor(F.max(col) * 100).cast("long").cast("string")
        elif kind == "date":
            mn = F.min(col).cast("date").cast("string")
            mx = F.max(col).cast("date").cast("string")
        else:
            mn = F.min(col).cast("string")
            mx = F.max(col).cast("string")
        aggs.extend(
            [
                (F.count(F.lit(1)) - F.count(col)).cast("long").alias(f"{col}__nn"),
                mn.alias(f"{col}__mn"),
                mx.alias(f"{col}__mx"),
            ]
        )
    wide = orders.agg(F.count(F.lit(1)).cast("long").alias("__n_rows"), *aggs)
    stack = ", ".join(
        f"'{col}', __n_rows, {col}__nn, {col}__mn, {col}__mx"
        for col, _ in _DQ02_COLS
    )
    moments = wide.selectExpr(
        f"stack({len(_DQ02_COLS)}, {stack}) AS "
        "(column_name, n_rows, n_null, min_value, max_value)"
    )
    # Pass 2 — exact NDVs: unpivot to skinny (column_name, rendered
    # value) rows and count distinct per column. Putting ALL columns'
    # distincts in one aggregate makes Catalyst Expand the scan by
    # #distinct-groups and fall back to a 7-key SortAggregate (measured
    # 2.6 s warm at sf0.1 vs 0.9 s for this shape); two hash passes
    # over the same pruned scan beat one sort pass over the Expand.
    # String rendering is injective per column type (distinct values
    # stay distinct), so the cardinality matches COUNT(DISTINCT col) —
    # with one float caveat: -0.0 renders "-0.0" but compares equal to
    # 0.0 natively (both engines normalize -0.0 in grouping). Adding
    # +0.0 maps -0.0 to +0.0 and is the identity on every other double
    # (NaN stays NaN, one rendered value either way), restoring
    # injectivity-up-to-equality for float columns on arbitrary data.
    stack_vals = ", ".join(
        f"'{col}', cast({col} + 0.0 as string)"
        if kind == "cents"
        else f"'{col}', cast({col} as string)"
        for col, kind in _DQ02_COLS
    )
    ndv = (
        orders.selectExpr(
            f"stack({len(_DQ02_COLS)}, {stack_vals}) AS (column_name, val)"
        )
        .groupBy("column_name")
        .agg(F.countDistinct("val").cast("long").alias("n_distinct"))
    )
    return moments.join(F.broadcast(ndv), "column_name").select(
        "column_name", "n_rows", "n_null", "n_distinct", "min_value", "max_value"
    )


# Drift-monitor geometry: 20 equi-width bins over the GLOBAL value
# range (ag05's engine-exact bin formula), corpus halved at the midpoint
# of the observed time span. Total-variation distance between the two
# halves' per-type distributions is reported as an exact integer
# fraction: TV = sum|c1_i/N1 - c2_i/N2| / 2 = tv_numer / (2*N1*N2) with
# tv_numer = sum|c1_i*N2 - c2_i*N1| — cross-multiplication keeps the
# whole drift decision in BIGINT arithmetic (a PSI-style ln() would
# diverge between libm implementations; TV carries the same monitoring
# signal with none of the float risk).
_DQ03_BINS = 20

_DQ03_SQL = f"""
WITH span AS (
    SELECT MIN(epoch_us(ts)) AS t_lo, MAX(epoch_us(ts)) AS t_hi,
           MIN(value) AS vmin, MAX(value) AS vmax
    FROM events
),
binned AS (
    SELECT e.event_type,
           CASE WHEN 2 * epoch_us(e.ts) < s.t_lo + s.t_hi THEN 0 ELSE 1 END AS half,
           CAST(CASE WHEN s.vmax = s.vmin THEN 0
                     ELSE LEAST(FLOOR(((e.value - s.vmin) * {_DQ03_BINS}.0)
                                      / (s.vmax - s.vmin)),
                                {_DQ03_BINS - 1}) END AS BIGINT) AS bin
    FROM events e CROSS JOIN span s
),
tb AS (
    SELECT event_type, bin,
           CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
           CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
    FROM binned GROUP BY event_type, bin
),
tot AS (
    SELECT event_type, SUM(c1) AS n1, SUM(c2) AS n2 FROM tb GROUP BY event_type
)
SELECT t.event_type,
       CAST(MIN(o.n1) AS BIGINT) AS n_first,
       CAST(MIN(o.n2) AS BIGINT) AS n_second,
       CAST(SUM(ABS(t.c1 * o.n2 - t.c2 * o.n1)) AS BIGINT) AS tv_numer,
       CAST(2 * MIN(o.n1) * MIN(o.n2) AS BIGINT) AS tv_denom,
       CAST(CASE WHEN MIN(o.n1) > 0 AND MIN(o.n2) > 0
                 THEN (SUM(ABS(t.c1 * o.n2 - t.c2 * o.n1)) * 1000)
                      // (2 * MIN(o.n1) * MIN(o.n2))
                 ELSE NULL END AS BIGINT) AS tv_milli
FROM tb t JOIN tot o ON t.event_type = o.event_type
GROUP BY t.event_type
"""


@register("dq03_distribution_drift", oracle=_DQ03_SQL)
def dq03_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: per event type, the total-variation
    distance between the value distributions of the first and second
    half of the observed time span (20 global equi-width bins) — the
    train/serve skew alarm every feature pipeline runs before a model
    refresh, here with the metric reported as an exact integer fraction
    (see the TV-vs-PSI note on _DQ03_SQL).

    One scan bins every event (bounds ride a broadcast 1-row
    aggregate; the half split is an integer epoch comparison, no
    per-row division); the first shuffle reduces the corpus to at most
    |types| x 20 x 2 counters, and everything after — per-type totals,
    the cross-multiplied |c1*N2 - c2*N1| fold — runs on that
    metadata-sized table with a broadcast totals join."""
    events = load_table(spark, sf_dir, "events")
    span = events.agg(
        F.min(F.unix_micros("ts")).alias("t_lo"),
        F.max(F.unix_micros("ts")).alias("t_hi"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    binned = events.crossJoin(F.broadcast(span)).select(
        "event_type",
        F.when(2 * F.unix_micros("ts") < F.col("t_lo") + F.col("t_hi"), 0)
        .otherwise(1)
        .alias("half"),
        # Degenerate-span guard (all values equal => vmax == vmin): the
        # unguarded bin expression is 0/0 = NaN in Spark and
        # engine-dependent in DuckDB; a single-bin histogram (bin 0) is
        # the defined answer, mirrored in the oracle's CASE.
        F.when(F.col("vmax") == F.col("vmin"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    ((F.col("value") - F.col("vmin")) * float(_DQ03_BINS))
                    / (F.col("vmax") - F.col("vmin"))
                ),
                F.lit(_DQ03_BINS - 1),
            )
        )
        .cast("long")
        .alias("bin"),
    )
    tb = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long").alias("c2"),
    )
    tot = tb.groupBy("event_type").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    joined = tb.join(F.broadcast(tot), "event_type")
    numer = F.sum(F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")))
    n1 = F.min("n1")
    n2 = F.min("n2")
    return joined.groupBy("event_type").agg(
        n1.cast("long").alias("n_first"),
        n2.cast("long").alias("n_second"),
        numer.cast("long").alias("tv_numer"),
        (2 * n1 * n2).cast("long").alias("tv_denom"),
        F.when((n1 > 0) & (n2 > 0), F.expr(
            "(sum(abs(c1 * n2 - c2 * n1)) * 1000) div (2 * min(n1) * min(n2))"
        ))
        .cast("long")
        .alias("tv_milli"),
    )


# Reconciliation tolerance: header and detail amounts must agree to the
# cent after the canonical TPC-H pricing formula. Everything is
# floor-to-cents BEFORE comparison, so the check is pure BIGINT and the
# pass/fail decision can never flip on float summation order.
_DQ04_SQL = """
WITH detail AS (
    SELECT l_orderkey,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)
                    AS BIGINT)) AS BIGINT) AS detail_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem GROUP BY l_orderkey
),
recon AS (
    SELECT o.o_orderkey,
           CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS header_cents,
           d.detail_cents,
           d.n_lines
    FROM orders o LEFT JOIN detail d ON o.o_orderkey = d.l_orderkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN detail_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_headers_without_lines,
       CAST(SUM(CASE WHEN detail_cents IS NOT NULL
                      AND ABS(header_cents - detail_cents) <= n_lines
                THEN 1 ELSE 0 END) AS BIGINT) AS n_reconciled,
       CAST(SUM(CASE WHEN detail_cents IS NOT NULL
                      AND ABS(header_cents - detail_cents) > n_lines
                THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
       CAST(MAX(CASE WHEN detail_cents IS NOT NULL
                THEN ABS(header_cents - detail_cents) END) AS BIGINT)
           AS max_abs_diff_cents
FROM recon
"""


@register("dq04_ledger_reconciliation", oracle=_DQ04_SQL)
def dq04_ledger_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table ledger reconciliation: every order header's total
    against the sum of its line amounts under the canonical pricing
    formula (extended * (1-disc) * (1+tax)), all floored to integer
    cents before any comparison — the header-vs-detail financial audit
    every warehouse runs before publishing revenue, plus the
    orphan-header census (orders with no lines at all). The per-order
    tolerance is one cent per line (floor rounding can drop up to a
    cent per line item relative to the header's pre-rounded total).

    Scale shape: the detail side collapses to one (orderkey, cents,
    n_lines) row per order with a map-side-combined sum BEFORE the
    join, so the join carries |orders| rows on both sides on the same
    key; the verdict is a single conditional aggregate to one row.
    This op and dq01-dq03 together form the audit suite: constraints,
    profile, drift, reconciliation."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    line_cents = F.floor(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
        * 100
    ).cast("long")
    detail = lineitem.groupBy("l_orderkey").agg(
        F.sum(line_cents).cast("long").alias("detail_cents"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )
    recon = orders.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("header_cents"),
    ).join(detail, F.col("o_orderkey") == F.col("l_orderkey"), "left")
    has_detail = F.col("detail_cents").isNotNull()
    diff = F.abs(F.col("header_cents") - F.col("detail_cents"))
    return recon.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(~has_detail, 1).otherwise(0))
        .cast("long")
        .alias("n_headers_without_lines"),
        F.sum(F.when(has_detail & (diff <= F.col("n_lines")), 1).otherwise(0))
        .cast("long")
        .alias("n_reconciled"),
        F.sum(F.when(has_detail & (diff > F.col("n_lines")), 1).otherwise(0))
        .cast("long")
        .alias("n_mismatched"),
        F.max(F.when(has_detail, diff)).cast("long").alias("max_abs_diff_cents"),
    )
