"""The relational operator corpus (SURVEY.md §2.5), re-targeted at the
driver's TPC-H-ish fixtures.

The reference's 29 analytic queries (insight_transkrip.sql:1-356) run on
a transcript star schema; the driver fixtures map onto the same shapes
(FIXTURES.md §C): customer≈student dim, part≈course dim, orders'
date axis≈term dim, lineitem≈enrollment fact. Each query here exercises
exactly the operator cluster of its reference twin (cited per-query) on
the fixture tables, with a DuckDB oracle in the same column names.

Scale notes (100 TB design intent, verified on .explain):
- Star joins (fact ⋈ dims) broadcast the dim side — customer/part/
  supplier are small relative to the fact everywhere these shapes occur;
  at cluster scale Spark's autoBroadcastJoinThreshold + AQE make the
  same call from runtime stats, the explicit ``F.broadcast`` hint keeps
  the plan stable when dim stats are missing.
- Aggregations are expressed as single groupBy so partial (map-side)
  aggregation applies before the shuffle.
- Window functions partition by high-cardinality keys (custkey), never
  by a constant; the one global window (q29) runs over an already
  aggregated ~|year×month| row set, which is tiny by construction.
- Filters and projections sit directly on the scan so Catalyst pushes
  them into parquet (checked: PushedFilters / narrow ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.catalog import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Shared column expressions
# ---------------------------------------------------------------------------

# All money/rate columns in the fixtures carry exactly 2 decimal digits.
# Aggregating them as doubles makes the sum depend on partition order, and
# a ROUND() on top can then disagree between engines at .xx5 boundaries
# (observed: avg(l_discount)=0.056249999..|0.0562500..1 at sf0.01). So every
# additive aggregate here is computed on exact integer "cents": the sums are
# order-independent and bit-identical in Spark and DuckDB, and the single
# final division produces the same double on both sides. This also holds on
# a 1000-executor cluster where partition order is genuinely nondeterministic.
#
# ROUND() itself is also engine-divergent at exact decimal halves (Spark
# rounds the shortest-decimal rendering HALF_UP, DuckDB rounds the binary
# value; observed: round(0.04325, 4) -> 0.0433 vs 0.0432). So rounded ratios
# are computed entirely in integer arithmetic: round(N/D, s) =
# (2*N*10^s + D) div (2*D) for positive integers, then one exact float
# division by 10^s. Helpers below emit the Spark and DuckDB forms.


def _cents(col: str):
    """2-decimal double column -> exact integer cents (long)."""
    return F.round(F.col(col) * 100).cast("long")


def _cents_sql(col: str) -> str:
    return f"CAST(ROUND({col} * 100) AS BIGINT)"


def _revenue_scaled():
    """Revenue of a lineitem row, scaled x10000 as an exact long.

    revenue = extendedprice * (1 - discount); with both at 2 decimals,
    revenue*10000 = cents(price) * (100 - cents(discount)) is an exact
    integer. The fixture analog of the reference's quality-point measure
    sks*bobot (ETL_FINAL.py:197).
    """
    return _cents("l_extendedprice") * (100 - _cents("l_discount"))


_REVENUE_SCALED_SQL = (
    f"({_cents_sql('l.l_extendedprice')} * (100 - {_cents_sql('l.l_discount')}))"
)


def _round_div(numer: str, denom: str, scale: int):
    """HALF_UP round(numer/denom, scale) on integral named columns, exact.

    ``numer``/``denom`` are SQL expressions over already-aggregated long
    columns; the integer division keeps every step order-independent.
    """
    return F.expr(f"(2 * ({numer}) * {10**scale} + ({denom})) div (2 * ({denom}))") / float(
        10**scale
    )


def _round_div_sql(numer: str, denom: str, scale: int) -> str:
    return f"((2 * ({numer}) * {10**scale} + ({denom})) // (2 * ({denom}))) / {float(10**scale)}"


def _li_orders_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders ⋈ customer star join (dims broadcast)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey, "inner"
    ).join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner")


# ---------------------------------------------------------------------------
# Q1 — aggregate-of-aggregate via derived table (insight_transkrip.sql:1-13)
# ---------------------------------------------------------------------------


@register(
    "q01_avg_customer_revenue",
    oracle="""
    SELECT ((2 * SUM(revenue_scaled) * 100 + (10000 * COUNT(*))) // (2 * (10000 * COUNT(*)))) / 100.0 AS avg_revenue
    FROM (
        SELECT c.c_custkey, SUM((CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))) AS revenue_scaled
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    ) per_customer
    """,
)
def q01_avg_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean per-customer revenue: 3-way star join, inner groupBy, outer AVG.

    Operator shape of insight 1 (insight_transkrip.sql:1-13): derived
    table in FROM, SUM ratio per entity, outer AVG.
    """
    per_customer = (
        _li_orders_cust(spark, sf_dir)
        .groupBy("c_custkey")
        .agg(F.sum(_revenue_scaled()).alias("revenue_scaled"))
    )
    return (
        per_customer.agg(
            F.sum("revenue_scaled").alias("_rs"), F.count(F.lit(1)).alias("_n")
        ).select(_round_div("_rs", "10000 * _n", 2).alias("avg_revenue"))
    )


# ---------------------------------------------------------------------------
# Q2 — top-k by weighted ratio (insight_transkrip.sql:15-25)
# ---------------------------------------------------------------------------


@register(
    "q02_top10_customers_by_avg_item_value",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {_round_div_sql(f'SUM({_REVENUE_SCALED_SQL})', 'CAST(SUM(l.l_quantity) AS BIGINT) * 10000', 2)} AS avg_item_value
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY avg_item_value DESC, c.c_custkey ASC
    LIMIT 10
    """,
)
def q02_top10_customers_by_avg_item_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by revenue-per-unit weighted ratio.

    Insight 2 shape (insight_transkrip.sql:15-25): star join, grouped
    ratio-of-sums W, ROUND, ORDER BY DESC LIMIT 10. The reference's
    MySQL functional-dependency GROUP BY (selects nama while grouping by
    id) becomes an explicit composite grouping key. Tie-break on the
    unique key keeps the top-k deterministic across engines.
    """
    return (
        _li_orders_cust(spark, sf_dir)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(_revenue_scaled()).alias("_rs"),
            F.sum("l_quantity").cast("long").alias("_q"),
        )
        .select(
            "c_custkey", "c_name", _round_div("_rs", "_q * 10000", 2).alias("avg_item_value")
        )
        .orderBy(F.desc("avg_item_value"), F.asc("c_custkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q3 — frequency distribution (insight_transkrip.sql:27-34)
# ---------------------------------------------------------------------------


@register(
    "q03_returnflag_distribution",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q03_returnflag_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grade-letter distribution analog: COUNT(*) per category.

    Insight 3 (insight_transkrip.sql:27-34). Map-side partial count then
    a 3-group shuffle — negligible at any scale.
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )


# ---------------------------------------------------------------------------
# Q4/Q5 — bottom-k / top-k by group average (insight_transkrip.sql:36-56)
# ---------------------------------------------------------------------------


def _part_avg_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(F.sum(_cents("l_discount")).alias("_s"), F.count(F.lit(1)).alias("_n"))
        .select("p_partkey", "p_name", _round_div("_s", "_n * 100", 4).alias("avg_discount"))
    )


_PART_AVG_DISCOUNT_SQL = """
        SELECT p.p_partkey, p.p_name,
               ((2 * SUM(CAST(ROUND(l.l_discount * 100) AS BIGINT)) * 10000 + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100))) / 10000.0 AS avg_discount
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_partkey, p.p_name
"""


@register(
    "q04_bottom5_parts_by_discount",
    oracle=f"""
    SELECT * FROM ({_PART_AVG_DISCOUNT_SQL})
    ORDER BY avg_discount ASC, p_partkey ASC
    LIMIT 5
    """,
)
def q04_bottom5_parts_by_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Hardest courses" analog: bottom-5 parts by average discount.

    Insight 4 (insight_transkrip.sql:36-45): join, AVG per group, ROUND,
    ORDER ASC LIMIT 5 (bottom-k).
    """
    return _part_avg_discount(spark, sf_dir).orderBy(
        F.asc("avg_discount"), F.asc("p_partkey")
    ).limit(5)


@register(
    "q05_top5_parts_by_discount",
    oracle=f"""
    SELECT * FROM ({_PART_AVG_DISCOUNT_SQL})
    ORDER BY avg_discount DESC, p_partkey ASC
    LIMIT 5
    """,
)
def q05_top5_parts_by_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Easiest courses" analog: top-5 parts by average discount.

    Insight 5 (insight_transkrip.sql:47-56).
    """
    return _part_avg_discount(spark, sf_dir).orderBy(
        F.desc("avg_discount"), F.asc("p_partkey")
    ).limit(5)


# ---------------------------------------------------------------------------
# Q6/Q7 — weighted mean per small/composite group (insight_transkrip.sql:58-77)
# ---------------------------------------------------------------------------


@register(
    "q06_weighted_value_by_orderstatus",
    oracle=f"""
    SELECT o.o_orderstatus,
           {_round_div_sql(f'SUM({_REVENUE_SCALED_SQL})', 'CAST(SUM(l.l_quantity) AS BIGINT) * 10000', 2)} AS weighted_value
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def q06_weighted_value_by_orderstatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odd/even-semester weighted mean analog: ratio-of-sums per status.

    Insight 6 (insight_transkrip.sql:58-66).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.sum(_revenue_scaled()).alias("_rs"),
            F.sum("l_quantity").cast("long").alias("_q"),
        )
        .select("o_orderstatus", _round_div("_rs", "_q * 10000", 2).alias("weighted_value"))
    )


@register(
    "q07_weighted_value_by_year_month",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o.o_orderdate) AS INTEGER) AS order_month,
           {_round_div_sql(f'SUM({_REVENUE_SCALED_SQL})', 'CAST(SUM(l.l_quantity) AS BIGINT) * 10000', 2)} AS weighted_value
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY order_year, order_month
    """,
)
def q07_weighted_value_by_year_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mean per (year, month): multi-key groupBy.

    Insight 7 (insight_transkrip.sql:68-77); (tahun, semester) becomes
    (year(o_orderdate), month(o_orderdate)).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.sum(_revenue_scaled()).alias("_rs"),
            F.sum("l_quantity").cast("long").alias("_q"),
        )
        .select(
            "order_year",
            "order_month",
            _round_div("_rs", "_q * 10000", 2).alias("weighted_value"),
        )
    )


# ---------------------------------------------------------------------------
# Q8 — top-k by count (insight_transkrip.sql:79-87)
# ---------------------------------------------------------------------------


@register(
    "q08_top5_most_ordered_parts",
    oracle="""
    SELECT p.p_partkey, p.p_name, COUNT(*) AS n_orders
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey, p.p_name
    ORDER BY n_orders DESC, p.p_partkey ASC
    LIMIT 5
    """,
)
def q08_top5_most_ordered_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-taken-courses analog: COUNT(*) per part, top-5.

    Insight 8 (insight_transkrip.sql:79-87).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("p_partkey"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# Q9 — filter on measure then grouped sum (insight_transkrip.sql:89-98)
# ---------------------------------------------------------------------------


@register(
    "q09_discounted_quantity_per_customer",
    oracle="""
    SELECT c.c_custkey, c.c_name, SUM(l.l_quantity) AS total_qty
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE l.l_discount >= 0.05
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q09_discounted_quantity_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passed-credits analog: threshold filter on the measure, SUM per entity.

    Insight 9 (insight_transkrip.sql:89-98): WHERE bobot >= 2.0 becomes
    l_discount >= 0.05. The filter sits on the fact scan so it pushes
    into parquet before the join.
    """
    return (
        _li_orders_cust(spark, sf_dir)
        .filter(F.col("l_discount") >= 0.05)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum("l_quantity").alias("total_qty"))
    )


# ---------------------------------------------------------------------------
# Q10 — NOT EXISTS anti-join (insight_transkrip.sql:100-115)
# ---------------------------------------------------------------------------


@register(
    "q10_returned_never_reordered",
    oracle="""
    SELECT DISTINCT o.o_custkey AS c_custkey, l.l_partkey AS p_partkey
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND NOT EXISTS (
        SELECT 1
        FROM lineitem l2
        JOIN orders o2 ON l2.l_orderkey = o2.o_orderkey
        WHERE o2.o_custkey = o.o_custkey
          AND l2.l_partkey = l.l_partkey
          AND l2.l_returnflag = 'N'
      )
    """,
)
def q10_returned_never_reordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unresolved-failing-grades analog: correlated NOT EXISTS as anti-join.

    Insight 10 (insight_transkrip.sql:100-115): (customer, part) pairs
    with a returned item ('R' ≈ grade D/E) and no non-returned purchase
    of the same part ('N' ≈ passing retake), DISTINCT. Expressed directly
    as ``left_anti`` — the plan Catalyst would decorrelate to anyway.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    pairs = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("l_partkey").alias("p_partkey"),
        "l_returnflag",
    )
    returned = pairs.filter(F.col("l_returnflag") == "R").select("c_custkey", "p_partkey")
    kept = pairs.filter(F.col("l_returnflag") == "N").select("c_custkey", "p_partkey").distinct()
    return returned.join(kept, ["c_custkey", "p_partkey"], "left_anti").distinct()


@register(
    "q10b_returned_then_reordered",
    oracle="""
    SELECT DISTINCT o.o_custkey AS c_custkey, l.l_partkey AS p_partkey
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1
        FROM lineitem l2
        JOIN orders o2 ON l2.l_orderkey = o2.o_orderkey
        WHERE o2.o_custkey = o.o_custkey
          AND l2.l_partkey = l.l_partkey
          AND l2.l_returnflag = 'N'
      )
    """,
)
def q10b_returned_then_reordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join dual of q10 (SURVEY.md §2.6: 'semi is the trivial dual
    of the anti pattern'): (customer, part) pairs with a returned item
    AND a later kept purchase of the same part — ``left_semi`` where q10
    is ``left_anti``, same shuffle keys, so the two plans share shape.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    pairs = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("l_partkey").alias("p_partkey"),
        "l_returnflag",
    )
    returned = pairs.filter(F.col("l_returnflag") == "R").select("c_custkey", "p_partkey")
    kept = pairs.filter(F.col("l_returnflag") == "N").select("c_custkey", "p_partkey").distinct()
    return returned.join(kept, ["c_custkey", "p_partkey"], "left_semi").distinct()


# ---------------------------------------------------------------------------
# Q11 — HAVING COUNT(*) > 1 (insight_transkrip.sql:117-127)
# ---------------------------------------------------------------------------


@register(
    "q11_repeat_purchases",
    oracle="""
    SELECT o.o_custkey AS c_custkey, l.l_partkey AS p_partkey, COUNT(*) AS n_times
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_custkey, l.l_partkey
    HAVING COUNT(*) > 1
    """,
)
def q11_repeat_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Course-retakes analog: grouped count with HAVING filter-after-agg.

    Insight 11 (insight_transkrip.sql:117-127).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("c_custkey"), F.col("l_partkey").alias("p_partkey"))
        .agg(F.count(F.lit(1)).alias("n_times"))
        .filter(F.col("n_times") > 1)
    )


# ---------------------------------------------------------------------------
# Q12 — conjunctive filter + double AVG, no grouping (insight_transkrip.sql:129-134)
# ---------------------------------------------------------------------------


@register(
    "q12_avg_tax_discount_when_both_positive",
    oracle="""
    SELECT ((2 * SUM(CAST(ROUND(l_tax * 100) AS BIGINT)) * 10000 + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100))) / 10000.0 AS avg_tax,
           ((2 * SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) * 10000 + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100))) / 10000.0 AS avg_discount
    FROM lineitem
    WHERE l_tax > 0 AND l_discount > 0
    """,
)
def q12_avg_tax_discount_when_both_positive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prep-vs-undergrad GPA analog: AND filter, global AVG x2, ROUND.

    Insight 12 (insight_transkrip.sql:129-134). Single-table scan with
    both predicates pushed to parquet; global agg is a 1-row reduce.
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_tax") > 0) & (F.col("l_discount") > 0))
        .agg(
            F.sum(_cents("l_tax")).alias("_st"),
            F.sum(_cents("l_discount")).alias("_sd"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            _round_div("_st", "_n * 100", 4).alias("avg_tax"),
            _round_div("_sd", "_n * 100", 4).alias("avg_discount"),
        )
    )


# ---------------------------------------------------------------------------
# Q13/Q14 — sort+limit without aggregation (insight_transkrip.sql:136-146)
# ---------------------------------------------------------------------------


@register(
    "q13_top5_customers_by_balance",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey ASC
    LIMIT 5
    """,
)
def q13_top5_customers_by_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 by attribute: ORDER BY DESC LIMIT without aggregation.

    Insight 13 (insight_transkrip.sql:136-140). Spark plans TakeOrderedAndProject —
    a per-partition top-k plus a driver merge; no global sort at scale.
    """
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(5)
    )


@register(
    "q14_top5_suppliers_by_balance",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    ORDER BY s_acctbal DESC, s_suppkey ASC
    LIMIT 5
    """,
)
def q14_top5_suppliers_by_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same bottom/top-k shape on the second entity dim.

    Insight 14 (insight_transkrip.sql:142-146).
    """
    return (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# Q15 — conditional aggregation / manual pivot (insight_transkrip.sql:148-156)
# ---------------------------------------------------------------------------


@register(
    "q15_returned_vs_kept_per_part",
    oracle="""
    SELECT p.p_partkey, p.p_name,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
           CAST(SUM(CASE WHEN l.l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey, p.p_name
    """,
)
def q15_returned_vs_kept_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pass/fail-counts analog: SUM(CASE WHEN) conditional aggregation.

    Insight 15 (insight_transkrip.sql:148-156).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("n_returned"),
            F.sum(F.when(F.col("l_returnflag") != "R", 1).otherwise(0)).alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Q16/Q17 — string-range binning + group-by-derived (insight_transkrip.sql:158-186)
# ---------------------------------------------------------------------------

_SEGMENT_SQL = """
        CASE
            WHEN substring(c_name, 16, 3) BETWEEN '001' AND '042' THEN 'SNBP'
            WHEN substring(c_name, 16, 3) BETWEEN '043' AND '116' THEN 'SNBT'
            WHEN substring(c_name, 16, 3) BETWEEN '117' AND '232' THEN 'Mandiri'
            ELSE 'Lainnya'
        END
"""


def _segment_col() -> F.Column:
    # String-range binning exactly as insight 16 (insight_transkrip.sql:160-166):
    # SUBSTRING then CASE WHEN x BETWEEN 'lo' AND 'hi' with STRING comparison
    # semantics (lexicographic on zero-padded digits).
    tail = F.substring("c_name", 16, 3)
    return (
        F.when(tail.between("001", "042"), "SNBP")
        .when(tail.between("043", "116"), "SNBT")
        .when(tail.between("117", "232"), "Mandiri")
        .otherwise("Lainnya")
    )


@register(
    "q16_customer_segment_binning",
    oracle=f"""
    SELECT c_custkey, c_name, {_SEGMENT_SQL} AS segment
    FROM customer
    """,
)
def q16_customer_segment_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admission-path analog: SUBSTRING + CASE WHEN BETWEEN string ranges.

    Insight 16 (insight_transkrip.sql:158-167); nrp positions 8..10
    become c_name positions 16..18 (the last 3 digits of the id).
    """
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", _segment_col().alias("segment"))
    )


@register(
    "q17_balance_by_segment",
    oracle=f"""
    SELECT segment,
           ((2 * SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) * 100 + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100))) / 100.0 AS avg_balance,
           COUNT(*) AS n_customers
    FROM (SELECT c_acctbal, {_SEGMENT_SQL} AS segment FROM customer) seg
    GROUP BY segment
    """,
)
def q17_balance_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-column groupBy: insight 17 (insight_transkrip.sql:169-186).

    Bin expression as a derived table, then AVG + COUNT per bin.
    """
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_acctbal", _segment_col().alias("segment"))
        .groupBy("segment")
        .agg(F.sum(_cents("c_acctbal")).alias("_s"), F.count(F.lit(1)).alias("n_customers"))
        .select(
            "segment",
            _round_div("_s", "n_customers * 100", 2).alias("avg_balance"),
            "n_customers",
        )
    )


# ---------------------------------------------------------------------------
# Q18 — plain grouped AVG (insight_transkrip.sql:188-197)
# ---------------------------------------------------------------------------


@register(
    "q18_avg_discount_per_customer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ((2 * SUM(CAST(ROUND(l.l_discount * 100) AS BIGINT)) * 10000 + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100))) / 10000.0 AS avg_discount
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q18_avg_discount_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unweighted mean grade analog: AVG per entity across the star join.

    Insight 18 (insight_transkrip.sql:188-197).
    """
    return (
        _li_orders_cust(spark, sf_dir)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(_cents("l_discount")).alias("_s"), F.count(F.lit(1)).alias("_n"))
        .select("c_custkey", "c_name", _round_div("_s", "_n * 100", 4).alias("avg_discount"))
    )


# ---------------------------------------------------------------------------
# Q19 — COUNT(DISTINCT CONCAT(...)) (insight_transkrip.sql:199-208)
# ---------------------------------------------------------------------------


@register(
    "q19_active_months_per_customer",
    oracle="""
    SELECT o_custkey AS c_custkey,
           COUNT(DISTINCT concat_ws('-', CAST(year(o_orderdate) AS INTEGER),
                                         CAST(month(o_orderdate) AS INTEGER))) AS n_active_months
    FROM orders
    GROUP BY o_custkey
    """,
)
def q19_active_months_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semesters-attended analog: COUNT(DISTINCT CONCAT(year,'-',month)).

    Insight 19 (insight_transkrip.sql:199-208). Distinct-aggregate over a
    derived concat; Spark plans this as a two-phase partial-distinct
    aggregation, no extra shuffle beyond the group key.
    """
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.countDistinct(
                F.concat_ws("-", F.year("o_orderdate"), F.month("o_orderdate"))
            ).alias("n_active_months")
        )
    )


# ---------------------------------------------------------------------------
# Q20 — grouped MIN (insight_transkrip.sql:210-219)
# ---------------------------------------------------------------------------


@register(
    "q20_min_discount_per_customer",
    oracle="""
    SELECT c.c_custkey, c.c_name, MIN(l.l_discount) AS min_discount
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q20_min_discount_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst-grade analog: MIN per entity.

    Insight 20 (insight_transkrip.sql:210-219).
    """
    return (
        _li_orders_cust(spark, sf_dir)
        .groupBy("c_custkey", "c_name")
        .agg(F.min("l_discount").alias("min_discount"))
    )


# ---------------------------------------------------------------------------
# Q21 — detail projection with multi-key sort (insight_transkrip.sql:221-230)
# ---------------------------------------------------------------------------


@register(
    "q21_order_detail_projection",
    oracle="""
    SELECT c.c_name, CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o.o_orderdate) AS INTEGER) AS order_month,
           o.o_totalprice
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q21_order_detail_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPS-trend analog: bare join + projection (sorting is presentation).

    Insight 21 (insight_transkrip.sql:221-230). The reference's ORDER BY
    is for display; the value set is order-insensitive so the oracle
    omits it (driver hashes order-insensitively).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            "o_totalprice",
        )
    )


# ---------------------------------------------------------------------------
# Q22 — LAG window + top-k of diffs (insight_transkrip.sql:232-255)
# ---------------------------------------------------------------------------

_CUST_ORDER_WINDOW_SQL = "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"


def _cust_order_window():
    return Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")


@register(
    "q22_top10_order_value_jumps",
    oracle=f"""
    SELECT * FROM (
        SELECT o_custkey AS c_custkey, o_orderkey,
               LAG(o_totalprice) OVER ({_CUST_ORDER_WINDOW_SQL}) AS prev_price,
               o_totalprice,
               ROUND(o_totalprice - LAG(o_totalprice) OVER ({_CUST_ORDER_WINDOW_SQL}), 2) AS jump
        FROM orders
    ) d
    WHERE prev_price IS NOT NULL
    ORDER BY jump DESC, c_custkey ASC, o_orderkey ASC
    LIMIT 10
    """,
)
def q22_top10_order_value_jumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Biggest IPS-jump analog: LAG over per-entity window, diff, top-10.

    Insight 22 (insight_transkrip.sql:232-255). The window orders by
    (o_orderdate, o_orderkey) — the unique key tie-break replaces the
    reference's reliance on insertion order (SURVEY.md §4.1).
    """
    w = _cust_order_window()
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            "o_totalprice",
            F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias("jump"),
        )
        .filter(F.col("prev_price").isNotNull())
        .orderBy(F.desc("jump"), F.asc("c_custkey"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q23 — HAVING on MIN (insight_transkrip.sql:258-266)
# ---------------------------------------------------------------------------


@register(
    "q23_consistent_big_spenders",
    oracle="""
    SELECT o_custkey AS c_custkey,
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_custkey
    HAVING MIN(o_totalprice) >= 100000
    """,
)
def q23_consistent_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable-high-GPA analog: MIN/MAX per entity, HAVING MIN >= threshold.

    Insight 23 (insight_transkrip.sql:258-266).
    """
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .filter(F.col("min_price") >= 100000)
    )


# ---------------------------------------------------------------------------
# Q24 — FIRST_VALUE/LAST_VALUE with explicit frame (insight_transkrip.sql:268-280)
# ---------------------------------------------------------------------------


@register(
    "q24_avg_first_last_order_value",
    oracle=f"""
    SELECT ((2 * SUM(CAST(ROUND(first_price * 100) AS BIGINT)) * 100 + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100))) / 100.0 AS avg_first_price,
           ((2 * SUM(CAST(ROUND(last_price * 100) AS BIGINT)) * 100 + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100))) / 100.0 AS avg_last_price
    FROM (
        SELECT DISTINCT o_custkey,
               FIRST_VALUE(o_totalprice) OVER (
                   {_CUST_ORDER_WINDOW_SQL}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_price,
               LAST_VALUE(o_totalprice) OVER (
                   {_CUST_ORDER_WINDOW_SQL}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
        FROM orders
    ) fl
    """,
)
def q24_avg_first_last_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean first-vs-last analog: FIRST/LAST_VALUE over an unbounded frame.

    Insight 24 (insight_transkrip.sql:268-280): explicit ROWS BETWEEN
    UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING frame, per-entity dedup,
    outer AVG x2.
    """
    w = _cust_order_window().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(w).alias("last_price"),
        )
        .distinct()
        .agg(
            F.sum(_cents("first_price")).alias("_sf"),
            F.sum(_cents("last_price")).alias("_sl"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            _round_div("_sf", "_n * 100", 2).alias("avg_first_price"),
            _round_div("_sl", "_n * 100", 2).alias("avg_last_price"),
        )
    )


# ---------------------------------------------------------------------------
# Q25 — latest-row-per-group via RANK then count (insight_transkrip.sql:283-294)
# ---------------------------------------------------------------------------


@register(
    "q25_count_customers_ending_small",
    oracle=f"""
    SELECT COUNT(*) AS n_customers
    FROM (
        SELECT o_custkey, o_totalprice,
               RANK() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rnk
        FROM orders
    ) latest
    WHERE rnk = 1 AND o_totalprice < 100000
    """,
)
def q25_count_customers_ending_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ending-GPA<2 analog: RANK DESC latest-per-group, filter, COUNT.

    Insight 25 (insight_transkrip.sql:283-294). o_orderkey DESC tie-break
    makes "latest" unique, so rnk=1 selects exactly one row per customer.
    """
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice", F.rank().over(w).alias("rnk"))
        .filter((F.col("rnk") == 1) & (F.col("o_totalprice") < 100000))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Q26 — bare join + projection (insight_transkrip.sql:296-302)
# ---------------------------------------------------------------------------


@register(
    "q26_order_values_feed",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_totalprice
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q26_order_values_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution feed analog: join + projection, no aggregation.

    Insight 26 (insight_transkrip.sql:296-302).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    ).select("c_custkey", "c_name", "o_totalprice")


# ---------------------------------------------------------------------------
# Q27 — consecutive-row pairing (insight_transkrip.sql:304-322)
# ---------------------------------------------------------------------------


@register(
    "q27_consecutive_order_pairs",
    oracle=f"""
    SELECT * FROM (
        SELECT o_custkey AS c_custkey, o_orderkey,
               o_totalprice,
               LAG(o_totalprice) OVER ({_CUST_ORDER_WINDOW_SQL}) AS prev_price
        FROM orders
    ) d
    WHERE prev_price IS NOT NULL
    """,
)
def q27_consecutive_order_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-semester-pairs analog, LAG form.

    Insight 27 (insight_transkrip.sql:304-322) hand-rolls a previous-row
    as-of join via a theta self-join plus a correlated NOT EXISTS
    between-exclusion. The reference SQL's OR/AND precedence makes its
    NOT EXISTS bind only to the second disjunct (SURVEY.md §2.5 note);
    we implement the *intended* semantics — each row paired with its
    immediate predecessor — which LAG expresses exactly, without the
    O(n²) self-join. See q27_theta_selfjoin_pairs for the literal
    theta-join formulation.
    """
    w = _cust_order_window()
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.lag("o_totalprice").over(w).alias("prev_price"),
        )
        .filter(F.col("prev_price").isNotNull())
    )


@register(
    "q27_theta_selfjoin_pairs",
    oracle="""
    SELECT a.o_custkey AS c_custkey,
           a.o_orderkey AS later_orderkey,
           b.o_orderkey AS earlier_orderkey,
           a.o_totalprice AS later_price,
           b.o_totalprice AS earlier_price
    FROM orders a
    JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND (a.o_orderdate > b.o_orderdate
          OR (a.o_orderdate = b.o_orderdate AND a.o_orderkey > b.o_orderkey))
    WHERE NOT EXISTS (
        SELECT 1 FROM orders m
        WHERE m.o_custkey = a.o_custkey
          AND (m.o_orderdate > b.o_orderdate
               OR (m.o_orderdate = b.o_orderdate AND m.o_orderkey > b.o_orderkey))
          AND (m.o_orderdate < a.o_orderdate
               OR (m.o_orderdate = a.o_orderdate AND m.o_orderkey < a.o_orderkey))
    )
    """,
)
def q27_theta_selfjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal theta self-join form of insight 27 (insight_transkrip.sql:304-322).

    Non-equi self-join on (same entity, strictly-later order) plus an
    anti-join excluding any order strictly between — the hand-rolled
    previous-row join, kept as an operator-coverage exhibit (theta join +
    NOT EXISTS). Implemented via LAG which is semantically identical and
    O(n log n) instead of O(n²) — at 100 TB the theta-join form is the
    one you must NOT run; the window form is the scale path. The oracle
    states the literal theta-join SQL to prove the equivalence.
    """
    w = _cust_order_window()
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("o_orderkey").alias("later_orderkey"),
            F.lag("o_orderkey").over(w).alias("earlier_orderkey"),
            F.col("o_totalprice").alias("later_price"),
            F.lag("o_totalprice").over(w).alias("earlier_price"),
        )
        .filter(F.col("earlier_orderkey").isNotNull())
    )


# ---------------------------------------------------------------------------
# Q28 — RANK within composite partition (insight_transkrip.sql:324-335)
# ---------------------------------------------------------------------------


@register(
    "q28_order_rank_within_month",
    oracle="""
    SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           o_totalprice,
           RANK() OVER (PARTITION BY year(o_orderdate), month(o_orderdate)
                        ORDER BY o_totalprice DESC) AS price_rank
    FROM orders
    """,
)
def q28_order_rank_within_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-semester ranking analog: RANK over (year, month) partitions.

    Insight 28 (insight_transkrip.sql:324-335). RANK (with gaps) is
    deterministic under ties, so no tie-break column is needed for
    value-equality with the oracle.
    """
    w = Window.partitionBy(F.year("o_orderdate"), F.month("o_orderdate")).orderBy(
        F.desc("o_totalprice")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            "o_totalprice",
            F.rank().over(w).alias("price_rank"),
        )
    )


# ---------------------------------------------------------------------------
# Q29 — window over aggregated rows (insight_transkrip.sql:337-356)
# ---------------------------------------------------------------------------


@register(
    "q29_biggest_monthly_drop",
    oracle="""
    SELECT * FROM (
        SELECT order_year, order_month, avg_price,
               ROUND(avg_price - LAG(avg_price) OVER (ORDER BY order_year, order_month), 2) AS price_drop
        FROM (
            SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
                   CAST(month(o_orderdate) AS INTEGER) AS order_month,
                   ((2 * SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) * 100 + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100))) / 100.0 AS avg_price
            FROM orders
            GROUP BY order_year, order_month
        ) monthly
    ) d
    WHERE price_drop IS NOT NULL
    ORDER BY price_drop ASC, order_year ASC, order_month ASC
    LIMIT 1
    """,
)
def q29_biggest_monthly_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Biggest collective drop analog: LAG over aggregated rows, LIMIT 1.

    Insight 29 (insight_transkrip.sql:337-356): groupBy AVG, then a
    global-window LAG over the aggregate output. The unpartitioned
    window is safe precisely because its input is |years × months| rows
    — aggregate first, window after (the order matters at scale).
    """
    monthly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(F.sum(_cents("o_totalprice")).alias("_s"), F.count(F.lit(1)).alias("_n"))
        .select(
            "order_year", "order_month", _round_div("_s", "_n * 100", 2).alias("avg_price")
        )
    )
    w = Window.orderBy("order_year", "order_month")
    return (
        monthly.select(
            "order_year",
            "order_month",
            "avg_price",
            F.round(F.col("avg_price") - F.lag("avg_price").over(w), 2).alias("price_drop"),
        )
        .filter(F.col("price_drop").isNotNull())
        .orderBy(F.asc("price_drop"), F.asc("order_year"), F.asc("order_month"))
        .limit(1)
    )


# ---------------------------------------------------------------------------
# Q30/Q31 — pivot and set operations (engine-completeness beyond the corpus)
# ---------------------------------------------------------------------------


@register(
    "q30_quantity_pivot_by_returnflag",
    oracle="""
    SELECT EXTRACT(year FROM o.o_orderdate) AS order_year,
           CAST(COALESCE(SUM(CASE WHEN l.l_returnflag = 'A' THEN l.l_quantity END), 0) AS BIGINT) AS qty_A,
           CAST(COALESCE(SUM(CASE WHEN l.l_returnflag = 'N' THEN l.l_quantity END), 0) AS BIGINT) AS qty_N,
           CAST(COALESCE(SUM(CASE WHEN l.l_returnflag = 'R' THEN l.l_quantity END), 0) AS BIGINT) AS qty_R
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def q30_quantity_pivot_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-class ``pivot``: quantity by year with one column per
    returnflag. The value list is DECLARED (A/N/R), which is the scale
    requirement — an undeclared pivot runs an extra distinct-values job
    and breaks when cardinality explodes; a declared one is a plain
    conditional aggregation (exactly the oracle's CASE columns)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select(F.year("o_orderdate").alias("order_year"), "l_returnflag", "l_quantity")
        .groupBy("order_year")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum("l_quantity"))
        .select(
            "order_year",
            F.coalesce(F.col("A"), F.lit(0)).cast("long").alias("qty_A"),
            F.coalesce(F.col("N"), F.lit(0)).cast("long").alias("qty_N"),
            F.coalesce(F.col("R"), F.lit(0)).cast("long").alias("qty_R"),
        )
    )


@register(
    "q31_set_ops_rich_vs_active",
    oracle="""
    SELECT 'both' AS segment, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        INTERSECT
        SELECT o_custkey AS c_custkey FROM orders
    ) i
    UNION ALL
    SELECT 'rich_only' AS segment, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders
    ) e
    """,
)
def q31_set_ops_rich_vs_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations in one plan: INTERSECT and EXCEPT between the
    high-balance customers and the customers with orders, UNION ALL'd
    with a segment tag. Catalyst plans intersect/except as left-semi /
    left-anti joins — the same primitives as q10/q10b, surfaced through
    the set-operator API."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    active = orders.select(F.col("o_custkey").alias("c_custkey"))
    both = rich.intersect(active).select(F.lit("both").alias("segment"), "c_custkey")
    rich_only = rich.exceptAll(active.distinct()).distinct().select(
        F.lit("rich_only").alias("segment"), "c_custkey"
    )
    return both.unionByName(rich_only)


@register(
    "q32_revenue_rollup",
    oracle="""
    SELECT EXTRACT(year FROM o.o_orderdate) AS order_year,
           l.l_returnflag AS returnflag,
           CAST(GROUPING(EXTRACT(year FROM o.o_orderdate)) AS BIGINT) AS g_year,
           CAST(GROUPING(l.l_returnflag) AS BIGINT) AS g_flag,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY ROLLUP (EXTRACT(year FROM o.o_orderdate), l.l_returnflag)
    """,
)
def q32_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregation via first-class ``rollup``: per (year,
    flag), per year, and grand total in ONE pass — Spark expands the
    grouping sets inside a single shuffle (Expand + one exchange), which
    at 100 TB replaces three separate jobs over the same input. GROUPING
    flags disambiguate data NULLs from subtotal rows."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select(F.year("o_orderdate").alias("order_year"), F.col("l_returnflag").alias("returnflag"), "l_quantity")
        .rollup("order_year", "returnflag")
        .agg(
            F.grouping("order_year").cast("long").alias("g_year"),
            F.grouping("returnflag").cast("long").alias("g_flag"),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        )
        .select("order_year", "returnflag", "g_year", "g_flag", "total_qty")
    )


@register(
    "q33_sql_above_average_balance",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT)
              * (SELECT COUNT(*) FROM customer)
          > (SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) FROM customer)
    """,
)
def q33_sql_above_average_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above the mean balance, through the ``spark.sql`` entry
    path (every other registry query uses the DataFrame API; the SQL
    surface over temp views is part of the engine contract — SURVEY.md
    §3.3) with two scalar subqueries that Catalyst turns into broadcast
    one-row joins. The predicate is pure integer arithmetic
    (bal_cents * N > Σcents) so the above/below boundary cannot drift
    with float summation order on either engine."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM v_customer
        WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT)
                  * (SELECT COUNT(*) FROM v_customer)
              > (SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) FROM v_customer)
        """
    )


@register(
    "q34_balance_quartiles",
    oracle="""
    SELECT c_custkey,
           NTILE(4) OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
)
def q34_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining rank-family windows in one pass: NTILE bucket,
    percent_rank and cume_dist over a globally ordered window (unique
    tie-break makes all three deterministic). A single global window is
    acceptable exactly when the input is entity-sized (customers), and
    that judgement — not the operator — is the scale decision."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return customer.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "q35_order_value_stats_by_status",
    oracle="""
    WITH x AS (
        SELECT o_orderstatus,
               CAST(ROUND(o_totalprice) AS BIGINT) AS p,
               CAST(length(o_orderpriority) AS BIGINT) + CAST(ROUND(o_totalprice) AS BIGINT) % 7 AS q
        FROM orders
    ),
    s AS (
        SELECT o_orderstatus, COUNT(*) AS n,
               SUM(p) AS sp, SUM(q) AS sq,
               SUM(p * p) AS spp, SUM(q * q) AS sqq, SUM(p * q) AS spq
        FROM x GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, CAST(n AS BIGINT) AS n_orders,
           sqrt((spp - CAST(sp AS DOUBLE) * sp / n) / (n - 1)) AS price_stddev,
           (spq - CAST(sp AS DOUBLE) * sq / n)
             / sqrt((spp - CAST(sp AS DOUBLE) * sp / n)
                    * (sqq - CAST(sq AS DOUBLE) * sq / n)) AS price_q_corr
    FROM s
    """,
)
def q35_order_value_stats_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics (sample stddev, Pearson correlation) per
    order status, computed from exact integer sums (the ag01 pattern:
    cents-scaled sums and sum-of-squares are order-independent longs;
    floats appear only in the last few ops, identically on both
    engines). The built-in corr()/stddev() compute the same formula with
    float partials whose summation order is partition-dependent — fine
    for analytics, wrong for a bit-stable oracle gate, so the exact-sum
    form is the one the engine ships."""
    orders = load_table(spark, sf_dir, "orders")
    x = orders.select(
        "o_orderstatus",
        F.round(F.col("o_totalprice")).cast("long").alias("p"),
        (
            F.length("o_orderpriority").cast("long")
            + F.round(F.col("o_totalprice")).cast("long") % 7
        ).alias("q"),
    )
    s = x.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p").alias("sp"),
        F.sum("q").alias("sq"),
        F.sum(F.col("p") * F.col("p")).alias("spp"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
        F.sum(F.col("p") * F.col("q")).alias("spq"),
    )
    n, sp, sq = F.col("n"), F.col("sp"), F.col("sq")
    spp, sqq, spq = F.col("spp"), F.col("sqq"), F.col("spq")
    var_p = (spp - sp.cast("double") * sp / n) / (n - 1)
    return s.select(
        "o_orderstatus",
        n.alias("n_orders"),
        F.sqrt(var_p).alias("price_stddev"),
        (
            (spq - sp.cast("double") * sq / n)
            / F.sqrt((spp - sp.cast("double") * sp / n) * (sqq - sq.cast("double") * sq / n))
        ).alias("price_q_corr"),
    )


@register(
    "q36_calendar_rollup",
    oracle="""
    SELECT EXTRACT(year FROM o_orderdate) AS order_year,
           EXTRACT(quarter FROM o_orderdate) AS order_quarter,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def q36_calendar_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-function rollup: year / quarter / ISO day-of-week.
    Engines disagree on day-of-week numbering (Spark dayofweek is
    1=Sunday, DuckDB dow is 0=Sunday), so both sides state ISO numbering
    explicitly — Spark via (dayofweek + 5) % 7 + 1, DuckDB via
    isodow() — the kind of dialect normalization a multi-engine
    deployment does once, centrally."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("order_year"),
            F.quarter("o_orderdate").alias("order_quarter"),
            (((F.dayofweek("o_orderdate") + 5) % 7) + 1).cast("long").alias("iso_dow"),
        )
        .groupBy("order_year", "order_quarter", "iso_dow")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q37_revenue_cube",
    oracle="""
    SELECT EXTRACT(year FROM o.o_orderdate) AS order_year,
           l.l_returnflag AS returnflag,
           CAST(GROUPING(EXTRACT(year FROM o.o_orderdate)) AS BIGINT) AS g_year,
           CAST(GROUPING(l.l_returnflag) AS BIGINT) AS g_flag,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY CUBE (EXTRACT(year FROM o.o_orderdate), l.l_returnflag)
    """,
)
def q37_revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE sibling of q32's rollup: all four grouping sets — (year,
    flag), (year), (flag), () — in one Expand + one shuffle. The
    flag-only marginals are what rollup's hierarchy omits."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select(
            F.year("o_orderdate").alias("order_year"),
            F.col("l_returnflag").alias("returnflag"),
            "l_quantity",
        )
        .cube("order_year", "returnflag")
        .agg(
            F.grouping("order_year").cast("long").alias("g_year"),
            F.grouping("returnflag").cast("long").alias("g_flag"),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        )
        .select("order_year", "returnflag", "g_year", "g_flag", "total_qty")
    )


@register(
    "q38_above_nation_avg_balance",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer c
    WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT)
              * (SELECT COUNT(*) FROM customer c2
                 WHERE c2.c_nationkey = c.c_nationkey)
          > (SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) FROM customer c2
             WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def q38_above_nation_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their OWN nation's mean balance — the correlated
    scalar-subquery pattern (q33's global version made per-group).
    Written as correlated SQL so Catalyst's decorrelation rewrites it:
    the per-row subplan becomes one 25-row aggregate joined back on
    c_nationkey (broadcast at any scale — |nations| is constant). The
    comparison is integer cents x group count vs group cents sum, so the
    above/below boundary cannot drift with float summation order on
    either engine at any scale factor."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer_q38")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM v_customer_q38 c
        WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT)
                  * (SELECT COUNT(*) FROM v_customer_q38 c2
                     WHERE c2.c_nationkey = c.c_nationkey)
              > (SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) FROM v_customer_q38 c2
                 WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@register(
    "q39_grouping_sets_revenue",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           o_orderstatus,
           o_orderpriority,
           CAST(GROUPING(CAST(EXTRACT(year FROM o_orderdate) AS INT)) AS BIGINT) AS g_year,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS (
        (CAST(EXTRACT(year FROM o_orderdate) AS INT)),
        (o_orderstatus),
        (CAST(EXTRACT(year FROM o_orderdate) AS INT), o_orderpriority)
    )
    """,
)
def q39_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous rollup in ONE pass: total order value and count by
    (year), by (status), and by (year, priority) via GROUPING SETS,
    with GROUPING() flags disambiguating which set each output row
    belongs to (NULL group values are ambiguous on their own). The
    cube (q37) materializes the full lattice; grouping sets names just
    the marginals a dashboard actually reads — at 100 TB that's the
    difference between 3 aggregates and 2^k.

    Spark expands the sets with one Expand node feeding a single
    hash aggregate (partial map-side, one shuffle) — the same cost
    shape as a single groupBy, not one scan per set. Integer-cents
    sums keep every total partition-order independent."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_q39")
    return spark.sql(
        """
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
               o_orderstatus,
               o_orderpriority,
               CAST(GROUPING(CAST(EXTRACT(year FROM o_orderdate) AS INT)) AS BIGINT) AS g_year,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS total_cents,
               COUNT(*) AS n_orders
        FROM v_orders_q39
        GROUP BY GROUPING SETS (
            (CAST(EXTRACT(year FROM o_orderdate) AS INT)),
            (o_orderstatus),
            (CAST(EXTRACT(year FROM o_orderdate) AS INT), o_orderpriority)
        )
        """
    )


@register(
    "q40_unpivot_lineitem_measures",
    oracle="""
    WITH agg AS (
        SELECT l_returnflag,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS quantity,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS extendedprice,
               CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS discount,
               CAST(SUM(CAST(ROUND(l_tax * 100) AS BIGINT)) AS BIGINT) AS tax
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, total_cents FROM (
        SELECT l_returnflag, 'quantity' AS measure, quantity AS total_cents FROM agg
        UNION ALL
        SELECT l_returnflag, 'extendedprice', extendedprice FROM agg
        UNION ALL
        SELECT l_returnflag, 'discount', discount FROM agg
        UNION ALL
        SELECT l_returnflag, 'tax', tax FROM agg
    )
    """,
)
def q40_unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape (UNPIVOT/melt) of the four lineitem money
    measures into (measure, total_cents) rows per return flag.

    Scale note: the unpivot runs AFTER the aggregation, not before —
    melting the raw fact first would 4x the shuffle volume for an
    identical result, so the plan aggregates the wide row (one shuffle
    of |groups| rows, map-side partial agg) and reshapes only the tiny
    aggregated table. Integer-cents sums keep values partition-order
    independent (relational.py exact-sum rule)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    agg = lineitem.groupBy("l_returnflag").agg(
        *[
            F.sum(_cents(f"l_{m}")).alias(m)
            for m in ("quantity", "extendedprice", "discount", "tax")
        ]
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["quantity", "extendedprice", "discount", "tax"],
        variableColumnName="measure",
        valueColumnName="total_cents",
    )


@register(
    "q41_nation_customer_supplier_census",
    oracle="""
    WITH c AS (
        SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
        FROM customer GROUP BY c_nationkey
    ), s AS (
        SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
        FROM supplier GROUP BY s_nationkey
    )
    SELECT n.n_name,
           COALESCE(c.n_customers, 0) AS n_customers,
           COALESCE(s.n_suppliers, 0) AS n_suppliers,
           COALESCE(c.n_customers, 0) - COALESCE(s.n_suppliers, 0) AS customer_surplus
    FROM nation n
    FULL OUTER JOIN c ON n.n_nationkey = c.nationkey
    FULL OUTER JOIN s ON n.n_nationkey = s.nationkey
    """,
)
def q41_nation_customer_supplier_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation customer vs supplier census via FULL OUTER joins with
    COALESCE(0) null-repair — the outer-join surface the reference
    corpus never exercises (SURVEY §2.6 notes only inner/anti appear).

    Both inputs are pre-aggregated to |nations| rows before joining, so
    the outer join is a 25-row reconciliation regardless of fact-table
    scale; the counts themselves are single-shuffle partial aggregates."""
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    s = supplier.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    out = (
        nation.join(c, nation["n_nationkey"] == c["nationkey"], "full_outer")
        .drop("nationkey")
        .join(s, nation["n_nationkey"] == s["nationkey"], "full_outer")
    )
    n_cust = F.coalesce("n_customers", F.lit(0))
    n_supp = F.coalesce("n_suppliers", F.lit(0))
    return out.select(
        "n_name",
        n_cust.alias("n_customers"),
        n_supp.alias("n_suppliers"),
        (n_cust - n_supp).alias("customer_surplus"),
    )


@register(
    "q43_recursive_ancestor_paths",
    oracle="""
    WITH RECURSIVE anc(c_custkey, ancestor, depth) AS (
        SELECT c_custkey, c_custkey, CAST(0 AS BIGINT) FROM customer
        UNION ALL
        SELECT c_custkey, ancestor // 2, depth + 1 FROM anc WHERE ancestor > 1
    )
    SELECT c_custkey, ancestor, depth,
           CAST(ancestor = 1 AS BOOLEAN) AS is_root
    FROM anc
    """,
)
def q43_recursive_ancestor_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``WITH RECURSIVE`` (Spark 4) through the SQL entry path:
    every customer's full ancestor chain in the implicit binary-heap
    hierarchy parent(k) = k div 2 — one row per (customer, ancestor)
    with the hop depth, down to the root. The recursion is genuinely
    unrolled by the engine's UnionLoop (not a window or a driver
    loop), and DuckDB runs the identical recursive CTE, so the hash
    certifies termination, per-round integer arithmetic, and the
    column-list binding of the recursive relation.

    Scale: depth is log2(max key) (~21 at a billion keys), each round
    is one filter + projection over the frontier (no joins, no
    shuffle growth), output is N x depth rows — the benign recursion
    shape; cyclic or exponential recursions are where dd09's bounded
    driver loop with explicit convergence counting remains the
    production pattern."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer_rec")
    return spark.sql(
        """
        WITH RECURSIVE anc(c_custkey, ancestor, depth) AS (
            SELECT c_custkey, c_custkey, CAST(0 AS BIGINT) FROM v_customer_rec
            UNION ALL
            SELECT c_custkey, ancestor DIV 2, depth + 1 FROM anc WHERE ancestor > 1
        )
        SELECT c_custkey, ancestor, depth, (ancestor = 1) AS is_root
        FROM anc
        """
    )


@register(
    "q44_lateral_top_orders",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.cents
    FROM customer c, LATERAL (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY cents DESC, o_orderkey ASC
        LIMIT 2
    ) t
    """,
)
def q44_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT (top-2 orders
    per customer) through the SQL entry path — the per-row-subquery
    surface Catalyst decorrelates into a ranked join rather than
    executing N point queries (the reference's N+1 get_or_create
    pattern is exactly what this operator exists to replace). DuckDB
    runs the identical LATERAL text, so the hash certifies the
    decorrelation is semantics-preserving, including the deterministic
    (cents DESC, orderkey ASC) tie-break and the inner-lateral drop of
    customers without orders.

    Scale: Catalyst rewrites to window-rank-over-join — one shuffle on
    the correlation key, never a driver loop; at 100 TB this is the
    same plan as a groupBy top-k."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_cust_lat")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_ord_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.cents
        FROM v_cust_lat c, LATERAL (
            SELECT o_orderkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM v_ord_lat
            WHERE o_custkey = c.c_custkey
            ORDER BY cents DESC, o_orderkey ASC
            LIMIT 2
        ) t
        """
    )
