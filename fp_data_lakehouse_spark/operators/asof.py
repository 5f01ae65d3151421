"""As-of (point-in-time) join — the classic operator Spark's DataFrame
API lacks natively: for each left row, the single latest right row with
``right.ts <= left.ts`` within the same key group.

Implemented with the union+window formulation, not a range self-join:
tag both sides, union them, sort each key group by (ts, side) with the
right side first at equal timestamps (<= semantics), and carry the last
non-null right payload forward with ``last(..., ignorenulls=True)`` over
an unbounded-preceding frame. ONE shuffle on the key columns, no UDF,
no N×M candidate blowup — the join cost is a sort within key groups,
which is exactly what a 100 TB backtest/attribution join needs. The
non-equi-join formulation (t1 >= t2 + max-per-group) shuffles the same
data but materializes every candidate pair first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.catalog import load_table
from .registry import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: list[str],
    tiebreak_col: str,
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[ts_col] <= left[ts_col]`` sharing ``by_cols``. ``inner``
    drops left rows with no prior right row; ``left`` keeps them with
    null right columns (ASOF LEFT JOIN).

    ``tiebreak_col`` must exist on both sides; it makes the pick
    deterministic when several right rows share a timestamp (highest
    wins). Output columns: by_cols, then left columns prefixed ``l_``,
    then matched right columns prefixed ``r_``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join: how must be 'inner' or 'left', got {how!r}")
    lpay = [c for c in left.columns if c not in by_cols]
    rpay = [c for c in right.columns if c not in by_cols]

    l = left.select(
        *by_cols,
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
        F.struct(*lpay).alias("_l"),
        F.lit(1).alias("_side"),
    ).withColumn("_r", F.lit(None).cast(right.select(F.struct(*rpay).alias("s")).schema["s"].dataType))
    r = right.select(
        *by_cols,
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
        F.lit(None).cast(left.select(F.struct(*lpay).alias("s")).schema["s"].dataType).alias("_l"),
        F.lit(0).alias("_side"),
        F.struct(*rpay).alias("_r"),
    )
    u = l.select(r.columns).unionByName(r)

    w = (
        Window.partitionBy(*by_cols)
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    if how == "inner":
        matched = matched.filter(F.col("_m").isNotNull())
    out = matched.select(
        *by_cols,
        *[F.col(f"_l.{c}").alias(f"l_{c}") for c in lpay],
        *[F.col(f"_m.{c}").alias(f"r_{c}") for c in rpay],
    )
    return out


@register(
    "ev05_purchase_click_attribution",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id AS purchase_id,
           p.user_id,
           CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_ep,
           c.event_id AS click_id,
           CAST(floor(epoch(c.ts)) AS BIGINT) AS click_ep,
           CAST(floor(epoch(p.ts)) AS BIGINT)
             - CAST(floor(epoch(c.ts)) AS BIGINT) AS gap_sec
    FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def ev05_purchase_click_attribution(spark, sf_dir: str) -> DataFrame:
    """Attribution as-of join: each purchase matched to the user's most
    recent click at-or-before it — oracle-checked against DuckDB's
    native ASOF JOIN, proving the union+window formulation implements
    the standard semantics."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(purchases, clicks, "ts", ["user_id"], "event_id")
    return joined.select(
        F.col("l_event_id").alias("purchase_id"),
        "user_id",
        F.unix_timestamp("l_ts").alias("purchase_ep"),
        F.col("r_event_id").alias("click_id"),
        F.unix_timestamp("r_ts").alias("click_ep"),
        (F.unix_timestamp("l_ts") - F.unix_timestamp("r_ts")).alias("gap_sec"),
    )


@register(
    "ev17_asof_click_before_purchase",
    oracle="""
    WITH p AS (SELECT event_id AS purchase_id, user_id, ts, epoch_us(ts) AS purchase_us
               FROM events WHERE event_type = 'purchase'),
    c AS (
        SELECT user_id, ts, MAX(event_id) AS click_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    )
    SELECT p.purchase_id,
           p.user_id,
           p.purchase_us,
           c.click_id,
           p.purchase_us - epoch_us(c.ts) AS staleness_us
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def ev17_asof_click_before_purchase(spark, sf_dir: str) -> DataFrame:
    """ASOF **LEFT** join (ev05's outer dual): every purchase, annotated
    with the user's most recent click at-or-before it or nulls when no
    click precedes — the variant a feature pipeline needs when absent
    history is itself the feature. Equal-timestamp clicks collapse to
    the max event_id first so both engines' tie-breaks agree; oracle is
    DuckDB's native ASOF LEFT JOIN."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    joined = asof_join(purchases, clicks, "ts", ["user_id"], "event_id", how="left")
    return joined.select(
        F.col("l_event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros(F.col("l_ts")).alias("purchase_us"),
        F.col("r_event_id").alias("click_id"),
        (F.unix_micros(F.col("l_ts")) - F.unix_micros(F.col("r_ts"))).alias(
            "staleness_us"
        ),
    )
