"""Range (interval) join — all right rows within a time window of each
left row, per key — via bucketing, not a naive non-equi join.

A plain ``|t_r - t_l| <= W`` theta-join degenerates to per-key nested
loops (every pair of a hot key's rows is a candidate). Bucketing makes
it an EQUI-join: with bucket width = W, a right row in bucket b can
only match left rows in buckets {b-1, b, b+1}, so the left side
explodes to its 3 candidate buckets, both sides shuffle on
(key, bucket), and the exact window predicate filters the equi-join
output. Candidate work drops from Σ n_l·n_r per key to Σ per-bucket
products — the standard interval-join layout (Flink's interval join
and DuckDB's IEJoin solve the same blowup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register


def range_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: list[str],
    window_us: int,
) -> DataFrame:
    """Pairs (left, right) sharing ``by_cols`` with
    ``|right.ts - left.ts| <= window_us`` (timestamps compared in
    microseconds — integral, so the boundary is exact on any engine).

    Output: by_cols, left payload prefixed ``l_``, right payload
    prefixed ``r_``, and ``diff_us`` (right minus left).
    """
    lpay = [c for c in left.columns if c not in by_cols]
    rpay = [c for c in right.columns if c not in by_cols]

    l = left.select(
        *by_cols,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_lus"),
        *[F.col(c).alias(f"l_{c}") for c in lpay],
    ).withColumn(
        "_bucket",
        F.explode(
            F.array(
                *[
                    (F.floor(F.col("_lus") / window_us) + d).cast("long")
                    for d in (-1, 0, 1)
                ]
            )
        ),
    )
    r = right.select(
        *by_cols,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_rus"),
        *[F.col(c).alias(f"r_{c}") for c in rpay],
    ).withColumn("_bucket", F.floor(F.col("_rus") / window_us).cast("long"))

    return (
        l.join(r, by_cols + ["_bucket"])
        .filter(F.abs(F.col("_rus") - F.col("_lus")) <= window_us)
        .select(
            *by_cols,
            *[f"l_{c}" for c in lpay],
            *[f"r_{c}" for c in rpay],
            (F.col("_rus") - F.col("_lus")).alias("diff_us"),
        )
    )


_WINDOW_US = 5 * 60 * 1_000_000  # ±5 minutes


@register(
    "ev08_error_click_proximity",
    oracle=f"""
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
               WHERE event_type = 'error'),
    c AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
          WHERE event_type = 'click')
    SELECT e.event_id AS error_id,
           c.event_id AS click_id,
           e.user_id,
           c.us - e.us AS diff_us
    FROM e JOIN c ON e.user_id = c.user_id
    WHERE abs(c.us - e.us) <= {_WINDOW_US}
    """,
)
def ev08_error_click_proximity(spark, sf_dir: str) -> DataFrame:
    """Every (error, click) pair of the same user within ±5 minutes —
    the bucketed range join, oracle-checked against the literal
    BETWEEN formulation."""
    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    joined = range_join(errors, clicks, "ts", ["user_id"], _WINDOW_US)
    return joined.select(
        F.col("l_event_id").alias("error_id"),
        F.col("r_event_id").alias("click_id"),
        "user_id",
        "diff_us",
    )

