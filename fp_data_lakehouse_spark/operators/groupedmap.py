"""Grouped-map (``applyInPandas``) operators and the lesson of when NOT
to use them.

``applyInPandas`` invokes Python once per GROUP: with many tiny groups
the per-call pandas overhead dominates (measured ~20s for 15k
customer-sized groups at sf0.1 vs ~1s native). So the per-customer
spend slope (ag01) is implemented with native aggregations — its math
is just integer sums — and the grouped-map API is reserved for ag02,
whose per-group computation (median + MAD + filtered count, two
dependent order statistics) has FEW large groups and no clean
single-pass aggregate form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.catalog import load_table
from .registry import register


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
    """Per-customer least-squares spend trend (cents per second), fully
    native: slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) over exact integer
    sums, x shifted by the per-group minimum so the squares stay far
    inside int64. One window + one groupBy sharing the custkey
    partitioning (single shuffle); the only float op is the final
    division, identical on both engines.

    Deliberately NOT applyInPandas: 15k tiny groups × per-call pandas
    overhead measured ~20x slower than this formulation."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey")
    pts = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("x0"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    ).withColumn("x", F.col("x0") - F.min("x0").over(w))
    sums = pts.groupBy("c_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return sums.select(
        "c_custkey",
        F.col("n").alias("n_orders"),
        F.when(den != 0, num.cast("double") / den).alias("slope"),
    )


_MAD_K = 3.0


def _outliers_of_group(pdf: pd.DataFrame) -> pd.DataFrame:
    v = pdf["value"].to_numpy(dtype=np.float64)
    med = float(np.median(v))
    mad = float(np.median(np.abs(v - med)))
    n_out = int((np.abs(v - med) > _MAD_K * mad).sum()) if mad > 0 else 0
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n_events": [len(v)],
            "med": [med],
            "mad": [mad],
            "n_outliers": [n_out],
        }
    )


@register(
    "ag02_event_value_outliers",
    oracle=f"""
    WITH stats AS (
        SELECT event_type, COUNT(*) AS n_events,
               median(value) AS med,
               mad(value) AS mad
        FROM events GROUP BY event_type
    )
    SELECT s.event_type, CAST(s.n_events AS BIGINT) AS n_events, s.med, s.mad,
           CAST(CASE WHEN s.mad > 0 THEN (
               SELECT COUNT(*) FROM events e
               WHERE e.event_type = s.event_type
                 AND abs(e.value - s.med) > {_MAD_K} * s.mad
           ) ELSE 0 END AS BIGINT) AS n_outliers
    FROM stats s
    """,
)
def ag02_event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier census — median, MAD, and the count of
    values beyond 3 MADs — via ``applyInPandas``: two DEPENDENT order
    statistics plus a filtered recount have no single-pass aggregate
    form, and the grouping key (event type) has FEW large groups, which
    is exactly the grouped-map sweet spot (one vectorized numpy pass
    per Arrow batch; per-group call overhead amortized over ~20k rows).
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandas(
            _outliers_of_group,
            schema="event_type string, n_events long, med double, mad double, n_outliers long",
        )
    )


_EWMA_ALPHA = 0.125  # exactly representable: 1/8


def _ewma_of_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    vals = pdf["value"].to_numpy(dtype=np.float64)
    acc = np.float64(vals[0])
    a = np.float64(_EWMA_ALPHA)
    for v in vals[1:]:
        acc = acc + a * (np.float64(v) - acc)
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "n_events": [np.int64(len(vals))],
            "ewma": [acc],
        }
    )


@register(
    "ag03_user_value_ewma",
    oracle=f"""
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           list_reduce(vals, (acc, v) -> acc + {_EWMA_ALPHA} * (v - acc)) AS ewma
    FROM (
        SELECT user_id, list(value ORDER BY ts, event_id) AS vals
        FROM events GROUP BY user_id
    )
    """,
)
def ag03_user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event value
    (alpha = 1/8), the recency-weighted engagement feature stateful
    scorers keep. EWMA is an inherently SEQUENTIAL left fold —
    y_t = y_{{t-1}} + a(x_t - y_{{t-1}}) has no order-free aggregate
    form — which is precisely the grouped-map niche: ``applyInPandas``
    gives each user's ordered series to one Python call.

    Both engines run the IDENTICAL IEEE-754 recursion (an explicit
    float64 fold here, DuckDB ``list_reduce`` with the same expression),
    so results match bit-for-bit despite being float chains — the
    sequential twin of the integer-cents trick. One shuffle on user_id;
    state per group is one double. (pandas ``.ewm`` computes the
    algebraically-equal ``(1-a)y + ax`` form, which differs in the last
    ulp — the explicit fold is what makes the oracle exact.)"""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(
            _ewma_of_group,
            schema="user_id long, n_events long, ewma double",
        )
    )


@register(
    "ag04_winsorized_event_values",
    oracle="""
    WITH ranked AS (
        SELECT event_id, user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY value, event_id) AS r,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM events
    ),
    bounds AS (
        SELECT user_id,
               MAX(CASE WHEN r = (n + 19) // 20 THEN value END) AS lo,
               MAX(CASE WHEN r = (19 * n + 19) // 20 THEN value END) AS hi
        FROM ranked GROUP BY user_id
    )
    SELECT k.event_id, k.user_id, k.value,
           least(greatest(k.value, b.lo), b.hi) AS value_winsorized
    FROM ranked k JOIN bounds b USING (user_id)
    """,
)
def ag04_winsorized_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization: each user's event values clipped to that
    user's [p05, p95] — the standard outlier-taming step before features
    feed a trainer. Quantiles are exact NEAREST-RANK (k = ceil(p*n) via
    pure integer arithmetic, (19n+19) div 20), not interpolated: the
    clip bounds are values that exist in the data, so both engines agree
    exactly with no float-interpolation drift.

    Two window passes over one hash partitioning on user_id (rank, then
    group max of the two flagged ranks) and a broadcast-sized bounds
    join — no second shuffle of the event rows; per-group state is two
    doubles regardless of corpus size."""
    events = load_table(spark, sf_dir, "events")
    wg = Window.partitionBy("user_id")
    wo = Window.partitionBy("user_id").orderBy("value", "event_id")
    ranked = events.select("event_id", "user_id", "value").withColumn(
        "r", F.row_number().over(wo)
    ).withColumn("n", F.count(F.lit(1)).over(wg))
    lo = F.max(F.when(F.col("r") == F.expr("(n + 19) div 20"), F.col("value"))).over(wg)
    hi = F.max(
        F.when(F.col("r") == F.expr("(19 * n + 19) div 20"), F.col("value"))
    ).over(wg)
    return ranked.select(
        "event_id",
        "user_id",
        "value",
        F.least(F.greatest(F.col("value"), lo), hi).alias("value_winsorized"),
    )


_HIST_BINS = 20


@register(
    "ag05_value_histogram",
    oracle=f"""
    WITH bounds AS (
        SELECT MIN(value) AS vmin, MAX(value) AS vmax FROM events
    ),
    binned AS (
        SELECT e.event_type,
               CAST(LEAST(FLOOR(((e.value - b.vmin) * {_HIST_BINS}.0)
                                / (b.vmax - b.vmin)),
                          {_HIST_BINS - 1}) AS BIGINT) AS bin,
               b.vmin, b.vmax
        FROM events e CROSS JOIN bounds b
    )
    SELECT event_type, bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(vmin) + bin * ((MIN(vmax) - MIN(vmin)) / {_HIST_BINS}.0) AS bin_lo,
           MIN(vmin) + (bin + 1) * ((MIN(vmax) - MIN(vmin)) / {_HIST_BINS}.0) AS bin_hi
    FROM binned
    GROUP BY event_type, bin
    """,
)
def ag05_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (20 bins over the global value range) per
    event type — the distribution snapshot behind drift monitors,
    sanity dashboards, and optimizer statistics. The global bounds
    arrive as a broadcast 1-row aggregate; bin assignment is pure
    column arithmetic in the scan stage; the only shuffle carries
    (type, bin) pairs — at most |types| x 20 groups out however many
    trillion rows go in. The bin expression keeps one canonical
    operation order ((v - min) * bins, then divide) so both engines
    floor the identical IEEE double; the top edge folds into the last
    bin via LEAST."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    binned = events.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.least(
            F.floor(
                ((F.col("value") - F.col("vmin")) * float(_HIST_BINS))
                / (F.col("vmax") - F.col("vmin"))
            ),
            F.lit(_HIST_BINS - 1),
        )
        .cast("long")
        .alias("bin"),
        "vmin",
        "vmax",
    )
    return binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.min("vmin")
            + F.col("bin") * ((F.min("vmax") - F.min("vmin")) / float(_HIST_BINS))
        ).alias("bin_lo"),
        (
            F.min("vmin")
            + (F.col("bin") + 1)
            * ((F.min("vmax") - F.min("vmin")) / float(_HIST_BINS))
        ).alias("bin_hi"),
    )
