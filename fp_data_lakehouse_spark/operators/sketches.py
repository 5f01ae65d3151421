"""Sketch / approximation operators over the events table: cardinality
estimation (HyperLogLog++) and quantiles, exact and approximate.

The 100 TB rationale: COUNT(DISTINCT) and exact percentiles are the two
aggregations whose exact forms stop scaling first — exact distinct
shuffles every key, exact percentiles sort the column. The sketch forms
(HLL++ via ``approx_count_distinct``, the Greenwald-Khanna/KLL-style
``approx_percentile``) are one-pass, fixed-memory, mergeable across
partitions — the map-side-combine shape that keeps working at any
scale. Both ship next to their exact twins: the exact operator is the
oracle-checked ground truth, the sketch is the scale path, and pytest
bounds the sketch error against the exact answer (same pattern as the
LSH dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

_QUANTILES = (0.25, 0.5, 0.75, 0.99)
_HLL_RSD = 0.02  # relative standard deviation target for HLL++


@register(
    "sk01_user_cardinality_exact",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def sk01_user_cardinality_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user count per event type — the ground truth the
    HLL sketch (sk02) is bounded against. Exact distinct expands to a
    two-phase aggregate (dedup shuffle on (event_type, user_id), then
    count); at 100 TB that first shuffle is the cost sk02 deletes."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register("sk02_user_cardinality_hll")
def sk02_user_cardinality_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user estimate per event type at 2% target
    RSD: one pass, fixed sketch memory per group, partial aggregates
    merge map-side. Approximate → rows-only driver check; pytest bounds
    the relative error against sk01."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=_HLL_RSD).alias("n_users_approx"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "sk03_value_quantiles_exact",
    oracle=f"""
    SELECT event_type,
           quantile_cont(value, {_QUANTILES[0]}) AS p25,
           quantile_cont(value, {_QUANTILES[1]}) AS p50,
           quantile_cont(value, {_QUANTILES[2]}) AS p75,
           quantile_cont(value, {_QUANTILES[3]}) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def sk03_value_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous quantiles of event value per type. Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` implement the same
    linear interpolation (verified equal at 6 decimals on the
    fixtures). Exact quantiles buffer the group's values — the cost
    sk04's mergeable sketch removes."""
    events = load_table(spark, sf_dir, "events")
    qs = events.groupBy("event_type").agg(
        *[
            F.expr(f"percentile(value, {q})").alias(name)
            for q, name in zip(_QUANTILES, ("p25", "p50", "p75", "p99"))
        ]
    )
    return qs


@register("sk04_value_quantiles_approx")
def sk04_value_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile sketch of the same quantiles (accuracy 10000 ~
    max rank error 0.01%): bounded memory, mergeable partials.
    Approximate → rows-only driver check; pytest bounds the error
    against sk03."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        *[
            F.expr(f"approx_percentile(value, {q}, 10000)").alias(name)
            for q, name in zip(_QUANTILES, ("p25", "p50", "p75", "p99"))
        ]
    )


# heavy-hitter threshold: users holding >= 0.2% of all events
_HH_NUM, _HH_DEN = 2, 1000


@register(
    "sk05_heavy_hitters",
    oracle=f"""
    WITH counts AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id
    ),
    total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM events)
    SELECT user_id, n_events,
           CAST(n_events AS DOUBLE) / n_total AS share
    FROM counts, total
    WHERE n_events * {_HH_DEN} >= n_total * {_HH_NUM}
    """,
)
def sk05_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: every key holding >= 0.2% of all events,
    with its share. The skew census that decides when `operators/skew.py`
    salting or AQE skew-join handling is needed — run it on join keys
    BEFORE the join that dies. The phi-fraction cut is an integer
    cross-multiplication (no float boundary); share is one IEEE
    division.

    One map-side-combined groupBy; the total arrives as a broadcast
    1-row cross join, never a collect. Output is at most 1/phi = 500
    rows regardless of corpus size — the defining property of the
    heavy-hitter decomposition (space-saving sketches bound the same
    set approximately when even the per-key groupBy is too wide)."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    total = events.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n_events") * _HH_DEN >= F.col("n_total") * _HH_NUM)
        .select(
            "user_id",
            "n_events",
            (F.col("n_events").cast("double") / F.col("n_total")).alias("share"),
        )
    )


# Count-min sketch geometry: d hash rows x w buckets. md5-derived
# bucketing (the same engine-portable hash as the sampling/minhash
# families) makes the WHOLE sketch deterministic, so unlike typical
# sketch ops it has a full DuckDB oracle — both engines build the
# identical counter matrix and read the identical estimates.
_CMS_D = 4
_CMS_W = 64

_CMS_BUCKET = (
    "pmod(cast(conv(substring(md5(concat(cast(user_id as string), '#',"
    " cast(seed as string))), 1, 15), 16, 10) as bigint), {w})"
).format(w=_CMS_W)
_CMS_BUCKET_SQL = (
    "((('0x' || substring(md5(CAST(user_id AS VARCHAR) || '#' ||"
    " CAST(seed AS VARCHAR)), 1, 15))::BIGINT) % {w})"
).format(w=_CMS_W)


@register(
    "sk06_count_min_heavy_users",
    oracle=f"""
    WITH counts AS (
        SELECT user_id, COUNT(*) AS exact_count FROM events GROUP BY user_id
    ),
    seeds AS (SELECT unnest(range({_CMS_D})) AS seed),
    keyed AS (
        SELECT c.user_id, c.exact_count, s.seed,
               {_CMS_BUCKET_SQL} AS bucket
        FROM counts c CROSS JOIN seeds s
    ),
    counters AS (
        SELECT seed, bucket, CAST(SUM(exact_count) AS BIGINT) AS cell
        FROM keyed GROUP BY seed, bucket
    )
    SELECT k.user_id,
           CAST(MAX(k.exact_count) AS BIGINT) AS exact_count,
           CAST(MIN(t.cell) AS BIGINT) AS cms_count
    FROM keyed k JOIN counters t USING (seed, bucket)
    GROUP BY k.user_id
    ORDER BY exact_count DESC, user_id
    LIMIT 20
    """,
)
def sk06_count_min_heavy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (4x64) read back for the top-20 heaviest
    users, next to their exact counts — cms_count >= exact_count always,
    with equality unless the user's buckets all collide.

    The build is the mergeable-partial shape that matters at 100 TB:
    one map-side-combined groupBy(user_id) reduces the corpus to per-key
    counts, and the sketch matrix (d x w = 4x64 cells) is derived
    from that tiny table — the corpus itself is never exploded d-fold.
    On an unbounded stream the same matrix is maintained incrementally
    per partition and merged by cell-wise addition."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_count"))
    keyed = counts.withColumn(
        "seed", F.explode(F.array(*[F.lit(i) for i in range(_CMS_D)]))
    ).withColumn("bucket", F.expr(_CMS_BUCKET))
    counters = keyed.groupBy("seed", "bucket").agg(F.sum("exact_count").alias("cell"))
    return (
        keyed.join(counters, ["seed", "bucket"])
        .groupBy("user_id")
        .agg(
            F.max("exact_count").alias("exact_count"),
            F.min("cell").alias("cms_count"),
        )
        .orderBy(F.desc("exact_count"), "user_id")
        .limit(20)
    )
