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

from pyspark.sql import DataFrame, SparkSession, Window
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

# Bloom filter geometry: k hash functions into m bits. md5-derived bit
# positions (same engine-portable hash as the count-min sketch above)
# make the filter deterministic, so both engines build the identical
# bit set and agree on every probe — including the false positives.
_BLOOM_M = 1024
_BLOOM_K = 3
_BLOOM_SEGMENT = "BUILDING"

_BLOOM_POS = (
    "pmod(cast(conv(substring(md5(concat(cast({key} as string), '#',"
    " cast({seed} as string))), 1, 15), 16, 10) as bigint), {m})"
)
_BLOOM_POS_SQL = (
    "((('0x' || substring(md5(CAST({key} AS VARCHAR) || '#' ||"
    " CAST({seed} AS VARCHAR)), 1, 15))::BIGINT) % {m})"
)


@register(
    "sk07_bloom_join_prune",
    oracle=f"""
    WITH bldg AS (
        SELECT DISTINCT c_custkey FROM customer
        WHERE c_mktsegment = '{_BLOOM_SEGMENT}'
    ),
    seeds AS (SELECT unnest(range({_BLOOM_K})) AS seed),
    bits AS (
        SELECT list(DISTINCT {_BLOOM_POS_SQL.format(key='c_custkey', seed='seed', m=_BLOOM_M)}) AS bitset
        FROM bldg CROSS JOIN seeds
    ),
    probe AS (
        SELECT o.o_orderpriority,
               (b.c_custkey IS NOT NULL) AS is_member,
               ({' AND '.join('list_contains(bits.bitset, ' + _BLOOM_POS_SQL.format(key='o.o_custkey', seed=str(s), m=_BLOOM_M) + ')' for s in range(_BLOOM_K))}) AS bloom_pass
        FROM orders o
        LEFT JOIN bldg b ON o.o_custkey = b.c_custkey
        CROSS JOIN bits
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_bloom,
           CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
           CAST(SUM(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positives
    FROM probe
    GROUP BY o_orderpriority
    """,
)
def sk07_bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning: build a k=3, m=1024-bit filter over
    the BUILDING-segment customer keys, probe every order row map-side,
    and report per-priority how many rows the filter passes vs the true
    semi-join membership (false positives = the filter's only error
    mode; false negatives are impossible and the oracle proves it).

    This is THE scan-pruning pattern for selective fact-dim joins at
    100 TB: the filter is built from the small side (one tiny distinct
    + collect into a 1-row bitset), broadcast to every scan task, and
    each probe is pure column arithmetic — rows that cannot join are
    dropped before the join shuffle ever sees them (Spark's own
    runtime-filter / bloom pushdown does exactly this under AQE; here
    the mechanism is explicit and oracle-checked). The exact member
    flag rides a broadcast LEFT join against the same tiny dim, so the
    whole query is one fact scan with zero fact-side shuffles before
    the 5-group aggregate."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    bldg = (
        customer.filter(F.col("c_mktsegment") == _BLOOM_SEGMENT)
        .select("c_custkey")
        .distinct()
    )
    seeds = F.array(*[F.lit(i) for i in range(_BLOOM_K)])
    # The set of lit positions is densified into a POSITIONAL boolean
    # array once at build time, so each probe is an O(1) element_at
    # instead of an O(|set|) array_contains scan — 3 probes x |orders|
    # x ~600 set entries was the measured constant factor (the
    # round-4 tx15/sk07 audit); a real bitset probe is O(1) and this is
    # its column-expression equivalent. Semantics and oracle unchanged.
    bits = (
        bldg.withColumn("seed", F.explode(seeds))
        .select(
            F.expr(
                _BLOOM_POS.format(key="c_custkey", seed="seed", m=_BLOOM_M)
            ).alias("pos")
        )
        .agg(F.collect_set("pos").alias("bitset"))
        .select(
            F.expr(
                f"transform(sequence(0, {_BLOOM_M - 1}),"
                " i -> array_contains(bitset, cast(i as bigint)))"
            ).alias("bitarr")
        )
    )

    probe = (
        orders.join(
            F.broadcast(bldg.withColumn("is_member", F.lit(True))),
            orders.o_custkey == bldg.c_custkey,
            "left",
        )
        .crossJoin(F.broadcast(bits))
        .withColumn("is_member", F.coalesce("is_member", F.lit(False)))
        .withColumn(
            "bloom_pass",
            F.lit(True)
            & F.element_at(
                "bitarr",
                (
                    F.expr(_BLOOM_POS.format(key="o_custkey", seed="0", m=_BLOOM_M))
                    + 1
                ).cast("int"),
            )
            & F.element_at(
                "bitarr",
                (
                    F.expr(_BLOOM_POS.format(key="o_custkey", seed="1", m=_BLOOM_M))
                    + 1
                ).cast("int"),
            )
            & F.element_at(
                "bitarr",
                (
                    F.expr(_BLOOM_POS.format(key="o_custkey", seed="2", m=_BLOOM_M))
                    + 1
                ).cast("int"),
            ),
        )
    )
    return probe.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).alias("n_pass_bloom"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0)).alias("n_members"),
        F.sum(
            F.when(F.col("bloom_pass") & ~F.col("is_member"), 1).otherwise(0)
        ).alias("n_false_positives"),
    )


# KMV (k minimum values) distinct-count sketch: keep the k smallest
# hash fractions per group; estimate = (k-1) / h_(k). md5-uniform
# hashing keeps it engine-exact, so unlike a typical sketch it carries
# a full oracle: both engines pick the identical k-th hash and divide
# the identical doubles.
_KMV_K = 64
_KMV_DENOM = float(16**15)  # md5 15-hex-digit prefix range

_KMV_HASH = (
    "cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)"
    f" as bigint) / {_KMV_DENOM!r}"
)
_KMV_HASH_SQL = (
    "(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT)"
    f" / {_KMV_DENOM!r}"
)


@register(
    "sk08_kmv_distinct_users",
    oracle=f"""
    WITH pairs AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    hashed AS (
        SELECT event_type, {_KMV_HASH_SQL} AS h FROM pairs
    ),
    ranked AS (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rnk
        FROM hashed
    ),
    exact AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users_exact
        FROM pairs GROUP BY event_type
    ),
    kth AS (
        SELECT event_type, h AS h_k FROM ranked WHERE rnk = {_KMV_K}
    )
    SELECT e.event_type, e.n_users_exact,
           CASE WHEN k.h_k IS NULL THEN CAST(e.n_users_exact AS DOUBLE)
                ELSE {_KMV_K - 1} / k.h_k END AS n_users_kmv
    FROM exact e LEFT JOIN kth k USING (event_type)
    """,
)
def sk08_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k minimum values, k=64) distinct-user estimate per event
    type next to the exact count. The k-th smallest uniform hash
    fraction h_(k) pins the estimate (k-1)/h_(k); groups with fewer
    than k distinct users fall back to their exact count (the sketch
    IS exact below k — it holds every hash).

    Scale shape: the corpus first collapses to distinct (type, user)
    pairs with a map-side-combined shuffle — the same reduction exact
    distinct pays — but on a cluster the KMV summary is maintained as a
    k-item bounded heap per partition and merged by keeping the k
    smallest of the union (the mergeable-partial property HLL shares,
    with the bonus that KMV sketches also intersect for Jaccard
    estimates). The declarative form here ranks per-group hashes with
    one window; only groups, not the corpus, reach the final join."""
    events = load_table(spark, sf_dir, "events")
    pairs = events.select("event_type", "user_id").distinct()
    hashed = pairs.select("event_type", F.expr(_KMV_HASH).alias("h"))
    w = Window.partitionBy("event_type").orderBy("h")
    kth = (
        hashed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == _KMV_K)
        .select("event_type", F.col("h").alias("h_k"))
    )
    exact = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users_exact")
    )
    return exact.join(kth, "event_type", "left").select(
        "event_type",
        "n_users_exact",
        F.when(F.col("h_k").isNull(), F.col("n_users_exact").cast("double"))
        .otherwise(F.lit(float(_KMV_K - 1)) / F.col("h_k"))
        .alias("n_users_kmv"),
    )


@register(
    "sk09_kmv_set_overlap",
    oracle=f"""
    WITH pairs AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    hashed AS (
        SELECT event_type, {_KMV_HASH_SQL} AS h FROM pairs
    ),
    sk AS (
        SELECT event_type, h FROM (
            SELECT event_type, h,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rnk
            FROM hashed
        ) r WHERE rnk <= {_KMV_K}
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    tp AS (
        SELECT a.event_type AS t1, b.event_type AS t2
        FROM types a JOIN types b ON a.event_type < b.event_type
    ),
    mem AS (
        SELECT tp.t1, tp.t2, s.h,
               MAX(CASE WHEN s.event_type = tp.t1 THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN s.event_type = tp.t2 THEN 1 ELSE 0 END) AS in_b
        FROM tp JOIN sk s ON s.event_type IN (tp.t1, tp.t2)
        GROUP BY tp.t1, tp.t2, s.h
    ),
    mranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY t1, t2 ORDER BY h) AS rnk
        FROM mem
    ),
    est AS (
        SELECT t1, t2,
               CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
               CAST(COUNT(*) AS BIGINT) AS k_eff
        FROM mranked WHERE rnk <= {_KMV_K} GROUP BY t1, t2
    ),
    sizes AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY event_type
    ),
    inter AS (
        SELECT a.event_type AS t1, b.event_type AS t2, CAST(COUNT(*) AS BIGINT) AS ni
        FROM pairs a JOIN pairs b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT tp.t1, tp.t2, sa.n AS n_a, sb.n AS n_b,
           COALESCE(i.ni, 0) AS n_intersect,
           CAST(COALESCE(i.ni, 0) AS DOUBLE)
               / (sa.n + sb.n - COALESCE(i.ni, 0)) AS jaccard_exact,
           CAST(e.n_both AS DOUBLE) / e.k_eff AS jaccard_kmv
    FROM tp
    JOIN sizes sa ON sa.event_type = tp.t1
    JOIN sizes sb ON sb.event_type = tp.t2
    JOIN est e ON e.t1 = tp.t1 AND e.t2 = tp.t2
    LEFT JOIN inter i ON i.t1 = tp.t1 AND i.t2 = tp.t2
    """,
)
def sk09_kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based set overlap: for every pair of event types,
    estimate the Jaccard similarity of their user audiences from the
    k=64 KMV sketches (merge the two sketches, keep the k smallest of
    the union, count how many lie in both) — next to the exact Jaccard
    from the full distinct-pair self-join. This is the audience-overlap
    / segment-similarity query that exact set intersection makes
    quadratic in segments: with sketches, each segment is summarized
    once and every pairwise estimate touches only 2k values.

    The corpus is scanned once into distinct (type, user) pairs; the
    sketch table is |types| x k rows, so all pairwise sketch algebra is
    broadcast-trivial regardless of corpus size (the exact-intersection
    self-join here is the oracle ground truth the estimate is judged
    against — at production scale you'd ship ONLY the sketches). The
    sketch membership join expands as two equi-joins (type = t1, type =
    t2) unioned, keeping the plan hash-join-only; md5-uniform hashing
    makes both engines pick identical sketch members, so even the
    estimate column is bit-exact across engines."""
    events = load_table(spark, sf_dir, "events")
    pairs = events.select("event_type", "user_id").distinct()
    hashed = pairs.select("event_type", F.expr(_KMV_HASH).alias("h"))
    w = Window.partitionBy("event_type").orderBy("h")
    sk = (
        hashed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _KMV_K)
        .select("event_type", "h")
    )
    types = events.select("event_type").distinct()
    tp = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("t1"), F.col("b.event_type").alias("t2")
        )
    )
    mem_a = tp.join(sk, sk.event_type == tp.t1).select(
        "t1", "t2", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    mem_b = tp.join(sk, sk.event_type == tp.t2).select(
        "t1", "t2", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    mem = (
        mem_a.unionAll(mem_b)
        .groupBy("t1", "t2", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wm = Window.partitionBy("t1", "t2").orderBy("h")
    est = (
        mem.withColumn("rnk", F.row_number().over(wm))
        .filter(F.col("rnk") <= _KMV_K)
        .groupBy("t1", "t2")
        .agg(
            F.sum(
                F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
            ).alias("n_both"),
            F.count(F.lit(1)).alias("k_eff"),
        )
    )
    sizes = pairs.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        pairs.alias("a")
        .join(
            pairs.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("t1"), F.col("b.event_type").alias("t2")
        )
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    return (
        tp.join(sizes.withColumnRenamed("event_type", "t1").withColumnRenamed("n", "n_a"), "t1")
        .join(sizes.withColumnRenamed("event_type", "t2").withColumnRenamed("n", "n_b"), "t2")
        .join(est, ["t1", "t2"])
        .join(inter, ["t1", "t2"], "left")
        .select(
            "t1",
            "t2",
            "n_a",
            "n_b",
            F.coalesce("ni", F.lit(0)).alias("n_intersect"),
            (
                F.coalesce("ni", F.lit(0)).cast("double")
                / (F.col("n_a") + F.col("n_b") - F.coalesce("ni", F.lit(0)))
            ).alias("jaccard_exact"),
            (F.col("n_both").cast("double") / F.col("k_eff")).alias("jaccard_kmv"),
        )
    )


# ---------------------------------------------------------------------------
# sk10: portable HyperLogLog — the sketch STATE on the hard signal
# ---------------------------------------------------------------------------
# sk02 certifies the production path (Spark's native HLL++), which is
# rows-only by nature: its sketch internals are engine-specific. sk10
# closes that gap with a PORTABLE HLL (classic Flajolet-Fusy-Gandouet-
# Meunier 2007 formulation) built from md5 bits, so BOTH engines
# construct the identical sketch: bucket = low 6 bits of the 60-bit md5
# prefix, rho = leading-zero rank of the remaining 54 bits, register =
# max(rho) per bucket. The certificate hashes the ENTIRE sketch state
# (registers folded into one exact BIGINT: Z * 2^55, plus the empty-
# bucket count) and the raw estimate alpha_m * m^2 / Z — a single IEEE
# division of a shared literal by an exact integer, bit-identical
# across engines (verified to the last bit). The small-range
# LinearCounting CORRECTION stays out of the hashed surface as a
# conservative choice: ln() is only contracted to ~1 ulp (not
# correctly rounded) across libm implementations, and SQL literal
# arithmetic around it is treacherous (Spark parses 64.0/7 as DECIMAL
# division and truncates the ARGUMENT to scale 6 — measured 1.6e-8 off
# before ln is even called). `use_linear_counting` + `v_empty` pin the
# branch and its exact inputs, and pytest applies the ln in ONE engine
# (Python) to bound the corrected estimate against sk01's counts.
#
# 100 TB design: identical to sk02 — one pass, 64 registers per group,
# mergeable by pairwise max; the groupBy(bucket) partial-aggregates
# map-side so the shuffle carries at most |groups| x 64 rows.

_HLL_M = 64  # 2^6 buckets
_HLL_ALPHA = 0.709  # alpha_64, Flajolet et al. 2007 Fig. 3
# alpha * m^2 * 2^55 as ONE shared decimal literal: both engines parse
# the same double, so E_raw = _HLL_C / z_scaled is one exact division.
_HLL_C = repr(_HLL_ALPHA * _HLL_M * _HLL_M * float(2**55))
_HLL_LC_CUT = repr(2.5 * _HLL_M)  # LinearCounting threshold 2.5m

_SK10_SQL = f"""
WITH pairs AS (SELECT DISTINCT event_type, user_id FROM events),
hashed AS (
    SELECT event_type,
           (('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT) AS h
    FROM pairs
),
regs AS (
    SELECT event_type, h % {_HLL_M} AS bucket,
           MAX(CASE WHEN (h >> 6) = 0 THEN 55
                    ELSE 55 - length(bin(h >> 6)) END) AS m_j
    FROM hashed GROUP BY event_type, h % {_HLL_M}
),
state AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
           CAST({_HLL_M} - COUNT(*) AS BIGINT) AS v_empty,
           CAST(SUM(1::BIGINT << (55 - m_j))
                + ({_HLL_M} - COUNT(*)) * (1::BIGINT << 55) AS BIGINT) AS z_scaled
    FROM regs GROUP BY event_type
),
est AS (
    SELECT event_type, n_buckets_used, v_empty, z_scaled,
           {_HLL_C} / z_scaled AS e_raw,
           ({_HLL_C} / z_scaled <= {_HLL_LC_CUT} AND v_empty > 0) AS use_linear_counting
    FROM state
),
exact AS (
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact
    FROM events GROUP BY event_type
)
SELECT e.event_type, x.n_users_exact, e.n_buckets_used, e.v_empty,
       e.z_scaled, e.e_raw, e.use_linear_counting
FROM est e JOIN exact x ON e.event_type = x.event_type
"""


@register("sk10_portable_hll_state", oracle=_SK10_SQL)
def sk10_portable_hll_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HLL cardinality sketch with the full register state on
    the hard signal (see the design note above). One distinct pass,
    then a 64-registers-per-group aggregate; everything after the
    groupBy is constant-size algebra."""
    events = load_table(spark, sf_dir, "events")
    pairs = events.select("event_type", "user_id").distinct()
    h = "cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10) as bigint)"
    hashed = pairs.select("event_type", F.expr(h).alias("h"))
    regs = (
        hashed.select(
            "event_type",
            (F.col("h") % _HLL_M).alias("bucket"),
            F.when(F.shiftright("h", 6) == 0, F.lit(55))
            .otherwise(F.lit(55) - F.length(F.bin(F.shiftright("h", 6))))
            .alias("rho"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    state = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets_used"),
        (F.lit(_HLL_M) - F.count(F.lit(1))).cast("long").alias("v_empty"),
        (
            F.sum(F.expr("shiftleft(cast(1 as bigint), 55 - m_j)"))
            + (F.lit(_HLL_M) - F.count(F.lit(1)))
            * F.lit(1 << 55).cast("long")
        )
        .cast("long")
        .alias("z_scaled"),
    )
    est = state.select(
        "event_type",
        "n_buckets_used",
        "v_empty",
        "z_scaled",
        (F.lit(float(_HLL_C)) / F.col("z_scaled")).alias("e_raw"),
        (
            (F.lit(float(_HLL_C)) / F.col("z_scaled") <= float(_HLL_LC_CUT))
            & (F.col("v_empty") > 0)
        ).alias("use_linear_counting"),
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "n_users_exact",
        "n_buckets_used",
        "v_empty",
        "z_scaled",
        "e_raw",
        "use_linear_counting",
    )


# ---------------------------------------------------------------------------
# sk11: KMV-sample quantile sketch — deterministic, hence oracle-backed
# ---------------------------------------------------------------------------
# sk04 certifies the production path (Spark's approx_percentile / GK
# sketch — engine-specific internals, rows-only). sk11 is the portable
# twin: a bottom-k-by-hash sample (the KMV trick applied to ROWS rather
# than distinct keys — md5(event_id) gives every row a uniform draw,
# and 'keep the k smallest hashes' is a uniform k-sample that merges
# across partitions by union + re-truncate, exactly like sk08's
# sketch), then EXACT linear-interpolation quantiles over the k-row
# sample. Both engines select the identical sample (md5 is shared,
# event_id breaks ties) and interpolate identically (verified equal in
# sk03), so the estimate itself is hash-exact. At 100 TB the sample is
# maintained with a bounded heap per partition — the shuffle carries
# k rows per group, never the column.

_SKQ_K = 256

_SK11_SQL = f"""
WITH hashed AS (
    SELECT event_type, event_id, value,
           (('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT) AS h
    FROM events
),
sample AS (
    SELECT event_type, value FROM (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h, event_id) AS rnk
        FROM hashed
    ) r WHERE rnk <= {_SKQ_K}
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_sample,
       quantile_cont(value, {_QUANTILES[0]}) AS p25,
       quantile_cont(value, {_QUANTILES[1]}) AS p50,
       quantile_cont(value, {_QUANTILES[2]}) AS p75,
       quantile_cont(value, {_QUANTILES[3]}) AS p99
FROM sample GROUP BY event_type
"""


@register("sk11_sample_quantile_sketch", oracle=_SK11_SQL)
def sk11_sample_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k-by-hash sample quantiles (see the design note above):
    the deterministic, engine-exact quantile sketch next to sk04's
    native approx_percentile. pytest bounds its error against sk03's
    exact quantiles."""
    events = load_table(spark, sf_dir, "events")
    h = "cast(conv(substring(md5(cast(event_id as string)), 1, 15), 16, 10) as bigint)"
    hashed = events.select("event_type", "event_id", "value", F.expr(h).alias("h"))
    w = Window.partitionBy("event_type").orderBy("h", "event_id")
    sample = (
        hashed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _SKQ_K)
        .select("event_type", "value")
    )
    return sample.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sample"),
        *[
            F.expr(f"percentile(value, {q})").alias(name)
            for q, name in zip(_QUANTILES, ("p25", "p50", "p75", "p99"))
        ],
    )
