"""Deterministic sampling and dataset splitting — the selection layer of
a training-data pipeline (tx05's token budgets feed the rates used
here).

Everything keys off a content-stable hash bucket (md5 of doc_id mod
10k), NOT ``rand()``: the same document lands in the same split/sample
on every run, every engine, every cluster size — reproducible dataset
cuts are a correctness property, not a convenience. Both operators are
map-only (the predicate fuses into the scan; no shuffle at any scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.catalog import load_table
from .registry import register

_BUCKETS = 10_000
# train/val/test = 80/10/10 by hash bucket
_TRAIN_HI = 8_000
_VAL_HI = 9_000

# per-source sampling rates in buckets/10k (heavier web downsampling —
# the standard mixture-reweighting move)
_SOURCE_RATES = {"src0": 2_500, "src1": 9_000, "src2": 10_000, "src3": 7_000, "src4": 5_000}
_DEFAULT_RATE = 5_000

_BUCKET = f"pmod(cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint), {_BUCKETS})"
_BUCKET_SQL = f"(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) % {_BUCKETS}"


@register(
    "sp01_train_val_test_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_BUCKET_SQL} < {_TRAIN_HI} THEN 'train'
                WHEN {_BUCKET_SQL} < {_VAL_HI} THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def sp01_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by content-stable hash bucket.
    Adding documents never moves an existing one between splits (no
    leakage across runs), unlike any rand()- or row-number-based cut."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_BUCKET)
    return docs.select(
        "doc_id",
        F.when(bucket < _TRAIN_HI, "train")
        .when(bucket < _VAL_HI, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "sp02_stratified_sample",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    WHERE {_BUCKET_SQL} < CASE source
        {' '.join(f"WHEN '{s}' THEN {r}" for s, r in _SOURCE_RATES.items())}
        ELSE {_DEFAULT_RATE} END
    """,
)
def sp02_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted downsample (mixture reweighting): each source
    keeps its configured fraction of documents, selected by the same
    stable hash bucket — rerunning, re-sharding or growing the corpus
    never changes which surviving documents are kept."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[F.when(F.col("source") == s, F.lit(r)) for s, r in _SOURCE_RATES.items()],
        F.lit(_DEFAULT_RATE),
    )
    return docs.filter(F.expr(_BUCKET) < rate).select("doc_id", "source")


@register(
    "sp03_language_rebalance",
    oracle=f"""
    WITH cnt AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
    rate AS (
        SELECT lang, ({_BUCKETS} * (SELECT MIN(c) FROM cnt)) // c AS r
        FROM cnt
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rate USING (lang)
    WHERE {_BUCKET_SQL} < r
    """,
)
def sp03_language_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the language mixture by downsampling every language to
    (approximately) the size of the smallest one — the standard move
    before training on a multilingual corpus dominated by one language.

    Per-language keep-rates are computed from a 5-row aggregate and
    broadcast back; selection reuses the content-stable hash bucket, so
    the surviving set is reproducible across runs, engines, and corpus
    growth. One small groupBy + a broadcast join + a map-side filter —
    no large shuffle at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    min_c = cnt.agg(F.min("c").alias("mc"))
    rate = cnt.crossJoin(F.broadcast(min_c)).select(
        "lang", F.expr(f"({_BUCKETS} * mc) div c").alias("r")
    )
    return (
        docs.join(F.broadcast(rate), "lang")
        .filter(F.expr(_BUCKET) < F.col("r"))
        .select("doc_id", "lang")
    )


# temporal split: 80/10/10 of the observed time span
_SPAN_TRAIN, _SPAN_VAL = 8, 9


@register(
    "sp04_temporal_split",
    oracle=f"""
    WITH b AS (
        SELECT MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS mn,
               MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS mx
        FROM events
    )
    SELECT event_id,
           CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                     <= mn + ((mx - mn) * {_SPAN_TRAIN}) // 10 THEN 'train'
                WHEN CAST(floor(epoch(ts)) AS BIGINT)
                     <= mn + ((mx - mn) * {_SPAN_VAL}) // 10 THEN 'val'
                ELSE 'test' END AS split
    FROM events, b
    """,
)
def sp04_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based train/val/test split: train on the first 80% of the
    observed time span, validate on the next 10%, test on the most
    recent 10% — the leakage-free split for forecasting-style training
    (a hash split like sp01 would leak future events into train).

    The bounds are one global MIN/MAX aggregate (map-side combine, a
    1-row result) broadcast back; assignment is then a map-only integer
    comparison fused into the scan. Integer-epoch arithmetic keeps the
    boundary identical across engines."""
    events = load_table(spark, sf_dir, "events")
    ep = F.unix_timestamp("ts").cast("long")
    bounds = events.agg(F.min(ep).alias("mn"), F.max(ep).alias("mx"))
    return (
        events.crossJoin(F.broadcast(bounds))
        .select(
            "event_id",
            F.when(
                ep <= F.col("mn") + F.expr(f"((mx - mn) * {_SPAN_TRAIN}) div 10"), "train"
            )
            .when(ep <= F.col("mn") + F.expr(f"((mx - mn) * {_SPAN_VAL}) div 10"), "val")
            .otherwise("test")
            .alias("split"),
        )
    )


_K_FOLDS = 5


@register(
    "sp05_kfold_assignment",
    oracle=f"""
    SELECT doc_id,
           CAST({_BUCKET_SQL} % {_K_FOLDS} AS BIGINT) AS fold,
           CAST({_BUCKET_SQL} % {_K_FOLDS} = 0 AS BOOLEAN) AS holdout
    FROM documents
    """,
)
def sp05_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation assignment (k=5) from the same
    content-stable hash bucket as sp01 — fold membership survives corpus
    growth and engine changes, and the ``holdout`` flag marks fold 0 as
    the current evaluation slice. Map-only: the modulus fuses into the
    scan, no shuffle at any scale; training a fold is then a plain
    ``fold != i`` predicate pushed to parquet."""
    docs = load_table(spark, sf_dir, "documents")
    fold = (F.expr(_BUCKET) % _K_FOLDS).cast("long")
    return docs.select(
        "doc_id",
        fold.alias("fold"),
        (fold == 0).alias("holdout"),
    )


# ---------------------------------------------------------------------------
# sp06: weighted priority sampling (Duffield-Lund-Thorup)
# ---------------------------------------------------------------------------

_SP06_K = 40
# u ~ Uniform over [1, 2^60]: the first 15 md5 hex digits as an integer,
# +1 so the priority w/u is always finite.
_U = f"(cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint) + 1)"
_U_SQL = f"((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) + 1)"


@register(
    "sp06_priority_sample",
    oracle=f"""
    SELECT doc_id, n_chars
    FROM (
        SELECT doc_id, n_chars,
               CAST(n_chars AS DOUBLE) / CAST({_U_SQL} AS DOUBLE) AS priority
        FROM documents
    )
    ORDER BY priority DESC, doc_id
    LIMIT {_SP06_K}
    """,
)
def sp06_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement via priority sampling
    (Duffield, Lund & Thorup, JACM 2007): each document draws priority
    w/u with w = n_chars and u a content-stable uniform from its md5 —
    the k highest priorities form a sample where inclusion probability
    is proportional to size, yet membership is deterministic and stable
    across runs and engines (no rand()).

    Exactness across engines: u is an exact integer, w < 2^53, and the
    priority is ONE int-to-double cast pair plus ONE division — every
    step IEEE-correctly-rounded, so Spark and the oracle compute
    bit-identical priorities and select the identical top-k. Scale: the
    sort is top-k (TakeOrderedAndProject), per-partition heaps + a
    k-row driver merge, never a global sort of the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    priority = F.col("n_chars").cast("double") / F.expr(_U).cast("double")
    return (
        docs.select("doc_id", "n_chars", priority.alias("priority"))
        .orderBy(F.desc("priority"), "doc_id")
        .limit(_SP06_K)
        .select("doc_id", "n_chars")
    )


# ---------------------------------------------------------------------------
# sp07: mixture-weighted budget allocation (largest-remainder method)
# ---------------------------------------------------------------------------

# Target corpus mixture (weights sum to 1 in thousandths — integers so
# every allocation step is exact arithmetic).
_MIX_W = {"src0": 350, "src1": 300, "src2": 200, "src3": 100, "src4": 50}
_MIX_DEN = 1000
_BUDGET_FRAC_NUM, _BUDGET_FRAC_DEN = 1, 2  # sample half the corpus

_MIX_CASE_SQL = "CASE source " + " ".join(
    f"WHEN '{s}' THEN {w}" for s, w in _MIX_W.items()
) + " ELSE 0 END"


@register(
    "sp07_mixture_allocation_sample",
    oracle=f"""
    WITH per_source AS (
        SELECT source, COUNT(*) AS avail, {_MIX_CASE_SQL} AS w
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT CAST((SUM(avail) * {_BUDGET_FRAC_NUM}) // {_BUDGET_FRAC_DEN} AS BIGINT)
            AS budget
        FROM per_source
    ),
    quota AS (
        SELECT source, avail, tot.budget,
               (tot.budget * w) // {_MIX_DEN} AS base,
               (tot.budget * w) % {_MIX_DEN} AS rem
        FROM per_source CROSS JOIN tot
    ),
    alloc AS (
        SELECT source, avail,
               base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                           <= budget - SUM(base) OVER ()
                      THEN 1 ELSE 0 END AS n_alloc
        FROM quota
    ),
    ranked AS (
        SELECT d.doc_id, d.source,
               ROW_NUMBER() OVER (PARTITION BY d.source
                   ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn,
               a.n_alloc, a.avail
        FROM documents d JOIN alloc a USING (source)
    )
    SELECT doc_id, source FROM ranked
    WHERE rn <= LEAST(n_alloc, avail)
    """,
)
def sp07_mixture_allocation_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-weighted corpus sampling: hit a global document budget
    (half the corpus) at a target source mixture (35/30/20/10/5%),
    allocating per-source counts with the largest-remainder method —
    the data-mixture curation step of an LLM training pipeline
    (reweighting web/books/code shares before tokenization).

    Every allocation step is integer arithmetic (weights in
    thousandths, floor quotas, remainder ranking with a deterministic
    tie-break), so the sample is bit-stable across engines; member
    selection inside a source is the same content-stable md5 order as
    sp01. An over-allocated source truncates at availability (no
    waterfall redistribution — documented choice, the oracle mirrors
    it). Scale: the allocation math runs on a |sources|-row aggregate
    that broadcasts back; selection is one per-source window over
    hash-ranked members."""
    docs = load_table(spark, sf_dir, "documents")
    w_expr = "CASE source " + " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in _MIX_W.items()
    ) + " ELSE 0 END"
    per_source = docs.groupBy("source").agg(F.count(F.lit(1)).alias("avail"))
    per_source = per_source.withColumn("w", F.expr(w_expr))
    # Integer floor division on BOTH engines: a float `/` here would
    # truncate on the Spark cast but round-half-even on DuckDB's CAST,
    # diverging by 1 whenever SUM(avail) * num / den lands on .5 —
    # which shifts every quota and the whole selected sample.
    tot = per_source.agg(
        F.expr(
            f"(sum(avail) * {_BUDGET_FRAC_NUM}) div {_BUDGET_FRAC_DEN}"
        ).alias("budget")
    )
    quota = per_source.join(F.broadcast(tot)).select(
        "source",
        "avail",
        F.expr(f"budget * w div {_MIX_DEN}").alias("base"),
        ((F.col("budget") * F.col("w")) % _MIX_DEN).alias("rem"),
        "budget",
    )
    wrem = Window.orderBy(F.desc("rem"), F.asc("source"))
    wtot = Window.partitionBy(F.lit(1))
    alloc = quota.select(
        "source",
        "avail",
        (
            F.col("base")
            + F.when(
                F.row_number().over(wrem)
                <= F.col("budget") - F.sum("base").over(wtot),
                1,
            ).otherwise(0)
        ).alias("n_alloc"),
    )
    wsel = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.join(F.broadcast(alloc), "source")
        .withColumn("rn", F.row_number().over(wsel))
        .filter(F.col("rn") <= F.least(F.col("n_alloc"), F.col("avail")))
        .select("doc_id", "source")
    )


_GROUP_BUCKET = f"pmod(cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10) as bigint), {_BUCKETS})"
_GROUP_BUCKET_SQL = f"(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT) % {_BUCKETS}"


@register(
    "sp08_group_holdout_split",
    oracle=f"""
    SELECT event_id, user_id,
           CASE WHEN {_GROUP_BUCKET_SQL} < {_TRAIN_HI} THEN 'train'
                WHEN {_GROUP_BUCKET_SQL} < {_VAL_HI} THEN 'val'
                ELSE 'test' END AS split
    FROM events
    """,
)
def sp08_group_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware 80/10/10 split of the events table: the hash bucket
    is computed on user_id, NOT event_id, so every event of a user
    lands in the same split — the leakage guard row-level splits (sp01)
    cannot give when rows of one entity are correlated (a model
    validated on held-out rows of TRAINING users is not validated).
    sklearn calls this GroupShuffleSplit; here it is one map-only
    stable-hash predicate, no shuffle at any scale, and growing the
    corpus never moves an existing user's events between splits."""
    events = load_table(spark, sf_dir, "events")
    bucket = F.expr(_GROUP_BUCKET)
    return events.select(
        "event_id",
        "user_id",
        F.when(bucket < _TRAIN_HI, "train")
        .when(bucket < _VAL_HI, "val")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# sp09: temperature (alpha) mixture resampling — UNIMAX/multilingual-LM
# style, integer-quantized for engine-exact reproducibility
# ---------------------------------------------------------------------------
# alpha = 0.5 (sqrt) — IEEE sqrt and multiply are correctly rounded, so
# floor(sqrt(c) * 1000) is bit-identical in Spark and DuckDB; everything
# downstream stays in exact BIGINT arithmetic (the sk10 discipline).

_SP09_SQL = f"""
WITH cnt AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
w AS (
    SELECT lang, c,
           CAST(floor(sqrt(CAST(c AS DOUBLE)) * 1000) AS BIGINT) AS w
    FROM cnt
),
tot AS (
    SELECT CAST(SUM(w) AS BIGINT) AS tw, CAST(SUM(c) AS BIGINT) AS n
    FROM w
),
rate AS (
    SELECT lang,
           LEAST(10000, 10000 * ((n // 2) * w // tw) // c) AS r
    FROM w, tot
)
SELECT d.doc_id, d.lang
FROM documents d JOIN rate USING (lang)
WHERE {_BUCKET_SQL} < r
"""


@register("sp09_temperature_resample", oracle=_SP09_SQL)
def sp09_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture resampling (the multilingual-LM
    alpha-sampling move: keep probability proportional to
    share^alpha, flattening head languages while boosting the tail;
    alpha = 0.5 here) down to a half-corpus budget. Differs from sp03
    (equalize to the minimum) and sp07 (explicit budget weights): the
    mixture is a smooth function of observed shares.

    Engine-exactness: per-language weight = floor(sqrt(c) * 1000) —
    sqrt and multiply are IEEE correctly-rounded, so both engines
    produce the identical BIGINT; expected counts and bucket rates
    then stay in exact integer arithmetic, and selection reuses the
    content-stable md5 bucket (reproducible across runs, engines,
    shard counts, corpus growth).

    Scale: a 5-row aggregate broadcast back onto the scan and a
    map-side filter — no wide shuffle at any corpus size; the same
    plan shape as sp02/sp03 whose pushdown is pinned in
    test_plan_quality."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    w = cnt.select(
        "lang",
        "c",
        F.floor(F.sqrt(F.col("c").cast("double")) * 1000).cast("bigint").alias("w"),
    )
    tot = w.agg(
        F.sum("w").cast("bigint").alias("tw"), F.sum("c").cast("bigint").alias("n")
    )
    rate = w.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.least(
            F.lit(10000), F.expr("10000 * ((n div 2) * w div tw) div c")
        ).alias("r"),
    )
    return (
        docs.join(F.broadcast(rate), "lang")
        .filter(F.expr(_BUCKET) < F.col("r"))
        .select("doc_id", "lang")
    )
