"""Corpus-curation operators that COMPOSE the primitive families:
cross-split decontamination (dedup x sampling), corpus-relative quality
gating (textops x histogram quantile), and funnel analysis (event
sequencing) — the glue queries a real training-data pipeline runs
between the primitive stages.

Scale notes per operator at the definition site; none of them joins on
anything wider than (shingle) / (score bucket) / (user_id), and the only
global ordering is over a <=1001-row histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as X
from ..sources.catalog import load_table
from .dedup import _SHINGLE_ROWS_SQL, _shingle_rows
from .registry import register
from .sampling import _BUCKET, _BUCKET_SQL, _TRAIN_HI, _VAL_HI

# ---------------------------------------------------------------------------
# dd11: train/test contamination check (decontamination pass)
# ---------------------------------------------------------------------------

_DD11_SQL = f"""
WITH sh AS ({_SHINGLE_ROWS_SQL}),
lab AS (
    SELECT doc_id, shingle,
           CASE WHEN {_BUCKET_SQL} < {_TRAIN_HI} THEN 'train'
                WHEN {_BUCKET_SQL} < {_VAL_HI} THEN 'val'
                ELSE 'test' END AS split
    FROM sh
),
te AS (SELECT doc_id, shingle FROM lab WHERE split = 'test'),
n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM te GROUP BY doc_id),
h AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
    FROM te
    WHERE shingle IN (SELECT shingle FROM lab WHERE split = 'train')
    GROUP BY doc_id
)
SELECT n.doc_id, n_sh, n_hit,
       CAST(CASE WHEN 2 * n_hit >= n_sh THEN 1 ELSE 0 END AS BIGINT) AS contaminated
FROM n JOIN h ON n.doc_id = h.doc_id
"""


@register("dd11_cross_split_contamination", oracle=_DD11_SQL)
def dd11_cross_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination report: for every TEST document (sp01's stable
    hash split), how many of its 3-gram shingles also occur anywhere in
    the TRAIN split — the standard eval-leakage check run before
    training. ``contaminated`` flags docs with a majority of shingles
    leaked (integer comparison, no float threshold).

    Scale: shingle rows shuffle on (shingle) for the distinct and the
    semi-join — each test shingle matches at most the one distinct
    train row, so fan-out is |test shingles|, never df². The split
    label is a map-side expression on doc_id (no join against an
    assignment table), identical to sp01 by construction.
    """
    sh = _shingle_rows(spark, sf_dir).localCheckpoint(eager=False)
    bucket = F.expr(_BUCKET)
    lab = sh.withColumn(
        "split",
        F.when(bucket < _TRAIN_HI, "train").when(bucket < _VAL_HI, "val").otherwise("test"),
    )
    train_sh = lab.filter(F.col("split") == "train").select("shingle").distinct()
    te = lab.filter(F.col("split") == "test").select("doc_id", "shingle")
    n = te.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    h = (
        te.join(train_sh, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return n.join(h, "doc_id").select(
        "doc_id",
        "n_sh",
        "n_hit",
        F.when(2 * F.col("n_hit") >= F.col("n_sh"), 1).otherwise(0).cast("bigint").alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# tx09: corpus-relative quality gate (histogram quantile)
# ---------------------------------------------------------------------------

_TX09_SCORE_SQL = (
    f"CAST({X.stopword_hits_sql('en')} AS BIGINT) * 1000"
    f" // GREATEST(CAST({X.word_count_sql()} AS BIGINT), 1)"
)

_TX09_SQL = f"""
WITH q AS (
    SELECT doc_id, {_TX09_SCORE_SQL} AS score_u FROM documents
),
h AS (SELECT score_u, COUNT(*) AS c FROM q GROUP BY score_u),
cum AS (
    SELECT score_u, SUM(c) OVER (ORDER BY score_u) AS cum,
           (SELECT COUNT(*) FROM q) AS n
    FROM h
),
cut AS (SELECT MIN(score_u) AS cut FROM cum WHERE cum * 4 >= n)
SELECT doc_id, score_u FROM q, cut WHERE score_u >= cut
"""


@register("tx09_quality_percentile_gate", oracle=_TX09_SQL)
def tx09_quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-RELATIVE quality gate: keep documents whose stopword
    density (integer milli-ratio — a naturalness proxy) is at or above
    the corpus's 25th-percentile score bucket. Unlike tx03's absolute
    thresholds, the cut adapts to the corpus.

    The quantile is a histogram quantile in exact integer arithmetic:
    per-score counts (<=1001 distinct milli-ratios), one cumulative
    window over that tiny histogram, cutoff = smallest score with
    cum*4 >= n (ceil-free integer form of P25). No sort of the corpus,
    no TakeOrdered of N/4 rows to the driver, no float percentile whose
    interpolation could disagree between engines — the same plan at
    100 TB: full-corpus groupBy(score) + a 1001-row window + a
    broadcast-scalar filter fused into the rescan.
    """
    docs = load_table(spark, sf_dir, "documents")
    q = (
        docs.select(
            "doc_id",
            (X.stopword_hits("en").cast("bigint") * 1000).alias("sw_milli"),
            F.greatest(X.word_count().cast("bigint"), F.lit(1)).alias("w"),
        )
        .select("doc_id", F.expr("sw_milli div w").alias("score_u"))
        .localCheckpoint(eager=False)  # feeds histogram AND final filter
    )
    hist = q.groupBy("score_u").agg(F.count(F.lit(1)).alias("c"))
    n_tot = q.agg(F.count(F.lit(1)).alias("n"))
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy("score_u").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    cut = (
        cum.crossJoin(F.broadcast(n_tot))
        .filter(F.col("cum") * 4 >= F.col("n"))
        .agg(F.min("score_u").alias("cut"))
    )
    return (
        q.crossJoin(F.broadcast(cut))
        .filter(F.col("score_u") >= F.col("cut"))
        .select("doc_id", "score_u")
    )


# ---------------------------------------------------------------------------
# ev10: strict-order funnel (view -> click -> purchase)
# ---------------------------------------------------------------------------

_EV10_SQL = """
WITH s1 AS (
    SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, MIN(e.ts) AS t2
    FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
    WHERE e.event_type = 'click'
    GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, MIN(e.ts) AS t3
    FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
    WHERE e.event_type = 'purchase'
    GROUP BY e.user_id
)
SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM (
    SELECT '1_view' AS stage, user_id FROM s1
    UNION ALL SELECT '2_click', user_id FROM s2
    UNION ALL SELECT '3_purchase', user_id FROM s3
) u GROUP BY stage
"""


@register("ev10_conversion_funnel", oracle=_EV10_SQL)
def ev10_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order conversion funnel: users with a view, then a click
    AFTER their first view, then a purchase AFTER that first qualifying
    click. Classic sequential-pattern query no single groupBy expresses
    (stage k's threshold depends on stage k-1's result).

    Three per-user aggregates chained by equi-join on user_id + a time
    predicate: every join is key-co-partitioned (one shuffle key
    throughout, reused stage to stage), per-user fan-out is the user's
    own event count, and the final rollup is a 3-group reduce. No
    windows over the full event log, no per-user collect_list.
    """
    events = load_table(spark, sf_dir, "events")
    s1 = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        events.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        events.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    staged = (
        s1.select(F.lit("1_view").alias("stage"), "user_id")
        .unionByName(s2.select(F.lit("2_click").alias("stage"), "user_id"))
        .unionByName(s3.select(F.lit("3_purchase").alias("stage"), "user_id"))
    )
    return staged.groupBy("stage").agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))


# ---------------------------------------------------------------------------
# ev26: time-bounded funnel (each step within a window of the previous)
# ---------------------------------------------------------------------------

# Step-to-step conversion window. ev10's strict-order funnel counts a
# purchase that happens a month after the click; product funnels almost
# always bound each step ("clicked within 72h of the first view") —
# the unbounded and bounded counts can differ by an order of magnitude.
_EV26_WINDOW_HOURS = 72

_EV26_SQL = f"""
WITH s1 AS (
    SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, MIN(e.ts) AS t2
    FROM events e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'click'
      AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL {_EV26_WINDOW_HOURS} HOUR
    GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, MIN(e.ts) AS t3
    FROM events e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'purchase'
      AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL {_EV26_WINDOW_HOURS} HOUR
    GROUP BY e.user_id
)
SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM (
    SELECT '1_view' AS stage, user_id FROM s1
    UNION ALL SELECT '2_click', user_id FROM s2
    UNION ALL SELECT '3_purchase', user_id FROM s3
) u GROUP BY stage
"""


@register("ev26_timebound_funnel", oracle=_EV26_SQL)
def ev26_timebound_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded conversion funnel: view -> click -> purchase where
    every step must land within 72 hours of the previous step's
    timestamp — ev10's strict-order chain with the step deadline real
    funnels impose (see the note on _EV26_WINDOW_HOURS).

    Same scale shape as ev10: three per-user aggregates chained by
    user_id equi-joins (one shuffle key reused stage to stage); the
    deadline is a per-row timestamp comparison fused into each join's
    filter, adding zero exchanges. Timestamps stay in the timestamp
    domain on both engines (UTC session), so the +72h arithmetic is
    value-identical."""
    events = load_table(spark, sf_dir, "events")
    window = F.expr(f"INTERVAL {_EV26_WINDOW_HOURS} HOURS")
    s1 = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        events.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + window))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        events.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + window))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    staged = (
        s1.select(F.lit("1_view").alias("stage"), "user_id")
        .unionByName(s2.select(F.lit("2_click").alias("stage"), "user_id"))
        .unionByName(s3.select(F.lit("3_purchase").alias("stage"), "user_id"))
    )
    return staged.groupBy("stage").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


# ---------------------------------------------------------------------------
# tx14: boilerplate n-gram scrub (frequent-shingle ratio per document)
# ---------------------------------------------------------------------------

# A shingle is boilerplate within its source when it appears in >= 5 of
# that source's documents — the C4/RefinedWeb-style repeated-template
# signal, at shingle granularity because the fixture's documents are
# newline-free word streams.
_TX14_DF_MIN = 5

_TX14_SQL = f"""
WITH sh AS ({_SHINGLE_ROWS_SQL}),
ss AS (
    SELECT sh.doc_id, d.source, sh.shingle
    FROM sh JOIN documents d ON sh.doc_id = d.doc_id
),
df AS (
    SELECT source, shingle, CAST(COUNT(*) AS BIGINT) AS df
    FROM ss GROUP BY source, shingle
)
SELECT ss.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN df.df >= {_TX14_DF_MIN} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boilerplate,
       CAST(SUM(CASE WHEN df.df >= {_TX14_DF_MIN} THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS boilerplate_ratio
FROM ss JOIN df ON ss.source = df.source AND ss.shingle = df.shingle
GROUP BY ss.doc_id
"""


@register("tx14_boilerplate_ngram_ratio", oracle=_TX14_SQL)
def tx14_boilerplate_ngram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate ratio: the fraction of a document's
    3-gram shingles that are corpus-frequent within its source (df >=
    5 docs) — the repeated-template signal curation pipelines use to
    strip navigation chrome, license banners, and mirrored pages before
    training.

    Two shuffles, both on compact keys: shingle-explode -> groupBy
    (source, shingle) for document frequency (counts only — shingles
    are distinct per doc by construction), then the df table joins back
    to the exploded rows on the same (source, shingle) partitioning
    Catalyst reuses, and the final per-doc rollup carries three longs.
    Work is linear in total shingle volume; hot shingles concentrate in
    the df aggregate (mergeable counts), never in a pair join — this is
    the frequency-analysis dual of the dd03 Jaccard join, with none of
    its Σ df² blowup. The ratio is an exact int/int division, identical
    on both engines."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    ss = _shingle_rows(spark, sf_dir).join(docs, "doc_id").localCheckpoint(
        eager=False
    )  # feeds the df census AND the flag join: tokenize once
    df = ss.groupBy("source", "shingle").agg(F.count(F.lit(1)).alias("df"))
    flagged = ss.join(df, ["source", "shingle"])
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(F.col("df") >= _TX14_DF_MIN, 1).otherwise(0)).alias(
            "n_boilerplate"
        ),
        (
            F.sum(F.when(F.col("df") >= _TX14_DF_MIN, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("boilerplate_ratio"),
    )


# ---------------------------------------------------------------------------
# tx15: character-diversity quality gate (Simpson index)
# ---------------------------------------------------------------------------


@register(
    "tx15_char_diversity",
    oracle="""
    WITH ch AS (
        SELECT doc_id,
               unnest(string_split(lower(text), '')) AS c
        FROM documents
        WHERE length(text) > 0
    ),
    counts AS (SELECT doc_id, c, COUNT(*) AS n FROM ch GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_chars_total,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
           1.0 - CAST(SUM(n * n) AS DOUBLE)
                 / (CAST(SUM(n) AS DOUBLE) * CAST(SUM(n) AS DOUBLE))
               AS char_simpson
    FROM counts
    GROUP BY doc_id
    """,
)
def tx15_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-diversity quality gate: Simpson diversity index
    1 - sum(n_c^2)/N^2 over the per-document character histogram — a
    gibberish/low-entropy detector (runs of one character or a tiny
    alphabet score near 0, natural text near 1) used as a cheap
    pre-filter before model-based quality scoring.

    Chosen over Shannon entropy deliberately: the index is pure integer
    arithmetic until a single final divide/subtract, so Spark and the
    SQL oracle agree bit-exactly, whereas ln() is not
    correctly-rounded-guaranteed and differs across libm
    implementations. Plan: explode chars -> two-level aggregate keyed
    (doc_id, char) then doc_id; every shuffled row is a (bigint,
    1-char) pair, and partial aggregation collapses each partition to
    at most |alphabet| rows per document before the exchange."""
    # Explicit width before the per-char explode (the _doc_shingle_sets
    # lesson): the documents fixture arrives as ONE scan task at these
    # byte sizes, which serializes the ~40M exploded char rows onto one
    # core — the measured 2.2 s floor of round 3's tx15. One compact
    # (doc_id, text) shuffle buys 32-way explode+hash-agg, and the
    # repartitioning ALSO pre-clusters by doc_id so the (doc_id, c)
    # aggregate needs no further corpus-wide exchange.
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    # LET-BIND lower(text): referencing the alias inside the per-index
    # lambda would re-lowercase the whole string once per character
    # (CollapseProject inlines aliases into lambda bodies — the
    # measured _SHINGLES trap), turning a 10k-char doc into ~10^8 char
    # ops. The array-lambda binding evaluates lower() once per row.
    chars = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "element_at(transform(array(lower(text)),"
                " t -> transform(sequence(1, length(t)), i -> substring(t, i, 1))), 1)"
            )
        ).alias("c"),
    )
    counts = chars.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("n"))
    n_total = F.sum("n")
    return counts.groupBy("doc_id").agg(
        n_total.cast("long").alias("n_chars_total"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
        (
            F.lit(1.0)
            - F.sum(F.col("n") * F.col("n")).cast("double")
            / (n_total.cast("double") * n_total.cast("double"))
        ).alias("char_simpson"),
    )
