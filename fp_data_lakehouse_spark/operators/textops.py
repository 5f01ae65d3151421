"""Text-analysis operators over the documents table: language ID,
quality scoring, token counting, fingerprinting (the curation layer a
training-data pipeline runs before dedup/filtering).

All per-row column expressions — at 100 TB these are embarrassingly
parallel map work fused into the parquet scan; the only aggregations
(the corpus rollup) are small-group reduces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as X
from ..sources.catalog import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Language identification (stopword-hit heuristic + CJK script check)
# ---------------------------------------------------------------------------

_LANG_ORDER = ("en", "es", "fr", "de")  # deterministic argmax preference


@register(
    "tx01_language_id",
    oracle=f"""
    SELECT doc_id, lang,
           CASE
             WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
             WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
             WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
             WHEN s_fr >= s_de THEN 'fr'
             ELSE 'de'
           END AS pred_lang
    FROM (
        SELECT doc_id, lang, text,
               {X.stopword_hits_sql("en")} AS s_en,
               {X.stopword_hits_sql("es")} AS s_es,
               {X.stopword_hits_sql("fr")} AS s_fr,
               {X.stopword_hits_sql("de")} AS s_de
        FROM documents
    ) scored
    """,
)
def tx01_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID with a CJK-script fast path.

    The classic cheap lang-ID: count per-language stopword hits over the
    token stream, argmax with a fixed preference order for ties; han
    characters short-circuit to 'zh'. Pure map work.
    """
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        "text",
        *[X.stopword_hits(lang).alias(f"s_{lang}") for lang in _LANG_ORDER],
    )
    pred = (
        F.when(F.col("text").rlike("[一-鿿]"), "zh")
        .when(
            (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_de")),
            "en",
        )
        .when((F.col("s_es") >= F.col("s_fr")) & (F.col("s_es") >= F.col("s_de")), "es")
        .when(F.col("s_fr") >= F.col("s_de"), "fr")
        .otherwise("de")
    )
    return scored.select("doc_id", "lang", pred.alias("pred_lang"))


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------


@register(
    "tx02_quality_scores",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST({X.word_count_sql()} AS BIGINT) AS n_words,
           CAST({X.punct_count_sql()} AS BIGINT) AS n_punct,
           CAST({X.stopword_hits_sql("en")} AS BIGINT) AS n_stopwords
    FROM documents
    """,
)
def tx02_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: length, word count, punctuation
    count, stopword count — the raw inputs of heuristic quality filters
    (length bounds, punct ratio, stopword ratio). Counts stay integer so
    the downstream ratios are engine-exact."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        X.word_count().cast("long").alias("n_words"),
        X.punct_count().cast("long").alias("n_punct"),
        X.stopword_hits("en").cast("long").alias("n_stopwords"),
    )


@register(
    "tx03_quality_filter",
    oracle=f"""
    SELECT doc_id, n_chars
    FROM (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
               {X.word_count_sql()} AS n_words,
               {X.punct_count_sql()} AS n_punct
        FROM documents
    ) q
    WHERE n_chars BETWEEN 100 AND 20000
      AND n_words >= 20
      AND n_punct * 10 <= n_chars
    """,
)
def tx03_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-set of a heuristic quality filter: length window, minimum
    word count, punctuation below 10% of characters. Integer-ratio
    comparison (n_punct*10 <= n_chars) avoids float division entirely."""
    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        X.word_count().alias("n_words"),
        X.punct_count().alias("n_punct"),
    )
    return q.filter(
        F.col("n_chars").between(100, 20000)
        & (F.col("n_words") >= 20)
        & (F.col("n_punct") * 10 <= F.col("n_chars"))
    ).select("doc_id", "n_chars")


# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------


@register(
    "tx04_token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST({X.word_count_sql()} AS BIGINT) AS ws_tokens,
           CAST({X.bpe_ish_token_count_sql()} AS BIGINT) AS bpe_ish_tokens
    FROM documents
    """,
)
def tx04_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + BPE-ish proxy (alpha runs / digit runs /
    single symbols) — the budget-estimation pass of a training pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.word_count().cast("long").alias("ws_tokens"),
        X.bpe_ish_token_count().cast("long").alias("bpe_ish_tokens"),
    )


@register(
    "tx05_corpus_token_budget",
    oracle=f"""
    SELECT source, CAST(SUM({X.word_count_sql()}) AS BIGINT) AS total_tokens,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY source
    """,
)
def tx05_corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budget per source: the rollup feeding sampling weights."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.sum(X.word_count()).cast("long").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# Composed curation pipeline
# ---------------------------------------------------------------------------


@register(
    "tx07_curation_pipeline",
    oracle=f"""
    WITH q AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
               {X.word_count_sql()} AS n_words,
               {X.punct_count_sql()} AS n_punct,
               md5(lower(trim(text))) AS fp
        FROM documents
    ),
    keep AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY fp)
    SELECT q.doc_id, q.n_chars
    FROM q JOIN keep ON q.doc_id = keep.doc_id
    WHERE q.n_chars BETWEEN 100 AND 20000
      AND q.n_words >= 20
      AND q.n_punct * 10 <= q.n_chars
    """,
)
def tx07_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed keep-list a real curation run produces: exact-dedup
    representatives (min doc_id per fingerprint) that also pass the
    quality filter — one scan feeds both the fingerprint groupBy and the
    quality predicates, then a semi-join intersects them. The shape to
    note at 100 TB: quality filtering is map-only and runs FIRST in the
    scan, so the dedup shuffle only carries rows that can survive."""
    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        X.word_count().alias("n_words"),
        X.punct_count().alias("n_punct"),
        F.md5(F.lower(F.trim("text"))).alias("fp"),
    )
    keep = q.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    return (
        q.filter(
            F.col("n_chars").between(100, 20000)
            & (F.col("n_words") >= 20)
            & (F.col("n_punct") * 10 <= F.col("n_chars"))
        )
        .join(keep, "doc_id", "left_semi")
        .select("doc_id", "n_chars")
    )


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------

_TFIDF_TOP_K = 3


@register(
    "tx08_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
               tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, tfidf, rnk FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY tfidf DESC, term ASC) AS rnk
        FROM scored
    ) r WHERE rnk <= {_TFIDF_TOP_K}
    """,
)
def tx08_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf-idf.

    The full text-vectorization shuffle diagram at its smallest: term
    frequencies per (doc, term) — one groupBy; document frequencies per
    term — a second groupBy over the FIRST aggregate's (already tiny)
    output, never over raw tokens; idf joined back term-keyed; top-k by
    window with a deterministic tie-break. N arrives via a broadcast
    1-row cross join, not a collect. ln(int-ratio) is the only float
    (bit-identical libm on both engines)."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            (F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "tfidf", "rnk")
    )


# ---------------------------------------------------------------------------
# Fingerprinting
# ---------------------------------------------------------------------------


@register(
    "tx06_fingerprints",
    oracle=f"""
    SELECT doc_id,
           md5(lower(trim(text))) AS md5_fp,
           CAST({X.rolling_hash_sql()} AS BIGINT) AS rolling_fp
    FROM documents
    """,
)
def tx06_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two document fingerprints: md5 of normalized text (exact-dup key)
    and an order-sensitive rolling hash over the token stream (cheap
    near-identity signature; engine-portable left fold)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.lower(F.trim("text"))).alias("md5_fp"),
        X.rolling_hash().cast("long").alias("rolling_fp"),
    )


# ---------------------------------------------------------------------------
# Context-window packing (sequence packing)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 2048  # tokens per context window

_PACK_ORDER_SQL = "md5(CAST(doc_id AS VARCHAR))"
_PACK_ORDER = "md5(cast(doc_id as string))"


@register(
    "tx10_context_packing",
    oracle=f"""
    WITH sized AS (
        SELECT source, doc_id, {_PACK_ORDER_SQL} AS h,
               CAST({X.word_count_sql()} AS BIGINT) AS toks
        FROM documents
    ),
    placed AS (
        SELECT source, toks,
               (SUM(toks) OVER (PARTITION BY source ORDER BY h, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - toks) // {_PACK_BUDGET} AS bin
        FROM sized
    )
    SELECT source, CAST(bin AS BIGINT) AS bin,
           COUNT(*) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS total_tokens
    FROM placed
    GROUP BY source, bin
    """,
)
def tx10_context_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate documents (in a deterministic
    hash-shuffled order) and chunk the stream into fixed token-budget
    context windows; a document's bin is the window its first token
    lands in. Reports per-bin document count and token mass.

    Packing is per-source — the window partitions by source, so at
    100 TB each source packs independently on its own executors instead
    of serializing the corpus through one global ordering (the
    single-partition window that would otherwise be the bottleneck).
    The md5 order is the reproducible stand-in for the usual random
    shuffle before packing."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "source",
        "doc_id",
        F.expr(_PACK_ORDER).alias("h"),
        X.word_count().cast("long").alias("toks"),
    )
    placed = sized.select(
        "source",
        "toks",
        F.expr(f"(sum(toks) over (partition by source order by h, doc_id"
               f" rows between unbounded preceding and current row) - toks)"
               f" div {_PACK_BUDGET}").alias("bin"),
    )
    return placed.groupBy("source", F.col("bin").cast("long").alias("bin")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").cast("long").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"

# The slim synthetic customer table carries no contact fields, so the
# PII-laden input is synthesized deterministically from its columns
# (same fixture-building move as et01's transcript synthesis) — the
# scrubbing operator itself is the thing under test.
_RAW_SQL = (
    "'reach ' || c_name || ' <' || lower(c_mktsegment) || CAST(c_custkey AS VARCHAR)"
    " || '@example.com> or +1-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')"
    " || ' re ' || lower(c_mktsegment)"
)
_RAW_SPARK = (
    "concat('reach ', c_name, ' <', lower(c_mktsegment), cast(c_custkey as string),"
    " '@example.com> or +1-555-', lpad(cast(c_custkey % 10000 as string), 4, '0'),"
    " ' re ', lower(c_mktsegment))"
)


@register(
    "tx11_pii_scrub",
    oracle=f"""
    WITH raw AS (SELECT c_custkey, {_RAW_SQL} AS txt FROM customer)
    SELECT c_custkey,
           regexp_replace(regexp_replace(txt, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(txt, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(txt, '{_PHONE_RE}')) AS BIGINT) AS n_phones
    FROM raw
    """,
)
def tx11_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over free text: replace email addresses and phone
    numbers with typed placeholders and count the redactions — the
    compliance pass every training corpus goes through before the
    tokenizer sees it. Pure per-row regex map work, fused into the scan;
    zero shuffles at any scale."""
    cust = load_table(spark, sf_dir, "customer")
    raw = cust.select("c_custkey", F.expr(_RAW_SPARK).alias("txt"))
    return raw.select(
        "c_custkey",
        F.regexp_replace(
            F.regexp_replace("txt", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("scrubbed"),
        F.size(F.regexp_extract_all("txt", F.lit(_EMAIL_RE), F.lit(0))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("txt", F.lit(_PHONE_RE), F.lit(0))).cast("long").alias("n_phones"),
    )


_BIGRAM_TOP_K = 20


@register(
    "tx12_bigram_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents
    ),
    bigrams AS (
        SELECT doc_id,
               UNNEST(list_transform(range(2, len(t) + 1),
                                     i -> t[i - 1] || ' ' || t[i])) AS bigram
        FROM toks
    ),
    counts AS (
        SELECT bigram,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM bigrams GROUP BY bigram
    )
    SELECT bigram, n_occurrences, n_docs, rnk FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, bigram ASC) AS rnk
        FROM counts
    ) r WHERE rnk <= {_BIGRAM_TOP_K}
    """,
)
def tx12_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams with occurrence and document
    frequency — the n-gram census behind boilerplate detection and
    contamination screens (a bigram in half the corpus is template
    text, not signal). Bigrams come from ``zip_with`` over the token
    array and its shift — no self-join, no Python.

    One groupBy over (bigram, doc) pre-aggregates map-side before the
    distinct-doc rollup, so the wide shuffle carries (bigram, doc_id)
    pairs once each; the final top-k sorts |distinct bigrams| counted
    rows, and the global window ranks a frame that small on one
    partition by design (rank 20 cutoff, deterministic bigram
    tie-break)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("t")
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bigram"),
    )
    per_doc = bigrams.groupBy("bigram", "doc_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    counts = per_doc.groupBy("bigram").agg(
        F.sum("c").alias("n_occurrences"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("bigram"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _BIGRAM_TOP_K)
        .select("bigram", "n_occurrences", "n_docs", "rnk")
    )


@register(
    "tx13_repetition_score",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents
    ),
    tri AS (
        SELECT doc_id,
               UNNEST(list_transform(range(3, len(t) + 1),
                      i -> t[i - 2] || ' ' || t[i - 1] || ' ' || t[i])) AS g
        FROM toks
    ),
    pertri AS (
        SELECT doc_id, g, COUNT(*) AS c FROM tri GROUP BY doc_id, g
    ),
    rep AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_trigrams,
               CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_dup_trigrams
        FROM pertri GROUP BY doc_id
    ),
    tokstats AS (
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct_tokens
        FROM toks
    )
    SELECT s.doc_id, s.n_tokens, s.n_distinct_tokens,
           COALESCE(r.n_trigrams, 0) AS n_trigrams,
           COALESCE(r.n_dup_trigrams, 0) AS n_dup_trigrams,
           CAST(COALESCE(r.n_dup_trigrams, 0) AS DOUBLE)
               / greatest(COALESCE(r.n_trigrams, 0), 1) AS dup_trigram_frac,
           CAST(s.n_distinct_tokens AS DOUBLE) / greatest(s.n_tokens, 1)
               AS distinct_token_ratio
    FROM tokstats s LEFT JOIN rep r USING (doc_id)
    """,
)
def tx13_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition signals (the Gopher/MassiveText family
    of quality rules): duplicate-trigram fraction and distinct-token
    ratio per document. High dup_trigram_frac = boilerplate loops and
    keyword stuffing; low distinct_token_ratio = degenerate repetition.
    Both are integer ratios — one IEEE division each, no drift.

    Trigrams come from an index-range transform over the token array
    (no self-join); the per-(doc, trigram) count is the only wide
    shuffle and it carries pre-aggregated pairs. The token-level stats
    are per-row array expressions fused into the scan; doc-keyed join
    of two doc-keyed aggregates shares the partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("t")
    )
    tri = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                # sequence(3, n) DESCENDS when n < 3 — guard short docs
                # with an empty index list; [] is 0-based in Spark vs
                # DuckDB's 1-based, hence the shifted subscripts.
                "transform(if(size(t) >= 3, sequence(3, size(t)), array()),"
                " i -> concat(t[i-3], ' ', t[i-2], ' ', t[i-1]))"
            )
        ).alias("g"),
    )
    pertri = tri.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    rep = pertri.groupBy("doc_id").agg(
        F.sum("c").alias("n_trigrams"),
        (F.sum("c") - F.count(F.lit(1))).alias("n_dup_trigrams"),
    )
    tokstats = toks.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("t")).cast("long").alias("n_distinct_tokens"),
    )
    return (
        tokstats.join(rep, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct_tokens",
            F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
            F.coalesce("n_dup_trigrams", F.lit(0)).alias("n_dup_trigrams"),
            (
                F.coalesce("n_dup_trigrams", F.lit(0)).cast("double")
                / F.greatest(F.coalesce("n_trigrams", F.lit(0)), F.lit(1))
            ).alias("dup_trigram_frac"),
            (
                F.col("n_distinct_tokens").cast("double")
                / F.greatest(F.col("n_tokens"), F.lit(1))
            ).alias("distinct_token_ratio"),
        )
    )


_PMI_MIN_COUNT = 5
_PMI_TOP_K = 20


@register(
    "tx16_pmi_collocations",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents
    ),
    uni AS (
        SELECT UNNEST(t) AS w FROM toks
    ),
    ucounts AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w FROM uni GROUP BY w
    ),
    total AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n_total FROM ucounts),
    pairs AS (
        SELECT UNNEST(list_transform(range(2, len(t) + 1),
                                     i -> [t[i - 1], t[i]])) AS p
        FROM toks
    ),
    bcounts AS (
        SELECT p[1] AS w1, p[2] AS w2, CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM pairs GROUP BY w1, w2
    ),
    scored AS (
        SELECT b.w1, b.w2, b.n_ab, a.n_w AS n_a, c.n_w AS n_b,
               CAST(b.n_ab * t.n_total AS DOUBLE)
                   / CAST(a.n_w * c.n_w AS DOUBLE) AS lift
        FROM bcounts b
        JOIN ucounts a ON b.w1 = a.w
        JOIN ucounts c ON b.w2 = c.w
        CROSS JOIN total t
        WHERE b.n_ab >= {_PMI_MIN_COUNT}
    )
    SELECT w1 || ' ' || w2 AS bigram, n_ab, n_a, n_b, lift, rnk FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, w1 ASC, w2 ASC) AS rnk
        FROM scored
    ) r WHERE rnk <= {_PMI_TOP_K}
    """,
)
def tx16_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by PMI lift: P(w1 w2) / (P(w1) * P(w2)),
    computed as the integer cross-product n_ab * N / (n_a * n_b) — the
    statistic behind phrase mining and tokenizer-merge candidates
    (log PMI is monotone in the lift, so the ranking is identical and
    the ln never enters the engine-equality surface). A min-count
    floor of {_PMI_MIN_COUNT} kills the degenerate 1-occurrence pairs
    that dominate raw PMI.

    One token explode feeds both the unigram census and (via the
    zip_with shift, no self-join) the bigram census; each is one
    map-side-combined groupBy. The scoring joins are bigram-table vs
    unigram-table — vocabulary-sized, tiny next to the corpus, and the
    global total arrives as a broadcast 1-row aggregate. The integer
    products stay under 2^63 up to ~10^12 tokens (and under DOUBLE's
    2^53 exact-integer bound for the division at ~10^11), so the score
    is bit-identical across engines at any realistic corpus."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("t")
    )
    uni = toks.select(F.explode("t").alias("w"))
    ucounts = uni.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    total = ucounts.agg(F.sum("n_w").alias("n_total"))
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bcounts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
    scored = (
        bcounts.filter(F.col("n_ab") >= _PMI_MIN_COUNT)
        .join(ucounts.withColumnRenamed("w", "w1").withColumnRenamed("n_w", "n_a"), "w1")
        .join(ucounts.withColumnRenamed("w", "w2").withColumnRenamed("n_w", "n_b"), "w2")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "lift",
            (F.col("n_ab") * F.col("n_total")).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double"),
        )
    )
    w = Window.orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _PMI_TOP_K)
        .select(
            F.concat("w1", F.lit(" "), "w2").alias("bigram"),
            "n_ab",
            "n_a",
            "n_b",
            "lift",
            "rnk",
        )
    )


# ---------------------------------------------------------------------------
# tx17: BPE merge-step candidates (tokenizer-training inner loop)
# ---------------------------------------------------------------------------

# Top-k adjacent SYMBOL pairs within words, counted across the corpus
# with word-frequency weighting — exactly the statistic byte-pair
# encoding training maximizes each merge round. The first round's
# symbols are single characters; iterating merge -> re-pair is the
# training loop, and each round is THIS query over the re-segmented
# vocabulary, so certifying one round certifies the loop's engine (the
# sim05/pr01 move applied to tokenization).
_BPE_TOP_K = 20


@register(
    "tx17_bpe_merge_candidates",
    oracle=f"""
    WITH words AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS wf
        FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
            FROM documents
        )
        WHERE len(w) >= 2
        GROUP BY w
    ),
    pairs AS (
        SELECT substring(w, i, 2) AS pair, w, wf
        FROM words, UNNEST(range(1, len(w))) AS r(i)
    ),
    counts AS (
        SELECT pair,
               CAST(SUM(wf) AS BIGINT) AS n_weighted,
               CAST(COUNT(DISTINCT w) AS BIGINT) AS n_word_types
        FROM pairs GROUP BY pair
    )
    SELECT pair, n_weighted, n_word_types, rnk FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY n_weighted DESC, pair ASC) AS rnk
        FROM counts
    ) r WHERE rnk <= {_BPE_TOP_K}
    """,
)
def tx17_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge candidates: the top-20 adjacent character pairs inside
    words, weighted by word frequency — the argmax a byte-pair-encoding
    tokenizer takes every merge round (see the loop note on
    _BPE_TOP_K). Emits the weighted count, the number of distinct word
    types containing the pair, and the deterministic rank.

    The scale trick is the word-type rollup FIRST: pair extraction runs
    over the VOCABULARY (word, frequency) — tens of thousands of rows
    regardless of corpus size — not over every word occurrence, so the
    per-character work collapses by the corpus/vocabulary ratio before
    it starts (real BPE trainers do exactly this). One explode of
    (len(w)-1) substring pairs per vocabulary word, one weighted-sum
    groupBy, and a 20-row deterministic top-k window."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
        )
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
    )
    # LET-BINDING not needed: w is a plain column reference, and the
    # substring lambda touches it via the explode output only.
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "w",
        "wf",
    )
    counts = pairs.groupBy("pair").agg(
        F.sum("wf").cast("long").alias("n_weighted"),
        F.countDistinct("w").cast("long").alias("n_word_types"),
    )
    w = Window.orderBy(F.desc("n_weighted"), F.asc("pair"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _BPE_TOP_K)
        .select("pair", "n_weighted", "n_word_types", "rnk")
    )


# ---------------------------------------------------------------------------
# tx18: overlapping context-window chunking (RAG / pretraining ingest)
# ---------------------------------------------------------------------------

# 64-token windows with 16-token stride overlap — the document->chunk
# explosion every retrieval index and long-context pretraining pipeline
# runs first. Chunk identity is the md5 of the joined token slice, so
# chunk-level dedup (dd12's segment census) composes directly on the
# output.
_CHUNK_TOKENS = 64
_CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


@register(
    "tx18_chunk_windows",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_idx,
               CAST(1 + i * {_CHUNK_STRIDE} AS BIGINT) AS start_token,
               list_slice(t, 1 + i * {_CHUNK_STRIDE},
                          LEAST(i * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}, len(t))) AS w
        FROM toks,
             UNNEST(range(0, GREATEST((len(t) - {_CHUNK_TOKENS} + {_CHUNK_STRIDE} - 1)
                                      // {_CHUNK_STRIDE}, 0) + 1)) AS r(i)
        WHERE len(t) > 0
    )
    SELECT doc_id, chunk_idx, start_token,
           CAST(len(w) AS BIGINT) AS n_tokens,
           md5(array_to_string(w, ' ')) AS chunk_hash
    FROM chunks
    """,
)
def tx18_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking: every document exploded
    into 64-token windows advancing by a 48-token stride (16-token
    overlap), each chunk carrying its index, start offset, length, and
    a content hash — the ingest step in front of every retrieval index
    and long-context packing run, with hashes that make chunk-level
    dedup a groupBy away (see the note on _CHUNK_TOKENS).

    Scale shape: tokenization happens once per document (let-bound
    array), the chunk count per doc is ceil((len-64)/48)+1, and the
    whole operator is scan-fused map work — no shuffle at all; output
    rows are (ids, offsets, 32-char hash), never the chunk text, so
    the explode multiplies metadata, not payload. The window/stride
    arithmetic is identical integer math in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    n_chunks = (
        f"greatest(ceil((size(t) - {_CHUNK_TOKENS}) / {_CHUNK_STRIDE}), 0) + 1"
    )
    chunks = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "element_at(transform(array(split(lower(trim(text)), '\\\\s+')),"
                f" t -> IF(size(t) = 0, array(),"
                f" transform(sequence(0, cast({n_chunks} as int) - 1),"
                f" i -> struct(cast(i as bigint) as chunk_idx,"
                f" cast(1 + i * {_CHUNK_STRIDE} as bigint) as start_token,"
                f" slice(t, 1 + i * {_CHUNK_STRIDE},"
                f" {_CHUNK_TOKENS}) as w)))), 1)"
            )
        ).alias("c"),
    )
    return chunks.select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.start_token").alias("start_token"),
        F.size("c.w").cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.col("c.w"))).alias("chunk_hash"),
    )


# ---------------------------------------------------------------------------
# tx19: the BPE TRAINING LOOP, bounded rounds (tx17's iterative twin —
# the pr01/pr02 duality applied to tokenizer training). Each round:
# count adjacent symbol pairs over the (symbols, word-frequency)
# vocabulary, take the deterministic argmax, greedily merge it
# left-to-right in every word, recount. The 8-round sequence of
# argmax + rewrite has no finite SQL expression (each round's counts
# depend on the previous round's rewritten vocabulary), so tx19
# registers rows-only; tx17 pins round 1's argmax on the driver's
# hard signal and pytest pins the loop invariants (argmax agreement,
# monotone non-increasing merge counts, strict symbol shrinkage, the
# merged pair's disappearance).
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 8


def _bpe_merge_round(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy left-to-right merge of adjacent (a, b) into a+b inside
    every word's symbol array — one interpreted fold per VOCABULARY row
    (tens of thousands of words x ~10 symbols, corpus-size independent,
    so the interpreted HOF is fine here, unlike the corpus-sized
    shingle case). F.lit handles arbitrary symbol text safely."""
    merged = F.lit(a + b)

    def step(acc, x):
        return F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x)))

    return vocab.withColumn(
        "syms",
        F.aggregate("syms", F.array().cast("array<string>"), step),
    )


def _bpe_pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair census over the symbol vocabulary: one
    zip of syms with its own tail per word, exploded, then a
    map-side-combined sum — identical counting semantics to tx17's
    character pairs on the initial (all-chars) vocabulary."""
    pairs = vocab.select(
        "wf",
        F.explode(
            F.zip_with(
                F.slice("syms", F.lit(1), F.size("syms") - 1),
                F.slice("syms", F.lit(2), F.size("syms") - 1),
                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("wf").cast("long").alias("n_weighted"))


@register("tx19_bpe_train_loop")
def tx19_bpe_train_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8 rounds of BPE training over the corpus vocabulary: returns the
    learned merge table (round, symbol pair, merged token, weighted
    count at selection time) — the artifact a tokenizer trainer
    persists. Vocabulary-sized state throughout: the corpus is touched
    exactly once (word census); every later round runs on (word,
    symbols, frequency) rows whose cardinality is corpus-size
    independent, with per-round lineage cut by localCheckpoint and one
    1-row argmax crossing to the driver (the sim06/pr02 probe
    pattern). At 100 TB only the initial word census scales with data
    — exactly how production BPE trainers behave."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
    )
    vocab = words.select(
        F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").alias(
            "syms"
        ),
        "wf",
    ).localCheckpoint(eager=False)

    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        top = (
            _bpe_pair_counts(vocab)
            .orderBy(F.desc("n_weighted"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0].a, top[0].b, top[0].n_weighted
        merges.append((rnd, a, b, n))
        vocab = _bpe_merge_round(vocab, a, b).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "round INT, sym_a STRING, sym_b STRING, n_weighted BIGINT"
    ).select(
        "round",
        "sym_a",
        "sym_b",
        F.concat("sym_a", "sym_b").alias("merged"),
        "n_weighted",
    )


# ---------------------------------------------------------------------------
# tx20: the BPE training LOOP on the hard signal (round-6)
# ---------------------------------------------------------------------------
# tx19 is rows-only because its per-round argmax crosses the driver —
# but every round is individually deterministic, so the whole loop has
# a closed form: unroll all 8 rounds as chained CTEs (the pr03/sim11
# move applied to tokenizer training). The oracle encodes each word's
# symbol array as '(s1)(s2)...(sn)' and performs the greedy
# left-to-right merge as ONE string replace per round — replace of
# '(a)(b)' by '(ab)' on this encoding is exactly tx19's array fold:
# adjacent matches share no characters (each symbol carries its own
# delimiters), so non-overlapping leftmost replace == leftmost-greedy
# fold, verified against a literal fold reimplementation on the
# fixtures. The certificate restricts the vocabulary to ^[a-z0-9]+$
# words so the '(' ')' delimiters can never collide with symbol text;
# tx19 stays registered as the unrestricted production surface.

_TX20_ROUNDS = 8


def _tx20_oracle() -> str:
    ctes = [
        """words AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS wf
        FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
              FROM documents)
        WHERE len(w) >= 2 AND regexp_full_match(w, '[a-z0-9]+')
        GROUP BY w
    )""",
        """v1 AS (SELECT regexp_replace(w, '(.)', '(\\1)', 'g') AS enc, wf FROM words)""",
    ]
    for k in range(1, _TX20_ROUNDS + 1):
        ctes.append(
            f"""s{k} AS (
        SELECT regexp_extract_all(enc, '\\(([^()]*)\\)', 1) AS syms, wf FROM v{k}
    )"""
        )
        ctes.append(
            f"""pc{k} AS (
        SELECT syms[i] AS a, syms[i+1] AS b, CAST(SUM(wf) AS BIGINT) AS n_weighted
        FROM s{k}, UNNEST(range(1, len(syms))) AS r(i)
        GROUP BY syms[i], syms[i+1]
    )"""
        )
        ctes.append(
            f"""top{k} AS (
        SELECT a, b, n_weighted FROM pc{k}
        ORDER BY n_weighted DESC, a ASC, b ASC LIMIT 1
    )"""
        )
        if k < _TX20_ROUNDS:
            ctes.append(
                f"""v{k + 1} AS (
        SELECT replace(v.enc, '(' || t.a || ')(' || t.b || ')',
                       '(' || t.a || t.b || ')') AS enc, v.wf
        FROM v{k} v CROSS JOIN top{k} t
    )"""
            )
    sel = "\n    UNION ALL\n    ".join(
        f'SELECT {k} AS "round", a AS sym_a, b AS sym_b, a || b AS merged,'
        f" n_weighted FROM top{k}"
        for k in range(1, _TX20_ROUNDS + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + sel


@register("tx20_bpe_train_certified", oracle=_tx20_oracle())
def tx20_bpe_train_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tx19's 8-round BPE training loop, value-hash-checked (see the
    unrolling note above). Engine path identical to tx19 — vocabulary-
    sized per-round state, one 1-row argmax per round — on the
    alphanumeric word census."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
        .filter((F.length("w") >= 2) & F.col("w").rlike("^[a-z0-9]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
    )
    vocab = words.select(
        F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").alias(
            "syms"
        ),
        "wf",
    ).localCheckpoint(eager=False)

    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, _TX20_ROUNDS + 1):
        top = (
            _bpe_pair_counts(vocab)
            .orderBy(F.desc("n_weighted"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0].a, top[0].b, top[0].n_weighted
        merges.append((rnd, a, b, n))
        if rnd < _TX20_ROUNDS:
            vocab = _bpe_merge_round(vocab, a, b).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "round INT, sym_a STRING, sym_b STRING, n_weighted BIGINT"
    ).select(
        "round",
        "sym_a",
        "sym_b",
        F.concat("sym_a", "sym_b").alias("merged"),
        "n_weighted",
    )


# ---------------------------------------------------------------------------
# tx21: APPLY the trained tokenizer — per-doc BPE token counts (round-6)
# ---------------------------------------------------------------------------
# tx20 certifies TRAINING the merge table; tx21 certifies the step a
# pipeline actually runs at 100 TB: tokenize the corpus with the
# trained merges and budget per-document token counts (tx04's
# regex-count twin, under a real learned tokenizer). The engine
# tokenizes at the VOCABULARY level — the 8-round merge loop runs on
# (word, symbols, frequency) rows exactly as tx19/tx20, corpus-size
# independent — and the corpus pass is one explode + a vocabulary-
# sized broadcast join + a per-doc sum, so corpus cost is one scan
# regardless of merge count. The oracle chains tx20's CTE rounds
# (carrying the word key through) into a per-word token count and the
# same left-join aggregation.


def _tx21_oracle() -> str:
    ctes = [
        """words AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS wf
        FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
              FROM documents)
        WHERE len(w) >= 2 AND regexp_full_match(w, '[a-z0-9]+')
        GROUP BY w
    )""",
        """v1 AS (SELECT w, regexp_replace(w, '(.)', '(\\1)', 'g') AS enc, wf
                FROM words)""",
    ]
    for k in range(1, _TX20_ROUNDS + 1):
        ctes.append(
            f"""s{k} AS (
        SELECT regexp_extract_all(enc, '\\(([^()]*)\\)', 1) AS syms, wf FROM v{k}
    )"""
        )
        ctes.append(
            f"""pc{k} AS (
        SELECT syms[i] AS a, syms[i+1] AS b, CAST(SUM(wf) AS BIGINT) AS n_weighted
        FROM s{k}, UNNEST(range(1, len(syms))) AS r(i)
        GROUP BY syms[i], syms[i+1]
    )"""
        )
        ctes.append(
            f"""top{k} AS (
        SELECT a, b FROM pc{k}
        ORDER BY n_weighted DESC, a ASC, b ASC LIMIT 1
    )"""
        )
        ctes.append(
            f"""v{k + 1} AS (
        SELECT v.w, replace(v.enc, '(' || t.a || ')(' || t.b || ')',
                            '(' || t.a || t.b || ')') AS enc, v.wf
        FROM v{k} v CROSS JOIN top{k} t
    )"""
        )
    final = f"""wtok AS (
        SELECT w, CAST(len(regexp_extract_all(enc, '\\(([^()]*)\\)', 1)) AS BIGINT)
                   AS n_tok
        FROM v{_TX20_ROUNDS + 1}
    ),
    docw AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        FROM documents
    )
    SELECT d.doc_id,
           CAST(COUNT(*) FILTER (WHERE wt.w IS NOT NULL) AS BIGINT) AS n_words_bpe,
           CAST(COALESCE(SUM(wt.n_tok), 0) AS BIGINT) AS n_tokens
    FROM docw d LEFT JOIN wtok wt ON d.w = wt.w
    GROUP BY d.doc_id"""
    return "WITH " + ",\n    ".join(ctes) + ",\n    " + final


@register("tx21_bpe_tokenize_corpus", oracle=_tx21_oracle())
def tx21_bpe_tokenize_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the tx20-trained BPE merges
    (see the design note above)."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
        .filter((F.length("w") >= 2) & F.col("w").rlike("^[a-z0-9]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
    )
    vocab = words.select(
        "w",
        F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").alias(
            "syms"
        ),
        "wf",
    ).localCheckpoint(eager=False)

    for _ in range(_TX20_ROUNDS):
        top = (
            _bpe_pair_counts(vocab)
            .orderBy(F.desc("n_weighted"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        vocab = _bpe_merge_round(vocab, top[0].a, top[0].b).localCheckpoint(
            eager=True
        )
    wtok = vocab.select("w", F.size("syms").cast("long").alias("n_tok"))
    docw = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
    )
    return (
        docw.join(F.broadcast(wtok), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("n_tok").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_words_bpe"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("n_tokens"),
        )
    )
