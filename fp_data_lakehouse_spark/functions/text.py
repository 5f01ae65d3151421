"""Text-analysis column expressions for large-scale corpus curation.

Everything here is built from `pyspark.sql.functions` higher-order and
string functions — per-row, no shuffle, no Python boundary — so a 100 TB
documents table is processed at parquet-scan speed with these expressions
fused into whole-stage codegen. Each helper has a DuckDB-SQL twin used
by the oracle gate (kept textually adjacent to stay in sync).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately tiny: the operator's mechanics (tokenize, set
# membership count, argmax) are the point; swap in real lists per corpus.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "for", "on", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr": ("le", "la", "de", "et", "un", "en", "du", "des", "les", "est"),
    "de": ("der", "die", "das", "und", "in", "von", "zu", "mit", "den", "ist"),
}

_HASH_MOD = 1_000_000_007


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization of lower-cased text."""
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


def tokens_sql(col: str = "text") -> str:
    return f"string_split_regex(lower(trim({col})), '\\s+')"


def stopword_hits(lang: str, col: str = "text") -> Column:
    """Total stopword occurrences (with repeats) for one language."""
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return F.expr(
        f"aggregate(transform({_tokens_expr(col)}, t -> CASE WHEN t IN ({lst}) THEN 1 ELSE 0 END),"
        f" 0, (acc, x) -> acc + x)"
    )


def _tokens_expr(col: str) -> str:
    return f"split(lower(trim({col})), '\\\\s+')"


def stopword_hits_sql(lang: str, col: str = "text") -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"list_sum(list_transform({tokens_sql(col)},"
        f" t -> CASE WHEN t IN ({lst}) THEN 1 ELSE 0 END))"
    )


def word_count(col: str = "text") -> Column:
    return F.size(tokens(col))


def word_count_sql(col: str = "text") -> str:
    return f"len({tokens_sql(col)})"


def punct_count(col: str = "text") -> Column:
    """Characters that are neither alphanumeric nor whitespace."""
    return F.length(F.regexp_replace(F.col(col), r"[A-Za-z0-9\s]", ""))


def punct_count_sql(col: str = "text") -> str:
    return f"length(regexp_replace({col}, '[A-Za-z0-9\\s]', '', 'g'))"


def bpe_ish_token_count(col: str = "text") -> Column:
    """BPE-ish token proxy: alpha runs, digit runs, single symbols."""
    return F.size(F.regexp_extract_all(F.col(col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))


def bpe_ish_token_count_sql(col: str = "text") -> str:
    return f"len(regexp_extract_all({col}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))"


def rolling_hash(col: str = "text") -> Column:
    """Order-sensitive document fingerprint: left fold of
    (acc*31 + ascii(token) + len(token)) mod p over the token stream.
    A content-sensitive rolling hash computable identically in any
    engine with a list fold."""
    return F.expr(
        f"aggregate(transform({_tokens_expr(col)}, w -> ascii(w) + length(w)),"
        f" 0L, (acc, x) -> (acc * 31 + x) % {_HASH_MOD})"
    )


def rolling_hash_sql(col: str = "text") -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform({tokens_sql(col)}, w -> CAST(ascii(w) + length(w) AS BIGINT))),"
        f" (acc, x) -> (acc * 31 + x) % {_HASH_MOD})"
    )
