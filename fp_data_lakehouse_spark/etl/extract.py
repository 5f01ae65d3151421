"""Extraction layer: flattened transcript text -> typed student and
course rows, as pure column expressions (no Python UDFs).

Replicates the reference's regex semantics exactly (operators T1-T11 of
SURVEY.md §2.2; reference ETL_FINAL.py:144-197), including default
values and the document-reject path. The input is a DataFrame with
``doc_id`` (any identifier) and ``text`` (full flattened document) —
the PDF-bytes→text step itself (reference pdfplumber, ETL_FINAL.py:144)
is the one genuinely-UDF stage and is out of scope for the parquet
fixtures; see ``multimodal`` for the binary-column plumbing pattern.

Everything here is `regexp_extract`/`regexp_extract_all` + casts, so at
100 TB the extraction runs JVM-side inside whole-stage codegen, one pass
per document, no Python boundary crossing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# T1 (ETL_FINAL.py:149-155): NRP + name anchor; document REJECTED if absent.
_RE_NRP_NAMA = r"(?s)NRP\s*/\s*Nama\s*(\d+)\s*/\s*(.*?)\s*SKS Tempuh"
# T2 (ETL_FINAL.py:157-158): IPK, default 0.0.
_RE_IPK = r"IPK\s+(\d+\.\d+)"
# T3 (ETL_FINAL.py:160-161): status up to the '---' divider, default '-'.
_RE_STATUS = r"(?s)Status\s+(.*?)---"
# T4 (ETL_FINAL.py:163-167): stage GPAs, default 0.0.
_RE_IP_PERSIAPAN = r"IP Tahap Persiapan\s*:\s*(\d+\.\d+)"
_RE_IP_SARJANA = r"IP Tahap Sarjana\s*:\s*(\d+\.\d+)"
# T5 (ETL_FINAL.py:169-177): credit totals; the stage totals are
# case-insensitive in the reference (re.IGNORECASE) -> inline (?i).
_RE_SKS_TEMPUH_LULUS = r"SKS\s*Tempuh\s*/\s*SKS\s*Lulus\s*(\d+)\s*/\s*(\d+)"
_RE_SKS_PERSIAPAN = r"(?i)Total Sks Tahap Persiapan\s*:\s*(\d+)"
_RE_SKS_SARJANA = r"(?i)Total Sks Tahap Sarjana\s*:\s*(\d+)"
# T6 (ETL_FINAL.py:189-190): repeating course rows
# (kode_mk, nama_mk, sks, tahun, semester-code, grade).
_RE_COURSE = r"([A-Z]{2}\d{6})\s+(.+?)\s+(\d)\s+(\d{4})/(Gs|Gn)/[A-Z]{0,2}\s+([A-Z]{1,2})"
# T7 (ETL_FINAL.py:193): the section marker that separates preparatory
# from undergraduate course listings.
_STAGE_MARKER = "Tahap: Sarjana"


def _float_or(col, default: float):
    # regexp_extract yields '' on no-match; '' casts to NULL, then default.
    return F.coalesce(F.nullif(col, F.lit("")).cast("double"), F.lit(default))


def _int_or(col, default: int):
    return F.coalesce(F.nullif(col, F.lit("")).cast("int"), F.lit(default))


def split_valid_invalid(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Reject path of T1 (ETL_FINAL.py:150-152): documents whose text
    lacks the ``NRP / Nama ... SKS Tempuh`` anchor are quarantined (the
    reference logs GAGAL and skips; ~10% of real inputs per
    ETL_Transkrip.log). Returns (valid, rejected)."""
    flagged = docs.withColumn("_has_anchor", F.col("text").rlike(_RE_NRP_NAMA))
    valid = flagged.filter(F.col("_has_anchor")).drop("_has_anchor")
    rejected = flagged.filter(~F.col("_has_anchor")).drop("_has_anchor")
    return valid, rejected


def extract_students(docs: DataFrame) -> DataFrame:
    """One typed row per valid document (T1-T5 semantics).

    Defaults mirror the reference exactly: numeric fields 0.0/0 when the
    pattern is absent (ETL_FINAL.py:158,167,172-177), status '-'
    (ETL_FINAL.py:161), both NRP and name stripped (T1 ``.strip()`` via
    the regex's own ``\\s*`` anchors + trim).
    """
    valid, _ = split_valid_invalid(docs)
    return valid.select(
        "doc_id",
        F.trim(F.regexp_extract("text", _RE_NRP_NAMA, 1)).alias("nrp"),
        F.trim(F.regexp_extract("text", _RE_NRP_NAMA, 2)).alias("nama"),
        _float_or(F.regexp_extract("text", _RE_IPK, 1), 0.0).alias("ipk"),
        F.coalesce(
            F.nullif(F.trim(F.regexp_extract("text", _RE_STATUS, 1)), F.lit("")),
            F.lit("-"),
        ).alias("status"),
        _float_or(F.regexp_extract("text", _RE_IP_PERSIAPAN, 1), 0.0).alias("ip_persiapan"),
        _float_or(F.regexp_extract("text", _RE_IP_SARJANA, 1), 0.0).alias("ip_sarjana"),
        _int_or(F.regexp_extract("text", _RE_SKS_TEMPUH_LULUS, 1), 0).alias("sks_tempuh"),
        _int_or(F.regexp_extract("text", _RE_SKS_TEMPUH_LULUS, 2), 0).alias("sks_lulus"),
        _int_or(F.regexp_extract("text", _RE_SKS_PERSIAPAN, 1), 0).alias("sks_persiapan"),
        _int_or(F.regexp_extract("text", _RE_SKS_SARJANA, 1), 0).alias("sks_sarjana"),
    )


def extract_courses(docs: DataFrame) -> DataFrame:
    """Course rows per document: T6 repeating-group extract + T7 stage
    tag + T8 semester decode, one row per (doc, course entry).

    T6 (ETL_FINAL.py:189-190) is the reference's only unnest-shaped
    operator: ``re.findall`` over the document. Here each capture group
    is pulled with ``regexp_extract_all`` (arrays align because they
    come from the same pattern), zipped and exploded.

    T7 (ETL_FINAL.py:193) assigns stage by position relative to the
    'Tahap: Sarjana' section header. The reference keys on the FIRST
    occurrence of the course code in the whole document, which mis-tags
    retakes listed in both sections (SURVEY.md §2.2 T7); we split the
    document at the marker and tag each half — same result for every
    non-pathological document, correct for retakes. Divergence is
    deliberate and documented.
    """
    # Split into (stage, section-text) rows BEFORE the repeating-group
    # extract, so the positional rule becomes a plain per-row tag.
    sections = docs.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit("Persiapan").alias("tahap"),
                    F.substring_index("text", _STAGE_MARKER, 1).alias("section"),
                ),
                F.struct(
                    F.lit("Sarjana").alias("tahap"),
                    F.when(
                        F.col("text").contains(_STAGE_MARKER),
                        F.expr(
                            f"substring(text, instr(text, '{_STAGE_MARKER}')"
                            f" + {len(_STAGE_MARKER)})"
                        ),
                    ).otherwise(F.lit("")).alias("section"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.tahap").alias("tahap"), F.col("s.section").alias("section"))

    # ONE heavy regex pass per section (group 0 = the whole match), then
    # the six capture groups are re-extracted from the ~40-char match
    # strings — six regexp_extract_all passes over multi-KB documents
    # collapse to one (the groups re-match identically on the match's
    # own span: every candidate split the engine rejects in full text
    # it also rejects on the truncated match, since the failing tail
    # atoms — \s+, [A-Z]{1,2} — fail at end-of-string too; pinned by
    # the transcript golden tests).
    matches = sections.select(
        "doc_id",
        "tahap",
        F.explode(
            F.regexp_extract_all("section", F.lit(_RE_COURSE), F.lit(0))
        ).alias("m"),
    )
    return matches.select(
        "doc_id",
        F.regexp_extract("m", _RE_COURSE, 1).alias("kode_mk"),
        F.regexp_extract("m", _RE_COURSE, 2).alias("nama_mk"),
        F.regexp_extract("m", _RE_COURSE, 3).cast("int").alias("sks"),  # T11 casts (ETL_FINAL.py:195,203)
        F.regexp_extract("m", _RE_COURSE, 4).cast("int").alias("tahun"),
        # T8 (ETL_FINAL.py:194): Gs -> Gasal, anything else -> Genap.
        F.when(F.regexp_extract("m", _RE_COURSE, 5) == "Gs", "Gasal")
        .otherwise("Genap")
        .alias("semester"),
        F.regexp_extract("m", _RE_COURSE, 6).alias("nilai"),
        "tahap",
    )
