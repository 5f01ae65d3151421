"""Registry surface for the multimodal plumbing.

The driver fixtures ship no media table, so mm01 derives a
deterministic binary column from the documents fixture (UTF-8 bytes of
the text) and runs the REAL metadata pass over it — binary length,
magic-byte sniff, hex head — oracle-checked byte-for-byte. mm02 runs
the Arrow decode/featurize pipeline (deterministic fake codec) over
the same payloads; its md5-derived features have no reasonable SQL
twin, so it registers rows-only and pytest pins determinism
(tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.registry import register
from ..sources.catalog import load_table
from .binaryops import decode_and_featurize, extract_media_metadata


def _as_media(docs: DataFrame) -> DataFrame:
    """documents -> the MEDIA_SCHEMA shape with text bytes as payload."""
    return docs.select(
        F.col("doc_id").cast("string").alias("media_ref"),
        F.abs(F.hash("doc_id")).cast("long").alias("media_id"),
        F.lit("text").alias("kind"),
        F.lit("text/plain").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


@register(
    "mm01_media_metadata",
    oracle="""
    SELECT doc_id AS media_ref,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           upper(substring(hex(encode(text)), 1, 8)) AS head_hex,
           CAST(octet_length(encode(text)) AS BIGINT)
             - CAST(length(text) AS BIGINT) AS multibyte_overhead
    FROM documents
    """,
)
def mm01_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side binary metadata pass over opaque payloads: byte length
    (vs character length — the multibyte overhead column proves the
    binary path, not a string path), and the 4-byte magic head as hex —
    exactly what extract_media_metadata sniffs mime types from."""
    docs = load_table(spark, sf_dir, "documents")
    media = _as_media(docs)
    return media.select(
        "media_ref",
        F.length("payload").cast("long").alias("n_bytes"),
        F.upper(F.hex(F.substring("payload", 1, 4))).alias("head_hex"),
        (
            F.length("payload").cast("long")
            - F.length(F.decode("payload", "UTF-8")).cast("long")
        ).alias("multibyte_overhead"),
    )


@register("mm02_media_features")
def mm02_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Arrow decode/featurize pipeline over binary payloads
    (mapInPandas, deterministic fake codec): schema, batch shape and
    null handling are the real thing — only the codec body is the
    documented stand-in. Rows-only driver check; determinism and
    feature range pinned in pytest."""
    docs = load_table(spark, sf_dir, "documents")
    media = _as_media(docs).select("media_id", "kind", "payload", "mime", "meta")
    return decode_and_featurize(media, codec="fake")
