"""Multimodal (image/audio/video) column plumbing.

Media lives as opaque ``binary`` columns with typed metadata; compute
that needs a codec (decode, resize, frame-sample, feature-extract) runs
as Arrow-batched ``mapInPandas`` — the one place Python belongs in the
hot path, amortized over columnar batches rather than rows.

The container has no image/audio libraries, so the codec itself is
stubbed two ways (per the build contract):
- ``decode_and_featurize(..., codec="real")`` raises NotImplementedError
  at the exact point a real decoder (PIL/torchaudio/ffmpeg) would bind;
- ``codec="fake"`` is a deterministic stand-in (md5-derived features)
  that keeps every Spark-side property real and testable: schema,
  Arrow batch shape, partition behavior, null handling.

Scale notes: mapInPandas streams batches (no per-row Python calls, no
collect); metadata extraction stays in JVM expressions; repartition
before decode so batches are even when upstream files are skewed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

_N_FEATURES = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """JVM-side metadata pass: size, magic-byte sniff, declared-vs-sniffed
    mismatch flag. No Python, no decode — this is the cheap filter stage
    that should drop junk before any codec runs."""
    magic = F.hex(F.substring("payload", 1, 4))
    sniffed = (
        F.when(magic.startswith("FFD8"), "image/jpeg")
        .when(magic.startswith("89504E47"), "image/png")
        .when(magic.startswith("52494646"), "audio/wav")
        .otherwise("unknown")
    )
    return media.select(
        "media_id",
        "kind",
        "mime",
        F.length("payload").cast("long").alias("n_bytes"),
        sniffed.alias("sniffed_mime"),
        (F.col("mime") != sniffed).alias("mime_mismatch"),
        "meta",
    )


def fake_decode_features(payload: bytes | None) -> list[float] | None:
    """Deterministic stand-in for a codec: 8 features derived from the
    md5 of the payload, scaled to [0, 1). Stable across processes."""
    if payload is None:
        return None
    digest = hashlib.md5(payload).digest()
    return [b / 256.0 for b in digest[:_N_FEATURES]]


def decode_and_featurize(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Arrow-batched decode + feature extraction over the binary column.

    ``codec="real"`` marks the integration point for an actual decoder
    and raises NotImplementedError (the container ships no media libs);
    ``codec="fake"`` exercises the identical mapInPandas pipeline with
    the deterministic stand-in.
    """
    if codec not in ("fake", "real"):
        raise ValueError(f"unknown codec: {codec!r}")

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "real":
                # Real binding point: PIL.Image.open / torchaudio.load /
                # ffmpeg frame sampling over pdf["payload"].
                raise NotImplementedError(
                    "no media codec available in this environment; "
                    "use codec='fake' for the deterministic stand-in"
                )
            feats = pdf["payload"].map(fake_decode_features)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else None
                    ),
                    "features": feats,
                }
            )

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)
