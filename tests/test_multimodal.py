"""Multimodal binary-column plumbing: metadata sniffing stays JVM-side,
the Arrow-batched decode path has real schema/batch behavior, and the
real-codec binding point fails loudly, not silently."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fp_data_lakehouse_spark.multimodal import (
    MEDIA_SCHEMA,
    decode_and_featurize,
    extract_media_metadata,
    fake_decode_features,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "image", "image/jpeg", b"\xff\xd8\xff\xe0" + b"x" * 100, {"w": "640"}),
        (2, "image", "image/png", b"\x89PNG\r\n" + b"y" * 50, {"w": "32"}),
        (3, "audio", "audio/wav", b"RIFF" + b"z" * 200, {"hz": "16000"}),
        (4, "image", "image/png", b"\xff\xd8\xff\xe0garbled", {}),  # mime lies
        (5, "video", "video/mp4", None, {}),  # null payload
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_metadata_sniffing(media_df):
    meta = {r.media_id: r for r in extract_media_metadata(media_df).collect()}
    assert meta[1].sniffed_mime == "image/jpeg" and meta[1].mime_mismatch is False
    assert meta[2].sniffed_mime == "image/png"
    assert meta[3].sniffed_mime == "audio/wav"
    assert meta[4].mime_mismatch is True  # declared png, sniffed jpeg
    assert meta[5].n_bytes is None


def test_fake_decode_pipeline(media_df):
    out = decode_and_featurize(media_df, codec="fake")
    assert [f.name for f in out.schema.fields] == ["media_id", "kind", "n_bytes", "features"]
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 5
    assert rows[5].features is None  # null payload propagates
    assert len(rows[1].features) == 8
    assert all(0.0 <= v < 1.0 for v in rows[1].features)
    # deterministic: same bytes -> same features, process-independent
    assert rows[1].features == fake_decode_features(b"\xff\xd8\xff\xe0" + b"x" * 100)


def test_real_codec_binding_fails_loudly(media_df):
    with pytest.raises(Exception) as exc_info:
        decode_and_featurize(media_df, codec="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_unknown_codec_rejected(media_df):
    with pytest.raises(ValueError):
        decode_and_featurize(media_df, codec="mystery")
