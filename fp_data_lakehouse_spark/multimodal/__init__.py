from .binaryops import (
    MEDIA_SCHEMA,
    decode_and_featurize,
    extract_media_metadata,
    fake_decode_features,
)

__all__ = [
    "MEDIA_SCHEMA",
    "extract_media_metadata",
    "decode_and_featurize",
    "fake_decode_features",
]
