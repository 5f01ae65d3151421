"""Z85 + RoaringBitmapArray codecs (sources/roaring.py): known-answer
vectors pinned from the PUBLIC specs (ZeroMQ Z85 RFC, RoaringFormatSpec,
Delta PROTOCOL.md DV framing), plus round-trip properties across all
container regimes — since the container ships no Delta JAR or roaring
library, byte-level spec fidelity is what these vectors certify."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fp_data_lakehouse_spark.sources.roaring import (
    MAGIC,
    deserialize_rbm_array,
    new_dv_file,
    pack_dv_blob,
    positions_from_dv_blob,
    serialize_rbm_array,
    z85_decode,
    z85_encode,
)


def test_z85_known_answer():
    # the ZeroMQ RFC's canonical test vector
    data = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(data) == "HelloWorld"
    assert z85_decode("HelloWorld") == data
    # a UUID (16 bytes) encodes to exactly 20 chars — the length the
    # Delta descriptor's storageType='u' path derivation relies on
    import uuid

    u = uuid.UUID("01234567-89ab-cdef-0123-456789abcdef")
    enc = z85_encode(u.bytes)
    assert len(enc) == 20
    assert z85_decode(enc) == u.bytes


def test_z85_rejects_bad_input():
    with pytest.raises(ValueError, match="multiple of 4"):
        z85_encode(b"abc")
    with pytest.raises(ValueError, match="multiple of 5"):
        z85_decode("abcd")
    with pytest.raises(ValueError, match="invalid Z85"):
        z85_decode('"""""')


def test_rbm_array_known_bytes():
    """Hand-computed serialization of {0, 9} per the RoaringFormatSpec:
    magic, one bucket (key 0), no-run cookie 12346, 1 container,
    key 0 / card-1 = 1, offset 16, array values [0, 9]."""
    got = serialize_rbm_array([9, 0])
    want = (
        struct.pack("<I", MAGIC)
        + struct.pack("<Q", 1)  # one 2^32 bucket
        + struct.pack("<I", 0)  # bucket key (high 32 bits)
        + struct.pack("<II", 12346, 1)  # no-run cookie, 1 container
        + struct.pack("<HH", 0, 1)  # container key, cardinality-1
        + struct.pack("<I", 16)  # container offset from bitmap start
        + struct.pack("<HH", 0, 9)  # array container values
    )
    assert got == want
    assert deserialize_rbm_array(got) == [0, 9]


def test_rbm_array_bitmap_container_and_high_buckets():
    # > 4096 values in one 2^16 container forces the bitmap encoding;
    # a value above 2^32 forces a second bucket
    dense = list(range(5000))
    high = [(1 << 32) + 7, (1 << 32) + 65536]
    vals = dense + high
    blob = serialize_rbm_array(vals)
    assert deserialize_rbm_array(blob) == sorted(vals)


def test_rbm_array_parses_run_containers():
    """The parser must accept RUN containers (real Delta writers emit
    them; our serializer legitimately never does). Bytes synthesized
    per the spec: cookie 12347 with run bitset, no offset header below
    the 4-container threshold."""
    n = 1
    cookie = ((n - 1) << 16) | 12347
    bitmap32 = (
        struct.pack("<I", cookie)
        + bytes([0b1])  # container 0 is a run
        + struct.pack("<HH", 0, 4)  # key 0, cardinality-1 = 4
        # no offset header: n=1 < 4 threshold with the run cookie
        + struct.pack("<H", 2)  # two runs
        + struct.pack("<HH", 10, 2)  # 10,11,12
        + struct.pack("<HH", 100, 1)  # 100,101
    )
    blob = struct.pack("<I", MAGIC) + struct.pack("<Q", 1) + struct.pack("<I", 0) + bitmap32
    assert deserialize_rbm_array(blob) == [10, 11, 12, 100, 101]


def test_rbm_array_rejects_garbage():
    with pytest.raises(ValueError, match="magic"):
        deserialize_rbm_array(b"\x00" * 16)
    with pytest.raises(ValueError, match="too short"):
        deserialize_rbm_array(b"\x00")


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 33)), min_size=0, max_size=300
    )
)
def test_rbm_array_roundtrip(vals):
    assert deserialize_rbm_array(serialize_rbm_array(vals)) == sorted(set(vals))


def test_rbm_array_uint64_ndarray_above_int63():
    """A numpy uint64 ndarray with positions >= 2^63 must round-trip
    via the scalar fallback exactly like the same values as a Python
    list — np.asarray(..., int64) would wrap it negative silently
    (unsafe cast, no OverflowError) and spuriously reject (ADVICE
    r12)."""
    import numpy as np

    vals = [2**63 + 5, 2**64 - 1, 7]
    as_list = serialize_rbm_array(vals)
    as_np = serialize_rbm_array(np.array(vals, dtype=np.uint64))
    assert as_np == as_list
    assert deserialize_rbm_array(as_np) == sorted(vals)
    # an unsigned array WITHIN int64 range still takes the fast path
    small = np.array([1, 2, 3], dtype=np.uint64)
    assert deserialize_rbm_array(serialize_rbm_array(small)) == [1, 2, 3]


def test_dv_blob_framing_and_crc():
    positions = [3, 5, 8, 1 << 20]
    blob = pack_dv_blob(positions)
    data_len = len(blob) - 8
    assert struct.unpack(">I", blob[:4])[0] == data_len
    assert (
        struct.unpack(">I", blob[-4:])[0]
        == zlib.crc32(blob[4:-4]) & 0xFFFFFFFF
    )
    assert positions_from_dv_blob(blob, 0, data_len) == positions
    # corruption fails loudly
    bad = bytearray(blob)
    bad[6] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        positions_from_dv_blob(bytes(bad), 0, data_len)
    with pytest.raises(ValueError, match="size mismatch"):
        positions_from_dv_blob(blob, 0, data_len + 1)


def test_dv_file_layout():
    """Whole-file assembly: version byte 1 first, then each framed
    entry at its recorded offset — the descriptor's (offset,
    sizeInBytes) pairs must decode independently."""
    entries = [[0, 2, 4], [7], list(range(1000, 1100))]
    blob, spans = new_dv_file(entries)
    assert blob[0:1] == b"\x01"
    assert spans[0][0] == 1  # first entry right after the version byte
    for positions, (off, size) in zip(entries, spans):
        assert positions_from_dv_blob(blob, off, size) == sorted(positions)
