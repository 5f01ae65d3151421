"""From-scratch Avro codec (sources/avro.py): known-answer byte
vectors for the binary primitives (Avro 1.11 spec examples) plus
container round-trips over nested schemas — the metadata plane the
Iceberg reader stands on."""

from __future__ import annotations

import io

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fp_data_lakehouse_spark.sources.avro import (
    _decode,
    _read_long,
    _write_long,
    read_avro_file,
    write_avro_file,
)


def _zz(v: int) -> bytes:
    out = bytearray()
    _write_long(out, v)
    return bytes(out)


def test_zigzag_known_answers():
    # the spec's own table
    assert _zz(0) == b"\x00"
    assert _zz(-1) == b"\x01"
    assert _zz(1) == b"\x02"
    assert _zz(-2) == b"\x03"
    assert _zz(2) == b"\x04"
    assert _zz(-64) == b"\x7f"
    assert _zz(64) == b"\x80\x01"
    for v in (0, -1, 1, 63, -64, 64, 2**40, -(2**40), 2**62, -(2**62)):
        assert _read_long(io.BytesIO(_zz(v))) == v


def test_primitive_known_answers():
    # string "foo": length 3 (zigzag 0x06) + bytes
    buf = io.BytesIO(b"\x06foo")
    assert _decode("string", buf, {}) == "foo"
    # union ["null","long"] carrying 5 -> index 1 (0x02) + zigzag 10
    buf = io.BytesIO(b"\x02\x0a")
    assert _decode(["null", "long"], buf, {}) == 5
    # double 1.0 little-endian IEEE
    buf = io.BytesIO(b"\x00\x00\x00\x00\x00\x00\xf0\x3f")
    assert _decode("double", buf, {}) == 1.0


_SCHEMA = {
    "type": "record",
    "name": "r1",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "map", "values": "long"}},
        {"name": "xs", "type": {"type": "array", "items": "double"}},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "b", "type": "boolean"},
                    {"name": "raw", "type": "bytes"},
                ],
            },
        },
        {"name": "status", "type": {"type": "enum", "name": "e1",
                                    "symbols": ["OK", "BAD"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "f1", "size": 4}},
    ],
}


def _rows(n):
    return [
        {
            "id": i * 1000 - 5,
            "name": None if i % 3 == 0 else f"row-{i}",
            "tags": {f"k{i}": i, "z": -i},
            "xs": [i * 0.5, -1.25],
            "nested": {"b": i % 2 == 0, "raw": bytes([i % 256, 255])},
            "status": "OK" if i % 2 else "BAD",
            "fx": bytes([i % 256] * 4),
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(codec):
    rows = _rows(57)
    blob = write_avro_file(_SCHEMA, rows, codec=codec)
    schema, back = read_avro_file(blob)
    assert schema == _SCHEMA
    assert back == rows


def test_container_detects_corruption():
    blob = bytearray(write_avro_file(_SCHEMA, _rows(3), codec="null"))
    blob[-3] ^= 0xFF  # damage the trailing sync
    with pytest.raises(ValueError, match="sync"):
        read_avro_file(bytes(blob))
    with pytest.raises(ValueError, match="magic"):
        read_avro_file(b"PAR1" + bytes(blob))


def test_named_type_reference_and_negative_block():
    # a record referencing an earlier named fixed by NAME, and an
    # array block written with the negative-count + byte-size form
    schema = {
        "type": "record",
        "name": "outer",
        "fields": [
            {"name": "a", "type": {"type": "fixed", "name": "u16", "size": 2}},
            {"name": "b", "type": "u16"},
            {"name": "xs", "type": {"type": "array", "items": "long"}},
        ],
    }
    from fp_data_lakehouse_spark.sources.avro import _encode, _preregister

    names: dict = {}
    _preregister(schema, names)
    out = bytearray()
    _encode(schema["fields"][0]["type"], b"\x01\x02", out, names)
    _encode("u16", b"\x03\x04", out, names)
    # hand-write xs = [7, 8] as a NEGATIVE block: count -2, byte size 2
    _write_long(out, -2)
    _write_long(out, 2)
    _write_long(out, 7)
    _write_long(out, 8)
    _write_long(out, 0)  # terminator
    got = _decode(schema, io.BytesIO(bytes(out)), dict(names))
    assert got == {"a": b"\x01\x02", "b": b"\x03\x04", "xs": [7, 8]}


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.one_of(st.none(), st.text(max_size=20)),
        ),
        max_size=40,
    )
)
def test_roundtrip_property(pairs):
    schema = {
        "type": "record",
        "name": "p",
        "fields": [
            {"name": "v", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
        ],
    }
    rows = [{"v": v, "s": s} for v, s in pairs]
    _, back = read_avro_file(write_avro_file(schema, rows))
    assert back == rows
