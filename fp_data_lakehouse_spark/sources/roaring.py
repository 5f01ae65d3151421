"""RoaringBitmapArray + Z85 codecs for Delta Lake deletion vectors —
pure-Python, spec-derived, no external bitmap library.

Everything here is implemented from PUBLIC format documents:

- Delta PROTOCOL.md "Deletion Vectors" — descriptor fields, the on-disk
  DV file layout (1 version byte, then per-DV ``[u32 BE size][data]
  [u32 BE CRC-32 of data]`` at the descriptor's ``offset``), inline DVs
  and UUID path encoding via **Z85** (the ZeroMQ base-85 alphabet), and
  the bitmap payload: a 64-bit **RoaringBitmapArray** in its "portable"
  serialization — ``u32 LE magic 1681511377`` followed by the standard
  64-bit roaring portable format.
- RoaringFormatSpec (github.com/RoaringBitmap/RoaringFormatSpec) — the
  32-bit portable container format (cookies 12346/12347, array/bitmap/
  run containers) and the 64-bit extension (``u64 LE bucket count``,
  then per bucket ``u32 LE high-32 key`` + a 32-bit bitmap).
- Z85: ZeroMQ RFC 32/Z85 (85-char alphabet, 4 bytes -> 5 chars,
  big-endian base conversion). Known-answer vector (8 bytes
  ``86 4F D2 6F B5 59 F7 5B`` -> ``"HelloWorld"``) is asserted in
  tests/test_roaring.py.

The SERIALIZER exists for the writer side (delta export / test-fixture
synthesis): it emits array or bitmap containers with the no-run cookie
(always spec-legal; run containers are an optional encoding). The
PARSER accepts all three container kinds, so DV files produced by real
Delta writers (which do emit run containers) decode correctly.

Reference parity note: the reference system (kevin-079/FP-Data-Lakehouse)
has no table format at all — this module exists for the commissioned
Delta-interop extension (sources/delta.py), not for any reference
behavior.
"""

from __future__ import annotations

import struct
import zlib

# --- Z85 (ZeroMQ base-85) ---------------------------------------------------

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    """Z85-encode ``data`` (length must be a multiple of 4): each
    big-endian 4-byte word becomes 5 alphabet chars, most significant
    digit first."""
    if len(data) % 4:
        raise ValueError(f"Z85 input length must be a multiple of 4, got {len(data)}")
    out = []
    for i in range(0, len(data), 4):
        word = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            word, rem = divmod(word, 85)
            chunk.append(_Z85_ALPHABET[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    """Inverse of :func:`z85_encode` (length must be a multiple of 5)."""
    if len(text) % 5:
        raise ValueError(f"Z85 input length must be a multiple of 5, got {len(text)}")
    out = bytearray()
    for i in range(0, len(text), 5):
        word = 0
        for c in text[i : i + 5]:
            if c not in _Z85_INDEX:
                raise ValueError(f"invalid Z85 character {c!r}")
            word = word * 85 + _Z85_INDEX[c]
        if word > 0xFFFFFFFF:
            raise ValueError(f"Z85 group {text[i:i+5]!r} overflows 32 bits")
        out += word.to_bytes(4, "big")
    return bytes(out)


# --- 32-bit RoaringBitmap (portable) -----------------------------------------

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096  # cardinality above which a container serializes as bitmap


def _serialize_bitmap32(values) -> bytes:
    """Serialize sorted distinct uint32 values (list or numpy array) as
    a portable 32-bit roaring bitmap (no-run cookie; array or bitmap
    containers only — always legal, run encoding is an optional
    optimization). Vectorized: container split, array payloads
    (``<u2`` tobytes) and bitmap payloads (``packbits``) are numpy
    ops — the per-value Python loop cost 10+ s on a 10M-row DV."""
    import numpy as np

    vals = np.asarray(values, dtype=np.uint32)
    keys = (vals >> np.uint32(16)).astype(np.uint32)
    lows = (vals & np.uint32(0xFFFF)).astype(np.uint16)
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]]) if len(vals) else np.array([], dtype=np.int64)
    bounds = np.r_[starts, len(vals)]
    containers = [
        (int(keys[bounds[i]]), lows[bounds[i]:bounds[i + 1]])
        for i in range(len(starts))
    ]

    out = bytearray()
    out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(containers))
    for key, clows in containers:
        out += struct.pack("<HH", key, len(clows) - 1)
    # offset header (mandatory with the no-run cookie): byte position
    # of each container from the START of this bitmap's serialization
    header_len = 8 + 4 * len(containers) + 4 * len(containers)
    pos = header_len
    blobs: list[bytes] = []
    for _key, clows in containers:
        if len(clows) <= _ARRAY_MAX:
            blob = clows.astype("<u2").tobytes()
        else:
            bits = np.zeros(65536, dtype=bool)
            bits[clows] = True
            blob = np.packbits(bits, bitorder="little").tobytes()
        out += struct.pack("<I", pos)
        blobs.append(blob)
        pos += len(blob)
    for blob in blobs:
        out += blob
    return bytes(out)


def _deserialize_bitmap32(buf: bytes, start: int) -> tuple[list[int], int]:
    """Parse one portable 32-bit roaring bitmap at ``buf[start:]``;
    returns (values, bytes consumed). Accepts array, bitmap AND run
    containers (real writers emit runs)."""
    (cookie,) = struct.unpack_from("<I", buf, start)
    pos = start + 4
    run_flags = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        nbytes = (n + 7) // 8
        run_flags = buf[pos : pos + nbytes]
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        has_offsets = True
    else:
        raise ValueError(f"not a portable roaring bitmap (cookie {cookie})")

    keys_cards = []
    for i in range(n):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys_cards.append((key, card_m1 + 1))
    if has_offsets:
        pos += 4 * n  # offsets are redundant for sequential parsing

    def _is_run(i: int) -> bool:
        return bool(run_flags) and bool(run_flags[i >> 3] & (1 << (i & 7)))

    import numpy as np

    chunks: list = []
    for i, (key, card) in enumerate(keys_cards):
        base = key << 16
        if _is_run(i):
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                # a run (start, len) covers start..start+len INCLUSIVE
                # (len = cardinality - 1, per the RoaringFormatSpec)
                lo, run_len = struct.unpack_from("<HH", buf, pos)
                pos += 4
                chunks.append(np.arange(base + lo, base + lo + run_len + 1,
                                        dtype=np.int64))
        elif card > _ARRAY_MAX:
            bits = np.frombuffer(buf, dtype=np.uint8, count=8192, offset=pos)
            pos += 8192
            chunks.append(
                np.flatnonzero(np.unpackbits(bits, bitorder="little")) + base
            )
        else:
            lows = np.frombuffer(buf, dtype="<u2", count=card, offset=pos)
            pos += 2 * card
            chunks.append(lows.astype(np.int64) + base)
    if not chunks:
        return np.array([], dtype=np.int64), pos - start
    return np.concatenate(chunks), pos - start


# --- 64-bit RoaringBitmapArray (Delta's DV payload) ---------------------------

MAGIC = 1681511377  # u32 LE prefix mandated by Delta PROTOCOL.md


def serialize_rbm_array(positions) -> bytes:
    """Serialize row positions (uint64, sorted-or-not, duplicates
    allowed; list, tuple or numpy array) as Delta's portable
    RoaringBitmapArray: magic, u64 LE bucket count, then per bucket
    ``u32 LE high-32 key`` + a 32-bit portable bitmap of the low-32
    values. Vectorized — dedup/sort/bucket-split are numpy ops (the
    per-value Python loop cost 10+ s on a 10M-row DV); positions
    above int64 range (spec-legal, never real row indexes) take a
    scalar fallback."""
    import numpy as np

    a = None
    if not (
        isinstance(positions, np.ndarray)
        and positions.dtype.kind == "u"
        and positions.size
        and int(positions.max()) > 0x7FFFFFFFFFFFFFFF
    ):
        # an unsigned ndarray with values above int64 range would WRAP
        # silently under np.asarray(..., int64) (unsafe cast, no
        # OverflowError unlike Python ints) — route it to the scalar
        # fallback instead of spuriously rejecting it (ADVICE r12)
        try:
            a = np.asarray(positions, dtype=np.int64)
        except (OverflowError, TypeError, ValueError):
            a = None
    if a is None:  # > 2^63-1 positions: exact scalar path
        buckets: dict[int, list[int]] = {}
        for p in sorted(set(int(x) for x in positions)):
            if p < 0 or p > 0xFFFFFFFFFFFFFFFF:
                raise ValueError(f"position {p} out of uint64 range")
            buckets.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
        items = [
            (key, np.asarray(buckets[key], dtype=np.uint32))
            for key in sorted(buckets)
        ]
    else:
        if a.size and int(a.min()) < 0:
            raise ValueError(f"position {int(a.min())} out of uint64 range")
        a = np.unique(a)
        high = (a >> np.int64(32)).astype(np.uint32)
        starts = (
            np.flatnonzero(np.r_[True, high[1:] != high[:-1]])
            if a.size
            else np.array([], dtype=np.int64)
        )
        bounds = np.r_[starts, a.size]
        items = [
            (
                int(high[bounds[i]]),
                (a[bounds[i]:bounds[i + 1]] & np.int64(0xFFFFFFFF)).astype(
                    np.uint32
                ),
            )
            for i in range(len(starts))
        ]
    out = bytearray()
    out += struct.pack("<I", MAGIC)
    out += struct.pack("<Q", len(items))
    for key, lows in items:
        out += struct.pack("<I", key)
        out += _serialize_bitmap32(lows)
    return bytes(out)


def deserialize_rbm_array(data: bytes) -> list[int]:
    """Inverse of :func:`serialize_rbm_array`; returns sorted positions."""
    import numpy as np

    if len(data) < 12:
        raise ValueError(f"DV bitmap too short ({len(data)} bytes)")
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic} (want {MAGIC})")
    (n_buckets,) = struct.unpack_from("<Q", data, 4)
    pos = 12
    chunks: list = []
    huge: list[int] = []  # buckets whose base exceeds int64 (spec-legal)
    for _ in range(n_buckets):
        (key,) = struct.unpack_from("<I", data, pos)
        pos += 4
        lows, used = _deserialize_bitmap32(data, pos)
        pos += used
        if key < (1 << 31):
            chunks.append(lows + (np.int64(key) << np.int64(32)))
        else:
            base = key << 32
            huge.extend(base + int(lo) for lo in lows)
    out = np.concatenate(chunks).tolist() if chunks else []
    return out + huge


# --- DV file framing ----------------------------------------------------------


def pack_dv_blob(positions: list[int]) -> bytes:
    """One DV entry as stored in a ``.bin`` file: ``[u32 BE size]
    [bitmap data][u32 BE CRC-32 of data]`` (the descriptor's ``offset``
    points at the size word; ``sizeInBytes`` is the data length)."""
    data = serialize_rbm_array(positions)
    return struct.pack(">I", len(data)) + data + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)


def positions_from_dv_blob(blob: bytes, offset: int, size_in_bytes: int) -> list[int]:
    """Decode the DV entry at ``offset`` in a DV file's bytes,
    validating the size prefix and CRC-32 trailer."""
    (stored_size,) = struct.unpack_from(">I", blob, offset)
    if stored_size != size_in_bytes:
        raise ValueError(
            f"DV size mismatch at offset {offset}: file says {stored_size}, "
            f"descriptor says {size_in_bytes}"
        )
    data = bytes(blob[offset + 4 : offset + 4 + size_in_bytes])
    if len(data) != size_in_bytes:
        raise ValueError(f"DV file truncated at offset {offset}")
    (crc,) = struct.unpack_from(">I", blob, offset + 4 + size_in_bytes)
    actual = zlib.crc32(data) & 0xFFFFFFFF
    if crc != actual:
        raise ValueError(f"DV checksum mismatch at offset {offset}")
    return deserialize_rbm_array(data)


def new_dv_file_from_blobs(datas: list[bytes]) -> tuple[bytes, list[tuple[int, int]]]:
    """Assemble a whole DV ``.bin`` file from ALREADY-SERIALIZED
    RoaringBitmapArray payloads (version byte 1, then each payload
    framed ``[u32 BE size][data][u32 BE CRC-32]``); returns (file
    bytes, [(offset, sizeInBytes)] per entry) for descriptor
    construction. This is the driver-side half of the distributed
    export path: executors serialize each file's bitmap, the driver
    only concatenates compressed bytes."""
    out = bytearray(b"\x01")
    spans: list[tuple[int, int]] = []
    for data in datas:
        spans.append((len(out), len(data)))
        out += struct.pack(">I", len(data))
        out += data
        out += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    return bytes(out), spans


def new_dv_file(entries: list[list[int]]) -> tuple[bytes, list[tuple[int, int]]]:
    """Assemble a whole DV ``.bin`` file (version byte 1, then each
    entry's framed blob); returns (file bytes, [(offset, sizeInBytes)]
    per entry) for descriptor construction."""
    return new_dv_file_from_blobs([serialize_rbm_array(p) for p in entries])
