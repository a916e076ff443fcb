"""RoaringBitmap portable formats (operators/roaring.py): 32-bit container
round-trips, hand-crafted run-container decode, 64-bit bucket layout, and
truncation/validation errors."""

from __future__ import annotations

import struct

import pytest

from native_sql_engine_spark.operators.roaring import (
    deserialize_roaring32,
    deserialize_roaring64,
    serialize_roaring32,
    serialize_roaring64,
)


def test_array_and_bitset_roundtrip():
    vals = sorted(set(range(0, 100, 3)) | set(range(70000, 76000)) | {0xFFFFFFFF})
    b = serialize_roaring32(vals)
    out, end = deserialize_roaring32(b)
    assert out == vals and end == len(b)


def test_empty():
    b = serialize_roaring32([])
    assert deserialize_roaring32(b) == ([], len(b))
    b64 = serialize_roaring64([])
    assert deserialize_roaring64(b64) == ([], len(b64))


def test_run_container_decode():
    # hand-crafted: run cookie (12347, count-1=0), run bitset 0b1, header
    # (key=0, card-1=3), <4 containers so NO offset header, then the run
    # container: 1 run of start=5, length-1=3 -> {5,6,7,8}
    buf = struct.pack("<I", 12347) + b"\x01" + struct.pack("<HH", 0, 3)
    buf += struct.pack("<H", 1) + struct.pack("<HH", 5, 3)
    out, end = deserialize_roaring32(buf)
    assert out == [5, 6, 7, 8] and end == len(buf)


def test_roaring64_buckets():
    vals = [1, 2, (1 << 32) + 7, (5 << 32) + 0xFFFF, (5 << 32) + 0x10000]
    b = serialize_roaring64(vals)
    out, end = deserialize_roaring64(b)
    assert out == sorted(vals) and end == len(b)


def test_errors():
    b = serialize_roaring32([1, 2, 3])
    with pytest.raises(ValueError, match="truncated"):
        deserialize_roaring32(b[:-2])
    with pytest.raises(ValueError, match="bad cookie"):
        deserialize_roaring32(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="uint32"):
        serialize_roaring32([-1])
    # decreasing bucket keys rejected
    bad = struct.pack("<q", 2)
    bm = serialize_roaring32([1])
    bad += struct.pack("<I", 5) + bm + struct.pack("<I", 5) + bm
    with pytest.raises(ValueError, match="not increasing"):
        deserialize_roaring64(bad)
