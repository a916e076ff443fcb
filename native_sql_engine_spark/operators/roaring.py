"""RoaringBitmap (de)serialization — the row-index set format behind Delta
Lake deletion vectors.

Two layers, both from scratch over the PUBLIC specs:

- **32-bit portable format** (github.com/RoaringBitmap/RoaringFormatSpec):
  cookie (``12346`` = no run containers + container count, or ``12347`` =
  run containers present, count-1 in the high 16 bits + run bitset),
  descriptive header of ``(key uint16, cardinality-1 uint16)`` pairs, an
  optional offset header, then the containers in key order — ARRAY
  (sorted uint16 values), BITSET (8 KiB, little-endian words) and RUN
  (``(start, length-1)`` uint16 pairs) are all decoded; the writer emits
  ARRAY/BITSET with the no-run cookie (always spec-valid).
- **64-bit RoaringBitmapArray "portable" format** (Delta PROTOCOL.md —
  Deletion Vector Format): ``int64 LE`` bucket count, then per bucket in
  increasing key order a ``uint32 LE`` high-32-bit key followed by one
  32-bit portable bitmap of the low 32 bits.

Container boundaries are validated (truncated streams raise positioned
``ValueError``), and decode walks containers sequentially in key order so
the optional offset header never needs trusting.

Used by operators/delta.py (deletion vectors) — and applicable to any
row-level-delete format that standardized on Roaring (Iceberg v3 puffin
DVs use the same 64-bit layout).
"""

from __future__ import annotations

import struct

__all__ = [
    "serialize_roaring32",
    "deserialize_roaring32",
    "serialize_roaring64",
    "deserialize_roaring64",
]

_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4  # containers; below this, run-cookie streams omit offsets
_ARRAY_MAX = 4096  # cardinality above which a container must be a bitset


def serialize_roaring32(values) -> bytes:
    """Serialize sorted-deduped uint32 ``values`` in the portable format
    (no-run cookie: ARRAY containers up to 4096 entries, BITSET above)."""
    vals = sorted(set(values))
    if vals and (vals[0] < 0 or vals[-1] > 0xFFFFFFFF):
        raise ValueError("roaring32 values must be uint32")
    buckets: dict[int, list[int]] = {}
    for v in vals:
        buckets.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(buckets)
    n = len(keys)
    out = bytearray(struct.pack("<iI", _COOKIE_NO_RUN, n))
    for k in keys:
        out += struct.pack("<HH", k, len(buckets[k]) - 1)
    # offset header is mandatory with the no-run cookie
    off = len(out) + 4 * n
    offsets = []
    for k in keys:
        offsets.append(off)
        card = len(buckets[k])
        off += 2 * card if card <= _ARRAY_MAX else 8192
    out += struct.pack(f"<{n}I", *offsets) if n else b""
    for k in keys:
        vs = buckets[k]
        if len(vs) <= _ARRAY_MAX:
            out += struct.pack(f"<{len(vs)}H", *vs)
        else:
            words = [0] * 1024
            for v in vs:
                words[v >> 6] |= 1 << (v & 63)
            out += struct.pack("<1024Q", *words)
    return bytes(out)


def deserialize_roaring32(buf: bytes, pos: int = 0) -> tuple[list[int], int]:
    """Decode one 32-bit portable bitmap at ``buf[pos:]``; returns
    ``(sorted values, position after the bitmap)``."""

    def need(n: int, what: str) -> None:
        if pos + n > len(buf):
            raise ValueError(
                f"roaring32 truncated at byte {pos}: need {n} more bytes for {what}"
            )

    need(4, "cookie")
    cookie = struct.unpack_from("<I", buf, pos)[0]
    pos += 4
    if (cookie & 0xFFFF) == _COOKIE_RUN:
        n = (cookie >> 16) + 1
        nbytes = (n + 7) // 8
        need(nbytes, "run bitset")
        run_bits = buf[pos : pos + nbytes]
        pos += nbytes
        is_run = [bool(run_bits[i >> 3] & (1 << (i & 7))) for i in range(n)]
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _COOKIE_NO_RUN:
        need(4, "container count")
        n = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        is_run = [False] * n
        has_offsets = True
    else:
        raise ValueError(f"roaring32 bad cookie {cookie} at byte {pos - 4}")

    need(4 * n, "descriptive header")
    keys, cards = [], []
    for _ in range(n):
        k, c = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys.append(k)
        cards.append(c + 1)
    if has_offsets:
        need(4 * n, "offset header")
        pos += 4 * n  # containers are in key order; sequential walk suffices

    out: list[int] = []
    for i in range(n):
        base = keys[i] << 16
        if is_run[i]:
            need(2, "run count")
            n_runs = struct.unpack_from("<H", buf, pos)[0]
            pos += 2
            need(4 * n_runs, "runs")
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out.extend(range(base + start, base + start + length + 1))
        elif cards[i] > _ARRAY_MAX:
            need(8192, "bitset container")
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    out.append(base + (wi << 6) + low.bit_length() - 1)
                    w ^= low
        else:
            need(2 * cards[i], "array container")
            out.extend(
                base + v for v in struct.unpack_from(f"<{cards[i]}H", buf, pos)
            )
            pos += 2 * cards[i]
    return out, pos


def serialize_roaring64(values) -> bytes:
    """Serialize sorted-deduped uint64 ``values`` as a RoaringBitmapArray
    (Delta DV 'portable' layout: int64 LE bucket count, then per bucket a
    uint32 LE high key + one 32-bit portable bitmap)."""
    vals = sorted(set(values))
    if vals and (vals[0] < 0 or vals[-1] > 0xFFFFFFFFFFFFFFFF):
        raise ValueError("roaring64 values must be uint64")
    buckets: dict[int, list[int]] = {}
    for v in vals:
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<q", len(buckets)))
    for k in sorted(buckets):
        out += struct.pack("<I", k)
        out += serialize_roaring32(buckets[k])
    return bytes(out)


def deserialize_roaring64(buf: bytes, pos: int = 0) -> tuple[list[int], int]:
    """Decode a RoaringBitmapArray; returns ``(sorted values, end pos)``."""
    if pos + 8 > len(buf):
        raise ValueError(f"roaring64 truncated at byte {pos}: need bucket count")
    n = struct.unpack_from("<q", buf, pos)[0]
    pos += 8
    if n < 0:
        raise ValueError(f"roaring64 negative bucket count {n}")
    out: list[int] = []
    last_key = -1
    for _ in range(n):
        if pos + 4 > len(buf):
            raise ValueError(f"roaring64 truncated at byte {pos}: need bucket key")
        key = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        if key <= last_key:
            raise ValueError(f"roaring64 bucket keys not increasing at byte {pos - 4}")
        last_key = key
        lows, pos = deserialize_roaring32(buf, pos)
        out.extend((key << 32) | v for v in lows)
    return out, pos
