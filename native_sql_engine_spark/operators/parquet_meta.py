"""From-scratch Parquet footer introspection — stdlib only.

Parses the Thrift COMPACT-protocol ``FileMetaData`` struct that every
parquet file carries before its trailing ``PAR1`` magic: a generic
compact-protocol decoder (zigzag varints, field-id deltas, little-endian
doubles, nested structs/lists/maps) plus the field-id interpretation for
the structs a storage auditor needs — file version, created_by, row
count, row groups (row counts, byte sizes), column chunks (path, codec,
value counts, compressed/uncompressed sizes).

This is the metadata a 100 TB layout audit reads WITHOUT scanning data:
row-group sizing (too small → task overhead; too large → no parallelism),
codec mix, and per-column compression ratios.  The DuckDB oracle
cross-checks the parsed row counts against an actual scan, so the parser
cannot self-certify.

Malformed footers raise positioned ``ValueError``.
"""

from __future__ import annotations

import struct

__all__ = ["parse_footer", "thrift_compact_decode", "thrift_compact_encode"]

_CODECS = {
    0: "UNCOMPRESSED",
    1: "SNAPPY",
    2: "GZIP",
    3: "LZO",
    4: "BROTLI",
    5: "LZ4",
    6: "ZSTD",
    7: "LZ4_RAW",
}


# -- generic Thrift compact protocol -------------------------------------------


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        if pos >= len(buf):
            raise ValueError(f"truncated varint at byte {pos}")
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 70:
            raise ValueError(f"varint too long at byte {pos}")


def _zigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _read_value(buf: bytes, pos: int, ttype: int):
    if ttype == 1:  # BOOLEAN_TRUE (list element form: one byte)
        return True, pos
    if ttype == 2:
        return False, pos
    if ttype == 3:  # BYTE
        return struct.unpack_from("b", buf, pos)[0], pos + 1
    if ttype in (4, 5, 6):  # I16 / I32 / I64
        u, pos = _varint(buf, pos)
        return _zigzag(u), pos
    if ttype == 7:  # DOUBLE (little-endian in compact protocol)
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if ttype == 8:  # BINARY / STRING
        n, pos = _varint(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError(f"bad binary length {n} at byte {pos}")
        return buf[pos : pos + n], pos + n
    if ttype in (9, 10):  # LIST / SET
        hdr = buf[pos]
        pos += 1
        size = hdr >> 4
        etype = hdr & 0x0F
        if size == 15:
            size, pos = _varint(buf, pos)
        out = []
        for _ in range(size):
            if etype == 1:  # bool list elements are full bytes
                out.append(buf[pos] == 1)
                pos += 1
            else:
                v, pos = _read_value(buf, pos, etype)
                out.append(v)
        return out, pos
    if ttype == 11:  # MAP
        size, pos = _varint(buf, pos)
        if size == 0:
            return {}, pos
        kt, vt = buf[pos] >> 4, buf[pos] & 0x0F
        pos += 1
        out = {}
        for _ in range(size):
            k, pos = _read_value(buf, pos, kt)
            v, pos = _read_value(buf, pos, vt)
            out[k if not isinstance(k, bytes) else k.decode("utf-8", "replace")] = v
        return out, pos
    if ttype == 12:  # STRUCT
        return thrift_compact_decode(buf, pos)
    raise ValueError(f"unknown thrift compact type {ttype} at byte {pos}")


def thrift_compact_decode(buf: bytes, pos: int = 0):
    """Decode one compact-protocol struct into {field_id: value};
    returns (fields, end_pos).  Schema-agnostic: nested structs become
    nested dicts, so callers interpret field ids per the parquet IDL."""
    fields: dict[int, object] = {}
    last_id = 0
    while True:
        if pos >= len(buf):
            raise ValueError(f"unterminated struct at byte {pos}")
        hdr = buf[pos]
        pos += 1
        if hdr == 0:  # STOP
            return fields, pos
        delta = hdr >> 4
        ttype = hdr & 0x0F
        if delta == 0:  # long-form field id: zigzag varint
            u, pos = _varint(buf, pos)
            fid = _zigzag(u)
        else:
            fid = last_id + delta
        last_id = fid
        if ttype in (1, 2):  # booleans carry the value in the type nibble
            fields[fid] = ttype == 1
            continue
        fields[fid], pos = _read_value(buf, pos, ttype)
    # unreachable


# -- thrift compact encoding (fixture writers) -----------------------------------


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_value(ttype: int, value) -> bytes:
    if ttype in (4, 5, 6):  # I16 / I32 / I64: zigzag varint
        return _write_varint((value << 1) ^ (value >> 63))
    if ttype == 7:  # DOUBLE, little-endian in compact protocol
        return struct.pack("<d", value)
    if ttype == 8:  # BINARY / STRING
        raw = value.encode("utf-8") if isinstance(value, str) else bytes(value)
        return _write_varint(len(raw)) + raw
    if ttype == 9:  # LIST: value = (elem_type, [items])
        etype, items = value
        hdr = (
            bytes([(len(items) << 4) | etype])
            if len(items) < 15
            else bytes([0xF0 | etype]) + _write_varint(len(items))
        )
        return hdr + b"".join(_encode_value(etype, it) for it in items)
    if ttype == 12:  # STRUCT: value = field list
        return thrift_compact_encode(value)
    raise ValueError(f"unsupported thrift compact type {ttype} for encoding")


def thrift_compact_encode(fields: list[tuple[int, int, object]]) -> bytes:
    """Serialize one compact-protocol struct from ``(field_id, type,
    value)`` triples (must be in ascending field-id order).  Booleans pass
    ``ttype=2`` with a bool value (the value rides in the type nibble);
    lists pass ``(elem_type, items)``; structs nest as field lists.
    Inverse of :func:`thrift_compact_decode` for the subset parquet
    fixture-writing needs."""
    out = bytearray()
    last_id = 0
    for fid, ttype, value in fields:
        wire_type = ttype
        if ttype in (1, 2):  # bool: value in the type nibble
            wire_type = 1 if value else 2
        delta = fid - last_id
        if 0 < delta < 16:
            out.append((delta << 4) | wire_type)
        else:
            out.append(wire_type)
            out += _write_varint((fid << 1) ^ (fid >> 63))
        last_id = fid
        if ttype not in (1, 2):
            out += _encode_value(ttype, value)
    out.append(0)  # STOP
    return bytes(out)


# -- parquet FileMetaData interpretation ----------------------------------------


def parse_footer(buf: bytes) -> dict:
    """Parse a whole parquet file's (or its tail's) footer.  Returns::

        {"version", "num_rows", "created_by", "num_row_groups",
         "row_groups": [{"num_rows", "total_byte_size",
                         "columns": [{"path", "codec", "num_values",
                                      "compressed", "uncompressed"}]}]}
    """
    if len(buf) < 12 or buf[-4:] != b"PAR1":
        raise ValueError("not a parquet payload (missing trailing PAR1 magic)")
    (flen,) = struct.unpack_from("<I", buf, len(buf) - 8)
    start = len(buf) - 8 - flen
    if start < 0:
        raise ValueError(f"footer length {flen} exceeds the payload")
    meta, _ = thrift_compact_decode(buf[start : len(buf) - 8])

    def dec(v):
        return v.decode("utf-8", "replace") if isinstance(v, bytes) else v

    out = {
        "version": meta.get(1),
        "num_rows": meta.get(3),
        "created_by": dec(meta.get(6)),
        "row_groups": [],
    }
    for rg in meta.get(4, []):
        cols = []
        for cc in rg.get(1, []):
            cm = cc.get(3, {})
            cols.append(
                {
                    "path": ".".join(dec(p) for p in cm.get(3, [])),
                    "codec": _CODECS.get(cm.get(4), f"UNKNOWN({cm.get(4)})"),
                    "num_values": cm.get(5),
                    "uncompressed": cm.get(6),
                    "compressed": cm.get(7),
                }
            )
        out["row_groups"].append(
            {"num_rows": rg.get(3), "total_byte_size": rg.get(2), "columns": cols}
        )
    out["num_row_groups"] = len(out["row_groups"])
    return out
