"""Parquet PageIndex (ColumnIndex + OffsetIndex) — read and page pruning.

The PageIndex is how real engines skip I/O at page granularity: per-page
min/max/null stats live in the footer region (ColumnIndex), and page byte
offsets + first-row ordinals live beside them (OffsetIndex), so a range
predicate can decide which pages to decode WITHOUT touching the pages.
This module implements both structures from the parquet-format spec
(PageIndex.md) over the repo's thrift walker, plus a pruned column scan
that decodes only the surviving pages:

- :func:`page_index` — per-page ``{min, max, null_page, null_count,
  first_row, offset, compressed_size, rows}`` for one column chunk, typed
  via the schema's physical type (little-endian ints/floats, UTF-8 byte
  arrays);
- :func:`read_column_pruned` — evaluates ``lo <= v <= hi`` against the
  page stats, seeks straight to surviving pages through the OffsetIndex
  (decoding the dictionary page first when the chunk is
  dictionary-encoded), decodes them with the shared page machinery
  (parquet_data), filters rows exactly, and reports
  ``(values, pages_read, pages_total)`` so callers can ASSERT pruning
  happened rather than trust it.

Correctness is oracle-checked two ways: the pruned result must equal the
full-scan-then-filter result (tests), and the battery entry aggregates
the same range through DuckDB's reader.  V1 data pages are
self-contained (levels restart per page), which is what makes per-page
decode sound.

Honest gates: columns without a written PageIndex raise ``ValueError``
(the caller falls back to the full scan); DATA_PAGE_V2 chunks and nested
columns raise ``NotImplementedError``.

Reference parity: the reference's scan pushdown operates at row-group
granularity (ParquetFileFormat filter pushdown); page-granular skipping
is the finer version of the same contract.
"""

from __future__ import annotations

import struct

from .parquet_meta import thrift_compact_decode

__all__ = ["page_index", "read_column_pruned"]


def _typed(raw, ptype: int):
    """Decode a ColumnIndex min/max binary per the physical type."""
    if raw is None:
        return None
    b = bytes(raw)
    if ptype == 1:  # INT32
        return struct.unpack("<i", b)[0]
    if ptype == 2:  # INT64
        return struct.unpack("<q", b)[0]
    if ptype == 4:  # FLOAT
        return struct.unpack("<f", b)[0]
    if ptype == 5:  # DOUBLE
        return struct.unpack("<d", b)[0]
    if ptype == 6:  # BYTE_ARRAY (UTF-8 truncated bounds)
        return b.decode("utf-8", "replace")
    raise NotImplementedError(f"PageIndex bounds for physical type {ptype}")


def _chunk_meta(buf: bytes, column: str):
    """Locate the (ColumnChunk fields, ColumnMetaData, descriptor) of a
    flat column's single-row-group chunk (multi-row-group files return a
    list of them)."""
    from .parquet_data import _schema_leaves

    if buf[-4:] != b"PAR1":
        raise ValueError("not a parquet payload")
    (flen,) = struct.unpack_from("<I", buf, len(buf) - 8)
    meta, _ = thrift_compact_decode(buf[len(buf) - 8 - flen : len(buf) - 8])
    leaves = _schema_leaves(meta)
    if column not in leaves:
        raise ValueError(f"column {column!r} not in schema {sorted(leaves)}")
    desc = leaves[column]
    if desc["kind"] != "flat":
        raise NotImplementedError("PageIndex pruning covers flat columns")
    chunks = []
    for rg in meta.get(4, []):
        for cc in rg.get(1, []):
            cm = cc.get(3, {})
            path = ".".join(p.decode("utf-8", "replace") for p in cm.get(3, []))
            if path == column:
                chunks.append((cc, cm))
    if not chunks:
        raise ValueError(f"column {column!r} has no chunks")
    return chunks, desc


def page_index(buf: bytes, column: str) -> list[list[dict]]:
    """Per-chunk page stats: merges each chunk's ColumnIndex and
    OffsetIndex into one dict per page."""
    chunks, desc = _chunk_meta(buf, column)
    out = []
    for cc, cm in chunks:
        ci_off, ci_len = cc.get(6), cc.get(7)
        oi_off, oi_len = cc.get(4), cc.get(5)
        if ci_off is None or oi_off is None:
            raise ValueError(f"column {column!r} has no written PageIndex")
        ci, _ = thrift_compact_decode(buf[ci_off : ci_off + ci_len])
        oi, _ = thrift_compact_decode(buf[oi_off : oi_off + oi_len])
        ptype = cm.get(1)
        null_pages = ci.get(1, [])
        mins = ci.get(2, [])
        maxs = ci.get(3, [])
        null_counts = ci.get(5, [None] * len(null_pages))
        locs = [thrift_compact_decode(loc)[0] if isinstance(loc, bytes) else loc
                for loc in oi.get(1, [])]
        n_values = cm.get(5, 0)
        pages = []
        for i, loc in enumerate(locs):
            first = loc.get(3, 0)
            nxt = locs[i + 1].get(3, n_values) if i + 1 < len(locs) else n_values
            is_null_page = bool(null_pages[i]) if i < len(null_pages) else False
            pages.append(
                {
                    "min": None if is_null_page else _typed(mins[i], ptype),
                    "max": None if is_null_page else _typed(maxs[i], ptype),
                    "null_page": is_null_page,
                    "null_count": null_counts[i] if i < len(null_counts) else None,
                    "offset": loc.get(1),
                    "compressed_size": loc.get(2),
                    "first_row": first,
                    "rows": nxt - first,
                }
            )
        out.append(pages)
    return out


def read_column_pruned(buf: bytes, column: str, lo, hi):
    """Scan one flat column for values in ``[lo, hi]``, decoding ONLY the
    pages whose ColumnIndex range intersects.  Returns
    ``(matching_values, pages_read, pages_total)``."""
    from .parquet_data import _decode_pages

    chunks, desc = _chunk_meta(buf, column)
    idx = page_index(buf, column)
    max_def = desc["max_def"]
    values: list = []
    pages_read = 0
    pages_total = 0
    for (cc, cm), pages in zip(chunks, idx):
        pages_total += len(pages)
        keep = [
            p
            for p in pages
            if not p["null_page"] and p["max"] >= lo and p["min"] <= hi
        ]
        if not keep:
            continue
        pages_read += len(keep)
        # dictionary page first when the chunk has one
        dict_hdrs = []
        if 11 in cm:
            dpos = cm[11]
            hdr, hend = thrift_compact_decode(buf, dpos)
            dict_hdrs.append((hdr, buf[hend : hend + hdr.get(3)]))

        def kept_pages():
            yield from dict_hdrs
            for p in keep:
                hdr, hend = thrift_compact_decode(buf, p["offset"])
                if hdr.get(1) == 3:
                    raise NotImplementedError(
                        "PageIndex pruning over DATA_PAGE_V2 not wired"
                    )
                yield hdr, buf[hend : hend + hdr.get(3)]

        # total values across kept pages only
        cm_kept = dict(cm)
        cm_kept[5] = sum(p["rows"] for p in keep)
        defs, _reps, present = _decode_pages(
            kept_pages(), cm_kept, max_def, 0, desc.get("type_length")
        )
        it = iter(present)
        for d in defs:
            if d == max_def:
                v = next(it)
                if v is not None and lo <= v <= hi:
                    values.append(v)
    return values, pages_read, pages_total
