"""From-scratch TIFF codec — uncompressed + LZW, gray/RGB, strips,
horizontal predictor, both byte orders.  numpy + stdlib only.

Implements the baseline TIFF 6.0 subset a training-data pipeline actually
meets in scanned-document corpora: 8-bit grayscale and RGB, strip layout
(RowsPerStrip) AND tiled layout (tags 322–325, edge tiles padded),
Compression 1 (none), 5 (LZW, TIFF variant: MSB-first variable-width
codes, EarlyChange), and 32773 (PackBits RLE), Predictor 2 (horizontal
differencing).
Anything else (palette, 16-bit, CCITT) raises a
positioned NotImplementedError/ValueError — same honest-gate discipline as
jpeg.py/png.py/gif.py.

Reference parity note: the reference engine ships no media codecs; this
extends the repo's real-corpus decode ledger (SCALE.md) on the same
closed-form-oracle pattern as the JPEG/PNG/GIF entries.
"""

from __future__ import annotations

import struct

import numpy as np

# -- TIFF-variant LZW (spec ch. 13: MSB-first, EarlyChange) -----------------

_CLEAR = 256
_EOI = 257


class _MSBWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.nbits = 0
        return bytes(self.out)


class _MSBReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("truncated LZW stream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= width
        v = (self.acc >> self.nbits) & ((1 << width) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v


def lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW: starts with ClearCode, ends with EOI, code width
    9→12 bumping one code EARLY (when the next index to assign is
    2^width − 1 — libtiff's default EarlyChange=1)."""
    bw = _MSBWriter()
    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    bw.write(_CLEAR, width)
    w = b""
    for b in data:
        c = w + bytes([b])
        if c in table:
            w = c
            continue
        bw.write(table[w], width)
        table[c] = nxt
        nxt += 1
        # EarlyChange: the width of the NEXT emitted code must cover the
        # next index the decoder will assign
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
        if nxt >= 4094:  # table nearly full: reset (spec-recommended)
            bw.write(_CLEAR, width)
            width = 9
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
        w = bytes([b])
    if w:
        bw.write(table[w], width)
    bw.write(_EOI, width)
    return bw.flush()


def lzw_decode(data: bytes, expect: int | None = None) -> bytes:
    """Decode a TIFF-variant LZW stream (EarlyChange width bumps)."""
    br = _MSBReader(data)
    out = bytearray()
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    while True:
        code = br.read(width)
        if code == _EOI:
            break
        if code == _CLEAR:
            width = 9
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            prev = None
            continue
        if prev is None:
            if code > 255:
                raise ValueError(f"LZW: first code after clear not a literal: {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW: code {code} beyond table size {len(table)}")
        out += entry
        prev = entry
        # mirror of the encoder's EarlyChange, minus the decoder's one-code
        # table lag (the decoder assigns the entry for code k only upon
        # reading code k+1): bump when the table is ONE BELOW the encoder's
        # 2^width − 1 threshold — libtiff's maxcode = MAXCODE(n_bits) − 1.
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        if expect is not None and len(out) >= expect:
            break
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Apple PackBits RLE (TIFF Compression 32773, spec §9): runs of ≥3
    equal bytes become (257−n, byte); literals batch up to 128."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = 0

    def flush_literals(end: int) -> None:
        j = lit_start
        while j < end:
            k = min(128, end - j)
            out.append(k - 1)
            out.extend(data[j : j + k])
            j += k

    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            flush_literals(i)
            out.append(257 - run)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literals(i)
    return bytes(out)


def packbits_decode(data: bytes, expect: int | None = None) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and (expect is None or len(out) < expect):
        h = data[i]
        i += 1
        if h < 128:  # h+1 literal bytes
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            if i >= len(data):
                raise ValueError("truncated PackBits run")
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op per spec
    return bytes(out)


# -- container ---------------------------------------------------------------

_T_SHORT, _T_LONG = 3, 4

# tag ids
_W, _H, _BPS, _COMP, _PHOTO, _SO, _SPP, _RPS, _SBC, _PRED = (
    256, 257, 258, 259, 262, 273, 277, 278, 279, 317,
)
_TW, _TL, _TO, _TBC = 322, 323, 324, 325  # tiled layout (spec §15)


def encode_tiff(
    img: np.ndarray,
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
    tile: tuple[int, int] | None = None,
) -> bytes:
    """Encode 8-bit grayscale (h, w) or RGB (h, w, 3) as baseline TIFF.

    compression: 1 = none, 5 = LZW, 32773 = PackBits.  predictor 2 =
    horizontal differencing (LZW only, per spec).  Layout: strips of
    ``rows_per_strip`` rows (default: one strip), or — mutually exclusive —
    ``tile=(tw, th)`` tiles (dims multiples of 16 per spec §15)."""
    if compression not in (1, 5, 32773):
        raise ValueError("compression must be 1 (none), 5 (LZW), or 32773 (PackBits)")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 or 2")
    if predictor == 2 and compression != 5:
        raise ValueError("predictor 2 is defined for LZW compression")
    if tile is not None and rows_per_strip is not None:
        raise ValueError("tile and rows_per_strip are mutually exclusive")
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    spp = 1 if gray else img.shape[2]
    if not gray and spp != 3:
        raise ValueError("only grayscale or 3-sample RGB supported")
    rps = rows_per_strip or h
    eb = ">" if big_endian else "<"

    img3 = img.reshape(h, w, spp)
    if tile is not None:
        tw, th = tile
        if tw % 16 or th % 16:
            raise ValueError("tile dimensions must be multiples of 16 (spec §15)")
        seg_px = []
        for ty in range(0, h, th):
            for tx in range(0, w, tw):
                t = np.zeros((th, tw, spp), dtype=np.uint8)
                sub = img3[ty : ty + th, tx : tx + tw]
                t[: sub.shape[0], : sub.shape[1]] = sub
                seg_px.append(t.reshape(th, tw * spp))
    else:
        px = img.reshape(h, w * spp)
        seg_px = [px[y0 : y0 + rps] for y0 in range(0, h, rps)]

    segments = []
    for rows in seg_px:
        rows = rows.copy()
        if predictor == 2:
            r3 = rows.reshape(rows.shape[0], -1, spp).astype(np.int16)
            r3[:, 1:] -= r3[:, :-1].copy()
            rows = (r3 % 256).astype(np.uint8).reshape(rows.shape[0], -1)
        raw = rows.tobytes()
        if compression == 5:
            raw = lzw_encode(raw)
        elif compression == 32773:
            raw = packbits_encode(raw)
        segments.append(raw)

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        if typ == _T_SHORT and count == 1:
            val = struct.pack(f"{eb}HH", value, 0)
        else:
            val = struct.pack(f"{eb}I", value)
        return struct.pack(f"{eb}HHI", tag, typ, count) + val

    n_segs = len(segments)
    off_tag, cnt_tag = (_TO, _TBC) if tile is not None else (_SO, _SBC)
    # layout: header(8) + IFD + [offset/count arrays] + segment data
    tags = [
        (_W, _T_SHORT, 1, w),
        (_H, _T_SHORT, 1, h),
        (_BPS, _T_SHORT, spp, None),  # inline for spp<=2 else offset
        (_COMP, _T_SHORT, 1, compression),
        (_PHOTO, _T_SHORT, 1, 1 if gray else 2),
        (off_tag, _T_LONG, n_segs, None),
        (_SPP, _T_SHORT, 1, spp),
        (cnt_tag, _T_LONG, n_segs, None),
    ]
    if tile is not None:
        tags += [(_TW, _T_SHORT, 1, tile[0]), (_TL, _T_SHORT, 1, tile[1])]
    else:
        tags.append((_RPS, _T_SHORT, 1, rps))
    if predictor == 2:
        tags.append((_PRED, _T_SHORT, 1, 2))
    tags.sort()
    ifd_size = 2 + 12 * len(tags) + 4
    pos = 8 + ifd_size
    extra = bytearray()

    def alloc(payload: bytes) -> int:
        nonlocal pos
        off = pos
        extra.extend(payload)
        pos += len(payload)
        return off

    bps_val = 8
    if spp == 3:
        bps_val = alloc(struct.pack(f"{eb}HHH", 8, 8, 8) + b"\x00\x00")
    so_off = sbc_off = None
    if n_segs > 1:
        so_off = alloc(b"\x00" * 4 * n_segs)
        sbc_off = alloc(struct.pack(f"{eb}{n_segs}I", *[len(s) for s in segments]))
    seg_offsets = []
    for s in segments:
        seg_offsets.append(alloc(s))
    if n_segs > 1:
        struct.pack_into(f"{eb}{n_segs}I", extra, so_off - (8 + ifd_size), *seg_offsets)

    out = bytearray()
    out += (b"MM\x00\x2a" if big_endian else b"II\x2a\x00") + struct.pack(f"{eb}I", 8)
    out += struct.pack(f"{eb}H", len(tags))
    for tag, typ, count, value in tags:
        if tag == _BPS:
            out += entry(tag, typ, count, bps_val)
        elif tag == off_tag:
            out += entry(tag, typ, count, seg_offsets[0] if n_segs == 1 else so_off)
        elif tag == cnt_tag:
            out += entry(tag, typ, count, len(segments[0]) if n_segs == 1 else sbc_off)
        else:
            out += entry(tag, typ, count, value)
    out += struct.pack(f"{eb}I", 0)  # next-IFD pointer
    out += extra
    return bytes(out)


def decode_tiff(buf: bytes):
    """Decode the first IFD of a baseline TIFF.  Returns (height, width,
    channels, uint8 array).  Supports II/MM byte order, 8-bit gray/RGB,
    strip AND tile layouts, Compression 1/5/32773, Predictor 1/2,
    WhiteIsZero inversion; palette/CMYK/planar layouts raise."""
    if buf[:4] == b"II\x2a\x00":
        eb = "<"
    elif buf[:4] == b"MM\x00\x2a":
        eb = ">"
    else:
        raise ValueError("not a TIFF payload (missing II*/MM* header)")
    try:
        return _decode_body(buf, eb)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or malformed TIFF: {e}") from e


def _read_values(buf: bytes, eb: str, typ: int, count: int, raw: bytes) -> list[int]:
    size = 2 if typ == _T_SHORT else 4
    fmt = "H" if typ == _T_SHORT else "I"
    if size * count <= 4:
        return list(struct.unpack(f"{eb}{count}{fmt}", raw[: size * count]))
    (off,) = struct.unpack(f"{eb}I", raw)
    return list(struct.unpack_from(f"{eb}{count}{fmt}", buf, off))


def _decode_body(buf: bytes, eb: str):
    (ifd_off,) = struct.unpack_from(f"{eb}I", buf, 4)
    (n,) = struct.unpack_from(f"{eb}H", buf, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(f"{eb}HHI", buf, base)
        if typ not in (_T_SHORT, _T_LONG):
            continue  # RATIONAL/ASCII metadata we don't need
        tags[tag] = _read_values(buf, eb, typ, count, buf[base + 8 : base + 12])

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    w, h = one(_W), one(_H)
    comp = one(_COMP, 1)
    spp = one(_SPP, 1)
    pred = one(_PRED, 1)
    bps = tags.get(_BPS, [8])
    if any(b != 8 for b in bps):
        raise NotImplementedError(f"only 8 bits/sample supported, got {bps}")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} (CCITT/JPEG-in-TIFF/deflate) not supported"
        )
    if spp not in (1, 3):
        raise NotImplementedError(f"SamplesPerPixel {spp} not supported")
    photo = one(_PHOTO, 1 if spp == 1 else 2)
    if photo not in (0, 1, 2):
        raise NotImplementedError(
            f"PhotometricInterpretation {photo} (palette/CMYK/YCbCr) not supported"
        )
    if one(284, 1) != 1:  # PlanarConfiguration
        raise NotImplementedError("planar (non-chunky) sample layout not supported")
    def _decompress(raw: bytes, expect: int, what: str) -> np.ndarray:
        if comp == 5:
            raw = lzw_decode(raw, expect=expect)
        elif comp == 32773:
            raw = packbits_decode(raw, expect=expect)
        if len(raw) < expect:
            raise ValueError(f"{what}: {len(raw)} bytes < expected {expect}")
        return np.frombuffer(raw, dtype=np.uint8, count=expect)

    def _undiff(block: np.ndarray, nrows: int, width: int) -> np.ndarray:
        if pred != 2:
            return block
        b3 = block.reshape(nrows, width, spp)
        return np.cumsum(b3.astype(np.int64), axis=1).astype(np.uint8).reshape(
            nrows, width * spp
        )

    if _TW in tags or _TL in tags:  # tiled layout (spec §15)
        tw, th = one(_TW), one(_TL)
        offsets = tags.get(_TO)
        counts = tags.get(_TBC)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF tile offsets/byte-counts missing or mismatched")
        across = -(-w // tw)
        down = -(-h // th)
        if len(offsets) != across * down:
            raise ValueError(
                f"tile count {len(offsets)} != grid {down}x{across} for {w}x{h}/{tw}x{th}"
            )
        canvas = np.zeros((h, w, spp), dtype=np.uint8)
        for i, (off, cnt) in enumerate(zip(offsets, counts)):
            block = _undiff(
                _decompress(buf[off : off + cnt], th * tw * spp, f"tile {i}").reshape(
                    th, tw * spp
                ),
                th,
                tw,
            ).reshape(th, tw, spp)
            ty, tx = divmod(i, across)
            y0, x0 = ty * th, tx * tw
            eh, ew = min(th, h - y0), min(tw, w - x0)
            canvas[y0 : y0 + eh, x0 : x0 + ew] = block[:eh, :ew]
        if photo == 0:  # WhiteIsZero: 0 renders white — invert to BlackIsZero
            canvas = (255 - canvas.astype(np.int16)).astype(np.uint8)
        if spp == 1:
            return h, w, 1, canvas[:, :, 0]
        return h, w, 3, canvas

    rps = one(_RPS, h)
    offsets = tags.get(_SO)
    counts = tags.get(_SBC)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip offsets/byte-counts missing or mismatched")

    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rps, h - si * rps)
        block = _decompress(buf[off : off + cnt], nrows * w * spp, f"strip {si}").reshape(
            nrows, w * spp
        )
        rows.append(_undiff(block, nrows, w))
    px = np.vstack(rows)
    if photo == 0:  # WhiteIsZero: 0 renders white — invert to BlackIsZero
        px = (255 - px.astype(np.int16)).astype(np.uint8)
    if spp == 1:
        return h, w, 1, px.reshape(h, w)
    return h, w, 3, px.reshape(h, w, 3)
