"""PNG (ISO/IEC 15948) codec — numpy + stdlib zlib, no external libraries.

PNG's DEFLATE layer is Python's built-in ``zlib``, so unlike JPEG there is
no missing-codec excuse: this is a REAL decoder for the second-most-common
corpus image format.  Scope:

* **Decoder**: ALL legal depth/color combinations — 1/2/4/8/16-bit
  greyscale, 8/16-bit greyscale+alpha / truecolor / truecolor+alpha,
  1/2/4/8-bit palette — non-interlaced and Adam7-interlaced, all five
  scanline filters (None/Sub/Up/Average/Paeth — they operate on BYTES
  with a bytes-per-pixel lag rounded up to one, so every depth rides the
  same unfilter), multi-IDAT streams, tRNS palette alpha.  16-bit output
  is uint16; sub-byte grayscale scales to the full 8-bit range (×255/85/
  17); sub-byte palette indices expand through PLTE.
* **Encoder** (test/synthesis harness): filter-0 or filter-per-row
  encoding of 1/2/4-bit gray and 8/16-bit gray/RGB/RGBA.

PNG is lossless, so decode oracles are EXACT — the battery entry's DuckDB
oracle recomputes decoded statistics from the synthesis closed form with no
tolerance band.

Execution shape: called from the ``multimodal.decode_image`` mapInPandas
kernel (Arrow-batched rows); the unfilter recurrence is per-row sequential
but vectorized across each row's bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: Adam7 pass layout: (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _chunks(buf: bytes):
    pos = len(_SIG)
    while pos + 8 <= len(buf):
        length, ctype = struct.unpack_from(">I4s", buf, pos)
        data = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + CRC
        yield ctype, data
        if ctype == b"IEND":
            return


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering → (h, stride) uint8 byte matrix.

    ``stride`` is the scanline width in BYTES and ``bpp`` the bytes per
    pixel — PNG filters always operate on bytes with a bpp-byte left lag
    (spec §9), which is what makes 16-bit depths decode through the same
    code path."""
    rows = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    out = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(rows[y, 0])
        line = rows[y, 1:].copy()
        prior = out[y - 1] if y else zero
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 1:  # Sub — sequential in x with the bpp-byte lag
            for x in range(bpp, stride):
                line[x] = (int(line[x]) + int(line[x - bpp])) & 0xFF
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = line + prior  # uint8 wraps mod 256
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                out[y, x] = (int(line[x]) + ((left + int(prior[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(out[y, x - bpp]) if x >= bpp else 0
                c = int(prior[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[y, x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype} on row {y}")
    return out


def decode_png(buf: bytes):
    """Decode a PNG at any legal depth (1/2/4/8/16).  Returns (height,
    width, channels, array shaped (h, w) for gray or (h, w, channels)) —
    uint16 for 16-bit, uint8 otherwise (sub-byte gray scaled to the full
    8-bit range); palette images expand to RGB (or RGBA when a tRNS chunk
    is present)."""
    if buf[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG payload (missing signature)")
    ihdr = None
    idat = bytearray()
    plte = None
    trns = None
    for ctype, data in _chunks(buf):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid PNG bit depth {depth}")
    if depth < 8 and ctype_ not in (0, 3):
        raise ValueError(f"depth {depth} is only valid for gray/palette (type {ctype_})")
    if depth == 16 and ctype_ == 3:
        raise ValueError("palette images are always ≤8-bit-indexed")
    if ctype_ not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {ctype_}")
    if comp != 0 or filt != 0:
        raise ValueError("non-zero compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"invalid interlace method {interlace}")
    ch = _CHANNELS[ctype_]
    raw = zlib.decompress(bytes(idat))

    def stride_of(width: int) -> int:
        return -(-width * ch * depth // 8)  # scanline bytes, sub-byte packed

    # filter lag is bytes-per-pixel rounded UP to one byte for sub-byte
    # depths (spec §9: "bpp is ... rounded up to one")
    bpp = max(1, ch * depth // 8)

    def expand(mat: np.ndarray, width: int) -> np.ndarray:
        """(rows, stride) packed bytes → (rows, width, ch) samples."""
        rows = mat.shape[0]
        if depth == 8:
            return mat[:, : width * ch].reshape(rows, width, ch)
        if depth == 16:
            m = mat.reshape(rows, -1, 2).astype(np.uint16)
            m = (m[:, :, 0] << 8) | m[:, :, 1]
            return m[:, : width * ch].reshape(rows, width, ch)
        # 1/2/4-bit: unpack MSB-first, group consecutive `depth` bits,
        # drop the row-padding samples past width·ch
        bits = np.unpackbits(mat, axis=1)
        grouped = bits.reshape(rows, -1, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        vals = (grouped * weights).sum(axis=2).astype(np.uint8)
        return vals[:, : width * ch].reshape(rows, width, ch)

    if interlace == 0:
        px = expand(_unfilter(raw, h, stride_of(w), bpp), w)
    else:  # Adam7: seven independently-filtered sub-images
        out_dtype = np.uint16 if depth == 16 else np.uint8
        px = np.zeros((h, w, ch), dtype=out_dtype)
        pos = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (w - x0 + xs - 1) // xs
            ph = (h - y0 + ys - 1) // ys
            if pw == 0 or ph == 0:
                continue
            st = stride_of(pw)
            n = ph * (st + 1)
            sub = expand(_unfilter(raw[pos : pos + n], ph, st, bpp), pw)
            pos += n
            px[y0::ys, x0::xs] = sub
    if depth == 16:  # expand() already assembled uint16 samples
        if ch == 1:
            return h, w, 1, px[:, :, 0]
        return h, w, ch, px
    if ctype_ == 0 and depth < 8:
        # sub-byte grayscale scales to full 8-bit range (255/(2^d−1) is
        # exact: 255, 85, 17 for depths 1/2/4)
        px = (px.astype(np.uint16) * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if ctype_ == 3:  # palette → RGB(A)
        if plte is None:
            raise ValueError("palette image without PLTE chunk")
        idx = px[:, :, 0]
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(256, 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            return h, w, 4, np.dstack([rgb, alpha[idx]])
        return h, w, 3, rgb
    if ch == 1:
        return h, w, 1, px[:, :, 0]
    return h, w, ch, px


# -- encoder (test harness) --------------------------------------------------


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    img: np.ndarray,
    filter_type: int = 0,
    interlace: bool = False,
    depth: int | None = None,
) -> bytes:
    """Encode a gray/RGB/RGBA array as PNG — 8-bit from uint8 input, 16-bit
    (big-endian samples) from uint16 input, or 1/2/4-bit grayscale when
    ``depth`` is given (2-D input of values < 2^depth).  ``filter_type``
    applies one filter to every scanline (0=None, 2=Up — enough to
    exercise the unfilter path; encoders optimizing compression pick
    per-row)."""
    img = np.asarray(img)
    if depth is None:
        depth = 16 if img.dtype == np.uint16 else 8
    if depth in (1, 2, 4):
        if img.ndim != 2:
            raise ValueError("sub-byte depths encode 2-D grayscale only")
        if int(img.max(initial=0)) >= (1 << depth):
            raise ValueError(f"sample value out of range for depth {depth}")
        img = img.astype(np.uint8)[:, :, None]
    else:
        img = img.astype(np.uint16 if depth == 16 else np.uint8)
        if img.ndim == 2:
            img = img[:, :, None]
    h, w, ch = img.shape
    ctype_ = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def to_bytes(a: np.ndarray) -> np.ndarray:
        """(rows, width, ch) samples → (rows, stride) packed scanline bytes."""
        rows = a.shape[0]
        if depth == 16:
            return (
                np.stack([(a >> 8).astype(np.uint8), (a & 0xFF).astype(np.uint8)], axis=-1)
                .reshape(rows, -1)
            )
        if depth == 8:
            return a.reshape(rows, -1)
        bits = (
            (a.reshape(rows, -1)[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1
        ).astype(np.uint8).reshape(rows, -1)
        return np.packbits(bits, axis=1)  # zero-pads to the byte boundary

    if interlace:
        parts = bytearray()
        for x0, y0, xs, ys in _ADAM7:
            sub = img[y0::ys, x0::xs]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts += _filter_rows(to_bytes(sub), 0)
        raw = bytes(parts)
    else:
        raw = _filter_rows(to_bytes(img), filter_type)
    out = bytearray(_SIG)
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype_, 0, 0,
                                       1 if interlace else 0))
    out += _chunk(b"IDAT", zlib.compress(raw, 6))
    out += _chunk(b"IEND", b"")
    return bytes(out)


def _filter_rows(flat: np.ndarray, filter_type: int) -> bytes:
    """(rows, stride) packed scanline bytes → filtered raw stream."""
    h, stride = flat.shape
    out = bytearray()
    for y in range(h):
        if filter_type == 0:
            out += bytes([0]) + flat[y].tobytes()
        elif filter_type == 2:  # Up
            prior = flat[y - 1] if y else np.zeros(stride, dtype=np.uint8)
            out += bytes([2]) + (flat[y] - prior).tobytes()
        else:
            raise ValueError("encoder supports filter types 0 and 2")
    return bytes(out)
