"""GIF (87a/89a) codec — pure Python/numpy LZW, no external libraries.

Completes the lossless-format pair next to PNG: GIF's LZW layer is ~80
lines of plain Python, so the decode is real, not a stub.  Scope:

* **Decoder**: GIF87a/89a — global/local color tables, variable-width
  LZW with dictionary reset, interlaced row order, GIF89a transparency
  (GCE) → RGBA, frame offsets composited onto the logical screen, and
  ANIMATED streams (``decode_gif_frames``: per-frame compositing through
  disposal methods 0–3, transparency holding the prior pixel); malformed
  streams raise positioned errors.
* **Encoder** (test/synthesis harness): palette-quantized single-frame
  writer with a real growing-dictionary LZW compressor, plus an animated
  writer (NETSCAPE2.0 loop + per-frame GCE).

Lossless (palette-indexed), so decode oracles are exact.  Runs inside the
``multimodal.decode_image`` Arrow-batched kernel like the other codecs.
"""

from __future__ import annotations

import struct

import numpy as np

#: interlace passes: (row_start, row_step)
_INTERLACE = [(0, 8), (4, 8), (2, 4), (1, 2)]


# -- LZW -----------------------------------------------------------------


#: singleton byte strings shared by every decode (avoids per-clear rebuilds)
_SINGLE = [bytes([i]) for i in range(256)]


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader: GIF packs codes LSB-first
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    # dense list table (index == code): O(1) array lookups instead of dict
    # hashing in the per-symbol loop; positions clear/eoi hold placeholders
    # so len(table) always equals the next free code
    table = _SINGLE[:clear] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            del table[eoi + 1 :]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        nc = len(table)  # next free code
        if prev is None:
            if code >= clear:
                raise ValueError(f"invalid LZW code {code}")
            entry = table[code]
        elif code < nc:
            entry = table[code]
        elif code == nc:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"invalid LZW code {code}")
        out += entry
        if prev is not None and nc < 4096:
            table.append(prev + entry[:1])
            if nc + 1 == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_pixels])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    width = min_code_size + 1
    next_code = eoi + 1
    emit(clear, width)
    cur = b""
    for b in indices:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            width = min_code_size + 1
            next_code = eoi + 1
        cur = bytes([b])
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# -- container -------------------------------------------------------------


def decode_gif(buf: bytes):
    """Decode the first frame of a GIF.  Returns (height, width, channels,
    uint8 array) — RGB, or RGBA when the frame carries a transparency
    index.  A frame offset within / smaller than the logical screen is
    composited onto the screen (background color under it, alpha 0 outside
    it) and returns the screen's dimensions."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF87a/89a signature)")
    try:
        return _decode_gif_body(buf)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or malformed GIF: {e}") from e


def _gif_header(buf: bytes):
    """(screen_w, screen_h, global_color_table_or_None, bg_index, pos)."""
    sw, sh, packed, bg, _ar = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(buf, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    return sw, sh, gct, bg, pos


def _iter_raw_frames(buf: bytes, gct, pos: int):
    """Yield (left, top, w, h, idx, table, transparent, disposal) per image
    descriptor, in stream order.  GCE state (transparency + disposal)
    applies to the NEXT image descriptor only, per GIF89a."""
    transparent = None
    disposal = 0
    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension
            label = buf[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = buf[pos]
                flags = buf[pos + 1]
                disposal = (flags >> 2) & 0x07
                transparent = buf[pos + 4] if flags & 0x01 else None
                pos += 1 + size
                if buf[pos] != 0:
                    # explicit raise (not assert: stripped under -O, and
                    # AssertionError would bypass the ValueError contract)
                    raise ValueError(f"GCE missing terminator at offset {pos}")
                pos += 1
            else:  # skip sub-blocks
                while buf[pos] != 0:
                    pos += 1 + buf[pos]
                pos += 1
            continue
        if block == 0x2C:  # image descriptor
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", buf, pos)
            pos += 9
            table = gct
            if ipacked & 0x80:  # local color table
                n = 2 << (ipacked & 0x07)
                table = np.frombuffer(
                    buf, dtype=np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if table is None:
                raise ValueError("GIF frame without any color table")
            interlaced = bool(ipacked & 0x40)
            min_code_size = buf[pos]
            pos += 1
            data = bytearray()
            while buf[pos] != 0:
                n = buf[pos]
                data += buf[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1  # block terminator
            idx = np.frombuffer(
                _lzw_decode(bytes(data), min_code_size, w * h), dtype=np.uint8
            ).reshape(h, w)
            if interlaced:
                de = np.zeros_like(idx)
                src = 0
                for start, step in _INTERLACE:
                    n_rows = len(range(start, h, step))
                    de[start::step] = idx[src : src + n_rows]
                    src += n_rows
                idx = de
            yield left, top, w, h, idx, table, transparent, disposal
            transparent = None
            disposal = 0
            continue
        raise ValueError(f"unknown GIF block 0x{block:02X} at offset {pos - 1}")
    raise ValueError("truncated GIF (no trailer)")


def _decode_gif_body(buf: bytes):
    sw, sh, gct, _bg, pos = _gif_header(buf)
    for left, top, w, h, idx, table, transparent, _disp in _iter_raw_frames(buf, gct, pos):
        rgb = table[idx]
        if (left, top) != (0, 0) or (w, h) != (sw, sh):
            # Frame smaller than / offset within the logical screen
            # (GIF89a image descriptor left/top): composite onto the
            # screen — background color under the frame, alpha 0
            # outside it (and at the transparent index inside it).
            canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
            if gct is not None and _bg < len(gct):
                canvas[:] = gct[_bg]
            alpha = np.zeros((sh, sw), dtype=np.uint8)
            y1, x1 = min(top + h, sh), min(left + w, sw)
            fh, fw = y1 - top, x1 - left
            if fh > 0 and fw > 0:
                canvas[top:y1, left:x1] = rgb[:fh, :fw]
                fa = np.full((fh, fw), 255, dtype=np.uint8)
                if transparent is not None:
                    fa[idx[:fh, :fw] == transparent] = 0
                alpha[top:y1, left:x1] = fa
            return sh, sw, 4, np.dstack([canvas, alpha])
        if transparent is not None:
            alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
            return h, w, 4, np.dstack([rgb, alpha])
        return h, w, 3, rgb
    raise ValueError("GIF contains no image descriptor")


def decode_gif_frames(buf: bytes, max_frames: int | None = None):
    """Decode an animated GIF into composited RGBA frames on the logical
    screen, honoring GIF89a disposal methods: 0/1 leave, 2 restore
    background (transparent per the modern-decoder convention), 3 restore
    previous.  Returns (screen_h, screen_w, [frame RGBA uint8 arrays])."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF87a/89a signature)")
    try:
        sw, sh, gct, _bg, pos = _gif_header(buf)
        canvas = np.zeros((sh, sw, 4), dtype=np.uint8)  # transparent screen
        frames: list[np.ndarray] = []
        for left, top, w, h, idx, table, transparent, disposal in _iter_raw_frames(
            buf, gct, pos
        ):
            y1, x1 = min(top + h, sh), min(left + w, sw)
            fh, fw = y1 - top, x1 - left
            saved = canvas[top:y1, left:x1].copy() if disposal == 3 else None
            if fh > 0 and fw > 0:
                region = idx[:fh, :fw]
                rgba = np.dstack(
                    [table[region], np.full((fh, fw), 255, dtype=np.uint8)]
                )
                if transparent is not None:
                    keep = region == transparent  # hold the prior pixel
                    rgba[keep] = canvas[top:y1, left:x1][keep]
                canvas[top:y1, left:x1] = rgba
            frames.append(canvas.copy())
            if max_frames is not None and len(frames) >= max_frames:
                break
            if disposal == 2 and fh > 0 and fw > 0:  # restore background
                canvas[top:y1, left:x1] = 0
            elif disposal == 3 and saved is not None:  # restore previous
                canvas[top:y1, left:x1] = saved
        if not frames:
            raise ValueError("GIF contains no image descriptor")
        return sh, sw, frames
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or malformed GIF: {e}") from e


def encode_gif_animation(
    frames: list[np.ndarray],
    palette: np.ndarray,
    transparent: int | None = None,
    disposal: int = 1,
    delay_cs: int = 4,
) -> bytes:
    """Encode palette-index frames (each (h, w), same size, at origin) as an
    animated GIF89a with a NETSCAPE2.0 loop block and one GCE per frame."""
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = np.asarray(frames[0]).shape
    bits = max(2, int(len(palette) - 1).bit_length())
    n = 1 << bits
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    # NETSCAPE2.0 application extension: loop forever
    out += bytes([0x21, 0xFF, 11]) + b"NETSCAPE2.0" + bytes([3, 1, 0, 0, 0])
    for frame in frames:
        idx = np.asarray(frame, dtype=np.uint8)
        flags = (disposal & 0x07) << 2
        tr = 0
        if transparent is not None:
            flags |= 0x01
            tr = transparent
        out += bytes([0x21, 0xF9, 4, flags]) + struct.pack("<H", delay_cs) + bytes([tr, 0])
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        min_code = max(2, bits)
        out += bytes([min_code])
        z = _lzw_encode(idx.tobytes(), min_code)
        for i in range(0, len(z), 255):
            chunk = z[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)


def encode_gif(
    idx: np.ndarray, palette: np.ndarray, interlace: bool = False,
    transparent: int | None = None,
) -> bytes:
    """Encode palette indices (h, w) + palette (n, 3) as a single-frame
    GIF89a."""
    idx = np.asarray(idx, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    bits = max(2, int(len(palette) - 1).bit_length())
    n = 1 << bits
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    rows = idx
    if interlace:
        parts = [idx[start::step] for start, step in _INTERLACE]
        rows = np.vstack([p for p in parts if p.size])
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    min_code = max(2, bits)
    out += bytes([min_code])
    z = _lzw_encode(rows.tobytes(), min_code)
    for i in range(0, len(z), 255):
        chunk = z[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)
