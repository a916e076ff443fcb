"""WebP-lossless / VP8L codec (operators/vp8l.py): literal roundtrips via
the fixture encoder, plus hand-built bitstreams that pin the decoder's
LZ77, color-cache, transform and meta-prefix behavior to the spec."""

from __future__ import annotations

import numpy as np
import pytest

from native_sql_engine_spark.operators.vp8l import (
    _BitWriter,
    _cache_key,
    decode_vp8l,
    decode_webp,
    encode_vp8l,
)


@pytest.mark.parametrize("shape", [(1, 1, 3), (5, 7, 3), (16, 16, 4), (33, 9, 4)])
def test_literal_roundtrip(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, size=shape).astype(np.uint8)
    h, w, out = decode_webp(encode_vp8l(img))
    assert (h, w) == shape[:2]
    want = (
        img
        if shape[2] == 4
        else np.concatenate([img, np.full(shape[:2] + (1,), 255, np.uint8)], axis=2)
    )
    assert (out == want).all()


def test_constant_and_binary_images():
    img = np.full((10, 10, 3), 77, np.uint8)
    _, _, out = decode_webp(encode_vp8l(img))
    assert (out[:, :, :3] == 77).all() and (out[:, :, 3] == 255).all()
    img = (np.random.default_rng(1).integers(0, 2, size=(12, 12, 3)) * 200).astype(np.uint8)
    _, _, out = decode_webp(encode_vp8l(img))
    assert (out[:, :, :3] == img).all()


# -- hand-built streams --------------------------------------------------------


def _header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1, 1)  # alpha hint
    bw.write(0, 3)  # version


def _simple1(bw, sym):
    """Single-symbol simple prefix code (8-bit symbol)."""
    bw.write(1, 1)
    bw.write(0, 1)
    bw.write(1, 1)
    bw.write(sym, 8)


def _simple2(bw, s0, s1):
    """Two-symbol simple prefix code, both 8-bit; bit0 -> s0, bit1 -> s1."""
    bw.write(1, 1)
    bw.write(1, 1)
    bw.write(1, 1)
    bw.write(s0, 8)
    bw.write(s1, 8)


def test_lz77_backward_reference():
    """4x1 image: one literal then a length-3 distance-1 copy.  Green
    alphabet symbol 258 = length prefix 2 = length 3; distance prefix 1 =
    plane code 2 = (dx=1, dy=0) = distance 1."""
    bw = _BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    # green code over {40, 258}: code-length code with two 1-length symbols.
    # Build via a normal code: clc lengths such that lengths 0 and 1 exist.
    # Simpler: simple code cannot carry 258, so use the encoder helper.
    from native_sql_engine_spark.operators.vp8l import _write_code_lengths

    full = [0] * 280
    full[40] = 1
    full[258] = 1
    bw.write(0, 1)  # normal code
    _write_code_lengths(bw, full)
    for sym in (60, 70, 255):  # red, blue, alpha single-symbol codes
        _simple1(bw, sym)
    _simple1(bw, 1)  # distance code: always prefix sym 1 -> plane code 2
    # pixel stream: literal green=40 (canonical: 40 -> bit 0, 258 -> bit 1)
    bw.write(0, 1)  # green 40
    # red/blue/alpha codes are single-symbol: zero bits each
    bw.write(1, 1)  # green 258 -> length 3
    # distance code single-symbol: zero bits; plane code 2 -> distance 1
    data = bw.flush()
    h, w, out = decode_vp8l(data)
    assert (h, w) == (1, 4)
    assert (out == np.array([[60, 40, 70, 255]] * 4, np.uint8).reshape(1, 4, 4)).all()


def test_color_cache_hit():
    """3x1 image: literal, cache hit of that pixel, then a different literal."""
    cache_bits = 4
    argb = (255 << 24) | (10 << 16) | (20 << 8) | 30  # a=255 r=10 g=20 b=30
    key = _cache_key(255, 10, 20, 30, cache_bits)
    bw = _BitWriter()
    _header(bw, 3, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta prefix
    from native_sql_engine_spark.operators.vp8l import _write_code_lengths

    g_lit, g_cache, g_lit2 = 20, 256 + 24 + key, 21
    full = [0] * (256 + 24 + (1 << cache_bits))
    full[g_lit] = 1
    full[g_cache] = 2
    full[g_lit2] = 2
    bw.write(0, 1)
    _write_code_lengths(bw, full)
    _simple2(bw, 10, 11)  # red: bit0->10, bit1->11
    _simple2(bw, 30, 31)  # blue
    _simple1(bw, 255)  # alpha
    _simple1(bw, 0)  # distance (unused)
    # canonical green codes: len1 {20:0}, len2 {smaller sym first}
    lit2_first = g_lit2 < g_cache
    # write: literal(20,10,30,255), cache(key), literal(21,11,31,255)
    bw.write(0, 1)  # green 20 (len-1 code 0)
    bw.write(0, 1)  # red 10
    bw.write(0, 1)  # blue 30
    # alpha zero bits
    # cache symbol: len-2 canonical codes are 10 and 11 (MSB-first), written
    # LSB-first reversed: sym order by (len, sym): [g_lit2=21, g_cache]
    code_for = {21: 0b10, g_cache: 0b11}  # MSB-first canonical
    c = code_for[g_cache]
    bw.write(int(f"{c:02b}"[::-1], 2), 2)
    c = code_for[21]
    bw.write(int(f"{c:02b}"[::-1], 2), 2)
    bw.write(1, 1)  # red 11
    bw.write(1, 1)  # blue 31
    data = bw.flush()
    h, w, out = decode_vp8l(data)
    assert (out[0, 0] == (10, 20, 30, 255)).all()
    assert (out[0, 1] == (10, 20, 30, 255)).all()  # the cache hit
    assert (out[0, 2] == (11, 21, 31, 255)).all()


def test_subtract_green_transform():
    """1x1: residual (r=5, g=100, b=7) decodes to r=105, b=107."""
    bw = _BitWriter()
    _header(bw, 1, 1)
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    _simple1(bw, 100)  # green
    _simple1(bw, 5)  # red
    _simple1(bw, 7)  # blue
    _simple1(bw, 255)  # alpha
    _simple1(bw, 0)  # distance
    h, w, out = decode_vp8l(bw.flush())
    assert (out[0, 0] == (105, 100, 107, 255)).all()


def test_predictor_transform_mode_L():
    """4x2, predictor tile mode 1 (L) with all-zero residuals: row 0 spreads
    the origin's black-prediction (A=255) everywhere; later rows copy via
    forced border modes and the tile mode."""
    bw = _BitWriter()
    _header(bw, 4, 2)
    bw.write(1, 1)
    bw.write(0, 2)  # PREDICTOR
    bw.write(2, 3)  # size_bits-2=2 -> bits=4 -> one 16px tile
    # tile image 1x1: green channel holds the mode (1 = L)
    bw.write(0, 1)  # tile image: no cache
    _simple1(bw, 1)  # green = mode 1
    _simple1(bw, 0)
    _simple1(bw, 0)
    _simple1(bw, 0)
    _simple1(bw, 0)
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # residual for EVERY pixel: (a=255, r=0, g=0, b=0)
    for sym in (0, 0, 0, 255):  # green, red, blue, alpha codes
        _simple1(bw, sym)
    _simple1(bw, 0)  # distance (unused)
    # every pixel emits zero bits (all single-symbol codes)
    h, w, out = decode_vp8l(bw.flush())
    # origin: black prediction (a=255) + residual a=255 -> a = 254
    # row 0 then walks L (forced border mode), adding 255 (= -1) each step;
    # row 1 col 0 walks T; remaining pixels use the tile's mode 1 (L).
    assert (out[:, :, :3] == 0).all()
    assert list(out[0, :, 3]) == [254, 253, 252, 251]
    assert list(out[1, :, 3]) == [253, 252, 251, 250]


def test_color_indexing_transform():
    """6x1 with a 3-color palette (2-bit packed, 4 px per green byte)."""
    bw = _BitWriter()
    _header(bw, 6, 1)
    bw.write(1, 1)
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(2, 8)  # 3 colors
    # palette image 3x1, DELTA-coded: entries e0, e0+d1, e0+d1+d2
    # choose colors c0=(255,10,20,30) c1=(255,40,60,80) c2=(255,90,120,150)
    # deltas: d0=c0, d1=(0,30,40,50), d2=(0,50,60,70)
    bw.write(0, 1)  # palette image: no cache
    from native_sql_engine_spark.operators.vp8l import _write_code_lengths

    # greens: 20, 40, 60 -> three symbols; reds 10,30,50; blues 30,50,70;
    # alphas 255, 0, 0
    def code3(vals, n_sym):
        full = [0] * n_sym
        # 3 symbols: lengths 1,2,2 make a complete code
        s = sorted(set(vals))
        assert len(s) == 3
        full[s[0]] = 1
        full[s[1]] = 2
        full[s[2]] = 2
        bw.write(0, 1)
        _write_code_lengths(bw, full)
        # canonical: s0 -> 0 (1 bit); s1 -> 10, s2 -> 11 (MSB), LSB-reversed
        return {s[0]: (0, 1), s[1]: (0b01, 2), s[2]: (0b11, 2)}

    # stream order per pixel: green (280-symbol alphabet), red, blue (256)
    greens = code3([20, 40, 60], 280)
    reds = code3([10, 30, 50], 256)
    blues = code3([30, 50, 70], 256)
    _simple2(bw, 255, 0)  # alpha: bit0 -> 255, bit1 -> 0
    _simple1(bw, 0)  # distance
    pal_pixels = [(255, 10, 20, 30), (0, 30, 40, 50), (0, 50, 60, 70)]
    for i, (a, r, g, b) in enumerate(pal_pixels):
        c, n = greens[g]
        bw.write(c, n)
        c, n = reds[r]
        bw.write(c, n)
        c, n = blues[b]
        bw.write(c, n)
        bw.write(0 if a == 255 else 1, 1)
    # packed main image: ceil(6/4)=2 green bytes; indices 0,1,2,1 | 0,2
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    b0 = 0 | (1 << 2) | (2 << 4) | (1 << 6)
    b1 = 0 | (2 << 2)
    _simple2(bw, b0, b1)  # green carries packed indices
    _simple1(bw, 0)  # red
    _simple1(bw, 0)  # blue
    _simple1(bw, 255)  # alpha
    _simple1(bw, 0)  # distance
    bw.write(0, 1)  # first packed byte
    bw.write(1, 1)  # second packed byte
    h, w, out = decode_vp8l(bw.flush())
    assert (h, w) == (1, 6)
    colors = [(10, 20, 30, 255), (40, 60, 80, 255), (90, 120, 150, 255)]
    want = [colors[i] for i in (0, 1, 2, 1, 0, 2)]
    assert [tuple(p) for p in out[0]] == want


def test_meta_prefix_single_group():
    """Meta-prefix path with a 1x1 entropy image selecting group 0."""
    bw = _BitWriter()
    _header(bw, 4, 4)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta prefix present
    bw.write(0, 3)  # huff_bits-2=0 -> bits=2 -> 1x1 entropy image for 4x4
    bw.write(0, 1)  # entropy image: no cache
    _simple1(bw, 0)  # green = meta code low byte 0
    _simple1(bw, 0)  # red = high byte 0
    _simple1(bw, 0)
    _simple1(bw, 0)
    _simple1(bw, 0)
    # one group
    for sym in (9, 8, 7, 255):
        _simple1(bw, sym)
    _simple1(bw, 0)
    h, w, out = decode_vp8l(bw.flush())
    assert (out == np.array([8, 9, 7, 255], np.uint8)).all()


def test_distance_neighborhood_table_invariants():
    """The 120-entry (dx, dy) plane-code table is transcribed from the
    spec; pin the structural invariants so a transcription slip is at
    least locally detectable: 120 unique entries, every one pointing to
    an already-decoded pixel (dy>0, or dy==0 with dx>0), coordinates in
    the spec's 17x9 window, and plane distances positive for any width."""
    from native_sql_engine_spark.operators.vp8l import _DIST_CODES, _plane_distance

    assert len(_DIST_CODES) == 120
    assert len(set(_DIST_CODES)) == 120
    for dx, dy in _DIST_CODES:
        assert 0 <= dy <= 8 and -8 <= dx <= 8
        assert dy > 0 or dx > 0
    for code in range(1, 130):
        assert _plane_distance(code, 64) >= 1


def test_webp_container_and_gates():
    img = np.full((3, 3, 3), 5, np.uint8)
    buf = encode_vp8l(img)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WEBP"
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        decode_webp(b"RIFF\x00\x00\x00\x00WAVE")
    lossy = buf[:12] + b"VP8 " + buf[16:]
    with pytest.raises(NotImplementedError, match="VP8L is implemented"):
        decode_webp(lossy)
    with pytest.raises(ValueError, match="signature"):
        decode_vp8l(b"\x00\x01\x02")
    with pytest.raises(ValueError, match="truncated"):
        decode_vp8l(bytes(buf[20:26]))


def test_decode_image_dispatch_webp(spark):
    import pandas as pd

    from native_sql_engine_spark.operators import multimodal as M

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [bytearray(encode_vp8l(img))]})
    )
    (r,) = M.decode_image(df, "payload", "doc_id").collect()
    assert (r.width, r.height, r.channels) == (4, 4, 4)
    px = np.frombuffer(bytes(r.pixels), np.uint8).reshape(4, 4, 4)
    assert (px[:, :, :3] == img).all() and (px[:, :, 3] == 255).all()


def test_inv_predictor_vectorized_matches_scalar():
    """Differential check of the vectorized inverse predictor against the
    per-pixel reference (forced border modes + all 14 tile modes), over
    random residuals and awkward sizes (ragged right tile, w=1, h=1)."""
    import numpy as np

    from native_sql_engine_spark.operators.vp8l import _inv_predictor, _predict

    def scalar_ref(argb, tile_modes, bits):
        h, w = argb.shape[:2]
        out = argb.astype(np.uint8, copy=True)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    mode = 0
                elif y == 0:
                    mode = 1
                elif x == 0:
                    mode = 2
                else:
                    mode = int(tile_modes[y >> bits, x >> bits])
                pred = _predict(mode, out, x, y)
                out[y, x] = (out[y, x].astype(np.int32) + pred.astype(np.int32)) & 0xFF
        return out

    rng = np.random.default_rng(7)
    for h, w, bits in ((13, 21, 2), (8, 8, 3), (1, 9, 2), (9, 1, 2), (4, 4, 2), (16, 30, 4)):
        th = (h + (1 << bits) - 1) >> bits
        tw = (w + (1 << bits) - 1) >> bits
        res = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
        # sweep every mode deterministically across tiles, then a random grid
        for modes in (
            np.arange(th * tw, dtype=np.int64).reshape(th, tw) % 14,
            rng.integers(0, 14, size=(th, tw)),
        ):
            got = _inv_predictor(res, modes, bits)
            want = scalar_ref(res, modes, bits)
            assert np.array_equal(got, want), (h, w, bits)
