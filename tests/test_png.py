"""PNG codec (operators/png.py): lossless round trips across color types,
filters and Adam7 interlacing.  Pure numpy+zlib — no Spark except the
dispatch test."""

from __future__ import annotations

import numpy as np
import pytest

from native_sql_engine_spark.operators.png import decode_png, encode_png


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize(
    "shape", [(7, 5), (7, 5, 3), (7, 5, 4), (1, 1), (16, 3, 2)]
)
def test_lossless_roundtrip_all_color_types(shape):
    img = _rand(shape, 42)
    h, w, c, out = decode_png(encode_png(img))
    assert (h, w) == img.shape[:2]
    assert c == (1 if img.ndim == 2 else img.shape[2])
    assert np.array_equal(out.reshape(img.shape), img)


def test_up_filter_roundtrip():
    img = _rand((9, 6, 3), 7)
    buf = encode_png(img, filter_type=2)
    _, _, _, out = decode_png(buf)
    assert np.array_equal(out, img)


def test_sub_average_paeth_unfilter():
    """Hand-filter rows with Sub(1)/Average(3)/Paeth(4) and assert the
    decoder reverses them — the encoder only emits 0/2, so these paths need
    a hand-built stream."""
    import struct
    import zlib

    from native_sql_engine_spark.operators.png import _SIG, _chunk

    img = _rand((3, 4, 3), 3)
    flat = img.reshape(3, 12).astype(np.int32)
    raw = bytearray()
    # row 0: Sub — byte x stores v[x] - v[x-ch]
    r0 = flat[0].copy()
    enc0 = [int(r0[x] - (r0[x - 3] if x >= 3 else 0)) & 0xFF for x in range(12)]
    raw += bytes([1]) + bytes(enc0)
    # row 1: Average over (left, up)
    r1, p1 = flat[1], flat[0]
    enc1, recon = [], []
    for x in range(12):
        left = recon[x - 3] if x >= 3 else 0
        enc1.append(int(r1[x] - ((left + int(p1[x])) >> 1)) & 0xFF)
        recon.append(int(r1[x]))
    raw += bytes([3]) + bytes(enc1)
    # row 2: Paeth
    r2, p2 = flat[2], flat[1]
    enc2, recon2 = [], []
    for x in range(12):
        a = recon2[x - 3] if x >= 3 else 0
        c = int(p2[x - 3]) if x >= 3 else 0
        b = int(p2[x])
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        enc2.append(int(r2[x] - pred) & 0xFF)
        recon2.append(int(r2[x]))
    raw += bytes([4]) + bytes(enc2)
    buf = bytearray(_SIG)
    buf += _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 2, 0, 0, 0))
    buf += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    buf += _chunk(b"IEND", b"")
    _, _, _, out = decode_png(bytes(buf))
    assert np.array_equal(out, img)


def test_adam7_interlaced_roundtrip():
    for shape in [(8, 8, 3), (13, 11), (5, 3, 4), (1, 9)]:
        img = _rand(shape, sum(shape))
        h, w, c, out = decode_png(encode_png(img, interlace=True))
        assert np.array_equal(out.reshape(img.shape), img), shape


def test_palette_with_and_without_trns():
    import struct
    import zlib

    from native_sql_engine_spark.operators.png import _SIG, _chunk

    pal = _rand((4, 3), 9)  # 4-entry palette
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    raw = b"".join(bytes([0]) + row.tobytes() for row in idx)
    base = bytearray(_SIG)
    base += _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
    base += _chunk(b"PLTE", pal.tobytes())
    body = _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    h, w, c, out = decode_png(bytes(base) + body)
    assert (h, w, c) == (2, 2, 3)
    assert np.array_equal(out, pal[idx])
    # with tRNS → RGBA
    with_trns = bytearray(base) ; with_trns += _chunk(b"tRNS", bytes([10, 20]))
    h, w, c, out4 = decode_png(bytes(with_trns) + body)
    assert c == 4
    assert out4[0, 0, 3] == 10 and out4[0, 1, 3] == 20
    assert out4[1, 0, 3] == 255  # beyond tRNS length → opaque


def test_multi_idat_streams():
    import struct
    import zlib

    from native_sql_engine_spark.operators.png import _SIG, _chunk

    img = _rand((4, 4, 3), 11)
    raw = b"".join(bytes([0]) + row.tobytes() for row in img.reshape(4, 12))
    z = zlib.compress(raw)
    buf = bytearray(_SIG)
    buf += _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
    buf += _chunk(b"IDAT", z[:7]) + _chunk(b"IDAT", z[7:])  # split stream
    buf += _chunk(b"IEND", b"")
    _, _, _, out = decode_png(bytes(buf))
    assert np.array_equal(out, img)


def test_gates_and_errors():
    img = _rand((4, 4), 1)
    buf = bytearray(encode_png(img))
    # an ILLEGAL depth must fail loudly (all legal depths decode since r6)
    ihdr_off = buf.find(b"IHDR")
    depth_off = ihdr_off + 4 + 8  # type + w + h
    buf2 = bytearray(buf)
    buf2[depth_off] = 3
    with pytest.raises(ValueError, match="bit depth 3"):
        decode_png(bytes(buf2))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\xff\xd8nope")


def test_decode_image_dispatches_png(spark, sf_small):
    from pyspark.sql import functions as F

    from native_sql_engine_spark.catalog import load_table
    from native_sql_engine_spark.operators import multimodal as M

    docs = load_table(spark, sf_small, "documents").filter(F.col("doc_id") < 8)
    payloads = M.synthesize_png_corpus(docs, "doc_id", width=4, height=4)
    stats = M.image_stats(M.decode_image(payloads, "payload", "doc_id"))
    for r in stats.collect():
        expected = sum((r.media_id * 37 + k) % 256 for k in range(48)) / 48
        assert (r.width, r.height) == (4, 4)
        assert abs(r.mean_px - round(expected, 4)) < 1e-9


def test_png_16bit_roundtrip():
    """16-bit PNGs (big-endian sample pairs) ride the same byte-level
    unfilter with a bytes-per-pixel lag — gray/RGB/RGBA, filters 0/2,
    Adam7 — and decode to faithful uint16."""
    rng = np.random.default_rng(4)
    for ch in (1, 3, 4):
        shape = (13, 21) if ch == 1 else (13, 21, ch)
        img = rng.integers(0, 65536, size=shape, dtype=np.uint16)
        for ft in (0, 2):
            h, w, c, out = decode_png(encode_png(img, filter_type=ft))
            assert out.dtype == np.uint16
            assert (out.reshape(img.shape) == img).all(), (ch, ft)
        h, w, c, out = decode_png(encode_png(img, interlace=True))
        assert (out.reshape(img.shape) == img).all(), (ch, "adam7")


def test_png_16bit_dispatch_downconverts(spark):
    """decode_image's tensor contract is uint8 — the 16-bit path emits the
    high byte, so image_stats means match the >>8 closed form."""
    from native_sql_engine_spark.operators import multimodal as M

    img = (np.arange(16, dtype=np.uint16).reshape(4, 4) * 4096 + 255)
    payload = encode_png(np.stack([img] * 3, axis=-1))
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    row = M.image_stats(M.decode_image(df, "payload", "doc_id")).first()
    expect = round(float(np.mean(img >> 8)), 4)
    assert (row.width, row.height) == (4, 4)
    assert abs(row.mean_px - expect) < 1e-9


def test_png_sub_byte_depths_roundtrip():
    """1/2/4-bit grayscale (real-world scanned-document depths): packed
    samples unpack MSB-first, rows pad to byte boundaries, filters lag one
    byte; decoded gray scales to the full 8-bit range (255/85/17)."""
    rng = np.random.default_rng(8)
    for d in (1, 2, 4):
        img = rng.integers(0, 1 << d, size=(13, 21), dtype=np.uint8)
        scale = 255 // ((1 << d) - 1)
        for ft in (0, 2):
            h, w, c, out = decode_png(encode_png(img, filter_type=ft, depth=d))
            assert (h, w, c) == (13, 21, 1)
            assert (out == img * scale).all(), (d, ft)
        h, w, c, out = decode_png(encode_png(img, interlace=True, depth=d))
        assert (out == img * scale).all(), (d, "adam7")


def test_png_sub_byte_palette():
    """2-bit palette indices (legal PNG: palette is 1/2/4/8-bit indexed) —
    hand-built stream, indices expand through PLTE."""
    import struct as _s
    import zlib as _z

    from native_sql_engine_spark.operators.png import _SIG, _chunk

    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 2, 2]], dtype=np.uint8)
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8)
    bits = ((idx[:, :, None] >> np.arange(1, -1, -1)) & 1).astype(np.uint8).reshape(3, -1)
    rows = np.packbits(bits, axis=1)
    raw = b"".join(bytes([0]) + rows[y].tobytes() for y in range(3))
    buf = bytearray(_SIG)
    buf += _chunk(b"IHDR", _s.pack(">IIBBBBB", 4, 3, 2, 3, 0, 0, 0))
    buf += _chunk(b"PLTE", plte.tobytes())
    buf += _chunk(b"IDAT", _z.compress(raw))
    buf += _chunk(b"IEND", b"")
    h, w, c, out = decode_png(bytes(buf))
    assert (h, w, c) == (3, 4, 3)
    assert (out == plte[idx]).all()
