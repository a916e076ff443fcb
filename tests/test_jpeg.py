"""From-scratch baseline JPEG codec (operators/jpeg.py): round-trip,
exactness, format-surface and gating tests.  Pure numpy — no Spark needed
except the battery-entry check."""

from __future__ import annotations

import numpy as np
import pytest

from native_sql_engine_spark.operators.jpeg import (
    FLAT_Q,
    ZIGZAG,
    decode_jpeg,
    encode_gray,
    encode_ycbcr420,
)


def _block_image(vals: list[int], blocks: int = 2) -> np.ndarray:
    side = blocks * 8
    img = np.zeros((side, side), dtype=np.uint8)
    for b, v in enumerate(vals):
        by, bx = divmod(b, blocks)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    return img


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec anchors: first diagonal and the tail
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[-1] == 63


def test_constant_blocks_roundtrip_exactly():
    """DC step 8 divides 8·(v−128) for every v, ACs of constant blocks are
    zero — the decode must be bit-exact, including the DC predictor chain
    across blocks (values chosen to exercise positive AND negative diffs)."""
    img = _block_image([0, 255, 7, 200])
    h, w, c, out = decode_jpeg(encode_gray(img))
    assert (h, w, c) == (16, 16, 1)
    assert np.array_equal(out, img)


def test_random_gray_roundtrip_within_quant_error():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    q = FLAT_Q.copy()
    q[1:] = 2
    h, w, c, out = decode_jpeg(encode_gray(img, q))
    assert (h, w, c) == (24, 40, 1)
    # error bound: |Δcoef| ≤ q/2 per coefficient; empirically ≤ 2 at q=2
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_odd_dimensions_pad_and_crop():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    q = FLAT_Q.copy()
    q[1:] = 2
    h, w, c, out = decode_jpeg(encode_gray(img, q))
    assert out.shape == (13, 21)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_color_420_constant_exact():
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 200, 100, 50
    h, w, c, out = decode_jpeg(encode_ycbcr420(img))
    assert (h, w, c) == (16, 16, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1  # color rounding


def test_color_420_random_luma():
    """Gray-valued RGB exercises the full 4:2:0 MCU interleave (4 Y + Cb +
    Cr per MCU) with non-trivial luma while chroma stays flat."""
    rng = np.random.default_rng(11)
    base = rng.integers(60, 196, size=(32, 48, 1), dtype=np.uint8)
    img = np.repeat(base, 3, axis=2)
    q = FLAT_Q.copy()
    q[1:] = 2
    h, w, c, out = decode_jpeg(encode_ycbcr420(img, q))
    assert (h, w, c) == (32, 48, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6


def test_entropy_stream_has_stuffed_bytes_and_decodes():
    """0xFF bytes inside the entropy stream must be stuffed (FF 00) and the
    reader must unstuff them — cover it by brute-forcing an image whose
    stream contains FF."""
    rng = np.random.default_rng(3)
    for _ in range(20):
        img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
        q = FLAT_Q.copy()
        q[1:] = 2
        buf = encode_gray(img, q)
        body = buf[2:-2]
        if b"\xff\x00" in body:
            _, _, _, out = decode_jpeg(buf)
            assert np.abs(out.astype(int) - img.astype(int)).max() <= 4
            return
    pytest.skip("no stuffed byte produced in 20 seeded images")


def test_color_422_roundtrip():
    """4:2:2 (2×1 luma sampling) completes the sampling-factor matrix the
    decoder supports — constant color exact, gray-valued random bounded."""
    img = np.zeros((16, 32, 3), dtype=np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 30, 140, 250
    h, w, c, out = decode_jpeg(encode_ycbcr420(img, subsample="422"))
    assert (h, w, c) == (16, 32, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
    rng = np.random.default_rng(13)
    base = rng.integers(60, 196, size=(24, 48, 1), dtype=np.uint8)
    img2 = np.repeat(base, 3, axis=2)
    q = FLAT_Q.copy()
    q[1:] = 2
    _, _, _, out2 = decode_jpeg(encode_ycbcr420(img2, q, subsample="422"))
    assert np.abs(out2.astype(int) - img2.astype(int)).max() <= 6


def test_restart_intervals_roundtrip():
    """DRI/RSTn streams (camera JPEGs): byte-aligned markers, DC predictor
    reset at every boundary, wrap-around past RST7 — exact on constant
    blocks, quant-bounded on random."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(16, 80), dtype=np.uint8)  # 20 MCUs
    q = FLAT_Q.copy()
    q[1:] = 2
    for interval in (1, 2, 7):  # interval 1 with 20 MCUs wraps RST0..7 twice
        buf = encode_gray(img, q, restart_interval=interval)
        assert bytes([0xFF, 0xD0]) in buf  # markers actually present
        h, w, c, out = decode_jpeg(buf)
        assert (h, w) == (16, 80)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 4, interval
    # constant blocks stay exact through restarts
    cimg = _block_image([0, 255, 7, 200])
    _, _, _, out2 = decode_jpeg(encode_gray(cimg, restart_interval=1))
    assert np.array_equal(out2, cimg)
    # a corrupted marker is a clear error, not silent garbage
    buf = bytearray(encode_gray(cimg, restart_interval=1))
    i = buf.find(b"\xff\xd0", buf.find(b"\xff\xda"))
    buf[i + 1] = 0xD5  # wrong RST index
    with pytest.raises(ValueError, match="expected RST"):
        decode_jpeg(bytes(buf))


def test_unsupported_variants_rejected():
    img = _block_image([1, 2, 3, 4])
    buf = bytearray(encode_gray(img))
    sof = buf.find(b"\xff\xc0")
    buf[sof + 1] = 0xC3  # rewrite SOF0 → SOF3 (lossless)
    with pytest.raises(NotImplementedError, match="unsupported frame"):
        decode_jpeg(bytes(buf))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n")


def test_progressive_constant_blocks_exact():
    """SOF2 with the full 6-scan script (DC Al=1 → AC bands Al=2 → DC refine
    → AC refine 2→1 → 1→0): constant blocks survive exactly, including
    single-block EOB runs (EOB0) in the refinement scans."""
    from native_sql_engine_spark.operators.jpeg import encode_progressive

    img = _block_image([0, 255, 7, 200])
    buf = encode_progressive(img)
    assert b"\xff\xc2" in buf  # actually SOF2
    assert buf.count(b"\xff\xda") == 6  # six scans
    h, w, c, out = decode_jpeg(buf)
    assert (h, w, c) == (16, 16, 1)
    assert np.array_equal(out, img)


def test_progressive_random_roundtrip_gray_and_color():
    from native_sql_engine_spark.operators.jpeg import encode_progressive

    rng = np.random.default_rng(42)
    q = FLAT_Q.copy()
    q[1:] = 2
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    _, _, _, out = decode_jpeg(encode_progressive(img, q))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4
    cimg = rng.integers(0, 256, size=(17, 19, 3), dtype=np.uint8)  # odd dims
    h, w, c, outc = decode_jpeg(encode_progressive(cimg, q))
    assert (h, w, c) == (17, 19, 3)
    assert np.abs(outc.astype(int) - cimg.astype(int)).max() <= 8


def test_progressive_sparse_exercises_zrl_and_long_runs():
    """A mostly-flat image with isolated hot pixels drives long zero runs
    (ZRL) and deep-band coefficients through the refinement path."""
    from native_sql_engine_spark.operators.jpeg import encode_progressive

    img = np.full((16, 24), 128, dtype=np.uint8)
    img[3, 5] = 255
    img[12, 20] = 0
    img[7, 7] = 17
    q = FLAT_Q.copy()
    q[1:] = 2
    _, _, _, out = decode_jpeg(encode_progressive(img, q))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_progressive_equals_baseline_decode():
    """The progressive and baseline encodings of the same image must decode
    to (near-)identical pixels — same coefficients, different scan order."""
    from native_sql_engine_spark.operators.jpeg import encode_progressive

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    q = FLAT_Q.copy()
    q[1:] = 2
    _, _, _, base = decode_jpeg(encode_gray(img, q))
    _, _, _, prog = decode_jpeg(encode_progressive(img, q))
    assert np.array_equal(base, prog)  # identical quantized coefficients


def test_decode_image_dispatches_jpeg(spark, sf_small):
    """The multimodal decode kernel must route FFD8 payloads through the
    JPEG codec end-to-end (mapInPandas batch shape included)."""
    from pyspark.sql import functions as F

    from native_sql_engine_spark.catalog import load_table
    from native_sql_engine_spark.operators import multimodal as M

    docs = load_table(spark, sf_small, "documents").filter(F.col("doc_id") < 8)
    payloads = M.synthesize_jpeg_corpus(docs, "doc_id", blocks=2)
    stats = M.image_stats(M.decode_image(payloads, "payload", "doc_id"))
    for r in stats.collect():
        expected = sum((r.media_id * 37 + b * 17) % 256 for b in range(4)) / 4
        assert (r.width, r.height) == (16, 16)
        assert abs(r.mean_px - expected) < 1e-9, (r.media_id, r.mean_px, expected)


def test_progressive_420_subsampled_nat_grid():
    """Subsampled progressive (SOF2 4:2:0) with h=w=17 — a dimension
    ≡ 17 mod 16 makes the chroma natural grid ceil(ceil(17/2)/8) = 2
    blocks per side; the r5-ADVICE bug (ceil-of-floor) computed 1 and
    desynced every non-interleaved scan after the first chroma block.
    All scans here are single-component, so DC, AC-first, and both
    refinement passes each iterate the natural sub-grids."""
    from native_sql_engine_spark.operators.jpeg import encode_progressive

    img = np.zeros((17, 17, 3), dtype=np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 200, 100, 50
    h, w, c, out = decode_jpeg(encode_progressive(img, subsample="420"))
    assert (h, w, c) == (17, 17, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1

    # gray-valued random luma (chroma flat) across several odd sizes —
    # full-res Y and half-res chroma grids disagree in every dimension
    rng = np.random.default_rng(7)
    q = FLAT_Q.copy()
    q[1:] = 2
    for hh, ww in ((17, 33), (33, 49), (24, 17)):
        base = rng.integers(60, 196, size=(hh, ww, 1), dtype=np.uint8)
        img2 = np.repeat(base, 3, axis=2)
        h2, w2, c2, out2 = decode_jpeg(encode_progressive(img2, q, subsample="420"))
        assert (h2, w2, c2) == (hh, ww, 3)
        assert np.abs(out2.astype(int) - img2.astype(int)).max() <= 6


def test_exif_orientation_all_eight():
    """Camera JPEGs store the sensor scan order and expect readers to
    rotate per APP1 tag 274 — all 8 orientations, both EXIF byte orders,
    baseline and progressive; dims swap for orientations 5-8; streams
    without EXIF are untouched."""
    from native_sql_engine_spark.operators.jpeg import (
        decode_jpeg,
        encode_gray,
        encode_progressive,
        exif_app1,
    )

    # six DISTINCT constant 8×8 blocks (exact decode under FLAT_Q) with no
    # symmetry — every one of the 8 orientations yields a different array
    img = np.zeros((16, 24), dtype=np.uint8)
    for bi, v in enumerate((16, 48, 80, 112, 160, 208)):
        by, bx = divmod(bi, 3)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    base = encode_gray(img)
    # orientation 7 (transverse) is the ANTI-diagonal flip out[i,j] =
    # img[h-1-j, w-1-i] — spelled longhand here so the test can't share an
    # algebraic mistake with the implementation (rot90(k=-1) mirrored
    # collapses to the plain transpose, the round-6 review catch)
    hh, ww = img.shape
    transverse = np.array([[img[hh - 1 - j, ww - 1 - i] for j in range(hh)] for i in range(ww)])
    expect = {
        1: img, 2: img[:, ::-1], 3: img[::-1, ::-1], 4: img[::-1, :],
        5: img.swapaxes(0, 1), 6: np.rot90(img, k=-1),
        7: transverse, 8: np.rot90(img, k=1),
    }
    assert len({e.tobytes() for e in expect.values()}) == 8  # all distinct
    for o, want in expect.items():
        for be in (False, True):
            buf = base[:2] + exif_app1(o, big_endian=be) + base[2:]
            h, w, c, out = decode_jpeg(buf)
            assert (h, w) == want.shape and (out == want).all(), (o, be)
    prog = encode_progressive(img)
    h, w, _, out = decode_jpeg(prog[:2] + exif_app1(6) + prog[2:])
    assert (h, w) == (24, 16) and (out == np.rot90(img, k=-1)).all()
    h, w, _, out = decode_jpeg(base)
    assert (out == img).all()
