"""GIF codec (operators/gif.py): LZW round trips, interlace, transparency,
dictionary-growth and reset paths."""

from __future__ import annotations

import numpy as np
import pytest

from native_sql_engine_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _pal(n, seed=1):
    return np.random.default_rng(seed).integers(0, 256, size=(n, 3), dtype=np.uint8)


def test_lzw_roundtrip_small_and_kwkwk():
    # the KwKwK corner: repeated symbol runs force code == next_code
    data = b"\x00\x00\x00\x01\x01\x01\x01\x02" * 10
    enc = _lzw_encode(data, 2)
    assert _lzw_decode(enc, 2, len(data)) == data


def test_lzw_dictionary_growth_and_reset():
    rng = np.random.default_rng(3)
    data = bytes(rng.integers(0, 4, size=20000, dtype=np.uint8))  # grows past 12 bits
    enc = _lzw_encode(data, 2)
    assert _lzw_decode(enc, 2, len(data)) == data


def test_gif_roundtrip_rgb():
    rng = np.random.default_rng(7)
    pal = _pal(16)
    idx = rng.integers(0, 16, size=(13, 21), dtype=np.uint8)
    h, w, c, out = decode_gif(encode_gif(idx, pal))
    assert (h, w, c) == (13, 21, 3)
    assert np.array_equal(out, pal[idx])


def test_gif_interlaced_roundtrip():
    rng = np.random.default_rng(9)
    pal = _pal(8)
    idx = rng.integers(0, 8, size=(11, 5), dtype=np.uint8)
    h, w, c, out = decode_gif(encode_gif(idx, pal, interlace=True))
    assert np.array_equal(out, pal[idx])


def test_gif_transparency_rgba():
    pal = _pal(4)
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    h, w, c, out = decode_gif(encode_gif(idx, pal, transparent=2))
    assert c == 4
    assert out[1, 0, 3] == 0 and out[0, 0, 3] == 255
    assert np.array_equal(out[..., :3], pal[idx])


def test_gif_errors():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF")
    pal = _pal(4)
    buf = bytearray(encode_gif(np.zeros((2, 2), dtype=np.uint8), pal))
    trailer = buf.rindex(0x3B)
    with pytest.raises(ValueError):
        decode_gif(bytes(buf[: trailer - 4]))  # truncated mid-stream


def test_decode_image_dispatches_gif(spark):
    from native_sql_engine_spark.operators import multimodal as M

    pal = _pal(4, seed=5)
    idx = np.array([[0, 1, 2, 3]] * 4, dtype=np.uint8)
    payload = encode_gif(idx, pal)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    row = M.image_stats(M.decode_image(df, "payload", "doc_id")).first()
    assert (row.width, row.height) == (4, 4)
    assert abs(row.mean_px - round(float(pal[idx].mean()), 4)) < 1e-9


def test_gif_offset_frame_composited_onto_screen():
    """An image descriptor with left/top offsets (or a frame smaller than
    the logical screen) must composite onto the screen — background color
    under the frame, alpha 0 outside it — instead of silently returning the
    frame-local array (r5 ADVICE)."""
    import struct

    pal = _pal(4, seed=9)
    idx = np.array([[1, 2], [3, 1]], dtype=np.uint8)
    buf = bytearray(encode_gif(idx, pal))
    struct.pack_into("<HH", buf, 6, 7, 5)  # logical screen 7x5
    sig = struct.pack("<BHHHH", 0x2C, 0, 0, 2, 2)
    p = buf.index(sig)
    struct.pack_into("<HH", buf, p + 1, 3, 2)  # frame at left=3, top=2
    h, w, c, px = decode_gif(bytes(buf))
    assert (h, w, c) == (5, 7, 4)
    assert (px[2:4, 3:5, :3] == pal[idx]).all()          # frame pixels
    assert (px[2:4, 3:5, 3] == 255).all()                # opaque inside
    assert (px[:2, :, 3] == 0).all() and (px[:, :3, 3] == 0).all()  # alpha 0 outside
    assert (px[0, 0, :3] == pal[0]).all()                # bg color under canvas


def test_gif_gce_missing_terminator_raises_valueerror():
    """A corrupt GCE terminator must raise ValueError (positioned-error
    contract), not AssertionError — and not pass silently under python -O."""
    pal = _pal(4)
    buf = bytearray(encode_gif(np.zeros((2, 2), dtype=np.uint8), pal, transparent=1))
    gce = buf.index(bytes([0x21, 0xF9, 4]))
    assert buf[gce + 7] == 0
    buf[gce + 7] = 0xAA  # clobber the terminator
    with pytest.raises(ValueError, match="terminator"):
        decode_gif(bytes(buf))


def test_gif_animation_frames_and_disposal():
    """Multi-frame decode composites through the disposal machinery: method
    1 leaves the canvas, 2 restores (transparent) background, 3 restores
    the previous canvas; transparent pixels hold the prior frame's color."""
    from native_sql_engine_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    pal = _pal(16, seed=3)
    frames = [((f + np.arange(16)) % 16).astype(np.uint8).reshape(4, 4) for f in range(5)]
    sh, sw, out = decode_gif_frames(encode_gif_animation(frames, pal))
    assert (sh, sw, len(out)) == (4, 4, 5)
    for f, fr in enumerate(out):
        assert (fr[:, :, :3] == pal[frames[f]]).all()
        assert (fr[:, :, 3] == 255).all()
    _, _, two = decode_gif_frames(encode_gif_animation(frames, pal), max_frames=2)
    assert len(two) == 2

    # transparency holds the prior pixel; disposal 2 clears to background
    f0 = np.full((4, 4), 5, dtype=np.uint8)
    f1 = np.zeros((4, 4), dtype=np.uint8)
    f1[0, 0] = 7  # one opaque pixel, rest transparent
    buf = encode_gif_animation([f0, f1], pal, transparent=0, disposal=1)
    _, _, outs = decode_gif_frames(buf)
    assert (outs[1][0, 0, :3] == pal[7]).all()
    assert (outs[1][1:, :, :3] == pal[5]).all()  # held through transparency
    buf2 = encode_gif_animation([f0, f1], pal, transparent=0, disposal=2)
    _, _, outs2 = decode_gif_frames(buf2)
    assert (outs2[1][1:, :, 3] == 0).all()  # bg restored → transparent


def test_sample_frames_dispatches_gif(spark):
    from native_sql_engine_spark.operators import multimodal as M

    ids = spark.createDataFrame([(3,)], ["doc_id"])
    payloads = M.synthesize_gif_animation_corpus(ids, "doc_id", width=4, height=4, n_frames=6)
    rows = (
        M.sample_frames(payloads, every_n=2, payload_col="payload", id_col="doc_id")
        .orderBy("frame_idx")
        .collect()
    )
    assert [r.frame_idx for r in rows] == [0, 2, 4]
    for r in rows:
        p = (3 + r.frame_idx + np.arange(16)) % 16
        lum = (77 * (p * 3 % 256) + 150 * (p * 7 % 256) + 29 * (p * 11 % 256)) // 256
        assert bytes(r.luma) == bytes(lum.astype(np.uint8).tolist())
