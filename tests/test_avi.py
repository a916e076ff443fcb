"""AVI/MJPEG codec (operators/avi.py): RIFF chunk walk, word alignment,
full per-frame JPEG decode, honest gates for non-MJPG codecs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from native_sql_engine_spark.operators.avi import (
    build_avi_mjpeg,
    decode_avi_frames,
    parse_avi,
)
from native_sql_engine_spark.operators.jpeg import encode_gray


def _const_block_frame(seed: int, f: int) -> tuple[np.ndarray, bytes]:
    img = np.zeros((16, 16), dtype=np.uint8)
    for b in range(4):
        by, bx = divmod(b, 2)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (seed * 37 + f * 29 + b * 17) % 256
    return img, encode_gray(img)


def test_mjpeg_roundtrip_exact():
    imgs, frames = zip(*(_const_block_frame(3, f) for f in range(6)))
    buf = build_avi_mjpeg(list(frames), 16, 16, fps=25)
    meta, arrs = decode_avi_frames(buf)
    assert (meta["width"], meta["height"], meta["fps"]) == (16, 16, 25)
    assert meta["codec"] == "MJPG" and meta["n_frames"] == 6
    for img, arr in zip(imgs, arrs):
        assert (arr == img).all()  # constant blocks round-trip exactly


def test_word_alignment_odd_frame_sizes():
    """JPEG payloads are often odd-length; the RIFF pad byte must not
    desync the chunk walk."""
    frames = [encode_gray(np.full((8, 8), v, dtype=np.uint8)) for v in (0, 7, 200)]
    buf = build_avi_mjpeg(frames, 8, 8, fps=10)
    meta, arrs = decode_avi_frames(buf)
    assert meta["n_frames"] == 3
    for v, arr in zip((0, 7, 200), arrs):
        assert (arr == v).all()


def test_parse_avi_errors_and_codec_gate():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    good = build_avi_mjpeg([encode_gray(np.zeros((8, 8), np.uint8))], 8, 8)
    bad = good[:12] + b"LIST" + struct.pack("<I", 10**6) + b"movi"
    with pytest.raises(ValueError, match="overruns"):
        parse_avi(bad)
    h264 = bytearray(good)
    i = h264.find(b"MJPG")  # strh fccHandler
    h264[i : i + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="bitstream"):
        decode_avi_frames(bytes(h264))


def test_decode_video_operator_and_video_meta_avi_branch(spark):
    from native_sql_engine_spark.operators import multimodal as M

    ids = spark.createDataFrame([(2,), (5,)], ["doc_id"])
    payloads = M.synthesize_avi_corpus(ids, "doc_id", n_frames=3)
    rows = (
        M.decode_video(payloads, "payload", "doc_id")
        .orderBy("media_id", "frame_idx")
        .collect()
    )
    assert len(rows) == 6
    for r in rows:
        want = np.mean([(r.media_id * 37 + r.frame_idx * 29 + b * 17) % 256 for b in range(4)])
        assert (r.width, r.height) == (16, 16)
        assert abs(r.mean_luma - want) < 1e-6

    meta = M.video_meta(payloads, "payload", "doc_id").orderBy("media_id").collect()
    for m in meta:
        assert m.container == "avi" and m.codec == "MJPG"
        assert m.n_frames == 3 and m.duration_ms == 3 * 1000 // 25


def test_interleaved_rec_groups():
    """Standard interleaved AVIs nest frames inside 'LIST rec ' groups in
    movi; the parser must recurse into them (ADVICE r6)."""
    from native_sql_engine_spark.operators.avi import _chunk, _list

    imgs, frames = zip(*(_const_block_frame(9, f) for f in range(4)))
    flat = build_avi_mjpeg(list(frames), 16, 16, fps=25)

    # rebuild the same container but with each frame wrapped in a rec group
    rec_chunks = b"".join(_list(b"rec ", _chunk(b"00dc", f)) for f in frames)
    movi_flat = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    movi_rec = _list(b"movi", rec_chunks)
    assert movi_flat in flat
    nested = flat.replace(movi_flat, movi_rec)
    nested = nested[:4] + struct.pack("<I", len(nested) - 8) + nested[8:]

    meta, arrs = decode_avi_frames(nested)
    assert meta["n_frames"] == 4 and meta["codec"] == "MJPG"
    for img, arr in zip(imgs, arrs):
        assert np.array_equal(arr, img)
