"""ISO BMFF container parsing (operators/mp4.py) + the video_meta
dispatch operator: box-tree walk, 16.16 fixed-point dimensions,
largesize/size-0 boxes, malformed-payload errors."""

from __future__ import annotations

import struct

import pytest

from native_sql_engine_spark.operators.mp4 import build_mp4, iter_boxes, parse_mp4_meta


def test_parse_roundtrip_fields():
    buf = build_mp4(640, 360, 90, fps=30, timescale=3000, brand=b"mp42", codec=b"hvc1")
    m = parse_mp4_meta(buf)
    assert m["brand"] == "mp42"
    assert m["timescale"] == 3000 and m["duration"] == 9000
    assert m["duration_ms"] == 3000
    (t,) = m["tracks"]
    assert (t["width"], t["height"]) == (640, 360)
    assert t["handler"] == "vide" and t["codec"] == "hvc1"
    assert t["n_samples"] == 90 and t["track_id"] == 1


@pytest.mark.parametrize("codec", [b"avc1", b"av01", b"vp09"])
def test_codec_fourcc_and_odd_dims(codec):
    m = parse_mp4_meta(build_mp4(321, 181, 7, fps=7, timescale=7, codec=codec))
    (t,) = m["tracks"]
    assert t["codec"] == codec.decode() and (t["width"], t["height"]) == (321, 181)
    assert t["n_samples"] == 7


def test_tkhd_version1_geometry_offset():
    """Version-1 tkhd (64-bit times) shifts the width/height offset by 12
    bytes — build one by hand and check the parser's arithmetic."""
    from native_sql_engine_spark.operators.mp4 import _UNITY_MATRIX, _box, _full

    tkhd_v1 = _full(
        b"tkhd",
        1,
        7,
        struct.pack(">QQIIQ", 0, 0, 9, 0, 7_000)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _UNITY_MATRIX
        + struct.pack(">II", 123 << 16, 45 << 16),
    )
    base = build_mp4(640, 360, 10)
    # splice: wrap the v1 tkhd in a fresh trak with no mdia
    trak = _box(b"trak", tkhd_v1)
    moov = _box(b"moov", trak)
    buf = base[: base.index(b"moov") - 4]  # ftyp only
    m = parse_mp4_meta(buf + moov)
    (t,) = m["tracks"]
    assert t["track_id"] == 9 and (t["width"], t["height"]) == (123, 45)


def test_largesize_and_size_zero_boxes():
    buf = build_mp4(16, 16, 1)
    large = struct.pack(">I", 1) + b"free" + struct.pack(">Q", 21) + b"xxxxx"
    tail = struct.pack(">I", 0) + b"skip" + b"zz"  # size 0: to end of file
    names = [f for f, _, _ in iter_boxes(buf + large + tail)]
    assert names[-2:] == [b"free", b"skip"]
    # parse still succeeds with trailing exotic boxes
    assert parse_mp4_meta(buf + large + tail)["n_tracks"] == 1


def test_malformed_payloads_raise_positioned_errors():
    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4_meta(b"not a video at all")
    buf = build_mp4(32, 32, 4)
    with pytest.raises(ValueError):
        parse_mp4_meta(buf[:40])  # truncated mid-moov
    evil = struct.pack(">I", 999) + b"mdat"  # box overruns the buffer
    with pytest.raises(ValueError, match="overruns"):
        list(iter_boxes(evil))
    tiny = struct.pack(">I", 3) + b"mdat"  # size smaller than its header
    with pytest.raises(ValueError, match="overruns"):
        list(iter_boxes(tiny))


def test_video_meta_dispatch(spark):
    import pandas as pd

    from native_sql_engine_spark.operators import multimodal as M

    ids = spark.createDataFrame([(0,), (3,), (9,)], ["doc_id"])
    rows = M.video_meta(M.synthesize_mp4_corpus(ids), "payload", "doc_id").orderBy("media_id").collect()
    assert [r.codec for r in rows] == ["avc1", "av01", "hvc1"]
    for r in rows:
        i = r.media_id
        assert r.container == "mp4" and r.brand == "isom"
        assert (r.width, r.height) == (320 + 16 * (i % 5), 180 + 16 * (i % 3))
        assert r.n_frames == 24 + 6 * (i % 7)
        assert r.duration_ms == 40 * r.n_frames

    # y4m branch + the honest gate for other containers
    y4m = b"YUV4MPEG2 W4 H2 C420\n" + (b"FRAME\n" + bytes(4 * 2 * 3 // 2)) * 3
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [bytearray(y4m)]})
    )
    (r,) = M.video_meta(df, "payload", "doc_id").collect()
    assert r.container == "y4m" and (r.width, r.height, r.n_frames) == (4, 2, 3)

    mkv = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [bytearray(b"\x1aE\xdf\xa3 webmwebm")]})
    )
    with pytest.raises(Exception, match="not supported|NotImplemented"):
        M.video_meta(mkv, "payload", "doc_id").collect()
