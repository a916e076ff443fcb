"""From-scratch TIFF codec (operators/tiff.py): TIFF-variant LZW
(MSB-first, EarlyChange), strips, Predictor 2, II/MM byte orders."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from native_sql_engine_spark.operators.tiff import (
    decode_tiff,
    encode_tiff,
    lzw_decode,
    lzw_encode,
)


def _pack_msb(codes: list[int], widths: list[int]) -> bytes:
    acc = nb = 0
    out = bytearray()
    for c, w in zip(codes, widths):
        acc = (acc << w) | c
        nb += w
        while nb >= 8:
            nb -= 8
            out.append((acc >> nb) & 0xFF)
    if nb:
        out.append((acc << (8 - nb)) & 0xFF)
    return bytes(out)


def test_lzw_hand_derived_stream():
    """Decode a stream whose codes were derived by hand from the TIFF spec
    algorithm (ch. 13) — independent of our encoder, so a shared
    encoder/decoder bug can't self-certify."""
    # data 07 07 07 08 08 07 → Clear, 7, 258("77"), 8, 8, 7, EOI @ 9 bits
    stream = _pack_msb([256, 7, 258, 8, 8, 7, 257], [9] * 7)
    assert lzw_decode(stream) == b"\x07\x07\x07\x08\x08\x07"


def test_lzw_width_bumps_and_reset():
    """Low-entropy data grows the table across all three EarlyChange width
    bumps (511/1023/2047) and past the 4094-entry Clear reset."""
    rng = np.random.default_rng(3)
    data = bytes(rng.integers(0, 4, size=300_000, dtype=np.uint8))
    enc = lzw_encode(data)
    assert lzw_decode(enc) == data
    assert len(enc) < len(data) / 2  # actually compresses
    # high-entropy (expansion) path too
    data2 = bytes(rng.integers(0, 256, size=50_000, dtype=np.uint8))
    assert lzw_decode(lzw_encode(data2)) == data2


@pytest.mark.parametrize("gray", [True, False])
@pytest.mark.parametrize("comp,pred", [(1, 1), (5, 1), (5, 2), (32773, 1)])
@pytest.mark.parametrize("big_endian", [False, True])
def test_tiff_roundtrip_matrix(gray, comp, pred, big_endian):
    rng = np.random.default_rng(7)
    shape = (13, 21) if gray else (13, 21, 3)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    for rps in (None, 3):
        buf = encode_tiff(
            img, compression=comp, predictor=pred, rows_per_strip=rps,
            big_endian=big_endian,
        )
        h, w, c, out = decode_tiff(buf)
        assert (h, w) == (13, 21) and c == (1 if gray else 3)
        assert (out.reshape(img.shape) == img).all()


def test_tiff_errors_and_gates():
    with pytest.raises(ValueError, match="header"):
        decode_tiff(b"NOTATIFF")
    img = np.zeros((4, 4), dtype=np.uint8)
    buf = bytearray(encode_tiff(img, compression=5))
    # clobber the Compression tag value (tag 259) to CCITT G3 (2)
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, ifd_off)
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from("<HHI", buf, base)
        if tag == 259:
            struct.pack_into("<H", buf, base + 8, 2)
    with pytest.raises(NotImplementedError, match="compression"):
        decode_tiff(bytes(buf))
    # truncated strip data
    good = encode_tiff(img)
    with pytest.raises(ValueError):
        decode_tiff(good[:-8])


def test_decode_image_dispatches_tiff(spark):
    from native_sql_engine_spark.operators import multimodal as M

    ids = spark.createDataFrame([(3,), (4,)], ["doc_id"])
    payloads = M.synthesize_tiff_corpus(ids, "doc_id", width=4, height=4)
    rows = (
        M.image_stats(M.decode_image(payloads, "payload", "doc_id"))
        .orderBy("media_id")
        .collect()
    )
    assert len(rows) == 2
    for r in rows:
        expect = round(float(np.mean((int(r.media_id) * 37 + np.arange(48)) % 256)), 4)
        assert (r.width, r.height) == (4, 4)
        assert abs(r.mean_px - expect) < 1e-9


def test_packbits_spec_vector():
    """The PackBits worked example from Apple TN1023 (referenced by TIFF 6.0
    §9) decodes to the documented 24 bytes — pins the RLE independently of
    our encoder."""
    from native_sql_engine_spark.operators.tiff import packbits_decode, packbits_encode

    enc = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    want = bytes.fromhex("AAAAAA80002A" + "AAAAAAAA" + "80002A22" + "AA" * 10)
    assert packbits_decode(enc) == want
    # our encoder round-trips the same payload
    assert packbits_decode(packbits_encode(want)) == want


@pytest.mark.parametrize("gray", [True, False])
@pytest.mark.parametrize("comp,pred", [(1, 1), (5, 2), (32773, 1)])
def test_tiff_tiled_roundtrip(gray, comp, pred):
    """Tiled layout (tags 322-325, spec 15): tiles pad to full size at the
    right/bottom edges, predictor runs per tile row, tile grid is
    row-major — non-tile-aligned dims exercise the edge clipping."""
    rng = np.random.default_rng(11)
    shape = (37, 45) if gray else (37, 45, 3)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    for be in (False, True):
        buf = encode_tiff(img, compression=comp, predictor=pred, big_endian=be, tile=(16, 32))
        h, w, c, out = decode_tiff(buf)
        assert (h, w) == (37, 45)
        assert (out.reshape(img.shape) == img).all()


def test_tiff_tile_validation():
    img = np.zeros((8, 8), dtype=np.uint8)
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(img, tile=(8, 8))
    with pytest.raises(ValueError, match="mutually exclusive"):
        encode_tiff(img, tile=(16, 16), rows_per_strip=4)


def test_tiff_photometric_and_planar_gates():
    """WhiteIsZero (common in fax/scan TIFFs) inverts to BlackIsZero;
    planar and palette layouts raise instead of decoding garbage (round-6
    review: these tags were silently ignored)."""
    img = np.arange(16, dtype=np.uint8).reshape(4, 4) * 16
    buf = bytearray(encode_tiff(img))
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, ifd_off)

    def set_tag(b, tag, val):
        for i in range(n):
            base = ifd_off + 2 + 12 * i
            t, typ, cnt = struct.unpack_from("<HHI", b, base)
            if t == tag:
                struct.pack_into("<H", b, base + 8, val)
                return True
        return False

    b0 = bytearray(buf)
    assert set_tag(b0, 262, 0)  # PhotometricInterpretation = WhiteIsZero
    h, w, c, out = decode_tiff(bytes(b0))
    assert (out == 255 - img).all()

    b3 = bytearray(buf)
    set_tag(b3, 262, 3)  # palette
    with pytest.raises(NotImplementedError, match="Photometric"):
        decode_tiff(bytes(b3))
