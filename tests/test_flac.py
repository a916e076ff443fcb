"""WAV + FLAC-subset codecs (operators/flac.py): CRC pinning, Rice
residuals, fixed predictors, container dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from native_sql_engine_spark.operators.flac import (
    crc8,
    crc16,
    decode_flac,
    decode_wav,
    encode_flac,
    encode_wav,
)


def test_crc_check_values():
    """Published check values pin the polynomials externally — a shared
    encoder/decoder bug in the CRC tables cannot self-certify."""
    assert crc8(b"123456789") == 0xF4  # CRC-8 (poly 0x07, init 0)
    assert crc16(b"123456789") == 0xFEE8  # CRC-16/BUYPASS (poly 0x8005, init 0)


@pytest.mark.parametrize("bits", [8, 16])
@pytest.mark.parametrize("ch", [1, 2])
def test_wav_roundtrip(bits, ch):
    rng = np.random.default_rng(5)
    lo, hi = (0, 256) if bits == 8 else (-32768, 32768)
    s = rng.integers(lo, hi, size=(777, ch)).astype(np.int32)
    rate, c, b, out = decode_wav(encode_wav(s, 8000, bits))
    assert (rate, c, b) == (8000, ch, bits)
    assert (out == s).all()


def test_wav_errors():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"NOTAWAV" + b"\x00" * 40)
    buf = bytearray(encode_wav(np.zeros(16, dtype=np.int32)))
    buf[20] = 3  # fmt code -> IEEE float
    with pytest.raises(NotImplementedError, match="non-PCM"):
        decode_wav(bytes(buf))


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_flac_roundtrip_orders(order):
    rng = np.random.default_rng(order)
    for bits, lo, hi in ((8, -128, 128), (16, -32768, 32768)):
        for ch in (1, 2):
            for n in (1, 5, 100, 3000):
                s = rng.integers(lo, hi, size=(n, ch)).astype(np.int64)
                buf = encode_flac(s, 16000, bits, block_size=512, order=order)
                rate, c, b, out = decode_flac(buf)
                assert (rate, c, b) == (16000, ch, bits)
                assert (out == s).all(), (bits, ch, order, n)


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
@pytest.mark.parametrize("lpc", [0, 2, 8])
def test_flac_stereo_modes_roundtrip(mode, lpc):
    """All three decorrelation modes × FIXED/LPC subframes are lossless,
    including odd left+right parity (the mid/side low-bit recovery) and
    full-range 16-bit extremes (side channel needs bits+1)."""
    rng = np.random.default_rng(hash((mode, lpc)) % 2**31)
    t = np.arange(2500)
    left = (9000 * np.sin(t / 31) + rng.integers(-99, 99, len(t))).astype(np.int64)
    right = (8000 * np.sin(t / 17 + 2) + rng.integers(-99, 99, len(t))).astype(np.int64)
    # force odd/even parity mixes and the int16 extremes into the signal
    left[:4] = [32767, -32768, 32767, 1]
    right[:4] = [-32768, 32767, 32766, 0]
    s = np.stack([left, right], axis=1)
    buf = encode_flac(s, 16000, 16, block_size=512, order=2, mode=mode, lpc_order=lpc)
    rate, c, b, out = decode_flac(buf)
    assert (rate, c, b) == (16000, 2, 16)
    assert (out == s).all()


def test_flac_lpc_mono_roundtrip_and_degenerate_fallback():
    rng = np.random.default_rng(11)
    for bits, scale in ((8, 100), (16, 20000)):
        t = np.arange(1234)
        sig = (scale * np.sin(t / 9) + rng.integers(-3, 3, len(t))).astype(np.int64)
        buf = encode_flac(sig, 8000, bits, block_size=500, lpc_order=6)
        _, _, _, out = decode_flac(buf)
        assert (out[:, 0] == sig).all()
    # constant signal: autocorrelation fit degenerates -> FIXED fallback
    cst = np.full(600, 42, dtype=np.int64)
    buf = encode_flac(cst, 8000, 16, block_size=256, lpc_order=8)
    _, _, _, out = decode_flac(buf)
    assert (out[:, 0] == cst).all()


def test_flac_lpc_beats_fixed_on_resonant_signal():
    """LPC must actually predict better than FIXED on a narrowband signal
    (otherwise the coefficient plumbing is decorative)."""
    t = np.arange(16384)
    sig = (12000 * np.sin(t * 0.3)).astype(np.int64)
    fixed = encode_flac(sig, 16000, 16, block_size=1024, order=2, lpc_order=0)
    lpc = encode_flac(sig, 16000, 16, block_size=1024, lpc_order=4)
    _, _, _, out = decode_flac(lpc)
    assert (out[:, 0] == sig).all()
    assert len(lpc) < len(fixed)


def test_flac_stereo_mode_validation():
    mono = np.zeros(64, dtype=np.int64)
    with pytest.raises(ValueError, match="2 channels"):
        encode_flac(mono, 8000, 16, mode="mid_side")
    st = np.zeros((64, 2), dtype=np.int64)
    with pytest.raises(ValueError, match="unknown channel mode"):
        encode_flac(st, 8000, 16, mode="sideways")
    with pytest.raises(ValueError, match="lpc order"):
        encode_flac(mono, 8000, 16, lpc_order=33)


def test_flac_smooth_signal_compresses():
    """A smooth signal's order-2 residuals are small — the Rice coder must
    actually compress (this also walks many frames at block size 512)."""
    t = np.arange(20000)
    sig = (1000 * np.sin(t / 50) + 500 * np.sin(t / 7)).astype(np.int64)[:, None]
    buf = encode_flac(sig, 16000, 16, block_size=512, order=2)
    _, _, _, out = decode_flac(buf)
    assert (out[:, 0] == sig[:, 0]).all()
    assert len(buf) < 2 * len(sig) * 0.5  # < half of raw PCM


def test_flac_crc_detects_corruption():
    sig = np.arange(-500, 500, dtype=np.int64)[:, None] * 3
    buf = bytearray(encode_flac(sig, 16000, 16))
    buf[-1] ^= 0xFF  # clobber the final frame's CRC-16 (content stays valid)
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(buf))
    buf = bytearray(encode_flac(sig, 16000, 16))
    buf[-20] ^= 0xFF  # corrupt residual bits: CRC or bitstream desync, but
    with pytest.raises(ValueError):  # never silent garbage
        decode_flac(bytes(buf))


def test_flac_errors_and_gates():
    with pytest.raises(ValueError, match="signature"):
        decode_flac(b"NOTFLAC!")
    buf = bytearray(encode_flac(np.zeros((64, 1), dtype=np.int64)))
    with pytest.raises(ValueError):
        decode_flac(bytes(buf[:-3]))  # truncated final frame


def test_decode_audio_dispatch(spark):
    from native_sql_engine_spark.operators import multimodal as M

    ids = spark.createDataFrame([(3,), (4,)], ["doc_id"])
    for flac in (False, True):
        payloads = M.synthesize_wav_corpus(ids, "doc_id", n_samples=256, flac=flac)
        rows = M.decode_audio(payloads, "payload", "doc_id").orderBy("media_id").collect()
        assert len(rows) == 2
        for r in rows:
            s = ((int(r.media_id) * 13 + np.arange(256) * 7) % 4096) - 2048
            assert r.n_samples == 256 and r.sample_rate == 16000
            assert r.sample_sum == int(s.sum())
            assert r.sq_sum == int((s * s).sum())

    raw = spark.createDataFrame([(1, bytearray(b"ID3\x03mp3data"))], "doc_id long, payload binary")
    with pytest.raises(Exception, match="codec|NotImplemented"):
        from native_sql_engine_spark.operators.multimodal import decode_audio

        decode_audio(raw, "payload", "doc_id").collect()
