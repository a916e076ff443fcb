"""TFRecord + safetensors (operators/mlformats.py): CRC32C pinning,
framing, dtype/shape fidelity, honest gates."""

from __future__ import annotations

import numpy as np
import pytest

from native_sql_engine_spark.operators.mlformats import (
    crc32c,
    read_safetensors,
    read_tfrecords,
    write_safetensors,
    write_tfrecords,
)


def test_crc32c_published_check_value():
    """iSCSI CRC32C of b'123456789' = 0xE3069283 — pins the polynomial
    externally so writer and reader cannot co-certify a wrong table."""
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_tfrecord_roundtrip_and_crc_detection():
    recs = [b"", b"a", b"hello world" * 50, bytes(range(256))]
    buf = write_tfrecords(recs)
    assert read_tfrecords(buf) == recs
    bad = bytearray(buf)
    bad[13] ^= 0x40  # flip a bit inside the first record's data
    with pytest.raises(ValueError, match="CRC"):
        read_tfrecords(bytes(bad))
    with pytest.raises(ValueError, match="truncated|overruns"):
        read_tfrecords(buf[:-2])


def test_safetensors_roundtrip_shapes_and_dtypes():
    t = {
        "emb": np.arange(24, dtype=np.float32).reshape(4, 6),
        "ids": np.array([1, 2, 3], dtype=np.int64),
        "flags": np.array([True, False]),
        "transposed": np.arange(12, dtype=np.float32).reshape(3, 4).T,
        "scalar": np.float64(3.5),
        "f16": np.array([1.5, -2.0], dtype=np.float16),
        "u8": np.array([0, 255], dtype=np.uint8),
    }
    out, meta = read_safetensors(write_safetensors(t, {"k": "v"}))
    assert meta == {"k": "v"}
    for k in t:
        want = np.asarray(t[k])
        assert out[k].shape == want.shape, k
        assert (out[k] == want).all(), k


def test_safetensors_errors_and_gates():
    with pytest.raises(ValueError, match="header"):
        read_safetensors(b"\xff\xff\xff\xff\xff\xff\xff\xff rest")
    with pytest.raises(ValueError, match="JSON"):
        read_safetensors(b"\x02\x00\x00\x00\x00\x00\x00\x00{]")
    with pytest.raises(NotImplementedError, match="subset"):
        write_safetensors({"c": np.array([1 + 2j])})
    # offsets escaping the buffer must not segfault-read
    buf = bytearray(write_safetensors({"a": np.zeros(4, np.float32)}))
    evil = buf.replace(b"[0,16]", b"[0,99]")
    with pytest.raises(ValueError, match="offsets|size"):
        read_safetensors(bytes(evil))
