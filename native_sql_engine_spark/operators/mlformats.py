"""From-scratch ML container formats — TFRecord and safetensors.

TFRecord (the TensorFlow training-shard format): each record is
  uint64le length | masked crc32c(length bytes) | data | masked crc32c(data)
with CRC32C (Castagnoli, reflected poly 0x82F63B78) and the TF mask
``((crc >> 15 | crc << 17) + 0xa282ead8) mod 2^32``.  The CRC table is
pinned against the published iSCSI check value in tests (crc32c of
b"123456789" = 0xE3069283), so writer and reader cannot co-certify a
wrong polynomial.

safetensors (the HF tensor-shard format): uint64le header length | JSON
header mapping tensor name → {dtype, shape, data_offsets} | raw
little-endian tensor bytes.  Reading yields numpy arrays zero-copy.

Both are framed binary — stdlib + numpy only; malformed payloads raise
positioned ``ValueError`` (shared codec-layer contract).
"""

from __future__ import annotations

import json
import struct

import numpy as np

__all__ = [
    "crc32c",
    "write_tfrecords",
    "read_tfrecords",
    "write_safetensors",
    "read_safetensors",
]

# -- CRC32C (Castagnoli, reflected) --------------------------------------------

_CRC32C_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = _CRC32C_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# -- TFRecord ------------------------------------------------------------------


def write_tfrecords(records: list[bytes]) -> bytes:
    out = bytearray()
    for rec in records:
        hdr = struct.pack("<Q", len(rec))
        out += hdr + struct.pack("<I", _masked_crc(hdr))
        out += rec + struct.pack("<I", _masked_crc(rec))
    return bytes(out)


def read_tfrecords(buf: bytes, verify: bool = True) -> list[bytes]:
    out: list[bytes] = []
    pos = 0
    n = len(buf)
    while pos < n:
        if pos + 12 > n:
            raise ValueError(f"truncated TFRecord header at byte {pos}")
        (length,) = struct.unpack_from("<Q", buf, pos)
        (hcrc,) = struct.unpack_from("<I", buf, pos + 8)
        if verify and _masked_crc(buf[pos : pos + 8]) != hcrc:
            raise ValueError(f"TFRecord length-CRC mismatch at byte {pos}")
        pos += 12
        if pos + length + 4 > n:
            raise ValueError(f"TFRecord data overruns the buffer at byte {pos}")
        data = buf[pos : pos + length]
        (dcrc,) = struct.unpack_from("<I", buf, pos + length)
        if verify and _masked_crc(data) != dcrc:
            raise ValueError(f"TFRecord data-CRC mismatch at byte {pos}")
        out.append(data)
        pos += length + 4
    return out


# -- safetensors ---------------------------------------------------------------

_DTYPES = {
    "F64": np.dtype("<f8"),
    "F32": np.dtype("<f4"),
    "F16": np.dtype("<f2"),
    "I64": np.dtype("<i8"),
    "I32": np.dtype("<i4"),
    "I16": np.dtype("<i2"),
    "I8": np.dtype("i1"),
    "U8": np.dtype("u1"),
    "BOOL": np.dtype("?"),
}


def write_safetensors(tensors: dict[str, np.ndarray], metadata: dict | None = None) -> bytes:
    header: dict = {}
    body = bytearray()
    rev = {v: k for k, v in _DTYPES.items()}
    for name, arr in tensors.items():
        arr = np.asarray(arr)
        if not arr.flags["C_CONTIGUOUS"]:  # ascontiguousarray would 1-d-ify 0-d
            arr = np.ascontiguousarray(arr)
        dt = rev.get(arr.dtype.newbyteorder("<"))
        if dt is None:
            raise NotImplementedError(f"dtype {arr.dtype} outside the safetensors subset")
        start = len(body)
        body += arr.astype(arr.dtype.newbyteorder("<"), copy=False).tobytes()
        header[name] = {
            "dtype": dt,
            "shape": list(arr.shape),
            "data_offsets": [start, len(body)],
        }
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}
    hjson = json.dumps(header, separators=(",", ":")).encode()
    return struct.pack("<Q", len(hjson)) + hjson + bytes(body)


def read_safetensors(buf: bytes) -> tuple[dict[str, np.ndarray], dict]:
    if len(buf) < 8:
        raise ValueError("truncated safetensors payload (no header length)")
    (hlen,) = struct.unpack_from("<Q", buf, 0)
    if 8 + hlen > len(buf):
        raise ValueError("safetensors header overruns the buffer")
    try:
        header = json.loads(buf[8 : 8 + hlen])
    except ValueError as ex:
        raise ValueError(f"invalid safetensors header JSON: {ex}") from ex
    meta = header.pop("__metadata__", {})
    data = buf[8 + hlen :]
    out: dict[str, np.ndarray] = {}
    for name, spec in header.items():
        dt = _DTYPES.get(spec.get("dtype"))
        if dt is None:
            raise NotImplementedError(f"dtype {spec.get('dtype')!r} outside the subset")
        s, e = spec["data_offsets"]
        if not (0 <= s <= e <= len(data)):
            raise ValueError(f"tensor {name!r} offsets out of range")
        arr = np.frombuffer(data[s:e], dtype=dt)
        shape = spec["shape"]
        expected = int(np.prod(shape)) if shape else 1
        if arr.size != expected:
            raise ValueError(f"tensor {name!r} size does not match its shape")
        out[name] = arr.reshape(shape)
    return out, meta
