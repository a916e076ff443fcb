"""From-scratch LZ4 decompression (block + frame formats) — stdlib only.

Completes the parquet page-codec set (snappy / gzip / zstd / lz4) and adds
the last mainstream shard compressor to the corpus-ingestion path:

- **block format**: token-coded sequences (literal run + 2-byte offset +
  match run, 255-continuation length extensions, overlapping copies) —
  what parquet LZ4_RAW (codec 7) stores per page;
- **Hadoop framing**: [4-byte BE decompressed size][4-byte BE compressed
  size][block]* — what the legacy parquet LZ4 codec (5) stores (Arrow
  writes this; readers fall back to a bare block, and so does this one);
- **frame format** (the `.lz4` file layout, magic 0x184D2204): FLG/BD
  descriptor with header checksum, independent/linked blocks,
  uncompressed-block flag, optional block checksums and content checksum
  (XXH32, pinned against the public empty-input check value).

Malformed payloads raise positioned ``ValueError`` (shared codec-layer
contract).  Fixtures are cross-verified against pyarrow's lz4/lz4_raw
codecs in tests/test_lz4.py.
"""

from __future__ import annotations

import struct

__all__ = ["lz4_block_decompress", "lz4_frame_decompress", "lz4_hadoop_decompress", "xxh32"]

_FRAME_MAGIC = 0x184D2204

# -- XXH32 (frame checksums) -----------------------------------------------------

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = (1 << 32) - 1


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """Public XXH32 algorithm (the LZ4 frame checksum)."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while i + 16 <= n:
            lanes = struct.unpack_from("<4I", data, i)
            v1 = (_rotl32((v1 + lanes[0] * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl32((v2 + lanes[1] * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl32((v3 + lanes[2] * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl32((v4 + lanes[3] * _P2) & _M32, 13) * _P1) & _M32
            i += 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = ((_rotl32(h + (k * _P3) & _M32, 17)) * _P4) & _M32
        i += 4
    while i < n:
        h = ((_rotl32(h + (data[i] * _P5) & _M32, 11)) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# -- block format ------------------------------------------------------------------


def lz4_block_decompress(buf: bytes, dest: bytearray | None = None) -> bytes:
    """Decode one LZ4 block.  ``dest`` seeds the match window (linked-block
    frame mode); the return value is only THIS block's output."""
    out = dest if dest is not None else bytearray()
    base = len(out)
    pos = 0
    n = len(buf)
    while pos < n:
        token = buf[pos]
        pos += 1
        ll = token >> 4
        if ll == 15:
            while True:
                if pos >= n:
                    raise ValueError(f"truncated literal-length extension at byte {pos}")
                b = buf[pos]
                pos += 1
                ll += b
                if b != 255:
                    break
        if pos + ll > n:
            raise ValueError(f"literal run overruns block at byte {pos}")
        out += buf[pos : pos + ll]
        pos += ll
        if pos >= n:
            break  # the last sequence carries literals only
        if pos + 2 > n:
            raise ValueError(f"truncated match offset at byte {pos}")
        off = buf[pos] | (buf[pos + 1] << 8)
        pos += 2
        if off == 0 or off > len(out):
            raise ValueError(f"match offset {off} out of range at byte {pos}")
        ml = token & 15
        if ml == 15:
            while True:
                if pos >= n:
                    raise ValueError(f"truncated match-length extension at byte {pos}")
                b = buf[pos]
                pos += 1
                ml += b
                if b != 255:
                    break
        ml += 4
        if off >= ml:
            start = len(out) - off
            out += out[start : start + ml]
        else:  # overlapping copy repeats the recent bytes
            chunk = bytes(out[-off:])
            out += (chunk * (ml // off + 1))[:ml]
    return bytes(out[base:])


# -- Hadoop framing (legacy parquet codec 5) -----------------------------------------


def lz4_hadoop_decompress(buf: bytes) -> bytes:
    """[4-byte BE decompressed size][4-byte BE compressed size][block]*,
    possibly several inner blocks per outer record; bare-block payloads
    (old Arrow files) fall back to the raw block decoder."""
    try:
        out = bytearray()
        pos = 0
        n = len(buf)
        while pos < n:
            if pos + 8 > n:
                raise ValueError("truncated Hadoop LZ4 record")
            want, pos0 = struct.unpack_from(">I", buf, pos)[0], pos + 4
            got = 0
            pos = pos0
            while got < want:
                if pos + 4 > n:
                    raise ValueError(f"truncated Hadoop LZ4 inner size at byte {pos}")
                (csize,) = struct.unpack_from(">I", buf, pos)
                pos += 4
                if pos + csize > n:
                    raise ValueError("Hadoop LZ4 inner block overruns the buffer")
                piece = lz4_block_decompress(buf[pos : pos + csize])
                pos += csize
                got += len(piece)
                out += piece
            if got != want:
                raise ValueError("Hadoop LZ4 record size mismatch")
        return bytes(out)
    except ValueError:
        # bare raw block (pre-Hadoop-framing Arrow writers)
        return lz4_block_decompress(buf)


# -- frame format --------------------------------------------------------------------


def lz4_frame_decompress(buf: bytes) -> bytes:
    """Decode one or more concatenated LZ4 frames (the `.lz4` layout),
    verifying the header checksum and any block/content checksums.

    Truncated input raises positioned ``ValueError`` (shared codec-layer
    contract) — the walk body converts raw IndexError/struct.error from
    short reads, same as zstd's ``_decode_frame``."""
    try:
        return _lz4_frame_walk(buf)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated LZ4 frame: {exc}") from exc


def _lz4_frame_walk(buf: bytes) -> bytes:
    out = bytearray()
    pos = 0
    n = len(buf)
    while pos < n:
        if pos + 4 > n:
            raise ValueError(f"truncated frame magic at byte {pos}")
        (magic,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        if 0x184D2A50 <= magic <= 0x184D2A5F:  # skippable frame
            if pos + 4 > n:
                raise ValueError(f"truncated skippable-frame size at byte {pos}")
            (skip,) = struct.unpack_from("<I", buf, pos)
            pos += 4 + skip
            continue
        if magic != _FRAME_MAGIC:
            raise ValueError(f"bad LZ4 frame magic {magic:#x} at byte {pos - 4}")
        desc_start = pos
        flg = buf[pos]
        bd = buf[pos + 1]
        pos += 2
        if (flg >> 6) != 1:
            raise ValueError(f"unsupported LZ4 frame version {flg >> 6}")
        independent = bool(flg & 0x20)
        block_checksum = bool(flg & 0x10)
        has_content_size = bool(flg & 0x08)
        content_checksum = bool(flg & 0x04)
        has_dict_id = bool(flg & 0x01)
        if (bd >> 4) & 7 not in (4, 5, 6, 7):
            raise ValueError(f"invalid block-max-size code {(bd >> 4) & 7}")
        content_size = None
        if has_content_size:
            (content_size,) = struct.unpack_from("<Q", buf, pos)
            pos += 8
        if has_dict_id:
            (did,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            if did:
                raise NotImplementedError(
                    f"LZ4 frame names external dictionary {did} (content is external)"
                )
        hc = buf[pos]
        pos += 1
        want_hc = (xxh32(buf[desc_start : pos - 1]) >> 8) & 0xFF
        if hc != want_hc:
            raise ValueError(f"frame descriptor checksum mismatch at byte {pos - 1}")
        frame = bytearray()  # linked blocks may match into earlier blocks
        while True:
            (bsize,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            if bsize == 0:  # EndMark
                break
            uncompressed = bool(bsize & 0x80000000)
            bsize &= 0x7FFFFFFF
            block = buf[pos : pos + bsize]
            if len(block) < bsize:
                raise ValueError(f"block at byte {pos} overruns the input")
            pos += bsize
            if block_checksum:
                (want,) = struct.unpack_from("<I", buf, pos)
                pos += 4
                if xxh32(block) != want:
                    raise ValueError(f"block checksum mismatch at byte {pos - 4}")
            if uncompressed:
                frame += block
            elif independent:
                frame += lz4_block_decompress(block)
            else:  # linked: dest seeds the window AND receives the output
                lz4_block_decompress(block, dest=frame)
        if content_size is not None and len(frame) != content_size:
            raise ValueError(
                f"content size mismatch: header says {content_size}, got {len(frame)}"
            )
        if content_checksum:
            (want,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            if xxh32(bytes(frame)) != want:
                raise ValueError("content checksum mismatch")
        out += frame
    return bytes(out)
