"""From-scratch LZ4 decoder (operators/lz4.py): block format, Hadoop
framing, frame format with checksums — cross-verified against pyarrow's
lz4/lz4_raw codecs."""

from __future__ import annotations

import os
import struct

import pytest

from native_sql_engine_spark.operators.lz4 import (
    lz4_block_decompress,
    lz4_frame_decompress,
    lz4_hadoop_decompress,
    xxh32,
)


def _cases():
    return {
        "empty": b"",
        "one": b"a",
        "repetitive": b"hello hello hello world " * 1_000,
        "structured": b"".join(
            f"row{i},val{i * 7 % 13},{i * i}\n".encode() for i in range(10_000)
        ),
        "random": bytes((i * 2654435761) >> 9 & 0xFF for i in range(40_000)),
        "zeros": b"\x00" * 70_000,  # > one 64 KB block at small frame sizes
        "overlap": b"ab" * 30_000,  # offset < match length copies
    }


def test_xxh32_public_pin():
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"", seed=1) != xxh32(b"")
    assert len({xxh32(b"x" * 15), xxh32(b"x" * 16), xxh32(b"x" * 17)}) == 3


def test_block_format_matches_reference():
    import pyarrow as pa

    codec = pa.Codec("lz4_raw")
    for name, d in _cases().items():
        z = codec.compress(d, asbytes=True)
        assert lz4_block_decompress(z) == d, name


def test_frame_format_matches_reference():
    import pyarrow as pa

    codec = pa.Codec("lz4")  # frame format
    for name, d in _cases().items():
        z = codec.compress(d, asbytes=True)
        assert lz4_frame_decompress(z) == d, name


def test_block_hand_cases_and_errors():
    # literals-only block: token 0x30, "abc"
    assert lz4_block_decompress(bytes([0x30]) + b"abc") == b"abc"
    # "abcabcabc": 3 literals then match off=3 len=6 -> token 0x32 (ml 2+4)
    assert lz4_block_decompress(bytes([0x32]) + b"abc" + struct.pack("<H", 3)) == b"abcabcabc"
    # length extension: 15 + 255 + 0 = 270 literals
    d = (bytes(range(256)) + bytes(range(256)))[:270]
    z = bytes([0xF0, 255, 0]) + d
    assert lz4_block_decompress(z) == d
    with pytest.raises(ValueError, match="offset"):
        lz4_block_decompress(bytes([0x12]) + b"a" + struct.pack("<H", 9))
    with pytest.raises(ValueError, match="overruns|truncated"):
        lz4_block_decompress(bytes([0x50]) + b"ab")


def test_frame_checksum_and_error_paths():
    import pyarrow as pa

    z = bytearray(pa.Codec("lz4").compress(b"payload payload payload " * 50, asbytes=True))
    # corrupt a content byte: block/content checksum (or decode) must fail
    z[20] ^= 0xFF
    with pytest.raises(ValueError):
        lz4_frame_decompress(bytes(z))
    with pytest.raises(ValueError, match="magic"):
        lz4_frame_decompress(b"\x00\x01\x02\x03\x04\x05\x06\x07")
    # skippable frame between two real frames
    import pyarrow as pa2

    a = pa2.Codec("lz4").compress(b"first " * 30, asbytes=True)
    b = pa2.Codec("lz4").compress(b"second " * 30, asbytes=True)
    skip = struct.pack("<II", 0x184D2A51, 3) + b"xyz"
    assert lz4_frame_decompress(a + skip + b) == b"first " * 30 + b"second " * 30


def test_truncated_inputs_raise_value_error_not_raw():
    """Positioned-ValueError codec contract (round-7 advice): truncated
    payloads must never leak raw struct.error/IndexError from any entry
    point — callers (decompress_text dispatch) rely on uniform exceptions."""
    from native_sql_engine_spark.operators.lz4 import lz4_hadoop_decompress

    # Hadoop framing: want=100 then a short record tail (inner csize cut off)
    with pytest.raises(ValueError):
        lz4_hadoop_decompress(struct.pack(">II", 100, 5) + b"\x30abc")
    # frame ends right after the magic (FLG/BD bytes missing)
    with pytest.raises(ValueError):
        lz4_frame_decompress(struct.pack("<I", 0x184D2204))
    # skippable frame with the size field cut off
    with pytest.raises(ValueError):
        lz4_frame_decompress(struct.pack("<I", 0x184D2A51) + b"\x03")
    # zstd: same two truncation shapes through its own entry point
    from native_sql_engine_spark.operators.zstd import zstd_decompress

    with pytest.raises(ValueError):
        zstd_decompress(struct.pack("<I", 0xFD2FB528))
    with pytest.raises(ValueError):
        zstd_decompress(struct.pack("<I", 0x184D2A51) + b"\x03")


def test_parquet_lz4_pages_match_duckdb():
    """Parquet 'LZ4' (Hadoop-framed legacy codec) pages through the
    from-scratch reader, bit-identical to DuckDB's scan."""
    import tempfile

    import duckdb
    import pyarrow.parquet as pq

    from native_sql_engine_spark.operators.parquet_data import read_column

    src = "/root/testdata/sf0.01/orders.parquet"
    t = pq.read_table(src)
    with tempfile.NamedTemporaryFile(suffix=".parquet") as f:
        pq.write_table(t, f.name, compression="lz4", row_group_size=3000)
        codec_name = pq.ParquetFile(f.name).metadata.row_group(0).column(0).compression
        assert codec_name in ("LZ4", "LZ4_RAW")
        buf = open(f.name, "rb").read()
        cols = duckdb.sql(f"DESCRIBE SELECT * FROM read_parquet('{f.name}')").fetchall()
        for col, *_ in cols:
            got = read_column(buf, col)
            want = [
                r[0]
                for r in duckdb.sql(
                    f'SELECT "{col}" FROM read_parquet(\'{f.name}\')'
                ).fetchall()
            ]
            assert got == want, col


def test_decompress_text_lz4_arm(spark):
    """decompress_text dispatches the lz4-frame magic to the from-scratch
    decoder, alongside gzip/bz2/xz/zstd/zlib."""
    import pyarrow as pa

    from native_sql_engine_spark.operators.web import decompress_text

    codec = pa.Codec("lz4")
    rows_in = [(1, "hello lz4 " * 20), (2, "κείμενο lz4")]
    payloads = [(i, codec.compress(t.encode(), asbytes=True)) for i, t in rows_in]
    df = spark.createDataFrame(payloads, ["doc_id", "payload"])
    rows = decompress_text(df, "payload", "doc_id").orderBy("media_id").collect()
    assert [r.codec for r in rows] == ["lz4", "lz4"]
    assert rows[0].text == rows_in[0][1] and rows[1].text == rows_in[1][1]
