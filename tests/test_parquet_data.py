"""From-scratch parquet DATA reading (operators/parquet_data.py):
Snappy, page framing, RLE hybrid, dictionary decode, logical types —
verified column-for-column against DuckDB on the driver testdata."""

from __future__ import annotations

import glob

import pytest

from native_sql_engine_spark.operators.parquet_data import (
    read_column,
    snappy_decompress,
)

SF = "/root/testdata/sf0.01"


def test_snappy_hand_cases():
    # literal(3) "abc" + overlapping copy1(off=3, len=6) -> "abcabcabc"
    enc = bytes([9, (3 - 1) << 2]) + b"abc" + bytes([((6 - 4) << 2) | 1, 3])
    assert snappy_decompress(enc) == b"abcabcabc"
    # long literal (>=60 one-byte length form)
    payload = bytes(range(256)) * 2
    enc = bytes([0x82, 0x04])  # varint 514
    n1 = len(payload) - 1  # 511: needs the two-byte length form (base 61)
    enc += bytes([61 << 2, n1 & 0xFF, n1 >> 8]) + payload + bytes([(2 - 1) << 2]) + payload[:2]
    assert snappy_decompress(enc) == payload + payload[:2]
    with pytest.raises(ValueError, match="offset"):
        snappy_decompress(bytes([4, ((4 - 4) << 2) | 1, 9]))  # copy before any output
    with pytest.raises(ValueError, match="length mismatch"):
        snappy_decompress(bytes([5, (3 - 1) << 2]) + b"abc")


def test_every_column_matches_duckdb():
    """EVERY top-level column of every sf0.01 table — flat and
    list<float> — decodes bit-identically to DuckDB's reader: dictionary
    pages, snappy, nullable def-levels, repetition-level list reassembly,
    timestamps/dates via converted_type."""
    import duckdb

    checked = 0
    for p in sorted(glob.glob(f"{SF}/*.parquet")):
        buf = open(p, "rb").read()
        cols = duckdb.sql(f"DESCRIBE SELECT * FROM read_parquet('{p}')").fetchall()
        for col, *_ in cols:
            got = read_column(buf, col)
            want = [r[0] for r in duckdb.sql(f'SELECT "{col}" FROM read_parquet(\'{p}\')').fetchall()]
            got = [list(g) if isinstance(g, list) else g for g in got]
            want = [list(w) if isinstance(w, list) else w for w in want]
            assert got == want, col
            checked += 1
    assert checked >= 45


def test_column_errors_and_gates():
    buf = open(f"{SF}/embeddings.parquet", "rb").read()
    with pytest.raises(ValueError, match="not in schema"):
        read_column(buf, "no_such_column")
    with pytest.raises(ValueError, match="parquet"):
        read_column(b"garbage", "x")


def test_list_reassembly_levels():
    """Null list / empty list / null element def-level mapping through a
    pyarrow-written file with all four cases present."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [[1.5, None, 2.5], None, [], [7.0]]
    t = pa.table({"v": pa.array(rows, type=pa.list_(pa.float64()))})
    with tempfile.NamedTemporaryFile(suffix=".parquet") as f:
        pq.write_table(t, f.name, compression="snappy")
        got = read_column(open(f.name, "rb").read(), "v")
    assert got == rows
