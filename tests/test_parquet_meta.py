"""Parquet footer introspection (operators/parquet_meta.py): generic
Thrift compact-protocol decode + FileMetaData interpretation, verified
against DuckDB's parquet_metadata() on the driver testdata."""

from __future__ import annotations

import glob
import struct

import pytest

from native_sql_engine_spark.operators.parquet_meta import (
    parse_footer,
    thrift_compact_decode,
)

SF = "/root/testdata/sf0.01"


def test_footer_matches_duckdb_file_metadata():
    import duckdb

    for p in sorted(glob.glob(f"{SF}/*.parquet")):
        m = parse_footer(open(p, "rb").read())
        nr, nrg, cb = duckdb.sql(
            f"SELECT num_rows, num_row_groups, created_by FROM parquet_file_metadata('{p}')"
        ).fetchone()
        assert (m["num_rows"], m["num_row_groups"], m["created_by"]) == (nr, nrg, cb), p


def test_column_chunks_match_duckdb_parquet_metadata():
    import duckdb

    p = f"{SF}/lineitem.parquet"
    m = parse_footer(open(p, "rb").read())
    want = duckdb.sql(
        f"""SELECT path_in_schema, compression, num_values,
                   total_compressed_size, total_uncompressed_size
            FROM parquet_metadata('{p}')"""
    ).fetchall()
    got = {
        c["path"]: (c["codec"], c["num_values"], c["compressed"], c["uncompressed"])
        for c in m["row_groups"][0]["columns"]
    }
    assert len(got) == len(want)
    for path, comp, nv, tc, tu in want:
        assert got[path] == (comp, nv, tc, tu), path


def test_thrift_compact_decoder_generic():
    """Hand-encoded compact struct: short/long field ids, zigzag ints,
    strings, nested structs, lists, bool-in-type-nibble."""
    # struct { 1: i32 = -3; 2: bool = true; 4: string = "hi";
    #          20: struct { 1: i64 = 300 }; 21: list<i32> = [1, -1] }
    inner = bytes([0x16]) + b"\xd8\x04" + b"\x00"  # field 1, i64 zigzag(300)=600
    body = (
        bytes([0x15]) + b"\x05"  # field 1 (delta 1), i32, zigzag(-3)=5
        + bytes([0x11])  # field 2 (delta 1), BOOLEAN_TRUE
        + bytes([0x28]) + b"\x02hi"  # field 4 (delta 2), binary len 2
        + bytes([0x0C]) + b"\x28"  # long-form field id: zigzag(20)=40, struct
        + inner
        + bytes([0x19]) + bytes([0x25]) + b"\x02" + b"\x01"  # f21 list<i32>[2]: 1, -1
        + b"\x00"
    )
    fields, end = thrift_compact_decode(body)
    assert end == len(body)
    assert fields[1] == -3 and fields[2] is True and fields[4] == b"hi"
    assert fields[20] == {1: 300}
    assert fields[21] == [1, -1]


def test_footer_errors():
    with pytest.raises(ValueError, match="PAR1"):
        parse_footer(b"not parquet at all")
    good = open(f"{SF}/region.parquet", "rb").read()
    evil = good[:-8] + struct.pack("<I", 10**6) + b"PAR1"
    with pytest.raises(ValueError, match="exceeds"):
        parse_footer(evil)
