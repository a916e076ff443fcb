"""From-scratch Brotli (operators/brotli.py) — cross-validated against
pyarrow's real libbrotli encoder across quality levels, plus the parquet
codec-4 page path and the RFC-data embedding pins."""

from __future__ import annotations

import random

import pytest

from native_sql_engine_spark.operators.brotli import brotli_decompress


def _real(data: bytes, q: int = 11) -> bytes:
    import pyarrow as pa

    return pa.Codec("brotli", compression_level=q).compress(data, asbytes=True)


def test_roundtrip_matrix_vs_real_encoder():
    """Every quality tier (fast/balanced/max) x payload shape: uncompressed
    meta-blocks, plain backward references, context-modelled literals,
    static-dictionary references all flow through."""
    random.seed(11)
    cases = {
        "empty": b"",
        "one": b"x",
        "english": (
            b"This is not the time for working with people from all of the "
            b"world. Technology should provide information. " * 3
        ),
        "repetitive": b"abcdefgh" * 5000,
        "random": bytes(random.randrange(256) for _ in range(60000)),
        "skewed": bytes(random.choice(b"aabbccddee\n \t") for _ in range(80000)),
        "binary-ladder": bytes(range(256)) * 64,
    }
    for q in (0, 1, 2, 5, 9, 11):
        for name, data in cases.items():
            assert brotli_decompress(_real(data, q)) == data, (q, name)


def test_static_dictionary_and_transforms():
    """Short unique English at q11 forces static-dictionary word references
    (verified via the lazily-loaded dictionary body)."""
    import native_sql_engine_spark.operators.brotli as B

    text = (
        b"This is not the time for working with people from all of the "
        b"world. Technology should provide information."
    )
    assert brotli_decompress(_real(text, 11)) == text
    assert B._dict_body is not None, "q11 short English should hit the dictionary"
    # transform machinery sanity: transform 0 is the bare identity; the
    # UTF-8-aware uppercaser follows the spec's 1/2/3-byte stepping
    word = B._dictionary()[B._DICT_OFFSETS[8] : B._DICT_OFFSETS[8] + 8]
    assert B._transform_word(word, 0) == word
    arr = bytearray(b"a\xc3\xa9z")  # 'a', U+00E9, 'z'
    assert B._uppercase(arr, 0) == 1 and arr[:1] == b"A"
    assert B._uppercase(arr, 1) == 2 and arr[1:3] == b"\xc3\x89"  # U+00C9


def test_embedded_tables_match_system_library():
    """The embedded RFC appendix tables (context LUT, transform triples,
    dictionary geometry) must equal libbrotlicommon's copies."""
    import ctypes
    import glob

    import native_sql_engine_spark.operators.brotli as B

    libs = sorted(
        glob.glob("/root/miniconda/lib/libbrotlicommon.so*")
        + glob.glob("/usr/lib/*/libbrotlicommon.so*")
    )
    if not libs:
        pytest.skip("no libbrotlicommon on this host")
    lib = ctypes.CDLL(libs[0])
    clut = bytes((ctypes.c_uint8 * 2048).in_dll(lib, "_kBrotliContextLookupTable"))
    assert clut == B._CLUT

    class _T(ctypes.Structure):
        _fields_ = [
            ("prefix_suffix_size", ctypes.c_uint16),
            ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
            ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
            ("num_transforms", ctypes.c_uint32),
            ("transforms", ctypes.POINTER(ctypes.c_uint8)),
            ("params", ctypes.POINTER(ctypes.c_uint8)),
            ("cutOffTransforms", ctypes.c_int16 * 10),
        ]

    lib.BrotliGetTransforms.restype = ctypes.POINTER(_T)
    t = lib.BrotliGetTransforms().contents
    assert t.num_transforms == B._NUM_TRANSFORMS == 121
    assert bytes(t.transforms[i] for i in range(121 * 3)) == B._TRIPLES
    assert bytes(t.prefix_suffix[i] for i in range(t.prefix_suffix_size)) == B._PS


def test_malformed_inputs_raise_value_error():
    z = _real(b"hello world")
    with pytest.raises(ValueError, match="trailing"):
        brotli_decompress(z + b"zz")
    with pytest.raises(ValueError):
        brotli_decompress(_real(open("README.md", "rb").read())[:40])
    with pytest.raises(ValueError):
        brotli_decompress(b"\xff" * 10)
    with pytest.raises(ValueError, match="max_output"):
        brotli_decompress(_real(b"a" * 100000), max_output=10)


def test_parquet_brotli_pages_match_pyarrow():
    """Parquet codec 4: our footer walk + page decode + brotli vs pyarrow's
    own reader on the same file (DuckDB cannot read brotli parquet, so the
    second opinion is Arrow's C++ reader)."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from native_sql_engine_spark.operators.parquet_data import read_column

    t = pa.table(
        {
            "k": list(range(3000)),
            "s": [f"value-{i % 97}" for i in range(3000)],
            "f": [i / 7.0 for i in range(3000)],
        }
    )
    with tempfile.NamedTemporaryFile(suffix=".parquet") as f:
        pq.write_table(t, f.name, compression="brotli")
        md = pq.ParquetFile(f.name).metadata.row_group(0).column(0)
        assert md.compression == "BROTLI"
        buf = open(f.name, "rb").read()
        for col in ("k", "s", "f"):
            assert read_column(buf, col) == t[col].to_pylist(), col
