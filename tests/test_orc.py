"""From-scratch ORC reader (operators/orc.py): protobuf tail walk, chunk
framing over five codecs, byte/boolean RLE, all four RLEv2 sub-encodings,
string dictionary/direct, PRESENT nulls, timestamps/dates/decimals —
cross-validated against pyarrow's C++ ORC writer AND Spark's java writer.
Reference parity: the reference's arrow-data-source reads ORC beside
parquet/csv (arrow Dataset FileFormat)."""

from __future__ import annotations

import datetime as dt
import decimal
import random

import pytest

from native_sql_engine_spark.operators.orc import (
    _byte_rle,
    _bool_rle,
    _rlev2,
    orc_metadata,
    read_orc_column,
    read_orc_table,
)

pa = pytest.importorskip("pyarrow")
po = pytest.importorskip("pyarrow.orc")


def _table(n=5000, seed=42):
    rng = random.Random(seed)
    return pa.table(
        {
            "b": pa.array([rng.random() < 0.5 for _ in range(n)], pa.bool_()),
            "i8": pa.array([rng.randint(-128, 127) for _ in range(n)], pa.int8()),
            "i16": pa.array([rng.randint(-(2**15), 2**15 - 1) for _ in range(n)], pa.int16()),
            "i32": pa.array([rng.randint(-(2**31), 2**31 - 1) for _ in range(n)], pa.int32()),
            "i64": pa.array([rng.randint(-(2**62), 2**62) for _ in range(n)], pa.int64()),
            "f32": pa.array([rng.uniform(-1e5, 1e5) for _ in range(n)], pa.float32()),
            "f64": pa.array([rng.uniform(-1e9, 1e9) for _ in range(n)], pa.float64()),
            "s": pa.array([f"val-{rng.randint(0, 50)}-{'x' * rng.randint(0, 8)}" for _ in range(n)]),
            "bin": pa.array(
                [bytes(rng.randint(0, 255) for _ in range(rng.randint(0, 12))) for _ in range(n)],
                pa.binary(),
            ),
            "d": pa.array(
                [dt.date(1970, 1, 1) + dt.timedelta(days=rng.randint(-20000, 20000)) for _ in range(n)],
                pa.date32(),
            ),
            "ts": pa.array(
                [
                    dt.datetime(2014, 12, 25)  # spans the 2015-01-01 ORC epoch
                    + dt.timedelta(seconds=rng.randint(0, 10**8), microseconds=rng.randint(0, 999999))
                    for _ in range(n)
                ],
                pa.timestamp("us"),
            ),
            "opt": pa.array(
                [None if rng.random() < 0.3 else rng.randint(0, 10**6) for _ in range(n)], pa.int64()
            ),
            "dec": pa.array(
                [decimal.Decimal(rng.randint(-(10**12), 10**12)).scaleb(-4) for _ in range(n)],
                pa.decimal128(18, 4),
            ),
            # precision > 18: same varint DATA + SECONDARY scale streams,
            # unscaled values wider than 64 bits
            "dec32": pa.array(
                [
                    None
                    if rng.random() < 0.1
                    else decimal.Decimal(rng.randint(-(10**25), 10**25)).scaleb(-6)
                    for _ in range(n)
                ],
                pa.decimal128(32, 6),
            ),
        }
    )


@pytest.mark.parametrize("comp", ["uncompressed", "snappy", "zlib", "lz4", "zstd"])
@pytest.mark.parametrize("dict_thresh", [0.0, 1.0])
def test_pyarrow_matrix(tmp_path, comp, dict_thresh):
    tbl = _table()
    path = tmp_path / "m.orc"
    po.write_table(
        tbl,
        path,
        compression=comp,
        dictionary_key_size_threshold=dict_thresh,
        stripe_size=64 * 1024 if dict_thresh else 64 * 1024 * 1024,
    )
    buf = path.read_bytes()
    got = read_orc_table(buf, tbl.column_names)
    ref = po.ORCFile(path).read()
    for col in tbl.column_names:
        assert got[col] == ref.column(col).to_pylist(), (comp, dict_thresh, col)


def test_multi_stripe_and_metadata(tmp_path):
    tbl = _table(20000, seed=1)
    path = tmp_path / "ms.orc"
    po.write_table(tbl, path, compression="zlib", stripe_size=64 * 1024)
    buf = path.read_bytes()
    meta = orc_metadata(buf)
    assert meta["num_rows"] == 20000
    assert meta["codec"] == "zlib"
    assert meta["num_stripes"] > 1
    assert sum(meta["stripe_rows"]) == 20000
    assert meta["columns"]["i64"] == "long" and meta["columns"]["s"] == "string"
    got = read_orc_column(buf, "i64")
    assert got == po.ORCFile(path).read().column("i64").to_pylist()


def test_patched_base_with_outliers(tmp_path):
    """Clustered small values + rare huge outliers force PATCHED_BASE runs
    (gap>255 zero-patch splits and rounded patch-entry widths included);
    a negative shift exercises the sign-magnitude base."""
    rng = random.Random(7)
    vals = [rng.randint(0, 100) for _ in range(5000)]
    for i in range(0, 5000, 137):
        vals[i] = rng.randint(2**40, 2**45)
    neg = [v - 50 for v in vals]
    sparse = list(vals)
    sparse[0] = 2**44  # lone outlier -> gap > 255 split entries
    for i in range(1, 5000):
        sparse[i] = rng.randint(0, 60)
    sparse[4600] = 2**43
    t = pa.table(
        {
            "p": pa.array(vals, pa.int64()),
            "pn": pa.array(neg, pa.int64()),
            "sp": pa.array(sparse, pa.int64()),
        }
    )
    path = tmp_path / "pb.orc"
    po.write_table(t, path, compression="uncompressed")
    got = read_orc_table(path.read_bytes(), ["p", "pn", "sp"])
    assert got["p"] == vals and got["pn"] == neg and got["sp"] == sparse


def test_spark_java_writer_roundtrip(spark, tmp_path):
    """Spark's java ORC writer (zstd stripes, java RLEv2 encoder) is a
    second independent real writer; every column must match collect()."""
    sdf = spark.createDataFrame(
        [
            (i, f"s{i % 9}", float(i) * 0.5, dt.date(2000, 1, 1) + dt.timedelta(days=i % 3000))
            for i in range(20000)
        ],
        "k long, s string, v double, d date",
    )
    d = str(tmp_path / "sparkorc")
    sdf.coalesce(1).write.mode("overwrite").orc(d)
    import glob

    f = glob.glob(d + "/*.orc")[0]
    buf = open(f, "rb").read()
    assert orc_metadata(buf)["num_rows"] == 20000
    got = read_orc_table(buf, ["k", "s", "v", "d"])
    want = sorted((r.k, r.s, r.v, r.d) for r in sdf.collect())
    assert sorted(zip(got["k"], got["s"], got["v"], got["d"])) == want


def test_rle_primitives():
    # byte RLE: run of 3+h, literals of 256-h
    assert _byte_rle(bytes([0, 7]), 3) == [7, 7, 7]
    assert _byte_rle(bytes([0x80 | 0x7E, 1, 2]), 2) == [1, 2]  # 0xFE -> 2 literals
    # boolean RLE: 0x01 run-of-3 bytes 0xAA
    bits = _bool_rle(bytes([0, 0xAA]), 10)
    assert bits == [True, False, True, False, True, False, True, False, True, False]
    # RLEv2 SHORT_REPEAT: spec example 10000 x5 -> 0a 27 10
    assert _rlev2(bytes.fromhex("0a2710"), 5, signed=False) == [10000] * 5
    # RLEv2 DIRECT: spec example [23713, 43806, 57005, 48879] -> 5e 03 5c a1 ab 1e de ad be ef
    assert _rlev2(bytes.fromhex("5e035ca1ab1edeadbeef"), 4, signed=False) == [
        23713,
        43806,
        57005,
        48879,
    ]
    # RLEv2 DELTA: spec example [2,3,5,7,11,13,17,19,23,29] -> c6 09 02 02 22 42 42 46
    assert _rlev2(bytes.fromhex("c609020222424246"), 10, signed=False) == [
        2, 3, 5, 7, 11, 13, 17, 19, 23, 29,
    ]
    # PATCHED_BASE correctness rides the constructed-outlier fixtures above
    # (the spec's hex example differs across doc revisions).


def test_errors_and_gates(tmp_path):
    with pytest.raises(ValueError, match="magic"):
        read_orc_column(b"PAR1" + bytes(20), "x")
    tbl = pa.table({"x": pa.array(range(10), pa.int64())})
    path = tmp_path / "g.orc"
    po.write_table(tbl, path, compression="snappy")
    buf = path.read_bytes()
    with pytest.raises(ValueError, match="not in ORC schema"):
        read_orc_column(buf, "nope")
    # truncated tail
    with pytest.raises(ValueError):
        read_orc_column(buf[: len(buf) // 2] + buf[-1:], "x")
    # nested list/struct/map now decode (test_nested_types_matrix); union stays gated
    nested = pa.table({"l": pa.array([[1, 2], [3]], pa.list_(pa.int64()))})
    npath = tmp_path / "n.orc"
    po.write_table(nested, npath)
    assert read_orc_column(npath.read_bytes(), "l") == [[1, 2], [3]]


def test_empty_and_single_row(tmp_path):
    tbl = pa.table({"x": pa.array([], pa.int64()), "s": pa.array([], pa.string())})
    path = tmp_path / "e.orc"
    po.write_table(tbl, path)
    got = read_orc_table(path.read_bytes(), ["x", "s"])
    assert got == {"x": [], "s": []}
    one = pa.table({"x": pa.array([-(2**60)], pa.int64()), "s": pa.array(["only"])})
    po.write_table(one, path)
    got = read_orc_table(path.read_bytes(), ["x", "s"])
    assert got == {"x": [-(2**60)], "s": ["only"]}


def _writer_cols():
    return {
        "k": list(range(2000)) + [-5, 2**40, 0],
        "v": [i * 0.25 for i in range(2003)],
        "s": [f"name-{i % 13}" for i in range(2003)],
    }


def test_own_writer_roundtrip():
    from native_sql_engine_spark.operators.orc import write_orc

    cols = _writer_cols()
    buf = write_orc(cols)
    assert orc_metadata(buf)["columns"] == {"k": "long", "v": "double", "s": "string"}
    assert read_orc_table(buf, ["k", "v", "s"]) == cols


def test_own_writer_read_by_pyarrow():
    import io

    from native_sql_engine_spark.operators.orc import write_orc

    cols = _writer_cols()
    t = po.ORCFile(io.BytesIO(write_orc(cols))).read()
    for name, want in cols.items():
        assert t.column(name).to_pylist() == want


def test_own_writer_read_by_spark(spark, tmp_path):
    from native_sql_engine_spark.operators.orc import write_orc

    cols = {"k": list(range(1000)), "s": [f"x{i % 7}" for i in range(1000)]}
    d = tmp_path / "ours"
    d.mkdir()
    (d / "part-0.orc").write_bytes(write_orc(cols))
    df = spark.read.orc(str(d))
    assert sorted((r.k, r.s) for r in df.collect()) == sorted(zip(cols["k"], cols["s"]))


def test_all_null_column(tmp_path):
    tbl = pa.table({"n": pa.array([None] * 100, pa.int64()), "k": pa.array(range(100), pa.int64())})
    path = tmp_path / "nul.orc"
    po.write_table(tbl, path, compression="zstd")
    got = read_orc_table(path.read_bytes(), ["n", "k"])
    assert got["n"] == [None] * 100
    assert got["k"] == list(range(100))


@pytest.mark.parametrize("comp", ["UNCOMPRESSED", "ZLIB", "SNAPPY", "ZSTD"])
def test_nested_types_matrix(tmp_path, comp):
    """Nested struct/list/map decode (round-8 verdict order #6): LENGTH
    streams, parent-present child counts (ORC has no def/rep levels —
    children store values only for rows where every ancestor is non-null),
    dict rows for structs, (key, value) tuples for maps, arbitrary depth.
    Compared against pyarrow's own reader per codec."""
    import io

    n = 400
    li = [None if i % 9 == 0 else [j * i for j in range(i % 5)] for i in range(n)]
    ls = [
        None if i % 13 == 0 else [f"s{i}_{j}" if j % 2 else None for j in range(i % 4)]
        for i in range(n)
    ]
    st = [None if i % 7 == 0 else {"a": i if i % 3 else None, "b": f"x{i}"} for i in range(n)]
    mp = [None if i % 11 == 0 else [(f"k{j}", i * j) for j in range(i % 3)] for i in range(n)]
    deep = [
        None if i % 17 == 0 else [{"v": [i, i + 1], "t": f"d{i}"}] * (i % 2 + 1)
        for i in range(n)
    ]
    t = pa.table(
        {
            "li": pa.array(li, type=pa.list_(pa.int64())),
            "ls": pa.array(ls, type=pa.list_(pa.string())),
            "st": pa.array(st, type=pa.struct([("a", pa.int64()), ("b", pa.string())])),
            "mp": pa.array(mp, type=pa.map_(pa.string(), pa.int64())),
            "deep": pa.array(
                deep,
                type=pa.list_(pa.struct([("v", pa.list_(pa.int64())), ("t", pa.string())])),
            ),
        }
    )
    b = io.BytesIO()
    po.write_table(t, b, compression=comp)
    buf = b.getvalue()
    got = read_orc_table(buf, ["li", "ls", "st", "mp", "deep"])
    back = po.read_table(io.BytesIO(buf))
    for c in got:
        assert got[c] == back.column(c).to_pylist(), (comp, c)


def test_nested_spark_java_writer(spark, tmp_path):
    """Spark's java ORC writer emits nested columns with its own RLEv2
    encoder and stripe layout — a second independent real writer for the
    nested path."""
    rows = [
        (
            i,
            None if i % 9 == 0 else [float(j) * 0.25 for j in range(i % 4)],
            (i % 5, f"p{i % 7}"),
        )
        for i in range(5000)
    ]
    sdf = spark.createDataFrame(rows, "k long, v array<double>, s struct<x: int, y: string>")
    d = str(tmp_path / "sparknested")
    sdf.coalesce(1).write.mode("overwrite").orc(d)
    import glob

    f = glob.glob(d + "/*.orc")[0]
    got = read_orc_table(open(f, "rb").read(), ["k", "v", "s"])
    want = {r.k: (r.v, r.s) for r in sdf.collect()}
    assert len(got["k"]) == 5000
    for k, v, s in zip(got["k"], got["v"], got["s"]):
        wv, ws = want[k]
        assert v == wv, k
        assert s == {"x": ws.x, "y": ws.y}, k


def test_rlev1_encodings(spark, tmp_path):
    """RLE v1 (pre-0.12 DIRECT/DICTIONARY encodings): our rle_version=1
    fixture files decode identically through our reader, pyarrow's C++
    reader AND Spark's java reader — three independent spec readings of
    the same bytes."""
    import io
    import random

    from native_sql_engine_spark.operators.orc import (
        _rlev1,
        _rlev1_encode,
        write_orc,
    )

    rng = random.Random(11)
    # codec-level: runs, literals, negative deltas, singletons
    for vals in (
        list(range(500)),
        [rng.randint(-(10**12), 10**12) for _ in range(333)],
        [7] * 130 + list(range(100, 0, -1)) + [rng.randint(0, 5) for _ in range(40)],
        [42],
        [1, 2],
    ):
        for signed in (True, False):
            vv = vals if signed else [abs(v) for v in vals]
            assert _rlev1(_rlev1_encode(vv, signed), len(vv), signed) == vv
    with pytest.raises(ValueError, match="RLEv1"):
        _rlev1(b"\x00\x01", 3, signed=False)  # run header, truncated base

    cols = {
        "k": list(range(5000)),
        "r": [rng.randint(-(10**9), 10**9) for _ in range(5000)],
        "s": [f"name-{i % 97}-{'y' * (i % 5)}" for i in range(5000)],
    }
    buf = write_orc(cols, rle_version=1)
    from native_sql_engine_spark.operators.orc import read_orc_table as rt

    assert rt(buf, list(cols)) == cols
    t = po.read_table(__import__("io").BytesIO(buf))
    for c in cols:
        assert t.column(c).to_pylist() == cols[c], c
    p = tmp_path / "v1.orc"
    p.write_bytes(buf)
    got = {r.k: (r.r, r.s) for r in spark.read.orc(str(p)).collect()}
    assert len(got) == 5000 and got[17] == (cols["r"][17], cols["s"][17])


def test_stripe_statistics_pruning(tmp_path):
    """Stripe-statistics pruning (the ORC sibling of parquet PageIndex):
    stripes whose Metadata min/max can't intersect the range are never
    decompressed; conservative on missing stats; int, string and double
    bounds; pyarrow's own writer produces the Metadata under test."""
    import io

    from native_sql_engine_spark.operators.orc import (
        orc_stripe_stats,
        read_orc_table_pruned,
    )

    n = 200000
    t = pa.table(
        {
            "k": pa.array(range(n), pa.int64()),
            "s": pa.array([f"g{i // 25000}" for i in range(n)]),
            "v": pa.array([i * 0.5 for i in range(n)]),
        }
    )
    b = io.BytesIO()
    po.write_table(t, b, compression="zlib", stripe_size=64 * 1024)
    buf = b.getvalue()
    stats = orc_stripe_stats(buf)
    assert len(stats) > 2, "fixture must be multi-stripe"
    assert stats[0]["k"][0] == 0 and stats[-1]["k"][1] == n - 1

    cols, read, total = read_orc_table_pruned(buf, ["k", "v"], {"k": (50000, 50100)})
    assert read < total
    assert [k for k in cols["k"] if 50000 <= k <= 50100] == list(range(50000, 50101))
    # exact filter over kept stripes matches the unpruned read
    assert [v for k, v in zip(cols["k"], cols["v"]) if k == 50050] == [25025.0]

    _, r_str, t_str = read_orc_table_pruned(buf, ["s"], {"s": ("g0", "g0")})
    assert r_str < t_str
    _, r_dbl, t_dbl = read_orc_table_pruned(buf, ["v"], {"v": (10.0, 20.0)})
    assert r_dbl < t_dbl
    cols0, r0, _ = read_orc_table_pruned(buf, ["k"], {"k": (10**12, 10**12)})
    assert r0 == 0 and cols0["k"] == []
    # unknown column in ranges: conservative, everything read
    _, r_all, t_all = read_orc_table_pruned(buf, ["k"], {"nope": (0, 1)})
    assert r_all == t_all


def test_pruning_without_metadata_reads_all_stripes(tmp_path):
    """A multi-stripe file with NO Metadata section (metadataLength=0 in
    the postscript — legal; stats are optional) must read every stripe:
    the stripe count comes from the footer's StripeInformation list, not
    the stats list, so missing stats mean conservative keep, never drop."""
    import io

    from native_sql_engine_spark.operators.orc import (
        orc_stripe_stats,
        pb_decode,
        pb_encode,
        read_orc_table_pruned,
    )

    n = 200000
    t = pa.table(
        {
            "k": pa.array(range(n), pa.int64()),
            "s": pa.array([f"g{i // 25000}" for i in range(n)]),
            "v": pa.array([i * 0.5 for i in range(n)]),
        }
    )
    b = io.BytesIO()
    po.write_table(t, b, compression="zlib", stripe_size=64 * 1024)
    buf = b.getvalue()
    # rewrite the postscript with metadataLength=0 (the Metadata bytes
    # become dead padding before the footer; all stripe offsets are
    # absolute and unaffected)
    ps_len = buf[-1]
    ps = pb_decode(buf[-1 - ps_len : -1])
    fields = []
    for fno in sorted(ps):
        for v in ps[fno]:
            fields.append((fno, 0 if fno == 5 else v))
    new_ps = pb_encode(fields)
    buf2 = buf[: -1 - ps_len] + new_ps + bytes([len(new_ps)])

    assert orc_stripe_stats(buf2) == []
    cols, read, total = read_orc_table_pruned(buf2, ["k"], {"k": (0, 10)})
    assert total > 1, "fixture must be multi-stripe"
    assert read == total  # no stats -> conservative: every stripe read
    assert cols["k"] == list(range(n))  # no rows lost
