"""Parquet PageIndex (operators/parquet_index.py): ColumnIndex/OffsetIndex
decode and page-pruned scans — pruned result ≡ full-scan-filter, and the
page counters prove pages were actually skipped."""

from __future__ import annotations

import random

import pytest

from native_sql_engine_spark.operators.parquet_index import (
    page_index,
    read_column_pruned,
)

pa = pytest.importorskip("pyarrow")
pq = pytest.importorskip("pyarrow.parquet")


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    rng = random.Random(3)
    n = 50000
    t = pa.table(
        {
            "k": pa.array(range(n), pa.int64()),
            "s": pa.array([f"u{i:07d}" for i in range(n)]),
            "v": pa.array([rng.uniform(0, 1) for _ in range(n)], pa.float64()),
            "opt": pa.array([None if i % 7 == 0 else i for i in range(n)], pa.int64()),
            "g": pa.array([f"grp-{i // 1000}" for i in range(n)]),
        }
    )
    p = tmp_path_factory.mktemp("pi") / "t.parquet"
    pq.write_table(
        t,
        p,
        data_page_size=4096,
        write_page_index=True,
        row_group_size=20000,
        compression="snappy",
    )
    return p.read_bytes(), t


def test_page_index_shape(fixture):
    buf, t = fixture
    idx = page_index(buf, "k")
    assert len(idx) == 3  # three row groups
    p0 = idx[0][0]
    assert p0["first_row"] == 0 and p0["min"] == 0 and p0["rows"] > 0
    assert sum(p["rows"] for p in idx[0]) == 20000
    # monotone mins on the sorted column
    mins = [p["min"] for p in idx[0]]
    assert mins == sorted(mins)


@pytest.mark.parametrize(
    "col,lo,hi",
    [
        ("k", 20000, 20500),  # spans a row-group boundary
        ("s", "u0010000", "u0010050"),
        ("opt", 30000, 30100),  # PRESENT nulls interleaved
        ("g", "grp-25", "grp-25"),  # dictionary-encoded chunk
    ],
)
def test_pruned_equals_full_filter_and_skips(fixture, col, lo, hi):
    buf, t = fixture
    vals, read, total = read_column_pruned(buf, col, lo, hi)
    full = [x for x in t.column(col).to_pylist() if x is not None and lo <= x <= hi]
    assert vals == full
    assert read < total, "no pages were skipped on a sorted/clustered column"


def test_unsorted_column_stays_correct(fixture):
    buf, t = fixture
    vals, read, total = read_column_pruned(buf, "v", 0.25, 0.26)
    full = [x for x in t.column("v").to_pylist() if 0.25 <= x <= 0.26]
    assert sorted(vals) == sorted(full) and len(vals) > 0
    # random data gives no skippable pages — correctness must not depend on it
    assert read == total


def test_empty_range_reads_nothing(fixture):
    buf, _ = fixture
    vals, read, total = read_column_pruned(buf, "k", 10**9, 2 * 10**9)
    assert vals == [] and read == 0 and total > 0


def test_missing_index_gates(tmp_path):
    t = pa.table({"k": pa.array(range(100), pa.int64())})
    p = tmp_path / "n.parquet"
    pq.write_table(t, p, write_page_index=False)
    with pytest.raises(ValueError, match="no written PageIndex"):
        page_index(p.read_bytes(), "k")
    with pytest.raises(ValueError, match="not in schema"):
        page_index(p.read_bytes(), "zzz")
