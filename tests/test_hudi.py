"""Hudi COW snapshot resolution (operators/hudi.py): file-slice
supersedence, pending-instant invisibility, time travel, replacecommit
clustering, MOR gates."""

from __future__ import annotations

import os

import pytest

from native_sql_engine_spark.operators.hudi import (
    hudi_snapshot,
    read_hudi,
    write_hudi_fixture,
)

pa = pytest.importorskip("pyarrow")
pq = pytest.importorskip("pyarrow.parquet")


def _mk(d, part, fid, instant, lo, hi):
    p = os.path.join(d, part) if part else d
    os.makedirs(p, exist_ok=True)
    pq.write_table(
        pa.table({"k": pa.array(range(lo, hi), pa.int64())}),
        os.path.join(p, f"{fid}_0-0-0_{instant}.parquet"),
    )


def _table(d):
    """fg1 v001 [0,100) upserted v003 [0,120); fg2 v001 [100,200);
    fg3 v002 [200,300); pending 004 writes fg1 [0,999)."""
    _mk(d, "", "fg1", "001", 0, 100)
    _mk(d, "", "fg2", "001", 100, 200)
    _mk(d, "", "fg3", "002", 200, 300)
    _mk(d, "", "fg1", "003", 0, 120)
    _mk(d, "", "fg1", "004", 0, 999)
    write_hudi_fixture(
        d,
        [("001", "", "fg1"), ("001", "", "fg2"), ("002", "", "fg3"), ("003", "", "fg1")],
        pending=["004"],
    )


def test_snapshot_supersedence_and_pending(tmp_path):
    d = str(tmp_path)
    _table(d)
    s = hudi_snapshot(d)
    names = sorted(os.path.basename(f) for f in s["files"])
    assert names == [
        "fg1_0-0-0_003.parquet",
        "fg2_0-0-0_001.parquet",
        "fg3_0-0-0_002.parquet",
    ]
    s1 = hudi_snapshot(d, as_of="001")
    assert sorted(os.path.basename(f) for f in s1["files"]) == [
        "fg1_0-0-0_001.parquet",
        "fg2_0-0-0_001.parquet",
    ]
    with pytest.raises(ValueError, match="not completed"):
        hudi_snapshot(d, as_of="004")  # the pending instant is not readable


def test_spark_scan_and_time_travel(spark, tmp_path):
    d = str(tmp_path)
    _table(d)
    got = sorted(r.k for r in read_hudi(spark, d).collect())
    assert got == sorted(list(range(0, 120)) + list(range(100, 300)))
    got2 = sorted(r.k for r in read_hudi(spark, d, as_of="002").collect())
    assert got2 == list(range(0, 300))


def test_replacecommit_clustering(tmp_path):
    d = str(tmp_path)
    _table(d)
    _mk(d, "", "fg4", "005", 100, 300)
    write_hudi_fixture(
        d,
        [("001", "", "fg1"), ("001", "", "fg2"), ("002", "", "fg3"),
         ("003", "", "fg1"), ("005", "", "fg4")],
        pending=["004"],
        replaced={"005": {"": ["fg2", "fg3"]}},
    )
    s = hudi_snapshot(d)
    assert sorted(os.path.basename(f) for f in s["files"]) == [
        "fg1_0-0-0_003.parquet",
        "fg4_0-0-0_005.parquet",
    ]
    # time travel BEFORE the replace still sees the replaced groups
    s2 = hudi_snapshot(d, as_of="003")
    assert "fg2_0-0-0_001.parquet" in [os.path.basename(f) for f in s2["files"]]


def test_gates(tmp_path):
    d = str(tmp_path)
    with pytest.raises(ValueError, match="not a Hudi table"):
        hudi_snapshot(d)
    _table(d)
    # a MOR log file anywhere hard-fails (rows would be stale without merging)
    open(os.path.join(d, ".fg1_001.log.1_0-0-0"), "w").close()
    with pytest.raises(NotImplementedError, match="merge-on-read"):
        hudi_snapshot(d)
