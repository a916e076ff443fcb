"""Delta Lake log replay (operators/delta.py): commit/checkpoint
reconstruction, time travel, partition inference through Spark's own
scan, and the protocol gates (deletion vectors, column mapping)."""

from __future__ import annotations

import json
import os

import pytest

from native_sql_engine_spark.operators.delta import (
    delta_snapshot,
    read_delta,
    write_delta_commit,
    write_delta_checkpoint,
)

pa = pytest.importorskip("pyarrow")
pq = pytest.importorskip("pyarrow.parquet")

SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
        ],
    }
)
META = {
    "id": "t1",
    "format": {"provider": "parquet", "options": {}},
    "schemaString": SCHEMA,
    "partitionColumns": [],
    "configuration": {},
    "createdTime": 0,
}


def _mkfile(d, name, lo, hi):
    full = os.path.join(d, name)
    os.makedirs(os.path.dirname(full) or d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "k": pa.array(range(lo, hi), pa.int64()),
                "v": pa.array([float(x) * 0.5 for x in range(lo, hi)]),
            }
        ),
        full,
    )
    return {
        "path": name,
        "partitionValues": {},
        "size": 1,
        "modificationTime": 0,
        "dataChange": True,
    }


def _history(d):
    """v0: add A,B; v1: remove A, add C; checkpoint@1; v2: add D."""
    a = _mkfile(d, "part-A.parquet", 0, 100)
    b = _mkfile(d, "part-B.parquet", 100, 200)
    c = _mkfile(d, "part-C.parquet", 200, 300)
    dd = _mkfile(d, "part-D.parquet", 300, 400)
    write_delta_commit(
        d,
        0,
        [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}, {"metaData": META}, {"add": a}, {"add": b}],
    )
    write_delta_commit(
        d,
        1,
        [
            {"remove": {"path": "part-A.parquet", "deletionTimestamp": 1, "dataChange": True}},
            {"add": c},
        ],
    )
    write_delta_checkpoint(d, 1)
    write_delta_commit(d, 2, [{"add": dd}])


def test_snapshot_replay_and_time_travel(tmp_path):
    d = str(tmp_path)
    _history(d)
    snap = delta_snapshot(d)
    assert snap["version"] == 2
    assert sorted(snap["files"]) == ["part-B.parquet", "part-C.parquet", "part-D.parquet"]
    assert snap["schema"] == SCHEMA
    assert sorted(delta_snapshot(d, 0)["files"]) == ["part-A.parquet", "part-B.parquet"]
    # v1 resolves purely from the checkpoint (start = ck+1 skips commits)
    s1 = delta_snapshot(d, 1)
    assert sorted(s1["files"]) == ["part-B.parquet", "part-C.parquet"]
    assert s1["schema"] == SCHEMA  # metaData survives checkpoint compaction
    with pytest.raises(ValueError, match="beyond latest"):
        delta_snapshot(d, 99)


def test_spark_scan_latest_and_versioned(spark, tmp_path):
    d = str(tmp_path)
    _history(d)
    assert sorted(r.k for r in read_delta(spark, d).collect()) == list(range(100, 400))
    assert sorted(r.k for r in read_delta(spark, d, version=0).collect()) == list(range(0, 200))


def test_partition_columns_via_basepath(spark, tmp_path):
    d = str(tmp_path)
    def mkpart(name, lo, hi):
        full = os.path.join(d, name)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        pq.write_table(pa.table({"k": pa.array(range(lo, hi), pa.int64())}), full)
        return {
            "path": name,
            "partitionValues": {"grp": name.split("=")[1].split("/")[0]},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
        }

    metap = dict(META, partitionColumns=["grp"])
    write_delta_commit(
        d,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": metap},
            {"add": mkpart("grp=x/p1.parquet", 0, 10)},
            {"add": mkpart("grp=y/p2.parquet", 10, 20)},
        ],
    )
    df = read_delta(spark, d)
    assert set(df.columns) == {"k", "grp"}
    assert df.filter("grp = 'y'").count() == 10
    # partition pruning happens in Spark's own scan
    plan = df.filter("grp = 'x'")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or df.filter("grp = 'x'").count() == 10


def test_remove_then_readd(tmp_path):
    d = str(tmp_path)
    a = _mkfile(d, "part-A.parquet", 0, 50)
    write_delta_commit(d, 0, [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}, {"metaData": META}, {"add": a}])
    write_delta_commit(d, 1, [{"remove": {"path": "part-A.parquet", "dataChange": True}}])
    write_delta_commit(d, 2, [{"add": a}])
    assert sorted(delta_snapshot(d, 1)["files"]) == []
    assert sorted(delta_snapshot(d, 2)["files"]) == ["part-A.parquet"]


def test_gates(tmp_path):
    d = str(tmp_path)
    with pytest.raises(ValueError, match="not a Delta table"):
        delta_snapshot(d)
    a = _mkfile(d, "p.parquet", 0, 10)
    write_delta_commit(d, 0, [{"metaData": META}, {"add": a}])
    # deletion vectors must hard-fail, not resurrect rows
    write_delta_commit(
        d,
        1,
        [{"add": {**a, "deletionVector": {"storageType": "u", "pathOrInlineDv": "x"}}}],
    )
    with pytest.raises(NotImplementedError, match="deletion vector"):
        delta_snapshot(d)
    # reader version 3 with unsupported features
    d2 = str(tmp_path / "v3")
    os.makedirs(d2)
    write_delta_commit(
        d2,
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                }
            },
            {"metaData": META},
        ],
    )
    with pytest.raises(NotImplementedError, match="reader features"):
        delta_snapshot(d2)
    # malformed JSON is positioned
    d3 = str(tmp_path / "bad")
    os.makedirs(os.path.join(d3, "_delta_log"))
    with open(os.path.join(d3, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write('{"add": not-json}\n')
    with pytest.raises(ValueError, match="line 1"):
        delta_snapshot(d3)
