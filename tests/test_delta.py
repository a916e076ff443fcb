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
    # minReaderVersion=2 ("column mapping capable") now opens fine; a table
    # that actually ENABLES an unknown mapping mode still gates
    write_delta_commit(
        d,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": META},
            {"add": a},
        ],
    )
    assert sorted(delta_snapshot(d)["files"]) == ["p.parquet"]
    d1 = str(tmp_path / "cmcfg")
    os.makedirs(d1)
    a1 = _mkfile(d1, "p.parquet", 0, 10)
    metacm = dict(META, configuration={"delta.columnMapping.mode": "bogus"})
    write_delta_commit(
        d1,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": metacm},
            {"add": a1},
        ],
    )
    with pytest.raises(NotImplementedError, match="column mapping"):
        delta_snapshot(d1)
    # reader version 3 with an unsupported feature
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
                    "readerFeatures": ["deletionVectors", "typeWidening"],
                }
            },
            {"metaData": META},
        ],
    )
    with pytest.raises(NotImplementedError, match="typeWidening"):
        delta_snapshot(d2)
    # malformed JSON is positioned
    d3 = str(tmp_path / "bad")
    os.makedirs(os.path.join(d3, "_delta_log"))
    with open(os.path.join(d3, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write('{"add": not-json}\n')
    with pytest.raises(ValueError, match="line 1"):
        delta_snapshot(d3)


# -- deletion vectors ------------------------------------------------------------------


def _dv_history(d):
    """v0: add A[0,100) B[100,200); v1: DV on A (rows 3,7,50) + inline DV
    on B (rows 5,10 -> keys 105,110)."""
    from native_sql_engine_spark.operators.delta import (
        inline_dv_descriptor,
        write_deletion_vector,
    )

    a = _mkfile(d, "A.parquet", 0, 100)
    b = _mkfile(d, "B.parquet", 100, 200)
    dv_a = write_deletion_vector(d, [3, 7, 50], prefix="ab")
    dv_b = inline_dv_descriptor([5, 10])
    write_delta_commit(
        d,
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
            {"add": a},
            {"add": b},
        ],
    )
    write_delta_commit(
        d,
        1,
        [
            {"remove": {"path": "A.parquet", "dataChange": True}},
            {"add": {**a, "deletionVector": dv_a}},
            {"remove": {"path": "B.parquet", "dataChange": True}},
            {"add": {**b, "deletionVector": dv_b}},
        ],
    )
    return a, dv_a, dv_b


def test_dv_decode_driver_side(tmp_path):
    from native_sql_engine_spark.operators.delta import (
        read_deletion_vector,
        write_deletion_vector,
    )

    d = str(tmp_path)
    dv = write_deletion_vector(d, [9, 1, 9, 4], prefix="xy")
    assert dv["cardinality"] == 3  # deduped
    assert read_deletion_vector(d, dv) == [1, 4, 9]
    # big + cross-bucket positions exercise bitset containers and 64-bit keys
    big = sorted(set(range(10_000)) | {(1 << 32) + 3})
    dv2 = write_deletion_vector(d, big)
    assert read_deletion_vector(d, dv2) == big


def test_dv_scan_and_time_travel(spark, tmp_path):
    d = str(tmp_path)
    _dv_history(d)
    got = sorted(r.k for r in read_delta(spark, d).collect())
    assert got == sorted(set(range(200)) - {3, 7, 50, 105, 110})
    # pre-DV version must resurrect nothing-is-deleted
    assert sorted(r.k for r in read_delta(spark, d, version=0).collect()) == list(
        range(200)
    )


def test_dv_survives_checkpoint(spark, tmp_path):
    d = str(tmp_path)
    _dv_history(d)
    write_delta_checkpoint(d, 1)
    c = _mkfile(d, "C.parquet", 200, 250)
    write_delta_commit(d, 2, [{"add": c}])
    snap = delta_snapshot(d)  # resumes from the checkpoint
    assert snap["files"]["A.parquet"].get("deletionVector"), "checkpoint dropped DV"
    got = sorted(r.k for r in read_delta(spark, d).collect())
    assert got == sorted(set(range(250)) - {3, 7, 50, 105, 110})


def test_dv_integrity_checks(tmp_path):
    from native_sql_engine_spark.operators.delta import (
        read_deletion_vector,
        write_deletion_vector,
    )

    d = str(tmp_path)
    dv = write_deletion_vector(d, [1, 2, 3])
    # corrupt one payload byte -> CRC must catch it
    import glob

    [binpath] = glob.glob(os.path.join(d, "deletion_vector_*.bin"))
    blob = bytearray(open(binpath, "rb").read())
    blob[10] ^= 0xFF
    open(binpath, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="checksum"):
        read_deletion_vector(d, dv)
    # cardinality lie must be rejected
    dv2 = write_deletion_vector(d, [1, 2, 3], prefix="ok")
    with pytest.raises(ValueError, match="cardinality"):
        read_deletion_vector(d, {**dv2, "cardinality": 99})


def _cm_schema(phys_k, phys_s):
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "k",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": phys_k,
                    },
                },
                {
                    "name": "s",
                    "type": "string",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": phys_s,
                    },
                },
            ],
        }
    )


def test_column_mapping_name_mode(spark, tmp_path):
    """Column mapping 'name' mode: parquet stores physical col-<uuid>
    names; the reader must return LOGICAL names — the exact wrong-schema
    hazard the old rv=2 gate existed for, now resolved instead of gated."""
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "col-aaa111": pa.array(range(80), pa.int64()),
                "col-bbb222": pa.array([f"v{i % 5}" for i in range(80)]),
            }
        ),
        os.path.join(d, "p.parquet"),
    )
    meta = dict(
        META,
        schemaString=_cm_schema("col-aaa111", "col-bbb222"),
        configuration={"delta.columnMapping.mode": "name"},
    )
    write_delta_commit(
        d,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": meta},
            {"add": {"path": "p.parquet", "dataChange": True}},
        ],
    )
    df = read_delta(spark, d)
    assert df.columns == ["k", "s"]
    rows = df.orderBy("k").collect()
    assert [r.k for r in rows] == list(range(80)) and rows[7].s == "v2"


def test_column_mapping_id_mode(spark, tmp_path):
    """'id' mode: resolution is by parquet field id via Spark's own
    fieldId reader — physical names and column ORDER are scrambled on
    purpose, so a name- or position-based read cannot pass."""
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "zz": pa.array([f"v{i % 5}" for i in range(80)], pa.string()),
                "aa": pa.array(range(80), pa.int64()),
            },
            schema=pa.schema(
                [
                    pa.field("zz", pa.string(), metadata={b"PARQUET:field_id": b"2"}),
                    pa.field("aa", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
                ]
            ),
        ),
        os.path.join(d, "p.parquet"),
    )
    meta = dict(
        META,
        schemaString=_cm_schema("aa", "zz"),
        configuration={"delta.columnMapping.mode": "id"},
    )
    write_delta_commit(
        d,
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["columnMapping"],
                    "writerFeatures": ["columnMapping"],
                }
            },
            {"metaData": meta},
            {"add": {"path": "p.parquet", "dataChange": True}},
        ],
    )
    df = read_delta(spark, d)
    assert df.columns == ["k", "s"]
    rows = df.orderBy("k").collect()
    assert [r.k for r in rows] == list(range(80)) and rows[7].s == "v2"


def test_column_mapping_gates(spark, tmp_path):
    """Maps with STRUCT KEYS stay honestly gated (transform_keys
    rebuilds exist but no mainstream writer emits them); a mapping table
    whose schema lacks the metadata is malformed."""
    d = str(tmp_path)
    _mkfile(d, "p.parquet", 0, 10)
    nested = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "m",
                    "type": {
                        "type": "map",
                        "keyType": {"type": "struct", "fields": []},
                        "valueType": "long",
                        "valueContainsNull": True,
                    },
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": "col-x",
                    },
                }
            ],
        }
    )
    meta = dict(
        META, schemaString=nested, configuration={"delta.columnMapping.mode": "name"}
    )
    write_delta_commit(
        d,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": meta},
            {"add": {"path": "p.parquet", "dataChange": True}},
        ],
    )
    with pytest.raises(NotImplementedError, match="map KEYS"):
        read_delta(spark, d)
    d2 = str(tmp_path / "missingmeta")
    os.makedirs(d2)
    _mkfile(d2, "p.parquet", 0, 10)
    meta2 = dict(META, configuration={"delta.columnMapping.mode": "name"})
    write_delta_commit(
        d2,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": meta2},
            {"add": {"path": "p.parquet", "dataChange": True}},
        ],
    )
    with pytest.raises(ValueError, match="physicalName"):
        read_delta(spark, d2)


def test_v2_checkpoint_with_sidecars(spark, tmp_path):
    """V2 checkpoints (v2Checkpoint reader feature): UUID-named json
    checkpoint with checkpointMetadata/protocol/metaData lines and add
    actions sharded across parquet sidecars under _delta_log/_sidecars/.
    Pre-checkpoint commits are DELETED so the state can only come from
    the checkpoint + tail commits."""
    from native_sql_engine_spark.operators.delta import write_delta_checkpoint_v2

    d = str(tmp_path)
    adds = [_mkfile(d, f"p{i}.parquet", i * 10, (i + 1) * 10) for i in range(5)]
    write_delta_commit(
        d,
        0,
        [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}, {"metaData": META}]
        + [{"add": a} for a in adds[:3]],
    )
    write_delta_commit(
        d, 1, [{"remove": {"path": "p0.parquet", "dataChange": True}}, {"add": adds[3]}]
    )
    ck = write_delta_checkpoint_v2(d, 1, sidecar_parts=2)
    assert ck.endswith(".json") and ".checkpoint." in ck
    os.unlink(os.path.join(d, "_delta_log", f"{0:020d}.json"))
    os.unlink(os.path.join(d, "_delta_log", f"{1:020d}.json"))
    write_delta_commit(d, 2, [{"add": adds[4]}])
    snap = delta_snapshot(d)
    assert sorted(snap["files"]) == [f"p{i}.parquet" for i in range(1, 5)]
    got = sorted(r.k for r in read_delta(spark, d).collect())
    assert got == list(range(10, 50))
    # a missing sidecar must hard-fail, not silently drop files
    import glob

    sc = glob.glob(os.path.join(d, "_delta_log", "_sidecars", "*.parquet"))[0]
    os.unlink(sc)
    with pytest.raises(ValueError, match="sidecar missing"):
        delta_snapshot(d)


def test_change_data_feed(spark, tmp_path):
    """CDF (delta.enableChangeDataFeed): cdc actions are authoritative
    and suppress add/remove derivation in their commit; commits without
    cdc derive insert from dataChange adds and delete from dataChange
    removes; compaction commits (dataChange=false) emit NO changes;
    version bounds are inclusive; a vacuumed removed file hard-fails."""
    import pyarrow as pa_
    import pyarrow.parquet as pq_

    from native_sql_engine_spark.operators.delta import read_delta_cdf

    d = str(tmp_path)
    a = _mkfile(d, "A.parquet", 0, 50)
    b = _mkfile(d, "B.parquet", 50, 80)
    write_delta_commit(
        d,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
            {"metaData": dict(META, configuration={"delta.enableChangeDataFeed": "true"})},
            {"add": a},
            {"add": b},
            {"commitInfo": {"timestamp": 1000}},
        ],
    )
    # v1: an UPDATE commit — cdc file carries pre/post images; the rewritten
    # add/remove in the same commit must NOT double-count
    os.makedirs(os.path.join(d, "_change_data"))
    pq_.write_table(
        pa_.table(
            {
                "k": pa_.array([10, 10], pa_.int64()),
                "v": pa_.array([5.0, 99.0]),
                "_change_type": pa_.array(["update_preimage", "update_postimage"]),
            }
        ),
        os.path.join(d, "_change_data", "cdc-0.parquet"),
    )
    a2 = _mkfile(d, "A2.parquet", 0, 50)
    write_delta_commit(
        d,
        1,
        [
            {"cdc": {"path": "_change_data/cdc-0.parquet", "partitionValues": {},
                     "size": 1, "dataChange": False}},
            {"remove": {"path": "A.parquet", "dataChange": True}},
            {"add": a2},
            {"commitInfo": {"timestamp": 2000}},
        ],
    )
    # v2: plain delete of B (derived)
    write_delta_commit(
        d, 2, [{"remove": {"path": "B.parquet", "dataChange": True}},
               {"commitInfo": {"timestamp": 3000}}]
    )
    # v3: compaction — rewrites A2 with dataChange=false, NO changes emitted
    a3 = _mkfile(d, "A3.parquet", 0, 50)
    a3["dataChange"] = False
    write_delta_commit(
        d, 3, [{"remove": {"path": "A2.parquet", "dataChange": False}}, {"add": a3}]
    )

    cdf = read_delta_cdf(spark, d, 0, 3)
    rows = cdf.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r._change_type, []).append(r)
    assert len(by_type["insert"]) == 80  # v0 adds
    assert {r._commit_version for r in by_type["insert"]} == {0}
    assert [r.v for r in by_type["update_preimage"]] == [5.0]
    assert [r.v for r in by_type["update_postimage"]] == [99.0]
    assert {r._commit_timestamp for r in by_type["update_postimage"]} == {2000}
    assert len(by_type["delete"]) == 30 and {r._commit_version for r in by_type["delete"]} == {2}
    assert "insert" not in {r._change_type for r in rows if r._commit_version == 3}

    # version bounds
    only_v2 = read_delta_cdf(spark, d, 2, 2)
    assert {r._change_type for r in only_v2.collect()} == {"delete"}

    # vacuumed removed file must hard-fail, not silently drop deletes
    os.unlink(os.path.join(d, "B.parquet"))
    with pytest.raises(ValueError, match="vacuumed"):
        read_delta_cdf(spark, d, 2, 2)


def test_column_mapping_name_mode_partitioned(spark, tmp_path):
    """'name' mode over a PARTITIONED table: hive directories carry the
    physical partition-column name; the same physical->logical alias
    select that maps data columns maps the directory-derived column, and
    Spark's partition pruning still works on the physical scan."""
    d = str(tmp_path)
    for grp, lo in (("x", 0), ("y", 40)):
        full = os.path.join(d, f"col-part9={grp}", "p.parquet")
        os.makedirs(os.path.dirname(full), exist_ok=True)
        pq.write_table(
            pa.table({"col-k7": pa.array(range(lo, lo + 40), pa.int64())}), full
        )
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "k",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": "col-k7",
                    },
                },
                {
                    "name": "grp",
                    "type": "string",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": "col-part9",
                    },
                },
            ],
        }
    )
    meta = dict(
        META,
        schemaString=schema,
        partitionColumns=["grp"],
        configuration={"delta.columnMapping.mode": "name"},
    )
    write_delta_commit(
        d,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": meta},
            {"add": {"path": "col-part9=x/p.parquet",
                     "partitionValues": {"col-part9": "x"}, "dataChange": True}},
            {"add": {"path": "col-part9=y/p.parquet",
                     "partitionValues": {"col-part9": "y"}, "dataChange": True}},
        ],
    )
    df = read_delta(spark, d)
    assert set(df.columns) == {"k", "grp"}
    assert df.filter("grp = 'y'").count() == 40
    assert sorted(r.k for r in df.filter("grp = 'x'").collect()) == list(range(40))
    # id mode + partitions stays gated
    # id mode + partitions: directory names still resolve through the
    # metadata physicalName (field ids cannot name a directory); data
    # columns without footer ids fall back to physicalName too
    meta_id = dict(meta, configuration={"delta.columnMapping.mode": "id"})
    write_delta_commit(d, 1, [{"metaData": meta_id}])
    df2 = read_delta(spark, d)
    assert set(df2.columns) == {"k", "grp"}
    assert df2.filter("grp = 'y'").count() == 40
    assert sorted(r.k for r in df2.filter("grp = 'x'").collect()) == list(range(40))


def test_column_mapping_id_mode_partitioned_footer_ids(spark, tmp_path):
    """'id' mode + partition columns + files whose PHYSICAL names differ
    from the metadata physicalName: parquet field ids in the footers are
    authoritative for data columns (a name-based read finds nothing),
    while the partition directory resolves through physicalName.  Also
    pins that the read leaves no session conf behind."""
    d = str(tmp_path)
    for grp, lo in (("x", 0), ("y", 40)):
        full = os.path.join(d, f"col-part9={grp}", "p.parquet")
        os.makedirs(os.path.dirname(full), exist_ok=True)
        pq.write_table(
            pa.table(
                {"renamed-later": pa.array(range(lo, lo + 40), pa.int64())},
                schema=pa.schema(
                    [pa.field("renamed-later", pa.int64(),
                              metadata={b"PARQUET:field_id": b"1"})]
                ),
            ),
            full,
        )
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 1,
                              "delta.columnMapping.physicalName": "col-STALE"}},
                {"name": "grp", "type": "string", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 2,
                              "delta.columnMapping.physicalName": "col-part9"}},
            ],
        }
    )
    meta = dict(
        META,
        schemaString=schema,
        partitionColumns=["grp"],
        configuration={"delta.columnMapping.mode": "id"},
    )
    write_delta_commit(
        d,
        0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["columnMapping"],
                          "writerFeatures": ["columnMapping"]}},
            {"metaData": meta},
            {"add": {"path": "col-part9=x/p.parquet",
                     "partitionValues": {"col-part9": "x"}, "dataChange": True}},
            {"add": {"path": "col-part9=y/p.parquet",
                     "partitionValues": {"col-part9": "y"}, "dataChange": True}},
        ],
    )
    before = spark.conf.get("spark.sql.parquet.fieldId.read.enabled", None)
    df = read_delta(spark, d)
    assert set(df.columns) == {"k", "grp"}
    assert sorted(r.k for r in df.filter("grp = 'y'").collect()) == list(range(40, 80))
    assert spark.conf.get("spark.sql.parquet.fieldId.read.enabled", None) == before


def test_column_mapping_nested(spark, tmp_path):
    """Nested mapped columns: struct fields, array<struct> elements and
    map struct values all carry physical names and re-alias to logical
    names at every level; a NULL struct stays NULL."""
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "col-k": pa.array([1, 2, 3], pa.int64()),
                "col-st": pa.array(
                    [{"col-a": 10, "col-b": "x"}, None, {"col-a": 30, "col-b": "z"}],
                    pa.struct([("col-a", pa.int64()), ("col-b", pa.string())]),
                ),
                "col-arr": pa.array(
                    [[{"col-a": 1, "col-b": "p"}], [], [{"col-a": 3, "col-b": "q"}]],
                    pa.list_(pa.struct([("col-a", pa.int64()), ("col-b", pa.string())])),
                ),
            }
        ),
        os.path.join(d, "p.parquet"),
    )
    inner = lambda: [  # noqa: E731
        {"name": "a", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 10,
                      "delta.columnMapping.physicalName": "col-a"}},
        {"name": "b", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.id": 11,
                      "delta.columnMapping.physicalName": "col-b"}},
    ]
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 1,
                              "delta.columnMapping.physicalName": "col-k"}},
                {"name": "st",
                 "type": {"type": "struct", "fields": inner()},
                 "nullable": True,
                 "metadata": {"delta.columnMapping.id": 2,
                              "delta.columnMapping.physicalName": "col-st"}},
                {"name": "arr",
                 "type": {"type": "array", "containsNull": True,
                          "elementType": {"type": "struct", "fields": inner()}},
                 "nullable": True,
                 "metadata": {"delta.columnMapping.id": 3,
                              "delta.columnMapping.physicalName": "col-arr"}},
            ],
        }
    )
    meta = dict(
        META, schemaString=schema,
        configuration={"delta.columnMapping.mode": "name"},
    )
    write_delta_commit(
        d,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": meta},
            {"add": {"path": "p.parquet", "dataChange": True}},
        ],
    )
    df = read_delta(spark, d)
    assert df.columns == ["k", "st", "arr"]
    rows = {r.k: r for r in df.collect()}
    assert rows[1].st.a == 10 and rows[1].st.b == "x"
    assert rows[2].st is None  # NULL struct not resurrected
    assert rows[3].arr[0].a == 3 and rows[3].arr[0].b == "q"
    assert rows[2].arr == []


def test_timestamp_time_travel(spark, tmp_path):
    """timestampAsOf: latest commit with timestamp <= requested; between
    commits resolves to the earlier one; before the first commit raises;
    mtime fallback covers commits without commitInfo."""
    from native_sql_engine_spark.operators.delta import (
        delta_version_at_timestamp,
        read_delta_at_timestamp,
    )

    d = str(tmp_path)
    a = _mkfile(d, "A.parquet", 0, 50)
    b = _mkfile(d, "B.parquet", 50, 80)
    write_delta_commit(
        d,
        0,
        [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
         {"metaData": META}, {"add": a}, {"commitInfo": {"timestamp": 10_000}}],
    )
    write_delta_commit(
        d, 1, [{"add": b}, {"commitInfo": {"timestamp": 20_000}}]
    )
    assert delta_version_at_timestamp(d, 10_000) == 0
    assert delta_version_at_timestamp(d, 19_999) == 0
    assert delta_version_at_timestamp(d, 20_000) == 1
    assert delta_version_at_timestamp(d, 10**15) == 1
    with pytest.raises(ValueError, match="precedes"):
        delta_version_at_timestamp(d, 9_999)
    assert sorted(r.k for r in read_delta_at_timestamp(spark, d, 15_000).collect()) == list(range(50))
    assert sorted(r.k for r in read_delta_at_timestamp(spark, d, 25_000).collect()) == list(range(80))
    # mtime fallback: commit 2 has no commitInfo — far-future request sees it
    c = _mkfile(d, "C.parquet", 80, 90)
    write_delta_commit(d, 2, [{"add": c}])
    assert delta_version_at_timestamp(d, 10**15) == 2


def test_cdf_over_dv_commits(spark, tmp_path):
    """CDF over deletion-vector commits: a DV-growing remove+re-add of
    the same path emits exactly positions(DV_new)−positions(DV_old) as
    deletes (NOT the whole file, NOT previously-deleted rows again); a
    shrinking DV emits restored rows as inserts; a new file born with a
    DV inserts only its live rows; removing a DV'd file emits deletes
    only for its still-live rows."""
    from native_sql_engine_spark.operators.delta import (
        read_delta_cdf,
        write_deletion_vector,
    )

    d = str(tmp_path)
    a = _mkfile(d, "A.parquet", 0, 20)  # k = 0..19, row_index == k
    write_delta_commit(
        d,
        0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["deletionVectors"]}},
            {"metaData": META},
            {"add": a},
            {"commitInfo": {"timestamp": 1000}},
        ],
    )
    # v1: delete rows 3,7 via a DV (remove + re-add same path)
    dv1 = write_deletion_vector(d, [3, 7])
    write_delta_commit(
        d, 1,
        [{"remove": {"path": "A.parquet", "dataChange": True}},
         {"add": {**a, "deletionVector": dv1}},
         {"commitInfo": {"timestamp": 2000}}],
    )
    # v2: DV grows to {3,7,11,12}; only 11,12 are NEW deletes
    dv2 = write_deletion_vector(d, [3, 7, 11, 12])
    write_delta_commit(
        d, 2,
        [{"remove": {"path": "A.parquet", "dataChange": True,
                     "deletionVector": dv1}},
         {"add": {**a, "deletionVector": dv2}},
         {"commitInfo": {"timestamp": 3000}}],
    )
    # v3: new file B born WITH a DV (row 0 dead on arrival) -> inserts 21..24
    b = _mkfile(d, "B.parquet", 20, 25)
    dv_b = write_deletion_vector(d, [0])
    write_delta_commit(
        d, 3,
        [{"add": {**b, "deletionVector": dv_b}},
         {"commitInfo": {"timestamp": 4000}}],
    )
    # v4: restore row 3 (DV shrinks to {7,11,12}) -> insert k=3
    dv4 = write_deletion_vector(d, [7, 11, 12])
    write_delta_commit(
        d, 4,
        [{"remove": {"path": "A.parquet", "dataChange": True}},
         {"add": {**a, "deletionVector": dv4}},
         {"commitInfo": {"timestamp": 5000}}],
    )
    # v5: drop file A entirely -> deletes ONLY its live rows (not 7,11,12)
    write_delta_commit(
        d, 5,
        [{"remove": {"path": "A.parquet", "dataChange": True}},
         {"commitInfo": {"timestamp": 6000}}],
    )

    def chg(lo, hi):
        rows = read_delta_cdf(spark, d, lo, hi).collect()
        out = {}
        for r in rows:
            out.setdefault((r._commit_version, r._change_type), set()).add(r.k)
        return out

    c = chg(1, 5)
    assert c[(1, "delete")] == {3, 7}
    assert c[(2, "delete")] == {11, 12}  # resurrection-impossible: no 3,7
    assert c[(3, "insert")] == {21, 22, 23, 24}  # DV'd row 20 never inserts
    assert c[(4, "insert")] == {3}
    assert c[(5, "delete")] == set(range(20)) - {7, 11, 12}
    assert set(c) == {(1, "delete"), (2, "delete"), (3, "insert"),
                      (4, "insert"), (5, "delete")}
    # range starting mid-stream still sees correct pre-commit DV state
    c2 = chg(2, 2)
    assert c2 == {(2, "delete"): {11, 12}}
