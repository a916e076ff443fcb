"""Iceberg snapshot resolution (operators/iceberg.py): metadata walk,
manifest-list/manifest Avro decode through the from-scratch nested Avro
codec, DELETED-entry semantics, time travel, delete-file gates."""

from __future__ import annotations

import os

import pytest

from native_sql_engine_spark.operators.iceberg import (
    iceberg_snapshot,
    read_iceberg,
    write_iceberg_fixture,
)

pa = pytest.importorskip("pyarrow")
pq = pytest.importorskip("pyarrow.parquet")


def _mk(d, name, lo, hi):
    p = os.path.join(d, "data", name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    pq.write_table(pa.table({"k": pa.array(range(lo, hi), pa.int64())}), p)
    return p


def _fixture(d):
    a = _mk(d, "a.parquet", 0, 100)
    b = _mk(d, "b.parquet", 100, 200)
    c = _mk(d, "c.parquet", 200, 300)
    write_iceberg_fixture(d, {1: [(1, a), (1, b)], 2: [(2, a), (0, b), (1, c)]}, current=2)
    return a, b, c


def test_snapshot_semantics(tmp_path):
    d = str(tmp_path)
    _fixture(d)
    s = iceberg_snapshot(d)
    assert s["snapshot_id"] == 2
    assert sorted(os.path.basename(f) for f in s["files"]) == ["b.parquet", "c.parquet"]
    s1 = iceberg_snapshot(d, snapshot_id=1)
    assert sorted(os.path.basename(f) for f in s1["files"]) == ["a.parquet", "b.parquet"]
    with pytest.raises(ValueError, match="snapshot 99"):
        iceberg_snapshot(d, snapshot_id=99)


def test_spark_scan(spark, tmp_path):
    d = str(tmp_path)
    _fixture(d)
    assert sorted(r.k for r in read_iceberg(spark, d).collect()) == list(range(100, 300))
    assert sorted(r.k for r in read_iceberg(spark, d, snapshot_id=1).collect()) == list(
        range(0, 200)
    )


def test_manifests_are_real_avro(tmp_path):
    """The fixture's manifest list and manifests must be valid OCFs with
    nested records — decoded by the same reader any Avro tool would use."""
    from native_sql_engine_spark.operators.avro import read_avro

    d = str(tmp_path)
    _fixture(d)
    md = os.path.join(d, "metadata")
    mlists = [n for n in os.listdir(md) if n.startswith("snap-")]
    assert mlists
    _, rows = read_avro(open(os.path.join(md, mlists[0]), "rb").read())
    assert rows[0]["manifest_path"].endswith(".avro")
    _, entries = read_avro(open(rows[0]["manifest_path"], "rb").read())
    assert {"status", "data_file"} <= set(entries[0])
    assert entries[0]["data_file"]["file_format"] == "PARQUET"


def test_mixed_format_snapshot(spark, tmp_path):
    """A table migrated from ORC to parquet keeps old ORC data files live:
    both formats must read through their native sources and union."""
    po = pytest.importorskip("pyarrow.orc")
    d = str(tmp_path)
    a = _mk(d, "a.parquet", 0, 100)
    orc_path = os.path.join(d, "data", "b.orc")
    po.write_table(pa.table({"k": pa.array(range(100, 200), pa.int64())}), orc_path)
    write_iceberg_fixture(d, {1: [(1, a), (1, orc_path)]}, current=1)
    snap = iceberg_snapshot(d)
    assert sorted(f for _, f in snap["files_by_format"]) == sorted([a, orc_path])
    got = sorted(r.k for r in read_iceberg(spark, d).collect())
    assert got == list(range(0, 200))


def test_gates(tmp_path):
    d = str(tmp_path)
    with pytest.raises(ValueError, match="not an Iceberg table"):
        iceberg_snapshot(d)
    a = _mk(d, "a.parquet", 0, 10)
    # a delete-file manifest entry (content=1) must hard-fail
    write_iceberg_fixture(d, {1: [(1, a)]}, current=1)
    import json

    md = os.path.join(d, "metadata")
    # rewrite the manifest with a delete-content data_file
    from native_sql_engine_spark.operators.avro import read_avro, write_avro
    from native_sql_engine_spark.operators.iceberg import _MANIFEST_ENTRY_SCHEMA

    mpath = os.path.join(md, "manifest-1.avro")
    _, entries = read_avro(open(mpath, "rb").read())
    entries[0]["data_file"]["content"] = 1
    open(mpath, "wb").write(write_avro(entries, _MANIFEST_ENTRY_SCHEMA))
    with pytest.raises(ValueError, match="inside a data manifest"):
        iceberg_snapshot(d)
    # equality deletes are supported now, but one without equality_ids is
    # malformed per spec
    d2 = os.path.join(d, "eq")
    a2 = _mk(d2, "a.parquet", 0, 10)
    write_iceberg_fixture(d2, {1: [(1, a2), (1, a2, 2)]}, current=1)
    with pytest.raises(ValueError, match="equality_ids"):
        iceberg_snapshot(d2)


# -- positional deletes (v2 merge-on-read) ---------------------------------------------


def test_positional_deletes(spark, tmp_path):
    from native_sql_engine_spark.operators.iceberg import write_position_delete_file

    d = str(tmp_path)
    a = _mk(d, "a.parquet", 0, 100)
    b = _mk(d, "b.parquet", 100, 200)
    pd1 = write_position_delete_file(
        os.path.join(d, "data", "del-1.parquet"), [(a, 3), (a, 7), (b, 5)]
    )
    write_iceberg_fixture(
        d, {1: [(1, a), (1, b)], 2: [(0, a), (0, b), (1, pd1, 1)]}, current=2
    )
    snap = iceberg_snapshot(d)
    assert snap["position_delete_files"] == [pd1]
    got = sorted(r.k for r in read_iceberg(spark, d).collect())
    assert got == sorted(set(range(200)) - {3, 7, 105})
    # the pre-delete snapshot must not apply the delete file
    assert sorted(r.k for r in read_iceberg(spark, d, snapshot_id=1).collect()) == list(
        range(200)
    )


def test_positional_delete_retired(spark, tmp_path):
    """A delete file whose entry is status=2 in a later snapshot stops
    applying (e.g. after compaction rewrote the data file)."""
    from native_sql_engine_spark.operators.iceberg import write_position_delete_file

    d = str(tmp_path)
    a = _mk(d, "a.parquet", 0, 100)
    pd1 = write_position_delete_file(os.path.join(d, "data", "del.parquet"), [(a, 0)])
    write_iceberg_fixture(
        d,
        {1: [(1, a), (1, pd1, 1)], 2: [(0, a), (2, pd1, 1)]},
        current=2,
    )
    assert iceberg_snapshot(d, snapshot_id=1)["position_delete_files"] == [pd1]
    assert iceberg_snapshot(d)["position_delete_files"] == []
    assert sorted(r.k for r in read_iceberg(spark, d).collect()) == list(range(100))
    assert sorted(r.k for r in read_iceberg(spark, d, snapshot_id=1).collect()) == list(
        range(1, 100)
    )


def test_partition_pruning_two_levels(spark, tmp_path):
    """Partition-spec pruning: (a) whole manifests skip via manifest-list
    bound summaries — their entry files are never opened; (b) individual
    files skip via each entry's partition tuple; (c) equality / between /
    in conditions; (d) conservative semantics — missing bounds or
    non-identity transforms never prune."""
    d = str(tmp_path)
    files = {}
    for g, (bucket, lo) in enumerate([(10, 0), (20, 100), (30, 200), (40, 300)]):
        files[bucket] = _mk(d, f"b{bucket}.parquet", lo, lo + 100)
    # manifests: {10,20} group 0, {30,40} group 1
    entries = [
        (1, p, 0, {"bucket": b}, 0 if b <= 20 else 1) for b, p in files.items()
    ]
    write_iceberg_fixture(d, {1: entries}, 1, partition_spec=[("bucket", "int")])

    snap = iceberg_snapshot(d, partition_filter={"bucket": 30})
    assert [os.path.basename(f) for f in snap["files"]] == ["b30.parquet"]
    assert snap["manifests_skipped"] == 1  # group 0 dropped on bounds [10,20]
    assert snap["files_pruned"] == 1  # b40 dropped at entry level

    snap = iceberg_snapshot(d, partition_filter={"bucket": ("between", 15, 35)})
    assert sorted(os.path.basename(f) for f in snap["files"]) == [
        "b20.parquet",
        "b30.parquet",
    ]
    snap = iceberg_snapshot(d, partition_filter={"bucket": ("in", [10, 40])})
    assert sorted(os.path.basename(f) for f in snap["files"]) == [
        "b10.parquet",
        "b40.parquet",
    ]
    # no bounds intersection at all -> everything prunes before any scan
    snap = iceberg_snapshot(d, partition_filter={"bucket": 99})
    assert snap["files"] == [] and snap["manifests_skipped"] == 2

    # unfiltered read unchanged; filtered Spark read sees only kept files
    assert len(iceberg_snapshot(d)["files"]) == 4
    got = sorted(
        r.k for r in read_iceberg(spark, d, partition_filter={"bucket": 20}).collect()
    )
    assert got == list(range(100, 200))

    # unknown field in the filter: no information -> nothing prunes
    snap = iceberg_snapshot(d, partition_filter={"nope": 1})
    assert len(snap["files"]) == 4 and snap["manifests_skipped"] == 0


def test_partition_pruning_backward_compat(tmp_path):
    """Unpartitioned fixtures (no partition records, null summaries) are
    untouched by a partition filter — conservative keep-everything."""
    d = str(tmp_path)
    a, b, c = _fixture(d)
    snap = iceberg_snapshot(d, partition_filter={"status": "X"})
    assert sorted(snap["files"]) == sorted([b, c])
    assert snap["manifests_skipped"] == 0 and snap["files_pruned"] == 0


def test_equality_deletes_sequence_semantics(spark, tmp_path):
    """Equality deletes (content=2, the Flink streaming-upsert path):
    a delete applies only to rows whose DATA sequence number is strictly
    lower than the delete's.  Snapshot 3 holds: file A (seq 1), equality
    delete on k (seq 2), file B (seq 3) re-adding some of the deleted
    keys — the re-added rows must SURVIVE (seq 3 > 2) while A's matching
    rows die, the exact upsert semantics a seq-blind reader gets wrong."""
    from native_sql_engine_spark.operators.iceberg import (
        read_iceberg,
        write_equality_delete_file,
        write_iceberg_fixture,
    )

    d = str(tmp_path)
    a = _mk(d, "a.parquet", 0, 100)  # keys 0..99 @ seq 1
    b = _mk(d, "b.parquet", 40, 60)  # keys 40..59 re-added @ seq 3
    eq = write_equality_delete_file(
        os.path.join(d, "data", "eq-del.parquet"),
        {"k": list(range(40, 70))},  # delete keys 40..69 @ seq 2
    )
    write_iceberg_fixture(
        d,
        {
            3: [
                {"status": 0, "path": a, "sequence": 1},
                {"status": 1, "path": eq, "content": 2, "equality_ids": [1], "sequence": 2},
                {"status": 1, "path": b, "sequence": 3},
            ]
        },
        current=3,
        schema_fields=[(1, "k", "long")],
    )
    snap = iceberg_snapshot(d)
    assert [p for p, _s, _i, _pt in snap["equality_delete_files"]] == [eq]
    assert snap["equality_delete_files"][0][1] == 2
    got = sorted(r.k for r in read_iceberg(spark, d).collect())
    # A keeps 0..39 and 70..99 (40..69 deleted at seq 2 > 1); B's 40..59
    # all survive (seq 3 > 2)
    assert got == sorted(list(range(0, 40)) + list(range(70, 100)) + list(range(40, 60)))


def test_equality_delete_partition_scoped(spark, tmp_path):
    """Partition-scoped equality deletes (the Flink streaming-upsert
    shape): a delete whose entry carries a concrete partition tuple
    applies ONLY to data files of that partition — a same-key row in
    another partition MUST survive; sequence semantics still hold within
    the scoped partition."""
    from native_sql_engine_spark.operators.iceberg import (
        write_equality_delete_file,
        write_iceberg_fixture,
    )

    d = str(tmp_path)
    a = _mk(d, "p1.parquet", 0, 50)  # keys 0..49 in bucket 1
    b = _mk(d, "p2.parquet", 0, 50)  # SAME keys 0..49 in bucket 2
    eq = write_equality_delete_file(
        os.path.join(d, "data", "e.parquet"), {"k": list(range(10, 20))}
    )
    write_iceberg_fixture(
        d,
        {
            2: [
                {"status": 0, "path": a, "partition": {"bucket": 1}, "sequence": 1},
                {"status": 0, "path": b, "partition": {"bucket": 2}, "sequence": 1},
                {"status": 1, "path": eq, "content": 2, "equality_ids": [1],
                 "partition": {"bucket": 1}, "sequence": 2},
            ]
        },
        current=2,
        partition_spec=[("bucket", "int")],
        schema_fields=[(1, "k", "long"), (9, "bucket", "int")],
    )
    snap = iceberg_snapshot(d)
    assert snap["equality_delete_files"][0][3] == {"bucket": 1}
    got = sorted(r.k for r in read_iceberg(spark, d).collect())
    # bucket 1 loses 10..19; bucket 2 keeps ALL 50 keys
    assert got == sorted(
        list(set(range(50)) - set(range(10, 20))) + list(range(50))
    )
    # a scoped delete at a sequence NOT above the data's does nothing:
    # rebuild with data seq 3 in the scoped partition
    d2 = str(tmp_path / "seq")
    a2 = _mk(d2, "p1.parquet", 0, 30)
    eq2 = write_equality_delete_file(
        os.path.join(d2, "data", "e.parquet"), {"k": [5]}
    )
    write_iceberg_fixture(
        d2,
        {
            2: [
                {"status": 0, "path": a2, "partition": {"bucket": 1}, "sequence": 3},
                {"status": 1, "path": eq2, "content": 2, "equality_ids": [1],
                 "partition": {"bucket": 1}, "sequence": 2},
            ]
        },
        current=2,
        partition_spec=[("bucket", "int")],
        schema_fields=[(1, "k", "long"), (9, "bucket", "int")],
    )
    assert sorted(r.k for r in read_iceberg(spark, d2).collect()) == list(range(30))


def test_avro_data_files(spark, tmp_path):
    """AVRO data files (no spark-avro module ships here): decoded by the
    repo's own OCF codec over binaryFile — mixed parquet+avro snapshots
    union by name, positional deletes apply to avro rows by (path, pos),
    and an avro-only snapshot derives its schema from the writer schema."""
    from native_sql_engine_spark.operators.avro import write_avro
    from native_sql_engine_spark.operators.iceberg import write_position_delete_file

    d = str(tmp_path)
    a = _mk(d, "a.parquet", 0, 100)
    av = os.path.join(d, "data", "b.avro")
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "k", "type": "long"}],
    }
    with open(av, "wb") as fh:
        fh.write(write_avro([{"k": v} for v in range(100, 200)], schema))
    pd1 = write_position_delete_file(
        os.path.join(d, "data", "del.parquet"), [(av, 0), (av, 1), (a, 5)]
    )
    write_iceberg_fixture(
        d, {1: [(1, a), (1, av)], 2: [(0, a), (0, av), (1, pd1, 1)]}, current=2
    )
    got = sorted(r.k for r in read_iceberg(spark, d).collect())
    assert got == sorted(set(range(200)) - {100, 101, 5})
    # avro-only snapshot: schema from the writer schema
    d2 = str(tmp_path / "avro_only")
    os.makedirs(os.path.join(d2, "data"))
    av2 = os.path.join(d2, "data", "only.avro")
    with open(av2, "wb") as fh:
        fh.write(write_avro([{"k": v} for v in range(50)], schema))
    write_iceberg_fixture(d2, {1: [(1, av2)]}, current=1)
    assert sorted(r.k for r in read_iceberg(spark, d2).collect()) == list(range(50))


def test_equality_delete_global_on_partitioned_table(spark, tmp_path):
    """An equality delete with an all-None partition tuple is GLOBAL even
    on a partitioned table (the fixture writer emits the tuple for every
    entry); only a concrete partition value triggers the scoped gate."""
    from native_sql_engine_spark.operators.iceberg import (
        write_equality_delete_file,
        write_iceberg_fixture,
    )

    d = str(tmp_path)
    a = _mk(d, "a.parquet", 0, 50)
    eq = write_equality_delete_file(
        os.path.join(d, "data", "e.parquet"), {"k": list(range(10, 20))}
    )
    write_iceberg_fixture(
        d,
        {
            2: [
                {"status": 0, "path": a, "partition": {"bucket": 1}, "sequence": 1},
                {"status": 1, "path": eq, "content": 2, "equality_ids": [1],
                 "sequence": 2},  # no partition -> all-None tuple -> global
            ]
        },
        current=2,
        partition_spec=[("bucket", "int")],
    )
    # partition_spec path writes schemas from the spec; field 1 = bucket.
    # For this test the equality column is k -> give it id 2 via a manual
    # schema tweak? No: spec fields are (bucket int); add k through the
    # metadata file directly.
    import json

    mpath = os.path.join(d, "metadata")
    mfile = sorted(n for n in os.listdir(mpath) if n.endswith(".metadata.json"))[-1]
    with open(os.path.join(mpath, mfile)) as fh:
        meta = json.load(fh)
    meta["schemas"][0]["fields"].append(
        {"id": 1, "name": "k", "required": False, "type": "long"}
    )
    # two fields now share id 1 (bucket came first); rewrite bucket to id 9
    meta["schemas"][0]["fields"][0]["id"] = 9
    meta["partition-specs"][0]["fields"][0]["source-id"] = 9
    with open(os.path.join(mpath, mfile), "w") as fh:
        json.dump(meta, fh)
    got = sorted(r.k for r in read_iceberg(spark, d).collect())
    assert got == sorted(set(range(50)) - set(range(10, 20)))


def test_incremental_append_scan(spark, tmp_path):
    """Incremental append consumption between snapshots: only rows whose
    entries are ADDED in (from, to] appear — EXISTING carry-overs and
    files added before the range stay out; row-level deletes in range
    gate."""
    from native_sql_engine_spark.operators.iceberg import (
        read_iceberg_incremental,
        write_position_delete_file,
    )

    d = str(tmp_path)
    a = _mk(d, "a.parquet", 0, 100)
    b = _mk(d, "b.parquet", 100, 200)
    c = _mk(d, "c.parquet", 200, 300)
    write_iceberg_fixture(
        d,
        {
            1: [(1, a)],
            2: [(0, a), (1, b)],
            3: [(0, a), (0, b), (1, c)],
        },
        current=3,
    )
    got = sorted(r.k for r in read_iceberg_incremental(spark, d, 1, 3).collect())
    assert got == list(range(100, 300))  # b + c, NOT the carried-over a
    got2 = sorted(r.k for r in read_iceberg_incremental(spark, d, 2, 3).collect())
    assert got2 == list(range(200, 300))
    with pytest.raises(ValueError, match="no appends"):
        read_iceberg_incremental(spark, d, 3, 3)
    with pytest.raises(ValueError, match="not in"):
        read_iceberg_incremental(spark, d, 1, 99)
    # a positional delete on PRE-range data with no in-range appends:
    # nothing to emit for an append consumer
    d2 = str(tmp_path / "del")
    a2 = _mk(d2, "a.parquet", 0, 50)
    pd1 = write_position_delete_file(os.path.join(d2, "data", "del.parquet"), [(a2, 0)])
    write_iceberg_fixture(d2, {1: [(1, a2)], 2: [(0, a2), (1, pd1, 1)]}, current=2)
    with pytest.raises(ValueError, match="no appends"):
        read_iceberg_incremental(spark, d2, 1, 2)


def test_incremental_with_deletes_in_range(spark, tmp_path):
    """Delete-aware incremental (the streaming-consumer case): rows
    appended in range minus in-range positional AND equality deletes —
    an appended-then-deleted row never surfaces; eq-delete sequence
    semantics hold inside the range (a later re-add survives)."""
    from native_sql_engine_spark.operators.iceberg import (
        read_iceberg_incremental,
        write_equality_delete_file,
        write_position_delete_file,
    )

    d = str(tmp_path)
    a = _mk(d, "a.parquet", 0, 100)    # pre-range
    b = _mk(d, "b.parquet", 100, 200)  # added @2
    c = _mk(d, "c.parquet", 120, 140)  # re-added @4 (after the eq delete)
    pd1 = write_position_delete_file(
        os.path.join(d, "data", "del.parquet"), [(b, 0), (b, 1), (a, 5)]
    )
    eq = write_equality_delete_file(
        os.path.join(d, "data", "eq.parquet"), {"k": list(range(120, 150))}
    )
    write_iceberg_fixture(
        d,
        {
            1: [(1, a)],
            2: [(0, a), (1, b)],
            3: [
                {"status": 0, "path": a, "sequence": 1},
                {"status": 0, "path": b, "sequence": 2},
                {"status": 1, "path": pd1, "content": 1, "sequence": 3},
                {"status": 1, "path": eq, "content": 2, "equality_ids": [1],
                 "sequence": 3},
            ],
            4: [
                {"status": 0, "path": a, "sequence": 1},
                {"status": 0, "path": b, "sequence": 2},
                {"status": 0, "path": pd1, "content": 1, "sequence": 3},
                {"status": 0, "path": eq, "content": 2, "equality_ids": [1],
                 "sequence": 3},
                {"status": 1, "path": c, "sequence": 4},
            ],
        },
        current=4,
        schema_fields=[(1, "k", "long")],
    )
    got = sorted(r.k for r in read_iceberg_incremental(spark, d, 1, 4).collect())
    # b's rows minus pos-deleted positions {100,101} minus eq-deleted
    # [120,150); c's [120,140) re-added at seq 4 > 3 SURVIVES; a's pos
    # delete (pre-range file) finds nothing
    want = sorted(
        [k for k in range(102, 200) if not (120 <= k < 150)] + list(range(120, 140))
    )
    assert got == want
    # sub-range ending before the deletes sees b whole
    got2 = sorted(r.k for r in read_iceberg_incremental(spark, d, 1, 2).collect())
    assert got2 == list(range(100, 200))


def test_manifest_summary_alignment_with_nonidentity_fields(spark, tmp_path):
    """manifest_file.partitions is positionally aligned with ALL spec
    fields; a spec like [bucket(shard), identity(status)] must read the
    identity field's bounds from slot 1, not slot 0.  The misaligned
    decode (bucket's int bounds read as a string) would wrongly prune the
    matching manifest — silent missing rows."""
    d = str(tmp_path)
    hot = _mk(d, "hot.parquet", 0, 100)
    cold = _mk(d, "cold.parquet", 100, 200)
    entries = [
        (1, hot, 0, {"shard": 3, "status": "hot"}, 0),
        (1, cold, 0, {"shard": 3, "status": "cold"}, 1),
    ]
    write_iceberg_fixture(
        d,
        {1: entries},
        1,
        partition_spec=[("shard", "int", "bucket[4]"), ("status", "string")],
    )
    snap = iceberg_snapshot(d, partition_filter={"status": "hot"})
    assert [os.path.basename(f) for f in snap["files"]] == ["hot.parquet"]
    assert snap["manifests_skipped"] == 1  # the cold manifest, via slot 1
    got = sorted(
        r.k
        for r in read_iceberg(spark, d, partition_filter={"status": "hot"}).collect()
    )
    assert got == list(range(100))
    # filtering on the bucket-transformed field itself never prunes
    # (conservative: no decoder for non-identity transforms)
    snap2 = iceberg_snapshot(d, partition_filter={"shard": 99})
    assert snap2["manifests_skipped"] == 0


def test_sequence_number_zero_is_not_missing(spark, tmp_path):
    """An explicit sequence_number of 0 (v1-upgraded data files) must NOT
    inherit the snapshot's sequence number: an eq-delete at seq 1 kills a
    seq-0 row, but `or`-coalescing would promote the data file to the
    snapshot seq and under-delete."""
    from native_sql_engine_spark.operators.iceberg import (
        write_equality_delete_file,
    )

    d = str(tmp_path)
    a = _mk(d, "a.parquet", 0, 50)  # v1-upgraded: explicit seq 0
    eq = write_equality_delete_file(
        os.path.join(d, "data", "eq.parquet"), {"k": list(range(10, 20))}
    )
    write_iceberg_fixture(
        d,
        {
            5: [
                {"status": 0, "path": a, "sequence": 0},
                {"status": 1, "path": eq, "content": 2, "equality_ids": [1],
                 "sequence": 1},
            ]
        },
        current=5,
        schema_fields=[(1, "k", "long")],
    )
    snap = iceberg_snapshot(d)
    assert snap["file_sequence_numbers"][a] == 0
    got = sorted(r.k for r in read_iceberg(spark, d).collect())
    assert got == sorted(set(range(50)) - set(range(10, 20)))
