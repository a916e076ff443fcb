"""Hudi snapshot resolution (operators/hudi.py): file-slice supersedence,
pending-instant invisibility, time travel, replacecommit clustering,
merge-on-read log decode + merge, rollback command blocks, MOR gates."""

from __future__ import annotations

import os

import pytest

from native_sql_engine_spark.operators.hudi import (
    hudi_snapshot,
    read_hudi,
    read_hudi_log_blocks,
    write_hudi_fixture,
    write_hudi_log_file,
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
    # a log file against a SUPERSEDED base (fg1@001; latest base is 003) is
    # ignored with its base; one with no base at all is a log-only file
    # group whose chain is surfaced separately (test_mor_log_only_file_group)
    open(os.path.join(d, ".fg1_001.log.1_0-0-0"), "w").close()
    assert hudi_snapshot(d)["logs"] == {}
    open(os.path.join(d, ".fg9_001.log.1_0-0-0"), "w").close()
    assert [os.path.basename(p) for p in hudi_snapshot(d)["log_only"]] == [
        ".fg9_001.log.1_0-0-0"
    ]


# -- merge-on-read ----------------------------------------------------------------------

_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "v", "type": "string"},
        {"name": "_hoodie_is_deleted", "type": "boolean"},
    ],
}


def _rec(k, v, deleted=False):
    return {"k": k, "v": v, "_hoodie_is_deleted": deleted}


def _mk_kv(d, fid, instant, rows):
    pq.write_table(
        pa.table(
            {
                "k": pa.array([k for k, _ in rows], pa.int64()),
                "v": pa.array([v for _, v in rows], pa.string()),
            }
        ),
        os.path.join(d, f"{fid}_0-0-0_{instant}.parquet"),
    )


def test_log_block_roundtrip(tmp_path):
    p = str(tmp_path / "log")
    write_hudi_log_file(
        p,
        [
            {"type": "avro_data", "instant": "002", "schema": _SCHEMA,
             "records": [_rec(1, "a"), _rec(2, "b", True)]},
            {"type": "command", "instant": "003", "target_instant": "002"},
        ],
    )
    raw = open(p, "rb").read()
    blocks = read_hudi_log_blocks(raw)
    assert [b["type"] for b in blocks] == [3, 0]
    assert blocks[0]["instant"] == "002"
    assert blocks[0]["records"] == [_rec(1, "a"), _rec(2, "b", True)]
    assert blocks[1]["target_instant"] == "002"
    # truncation anywhere raises a positioned ValueError, not struct.error
    for cut in (3, 10, 20, len(raw) - 5):
        with pytest.raises(ValueError, match="truncated|bad magic"):
            read_hudi_log_blocks(raw[:cut] + b"\x00")


def _mor_table(d):
    """Base fg1@001 has k 0..4 = 'base'; deltacommit 002 upserts k 2,3 and
    inserts k 10; deltacommit 003 soft-deletes k 0 and re-upserts k 2."""
    _mk_kv(d, "fg1", "001", [(k, "base") for k in range(5)])
    write_hudi_log_file(
        os.path.join(d, ".fg1_001.log.1_0-0-0"),
        [{"type": "avro_data", "instant": "002", "schema": _SCHEMA,
          "records": [_rec(2, "v2"), _rec(3, "v2"), _rec(10, "v2")]}],
    )
    write_hudi_log_file(
        os.path.join(d, ".fg1_001.log.2_0-0-0"),
        [{"type": "avro_data", "instant": "003", "schema": _SCHEMA,
          "records": [_rec(0, "", True), _rec(2, "v3")]}],
    )
    write_hudi_fixture(
        d, [("001", "", "fg1")], deltacommits=["002", "003"], record_key="k"
    )


def test_mor_merge_and_soft_delete(spark, tmp_path):
    d = str(tmp_path)
    _mor_table(d)
    got = {r.k: r.v for r in read_hudi(spark, d).collect()}
    # k=0 deleted, k=2 newest version wins (v3 over v2 over base), k=10 inserted
    assert got == {1: "base", 2: "v3", 3: "v2", 4: "base", 10: "v2"}


def test_mor_time_travel_skips_future_blocks(spark, tmp_path):
    d = str(tmp_path)
    _mor_table(d)
    got = {r.k: r.v for r in read_hudi(spark, d, as_of="002").collect()}
    assert got == {0: "base", 1: "base", 2: "v2", 3: "v2", 4: "base", 10: "v2"}
    got1 = {r.k: r.v for r in read_hudi(spark, d, as_of="001").collect()}
    assert got1 == {k: "base" for k in range(5)}


def test_mor_uncommitted_and_rolled_back_blocks_invisible(spark, tmp_path):
    d = str(tmp_path)
    _mor_table(d)
    # instant 004 wrote a block then was rolled back by a command block in a
    # later log version; instant 005 never completed (no timeline file)
    write_hudi_log_file(
        os.path.join(d, ".fg1_001.log.3_0-0-0"),
        [{"type": "avro_data", "instant": "004", "schema": _SCHEMA,
          "records": [_rec(1, "BAD")]},
         {"type": "avro_data", "instant": "005", "schema": _SCHEMA,
          "records": [_rec(4, "BAD")]}],
    )
    write_hudi_log_file(
        os.path.join(d, ".fg1_001.log.4_0-0-0"),
        [{"type": "command", "instant": "006", "target_instant": "004"}],
    )
    write_hudi_fixture(
        d, [("001", "", "fg1")], deltacommits=["002", "003", "004", "006"],
        record_key="k",
    )
    got = {r.k: r.v for r in read_hudi(spark, d).collect()}
    assert got == {1: "base", 2: "v3", 3: "v2", 4: "base", 10: "v2"}


def test_mor_gate_block_types(tmp_path):
    import struct as _s

    p = str(tmp_path / "log")
    write_hudi_log_file(
        p, [{"type": "avro_data", "instant": "002", "schema": _SCHEMA,
             "records": [_rec(1, "a")]}]
    )
    raw = bytearray(open(p, "rb").read())
    # type ordinal lives 4 bytes after the 4-byte version, after magic+size
    off = 6 + 8 + 4
    raw[off:off + 4] = _s.pack(">i", 4)  # HFILE block
    with pytest.raises(NotImplementedError, match="block type"):
        read_hudi_log_blocks(bytes(raw))
    raw[off:off + 4] = _s.pack(">i", 2)  # CORRUPT block: skipped, not fatal
    assert read_hudi_log_blocks(bytes(raw)) == []


def test_delete_block_roundtrip_and_kryo_gate(tmp_path):
    """DELETE blocks: the Avro v3 HoodieDeleteRecordList payload decodes
    to recordKey tombstones; a v2 (Kryo, Hudi 0.9-0.13) payload gates
    with version evidence."""
    import struct as _s

    p = str(tmp_path / "log")
    write_hudi_log_file(
        p, [{"type": "delete", "instant": "002", "keys": [3, 7]}]
    )
    blocks = read_hudi_log_blocks(open(p, "rb").read())
    assert [b["type"] for b in blocks] == [1]
    assert [r["recordKey"] for r in blocks[0]["records"]] == ["3", "7"]
    # rewrite the content version int to 2 -> Kryo era -> gate
    raw = bytearray(open(p, "rb").read())
    hdr_len = 4  # one header entry: INSTANT_TIME '002'
    off = 6 + 8 + 8 + 4 + (8 + 3) + 8  # magic+size+ver/type+nhdr+hdr+clen
    assert _s.unpack_from(">i", raw, off)[0] == 3
    raw[off:off + 4] = _s.pack(">i", 2)
    with pytest.raises(NotImplementedError, match="Kryo"):
        read_hudi_log_blocks(bytes(raw))


def test_mor_delete_block_merge(spark, tmp_path):
    """A DELETE block hard-deletes its record keys in the MOR merge —
    newest-wins ordering still applies, so a LATER re-insert of a
    deleted key survives."""
    d = str(tmp_path)
    _mor_table(d)
    write_hudi_log_file(
        os.path.join(d, ".fg1_001.log.3_0-0-0"),
        [{"type": "delete", "instant": "004", "keys": [1, 3]}],
    )
    write_hudi_log_file(
        os.path.join(d, ".fg1_001.log.4_0-0-0"),
        [{"type": "avro_data", "instant": "005", "schema": _SCHEMA,
          "records": [_rec(3, "back")]}],
    )
    write_hudi_fixture(
        d, [("001", "", "fg1")], deltacommits=["002", "003", "004", "005"],
        record_key="k",
    )
    got = {r.k: r.v for r in read_hudi(spark, d).collect()}
    # base: {1:base,2:v3,3:v2,4:base,10:v2}; 004 deletes k1,k3; 005 re-adds k3
    assert got == {2: "v3", 3: "back", 4: "base", 10: "v2"}
    # time travel before the delete: both keys alive
    got2 = {r.k: r.v for r in read_hudi(spark, d, as_of="003").collect()}
    assert got2[1] == "base" and got2[3] == "v2"
    # incremental over the delete range: k1 vanishes, k3 at 'back'
    from native_sql_engine_spark.operators.hudi import read_hudi_incremental

    got3 = {r.k: r.v for r in read_hudi_incremental(spark, d, "003", "005").collect()}
    assert got3 == {3: "back"}


def test_mor_log_only_file_group(spark, tmp_path):
    """A file group with log files but no base yet (the MOR insert path):
    its records come purely from the log chain, merged alongside the based
    groups; the old gate is gone."""
    d = str(tmp_path)
    _mor_table(d)
    # new file group fg2: never had a base file, only a log chain
    write_hudi_log_file(
        os.path.join(d, ".fg2_002.log.1_0-0-0"),
        [{"type": "avro_data", "instant": "002", "schema": _SCHEMA,
          "records": [_rec(100, "logonly"), _rec(101, "logonly")]}],
    )
    write_hudi_log_file(
        os.path.join(d, ".fg2_002.log.2_0-0-0"),
        [{"type": "avro_data", "instant": "003", "schema": _SCHEMA,
          "records": [_rec(101, "newer"), _rec(100, "", True)]}],
    )
    write_hudi_fixture(
        d, [("001", "", "fg1")], deltacommits=["002", "003"], record_key="k"
    )
    snap = hudi_snapshot(d)
    assert len(snap["log_only"]) == 2
    got = {r.k: r.v for r in read_hudi(spark, d).collect()}
    assert got == {1: "base", 2: "v3", 3: "v2", 4: "base", 10: "v2", 101: "newer"}
    # time travel to 002: fg2's first block visible, second not
    got2 = {r.k: r.v for r in read_hudi(spark, d, as_of="002").collect()}
    assert got2[100] == "logonly" and got2[101] == "logonly"


def test_incremental_cow(spark, tmp_path):
    """Incremental COW query: latest version of every record written by
    commits in (begin, end]; a key rewritten twice in range collapses to
    its final version; pre-range commits stay out; MOR deltacommits in
    range gate."""
    from native_sql_engine_spark.operators.hudi import read_hudi_incremental

    d = str(tmp_path)
    _mk_kv(d, "fg1", "001", [(k, "v1") for k in range(10)])
    _mk_kv(d, "fg2", "002", [(k, "v2") for k in range(10, 20)])
    _mk_kv(d, "fg1", "003", [(k, "v3") for k in range(10)])  # rewrites fg1
    write_hudi_fixture(
        d,
        [("001", "", "fg1"), ("002", "", "fg2"), ("003", "", "fg1")],
        record_key="k",
    )
    got = {r.k: r.v for r in read_hudi_incremental(spark, d, "001").collect()}
    # (001, 003]: fg2@002 inserts + fg1@003 rewrite; fg1@001 rows appear
    # only through their 003 version
    assert got == {**{k: "v2" for k in range(10, 20)}, **{k: "v3" for k in range(10)}}
    got2 = {r.k: r.v for r in read_hudi_incremental(spark, d, "002", "003").collect()}
    assert got2 == {k: "v3" for k in range(10)}
    with pytest.raises(ValueError, match="no commits"):
        read_hudi_incremental(spark, d, "003")
    d2 = str(tmp_path / "mor")
    os.makedirs(d2)
    _mor_table(d2)
    got3 = {r.k: r.v for r in read_hudi_incremental(spark, d2, "001").collect()}
    # MOR path: keys written by deltacommits 002/003, values at end=003;
    # k0 soft-deleted in range disappears, k1/k4 untouched stay out
    assert got3 == {2: "v3", 3: "v2", 10: "v2"}


def test_incremental_mor(spark, tmp_path):
    """Incremental over MOR deltacommits: snapshot-at-end values
    restricted to keys written in (begin, end] — log-block keys decode
    executor-side, the end instant bounds block visibility, in-range
    base commits contribute their file keys, and rolled-back blocks
    never surface keys."""
    from native_sql_engine_spark.operators.hudi import read_hudi_incremental

    d = str(tmp_path)
    _mor_table(d)
    # (001, 002]: keys {2,3,10} at their 002 values (003 not visible)
    got = {r.k: r.v for r in read_hudi_incremental(spark, d, "001", "002").collect()}
    assert got == {2: "v2", 3: "v2", 10: "v2"}
    # (002, 003]: keys {0,2}; k0 soft-deleted -> only k2 at v3
    got = {r.k: r.v for r in read_hudi_incremental(spark, d, "002", "003").collect()}
    assert got == {2: "v3"}
    # range covering the base commit too: commit 001's file keys join in
    got = {r.k: r.v for r in read_hudi_incremental(spark, d, "000", "003").collect()}
    assert got == {1: "base", 2: "v3", 3: "v2", 4: "base", 10: "v2"}
    # a rolled-back in-range block must not surface its keys
    write_hudi_log_file(
        os.path.join(d, ".fg1_001.log.3_0-0-0"),
        [{"type": "avro_data", "instant": "004", "schema": _SCHEMA,
          "records": [_rec(7, "BAD")]}],
    )
    write_hudi_log_file(
        os.path.join(d, ".fg1_001.log.4_0-0-0"),
        [{"type": "command", "instant": "005", "target_instant": "004"}],
    )
    write_hudi_fixture(
        d, [("001", "", "fg1")], deltacommits=["002", "003", "004", "005"],
        record_key="k",
    )
    got = {r.k: r.v for r in read_hudi_incremental(spark, d, "003", "005").collect()}
    assert got == {}  # 004 rolled back; nothing else written in range


def test_incremental_replacecommit_gates(spark, tmp_path):
    """A replacecommit (clustering / insert_overwrite) inside the
    incremental range gates honestly — its rewrites are not in
    partitionToWriteStats form, so silently skipping it would omit rows;
    out-of-range replacecommits don't interfere."""
    from native_sql_engine_spark.operators.hudi import read_hudi_incremental

    d = str(tmp_path)
    _mk_kv(d, "fg1", "001", [(k, "v1") for k in range(5)])
    _mk_kv(d, "fg2", "002", [(k, "v2") for k in range(5, 10)])
    write_hudi_fixture(
        d,
        [("001", "", "fg1"), ("002", "", "fg2")],
        replaced={"003": {"": ["fg1"]}},
        record_key="k",
    )
    with pytest.raises(NotImplementedError, match="replacecommit"):
        read_hudi_incremental(spark, d, "001")  # end defaults to 003
    got = {r.k: r.v for r in read_hudi_incremental(spark, d, "001", "002").collect()}
    assert got == {k: "v2" for k in range(5, 10)}
