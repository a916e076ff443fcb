"""Delta Lake transaction-log reading — Spark-first, stdlib + pyarrow only.

Implements the read side of the public Delta protocol
(github.com/delta-io/delta PROTOCOL.md) deep enough to open a Delta
table WITHOUT the delta-spark runtime:

- **log replay**: ``_delta_log/<version>.json`` commits (one JSON action
  per line: ``metaData`` / ``protocol`` / ``add`` / ``remove`` /
  ``commitInfo``) applied in version order — adds insert into the active
  set keyed by path, removes delete;
- **checkpoints**: ``_last_checkpoint`` pointer and
  ``<version>.checkpoint.parquet`` files (including multi-part) are the
  compacted state; replay resumes from the newest checkpoint at or below
  the requested version, so opening a long-lived table is
  O(checkpoint + tail commits), not O(history);
- **time travel**: ``version=`` replays to that commit exactly;
- **Spark-first scan**: :func:`read_delta` hands the active parquet
  paths straight to ``spark.read.parquet`` (with ``basePath`` so
  hive-layout partition directories resolve to partition columns) — the
  engine's own vectorized reader, predicate pushdown and partition
  pruning all apply; this module only decides WHICH files are live.

Honest gates: reader protocol versions above 1 (column mapping, deletion
vectors, v2 checkpoints) raise ``NotImplementedError`` — silently
ignoring a deletion vector would return deleted rows.  Malformed logs
raise positioned ``ValueError``.

No real Delta writer ships in this container, so the test fixtures are
written by :func:`write_delta_commit` / :func:`write_delta_checkpoint`
(same spec, write side); the battery oracle stays independent because
the fixture's active file set maps to a key range of the ORIGINAL
parquet that DuckDB aggregates directly — a reader that unions removed
files or misses post-checkpoint adds cannot match it.

Reference parity: the reference's arrow-data-source scans lakes of
parquet files; Delta is the dominant transactional layout over exactly
those files (oap-project/native-sql-engine README positions it alongside
Spark data sources).
"""

from __future__ import annotations

import json
import os
import re

__all__ = [
    "delta_snapshot",
    "read_delta",
    "write_delta_commit",
    "write_delta_checkpoint",
]

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CKPT_RE = re.compile(r"^(\d{20})\.checkpoint(?:\.\d+\.\d+)?\.parquet$")


def _log_dir(table_dir: str) -> str:
    d = os.path.join(table_dir, "_delta_log")
    if not os.path.isdir(d):
        raise ValueError(f"{table_dir!r} is not a Delta table (no _delta_log)")
    return d


def _check_protocol(proto: dict) -> None:
    rv = proto.get("minReaderVersion", 1)
    feats = set(proto.get("readerFeatures") or [])
    # timestampNtz affects only the type mapping Spark already handles
    feats.discard("timestampNtz")
    if rv > 1 and feats:
        raise NotImplementedError(
            f"Delta reader features {sorted(feats)} not supported "
            "(column mapping / deletion vectors / v2 checkpoints)"
        )
    if rv > 3:
        raise NotImplementedError(f"Delta minReaderVersion {rv} not supported")


def _apply_action(state: dict, action: dict) -> None:
    if "metaData" in action:
        state["metaData"] = action["metaData"]
    elif "protocol" in action:
        _check_protocol(action["protocol"])
        state["protocol"] = action["protocol"]
    elif "add" in action:
        add = action["add"]
        if add.get("deletionVector"):
            raise NotImplementedError(
                "Delta deletion vectors not supported (rows would resurrect)"
            )
        state["files"][add["path"]] = add
    elif "remove" in action:
        state["files"].pop(action["remove"]["path"], None)
    # commitInfo / txn / cdc(in commits we don't scan) are no-ops for reads


def delta_snapshot(table_dir: str, version: int | None = None) -> dict:
    """Reconstruct the active-file snapshot of a Delta table at
    ``version`` (default: latest).  Returns ``{"version", "files":
    {path: add_action}, "schema" (JSON string), "partition_columns",
    "configuration"}``."""
    log = _log_dir(table_dir)
    entries = os.listdir(log)
    commits = sorted(
        (int(m.group(1)), n) for n in entries if (m := _COMMIT_RE.match(n))
    )
    ckpts = sorted({int(m.group(1)) for n in entries if (m := _CKPT_RE.match(n))})
    if not commits and not ckpts:
        raise ValueError(f"{table_dir!r} has an empty _delta_log")
    latest = max([v for v, _ in commits] + list(ckpts))
    want = latest if version is None else version
    if version is not None and version > latest:
        raise ValueError(f"version {version} beyond latest commit {latest}")

    state: dict = {"files": {}, "metaData": None, "protocol": None}
    start = 0
    usable = [c for c in ckpts if c <= want]
    if usable:
        ck = usable[-1]
        _load_checkpoint(log, ck, entries, state)
        start = ck + 1
    for v, name in commits:
        if v < start or v > want:
            continue
        with open(os.path.join(log, name), "r", encoding="utf-8") as fh:
            for i, line in enumerate(fh):
                line = line.strip()
                if not line:
                    continue
                try:
                    action = json.loads(line)
                except json.JSONDecodeError as ex:
                    raise ValueError(f"{name} line {i + 1}: bad JSON: {ex}") from ex
                _apply_action(state, action)
    meta = state["metaData"] or {}
    fmt = (meta.get("format") or {}).get("provider", "parquet")
    if fmt != "parquet":
        raise NotImplementedError(f"Delta format provider {fmt!r} not supported")
    return {
        "version": want,
        "files": state["files"],
        "schema": meta.get("schemaString"),
        "partition_columns": meta.get("partitionColumns", []),
        "configuration": meta.get("configuration", {}),
    }


def _load_checkpoint(log: str, version: int, entries: list[str], state: dict) -> None:
    """Load add/remove/metaData/protocol state from checkpoint parquet
    part(s) at ``version``."""
    import pyarrow.parquet as pq

    parts = sorted(
        n
        for n in entries
        if (m := _CKPT_RE.match(n)) and int(m.group(1)) == version
    )
    if not parts:
        raise ValueError(f"checkpoint {version} referenced but missing")
    for part in parts:
        t = pq.read_table(os.path.join(log, part))
        cols = t.column_names
        rows = t.to_pylist()
        for row in rows:
            for key in ("metaData", "protocol", "add", "remove"):
                v = row.get(key) if key in cols else None
                if v is not None:
                    # checkpoint structs mirror the JSON action bodies
                    _apply_action(state, {key: _strip_nones(v)})


def _strip_nones(v):
    if isinstance(v, dict):
        return {k: _strip_nones(x) for k, x in v.items() if x is not None}
    if isinstance(v, list) and v and all(
        isinstance(x, tuple) and len(x) == 2 for x in v
    ):
        return dict(v)  # pyarrow materializes MAP columns as (k, v) tuples
    return v


def read_delta(spark, table_dir: str, version: int | None = None):
    """Open a Delta table as a DataFrame via Spark's own parquet scan of
    the snapshot's active files (basePath keeps hive-layout partition
    directories resolving to partition columns).  Predicate pushdown,
    column pruning and partition pruning are Spark's as usual."""
    snap = delta_snapshot(table_dir, version)
    if not snap["files"]:
        raise ValueError(f"Delta snapshot v{snap['version']} has no files")
    paths = [os.path.join(table_dir, p) for p in snap["files"]]
    return spark.read.option("basePath", table_dir).parquet(*paths)


# -- fixture write side (same spec) ----------------------------------------------------


def write_delta_commit(table_dir: str, version: int, actions: list[dict]) -> str:
    """Append one commit file (fixture writer — no real Delta writer ships
    in this container).  ``actions`` are raw action dicts."""
    log = os.path.join(table_dir, "_delta_log")
    os.makedirs(log, exist_ok=True)
    path = os.path.join(log, f"{version:020d}.json")
    with open(path, "w", encoding="utf-8") as fh:
        for a in actions:
            fh.write(json.dumps(a, separators=(",", ":")) + "\n")
    return path


def write_delta_checkpoint(table_dir: str, version: int) -> str:
    """Compact the log at ``version`` into a checkpoint parquet +
    ``_last_checkpoint`` pointer (fixture writer)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    snap = delta_snapshot(table_dir, version)
    log = os.path.join(table_dir, "_delta_log")
    kv = pa.map_(pa.string(), pa.string())
    schema = pa.schema(
        [
            pa.field(
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("configuration", kv),
                        ("format", pa.struct([("provider", pa.string()), ("options", kv)])),
                    ]
                ),
            ),
            pa.field(
                "protocol",
                pa.struct([("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]),
            ),
            pa.field(
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("partitionValues", kv),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                    ]
                ),
            ),
        ]
    )
    rows = []
    if snap["schema"] is not None:
        rows.append(
            {
                "metaData": {
                    "id": "fixture",
                    "schemaString": snap["schema"],
                    "partitionColumns": snap["partition_columns"],
                    "configuration": list(snap["configuration"].items()),
                    "format": {"provider": "parquet", "options": []},
                },
                "protocol": None,
                "add": None,
            }
        )
    rows.append(
        {"metaData": None, "protocol": {"minReaderVersion": 1, "minWriterVersion": 2}, "add": None}
    )
    for add in snap["files"].values():
        a = _strip_nones(add)
        rows.append(
            {
                "metaData": None,
                "protocol": None,
                "add": {
                    "path": a["path"],
                    "partitionValues": list((a.get("partitionValues") or {}).items()),
                    "size": a.get("size", 0),
                    "modificationTime": a.get("modificationTime", 0),
                    "dataChange": bool(a.get("dataChange", True)),
                },
            }
        )
    t = pa.Table.from_pylist(rows, schema=schema)
    path = os.path.join(log, f"{version:020d}.checkpoint.parquet")
    pq.write_table(t, path)
    with open(os.path.join(log, "_last_checkpoint"), "w", encoding="utf-8") as fh:
        json.dump({"version": version, "size": len(rows)}, fh)
    return path
