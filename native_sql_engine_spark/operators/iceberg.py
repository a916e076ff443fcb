"""Apache Iceberg table reading — Spark-first, zero iceberg-runtime jars.

Implements the read side of the public Iceberg table spec
(iceberg.apache.org/spec) deep enough to open a table's snapshot:

- **metadata walk**: newest ``metadata/*.metadata.json`` (both the
  ``v<N>.metadata.json`` and ``<seq>-<uuid>.metadata.json`` naming
  schemes), ``current-snapshot-id`` / explicit ``snapshot_id`` time
  travel, and the snapshot's ``manifest-list`` pointer;
- **manifest lists and manifests are Avro OCFs** — read by the repo's
  from-scratch Avro codec (operators/avro.py), whose round-8 nested
  type support (records in records, maps, unions) exists precisely
  because these files are deeply nested;
- **entry semantics**: manifest entries with ``status=2`` (DELETED)
  drop out of the scan; v2 ``content`` routing sends DELETES manifests
  (``manifest_file.content=1``) down the row-level-delete path instead
  of the data path;
- **positional deletes (v2 merge-on-read)**: delete files with
  ``data_file.content=1`` are plain parquet of ``(file_path, pos)``
  pairs (spec §Position Delete Files); :func:`read_iceberg` scans them
  with Spark and ``left_anti``-joins against the data scan's
  ``(_metadata.file_path, _metadata.row_index)``.  Applying every LIVE
  positional delete to every data file is sequence-safe because data
  file paths are unique and a delete row can only name an
  already-committed path (delete.seq >= data.seq by construction);
  retired delete files (entry ``status=2``) stop applying;
- **Spark-first scan**: :func:`read_iceberg` hands the live data-file
  paths to ``spark.read.parquet`` — Spark's vectorized reader,
  pushdown and pruning apply; this module only decides WHICH files are
  in the snapshot.

Mixed-format snapshots are first-class: PARQUET and ORC data files each
read through Spark's native vectorized source and union by name (a table
migrated between formats keeps both kinds live).  Honest gates:
EQUALITY delete files (``content=2`` — correct application needs
per-entry sequence-number tracking the fixture layer doesn't model yet),
AVRO data files, and metadata without a reachable manifest list raise
``NotImplementedError`` / positioned ``ValueError``.

No Iceberg writer ships in this container, so fixtures come from
:func:`write_iceberg_fixture` (same spec shapes: metadata JSON +
manifest-list Avro + manifest Avro with nested ``data_file`` records);
the battery oracle stays independent because the snapshot's live file
set maps to key ranges of the ORIGINAL parquet, so dropping a DELETED
entry wrongly — or keeping it — cannot match.

Reference parity: the reference's arrow-data-source reads lake files
through Arrow datasets; Iceberg is the manifest-driven catalog layout
over the same parquet.
"""

from __future__ import annotations

import json
import os
import re

__all__ = [
    "iceberg_snapshot",
    "read_iceberg",
    "write_iceberg_fixture",
    "write_position_delete_file",
]

_META_RE = re.compile(r"^(?:v(\d+)|(\d+)-[0-9a-f-]+)\.metadata\.json$")


def _latest_metadata(table_dir: str) -> str:
    md = os.path.join(table_dir, "metadata")
    if not os.path.isdir(md):
        raise ValueError(f"{table_dir!r} is not an Iceberg table (no metadata/)")
    best, best_v = None, -1
    for name in os.listdir(md):
        m = _META_RE.match(name)
        if m:
            v = int(m.group(1) or m.group(2))
            if v > best_v:
                best, best_v = name, v
    if best is None:
        raise ValueError(f"{table_dir!r} has no *.metadata.json")
    return os.path.join(md, best)


def _local_path(table_dir: str, p: str) -> str:
    """Manifest/data paths may be absolute, file:// URIs, or relative."""
    if p.startswith("file://"):
        return p[len("file://") :]
    if os.path.isabs(p):
        return p
    return os.path.join(table_dir, p)


def iceberg_snapshot(table_dir: str, snapshot_id: int | None = None) -> dict:
    """Resolve one snapshot's live data files.  Returns ``{"snapshot_id",
    "files": [local paths], "schema", "sequence_number"}``."""
    from .avro import read_avro

    with open(_latest_metadata(table_dir), "r", encoding="utf-8") as fh:
        meta = json.load(fh)
    snaps = meta.get("snapshots", [])
    if not snaps:
        raise ValueError(f"{table_dir!r} has no snapshots")
    want = snapshot_id if snapshot_id is not None else meta.get("current-snapshot-id")
    snap = next((s for s in snaps if s.get("snapshot-id") == want), None)
    if snap is None:
        raise ValueError(f"snapshot {want} not in {[s.get('snapshot-id') for s in snaps]}")
    mlist_path = _local_path(table_dir, snap["manifest-list"])
    with open(mlist_path, "rb") as fh:
        _, mlist = read_avro(fh.read())

    files: list[tuple[str, str]] = []
    pos_deletes: list[str] = []
    for entry in mlist:
        mpath = _local_path(table_dir, entry["manifest_path"])
        is_deletes_manifest = entry.get("content", 0) == 1
        with open(mpath, "rb") as fh:
            _, entries = read_avro(fh.read())
        for e in entries:
            if e.get("status") == 2:  # DELETED entry: file left the snapshot
                continue
            df = e.get("data_file") or {}
            content = df.get("content", 1 if is_deletes_manifest else 0)
            fmt = df.get("file_format")
            fmt = (fmt.decode() if isinstance(fmt, bytes) else fmt or "PARQUET").upper()
            if is_deletes_manifest:
                if content == 1:  # positional delete file: (file_path, pos) rows
                    if fmt != "PARQUET":
                        raise NotImplementedError(
                            f"Iceberg positional delete files in {fmt} not wired"
                        )
                    pos_deletes.append(_local_path(table_dir, df["file_path"]))
                elif content == 2:
                    raise NotImplementedError(
                        "Iceberg equality delete files not supported "
                        "(need per-entry sequence numbers to apply safely)"
                    )
                else:
                    raise ValueError(
                        f"{mpath}: data file (content=0) inside a DELETES manifest"
                    )
            else:
                if content != 0:
                    raise ValueError(
                        f"{mpath}: delete file (content={content}) inside a "
                        "data manifest (spec requires a content=1 manifest)"
                    )
                if fmt not in ("PARQUET", "ORC"):
                    raise NotImplementedError(
                        f"Iceberg data file format {fmt} not wired (PARQUET/ORC)"
                    )
                files.append((fmt, _local_path(table_dir, df["file_path"])))
    return {
        "snapshot_id": want,
        "files": [p for _, p in files],
        "files_by_format": files,
        "position_delete_files": pos_deletes,
        "schema": meta.get("schemas") or meta.get("schema"),
        "sequence_number": snap.get("sequence-number", 0),
    }


def read_iceberg(spark, table_dir: str, snapshot_id: int | None = None):
    """Open an Iceberg snapshot as a DataFrame via Spark's own scans of
    the manifest-resolved live files.  Mixed-format snapshots (a table
    migrated from ORC to parquet keeps its old ORC data files) read each
    format through its native vectorized source and union by name.

    Positional delete files (merge-on-read) are themselves scanned by
    Spark and removed with a ``left_anti`` join on ``(_metadata.file_path,
    _metadata.row_index)`` — delete files are tiny next to data files, so
    Catalyst's size-based planning broadcasts the delete side; at 100 TB
    the join degrades gracefully to a shuffled anti-join instead of
    failing."""
    from pyspark.sql import functions as F

    snap = iceberg_snapshot(table_dir, snapshot_id)
    if not snap["files"]:
        raise ValueError(f"Iceberg snapshot {snap['snapshot_id']} has no data files")
    by_fmt: dict[str, list[str]] = {}
    for fmt, p in snap["files_by_format"]:
        by_fmt.setdefault(fmt, []).append(p)
    with_deletes = bool(snap["position_delete_files"])

    def meta_cols(part):
        # file: URI -> plain absolute path, matching manifest file_path values
        return part.withColumn(
            "__ice_fp",
            F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/"),
        ).withColumn("__ice_ri", F.col("_metadata.row_index"))

    parts = []
    if "PARQUET" in by_fmt:
        parts.append(spark.read.parquet(*by_fmt["PARQUET"]))
    if "ORC" in by_fmt:
        parts.append(spark.read.orc(*by_fmt["ORC"]))
    if with_deletes:
        parts = [meta_cols(p) for p in parts]
    df = parts[0]
    for other in parts[1:]:
        df = df.unionByName(other, allowMissingColumns=False)
    if not with_deletes:
        return df

    cols = [c for c in df.columns if c not in ("__ice_fp", "__ice_ri")]
    deletes = spark.read.parquet(*snap["position_delete_files"]).select(
        F.regexp_replace(F.col("file_path"), "^file:/+", "/").alias("__ice_fp"),
        F.col("pos").alias("__ice_ri"),
    )
    return df.join(deletes, ["__ice_fp", "__ice_ri"], "left_anti").select(*cols)


# -- fixture write side (spec shapes; no Iceberg writer ships here) -------------------

_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
    ],
}

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {
                        "name": "lower_bounds",
                        "type": ["null", {"type": "map", "values": "bytes"}],
                    },
                ],
            },
        },
    ],
}


def write_position_delete_file(path: str, deletes: list[tuple[str, int]]) -> str:
    """Write a positional delete file (spec §Position Delete Files): plain
    parquet of ``(file_path string, pos long)`` rows, sorted by (file_path,
    pos) as the spec requires."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = sorted(deletes)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array([fp for fp, _ in rows], pa.string()),
                "pos": pa.array([p for _, p in rows], pa.int64()),
            }
        ),
        path,
    )
    return path


def write_iceberg_fixture(
    table_dir: str,
    snapshots: dict[int, list[tuple]],
    current: int,
) -> None:
    """Build an Iceberg-shaped table (fixture writer).  ``snapshots`` maps
    snapshot-id -> entries, each ``(status, file_path)`` for a data file or
    ``(status, file_path, content)`` with content 1 for a positional delete
    file.  Data entries go into a content=0 manifest, delete entries into a
    separate content=1 DELETES manifest (as the spec requires); each
    snapshot gets its own manifest list, all serialized through the
    from-scratch nested Avro codec."""
    from .avro import write_avro

    md = os.path.join(table_dir, "metadata")
    os.makedirs(md, exist_ok=True)
    snap_meta = []
    for sid, raw_entries in snapshots.items():
        entries = [(e[0], e[1], e[2] if len(e) > 2 else 0) for e in raw_entries]
        manifests = []  # (path, manifest_content, entries)
        for manifest_content in (0, 1):
            # content 1 (positional) and 2 (equality) both live in DELETES manifests
            wanted = (0,) if manifest_content == 0 else (1, 2)
            sub = [e for e in entries if e[2] in wanted]
            if not sub:
                continue
            suffix = "" if manifest_content == 0 else "-deletes"
            manifest = os.path.join(md, f"manifest-{sid}{suffix}.avro")
            rows = [
                {
                    "status": status,
                    "snapshot_id": sid,
                    "data_file": {
                        "content": content,
                        "file_path": path,
                        "file_format": "ORC" if path.endswith(".orc") else "PARQUET",
                        "record_count": 0,
                        "file_size_in_bytes": 0,
                        "lower_bounds": None,
                    },
                }
                for status, path, content in sub
            ]
            with open(manifest, "wb") as fh:
                fh.write(write_avro(rows, _MANIFEST_ENTRY_SCHEMA, codec="deflate"))
            manifests.append((manifest, manifest_content, sub))
        mlist = os.path.join(md, f"snap-{sid}.avro")
        with open(mlist, "wb") as fh:
            fh.write(
                write_avro(
                    [
                        {
                            "manifest_path": manifest,
                            "manifest_length": os.path.getsize(manifest),
                            "partition_spec_id": 0,
                            "content": manifest_content,
                            "added_files_count": sum(1 for s, _, _ in sub if s == 1),
                            "existing_files_count": sum(1 for s, _, _ in sub if s == 0),
                            "deleted_files_count": sum(1 for s, _, _ in sub if s == 2),
                        }
                        for manifest, manifest_content, sub in manifests
                    ],
                    _MANIFEST_FILE_SCHEMA,
                    codec="deflate",
                )
            )
        snap_meta.append(
            {
                "snapshot-id": sid,
                "sequence-number": sid,
                "timestamp-ms": 0,
                "manifest-list": mlist,
                "summary": {"operation": "append"},
            }
        )
    meta = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": table_dir,
        "last-sequence-number": max(snapshots),
        "current-snapshot-id": current,
        "snapshots": snap_meta,
        "schemas": [],
    }
    with open(os.path.join(md, f"v{len(snapshots)}.metadata.json"), "w") as fh:
        json.dump(meta, fh)
