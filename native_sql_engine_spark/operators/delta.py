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
- **deletion vectors** (PROTOCOL.md — Deletion Vectors): an ``add`` may
  carry a ``deletionVector`` descriptor marking row indexes of the
  parquet file as deleted without rewriting it.  All three storage
  types are read — ``u`` (relative ``deletion_vector_<uuid>.bin`` file,
  uuid Z85-encoded in the descriptor), ``p`` (absolute path), ``i``
  (inline, Z85-encoded payload).  The on-disk blob is ``version byte
  0x01`` then per-DV ``int32-BE size / data / int32-BE CRC-32(data)``;
  the data is a little-endian magic ``1681511377`` + a 64-bit
  RoaringBitmapArray (operators/roaring.py).  :func:`read_delta`
  expands descriptors to ``(file, row_index)`` pairs EXECUTOR-side
  (``mapInPandas`` over the descriptor rows — the driver never holds
  position lists) and anti-joins them against the scan's
  ``_metadata.row_index``, broadcasting only when the descriptors'
  summed cardinality says the delete side is small;
- **Spark-first scan**: :func:`read_delta` hands the active parquet
  paths straight to ``spark.read.parquet`` (with ``basePath`` so
  hive-layout partition directories resolve to partition columns) — the
  engine's own vectorized reader, predicate pushdown and partition
  pruning all apply; this module only decides WHICH files are live.

- **column mapping** (PROTOCOL.md — Column Mapping): ``name`` mode scans
  the physical ``col-<uuid>`` columns and aliases them back to logical
  names; ``id`` mode is fully Spark-first — the read schema carries
  ``parquet.field.id`` metadata and Spark's own vectorized reader
  resolves columns by parquet field id (physical names and order become
  irrelevant, the protocol's id-mode contract).  ``minReaderVersion`` 2
  ("column mapping capable") therefore opens normally now.

- **Change Data Feed** (``delta.enableChangeDataFeed`` /
  ``table_changes()``): :func:`read_delta_cdf` replays a version range —
  ``cdc`` actions' parquet (authoritative, suppressing that commit's
  rewrite add/removes), else insert/delete derivation from dataChange
  file actions; output carries ``_change_type`` / ``_commit_version`` /
  ``_commit_timestamp``.  A vacuumed removed file hard-fails instead of
  silently dropping deletes.

- **V2 checkpoints** (the ``v2Checkpoint`` reader feature, Delta 3.x's
  default): UUID-named json/parquet checkpoints whose file actions live
  inline or in parquet SIDECAR files under ``_delta_log/_sidecars/``;
  ``checkpointMetadata`` lines are recognized, a missing sidecar
  hard-fails (silently dropping one would un-delete or lose files).

Honest gates: column mapping over NESTED columns, and 'id'-mode mapping
over PARTITIONED tables (hive directory names carry no parquet field
ids — 'name' mode handles them via the same alias select as data
columns), and other unknown reader features raise
``NotImplementedError``.  Malformed logs,
DV checksum/cardinality mismatches and truncated DV blobs raise
positioned ``ValueError``.  Single-writer caveat: no real Delta writer
ships in this container, so the DV byte layout cannot be
cross-validated against delta-spark output here; it follows
PROTOCOL.md's published layout and the fixtures are self-written.

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
import struct
import uuid as _uuidlib
import zlib

__all__ = [
    "delta_snapshot",
    "read_delta",
    "read_deletion_vector",
    "write_delta_commit",
    "write_delta_checkpoint",
    "write_delta_checkpoint_v2",
    "write_deletion_vector",
    "inline_dv_descriptor",
    "z85_encode",
    "z85_decode",
]

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
#: classic checkpoints: <v>.checkpoint.parquet / <v>.checkpoint.<i>.<n>.parquet;
#: v2 checkpoints: <v>.checkpoint.<uuid>.{json,parquet}
_CKPT_RE = re.compile(
    r"^(\d{20})\.checkpoint(?:\.\d+\.\d+|\.[0-9a-fA-F-]{36})?\.(?:parquet|json)$"
)
_CKPT_V2_RE = re.compile(r"^(\d{20})\.checkpoint\.[0-9a-fA-F-]{36}\.(json|parquet)$")


def _log_dir(table_dir: str) -> str:
    d = os.path.join(table_dir, "_delta_log")
    if not os.path.isdir(d):
        raise ValueError(f"{table_dir!r} is not a Delta table (no _delta_log)")
    return d


#: readerFeatures this module actually honors.  timestampNtz affects only
#: the type mapping Spark already handles; deletionVectors are applied as a
#: row_index anti-join; columnMapping resolves physical col-<uuid> names
#: (``name`` mode) or parquet field ids (``id`` mode) back to logical names
#: (see :func:`read_delta`).
_SUPPORTED_READER_FEATURES = {
    "timestampNtz",
    "deletionVectors",
    "columnMapping",
    "v2Checkpoint",
}


def _check_protocol(proto: dict) -> None:
    rv = proto.get("minReaderVersion", 1)
    # rv=2 predates feature flags and means exactly "column mapping
    # capable" — supported via the schemaString's physicalName/id metadata
    feats = set(proto.get("readerFeatures") or [])
    unsupported = feats - _SUPPORTED_READER_FEATURES
    if rv > 1 and unsupported:
        raise NotImplementedError(
            f"Delta reader features {sorted(unsupported)} not supported "
            "(type widening / variant ...)"
        )
    if rv > 3:
        raise NotImplementedError(f"Delta minReaderVersion {rv} not supported")


def _check_metadata(meta: dict) -> None:
    mode = (meta.get("configuration") or {}).get("delta.columnMapping.mode")
    if mode not in (None, "none", "name", "id"):
        raise NotImplementedError(f"Delta column mapping mode {mode!r} not supported")


def _apply_action(state: dict, action: dict) -> None:
    if "metaData" in action:
        _check_metadata(action["metaData"])
        state["metaData"] = action["metaData"]
    elif "protocol" in action:
        _check_protocol(action["protocol"])
        state["protocol"] = action["protocol"]
    elif "add" in action:
        add = action["add"]
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
    """Load add/remove/metaData/protocol state from checkpoint part(s) at
    ``version`` — classic single/multi-part parquet, or a V2 checkpoint
    (UUID-named json or parquet) whose file actions may live inline or in
    ``sidecar``-referenced parquet files under ``_delta_log/_sidecars/``."""
    parts = sorted(
        n
        for n in entries
        if (m := _CKPT_RE.match(n)) and int(m.group(1)) == version
    )
    if not parts:
        raise ValueError(f"checkpoint {version} referenced but missing")
    for part in parts:
        path = os.path.join(log, part)
        if _CKPT_V2_RE.match(part) and part.endswith(".json"):
            with open(path, "r", encoding="utf-8") as fh:
                for i, line in enumerate(fh):
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        action = json.loads(line)
                    except json.JSONDecodeError as ex:
                        raise ValueError(f"{part} line {i + 1}: bad JSON: {ex}") from ex
                    _apply_ckpt_action(log, state, action)
        else:
            for row in _parquet_rows(path):
                _apply_ckpt_action(log, state, row)


def _apply_ckpt_action(log: str, state: dict, action: dict) -> None:
    """One checkpoint row/line: the four replay actions, plus the V2-only
    ``checkpointMetadata`` (sanity marker, no state) and ``sidecar``
    (pointer to a parquet of file actions under ``_sidecars/``)."""
    for key in ("metaData", "protocol", "add", "remove"):
        v = action.get(key)
        if v is not None:
            _apply_action(state, {key: _strip_nones(v)})
    sc = action.get("sidecar")
    if sc is not None:
        sc = _strip_nones(sc)
        sc_path = os.path.join(log, "_sidecars", sc["path"])
        if not os.path.isfile(sc_path):
            raise ValueError(f"checkpoint sidecar missing: {sc['path']}")
        for row in _parquet_rows(sc_path):
            for key in ("add", "remove"):
                v = row.get(key)
                if v is not None:
                    _apply_action(state, {key: _strip_nones(v)})


def _parquet_rows(path: str) -> list[dict]:
    import pyarrow.parquet as pq

    return pq.read_table(path).to_pylist()


def _strip_nones(v):
    if isinstance(v, dict):
        return {k: _strip_nones(x) for k, x in v.items() if x is not None}
    if isinstance(v, list) and v and all(
        isinstance(x, tuple) and len(x) == 2 for x in v
    ):
        return dict(v)  # pyarrow materializes MAP columns as (k, v) tuples
    return v


# -- deletion vectors (PROTOCOL.md — Deletion Vectors) ---------------------------------

#: ZeroMQ Z85 alphabet (rfc.zeromq.org/spec/32) — Delta encodes DV uuids and
#: inline DV payloads with it.
_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INV = {c: i for i, c in enumerate(_Z85)}
_DV_MAGIC = 1681511377  # little-endian prefix of the serialized bitmap data
_DV_FILE_VERSION = 1
#: broadcast the deleted-position side of the anti-join only below this many
#: positions (past it, a shuffled anti-join is the safe 100-TB plan)
_DV_BROADCAST_POSITIONS = 4_000_000


def z85_encode(data: bytes) -> str:
    """Z85: 4 bytes -> 5 chars, big-endian base-85 (input length % 4 == 0)."""
    if len(data) % 4:
        raise ValueError(f"z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        n = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[n % 85])
            n //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(s: str) -> bytes:
    """Inverse of :func:`z85_encode` (input length % 5 == 0)."""
    if len(s) % 5:
        raise ValueError(f"z85 input length {len(s)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        n = 0
        for c in s[i : i + 5]:
            if c not in _Z85_INV:
                raise ValueError(f"z85 invalid character {c!r} at offset {i}")
            n = n * 85 + _Z85_INV[c]
        if n > 0xFFFFFFFF:
            raise ValueError(f"z85 group at offset {i} overflows 32 bits")
        out += n.to_bytes(4, "big")
    return bytes(out)


def _dv_resolve_path(table_dir: str, dv: dict) -> str:
    """Absolute path of a 'u'/'p' descriptor's .bin file."""
    st = dv.get("storageType")
    enc = dv.get("pathOrInlineDv", "")
    if st == "p":
        return enc[len("file://") :] if enc.startswith("file://") else enc
    # 'u': optional random-prefix dir + 20-char Z85 uuid
    prefix, uz = enc[:-20], enc[-20:]
    u = _uuidlib.UUID(bytes=z85_decode(uz))
    parts = [table_dir] + ([prefix] if prefix else []) + [f"deletion_vector_{u}.bin"]
    return os.path.join(*parts)


def _dv_data_bytes(dv: dict, table_dir: str) -> bytes:
    """Fetch + integrity-check one descriptor's serialized DV data
    (magic + bitmap), from its .bin file or inline payload."""
    st = dv.get("storageType")
    if st == "i":
        data = z85_decode(dv["pathOrInlineDv"])
    elif st in ("u", "p"):
        path = _dv_resolve_path(table_dir, dv)
        with open(path, "rb") as fh:
            blob = fh.read()
        if not blob or blob[0] != _DV_FILE_VERSION:
            raise ValueError(
                f"{path}: bad DV file version {blob[:1]!r} (want {_DV_FILE_VERSION})"
            )
        off = int(dv.get("offset", 1))
        if off + 4 > len(blob):
            raise ValueError(f"{path}: DV offset {off} beyond file end {len(blob)}")
        size = struct.unpack_from(">i", blob, off)[0]
        if size < 4 or off + 4 + size + 4 > len(blob):
            raise ValueError(f"{path}: DV at offset {off} truncated (size {size})")
        data = blob[off + 4 : off + 4 + size]
        want_crc = struct.unpack_from(">I", blob, off + 4 + size)[0]
        if zlib.crc32(data) != want_crc:
            raise ValueError(f"{path}: DV checksum mismatch at offset {off}")
    else:
        raise ValueError(f"unknown DV storageType {st!r}")
    declared = dv.get("sizeInBytes")
    if declared is not None and int(declared) != len(data):
        raise ValueError(
            f"DV sizeInBytes {declared} != actual payload {len(data)} bytes"
        )
    return data


def _dv_positions(data: bytes, cardinality: int | None) -> list[int]:
    """Decode DV data into sorted row indexes; validate the magic and the
    descriptor's declared cardinality."""
    from .roaring import deserialize_roaring64

    if len(data) < 4 or struct.unpack_from("<I", data, 0)[0] != _DV_MAGIC:
        raise ValueError(f"DV data magic mismatch (head {data[:4]!r})")
    positions, end = deserialize_roaring64(data, 4)
    if end != len(data):
        raise ValueError(f"DV data has {len(data) - end} trailing bytes")
    if cardinality is not None and len(positions) != int(cardinality):
        raise ValueError(
            f"DV cardinality {cardinality} != decoded {len(positions)} positions"
        )
    return positions


def read_deletion_vector(table_dir: str, dv: dict) -> list[int]:
    """Resolve + decode one ``deletionVector`` descriptor into the sorted
    row indexes it marks deleted (driver-side helper for tests/tools; the
    scan path expands descriptors executor-side)."""
    return _dv_positions(_dv_data_bytes(dv, table_dir), dv.get("cardinality"))


def _dv_deleted_positions_df(spark, table_dir: str, dv_files: dict):
    """DataFrame of ``(__dv_path, __dv_ri)`` deleted positions, expanded
    from the (tiny) descriptor rows executor-side so the driver never
    materializes a position list.  ``dv_files`` maps the data file's
    absolute path -> descriptor dict.  The .bin reads happen in the
    executors — on a cluster the DV files sit beside the data files on
    the same store, exactly where scan tasks already read."""
    import pandas as pd

    rows = [
        {
            "data_path": data_path,
            "storage": dv.get("storageType", ""),
            "bin_path": (
                "" if dv.get("storageType") == "i" else _dv_resolve_path(table_dir, dv)
            ),
            "offset": int(dv.get("offset", 1)),
            "size_in_bytes": int(dv.get("sizeInBytes", -1)),
            "cardinality": int(dv.get("cardinality", -1)),
            "inline": dv.get("pathOrInlineDv", "") if dv.get("storageType") == "i" else "",
        }
        for data_path, dv in dv_files.items()
    ]
    desc = spark.createDataFrame(
        pd.DataFrame(rows),
        "data_path string, storage string, bin_path string, offset long, "
        "size_in_bytes long, cardinality long, inline string",
    ).repartition(min(len(rows), 32))

    def expand(it):
        for pdf in it:
            for r in pdf.itertuples(index=False):
                dv = {
                    "storageType": r.storage,
                    "pathOrInlineDv": r.inline if r.storage == "i" else None,
                    "offset": r.offset,
                    "sizeInBytes": None if r.size_in_bytes < 0 else r.size_in_bytes,
                    "cardinality": None if r.cardinality < 0 else r.cardinality,
                }
                if r.storage == "i":
                    data = _dv_data_bytes(dv, "")
                else:
                    with open(r.bin_path, "rb") as fh:
                        blob = fh.read()
                    if not blob or blob[0] != _DV_FILE_VERSION:
                        raise ValueError(f"{r.bin_path}: bad DV file version")
                    size = struct.unpack_from(">i", blob, r.offset)[0]
                    data = blob[r.offset + 4 : r.offset + 4 + size]
                    want = struct.unpack_from(">I", blob, r.offset + 4 + size)[0]
                    if zlib.crc32(data) != want:
                        raise ValueError(f"{r.bin_path}: DV checksum mismatch")
                pos = _dv_positions(
                    data, None if r.cardinality < 0 else r.cardinality
                )
                yield pd.DataFrame({"__dv_path": r.data_path, "__dv_ri": pos})

    return desc.mapInPandas(expand, "__dv_path string, __dv_ri long")


def _cm_meta(f: dict) -> tuple[str, int]:
    """A mapped field's (physicalName, id) — mandatory under column
    mapping for every field, nested ones included (PROTOCOL.md Column
    Mapping: writers annotate the whole schema)."""
    md = f.get("metadata") or {}
    phys = md.get("delta.columnMapping.physicalName")
    fid = md.get("delta.columnMapping.id")
    if phys is None or fid is None:
        raise ValueError(
            f"column mapping enabled but field {f.get('name')!r} lacks "
            "physicalName/id metadata"
        )
    return phys, int(fid)


def _cm_rebuild(col, t):
    """Project a physically-named value onto its LOGICAL shape,
    recursively: struct fields re-alias physical->logical at every
    level, arrays/maps of structs rebuild through ``transform`` /
    ``transform_values`` (JVM lambda expressions, no Python UDF), and
    primitives pass through.  A NULL struct stays NULL (a bare
    ``struct(...)`` would resurrect it as a struct of nulls)."""
    from pyspark.sql import functions as F

    if not isinstance(t, dict):
        return col
    kind = t.get("type")
    if kind == "struct":
        inner = []
        for f in t.get("fields", []):
            phys, _fid = _cm_meta(f)
            inner.append(_cm_rebuild(col.getField(phys), f["type"]).alias(f["name"]))
        return F.when(col.isNotNull(), F.struct(*inner))
    if kind == "array":
        et = t.get("elementType")
        if not isinstance(et, dict):
            return col
        return F.transform(col, lambda x: _cm_rebuild(x, et))
    if kind == "map":
        if isinstance(t.get("keyType"), dict):
            raise NotImplementedError(
                "Delta column mapping over nested map KEYS not supported"
            )
        vt = t.get("valueType")
        if not isinstance(vt, dict):
            return col
        return F.transform_values(col, lambda _k, v: _cm_rebuild(v, vt))
    raise NotImplementedError(
        f"Delta column mapping over type {kind!r} not supported"
    )


#: id-mode footer sampling cap: physical layouts are constant per table
#: (writers never re-id columns), so a handful of footers pins the
#: fieldId->name map without a driver-side scan of every file.
_FOOTER_SAMPLE_CAP = 16


def _footer_field_ids(paths: list[str]) -> dict[int, str]:
    """Top-level parquet fieldId -> column-name map, read from up to
    ``_FOOTER_SAMPLE_CAP`` file footers via pyarrow.  Files disagreeing
    on a field id gate (per-file resolution would need per-file scans)."""
    import pyarrow.parquet as pq

    out: dict[int, str] = {}
    for p in paths[:_FOOTER_SAMPLE_CAP]:
        for fld in pq.read_schema(p):
            fid = (fld.metadata or {}).get(b"PARQUET:field_id")
            if fid is None:
                continue
            i = int(fid)
            if i in out and out[i] != fld.name:
                raise NotImplementedError(
                    f"Delta id-mode files disagree on field id {i}: "
                    f"{out[i]!r} vs {fld.name!r} (per-file resolution not wired)"
                )
            out[i] = fld.name
    return out


def read_delta(spark, table_dir: str, version: int | None = None):
    """Open a Delta table as a DataFrame via Spark's own parquet scan of
    the snapshot's active files (basePath keeps hive-layout partition
    directories resolving to partition columns).  Predicate pushdown,
    column pruning and partition pruning are Spark's as usual.

    Files carrying a ``deletionVector`` get their deleted row indexes
    removed by a ``left_anti`` join on ``(_metadata.file_path,
    _metadata.row_index)`` — the Spark-first formulation of the
    protocol's "apply the DV before returning rows" rule.  The delete
    side is broadcast when the descriptors' summed cardinality (known
    before any decode) is small, else it shuffles like any other join."""
    from pyspark.sql import functions as F

    snap = delta_snapshot(table_dir, version)
    if not snap["files"]:
        raise ValueError(f"Delta snapshot v{snap['version']} has no files")
    paths = [os.path.join(table_dir, p) for p in snap["files"]]

    mode = (snap["configuration"] or {}).get("delta.columnMapping.mode")
    rename = None  # logical projection exprs applied after scan + DV join
    if mode in ("name", "id"):
        schema = json.loads(snap["schema"] or "{}")
        src_of: dict[str, str] = {}  # logical -> physical source column
        fid_of: dict[str, int] = {}
        for f in schema.get("fields", []):
            phys, fid = _cm_meta(f)
            src_of[f["name"]] = phys
            fid_of[f["name"]] = fid
        if mode == "id":
            # id mode: the FILES' parquet field ids are authoritative for
            # data columns — resolve physical names from footers (no
            # session-wide conf mutation; the old fieldId.read.enabled
            # approach leaked into every later parquet read).  Partition
            # columns stay on metadata physicalName: hive directory names
            # are strings, field ids cannot resolve a directory.
            fid_names = _footer_field_ids(paths)
            parts_set = set(snap["partition_columns"] or [])
            for name, fid in fid_of.items():
                if name not in parts_set and fid in fid_names:
                    src_of[name] = fid_names[fid]
        df = spark.read.option("basePath", table_dir).parquet(*paths)
        rename = [
            _cm_rebuild(F.col(f"`{src_of[f['name']]}`"), f["type"]).alias(f["name"])
            for f in schema.get("fields", [])
        ]
    else:
        df = spark.read.option("basePath", table_dir).parquet(*paths)

    dv_files = {
        os.path.abspath(os.path.join(table_dir, p)): add["deletionVector"]
        for p, add in snap["files"].items()
        if add.get("deletionVector")
    }
    def _renamed(d):
        if rename is None:
            return d
        return d.select(*rename)

    if not dv_files:
        return _renamed(df)

    deleted = _dv_deleted_positions_df(spark, table_dir, dv_files)
    total_card = sum(int(dv.get("cardinality", 0)) for dv in dv_files.values())
    if 0 <= total_card <= _DV_BROADCAST_POSITIONS:
        deleted = F.broadcast(deleted)
    cols = df.columns
    # _metadata.file_path is a file: URI; normalize to a plain absolute path
    scan = df.withColumn(
        "__dv_path", F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/")
    ).withColumn("__dv_ri", F.col("_metadata.row_index"))
    return _renamed(scan.join(deleted, ["__dv_path", "__dv_ri"], "left_anti").select(*cols))


# -- fixture write side (same spec) ----------------------------------------------------


def write_deletion_vector(
    table_dir: str,
    positions,
    prefix: str = "",
    dv_uuid: _uuidlib.UUID | None = None,
) -> dict:
    """Write a ``deletion_vector_<uuid>.bin`` file holding ``positions``
    (row indexes) and return the ``deletionVector`` descriptor to embed in
    an ``add`` action (fixture writer — storageType ``u``)."""
    pos = sorted(set(int(p) for p in positions))
    from .roaring import serialize_roaring64

    data = struct.pack("<I", _DV_MAGIC) + serialize_roaring64(pos)
    u = dv_uuid or _uuidlib.uuid4()
    out_dir = os.path.join(table_dir, prefix) if prefix else table_dir
    os.makedirs(out_dir, exist_ok=True)
    blob = (
        bytes([_DV_FILE_VERSION])
        + struct.pack(">i", len(data))
        + data
        + struct.pack(">I", zlib.crc32(data))
    )
    with open(os.path.join(out_dir, f"deletion_vector_{u}.bin"), "wb") as fh:
        fh.write(blob)
    return {
        "storageType": "u",
        "pathOrInlineDv": prefix + z85_encode(u.bytes),
        "offset": 1,
        "sizeInBytes": len(data),
        "cardinality": len(pos),
    }


def inline_dv_descriptor(positions) -> dict:
    """Descriptor with the DV payload inline (storageType ``i``).  Z85
    needs a 4-byte-multiple payload; the magic(4) + int64 count(8) +
    bucket key(4) + roaring cookie/count(8) prefix and 4-byte headers
    keep everything aligned except the 2-byte array-container entries, so
    an odd cardinality is padded by using file storage instead."""
    pos = sorted(set(int(p) for p in positions))
    from .roaring import serialize_roaring64

    data = struct.pack("<I", _DV_MAGIC) + serialize_roaring64(pos)
    if len(data) % 4:
        raise ValueError(
            f"inline DV payload is {len(data)} bytes (not a multiple of 4); "
            "use write_deletion_vector (file storage) for this position set"
        )
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data),
        "sizeInBytes": len(data),
        "cardinality": len(pos),
    }


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
                        # a checkpoint that drops DV descriptors silently
                        # resurrects deleted rows for checkpoint-resumed reads
                        (
                            "deletionVector",
                            pa.struct(
                                [
                                    ("storageType", pa.string()),
                                    ("pathOrInlineDv", pa.string()),
                                    ("offset", pa.int32()),
                                    ("sizeInBytes", pa.int32()),
                                    ("cardinality", pa.int64()),
                                ]
                            ),
                        ),
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
                    "deletionVector": (
                        {
                            "storageType": dv.get("storageType"),
                            "pathOrInlineDv": dv.get("pathOrInlineDv"),
                            "offset": int(dv.get("offset", 1)),
                            "sizeInBytes": int(dv.get("sizeInBytes", -1)),
                            "cardinality": int(dv.get("cardinality", -1)),
                        }
                        if (dv := a.get("deletionVector"))
                        else None
                    ),
                },
            }
        )
    t = pa.Table.from_pylist(rows, schema=schema)
    path = os.path.join(log, f"{version:020d}.checkpoint.parquet")
    pq.write_table(t, path)
    with open(os.path.join(log, "_last_checkpoint"), "w", encoding="utf-8") as fh:
        json.dump({"version": version, "size": len(rows)}, fh)
    return path


def write_delta_checkpoint_v2(
    table_dir: str, version: int, sidecar_parts: int = 2
) -> str:
    """Compact the log at ``version`` into a V2 checkpoint (fixture
    writer): a UUID-named json checkpoint holding ``checkpointMetadata``,
    ``protocol``, ``metaData`` and ``sidecar`` pointers, with the add
    actions sharded across ``sidecar_parts`` parquet files under
    ``_delta_log/_sidecars/`` — the layout the ``v2Checkpoint`` reader
    feature announces."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    snap = delta_snapshot(table_dir, version)
    log = os.path.join(table_dir, "_delta_log")
    sc_dir = os.path.join(log, "_sidecars")
    os.makedirs(sc_dir, exist_ok=True)
    kv = pa.map_(pa.string(), pa.string())
    add_schema = pa.schema(
        [
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
            )
        ]
    )
    adds = [_strip_nones(a) for a in snap["files"].values()]
    shards: list[list[dict]] = [[] for _ in range(max(1, sidecar_parts))]
    for i, a in enumerate(adds):
        shards[i % len(shards)].append(
            {
                "add": {
                    "path": a["path"],
                    "partitionValues": list((a.get("partitionValues") or {}).items()),
                    "size": a.get("size", 0),
                    "modificationTime": a.get("modificationTime", 0),
                    "dataChange": bool(a.get("dataChange", True)),
                }
            }
        )
    u = _uuidlib.uuid4()
    lines = [
        {"checkpointMetadata": {"version": version, "tags": {}}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["v2Checkpoint"],
                      "writerFeatures": ["v2Checkpoint"]}},
    ]
    if snap["schema"] is not None:
        lines.append(
            {
                "metaData": {
                    "id": "fixture-v2",
                    "schemaString": snap["schema"],
                    "partitionColumns": snap["partition_columns"],
                    "configuration": snap["configuration"],
                    "format": {"provider": "parquet", "options": {}},
                }
            }
        )
    for i, shard in enumerate(shards):
        name = f"{_uuidlib.uuid4()}.parquet"
        pq.write_table(pa.Table.from_pylist(shard, schema=add_schema),
                       os.path.join(sc_dir, name))
        lines.append(
            {
                "sidecar": {
                    "path": name,
                    "sizeInBytes": os.path.getsize(os.path.join(sc_dir, name)),
                    "modificationTime": 0,
                }
            }
        )
    path = os.path.join(log, f"{version:020d}.checkpoint.{u}.json")
    with open(path, "w", encoding="utf-8") as fh:
        for line in lines:
            fh.write(json.dumps(line, separators=(",", ":")) + "\n")
    with open(os.path.join(log, "_last_checkpoint"), "w", encoding="utf-8") as fh:
        json.dump({"version": version, "size": len(lines)}, fh)
    return path


# -- change data feed (PROTOCOL.md — Change Data Files) --------------------------------


def read_delta_cdf(
    spark,
    table_dir: str,
    starting_version: int = 0,
    ending_version: int | None = None,
):
    """Change Data Feed between two commit versions (inclusive) — the
    read side of ``delta.enableChangeDataFeed`` / ``table_changes()``.

    Per commit, in protocol order of preference:

    - **cdc actions** are authoritative: their parquet files (under
      ``_change_data/``) already carry ``_change_type`` rows
      (``insert`` / ``delete`` / ``update_preimage`` /
      ``update_postimage``) and, when present, SUPPRESS derivation from
      that commit's add/remove actions (an update commit also rewrites
      files; deriving from those too would double-count);
    - otherwise changes derive from the file actions: ``add`` with
      ``dataChange=true`` contributes its rows as ``insert``, ``remove``
      with ``dataChange=true`` as ``delete`` (this requires the removed
      file to still exist — i.e. not vacuumed — and hard-fails
      otherwise rather than silently dropping deletes).

    Output = table columns + ``_change_type``, ``_commit_version``,
    ``_commit_timestamp`` (epoch millis from commitInfo, 0 if absent).

    **Deletion-vector commits** derive exact per-row changes: a DV update
    (``remove`` + ``add`` of the same path with a grown DV — the
    default-on delete path of modern writers) emits as ``delete`` the
    rows at positions(DV_new) − positions(DV_old) and as ``insert`` any
    restored positions(DV_old) − positions(DV_new); a brand-new file
    carrying a DV inserts only its live rows; a removed file that had a
    DV emits deletes only for rows not already DV-deleted (re-emitting
    those would double-count).  Each file's DV state BEFORE each commit
    comes from a driver-side replay of the listed json commits (seeded
    from the checkpointed snapshot when the log is truncated) — metadata
    work of the same class delta-spark's CDF does; position sets expand
    executor-side and broadcast when small.  Gated: CDF over
    column-mapping commits (physical-name resolution)."""
    from pyspark.sql import functions as F

    log = _log_dir(table_dir)
    commits = sorted(
        (int(m.group(1)), n)
        for n in os.listdir(log)
        if (m := _COMMIT_RE.match(n))
    )
    if ending_version is None:
        ending_version = commits[-1][0] if commits else 0
    # per-file DV state BEFORE the commit being derived; replay starts at
    # the earliest listed json commit, seeding from the checkpoint when
    # the log head was cleaned up
    first_listed = commits[0][0] if commits else 0
    dv_state: dict[str, dict | None] = {}
    if first_listed > 0:
        dv_state = {
            p: a.get("deletionVector")
            for p, a in delta_snapshot(table_dir, first_listed - 1)["files"].items()
        }
    mapping_mode = None
    parts = []
    for v, name in commits:
        if v > ending_version:
            break
        in_range = v >= starting_version
        cdc_paths: list[str] = []
        all_adds: list[dict] = []
        all_removes: list[dict] = []
        ts = 0
        with open(os.path.join(log, name), "r", encoding="utf-8") as fh:
            for i, line in enumerate(fh):
                line = line.strip()
                if not line:
                    continue
                try:
                    action = json.loads(line)
                except json.JSONDecodeError as ex:
                    raise ValueError(f"{name} line {i + 1}: bad JSON: {ex}") from ex
                if "cdc" in action:
                    cdc_paths.append(action["cdc"]["path"])
                elif "add" in action:
                    all_adds.append(action["add"])
                elif "remove" in action:
                    all_removes.append(action["remove"])
                elif "metaData" in action:
                    mapping_mode = (
                        action["metaData"].get("configuration") or {}
                    ).get("delta.columnMapping.mode")
                elif "commitInfo" in action:
                    ts = int(action["commitInfo"].get("timestamp", 0))

        def _apply_state():
            for r in all_removes:
                dv_state.pop(r["path"], None)
            for a in all_adds:
                dv_state[a["path"]] = a.get("deletionVector")

        if not in_range:
            _apply_state()
            continue
        if mapping_mode in ("name", "id"):
            raise NotImplementedError(
                "CDF over column-mapping tables not supported"
            )
        adds = [a for a in all_adds if a.get("dataChange", True)]
        removes = [r for r in all_removes if r.get("dataChange", True)]

        def stamp(df, ctype=None):
            if ctype is not None:
                df = df.withColumn("_change_type", F.lit(ctype))
            return df.withColumn("_commit_version", F.lit(v).cast("long")).withColumn(
                "_commit_timestamp", F.lit(ts).cast("long")
            )

        def rows_of(paths):
            d = spark.read.parquet(*[os.path.join(table_dir, p) for p in paths])
            return d.withColumn(
                "__dv_path",
                F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/"),
            ).withColumn("__dv_ri", F.col("_metadata.row_index"))

        def pos_df(dv_map):
            m = {
                os.path.abspath(os.path.join(table_dir, p)): dv
                for p, dv in dv_map.items()
                if dv
            }
            if not m:
                return None
            d = _dv_deleted_positions_df(spark, table_dir, m)
            card = sum(int(dv.get("cardinality", 0)) for dv in m.values())
            return F.broadcast(d) if 0 <= card <= _DV_BROADCAST_POSITIONS else d

        def drop_meta(d):
            return d.drop("__dv_path", "__dv_ri")

        if cdc_paths:
            cdf = spark.read.parquet(*[os.path.join(table_dir, p) for p in cdc_paths])
            parts.append(stamp(cdf))
            _apply_state()
            continue
        for r in removes:
            if not os.path.exists(os.path.join(table_dir, r["path"])):
                raise ValueError(
                    f"CDF needs removed file {r['path']!r} (commit {v}), "
                    "but it was vacuumed"
                )
        add_by = {a["path"]: a for a in adds}
        rem_by = {r["path"]: r for r in removes}
        both = sorted(set(add_by) & set(rem_by))
        add_only = [add_by[p] for p in sorted(add_by) if p not in rem_by]
        rem_only = [p for p in sorted(rem_by) if p not in add_by]

        if both:
            # DV transition: same path removed+re-added with a new DV
            pre = pos_df({p: dv_state.get(p) for p in both})
            post = pos_df({p: add_by[p].get("deletionVector") for p in both})
            rows = rows_of(both)
            key = ["__dv_path", "__dv_ri"]
            if post is not None:
                newly = post if pre is None else post.join(pre, key, "left_anti")
                parts.append(
                    stamp(drop_meta(rows.join(newly, key, "left_semi")), "delete")
                )
            if pre is not None:
                restored = pre if post is None else pre.join(post, key, "left_anti")
                parts.append(
                    stamp(drop_meta(rows.join(restored, key, "left_semi")), "insert")
                )
        dv_adds = {
            a["path"]: a["deletionVector"] for a in add_only if a.get("deletionVector")
        }
        plain_adds = [a["path"] for a in add_only if not a.get("deletionVector")]
        if plain_adds:
            parts.append(
                stamp(
                    spark.read.parquet(
                        *[os.path.join(table_dir, p) for p in plain_adds]
                    ),
                    "insert",
                )
            )
        if dv_adds:
            # new file born with a DV: only its live rows are inserts
            parts.append(
                stamp(
                    drop_meta(
                        rows_of(list(dv_adds)).join(
                            pos_df(dv_adds), ["__dv_path", "__dv_ri"], "left_anti"
                        )
                    ),
                    "insert",
                )
            )
        dv_rems = {p: dv_state.get(p) for p in rem_only if dv_state.get(p)}
        plain_rems = [p for p in rem_only if not dv_state.get(p)]
        if plain_rems:
            parts.append(
                stamp(
                    spark.read.parquet(
                        *[os.path.join(table_dir, p) for p in plain_rems]
                    ),
                    "delete",
                )
            )
        if dv_rems:
            # removed file that had a DV: rows already DV-deleted before
            # this commit must NOT re-emit as deletes
            parts.append(
                stamp(
                    drop_meta(
                        rows_of(list(dv_rems)).join(
                            pos_df(dv_rems), ["__dv_path", "__dv_ri"], "left_anti"
                        )
                    ),
                    "delete",
                )
            )
        _apply_state()
    if not parts:
        raise ValueError(
            f"no changes between versions {starting_version} and {ending_version}"
        )
    out = parts[0]
    for other in parts[1:]:
        out = out.unionByName(other, allowMissingColumns=False)
    return out


def delta_version_at_timestamp(table_dir: str, ts_millis: int) -> int:
    """Resolve ``timestampAsOf`` semantics: the LATEST commit whose
    timestamp is <= the requested instant (delta-spark's rule).  Commit
    timestamps come from each commit's ``commitInfo.timestamp``, falling
    back to the commit file's mtime when absent (the same fallback
    delta-spark applies to old logs).  Requesting a time before the first
    commit raises — there is no table state to read."""
    log = _log_dir(table_dir)
    best = None
    for name in sorted(os.listdir(log)):
        m = _COMMIT_RE.match(name)
        if not m:
            continue
        v = int(m.group(1))
        path = os.path.join(log, name)
        cts = None
        with open(path, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    action = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "commitInfo" in action and "timestamp" in action["commitInfo"]:
                    cts = int(action["commitInfo"]["timestamp"])
                    break
        if cts is None:
            cts = int(os.path.getmtime(path) * 1000)
        if cts <= ts_millis:
            best = v if best is None else max(best, v)
    if best is None:
        raise ValueError(
            f"no Delta commit at or before timestamp {ts_millis} "
            "(requested time precedes the table)"
        )
    return best


def read_delta_at_timestamp(spark, table_dir: str, ts_millis: int):
    """``timestampAsOf`` read: resolve the version, then the normal
    snapshot scan (checkpoints, DVs, column mapping all apply)."""
    return read_delta(spark, table_dir, version=delta_version_at_timestamp(table_dir, ts_millis))
