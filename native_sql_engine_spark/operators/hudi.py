"""Apache Hudi table reading (COW + MOR) — Spark-first, no hudi-spark jars.

Implements the read side of Hudi's layout (hudi.apache.org/docs —
timeline + file-group model) deep enough to open a snapshot:

- **timeline**: ``.hoodie/`` holds one file per instant state —
  ``<instant>.commit`` / ``<instant>.deltacommit`` (completed),
  ``.inflight`` / ``.requested`` (pending, must be invisible),
  ``<instant>.replacecommit`` (clustering / insert-overwrite).  The
  snapshot is defined by COMPLETED instants only; an inflight writer
  must never leak half-written files into a read;
- **file groups**: every base file is named
  ``<fileId>_<writeToken>_<instantTime>.parquet``; a file group (one
  ``fileId`` per partition path) is a chain of versions, and the reader
  picks the LATEST version whose instant is completed and ≤ the requested
  instant — that's how Hudi upserts replace rows without tombstones;
- **merge-on-read**: a file slice is the base file plus its
  ``.<fileId>_<baseInstant>.log.<version>_<writeToken>`` delta logs.
  Log files are walked block-by-block (magic ``#HUDI#``, sizes, version,
  type, header map, content — the step sequence of Hudi's
  ``HoodieLogFormatWriter.appendBlock``); AVRO data block content is
  ``format version / record count / length-prefixed binary Avro datums``
  against the block's SCHEMA header, decoded by the repo's own Avro
  codec (operators/avro.py).  Blocks whose INSTANT_TIME header is not a
  completed instant ≤ the target are skipped (rolled-back or inflight
  writers stay invisible).  The merge itself is Spark-first: base rows
  union the executor-decoded log records and a window ``row_number``
  over the record key (ordered by instant, then block sequence) keeps
  the newest version; records whose latest version carries
  ``_hoodie_is_deleted = true`` (Hudi's public soft-delete field) drop
  out.  The record key column comes from
  ``hoodie.table.recordkey.fields`` in ``hoodie.properties``;
- **time travel**: ``as_of`` replays to any completed instant (log
  blocks after the target are skipped too);
- **replacecommit**: file groups listed in a replacecommit's
  ``partitionToReplaceFileIds`` drop out of later snapshots (clustering
  rewrote them);
- **Spark-first scan**: :func:`read_hudi` hands the chosen base files to
  ``spark.read.parquet`` — pushdown/pruning stay Spark's; log decode is
  partition-parallel ``mapInPandas`` over ``binaryFile`` (log files are
  the small delta tail of a slice, never the data volume).

Log-only file groups (a delta-log chain with no base parquet yet — the
MOR streaming-insert path) are first-class: their chains surface as a
base-less slice and merge with the same newest-wins/soft-delete
semantics, as long as at least one based group supplies the table schema.

DELETE blocks (hard deletes) decode their Avro v3 payload
(HoodieDeleteRecordList, Hudi 0.14+) into tombstone rows that merge
like soft deletes; v2 Kryo payloads (Hudi 0.9-0.13) gate with version
evidence.  Honest gates: CDC/HFILE/PARQUET log block types raise
``NotImplementedError`` (format-specific payloads), as do bootstrap
indexes and
ENTIRELY log-only tables (no base file anywhere to take the schema
from); malformed timelines and truncated log blocks raise positioned
``ValueError``.

No Hudi writer ships in this container; fixtures come from
:func:`write_hudi_fixture` + :func:`write_hudi_log_file` (same layout —
single-writer caveat: the log block byte layout follows the public
writer's documented step sequence but cannot be cross-validated against
real Hudi output here), and the battery oracle stays independent because
each file-slice version and log upsert maps to a key range of the
ORIGINAL parquet — reading a stale slice, a pending instant, or missing
a log upsert cannot match.

Reference parity: third member of the lakehouse trio beside
operators/delta.py and operators/iceberg.py over the same parquet scans.
"""

from __future__ import annotations

import io
import json
import os
import re
import struct

__all__ = [
    "hudi_snapshot",
    "read_hudi",
    "write_hudi_fixture",
    "write_hudi_log_file",
    "read_hudi_log_blocks",
]

_BASEFILE_RE = re.compile(r"^(?P<fid>.+)_(?P<token>[0-9-]+)_(?P<instant>\d+)\.parquet$")
_LOGFILE_RE = re.compile(
    r"^\.(?P<fid>.+)_(?P<base>\d+)\.log\.(?P<ver>\d+)_(?P<token>[0-9-]+)$"
)
_INSTANT_RE = re.compile(r"^(\d+)\.(commit|deltacommit|replacecommit)$")

_LOG_MAGIC = b"#HUDI#"
_LOG_FORMAT_VERSION = 1
#: HoodieLogBlockType ordinals (org.apache.hudi.common.table.log.block)
_BLOCK_COMMAND, _BLOCK_DELETE, _BLOCK_CORRUPT, _BLOCK_AVRO_DATA = 0, 1, 2, 3
#: HeaderMetadataType ordinals
_HDR_INSTANT_TIME, _HDR_TARGET_INSTANT, _HDR_SCHEMA = 0, 1, 2
_AVRO_BLOCK_CONTENT_VERSION = 3

#: DELETE block content: format v3 (Hudi 0.14+, HoodieDeleteBlock
#: .serializeRecordsToDelete) is a binary-Avro HoodieDeleteRecordList
#: datum (hudi-common/src/main/avro/HoodieDeleteRecordList.avsc) behind
#: ``int version / int length``; v2 and earlier Kryo-serialize
#: HoodieDeleteRecord[] via SerializationUtils and stay gated.
_DELETE_RECORD_LIST_SCHEMA = {
    "type": "record",
    "name": "HoodieDeleteRecordList",
    "fields": [
        {
            "name": "deleteRecordList",
            "type": {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": "HoodieDeleteRecord",
                    "fields": [
                        {"name": "recordKey", "type": ["null", "string"],
                         "default": None},
                        {"name": "partitionPath", "type": ["null", "string"],
                         "default": None},
                        {"name": "orderingVal",
                         "type": ["null", "boolean", "int", "long", "float",
                                  "double", "bytes", "string"],
                         "default": None},
                    ],
                },
            },
        }
    ],
}
_DELETE_BLOCK_CONTENT_VERSION = 3


def _instant_key(instant: str) -> str:
    """Chronological sort key for an instant time.  Hudi widened instants
    from 14-digit seconds to 17-digit millis (HUDI-1623); right-padding the
    legacy format with zeros maps it onto the .000 millisecond of the same
    second, so a timeline spanning both widths orders chronologically
    instead of lexicographically (where '2021...' 14-digit would sort
    between 17-digit values char-by-char and could pick a stale slice)."""
    return instant.ljust(17, "0") if len(instant) < 17 else instant


def _timeline(table_dir: str):
    hoodie = os.path.join(table_dir, ".hoodie")
    if not os.path.isdir(hoodie):
        raise ValueError(f"{table_dir!r} is not a Hudi table (no .hoodie)")
    completed: list[tuple[str, str]] = []  # (instant, kind)
    for name in os.listdir(hoodie):
        if name.endswith((".inflight", ".requested")):
            continue
        m = _INSTANT_RE.match(name)
        if m:
            completed.append((m.group(1), m.group(2)))
    if not completed:
        raise ValueError(f"{table_dir!r} has no completed Hudi instants")
    return hoodie, sorted(completed, key=lambda ik: (_instant_key(ik[0]), ik[1]))


def _table_properties(table_dir: str) -> dict:
    props: dict[str, str] = {}
    path = os.path.join(table_dir, ".hoodie", "hoodie.properties")
    if os.path.exists(path):
        with open(path, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line and not line.startswith("#") and "=" in line:
                    k, _, v = line.partition("=")
                    props[k.strip()] = v.strip()
    return props


def hudi_snapshot(table_dir: str, as_of: str | None = None) -> dict:
    """Resolve the snapshot at ``as_of`` (a completed instant time; default
    latest).  Returns ``{"instant", "files": [base paths], "logs":
    {base_path: [log paths, version order]}, "instants": [completed ≤
    target]}`` — ``logs`` is empty for a pure COW table."""
    hoodie, completed = _timeline(table_dir)
    instants = [i for i, _ in completed]
    target = as_of if as_of is not None else instants[-1]
    if target not in instants:
        raise ValueError(f"instant {target} not completed (have {instants})")

    # file groups replaced by clustering at or before the target drop out
    replaced: set[tuple[str, str]] = set()
    for instant, kind in completed:
        if kind != "replacecommit" or _instant_key(instant) > _instant_key(target):
            continue
        try:
            with open(os.path.join(hoodie, f"{instant}.replacecommit")) as fh:
                meta = json.load(fh)
        except (OSError, ValueError) as ex:
            raise ValueError(f"unreadable replacecommit {instant}: {ex}") from ex
        for part, fids in (meta.get("partitionToReplaceFileIds") or {}).items():
            for fid in fids:
                replaced.add((part, fid))

    # newest base file per (partition, fileId) with instant <= target
    best: dict[tuple[str, str], tuple[str, str]] = {}
    logfiles: dict[tuple[str, str], list[tuple[str, int, str]]] = {}
    for root, dirs, names in os.walk(table_dir):
        dirs[:] = [d for d in dirs if d != ".hoodie"]
        part = os.path.relpath(root, table_dir)
        part = "" if part == "." else part
        for name in names:
            lm = _LOGFILE_RE.match(name)
            if lm:
                logfiles.setdefault((part, lm.group("fid")), []).append(
                    (lm.group("base"), int(lm.group("ver")), os.path.join(root, name))
                )
                continue
            if name.endswith(".log") or ".log." in name:
                raise ValueError(f"unrecognized Hudi log file name {name!r}")
            m = _BASEFILE_RE.match(name)
            if not m:
                continue
            instant = m.group("instant")
            if _instant_key(instant) > _instant_key(target) or instant not in instants:
                continue  # future or non-completed (inflight writer) version
            key = (part, m.group("fid"))
            if key in replaced:
                continue
            if key not in best or _instant_key(instant) > _instant_key(best[key][0]):
                best[key] = (instant, os.path.join(root, name))

    # attach delta logs to the chosen slice: a log file belongs to the file
    # slice whose base instant it was written against; logs of superseded
    # (older-base) or replaced slices drop out with their base
    logs: dict[str, list[str]] = {}
    log_only: list[str] = []  # whole log chains of base-less file groups
    for key, entries in sorted(logfiles.items()):
        if key in replaced:
            continue
        if key not in best:
            # log-only file group (no base yet — MOR insert path): the
            # whole chain is the slice; records come purely from the logs
            log_only.extend(p for _b, _v, p in sorted(entries))
            continue
        base_instant, base_path = best[key]
        attached = sorted(
            (ver, p) for b, ver, p in entries if b == base_instant
        )
        if attached:
            logs[base_path] = [p for _, p in attached]
    visible = [i for i in instants if _instant_key(i) <= _instant_key(target)]
    return {
        "instant": target,
        "files": sorted(p for _, p in best.values()),
        "logs": logs,
        "log_only": log_only,
        "instants": visible,
    }


# -- MOR log format ---------------------------------------------------------------------


def write_hudi_log_file(path: str, blocks: list[dict]) -> None:
    """Write a Hudi log file (fixture writer; layout documented in the
    module docstring).  Each block dict is either
    ``{"type": "avro_data", "instant", "schema": <avro schema dict>,
    "records": [dict]}`` or ``{"type": "command", "instant",
    "target_instant"}`` (rollback)."""
    from native_sql_engine_spark.operators.avro import encode_datum

    out = io.BytesIO()
    for blk in blocks:
        if blk["type"] == "avro_data":
            btype = _BLOCK_AVRO_DATA
            headers = {
                _HDR_INSTANT_TIME: blk["instant"],
                _HDR_SCHEMA: json.dumps(blk["schema"]),
            }
            body = io.BytesIO()
            body.write(struct.pack(">i", _AVRO_BLOCK_CONTENT_VERSION))
            body.write(struct.pack(">i", len(blk["records"])))
            for rec in blk["records"]:
                datum = encode_datum(rec, blk["schema"])
                body.write(struct.pack(">i", len(datum)))
                body.write(datum)
            content = body.getvalue()
        elif blk["type"] == "command":
            btype = _BLOCK_COMMAND
            headers = {
                _HDR_INSTANT_TIME: blk["instant"],
                _HDR_TARGET_INSTANT: blk["target_instant"],
            }
            content = b""
        elif blk["type"] == "delete":
            btype = _BLOCK_DELETE
            headers = {_HDR_INSTANT_TIME: blk["instant"]}
            datum = encode_datum(
                {
                    "deleteRecordList": [
                        {
                            "recordKey": str(k),
                            "partitionPath": blk.get("partition", ""),
                            "orderingVal": None,
                        }
                        for k in blk["keys"]
                    ]
                },
                _DELETE_RECORD_LIST_SCHEMA,
            )
            content = (
                struct.pack(">i", _DELETE_BLOCK_CONTENT_VERSION)
                + struct.pack(">i", len(datum))
                + datum
            )
        else:
            raise ValueError(f"unknown fixture block type {blk['type']!r}")
        hdr = io.BytesIO()
        hdr.write(struct.pack(">i", len(headers)))
        for ordinal, val in sorted(headers.items()):
            raw = val.encode("utf-8")
            hdr.write(struct.pack(">ii", ordinal, len(raw)) + raw)
        payload = (
            struct.pack(">i", _LOG_FORMAT_VERSION)
            + struct.pack(">i", btype)
            + hdr.getvalue()
            + struct.pack(">q", len(content))
            + content
            + struct.pack(">i", 0)  # footer map (empty)
        )
        total = len(_LOG_MAGIC) + 8 + len(payload) + 8
        out.write(_LOG_MAGIC)
        out.write(struct.pack(">q", len(payload) + 8))  # size after this field
        out.write(payload)
        out.write(struct.pack(">q", total))  # trailing total for reverse seeks
    with open(path, "wb") as fh:
        fh.write(out.getvalue())


def _need(buf: bytes, pos: int, n: int, what: str):
    if pos + n > len(buf):
        raise ValueError(
            f"Hudi log truncated at byte {pos}: need {n} bytes for {what}, "
            f"have {len(buf) - pos}"
        )


def read_hudi_log_blocks(buf: bytes) -> list[dict]:
    """Walk a log file's blocks.  Returns
    ``[{"type", "instant", "target_instant", "schema", "records", "seq"}]``
    with Avro datums decoded against each block's SCHEMA header.  DELETE /
    HFILE / PARQUET / CDC blocks raise ``NotImplementedError``; CORRUPT
    blocks are skipped (that is their meaning: a writer crashed mid-append
    and a later recovery marked the half-block)."""
    from native_sql_engine_spark.operators.avro import decode_datum

    blocks: list[dict] = []
    pos, seq = 0, 0
    while pos < len(buf):
        _need(buf, pos, len(_LOG_MAGIC), "magic")
        if buf[pos : pos + len(_LOG_MAGIC)] != _LOG_MAGIC:
            raise ValueError(f"Hudi log bad magic at byte {pos}")
        pos += len(_LOG_MAGIC)
        _need(buf, pos, 8, "block size")
        (size,) = struct.unpack_from(">q", buf, pos)
        pos += 8
        _need(buf, pos, size, "block body")
        end = pos + size
        (version,) = struct.unpack_from(">i", buf, pos)
        if version != _LOG_FORMAT_VERSION:
            raise NotImplementedError(f"Hudi log format version {version}")
        (btype,) = struct.unpack_from(">i", buf, pos + 4)
        pos += 8
        _need(buf, pos, 4, "header count")
        (nhdr,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        headers: dict[int, str] = {}
        for _ in range(nhdr):
            _need(buf, pos, 8, "header entry")
            ordinal, ln = struct.unpack_from(">ii", buf, pos)
            pos += 8
            _need(buf, pos, ln, "header value")
            headers[ordinal] = buf[pos : pos + ln].decode("utf-8")
            pos += ln
        _need(buf, pos, 8, "content length")
        (clen,) = struct.unpack_from(">q", buf, pos)
        pos += 8
        _need(buf, pos, clen, "block content")
        content = buf[pos : pos + clen]
        pos = end  # footer map + trailing total live inside `size`

        if btype == _BLOCK_CORRUPT:
            seq += 1
            continue
        blk = {
            "type": btype,
            "instant": headers.get(_HDR_INSTANT_TIME),
            "target_instant": headers.get(_HDR_TARGET_INSTANT),
            "schema": None,
            "records": None,
            "seq": seq,
        }
        if btype == _BLOCK_AVRO_DATA:
            schema = json.loads(headers[_HDR_SCHEMA])
            (cver,) = struct.unpack_from(">i", content, 0)
            if cver != _AVRO_BLOCK_CONTENT_VERSION:
                raise NotImplementedError(f"Hudi avro block content version {cver}")
            (nrec,) = struct.unpack_from(">i", content, 4)
            off = 8
            records = []
            for _ in range(nrec):
                _need(content, off, 4, "record length")
                (rlen,) = struct.unpack_from(">i", content, off)
                off += 4
                _need(content, off, rlen, "record datum")
                val, _ = decode_datum(content[off : off + rlen], schema)
                records.append(val)
                off += rlen
            blk["schema"] = schema
            blk["records"] = records
        elif btype == _BLOCK_DELETE:
            _need(content, 0, 8, "delete block header")
            (dver,) = struct.unpack_from(">i", content, 0)
            if dver <= 2:
                raise NotImplementedError(
                    f"Hudi DELETE block content version {dver}: Hudi 0.9-0.13 "
                    "Kryo-serializes HoodieDeleteRecord[] (SerializationUtils"
                    ".serialize) — only the Avro HoodieDeleteRecordList "
                    "format (v3, Hudi 0.14+) is supported"
                )
            (dlen,) = struct.unpack_from(">i", content, 4)
            _need(content, 8, dlen, "delete record list")
            val, _ = decode_datum(
                content[8 : 8 + dlen], _DELETE_RECORD_LIST_SCHEMA
            )
            blk["records"] = list(val.get("deleteRecordList") or [])
        elif btype != _BLOCK_COMMAND:
            raise NotImplementedError(
                f"Hudi log block type ordinal {btype} not supported "
                "(HFILE/PARQUET/CDC payloads are format-specific)"
            )
        blocks.append(blk)
        seq += 1
    return blocks


def _decode_slice_logs(
    log_paths: list[str],
    base_cols: list[str],
    visible: set,
    key_field: str | None = None,
    key_conv=None,
):
    """Decode one file slice's ordered log chain into
    ``(row_values..., is_deleted, ord_instant, ord_seq)`` tuples (runs on
    executors).  Rollback command blocks suppress data blocks targeting the
    rolled-back instant — the chain is read whole so a rollback appended in
    log v2 hides a block written in v1; blocks whose instant is not in
    ``visible`` (completed ≤ target) stay invisible.  DELETE blocks
    (hard deletes, Avro v3 payload) emit a tombstone row per recordKey —
    the key parses back through ``key_conv`` into the single
    ``key_field`` column (composite keys gate)."""
    blocks: list[dict] = []
    for path in log_paths:
        with open(path, "rb") as fh:
            blocks.extend(read_hudi_log_blocks(fh.read()))
    rolled = {b["target_instant"] for b in blocks if b["type"] == _BLOCK_COMMAND}
    out = []
    for gseq, blk in enumerate(blocks):
        if blk["type"] not in (_BLOCK_AVRO_DATA, _BLOCK_DELETE):
            continue
        if blk["instant"] not in visible or blk["instant"] in rolled:
            continue
        if blk["type"] == _BLOCK_DELETE:
            if key_field is None or key_field not in base_cols or key_conv is None:
                raise NotImplementedError(
                    "Hudi DELETE blocks need a single record-key field of a "
                    "convertible type (recordKey strings parse into it; "
                    "composite keys not wired)"
                )
            ki = base_cols.index(key_field)
            for rec in blk["records"]:
                rk = rec.get("recordKey")
                row = [None] * len(base_cols)
                row[ki] = key_conv(rk) if rk is not None else None
                out.append(
                    tuple(row) + (True, _instant_key(blk["instant"]), gseq)
                )
            continue
        for rec in blk["records"]:
            row = tuple(rec.get(c) for c in base_cols)
            out.append(
                row
                + (
                    bool(rec.get("_hoodie_is_deleted", False)),
                    _instant_key(blk["instant"]),
                    gseq,
                )
            )
    return out


#: record-key string -> column value parsers for DELETE-block tombstones
_KEY_CONVS = {
    "bigint": int,
    "int": int,
    "smallint": int,
    "tinyint": int,
    "double": float,
    "float": float,
    "string": str,
}


def _key_conv_for(schema, key_fields: list[str]):
    """(key_field, converter) for DELETE-block decoding, or (None, None)
    when keys are composite / of an unconvertible type — the gate fires
    only if a DELETE block actually appears."""
    if len(key_fields) != 1:
        return None, None
    kf = key_fields[0]
    dtype = {f.name: f.dataType.simpleString() for f in schema.fields}.get(kf)
    return kf, _KEY_CONVS.get(dtype)


def read_hudi(spark, table_dir: str, as_of: str | None = None):
    """Open a Hudi snapshot as a DataFrame.  COW: Spark's parquet scan of
    the latest file slice per file group.  MOR: base rows union the decoded
    log records, then one ``row_number`` window per record key (ordered by
    instant, then block sequence) keeps the newest version and drops
    soft-deleted keys — the same shuffle shape as Spark's own dedup, so the
    merge scales with the key cardinality, not the log count."""
    snap = hudi_snapshot(table_dir, as_of)
    if not snap["files"]:
        # log-only groups need the table schema from SOME base file
        raise ValueError(
            f"Hudi snapshot {snap['instant']} has no base files"
            + (" (table is entirely log-only)" if snap["log_only"] else "")
        )
    base = spark.read.option("basePath", table_dir).parquet(*snap["files"])
    if not snap["logs"] and not snap["log_only"]:
        return base

    from pyspark.sql import Window, functions as F

    props = _table_properties(table_dir)
    key_fields = [
        k for k in props.get("hoodie.table.recordkey.fields", "").split(",") if k
    ]
    if not key_fields:
        raise ValueError(
            "Hudi MOR merge needs hoodie.table.recordkey.fields in "
            ".hoodie/hoodie.properties"
        )
    base_cols = [c for c in base.columns if c != "_hoodie_is_deleted"]
    log_schema = (
        base.select(*base_cols)
        .withColumn("_h_del", F.lit(True))
        .withColumn("_h_ord", F.lit("z"))
        .withColumn("_h_seq", F.lit(0).cast("long"))
        .schema
    )
    # one row per file slice; decode runs executor-side via mapInPandas, so
    # the log tail of every slice is read in parallel, never on the driver
    visible = set(snap["instants"])
    slices = [(base_path, paths) for base_path, paths in sorted(snap["logs"].items())]
    if snap["log_only"]:
        # base-less file group: one extra slice whose rows come purely
        # from its log chain (columns follow the table's base schema)
        slices.append(("", snap["log_only"]))
    out_cols = [f.name for f in log_schema.fields]

    kf, kconv = _key_conv_for(base.schema, key_fields)

    def _decode(batches):
        import pandas as pd

        for pdf in batches:
            for _, row in pdf.iterrows():
                tuples = _decode_slice_logs(
                    list(row["logs"]), base_cols, visible, kf, kconv
                )
                yield pd.DataFrame(tuples, columns=out_cols)

    slices_df = spark.createDataFrame(
        slices, "base string, logs array<string>"
    ).repartition(len(slices))
    log_df = slices_df.mapInPandas(_decode, schema=log_schema)
    based = (
        base.select(*base_cols)
        .withColumn("_h_del", F.lit(False))
        .withColumn("_h_ord", F.lit(""))  # base sorts below every log instant
        .withColumn("_h_seq", F.lit(-1).cast("long"))
    )
    merged = based.unionByName(log_df)
    w = Window.partitionBy(*key_fields).orderBy(
        F.col("_h_ord").desc(), F.col("_h_seq").desc()
    )
    return (
        merged.withColumn("_h_rn", F.row_number().over(w))
        .filter((F.col("_h_rn") == 1) & (~F.col("_h_del")))
        .drop("_h_rn", "_h_del", "_h_ord", "_h_seq")
    )


# -- fixture write side (same layout) --------------------------------------------------


def write_hudi_fixture(
    table_dir: str,
    versions: list[tuple[str, str, str]],
    pending: list[str] = (),
    replaced: dict[str, dict[str, list[str]]] | None = None,
    deltacommits: list[str] = (),
    record_key: str | None = None,
) -> None:
    """Lay out a Hudi table (fixture writer): ``versions`` is
    ``[(instant, partition, file_id)]`` — the parquet files themselves must
    already exist at
    ``<table>/<partition>/<file_id>_0-0-0_<instant>.parquet``;
    ``pending`` instants get ``.inflight`` markers only;
    ``replaced`` maps a replacecommit instant -> partitionToReplaceFileIds;
    ``deltacommits`` instants get completed ``.deltacommit`` markers (MOR —
    the log files themselves come from :func:`write_hudi_log_file`);
    ``record_key`` sets ``hoodie.table.recordkey.fields`` (the MOR merge
    key)."""
    hoodie = os.path.join(table_dir, ".hoodie")
    os.makedirs(hoodie, exist_ok=True)
    table_type = "MERGE_ON_READ" if deltacommits else "COPY_ON_WRITE"
    with open(os.path.join(hoodie, "hoodie.properties"), "w") as fh:
        fh.write(f"hoodie.table.name=fixture\nhoodie.table.type={table_type}\n")
        if record_key:
            fh.write(f"hoodie.table.recordkey.fields={record_key}\n")
    for instant in deltacommits:
        with open(os.path.join(hoodie, f"{instant}.deltacommit"), "w") as fh:
            json.dump({"operation": "upsert"}, fh)
    for instant in sorted({i for i, _, _ in versions}):
        stats = {}
        for i, part, fid in versions:
            if i == instant:
                stats.setdefault(part, []).append(
                    {"fileId": fid, "path": f"{part + '/' if part else ''}{fid}_0-0-0_{instant}.parquet"}
                )
        with open(os.path.join(hoodie, f"{instant}.commit"), "w") as fh:
            json.dump({"partitionToWriteStats": stats, "operation": "upsert"}, fh)
    for instant in pending:
        open(os.path.join(hoodie, f"{instant}.commit.inflight"), "w").close()
    for instant, mapping in (replaced or {}).items():
        with open(os.path.join(hoodie, f"{instant}.replacecommit"), "w") as fh:
            json.dump({"partitionToReplaceFileIds": mapping}, fh)


def read_hudi_incremental(spark, table_dir: str, begin: str, end: str | None = None):
    """Incremental query over a COW timeline — Hudi's
    ``hoodie.datasource.query.type=incremental`` consumption pattern:
    the LATEST version of every record written by commits in
    ``(begin, end]``.

    Each completed ``.commit`` in range names the base files it wrote
    (``partitionToWriteStats``); those files are scanned with Spark and a
    newest-instant-wins ``row_number`` window per record key collapses a
    key rewritten by several in-range commits to its final version (the
    same merge shape as the MOR read, so it scales with key cardinality).
    Requires ``hoodie.table.recordkey.fields``.

    **MOR deltacommits in range** take the merge-on-read path: the
    result is the snapshot-at-``end`` merged view restricted to record
    keys written by in-range instants — keys come from the in-range
    commits' base files plus the log blocks whose INSTANT_TIME header
    falls in range (decoded executor-side, rollback command blocks
    suppressing their targets), and the value of each key is whatever
    the base+log merge resolves at ``end``.  A key soft-deleted in range
    disappears (it has no row in the merged view), matching the
    non-CDC incremental contract."""
    from pyspark.sql import Window, functions as F

    hoodie, completed = _timeline(table_dir)
    if end is None:
        # default to the latest completed instant of ANY kind, so an
        # in-range deltacommit merges instead of being silently excluded
        end = completed[-1][0]

    def in_rng(i: str) -> bool:
        return _instant_key(begin) < _instant_key(i) <= _instant_key(end)

    if any(k == "replacecommit" and in_rng(i) for i, k in completed):
        # clustering / insert_overwrite rewrites files without the
        # write-stats shape this scan consumes; silently skipping them
        # would omit their rows, so gate honestly
        raise NotImplementedError(
            "incremental read over replacecommits not supported "
            "(clustering/insert_overwrite rewrites are not in "
            "partitionToWriteStats form)"
        )
    props = _table_properties(table_dir)
    key_fields = [
        k for k in props.get("hoodie.table.recordkey.fields", "").split(",") if k
    ]
    if not key_fields:
        raise ValueError(
            "incremental merge needs hoodie.table.recordkey.fields in "
            ".hoodie/hoodie.properties"
        )
    per_file: list[tuple[str, str]] = []  # (instant, path)
    for instant, kind in completed:
        if kind != "commit" or not in_rng(instant):
            continue
        with open(os.path.join(hoodie, f"{instant}.commit")) as fh:
            meta = json.load(fh)
        for stats in (meta.get("partitionToWriteStats") or {}).values():
            for st in stats:
                per_file.append((instant, os.path.join(table_dir, st["path"])))

    in_range_deltas = {i for i, k in completed if k == "deltacommit" and in_rng(i)}
    if in_range_deltas:
        # MOR path: snapshot-at-end values, restricted to in-range keys
        snap = hudi_snapshot(table_dir, end)
        merged = read_hudi(spark, table_dir, as_of=end)
        key_parts = []
        if per_file:
            key_parts.append(
                spark.read.parquet(*[p for _, p in per_file]).select(*key_fields)
            )
        slices = [(b, p) for b, p in sorted(snap["logs"].items())]
        if snap["log_only"]:
            slices.append(("", snap["log_only"]))
        if slices:
            key_schema = merged.select(*key_fields).schema
            kf, kconv = _key_conv_for(key_schema, key_fields)

            def _decode_keys(batches):
                import pandas as pd

                for pdf in batches:
                    for _, row in pdf.iterrows():
                        tuples = _decode_slice_logs(
                            list(row["logs"]), key_fields, in_range_deltas,
                            kf, kconv,
                        )
                        yield pd.DataFrame(
                            [t[: len(key_fields)] for t in tuples],
                            columns=key_fields,
                        )

            slices_df = spark.createDataFrame(
                slices, "base string, logs array<string>"
            ).repartition(len(slices))
            key_parts.append(slices_df.mapInPandas(_decode_keys, schema=key_schema))
        if not key_parts:
            raise ValueError(
                f"no commits between instants {begin!r} and {end!r}"
            )
        keys = key_parts[0]
        for other in key_parts[1:]:
            keys = keys.unionByName(other)
        return merged.join(keys.distinct(), key_fields, "left_semi")

    if not per_file:
        raise ValueError(f"no commits between instants {begin!r} and {end!r}")
    parts = None
    for instant, path in per_file:
        one = spark.read.parquet(path).withColumn(
            "_h_ord", F.lit(_instant_key(instant))
        )
        parts = one if parts is None else parts.unionByName(one)
    w = Window.partitionBy(*key_fields).orderBy(F.col("_h_ord").desc())
    return (
        parts.withColumn("_h_rn", F.row_number().over(w))
        .filter(F.col("_h_rn") == 1)
        .drop("_h_rn", "_h_ord")
    )
