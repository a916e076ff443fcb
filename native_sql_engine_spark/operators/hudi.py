"""Apache Hudi copy-on-write table reading — Spark-first, no hudi-spark jars.

Implements the read side of Hudi's COW layout (hudi.apache.org/docs —
timeline + file-group model) deep enough to open a snapshot:

- **timeline**: ``.hoodie/`` holds one file per instant state —
  ``<instant>.commit`` (completed), ``.inflight`` / ``.requested``
  (pending, must be invisible), ``<instant>.replacecommit`` (clustering /
  insert-overwrite).  The snapshot is defined by COMPLETED instants only;
  an inflight writer must never leak half-written files into a read;
- **file groups**: every base file is named
  ``<fileId>_<writeToken>_<instantTime>.parquet``; a file group (one
  ``fileId`` per partition path) is a chain of versions, and the reader
  picks the LATEST version whose instant is completed and ≤ the requested
  instant — that's how Hudi upserts replace rows without tombstones;
- **time travel**: ``as_of`` replays to any completed instant;
- **replacecommit**: file groups listed in a replacecommit's
  ``partitionToReplaceFileIds`` drop out of later snapshots (clustering
  rewrote them);
- **Spark-first scan**: :func:`read_hudi` hands the chosen base files to
  ``spark.read.parquet`` — pushdown/pruning stay Spark's.

Honest gates: merge-on-read tables (``.log`` delta files would need
record-level merging) and bootstrap indexes raise ``NotImplementedError``;
malformed timelines raise positioned ``ValueError``.

No Hudi writer ships in this container; fixtures come from
:func:`write_hudi_fixture` (same layout), and the battery oracle stays
independent because each file-slice version maps to a key range of the
ORIGINAL parquet — reading a stale slice or a pending instant cannot
match.

Reference parity: third member of the lakehouse trio beside
operators/delta.py and operators/iceberg.py over the same parquet scans.
"""

from __future__ import annotations

import json
import os
import re

__all__ = ["hudi_snapshot", "read_hudi", "write_hudi_fixture"]

_BASEFILE_RE = re.compile(r"^(?P<fid>.+)_(?P<token>[0-9-]+)_(?P<instant>\d+)\.parquet$")
_INSTANT_RE = re.compile(r"^(\d+)\.(commit|replacecommit)$")


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
        if name.endswith(".deltacommit"):
            raise NotImplementedError(
                "Hudi merge-on-read tables not supported (log-file merging)"
            )
        m = _INSTANT_RE.match(name)
        if m:
            completed.append((m.group(1), m.group(2)))
    if not completed:
        raise ValueError(f"{table_dir!r} has no completed Hudi instants")
    return hoodie, sorted(completed, key=lambda ik: (_instant_key(ik[0]), ik[1]))


def hudi_snapshot(table_dir: str, as_of: str | None = None) -> dict:
    """Resolve the COW snapshot at ``as_of`` (a completed instant time;
    default latest).  Returns ``{"instant", "files": [paths]}``."""
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
    for root, dirs, names in os.walk(table_dir):
        dirs[:] = [d for d in dirs if d != ".hoodie"]
        part = os.path.relpath(root, table_dir)
        part = "" if part == "." else part
        for name in names:
            if name.endswith(".log") or ".log." in name:
                raise NotImplementedError(
                    "Hudi merge-on-read tables not supported (log-file merging)"
                )
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
    return {"instant": target, "files": sorted(p for _, p in best.values())}


def read_hudi(spark, table_dir: str, as_of: str | None = None):
    """Open a Hudi COW snapshot as a DataFrame via Spark's parquet scan of
    the latest file slice per file group."""
    snap = hudi_snapshot(table_dir, as_of)
    if not snap["files"]:
        raise ValueError(f"Hudi snapshot {snap['instant']} has no base files")
    return spark.read.option("basePath", table_dir).parquet(*snap["files"])


# -- fixture write side (same layout) --------------------------------------------------


def write_hudi_fixture(
    table_dir: str,
    versions: list[tuple[str, str, str]],
    pending: list[str] = (),
    replaced: dict[str, dict[str, list[str]]] | None = None,
) -> None:
    """Lay out a COW table (fixture writer): ``versions`` is
    ``[(instant, partition, file_id)]`` — the parquet files themselves must
    already exist at
    ``<table>/<partition>/<file_id>_0-0-0_<instant>.parquet``;
    ``pending`` instants get ``.inflight`` markers only;
    ``replaced`` maps a replacecommit instant -> partitionToReplaceFileIds."""
    hoodie = os.path.join(table_dir, ".hoodie")
    os.makedirs(hoodie, exist_ok=True)
    with open(os.path.join(hoodie, "hoodie.properties"), "w") as fh:
        fh.write("hoodie.table.name=fixture\nhoodie.table.type=COPY_ON_WRITE\n")
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
