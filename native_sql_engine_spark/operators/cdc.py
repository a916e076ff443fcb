"""CDC apply / MERGE INTO semantics as a batch DataFrame operator.

The reference has no write-side merge (its sinks are plain file writes,
SURVEY §2.1 `DataWritingCommandExec` row fallback); this is the
beyond-parity upsert primitive a 100 TB pipeline needs to apply a change
batch (inserts + updates + deletes) onto a large snapshot.

Scale design: the changed side of a MERGE is typically orders of magnitude
smaller than the target snapshot.  ``merge_upsert`` therefore keeps the
target on the probe side of ONE left-anti join (broadcast when the batch
fits, AQE decides) and unions the surviving target rows with the upserted
batch — the 100 TB target is never shuffled, never sorted, and the output
is a pure append of two scans.  This is the same shape Delta/Iceberg
merge-on-read produces, expressed with stock DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC batch onto ``target``: rows in ``source`` with
    ``op_col`` = 'U' (upsert) replace/insert by ``key``; ``op_col`` = 'D'
    deletes the key.  ``source`` must carry the target schema plus
    ``op_col``; exactly one row per key (enforce upstream with
    latest-by-key dedup).

    Plan: target LEFT ANTI JOIN source-keys (drops every touched key —
    broadcastable) UNION ALL source upserts.  No shuffle of the target.
    """
    touched = source.select(F.col(key))
    kept = target.join(F.broadcast(touched), on=key, how="left_anti")
    upserts = source.filter(F.col(op_col) == "U").select(*target.columns)
    return kept.unionByName(upserts)
