"""Cheap cardinality probes for size-based operator dispatch.

Operators that pick between a broadcast/exact path and a distributed/
approximate path (``embedding_neardup_pairs``, ``knn_join``) need to know
"is this side bigger than N rows" — NOT the exact count.  A full
``df.count()`` is an extra scan of the entire corpus before any real work
starts; at 100 TB that is hours of wasted IO.  This module answers the
threshold question with bounded cost:

1. caller-provided hint (free),
2. the optimizer's row-count statistic (free when the source carries
   catalog / parquet footer stats — mirrors how Spark itself decides
   broadcast joins from ``sizeInBytes``),
3. a ``limit(n+1).count()`` probe whose cost is capped at n+1 rows
   regardless of corpus size (CollectLimit scans partitions
   incrementally, so a 100 TB table that obviously exceeds the bound
   answers after a handful of row groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_row_count(df: DataFrame) -> int | None:
    """The optimizer's estimated row count, or None when unknown.

    Reads ``optimizedPlan().stats().rowCount()`` — populated from catalog
    statistics (ANALYZE TABLE) or V2 source stats; never triggers a job.
    """
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        rc = stats.rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
    except Exception:
        return None
    return None


def exceeds_rows(df: DataFrame, n: int, approx_rows: int | None = None) -> bool:
    """True iff ``df`` has more than ``n`` rows, without a full count().

    ``approx_rows`` is a caller-supplied size hint (e.g. from pipeline
    metadata) that short-circuits everything.
    """
    if approx_rows is not None:
        return approx_rows > n
    # The optimizer estimate is trusted only in the EXCEEDS direction: a
    # stale/low catalog statistic (table appended since ANALYZE) must not
    # route an over-threshold corpus onto a broadcast/exact path.  "Fits
    # under n" is always proven by the bounded probe, which is cheap
    # precisely when the answer is "exceeds" and exact when it matters.
    est = plan_row_count(df)
    if est is not None and est > n:
        return True
    return df.limit(n + 1).count() > n
