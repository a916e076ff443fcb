"""Cluster-safe plan truncation for multiply-consumed intermediates.

Several operators build a SMALL derived table (signatures, shingle prefix
indexes, edge lists, posting lists) that feeds two or more consumers —
typically both sides of a self-join.  Materializing it once both shares the
computation and TRUNCATES the logical plan to a leaf, so the analyzer stops
re-walking the (large) producing subtree once per consumer (measured in
round 10: ~1.2 s of single-threaded driver rule time per dedup_simhash
build; family A/B medians in OPTIMIZATION_r10.md change 11).

Round 10 used ``DataFrame.localCheckpoint()`` directly at every call site.
That is the right local-mode choice, but it is NOT fault-tolerant: the
materialized blocks live only on their executor and carry no lineage, so on
a real cluster one executor loss mid-query fails the job instead of
recomputing.  This module is the one place that picks the mechanism, so a
cluster submit can flip a conf instead of editing ~10 call sites:

``spark.graft.materialize.mode`` (session conf, read per call):

- ``local`` — ``localCheckpoint()``.  Fastest; plan truncated; NOT
  fault-tolerant (executor loss ⇒ query failure, Spark resubmits the
  action).  The default on ``local[*]`` masters, where executor loss is
  process death anyway.
- ``reliable`` — ``checkpoint()`` against the SparkContext checkpoint
  directory (set it with ``sc.setCheckpointDir`` or the
  ``spark.graft.checkpoint.dir`` conf).  Plan truncated AND the blocks are
  on reliable storage: executor loss recovers.  The default on a cluster
  master when a checkpoint dir is configured.
- ``persist`` — ``persist(MEMORY_AND_DISK)``.  No plan truncation (the
  analyzer re-walk cost returns), but full lineage is kept so nothing can
  be lost.  The conservative fallback on a cluster with no checkpoint dir.

Release contract: materialized blocks are NOT managed by the SQL cache
manager (``spark.catalog.clearCache`` does not free local/reliable
checkpoint blocks).  They are freed when the last DataFrame/RDD reference
is garbage-collected on the driver (Spark's ContextCleaner) — the battery
harness drops references after each collect and GCs between entries, so
nothing accumulates there.  A long-lived session that holds the returned
DataFrames should either drop them (GC frees the blocks) or call
:func:`release_materialized` at a point where no materialized DataFrame
from a previous batch will be re-collected (re-collecting after release
fails: truncated plans have no lineage to recompute from).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

#: session conf selecting the materialization mechanism (see module doc)
MODE_CONF = "spark.graft.materialize.mode"
#: session conf naming a reliable checkpoint dir (used when the
#: SparkContext has none set yet; required for mode=reliable)
CKPT_DIR_CONF = "spark.graft.checkpoint.dir"

_VALID_MODES = ("local", "reliable", "persist")


def _resolve_mode(spark: SparkSession) -> str:
    mode = spark.conf.get(MODE_CONF, None)
    if mode:
        if mode not in _VALID_MODES:
            raise ValueError(f"{MODE_CONF}={mode!r}; expected one of {_VALID_MODES}")
        return mode
    if spark.sparkContext.master.startswith("local"):
        return "local"
    # cluster master: reliable checkpointing when a dir is available,
    # otherwise lineage-preserving persist (never silently un-fault-tolerant)
    if _checkpoint_dir(spark) is not None:
        return "reliable"
    return "persist"


def _checkpoint_dir(spark: SparkSession) -> str | None:
    sc = spark.sparkContext
    d = sc._jsc.sc().getCheckpointDir()
    if d.isDefined():
        return d.get()
    return spark.conf.get(CKPT_DIR_CONF, None)


def materialize(df: DataFrame, mode: str | None = None) -> DataFrame:
    """Materialize a small multiply-consumed DataFrame, truncating its plan
    where the chosen mode allows (see module docstring for mode semantics
    and the failure/release contract).

    ``mode`` overrides the session conf / auto choice — callers normally
    omit it.  Intended ONLY for intermediates orders of magnitude smaller
    than their inputs (keys, signatures, pair sets): every mode holds the
    full result in memory/disk blocks.
    """
    spark = df.sparkSession
    mode = mode or _resolve_mode(spark)
    if mode == "local":
        return df.localCheckpoint()
    if mode == "reliable":
        sc = spark.sparkContext
        if not sc._jsc.sc().getCheckpointDir().isDefined():
            conf_dir = spark.conf.get(CKPT_DIR_CONF, None)
            if conf_dir is None:
                raise ValueError(
                    f"{MODE_CONF}=reliable needs a checkpoint dir: call "
                    f"sc.setCheckpointDir(...) or set {CKPT_DIR_CONF}"
                )
            sc.setCheckpointDir(conf_dir)
        return df.checkpoint()
    if mode == "persist":
        return df.persist(StorageLevel.MEMORY_AND_DISK)
    raise ValueError(f"unknown materialize mode {mode!r}")


def release(df: DataFrame) -> int:
    """Free the blocks backing ONE DataFrame returned by :func:`materialize`,
    without touching anything else in the session.  Returns the number of
    RDD-level block sets released.

    Iterative operators (connected components, pagerank, BFS) materialize a
    new table every round and drop the previous one; waiting for the driver
    GC + ContextCleaner to notice the dropped reference lets superseded
    rounds' blocks pile up in the unified region faster than the async
    cleaner drains them (measured: connected_components at 12M edges under a
    6 GB heap OOMs in an iteration join's hash build while holding ~15
    rounds of dead label blocks).  Loops call this on the superseded round
    as soon as the next round is materialized.

    Same hazard as :func:`release_materialized`: a local-checkpointed plan
    has no lineage, so collecting the released DataFrame again raises
    instead of recomputing.  ``persist``-mode DataFrames keep lineage and
    merely recompute.
    """
    n = 0
    # local/reliable checkpoint: the analyzed plan is a LogicalRDD leaf
    # holding the persisted RDD (reliable checkpoints unpersist as a no-op —
    # their blocks are files under the checkpoint dir)
    leaves = df._jdf.queryExecution().analyzed().collectLeaves().iterator()
    while leaves.hasNext():
        leaf = leaves.next()
        if leaf.getClass().getSimpleName() == "LogicalRDD":
            leaf.rdd().unpersist(False)
            n += 1
    df.unpersist()  # persist-mode blocks live in the SQL cache manager
    return n


def release_materialized(spark: SparkSession) -> int:
    """Free EVERY RDD-level persistent block in the session — local
    checkpoints included (they bypass ``spark.catalog.clearCache``, which
    only drops SQL-cache entries).  Returns the number of RDDs released.

    Only call when no DataFrame materialized earlier will be collected
    again: a truncated plan has no lineage, so re-collecting it after
    release raises instead of recomputing.
    """
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for jrdd in jmap.values():
        jrdd.unpersist(False)
        n += 1
    return n
