"""SparkSession factory with engine defaults.

Mirrors the reference's recommended submit conf
(/root/reference/docs/index.md:88-110: AQE-era tuning, explicit shuffle
partition count, arrow batch size via
spark.sql.execution.arrow.maxRecordsPerBatch — ColumnarPluginConfig.scala:125)
translated to vanilla-Spark knobs that matter at 100 TB:

- AQE on (runtime partition coalescing, skew-join splitting) — replaces the
  reference's ColumnarCustomShuffleReaderExec (SURVEY §2.9).
- UTC session timezone (the reference is local-TZ sensitive; we pin UTC).
- ANSI off: non-ANSI overflow→null matches the reference's
  castDECIMALNullOnOverflow semantics (ColumnarUnaryOperator.scala).
- Arrow-enabled pandas interop = the reference's columnar Python UDF path
  (ColumnarArrowEvalPythonExec.scala:51).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Engine session defaults.  Keys are plain Spark confs; at cluster scale the
#: same dict is handed to spark-submit.  Values chosen for the local[32]
#: harness but shaped for 1000-executor runs (AQE does the runtime sizing).
ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",  # reference batch size
    "spark.sql.parquet.filterPushdown": "true",
    # driver data ships events.ts as TIMESTAMP(NANOS); Spark's reader rejects
    # it natively — read as long, catalog.load_table converts to µs timestamp
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    # Generated-class cache defaults to 100 entries; a battery of 150+
    # distinct queries (each several codegen stages) churns it and Janino
    # recompiles every stage on every run — 4.7x slowdown measured at
    # sf0.01.  Static conf: must be set before the first query compiles.
    "spark.sql.codegen.cache.maxEntries": "10000",
    "spark.ui.enabled": "false",
    "spark.driver.memory": "24g",
    # ContextCleaner only reclaims shuffle files / broadcast blocks when the
    # driver GCs; with a 24g heap and the default 30min periodic GC, a long
    # query battery accumulates hundreds of stale shuffles and the deferred
    # cleanup lands as multi-second stalls inside later queries.  A short
    # periodic GC keeps cleanup incremental (no-op for short sessions).
    "spark.cleaner.periodicGC.interval": "2min",
    # A multi-hundred-query battery JIT-compiles thousands of generated
    # classes; the JVM's default 240m reserved code cache fills, the JIT
    # stops compiling, and codegen-heavy stages (64-aggregate SimHash votes,
    # wide TPC-DS projections) fall back to interpreted bytecode — the same
    # query then swings 2s ↔ 10s between runs.  1g keeps C2 active for the
    # whole battery (static conf: applies at JVM launch).
    "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g",
}


#: Runtime-settable confs that carry the engine's declared SEMANTICS (as
#: opposed to perf tuning).  A battery entry may be invoked on a session the
#: engine did not build — the driver harness constructs its own SparkSession,
#: proven ANSI-on by the round-7 `dedup_minhash_lsh` ARITHMETIC_OVERFLOW — so
#: each entry re-asserts these on the session it receives, the PySpark
#: analogue of the reference shipping its own session extensions
#: (ColumnarPlugin.scala:387-394) instead of assuming cluster defaults.
PINNED_SEMANTICS: dict[str, str] = {
    # non-ANSI overflow→null matches the reference's
    # castDECIMALNullOnOverflow semantics (ColumnarUnaryOperator.scala)
    "spark.sql.ansi.enabled": "false",
    # the reference is local-TZ sensitive; we pin UTC everywhere
    "spark.sql.session.timeZone": "UTC",
    # driver data ships events.ts as TIMESTAMP(NANOS); must read as long
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def pin_session_semantics(spark: SparkSession) -> None:
    """Re-assert the engine's semantics confs on an arbitrary host session.

    Every battery entry runs through this via ``queries.all_queries()`` so
    results are identical whether the host session was built by
    :func:`get_spark` or by an external harness with different defaults
    (ANSI on, non-UTC TZ, ...).

    Read-before-write: ``conf.set`` is only issued when the session value
    actually differs.  A redundant ``set`` is not free — every write bumps
    the session's SQLConf epoch, which invalidates cached logical-plan
    state, so re-asserting three confs before each of 450+ entries showed
    up as a measurable per-query regression (round-8 TPC-H drift).  On an
    already-pinned session this is now three reads and zero writes.

    The pin intentionally PERSISTS on the host session (no restore):
    Spark reads SQLConf both at analysis and at execution time, so
    restoring a hostile value (ANSI on) after building the DataFrame but
    before the harness materializes it would silently change runtime
    semantics — exactly the bug class this pin exists to prevent.  A host
    that needs its own semantics back must re-set them after draining the
    battery results."""
    conf = spark.conf
    for k, v in PINNED_SEMANTICS.items():
        try:
            cur = conf.get(k)
        except Exception:
            cur = None
        if cur != v:
            conf.set(k, v)


def get_spark(app_name: str = "native_sql_engine_spark", **overrides: str) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (driver contract);
    defaults to all cores.  ``overrides`` are extra conf pairs.
    """
    # transformWithState's state-server protocol needs google.protobuf in
    # the executor Python workers; when the real wheel is absent, the
    # vendored pbshim runtime fills in.  Must run before the JVM launches
    # so workers inherit the PYTHONPATH entry.
    from .vendor import enable_protobuf_shim

    enable_protobuf_shim()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    conf = {**ENGINE_CONF, **{str(k): str(v) for k, v in overrides.items()}}
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
