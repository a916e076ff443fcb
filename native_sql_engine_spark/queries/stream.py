"""Streaming battery: Structured Streaming queries drained to a batch result.

Each entry replays the finite events file-stream (Trigger.AvailableNow) into
a memory sink and returns the drained table — so the driver can hash-compare
streaming output against the DuckDB oracle like any batch query.  The
reference has no streaming at all (SURVEY §1.4); these are beyond-parity.
"""

from __future__ import annotations

import itertools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming import windows as SW

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

_SINK_SEQ = itertools.count()


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _drain(stream_df: DataFrame, base: str, mode: str, parts: int = 8) -> DataFrame:
    # the driver events table is a single-file micro-batch; 8 state
    # partitions keep state-store maintenance proportional to it (the
    # session's 32 would pay 4× the per-partition per-batch overhead, while
    # fewer serializes the Python-stateful operators — measured: TWS runs
    # 3.4s at 8 partitions, 4.8s at 4, 6.0s at 2).  Stream-stream JOINS
    # override to 4: they keep FOUR state stores per partition (left/right ×
    # keyToNumValues/keyWithIndexToValue), so per-partition per-batch commit
    # overhead weighs 4× an aggregation's — measured min-of-2 at sf0.1:
    # ss_join 4.04s @8 / 2.53s @4 / 2.31s @2, outer_join 2.98 / 2.15 / 2.13,
    # while tumbling (1 store) is flat (0.94 @8 / 0.97 @4 / 1.10 @2).
    # Production firehoses size this to volume (run_to_memory docstring).
    return SW.run_to_memory(
        stream_df, f"{base}_{next(_SINK_SEQ)}", output_mode=mode, state_partitions=parts
    )


@q(
    "stream_tumbling",
    """
    SELECT cast(cast(to_timestamp(floor(epoch(cast(ts AS timestamp)) / 300) * 300)
                AS timestamp) AS varchar) AS win_start,
           event_type,
           cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(value AS decimal(38,9))), 2) AS double) AS total
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY win_start, event_type
    ORDER BY win_start, event_type
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 5-min tumbling windows over the event stream; the drained
    complete-mode result hash-matches the batch/DuckDB answer (replay
    equivalence)."""
    ev = SW.read_events_stream(spark, sf_dir)
    out = _drain(SW.tumbling_counts(ev), "q_stream_tumbling", "complete")
    return out.orderBy("win_start", "event_type")


@q(
    "stream_session_windows",
    """
    WITH g AS (
      SELECT user_id, ts, epoch_us(cast(ts AS timestamp)) AS es,
             CASE WHEN epoch_us(cast(ts AS timestamp))
                       - lag(epoch_us(cast(ts AS timestamp)), 1)
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000 OR lag(ts, 1) OVER (PARTITION BY user_id
                                                        ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events),
    s AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY es
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM g)
    SELECT user_id,
           cast(cast(min(ts) AS timestamp) AS varchar) AS sess_start,
           cast(count(*) AS bigint) AS n_events
    FROM s GROUP BY user_id, sess_id
    ORDER BY user_id, sess_start
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30-min gap) per user on the stream; oracle is
    the window-function sessionization of the same data in DuckDB."""
    ev = SW.read_events_stream(spark, sf_dir)
    out = _drain(SW.session_windows(ev), "q_stream_sessions", "complete")
    return out.orderBy("user_id", "sess_start")


@q(
    "stream_dedup",
    """
    SELECT cast(count(*) AS bigint) AS n_unique,
           cast(count(DISTINCT event_id) AS bigint) AS n_distinct_ids
    FROM (SELECT DISTINCT ON (event_id) * FROM events ORDER BY event_id)
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon."""
    ev = SW.read_events_stream(spark, sf_dir)
    out = _drain(SW.stream_dedup(ev), "q_stream_dedup", "append")
    return out.agg(
        F.count("*").alias("n_unique"),
        F.countDistinct("event_id").alias("n_distinct_ids"),
    )


@q(
    "stream_stream_join",
    """
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           cast(epoch_us(cast(p.ts AS timestamp)) - epoch_us(cast(c.ts AS timestamp))
                AS bigint) AS micros_between
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND p.event_type = 'purchase'
     AND cast(p.ts AS timestamp) >= cast(c.ts AS timestamp)
     AND cast(p.ts AS timestamp) <= cast(c.ts AS timestamp) + INTERVAL 600 SECONDS
    ORDER BY click_id, purchase_id
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (clicks → purchases within 10 min, same
    user) with two-sided watermarks; the drained append-mode result
    hash-matches the batch self-join in DuckDB (replay equivalence)."""
    ev = SW.read_events_stream(spark, sf_dir)
    out = _drain(SW.click_purchase_join(ev), "q_stream_ssjoin", "append", parts=4)
    return out.orderBy("click_id", "purchase_id")


@q(
    "stream_stateful_sessionize",
    """
    WITH e AS (
      SELECT user_id, cast(ts AS timestamp) AS t, event_id,
             lag(cast(ts AS timestamp))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events),
    s AS (
      SELECT user_id,
             sum(CASE WHEN prev IS NULL
                        OR epoch_us(t) - epoch_us(prev) > 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY t, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM e),
    per AS (SELECT user_id, sid, cast(count(*) AS bigint) AS n
            FROM s GROUP BY user_id, sid)
    SELECT user_id,
           cast(max(sid) AS bigint) AS n_sessions,
           max(n) AS max_session_events
    FROM per GROUP BY user_id ORDER BY user_id
    """,
)
def stream_stateful_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful sessionization via applyInPandasWithState (30-min gap,
    update mode).  Hash-checkable against the batch twin: the file source is
    a single parquet file with maxFilesPerTrigger=1, so the drained update
    stream's final per-user state equals batch sessionization over the global
    (ts, event_id) order — which the DuckDB oracle computes with a gap-flag
    running sum.  Update emissions are monotone in both outputs, so max()
    over emissions IS the final state."""
    ev = SW.read_events_stream(spark, sf_dir)
    out = _drain(SW.stateful_sessionize(ev), "q_stream_state", "update")
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_sessions").alias("n_sessions"),
            F.max("max_session_events").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


@q(
    "stream_sliding",
    """
    WITH w AS (
      SELECT unnest([
               to_timestamp(floor(epoch(cast(ts AS timestamp)) / 300) * 300 - 300),
               to_timestamp(floor(epoch(cast(ts AS timestamp)) / 300) * 300)
             ]) AS ws,
             value
      FROM events
    )
    SELECT cast(cast(ws AS timestamp) AS varchar) AS win_start,
           cast(count(*) AS bigint) AS n,
           round(cast(sum(cast(value AS decimal(38,9))) AS double) / count(*), 4)
             AS avg_value
    FROM w
    GROUP BY ws
    ORDER BY win_start
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 (each event lands in exactly two
    windows); drained complete-mode result vs a DuckDB oracle that explodes
    each event into its two window starts."""
    ev = SW.read_events_stream(spark, sf_dir)
    out = _drain(SW.sliding_avg(ev), "q_stream_sliding", "complete")
    return out.orderBy("win_start")


@q(
    "stream_static_join",
    """
    SELECT c_mktsegment AS seg,
           cast(count(*) AS bigint) AS n_purchases,
           cast(round(sum(cast(value AS decimal(38,9))), 2) AS double) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    WHERE event_type = 'purchase'
    GROUP BY seg ORDER BY seg
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static (dimension) join: the purchase stream enriches against
    the batch customer table — the canonical streaming star-join.  The
    static side is broadcast per micro-batch (no stream state grows from
    it, unlike a stream-stream join); complete-mode per-segment totals
    hash-match the batch join in DuckDB (replay equivalence)."""
    from ..catalog import load_table

    ev = SW.read_events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("seg")
    )
    joined = ev.join(F.broadcast(dim), F.col("user_id") == F.col("c_custkey"))
    agg = joined.groupBy("seg").agg(
        F.count("*").alias("n_purchases"),
        F.round(F.sum(F.col("value").cast("decimal(38,9)")), 2)
        .cast("double")
        .alias("total_value"),
    )
    out = _drain(agg, "q_stream_static", "complete")
    return out.orderBy("seg")


@q(
    "stream_parquet_sink",
    """
    SELECT event_id, user_id,
           cast(round(cast(value AS decimal(38,9)) * 2, 2) AS double) AS doubled
    FROM events WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
)
def stream_parquet_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durable parquet sink e2e: stream → checkpointed file sink → read the
    committed files back.  What the oracle match proves: every input row
    reached the sink exactly once through the _spark_metadata commit
    protocol (the crash/restart path is the same mechanism —
    test_parquet_sink_exactly_once_resume pins the resume half)."""
    import tempfile

    ev = SW.read_events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    out = ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value").cast("decimal(38,9)") * 2, 2).cast("double").alias("doubled"),
    )
    base = tempfile.mkdtemp(prefix="stream_sink_")
    SW.run_to_parquet(out, f"{base}/data", f"{base}/ckpt", state_partitions=8)
    return spark.read.parquet(f"{base}/data").orderBy("event_id")


@q(
    "stream_outer_join",
    """
    WITH c AS (SELECT user_id, event_id AS click_id, cast(ts AS timestamp) AS click_ts
               FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id AS p_user_id, event_id AS purchase_id,
                 cast(ts AS timestamp) AS purchase_ts
          FROM events WHERE event_type = 'purchase'),
    wm AS (SELECT least((SELECT max(click_ts) FROM c),
                        (SELECT max(purchase_ts) FROM p))
                  - INTERVAL 1 HOUR AS w)
    SELECT c.user_id, c.click_id, p.purchase_id,
           p.purchase_id IS NOT NULL AS matched
    FROM c
    LEFT JOIN p
      ON c.user_id = p.p_user_id
     AND p.purchase_ts >= c.click_ts
     AND p.purchase_ts <= c.click_ts + INTERVAL 600 SECONDS
    CROSS JOIN wm
    WHERE p.purchase_id IS NOT NULL
       OR c.click_ts + INTERVAL 600 SECONDS < wm.w
    ORDER BY click_id, purchase_id
    """,
)
def stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join with two-sided watermarks: matched rows
    emit immediately; unmatched clicks emit NULL-purchase exactly when the
    global watermark (min of both sides - 1h) proves the 10-min window
    closed.  The oracle reproduces that emission rule in closed form, so the
    drained append-mode output hash-matches including the withheld tail —
    the watermark semantics themselves are under test."""
    ev = SW.read_events_stream(spark, sf_dir)
    out = _drain(
        SW.click_purchase_outer_join(ev), "q_stream_outer_join", "append", parts=4
    )
    return out.orderBy("click_id", "purchase_id")


@q(
    "stream_python_source",
    """
    SELECT event_type,
           cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(value AS decimal(38,9))), 2) AS double) AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def stream_python_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom PYTHON streaming source (Spark 4 SimpleDataSourceStreamReader,
    sources/pyds.py): replays the events table in offset-tracked 4096-row
    chunks (sized to ~4 micro-batches) — the exactly-once offset/replay
    contract of a Kafka-style source, implemented in Python.  The complete-mode aggregate over the
    multi-micro-batch replay hash-matches the one-shot batch oracle,
    proving no chunk is lost or double-counted across batches."""
    import tempfile
    import time as _time

    import pyarrow.parquet as pq

    from ..sources.pyds import register

    register(spark)
    path = f"{sf_dir}/events.parquet"
    expected = pq.ParquetFile(path).metadata.num_rows
    # ~4 micro-batches at any scale factor (micro-batch count, not batch
    # size, is what the replay contract needs exercised; per-batch overhead
    # is fixed cost)
    chunk = max(4096, -(-expected // 4))
    stream = (
        spark.readStream.format("pyarrow_chunks")
        .option("path", path)
        .option("columns", "event_id,event_type,value")
        .option("chunk_rows", str(chunk))
        .load()
    )
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(38,9)")), 2)
        .cast("double")
        .alias("total_value"),
    )
    name = f"q_stream_pysource_{next(_SINK_SEQ)}"
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    # 2 state partitions, not the stream default 8: this aggregate has
    # exactly |event_type| = 5 groups at ANY scale factor (the domain is
    # fixed), and the complete-mode state store pays per-partition commit
    # overhead on every one of the ~4 replay micro-batches — measured
    # in-session sweep at sf0.1: 8 parts {5.65,4.90}s, 4 {4.68,4.07},
    # 2 {4.19,3.87} on matched reps.  Partition count tracks the GROUP
    # cardinality here, not the core count.
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        query = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", tempfile.mkdtemp(prefix=name, dir="/dev/shm" if __import__("os").path.isdir("/dev/shm") else None))
            .start()
        )
        try:
            # drain until every source row is reflected in the sink
            # (AvailableNow only covers the prefetched first chunk for
            # Simple stream readers, so poll to the known row count)
            deadline = _time.time() + 120
            while _time.time() < deadline:
                got = spark.sql(f"SELECT sum(n) FROM {name}").first()[0]
                if got == expected:
                    break
                _time.sleep(0.05)
            else:
                raise TimeoutError(f"stream drained {got}/{expected} rows")
        finally:
            query.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    return spark.table(name).orderBy("event_type")


@q(
    "stream_foreach_batch_upsert",
    """
    WITH ranked AS (
      SELECT user_id, epoch_us(cast(ts AS timestamp)) AS last_us,
             event_id AS last_event_id, event_type AS last_event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT cast(user_id AS bigint) AS user_id,
           cast(last_us AS bigint) AS last_us,
           cast(last_event_id AS bigint) AS last_event_id,
           last_event_type
    FROM ranked WHERE rn = 1 ORDER BY user_id
    """,
)
def stream_foreach_batch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch upsert sink: keyed latest-state maintenance as
    append-only deltas + merge-on-read compaction (the Delta/Iceberg MERGE
    pattern built from primitives).

    The event file is re-sharded into 4 files and streamed with
    maxFilesPerTrigger=1, so foreachBatch runs per micro-batch; each batch
    reduces to its per-user argmax (max over a (ts, event_id, ...) struct
    — associative, so per-batch reduction then cross-batch reduction
    equals the global argmax) and APPENDS that delta.  Reading the state
    dir re-reduces across batch deltas — no rewrite of existing state at
    write time, exactly how an upsert sink scales: delta size is bounded
    by keys-per-batch, compaction is deferred to read (or a periodic
    OPTIMIZE).  The oracle computes latest-per-user directly, proving
    batch-order independence end-to-end."""
    import tempfile

    base = tempfile.mkdtemp(prefix="stream_upsert_")
    from ..catalog import load_table

    src = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    src.repartition(4, F.col("event_id") % 4).write.parquet(f"{base}/src")
    schema = spark.read.parquet(f"{base}/src").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{base}/src")
    )
    state_dir = f"{base}/state"

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("user_id")
            .agg(F.max(F.struct("ts", "event_id", "event_type")).alias("m"))
            .select("user_id", "m.*")
            .write.mode("append")
            .parquet(state_dir)
        )

    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        qh = (
            stream.writeStream.foreachBatch(upsert)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        qh.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    state = spark.read.parquet(state_dir)
    return (
        state.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "event_type")).alias("m"))
        .select(
            "user_id",
            F.unix_micros(F.col("m.ts").cast("timestamp")).alias("last_us"),
            F.col("m.event_id").alias("last_event_id"),
            F.col("m.event_type").alias("last_event_type"),
        )
        .orderBy("user_id")
    )


@q(
    "stream_state_store_read",
    """
    SELECT event_type, cast(count(*) AS bigint) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def stream_state_store_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 state-store DATA SOURCE (`spark.read.format("statestore")`):
    after a stateful streaming aggregation drains, its checkpoint's state
    store is read back as a DataFrame — the observability surface for
    100 TB streaming ops (state-size audits, key-skew checks, debugging a
    wedged aggregation WITHOUT replaying the stream).  The state rows
    (key struct, value struct with the running count) must equal the
    batch aggregation of the same input — streaming state ≡ batch truth,
    checked by the oracle."""
    import tempfile

    from ..catalog import load_table

    base = tempfile.mkdtemp(prefix="stream_sst_")
    ev = load_table(spark, sf_dir, "events").select("event_type")
    ev.write.parquet(f"{base}/src")
    schema = spark.read.parquet(f"{base}/src").schema
    stream = spark.readStream.schema(schema).parquet(f"{base}/src")
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        qh = (
            stream.groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .writeStream.format("noop")
            .outputMode("complete")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        qh.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    state = spark.read.format("statestore").load(f"{base}/ckpt")
    return state.select(
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").alias("n"),
    ).orderBy("event_type")


@q(
    "stream_chained_window_agg",
    """
    WITH mx AS (SELECT max(cast(ts AS timestamp)) AS m FROM events),
    l AS (
      SELECT cast(to_timestamp(floor(epoch(cast(ts AS timestamp)) / 900) * 900)
               AS timestamp) AS win_start,
             event_type,
             cast(count(*) AS bigint) AS n,
             cast(sum(cast(floor(value * 100) AS bigint)) AS bigint) AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT cast(win_start AS varchar) AS win_start, event_type, n, cents
    FROM l, mx
    WHERE win_start + INTERVAL 15 MINUTE <= mx.m
    ORDER BY win_start, event_type
    """,
)
def stream_chained_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained stateful aggregations in one streaming query (5-min partials
    -> 15-min finals through ``window_time``), Spark 3.5+ surface the
    reference has no analog of.  Oracle: the 15-min rollup computed in
    batch, cut at the final watermark (windows closing after max event time
    never emit in append mode)."""
    ev = SW.read_events_stream(spark, sf_dir)
    out = _drain(SW.chained_window_rollup(ev), "q_stream_chained", "append")
    return out.orderBy("win_start", "event_type")


@q(
    "stream_late_data_drop",
    """
    WITH cut AS (
      SELECT to_timestamp(floor((min(epoch(cast(ts AS timestamp)))
               + max(epoch(cast(ts AS timestamp)))) / 2)) AS c,
             max(cast(ts AS timestamp)) AS mx
      FROM events
    ),
    on_time AS (
      SELECT cast(ts AS timestamp) AS ts, event_type FROM events, cut
      WHERE cast(ts AS timestamp) >= cut.c
    ),
    w AS (
      SELECT cast(to_timestamp(floor(epoch(ts) / 300) * 300) AS timestamp)
               AS win_start,
             event_type, cast(count(*) AS bigint) AS n
      FROM on_time GROUP BY 1, 2
    )
    SELECT cast(win_start AS varchar) AS win_start, event_type, n
    FROM w, cut
    WHERE win_start + INTERVAL 5 MINUTE <= cut.mx
    ORDER BY win_start, event_type
    """,
)
def stream_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data DROP semantics, deterministically replayed: the corpus
    splits at its midpoint timestamp; the on-time half is present at query
    start, the LATE half (strictly older timestamps) is delivered as a new
    file only after the first micro-batch commits — so the watermark
    already stands at the on-time max and the stateful aggregation drops
    every late row (`numRowsDroppedByWatermark`, asserted in
    tests/test_streaming.py).  The oracle aggregates the ON-TIME HALF ONLY,
    cut at the final watermark.  This pins the semantic a 100 TB firehose
    depends on: state stays bounded because too-late data is dropped, not
    buffered.  (Engine note: the drop happens under a live trigger; the
    AvailableNow wrapper in this Spark build plans all discovered files
    with the restart-time watermark, which never filters within one run —
    hence the two-phase file delivery here.)"""
    import os
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    # Fixture prep entirely in pyarrow on the driver: the corpus is ONE
    # small parquet file and the split is a scan + two writes of it — as
    # three Spark jobs this was ~60% of the entry's wall time (measured
    # 1.6–2.4s of ~3.5s); pyarrow does it in <0.2s.  Arithmetic is kept
    # bit-identical to the previous Spark form: ts → µs by floor-div,
    # per-row seconds by floor-div, cut = (min+max) // 2 — floor-div is
    # monotone so min/max commute with it.  (The streamed QUERY below is
    # untouched: it still computes from parquet through the engine.)
    tbl = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type"]
    )
    ts = tbl["ts"]
    if pa.types.is_integer(ts.type):  # TIMESTAMP(NANOS) read as int64 ns
        ts_us = pc.divide(ts, 1000)  # integer floor-div, matches `ts DIV 1000`
    else:
        ts_us = pc.cast(ts, pa.int64())  # timestamp[us] payload
    secs = pc.divide(ts_us, 1_000_000)  # per-row unix_timestamp (floor)
    lo = pc.min(secs).as_py()
    hi = pc.max(secs).as_py()
    cut = (lo + hi) // 2
    fixed = pa.table(
        {
            "ts": pc.cast(ts_us, pa.timestamp("us")),
            "event_type": tbl["event_type"],
        }
    )
    on_time = fixed.filter(pc.greater_equal(secs, cut))
    late = fixed.filter(pc.less(secs, cut))
    base = tempfile.mkdtemp(prefix="late_drop_")
    os.makedirs(f"{base}/in")
    pq.write_table(on_time, f"{base}/t0.parquet")
    pq.write_table(late, f"{base}/t1.parquet")
    shutil.copy(f"{base}/t0.parquet", f"{base}/in/a_ontime.parquet")
    stream = (
        spark.readStream.schema("ts timestamp, event_type string")
        .parquet(f"{base}/in")
    )
    agg = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(
            F.col("w.start").cast("string").alias("win_start"), "event_type", "n"
        )
    )
    name = f"q_stream_late_drop_{next(_SINK_SEQ)}"
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(processingTime="50 milliseconds")
            .start()
        )
        q.processAllAvailable()  # batch 0: on-time half -> watermark = its max
        shutil.copy(f"{base}/t1.parquet", f"{base}/in/b_late.parquet")
        q.processAllAvailable()  # late half arrives entirely below the watermark
        q.stop()
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    return spark.table(name).orderBy("win_start", "event_type")


@q(
    "stream_transform_with_state",
    """
    SELECT user_id,
           cast(count(*) AS bigint) AS n_events,
           round(sum(value), 2) AS total_value,
           max(value) AS max_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 transformWithStateInPandas: per-user running aggregate held in
    typed ValueState behind the state-server protocol (RocksDB provider —
    column families).  The driver events table is one file → one
    AvailableNow micro-batch → the update-mode memory sink holds exactly
    one final row per user, which equals the batch GROUP BY (replay
    equivalence).  Runs on the real protobuf wheel or the vendored pbshim
    runtime (vendor/pbshim — session.py enables it before the JVM starts)."""
    ev = SW.read_events_stream(spark, sf_dir)
    out = SW.run_to_memory(
        SW.transform_with_state_agg(ev),
        f"q_stream_tws_{next(_SINK_SEQ)}",
        output_mode="update",
        state_partitions=8,
        extra_confs=SW.TWS_RUN_CONFS,
    )
    return out.orderBy("user_id")


@q(
    "stream_tws_typed_states",
    """
    SELECT user_id,
           cast(count(*) AS bigint) AS n_events,
           round(sum(value), 2) AS total_value,
           cast(count(DISTINCT event_type) AS bigint) AS n_types,
           cast(count(*) FILTER (WHERE event_type = 'purchase') AS bigint)
             AS n_purchases
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def stream_tws_typed_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithStateInPandas over the WIDER typed-state surface:
    ListState (per-batch subtotals) and MapState (per-event-type counts) —
    the appendValue/get and updateValue/iterator protocol paths beyond the
    ValueState entry.  One-file AvailableNow replay → the update-mode final
    rows equal the batch GROUP BY twin (hash-deterministic).  The TTL
    protocol path (the pbshim ``ttl.durationMs`` auto-vivify surface) is
    exercised by the live-trigger test in tests/test_streaming.py — TTL
    states force ProcessingTime mode, whose eviction micro-batches make an
    AvailableNow drain non-terminating."""
    ev = SW.read_events_stream(spark, sf_dir)
    out = SW.run_to_memory(
        SW.transform_with_state_typed(ev),
        f"q_stream_tws_typed_{next(_SINK_SEQ)}",
        output_mode="update",
        state_partitions=8,
        extra_confs=SW.TWS_RUN_CONFS,
    )
    return out.orderBy("user_id")
