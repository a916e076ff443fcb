"""Structured Streaming operators over the events stream.

The reference has NO streaming surface (SURVEY §1.4 — its plugin explicitly
excludes streaming plans, ColumnarPlugin.scala:349-352); this module is the
beyond-reference streaming layer built on Spark Structured Streaming:

- watermarked tumbling / sliding / session windows (``F.window`` /
  ``F.session_window`` + ``withWatermark``),
- streaming dedup (``dropDuplicatesWithinWatermark``),
- custom stateful sessionization via ``applyInPandasWithState``.

Every query here has a *batch twin* in queries/pipeline.py; the test
strategy (tests/test_streaming.py) replays the events table through a
file-source stream with ``Trigger.AvailableNow`` and asserts the streaming
result equals the batch result — exactly-once replay equivalence.

Scale design: event-time state is bounded by the watermark (late data past
the delay is dropped, state is evicted); the shuffle key is (window, key) so
state partitions by the same hash shuffle a batch agg would use; at 100 TB/
day the same plan runs against Kafka partitions with no code change.
"""

from __future__ import annotations

import os
from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: sf_dir -> probed events schema (immutable driver fixtures; the probe is
#: a footer read that would otherwise repeat for every stream query)
_EVENTS_SCHEMA_CACHE: dict[str, T.StructType] = {}


def _events_file_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """Parquet-side schema of events.parquet, probed via a batch read.

    Streaming file sources need an explicit schema, and the driver's data
    has shipped ``ts`` both as parquet TIMESTAMP(NANOS) (surfaces as a
    nanos-long under spark.sql.legacy.parquet.nanosAsLong) and as plain
    timestamp[us] — probe instead of hardcoding so both work.
    """
    if sf_dir not in _EVENTS_SCHEMA_CACHE:
        _EVENTS_SCHEMA_CACHE[sf_dir] = spark.read.parquet(
            os.path.join(sf_dir, "events.parquet")
        ).schema
    return _EVENTS_SCHEMA_CACHE[sf_dir]


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (µs-timestamp normalized).

    ``maxFilesPerTrigger`` keeps micro-batches bounded; in production the
    same downstream plan attaches to ``spark.readStream.format("kafka")``.
    """
    schema = _events_file_schema(spark, sf_dir)
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")  # file source needs a dir
        .parquet(sf_dir)
    )
    if isinstance(schema["ts"].dataType, T.LongType):
        # integer DIV: double division loses µs precision at 1.7e18 nanos
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    else:
        # parquet NTZ timestamps can't carry a watermark
        # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE); session TZ is UTC so the
        # cast to TIMESTAMP_LTZ is value-preserving.
        raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return raw


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """5-minute tumbling-window counts/sums per event_type, watermarked.

    Batch twin: queries/pipeline.py::events_tumbling."""
    return (
        events.withWatermark("ts", watermark)
        .filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(38,9)")), 2)
            .cast("double")
            .alias("total"),
        )
        .select(
            F.col("w.start").cast("string").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding_avg(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """10-minute windows sliding every 5 — each event lands in 2 windows.

    avg = exact decimal sum ÷ count (one double division) rather than
    F.avg: running double averages differ from the oracle by an ulp and
    flip the 4th-decimal round on tie values."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(38,9)")).cast("double")
                / F.count("*"),
                4,
            ).alias("avg_value"),
        )
        .select(F.col("w.start").cast("string").alias("win_start"), "n", "avg_value")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "2 hours") -> DataFrame:
    """Native session windows (30-min inactivity gap) per user.

    Batch twin: queries/pipeline.py::events_sessionize (lag + running sum)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").cast("string").alias("sess_start"), "n_events")
    )


def stream_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon.

    State holds only ids inside the horizon — bounded memory at any rate."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def click_purchase_join(
    events: DataFrame, watermark: str = "1 hour", within_secs: int = 600
) -> DataFrame:
    """Stream-stream inner join: each click joined to the same user's
    purchases within ``within_secs`` after it (attribution-window shape).

    Both sides carry watermarks and the join condition bounds event time in
    both directions, so Spark evicts buffered state past
    watermark + within_secs — bounded memory at any input rate.  The join
    shuffles both streams by user_id once; at 100 TB/day the same plan runs
    over Kafka partitions unchanged."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within_secs} SECONDS"))
    )
    return clicks.join(purchases, cond, "inner").select(
        "user_id",
        "click_id",
        "purchase_id",
        # µs difference: exact integers on both engine and oracle side
        # (a seconds diff would truncate sub-second components differently)
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
        .cast("bigint")
        .alias("micros_between"),
    )


def click_purchase_outer_join(
    events: DataFrame, watermark: str = "1 hour", within_secs: int = 600
) -> DataFrame:
    """LEFT OUTER stream-stream join: every click, with its matching
    purchase when one lands within ``within_secs``, or NULL once the
    watermark proves no match can still arrive.

    Unmatched rows are held in the state store until the join window is
    provably closed: with the default min multiple-watermark policy the
    global watermark is min(max ts per side) - delay, so a click emits
    NULL-matched exactly when click_ts + within < that watermark.  State
    stays bounded (eviction at watermark + within) at any input rate; the
    batch oracle reproduces the same cutoff in closed form."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within_secs} SECONDS"))
    )
    return clicks.join(purchases, cond, "leftOuter").select(
        "user_id",
        "click_id",
        "purchase_id",
        F.col("purchase_id").isNotNull().alias("matched"),
    )


#: output schema of the stateful sessionizer
SESSION_STATE_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("max_session_events", T.LongType()),
    ]
)
#: persisted state: (n closed+open sessions, events in current, max events, last ts µs)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_sessions", T.LongType()),
        T.StructField("cur_events", T.LongType()),
        T.StructField("max_events", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)

_GAP_US = 30 * 60 * 1_000_000


def _sessionize_user(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Per-user session fold — the custom stateful operator the reference
    could never express (applyInPandasWithState; Arrow-batched like its
    columnar Python UDF path, ColumnarArrowEvalPythonExec.scala:51)."""
    if state.exists:
        n_sessions, cur, mx, last = state.get
    else:
        n_sessions, cur, mx, last = 0, 0, 0, None
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for us in (pdf["ts"].astype("int64") // 1000).tolist():
            if last is None or us - last > _GAP_US:
                n_sessions += 1
                cur = 0
            cur += 1
            mx = max(mx, cur)
            last = us
    state.update((n_sessions, cur, mx, last if last is not None else 0))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_sessions": [n_sessions], "max_session_events": [mx]}
    )


def stateful_sessionize(events: DataFrame) -> DataFrame:
    """Custom stateful sessionization: per-user session counts via
    applyInPandasWithState (update mode; processing-time timeout off — the
    harness replays a finite file stream)."""
    return (
        events.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_user,
            outputStructType=SESSION_STATE_OUTPUT,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "append",
    state_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> DataFrame:
    """Drain a finite stream into an in-memory table (test/dev sink) with
    Trigger.AvailableNow — processes all available input then stops.

    ``extra_confs`` are session confs pinned for THIS query only (read at
    query start, restored afterwards) — e.g. ``TWS_RUN_CONFS`` selects the
    RocksDB state-store provider transformWithState's column families need
    without switching every later stream query onto RocksDB.

    ``state_partitions`` sizes the stateful-operator partitioning (stream
    aggregation / join state stores are created one per shuffle partition
    and pay per-partition per-micro-batch maintenance, so this should track
    stream volume: a few for a test stream, hundreds on a production
    firehose).  It is pinned at the query's first checkpoint by Structured
    Streaming; the session conf is restored afterwards so batch queries keep
    their own setting.

    Production sinks swap this for ``.format("parquet")`` / ``foreachBatch``;
    the query plan is identical."""
    import shutil
    import tempfile

    spark = stream_df.sparkSession
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    saved_extra = {}
    if extra_confs:
        for k, v in extra_confs.items():
            try:
                saved_extra[k] = spark.conf.get(k)
            except Exception:
                saved_extra[k] = None
            spark.conf.set(k, v)
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    # test/dev sink: put the (throwaway) checkpoint on tmpfs when the host
    # has one — state-store commits fsync per partition per micro-batch, and
    # on a disk-backed /tmp those syncs dominate the drain time for a small
    # finite stream.  Durable pipelines use run_to_parquet with an explicit
    # (persistent) checkpoint instead.
    ckpt = tempfile.mkdtemp(
        prefix=f"ckpt_{name}_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        shutil.rmtree(ckpt, ignore_errors=True)
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", saved)
        for k, v in saved_extra.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.table(name)


def run_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    output_mode: str = "append",
    state_partitions: int | None = None,
) -> None:
    """Drain a finite stream into a parquet directory sink with an explicit
    checkpoint — the durable production sink shape.

    Exactly-once contract: the file sink records committed files per
    micro-batch in ``_spark_metadata`` inside ``path`` and the source
    offsets in ``checkpoint``; re-running with the SAME checkpoint after
    new input arrives processes ONLY the unseen input (no duplicates, no
    gaps) — crash/restart recovery is the same mechanism (pinned by
    tests/test_streaming.py::test_parquet_sink_exactly_once_resume).
    """
    spark = stream_df.sparkSession
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("parquet")
            .option("path", path)
            .option("checkpointLocation", checkpoint)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", saved)


#: output schema of the transformWithState running aggregate
TWS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class _RunningUserAgg(StatefulProcessor):
    """StatefulProcessor: per-user running count/sum/max over the stream.

    The Spark-4 arbitrary-state API (transformWithStateInPandas) — typed
    ValueState in the state store per grouping key, Arrow-batched input,
    update-mode emission.  Replaces the applyInPandasWithState form with
    store-backed typed state (RocksDB-spillable on a real cluster), the
    operator shape a 100 TB/day keyed enrichment needs."""

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "agg",
            T.StructType(
                [
                    T.StructField("n", T.LongType()),
                    T.StructField("total", T.DoubleType()),
                    T.StructField("mx", T.DoubleType()),
                ]
            ),
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        # one get() instead of exists()+get(): every state access is a
        # round trip to the per-partition state server, paid per key per
        # micro-batch, and get() already returns None when absent
        prev = self._state.get()
        n, total, mx = prev if prev is not None else (0, 0.0, float("-inf"))
        for pdf in rows:
            vals = pdf["value"]
            n += int(len(vals))
            total += float(vals.sum())
            if len(vals):
                mx = max(mx, float(vals.max()))
        self._state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "max_value": [mx],
            }
        )

    def close(self) -> None:
        pass


#: output schema of the typed-states (list/map/TTL) transformWithState entry
TWS_TYPED_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_types", T.LongType()),
        T.StructField("n_purchases", T.LongType()),
    ]
)


class _TypedStatesAgg(StatefulProcessor):
    """StatefulProcessor exercising the WIDER typed-state surface: ListState
    (per-batch subtotals) and MapState (per-event-type counts).  No TTL
    here: TTL states require ProcessingTime time mode, under which an
    AvailableNow replay schedules open-ended eviction micro-batches and the
    drain never terminates deterministically — the TTL protocol path is
    covered by the live-trigger test
    (tests/test_streaming.py::test_tws_ttl_accepted_by_state_server) and the
    pbshim wire tests instead."""

    def init(self, handle) -> None:
        self._subs = handle.getListState("subs", "n BIGINT, total DOUBLE")
        self._counts = handle.getMapState("counts", "et STRING", "n BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        # read the existing per-type counts ONCE via the map iterator (one
        # server round trip) instead of containsKey+getValue per event type
        # per batch — every state access is an RPC to the per-partition
        # state server, paid per key per micro-batch, and the iterator was
        # already needed for the final counts below.  The local dict mirrors
        # every updateValue, so the emitted row equals re-reading the map.
        counts = {k[0]: int(v[0]) for k, v in self._counts.iterator()}
        for pdf in rows:
            self._subs.appendValue((len(pdf), float(pdf["value"].sum())))
            for et, n in pdf["event_type"].value_counts().items():
                counts[et] = counts.get(et, 0) + int(n)
                self._counts.updateValue((et,), (counts[et],))
        n_events, total = 0, 0.0
        for row in self._subs.get():
            n_events += int(row[0])
            total += float(row[1])
        n_types = len(counts)
        n_purch = counts.get("purchase", 0)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_events],
                "total_value": [round(total, 2)],
                "n_types": [n_types],
                "n_purchases": [n_purch],
            }
        )

    def close(self) -> None:
        pass


def transform_with_state_typed(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas with ListState + MapState (see
    ``_TypedStatesAgg``); same RocksDB-provider requirement as the
    ValueState form."""
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf in the Python "
            "runtime; unavailable here."
        )
    from ..vendor import ship_protobuf_shim

    ship_protobuf_shim(events.sparkSession)
    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_TypedStatesAgg(),
            outputStructType=TWS_TYPED_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )
    )


def tws_available() -> bool:
    """True when the transformWithState runtime can start: its state-server
    protocol needs ``google.protobuf``, which not every runtime ships (this
    container does not — the operator is plumbing-complete and gated, per
    the stub-don't-install environment rule)."""
    from ..vendor import enable_protobuf_shim

    # real wheel, or the vendored pbshim minimal runtime — either satisfies
    # the state-server protocol (ship_protobuf_shim handles worker delivery
    # for sessions whose JVM predates the PYTHONPATH hook)
    return enable_protobuf_shim()


#: Session confs a transformWithState query needs at START: its state lives
#: in named column families, which only the RocksDB provider supports
#: (HDFSBackedStateStoreProvider raises STATE_STORE_MULTIPLE_COLUMN_FAMILIES).
#: Pass to run_to_memory(extra_confs=...) so the provider switch is scoped
#: to the tws query instead of every stream that starts afterwards.
TWS_RUN_CONFS: dict[str, str] = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
}
if os.path.isdir("/dev/shm"):
    # RocksDB instance working dirs (sst/wal staging) on tmpfs: the per-
    # partition store open/commit otherwise pays disk fsyncs that dominate
    # a small finite stream's drain time
    TWS_RUN_CONFS["spark.sql.streaming.stateStore.rocksdb.localRootDir"] = (
        "/dev/shm/spark_rocksdb_state"
    )


def transform_with_state_agg(events: DataFrame) -> DataFrame:
    """Per-user running aggregate via the Spark-4 transformWithStateInPandas
    API (typed ValueState, update mode, no timers).

    Run with ``run_to_memory(..., extra_confs=TWS_RUN_CONFS)`` — the state
    server needs the RocksDB provider (see TWS_RUN_CONFS).  The Python side
    of the protocol needs ``google.protobuf``; environments without the
    wheel get the vendored pbshim runtime (session.py enables it before the
    JVM starts).  Raises ``RuntimeError`` when neither is available
    (check ``tws_available()`` first)."""
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf in the Python "
            "runtime; unavailable here — use stateful_sessionize "
            "(applyInPandasWithState) instead."
        )
    # the session may predate enable_protobuf_shim (a caller-owned builder);
    # ship the shim to this session's workers as a pyFile in that case
    from ..vendor import ship_protobuf_shim

    ship_protobuf_shim(events.sparkSession)
    proc = _RunningUserAgg()
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=TWS_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )
    )


def chained_window_rollup(events: DataFrame) -> DataFrame:
    """Two chained stateful window aggregations in ONE streaming query
    (Spark 3.5+ multi-stateful-operator support): 5-minute partials per
    event_type roll up into 15-minute finals via ``window_time`` — the
    streaming analog of a partial/final aggregate tree.  At firehose scale
    the first agg absorbs the event volume and the second only sees the
    5-minute partial rows (3 per 15-min window per type), so the rollup
    state is negligible.  Append mode is mandatory for chained stateful
    ops; with a 0-second watermark every window whose end <= max event time
    emits, which is what the batch oracle replays."""
    lvl1 = (
        events.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("cents"),
        )
    )
    lvl2 = (
        lvl1.groupBy(
            F.window(F.window_time("w"), "15 minutes").alias("w2"), "event_type"
        )
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
    )
    return lvl2.select(
        F.col("w2.start").cast("string").alias("win_start"),
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("cents").cast("bigint").alias("cents"),
    )
