"""Streaming battery: replay-equivalence vs the batch twins.

Each streaming query drains the finite events file-stream with
Trigger.AvailableNow into a memory sink and must equal the batch DataFrame
result on the same data — exactly-once replay equivalence.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from native_sql_engine_spark.catalog import load_table
from native_sql_engine_spark.streaming import windows as SW


def _pdf(df, sort_cols):
    return (
        df.toPandas()
        .sort_values(sort_cols)
        .reset_index(drop=True)
        .astype(str)
    )


@pytest.fixture(scope="module")
def events_stream(spark, sf_small):
    return SW.read_events_stream(spark, sf_small)


@pytest.fixture(scope="module")
def events_batch(spark, sf_small):
    return load_table(spark, sf_small, "events")


def test_tumbling_stream_equals_batch(spark, events_stream, events_batch):
    got = SW.run_to_memory(
        SW.tumbling_counts(events_stream), "t_tumbling", output_mode="complete"
    )
    want = (
        events_batch.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(38,9)")), 2)
            .cast("double")
            .alias("total"),
        )
        .select(
            F.col("w.start").cast("string").alias("win_start"), "event_type", "n", "total"
        )
    )
    pd.testing.assert_frame_equal(
        _pdf(got, ["win_start", "event_type"]), _pdf(want, ["win_start", "event_type"])
    )


def test_sliding_stream_equals_batch(spark, events_stream, events_batch):
    got = SW.run_to_memory(
        SW.sliding_avg(events_stream), "t_sliding", output_mode="complete"
    )
    want = (
        events_batch.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
        .select(F.col("w.start").cast("string").alias("win_start"), "n", "avg_value")
    )
    pd.testing.assert_frame_equal(_pdf(got, ["win_start"]), _pdf(want, ["win_start"]))


def test_session_window_stream_equals_batch(spark, events_stream, events_batch):
    got = SW.run_to_memory(
        SW.session_windows(events_stream), "t_sessions", output_mode="complete"
    )
    want = (
        events_batch.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").cast("string").alias("sess_start"), "n_events")
    )
    pd.testing.assert_frame_equal(
        _pdf(got, ["user_id", "sess_start"]), _pdf(want, ["user_id", "sess_start"])
    )


def test_stream_dedup(spark, events_stream, events_batch):
    got = SW.run_to_memory(SW.stream_dedup(events_stream), "t_dedup")
    assert got.count() == events_batch.dropDuplicates(["event_id"]).count()
    assert got.select("event_id").distinct().count() == got.count()


def test_stateful_sessionize_equals_batch_twin(spark, events_stream, sf_small):
    from native_sql_engine_spark.queries.pipeline import events_sessionize

    updates = SW.run_to_memory(
        SW.stateful_sessionize(events_stream), "t_state_sess", output_mode="update"
    )
    # last update per user is the final state
    final = (
        updates.withColumn(
            "_rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy(F.col("n_sessions").desc(), F.col("max_session_events").desc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("user_id", "n_sessions", "max_session_events")
    )
    want = events_sessionize(spark, sf_small).select(
        "user_id",
        F.col("n_sessions").cast("long").alias("n_sessions"),
        "max_session_events",
    )
    pd.testing.assert_frame_equal(_pdf(final, ["user_id"]), _pdf(want, ["user_id"]))


import pytest as _pytest

from native_sql_engine_spark.compare import assert_matches_oracle
from native_sql_engine_spark.queries import stream as _stream


@_pytest.mark.parametrize("name", sorted(_stream.ORACLE))
def test_stream_matches_duckdb(spark, sf_small, name):
    df = _stream.QUERIES[name](spark, sf_small)
    assert_matches_oracle(df, _stream.ORACLE[name], sf_small, name)


@_pytest.mark.slow
@_pytest.mark.parametrize("name", sorted(_stream.ORACLE))
def test_stream_matches_duckdb_sf001(spark, sf_oracle, name):
    df = _stream.QUERIES[name](spark, sf_oracle)
    assert_matches_oracle(df, _stream.ORACLE[name], sf_oracle, name)


def test_transform_with_state_running_agg(spark, sf_small):
    """Spark-4 transformWithStateInPandas running aggregate equals the batch
    groupBy twin (skipped where the runtime lacks protobuf; the gate itself
    is asserted so the operator never crashes a worker mid-stream)."""
    import pytest

    ev = SW.read_events_stream(spark, sf_small)
    if not SW.tws_available():
        with pytest.raises(RuntimeError, match="protobuf"):
            SW.transform_with_state_agg(ev)
        pytest.skip("google.protobuf not in runtime; gated operator")
    out = SW.run_to_memory(
        SW.transform_with_state_agg(ev), "t_tws", output_mode="update",
        state_partitions=8, extra_confs=SW.TWS_RUN_CONFS,
    )
    import pyspark.sql.functions as F

    want = (
        load_table(spark, sf_small, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.max("value").alias("max_value"),
        )
    )
    got = {r.user_id: (r.n_events, r.total_value, r.max_value) for r in out.collect()}
    exp = {r.user_id: (r.n_events, r.total_value, r.max_value) for r in want.collect()}
    assert got == exp


def test_tws_typed_states_equal_batch_twin(spark, sf_small):
    """ListState + MapState transformWithState (the typed-state surface
    beyond ValueState) equals the batch GROUP BY twin."""
    import pytest

    if not SW.tws_available():
        pytest.skip("google.protobuf not in runtime; gated operator")
    import pyspark.sql.functions as F

    ev = SW.read_events_stream(spark, sf_small)
    out = SW.run_to_memory(
        SW.transform_with_state_typed(ev), "t_tws_typed", output_mode="update",
        state_partitions=8, extra_confs=SW.TWS_RUN_CONFS,
    )
    want = (
        load_table(spark, sf_small, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("event_type").alias("n_types"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
        )
    )
    got = {r.user_id: (r.n_events, r.total_value, r.n_types, r.n_purchases)
           for r in out.collect()}
    exp = {r.user_id: (r.n_events, r.total_value, r.n_types, r.n_purchases)
           for r in want.collect()}
    assert got == exp


def test_tws_ttl_accepted_by_state_server(spark, sf_small):
    """A TTL-configured ValueState must ride the state-server protocol
    intact — PySpark's client writes it as the nested `ttl.durationMs`
    assignment, the exact pbshim auto-vivify surface: with the pre-fix shim
    the write was silently dropped; a malformed TTLConfig fails query start.
    Live trigger (TTL forces ProcessingTime mode, under which AvailableNow
    never drains); the 1-hour TTL cannot expire mid-test, so emitted counts
    still equal the batch twin."""
    import pandas as pd
    import pytest

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    if not SW.tws_available():
        pytest.skip("google.protobuf not in runtime; gated operator")

    class _TTLCount(StatefulProcessor):
        def init(self, handle):
            self._n = handle.getValueState("n", "n BIGINT", ttlDurationMs=3_600_000)

        def handleInputRows(self, key, rows, timerValues):
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._n.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

        def close(self):
            pass

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    ev = SW.read_events_stream(spark, sf_small)
    tws = (
        ev.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_TTLCount(),
            outputStructType=schema,
            outputMode="Update",
            timeMode="ProcessingTime",
        )
    )
    saved = {}
    for k, v in SW.TWS_RUN_CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        q = (
            tws.writeStream.format("memory")
            .queryName("t_tws_ttl")
            .outputMode("update")
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            # processAllAvailable() never returns in ProcessingTime mode with
            # TTL states (continuous eviction batches) — poll until the file
            # data has drained: ≥1 batch with input, then an idle batch.
            import time

            deadline = time.time() + 90
            drained = False
            while time.time() < deadline and not drained:
                time.sleep(1.0)
                if q.exception() is not None:
                    raise q.exception()
                prog = q.recentProgress
                saw_input = any(p["numInputRows"] > 0 for p in prog)
                idle_tail = bool(prog) and prog[-1]["numInputRows"] == 0
                drained = saw_input and idle_tail
            assert drained, "stream never drained the events file"
        finally:
            q.stop()
            q.awaitTermination()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    import pyspark.sql.functions as F

    got = {
        r.user_id: r.n_events
        for r in spark.table("t_tws_ttl").groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .collect()
    }
    exp = {
        r.user_id: r.n
        for r in load_table(spark, sf_small, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exp


def test_foreach_batch_parquet_sink(spark, sf_small, tmp_path):
    """Production sink path: drain the event stream through foreachBatch
    into parquet (idempotent per-batch-id subdirs — the exactly-once
    pattern when the sink is not transactional) and verify the landed rows
    equal the batch table."""
    from pyspark.sql import functions as F

    from native_sql_engine_spark.catalog import load_table
    from native_sql_engine_spark.streaming import windows as SW

    out = str(tmp_path / "landed")
    ev = SW.read_events_stream(spark, sf_small).select("event_id", "event_type", "value")

    def sink(batch_df, batch_id: int) -> None:
        # per-batch-id directory + overwrite = replay-safe (a retried batch
        # rewrites its own directory instead of duplicating rows)
        batch_df.write.mode("overwrite").parquet(f"{out}/batch_id={batch_id}")

    q = (
        ev.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    landed = spark.read.parquet(out)
    batch = load_table(spark, sf_small, "events")
    assert landed.count() == batch.count()
    assert landed.select(F.sum("value")).first()[0] == pytest.approx(
        batch.select(F.sum("value")).first()[0]
    )


def test_watermark_drops_late_data(spark, tmp_path):
    """Watermark semantics end-to-end: after the watermark advances past an
    event's window, a late-arriving older event is DROPPED from the
    append-mode aggregate — the state-bounding contract every 100 TB
    streaming aggregation relies on."""
    import time as _time

    from pyspark.sql import functions as F, types as T

    src = tmp_path / "late_src"
    src.mkdir()
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("v", T.LongType())]
    )
    # batch 1: recent events advance the watermark far past 10:00
    spark.createDataFrame(
        [("2024-01-01 12:00:00", 1), ("2024-01-01 12:00:30", 1)],
        "ts string, v long",
    ).select(F.col("ts").cast("timestamp"), "v").write.parquet(str(src / "f1"))
    _time.sleep(1.1)  # distinct modification times => deterministic file order
    # batch 2: an event 2 hours older than the watermark (10-min delay budget)
    spark.createDataFrame(
        [("2024-01-01 10:00:00", 100), ("2024-01-01 12:01:00", 1)],
        "ts string, v long",
    ).select(F.col("ts").cast("timestamp"), "v").write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src) + "/*")
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.sum("v").alias("total"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("late_drop_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        r["w"]["start"].strftime("%H:%M"): r["total"]
        for r in spark.table("late_drop_sink").collect()
    }
    # the 10:00 window (late by 2h) must NOT appear; the 12:00 windows close
    # only once the watermark passes them — emitted totals exclude v=100
    assert "10:00" not in rows, f"late event leaked into the aggregate: {rows}"
    assert 100 not in rows.values()


def test_parquet_sink_exactly_once_resume(spark, sf_small, tmp_path):
    """Checkpoint-resume contract of the durable parquet sink: after run 1
    drains file A, adding file B and re-running with the SAME checkpoint
    must process ONLY B — no duplicates of A's rows, no gaps.  This is the
    crash/restart recovery path at 100 TB (same offsets + _spark_metadata
    mechanism, just a planned stop instead of a crash)."""
    import shutil

    from pyspark.sql import types as T

    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, sf_small, "events").select("event_id", "user_id", "value")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    a.coalesce(1).write.parquet(str(src / "a.parquet"))

    schema = spark.read.parquet(str(src / "a.parquet")).schema

    def run_once():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(str(src) + "/*")
        SW.run_to_parquet(
            stream.filter(F.col("value") >= 0), sink, ckpt, state_partitions=4
        )

    run_once()
    n_a = spark.read.parquet(sink).count()
    assert n_a == a.filter(F.col("value") >= 0).count()

    b.coalesce(1).write.parquet(str(src / "b.parquet"))
    run_once()  # same checkpoint: must pick up ONLY b.parquet
    out = spark.read.parquet(sink)
    expected = ev.filter(F.col("value") >= 0)
    assert out.count() == expected.count()
    # exactly-once by key: no event_id appears twice
    assert out.groupBy("event_id").count().filter(F.col("count") > 1).count() == 0


def test_python_stream_source_checkpoint_resume(spark, sf_small, tmp_path):
    """Exactly-once recovery of the custom Python streaming source: run 1 is
    stopped after the first micro-batch (offset < EOF); run 2 restarts from
    the SAME checkpoint and must resume from the committed offset — the
    final complete-mode aggregate equals the one-shot batch answer exactly
    (no chunk lost, none double-counted)."""
    import time as _t

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from native_sql_engine_spark.sources.pyds import register

    register(spark)
    path = f"{sf_small}/events.parquet"
    expected_rows = pq.ParquetFile(path).metadata.num_rows
    chunk = max(100, expected_rows // 5)
    ckpt = str(tmp_path / "ckpt")

    def start(name):
        stream = (
            spark.readStream.format("pyarrow_chunks")
            .option("path", path)
            .option("columns", "event_id,event_type")
            .option("chunk_rows", str(chunk))
            .load()
        )
        agg = stream.groupBy("event_type").agg(F.count("*").alias("n"))
        return (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start("pysrc_resume_1")
    deadline = _t.time() + 60
    while _t.time() < deadline:
        got = spark.sql("SELECT sum(n) FROM pysrc_resume_1").first()[0]
        if got and got > 0:
            break
        _t.sleep(0.1)
    q1.stop()
    partial = spark.sql("SELECT sum(n) FROM pysrc_resume_1").first()[0]
    assert 0 < partial  # stopped mid-stream or later; checkpoint holds offset

    q2 = start("pysrc_resume_2")
    deadline = _t.time() + 120
    while _t.time() < deadline:
        got = spark.sql("SELECT sum(n) FROM pysrc_resume_2").first()[0]
        if got == expected_rows:
            break
        _t.sleep(0.2)
    q2.stop()
    final = {r["event_type"]: r["n"] for r in spark.table("pysrc_resume_2").collect()}
    from native_sql_engine_spark.catalog import load_table

    batch = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_small, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert final == batch


def test_late_rows_dropped_by_watermark_metric(spark, tmp_path):
    """Pin the semantic stream_late_data_drop relies on: under a live
    trigger, rows arriving entirely below the watermark are DROPPED at the
    stateful aggregation (numRowsDroppedByWatermark > 0) and never emit."""
    import datetime as dt
    import glob
    import shutil

    on_time = spark.createDataFrame(
        [(dt.datetime(2024, 1, 2, 0, 0, 0), "a"), (dt.datetime(2024, 1, 2, 1, 0, 0), "a")],
        "ts timestamp, k string",
    )
    late = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 0, 0), "a"), (dt.datetime(2024, 1, 1, 0, 1, 0), "a")],
        "ts timestamp, k string",
    )
    indir = tmp_path / "in"
    indir.mkdir()
    on_time.coalesce(1).write.parquet(str(tmp_path / "t0"))
    late.coalesce(1).write.parquet(str(tmp_path / "t1"))
    shutil.copy(glob.glob(str(tmp_path / "t0" / "*.parquet"))[0], indir / "a0.parquet")
    stream = spark.readStream.schema("ts timestamp, k string").parquet(str(indir))
    agg = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "k")
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late_drop")
        .outputMode("append")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        shutil.copy(glob.glob(str(tmp_path / "t1" / "*.parquet"))[0], indir / "b1.parquet")
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped >= 1, [p["batchId"] for p in q.recentProgress]
    wins = [r["w"]["start"] for r in spark.table("t_late_drop").collect()]
    assert all(w.date() >= dt.date(2024, 1, 2) for w in wins), wins
