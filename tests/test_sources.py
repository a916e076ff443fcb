"""Sources/sinks: round-trips, pushdown-reaches-scan assertions, URI rewrite."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from native_sql_engine_spark import sources as S
from native_sql_engine_spark.catalog import load_table


def test_uri_rewrite():
    assert S.normalize_object_store_uri("s3://b/k") == "s3a://b/k"
    assert S.normalize_object_store_uri("s3n://b/k") == "s3a://b/k"
    assert S.normalize_object_store_uri("s3a://b/k") == "s3a://b/k"
    assert S.normalize_object_store_uri("/local/path") == "/local/path"


def test_parquet_roundtrip(spark, sf_small, tmp_path):
    li = load_table(spark, sf_small, "lineitem").limit(1000)
    out = str(tmp_path / "li.parquet")
    S.write_parquet(li, out)
    back = S.read_parquet(spark, out)
    assert back.count() == 1000
    assert set(back.columns) == set(li.columns)


def test_parquet_partitioned_write_prunes(spark, sf_small, tmp_path):
    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    out = str(tmp_path / "li_part.parquet")
    S.write_parquet(li, out, partition_by=["l_returnflag"])
    back = S.read_parquet(spark, out).filter(F.col("l_returnflag") == "R")
    plan = back.queryExecution if hasattr(back, "queryExecution") else None
    explained = back._jdf.queryExecution().executedPlan().toString()
    # partition filter must be directory-level (PartitionFilters), not a scan filter
    assert "PartitionFilters" in explained
    assert back.count() == li.filter(F.col("l_returnflag") == "R").count()


def test_filter_pushdown_reaches_scan(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem").filter(F.col("l_quantity") < 5).select(
        "l_orderkey", "l_quantity"
    )
    explained = li._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in explained and "l_quantity" in explained.split(
        "PushedFilters"
    )[1].split("]")[0], "filter did not reach the parquet scan"
    # column pruning: ReadSchema carries only the 2 referenced columns
    read_schema = explained.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_comment" not in read_schema


def test_csv_roundtrip(spark, sf_small, tmp_path):
    nat = load_table(spark, sf_small, "nation")
    out = str(tmp_path / "nation.csv")
    S.write_csv(nat, out)
    back = S.read_csv(spark, out, schema=nat.schema)
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in nat.collect()
    )


def test_bucketed_join_no_shuffle(spark, sf_small):
    """Two tables bucketed on the join key must join with no Exchange —
    the co-located join that saves the dominant shuffle at 100 TB."""
    from native_sql_engine_spark.plans.inspect import executed_plan

    orders = load_table(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity")
    S.write_bucketed(orders, "t_orders_b", ["o_orderkey"], 4, sort_cols=["o_orderkey"])
    S.write_bucketed(li, "t_lineitem_b", ["l_orderkey"], 4, sort_cols=["l_orderkey"])
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force the shuffle-vs-bucket decision (broadcast would hide it on sf0.001)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("t_orders_b")
        b = spark.table("t_lineitem_b")
        joined = a.join(b, a["o_orderkey"] == b["l_orderkey"])
        plan = executed_plan(joined)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        expect = (
            load_table(spark, sf_small, "orders")
            .join(
                load_table(spark, sf_small, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_json_roundtrip(spark, sf_small, tmp_path):
    nat = load_table(spark, sf_small, "nation")
    out = str(tmp_path / "nation.json")
    S.write_json(nat, out)
    back = S.read_json(spark, out, schema=nat.schema)
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in nat.collect()
    )


def test_orc_roundtrip_and_pushdown(spark, sf_small, tmp_path):
    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    out = str(tmp_path / "li.orc")
    S.write_orc(li, out)
    back = S.read_orc(spark, out).filter(F.col("l_quantity") < 5).select(
        "l_orderkey", "l_quantity"
    )
    explained = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in explained, "filter did not reach the ORC scan"
    assert back.count() == li.filter(F.col("l_quantity") < 5).count()


def test_arrow_ipc_roundtrip(spark, sf_small, tmp_path):
    """Arrow IPC: distributed write (one file per partition) then distributed
    decode; values and schema must survive the round trip."""
    orders = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    ).repartition(3)
    out = str(tmp_path / "orders_ipc")
    written = S.write_arrow_ipc(orders, out)
    assert written == orders.count()
    import glob

    assert len(glob.glob(out + "/part-*.arrow")) == 3
    back = S.read_arrow_ipc(spark, out)
    assert back.schema == orders.schema
    assert sorted(r.o_orderkey for r in back.collect()) == sorted(
        r.o_orderkey for r in orders.collect()
    )


def test_cached_reuse(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem").groupBy("l_returnflag").count()
    c = S.cached(li)
    n1 = c.count()
    assert c.count() == n1
    c.unpersist()


def test_jsonl_corpus_quarantines_corrupt_lines(spark, tmp_path):
    """PERMISSIVE JSONL ingestion: good lines parse, malformed lines land in
    the corrupt column with the raw text preserved — one pass, no data loss."""
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": 2, "text": "ok"}\n'
        "{broken json line\n"
        '{"doc_id": "not-a-number", "text": "drifted"}\n'
    )
    # cache before splitting: Spark disallows scans pruned to only the
    # corrupt column (see read_jsonl_corpus docstring)
    df = S.read_jsonl_corpus(spark, str(p), "doc_id bigint, text string").cache()
    rows = {r["doc_id"]: r for r in df.collect()}
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2 and bad.count() == 2
    assert rows[1]["text"] == "hello world"
    # the quarantined rows keep the raw line for forensics/replay
    raw = [r["_corrupt_record"] for r in bad.collect()]
    assert any("broken json line" in s for s in raw)
    assert any("not-a-number" in s for s in raw)


def test_zorder_write_narrows_per_file_ranges(spark, sf_small, tmp_path):
    """Z-order clustering: per-file min-max spread on BOTH z-columns must be
    far narrower than an unclustered layout — that spread is exactly what
    parquet min-max skipping prunes on."""
    from native_sql_engine_spark.operators.layout import write_parquet_zordered

    orders = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    plain, zpath = str(tmp_path / "plain"), str(tmp_path / "zorder")
    orders.repartition(8).write.parquet(plain)
    write_parquet_zordered(orders, zpath, ["o_custkey", "o_totalprice"], num_files=8)

    def avg_spread(path, col):
        df = spark.read.parquet(path).select(
            F.input_file_name().alias("f"), F.col(col)
        )
        per_file = df.groupBy("f").agg((F.max(col) - F.min(col)).alias("spread"))
        return per_file.agg(F.avg("spread")).first()[0]

    for col in ["o_custkey", "o_totalprice"]:
        assert avg_spread(zpath, col) < 0.6 * avg_spread(plain, col), col

    # clustering is a layout change only — content identical
    assert (
        spark.read.parquet(zpath).orderBy("o_orderkey").collect()
        == orders.orderBy("o_orderkey").collect()
    )


def test_compact_parquet_merges_small_files(spark, sf_small, tmp_path):
    """Compaction sizes output from on-disk bytes: a 16-file shredded
    dataset collapses to 1 file (tiny data, 128MB target), content equal,
    no shuffle (coalesce)."""
    import glob

    orders = load_table(spark, sf_small, "orders")
    shredded = str(tmp_path / "shredded")
    compacted = str(tmp_path / "compacted")
    orders.repartition(16).write.parquet(shredded)
    assert len(glob.glob(shredded + "/part-*.parquet")) == 16
    n = S.compact_parquet(spark, shredded, compacted)
    assert n == 1
    assert len(glob.glob(compacted + "/part-*.parquet")) == 1
    assert spark.read.parquet(compacted).count() == orders.count()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """mergeSchema read over shards written at different schema versions:
    the unified schema carries the superset, missing columns read as NULL —
    how a long-lived 100 TB dataset absorbs additive schema drift."""
    base = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id bigint, v string").write.parquet(base + "/day=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, v string, score double"
    ).write.parquet(base + "/day=2")
    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) == {"id", "v", "score", "day"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


def test_bucketed_aggregation_no_shuffle(spark, sf_small):
    """groupBy on the bucket key of a bucketed table must aggregate with no
    Exchange — bucketing pre-partitions for aggregation exactly as it does
    for joins (the other half of the co-location story at 100 TB)."""
    from native_sql_engine_spark.plans.inspect import executed_plan

    orders = load_table(spark, sf_small, "orders").select("o_custkey", "o_totalprice")
    S.write_bucketed(orders, "t_orders_agg_b", ["o_custkey"], 4)
    try:
        agg = (
            spark.table("t_orders_agg_b")
            .groupBy("o_custkey")
            .agg(F.sum("o_totalprice").alias("s"))
        )
        plan = executed_plan(agg)
        assert "Exchange" not in plan, f"bucketed aggregation still shuffles:\n{plan}"
        assert agg.count() == orders.select("o_custkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_agg_b")


def test_python_datasource_row_group_partitions(spark, tmp_path):
    """The custom Python DataSource plans one InputPartition per parquet
    row group (task granularity = row group, same as the built-in reader)
    and round-trips values exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from native_sql_engine_spark.sources.pyds import register

    path = str(tmp_path / "multi_rg.parquet")
    tbl = pa.table({"k": list(range(3000)), "v": [float(i) * 0.5 for i in range(3000)]})
    pq.write_table(tbl, path, row_group_size=1000)
    assert pq.ParquetFile(path).num_row_groups == 3

    register(spark)
    df = spark.read.format("pyarrow_parquet").option("path", path).load()
    assert df.rdd.getNumPartitions() == 3
    got = df.agg(
        F.count("*").alias("n"), F.sum("k").alias("sk"), F.sum("v").alias("sv")
    ).first()
    assert (got.n, got.sk, got.sv) == (3000, sum(range(3000)), sum(range(3000)) * 0.5)


def test_python_datasource_writer_commit_protocol(spark, sf_small, tmp_path):
    """The custom Python DataSource's arrow writer stages files under
    _temporary/ and only the driver commit renames them into place with a
    _SUCCESS marker — round-trip through the custom writer + custom reader
    preserves every value."""
    import os

    from pyspark.sql import functions as F

    from native_sql_engine_spark.catalog import load_table
    from native_sql_engine_spark.sources.pyds import register

    register(spark)
    out = str(tmp_path / "pyds_out")
    src = load_table(spark, sf_small, "nation")
    src.write.format("pyarrow_parquet").option("path", out).mode("append").save()
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not os.path.exists(os.path.join(out, "_temporary"))

    back = spark.read.format("pyarrow_parquet").option("path", out).load()
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_python_datasource_writer_abort_cleans_staging(spark, tmp_path):
    """A failing write job must leave NO committed files: staged parts are
    confined to _temporary/, abort removes them, and _SUCCESS is never
    written — the commit protocol's whole point."""
    import os

    import pytest as _pytest

    from native_sql_engine_spark.sources.pyds import register

    register(spark)
    out = str(tmp_path / "pyds_abort")

    def boom(it):
        for pdf in it:
            raise RuntimeError("injected task failure")
            yield pdf

    src = spark.range(100).mapInPandas(boom, "id long")
    with _pytest.raises(Exception):
        src.write.format("pyarrow_parquet").option("path", out).mode("append").save()
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not any(
        f.endswith(".parquet") for f in os.listdir(out)
    ) if os.path.exists(out) else True


def test_bucket_pruning_point_lookup(spark, sf_small):
    """A point predicate on the bucket column must scan ONE bucket
    (SelectedBucketsCount 1 out of N) — at 100 TB a keyed lookup on a
    bucketed table reads 1/N of the files before any row-group pruning."""
    import re
    import shutil
    from urllib.parse import urlparse

    from native_sql_engine_spark.plans.inspect import executed_plan

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    spark.sql("DROP TABLE IF EXISTS t_orders_bp")
    shutil.rmtree(f"{warehouse}/t_orders_bp", ignore_errors=True)
    orders = load_table(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    S.write_bucketed(orders, "t_orders_bp", ["o_orderkey"], 8)
    # autoBucketedScan drops the bucketed layout for scan-only plans (no
    # join/agg wants the distribution) and with it the bucket PRUNE — pin
    # it off so the filter-driven prune is visible.
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = spark.table("t_orders_bp").filter(F.col("o_orderkey") == 7)
        plan = executed_plan(df)
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, f"no bucket pruning in plan:\n{plan}"
        assert m.group(1) == "1" and m.group(2) == "8", plan
        assert df.count() == orders.filter(F.col("o_orderkey") == 7).count()
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_bp")
        shutil.rmtree(f"{warehouse}/t_orders_bp", ignore_errors=True)


def test_python_datasource_overwrite_replaces(spark, tmp_path):
    """mode('overwrite') must leave ONLY the new write's rows — pre-existing
    part files are cleared in commit(), never merged with the new data."""
    from native_sql_engine_spark.sources.pyds import register

    register(spark)
    out = str(tmp_path / "pyds_overwrite")
    spark.range(5).selectExpr("id", "id * 2 AS v").write.format(
        "pyarrow_parquet"
    ).option("path", out).mode("append").save()
    spark.range(3).selectExpr("id", "id * 10 AS v").write.format(
        "pyarrow_parquet"
    ).option("path", out).mode("overwrite").save()

    back = spark.read.format("pyarrow_parquet").option("path", out).load()
    assert back.count() == 3
    assert back.agg({"v": "max"}).collect()[0][0] == 20
    # append after overwrite composes
    spark.range(2).selectExpr("id + 100 AS id", "id AS v").write.format(
        "pyarrow_parquet"
    ).option("path", out).mode("append").save()
    assert spark.read.format("pyarrow_parquet").option("path", out).load().count() == 5
