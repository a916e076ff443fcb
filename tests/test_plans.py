"""Plan-shape assertions: the declared capability matrix, checked in the
optimizer's output (pushdown, pruning, join strategy, codegen spans)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from native_sql_engine_spark import plans as P
from native_sql_engine_spark.catalog import load_table
from native_sql_engine_spark.operators.joins import join


def test_pushdown_and_pruning(spark, sf_small):
    li = (
        load_table(spark, sf_small, "lineitem")
        .filter(F.col("l_quantity") < 5)
        .select("l_orderkey", "l_quantity")
    )
    P.assert_scan_pruned(
        li,
        must_read=["l_orderkey", "l_quantity"],
        must_not_read=["l_comment", "l_extendedprice"],
        must_push=["l_quantity"],
    )


def test_join_strategies_materialize(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    cust = load_table(spark, sf_small, "customer")
    cond = [F.col("o_custkey") == F.col("c_custkey")]
    assert P.has_node(join(orders, cust, cond, "inner", "broadcast"), "BroadcastHashJoin")
    assert P.has_node(join(orders, cust, cond, "inner", "shuffle_hash"), "ShuffledHashJoin")
    assert P.has_node(join(orders, cust, cond, "inner", "sort_merge"), "SortMergeJoin")


def test_hash_aggregate_chosen(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    assert P.has_node(agg, "HashAggregate")


def test_codegen_covers_filter_project(spark, sf_small):
    li = (
        load_table(spark, sf_small, "lineitem")
        .filter(F.col("l_quantity") < 10)
        .select((F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
    )
    assert P.wholestage_span_count(li) >= 1


def test_null_aware_anti_join_plan(spark, sf_small):
    spark.sql(
        f"create or replace temp view _c as select * from parquet.`{sf_small}/customer.parquet`"
    )
    spark.sql(
        f"create or replace temp view _o as select * from parquet.`{sf_small}/orders.parquet`"
    )
    df = spark.sql(
        "select c_custkey from _c where c_custkey not in (select o_custkey from _o)"
    )
    plan = P.executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "NullAwareAnti" in plan or "LeftAnti" in plan


def test_theta_join_plans_as_bnlj(spark, sf_small):
    """A pure non-equi join against a tiny broadcast side must plan as
    BroadcastNestedLoopJoin — no shuffle on the fact side."""
    from native_sql_engine_spark.queries.ops import QUERIES

    df = QUERIES["join_theta_bnlj"](spark, sf_small)
    assert P.has_node(df, "BroadcastNestedLoopJoin")
    assert not P.has_node(df, "SortMergeJoin")


def test_gapfill_grid_broadcasts(spark, sf_small):
    """The dense calendar grid is |segments|x|days| — it must reach the fact
    aggregate via a broadcast join, never a shuffled one."""
    from native_sql_engine_spark.queries.extra import QUERIES

    df = QUERIES["timeseries_gapfill"](spark, sf_small)
    assert P.has_node(df, "BroadcastHashJoin") or P.has_node(
        df, "BroadcastNestedLoopJoin"
    )


def test_stratified_sample_is_scan_predicate(spark, sf_small):
    """The md5-bucket sample filter must sit map-side (a Filter over the
    scan), introducing no exchange before the per-stratum aggregate."""
    from native_sql_engine_spark.queries.pipeline import QUERIES

    df = QUERIES["sample_stratified"](spark, sf_small)
    plan = P.executed_plan(df)
    agg_shuffles = plan.count("Exchange")
    # exactly: one shuffle for the groupBy('lang') + the final orderBy range
    # exchange; the sample filter itself must add none
    assert agg_shuffles <= 2, plan


def test_new_tpcds_shapes_broadcast_dims(spark, sf_small):
    """Full-set TPC-DS shapes: dimension joins must be broadcast at small
    dim sizes (no shuffled join of a fact against a broadcastable dim), and
    no plan may degrade to a cartesian product."""
    from native_sql_engine_spark.catalog import register_tables
    from native_sql_engine_spark.queries.tpcds import QUERIES

    register_tables(spark, sf_small)
    for name in ("tpcds_q1", "tpcds_q47", "tpcds_q70", "tpcds_q95"):
        df = QUERIES[name](spark, sf_small)
        plan = P.executed_plan(df)
        assert plan.count("BroadcastHashJoin") >= 1, name
        assert "CartesianProduct" not in plan, name


def test_q70_rollup_uses_expand(spark, sf_small):
    """ROLLUP must plan as one Expand pass (ColumnarExpandExec parity,
    SURVEY 2.4), not a union of per-level aggregates."""
    from native_sql_engine_spark.catalog import register_tables
    from native_sql_engine_spark.queries.tpcds import QUERIES

    register_tables(spark, sf_small)
    df = QUERIES["tpcds_q70"](spark, sf_small)
    assert P.has_node(df, "Expand")


def test_lateral_topk_decorrelates_to_window(spark, sf_small):
    """The LATERAL LIMIT subquery must decorrelate into a ranked window
    (one shuffle of orders), never a per-customer nested loop."""
    from native_sql_engine_spark.catalog import register_tables

    register_tables(spark, sf_small)
    from native_sql_engine_spark.queries.ops import ORACLE

    df = spark.sql(ORACLE["join_lateral_topk"])
    plan = P.executed_plan(df)
    assert "Window" in plan, plan
    assert "CartesianProduct" not in plan


def test_dynamic_partition_pruning(spark, sf_small, tmp_path):
    """A partitioned fact joined to a selectively-filtered dim must carry a
    dynamicpruning expression in its PartitionFilters — at 100 TB this is
    what turns a full-table scan into a few-partition scan when the filter
    lives on the dimension."""
    import re

    from native_sql_engine_spark.catalog import load_table

    fact_path = str(tmp_path / "orders_part")
    dim_path = str(tmp_path / "years_dim")
    (
        load_table(spark, sf_small, "orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .write.partitionBy("o_year")
        .parquet(fact_path)
    )
    spark.createDataFrame(
        [(y, f"era_{y % 2}") for y in range(1995, 2002)], "d_year int, era string"
    ).write.parquet(dim_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("era") == "era_0")
    j = fact.join(dim, fact["o_year"] == dim["d_year"]).groupBy("era").count()
    plan = P.executed_plan(j)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "dynamicpruning" in m.group(1).lower(), plan


def test_contamination_broadcasts_eval_side(spark, sf_small):
    """The eval n-gram set must broadcast (no sort-merge join at corpus
    scale) and the join key must be the xxhash64'd gram, not the string."""
    from native_sql_engine_spark.operators.text import ngram_contamination

    docs = load_table(spark, sf_small, "documents")
    out = ngram_contamination(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "doc_id", "text", n=8,
    )
    plan = P.executed_plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "xxhash64" in plan


def test_repetition_and_chunking_are_shuffle_free(spark, sf_small):
    """Per-document array expressions must not introduce an Exchange."""
    from native_sql_engine_spark.operators.text import chunk_documents, repetition_stats

    docs = load_table(spark, sf_small, "documents")
    assert "Exchange" not in P.executed_plan(
        repetition_stats(docs, "doc_id", "text")
    )
    assert "Exchange" not in P.executed_plan(
        chunk_documents(docs, "doc_id", "text", size=32, stride=24)
    )


def test_quantize_stats_broadcast_back(spark, sf_small):
    """Pass 2 of int8 quantization joins the per-dimension stats via
    broadcast; the only wide shuffles are the two hash aggregates."""
    from native_sql_engine_spark.operators.similarity import quantize_int8

    emb = load_table(spark, sf_small, "embeddings")
    plan = P.executed_plan(quantize_int8(emb, "vec_id", "embedding"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_round2c_tpcds_shapes_plan_quality(spark, sf_small):
    """Round-2 full-set shapes: dims broadcast, ROLLUP expands, FULL OUTER
    merges — and nothing degrades to a cartesian product."""
    from native_sql_engine_spark.catalog import register_tables
    from native_sql_engine_spark.queries.tpcds import QUERIES

    register_tables(spark, sf_small)
    # q24: CTE threshold — dims broadcast under the aggregate
    plan = P.executed_plan(QUERIES["tpcds_q24"](spark, sf_small))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    # q8: IN-over-INTERSECT plans as (semi) joins, not a product
    plan = P.executed_plan(QUERIES["tpcds_q8"](spark, sf_small))
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan
    # q77: channel report keeps the ROLLUP Expand and a FullOuter merge
    plan = P.executed_plan(QUERIES["tpcds_q77"](spark, sf_small))
    assert "Expand" in plan
    assert "FullOuter" in plan
    # q86: grouping-level rank — Expand for ROLLUP + a Window over it
    plan = P.executed_plan(QUERIES["tpcds_q86"](spark, sf_small))
    assert "Expand" in plan and "Window" in plan


def test_q40_returns_leg_aggregates_before_join(spark, sf_small):
    """q40/q78/q80 family: the returns side is pre-aggregated to its join
    key before the LEFT JOIN (shuffle carries one row per (order, part),
    not every return line) — the plan must show an aggregate below the
    outer join."""
    from native_sql_engine_spark.catalog import register_tables
    from native_sql_engine_spark.queries.tpcds import QUERIES

    register_tables(spark, sf_small)
    df = QUERIES["tpcds_q40"](spark, sf_small)
    plan = P.executed_plan(df)
    assert "LeftOuter" in plan
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan


def test_mix_rebalance_broadcasts_rates(spark, sf_small):
    """corpus_mix_rebalance: per-class rates join back as a broadcast; the
    corpus side is filtered in place (no corpus-wide Exchange below the
    join)."""
    from native_sql_engine_spark.catalog import load_table
    from native_sql_engine_spark.operators.text import rebalance_mix

    docs = load_table(spark, sf_small, "documents")
    kept = rebalance_mix(docs, "doc_id", "lang", {"en": 0.3, "de": 0.2})
    plan = P.executed_plan(kept)
    assert "BroadcastHashJoin" in plan


def test_aqe_splits_skewed_join(spark):
    """AQE skew handling end-to-end: a join where 95% of probe rows share
    one key must show skew-split partitions in the final adaptive plan —
    the runtime repair the reference implements as
    ColumnarCustomShuffleReaderExec (SURVEY §2.9)."""
    from pyspark.sql import functions as F

    conf = {
        # force the skew path to be observable on toy data
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        probe = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pay"),
        )
        build = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        joined = probe.join(build, "k")
        # collect() on the SAME DataFrame whose plan we inspect — count()
        # would execute a different query and leave this one un-finalized
        rows = joined.collect()
        # hot key 7 matches every id%20!=0 row (190000); the 10000 distinct
        # keys id%20==0 match only those < 1000 (50 of them)
        assert len(rows) == 190_000 + 50
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE did not split the skewed partition:\n{plan[:2000]}"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_knn_join_lsh_has_no_cross_product(spark, sf_small):
    """The LSH k-NN join's whole point is avoiding the exact join's cross
    product — pin it: candidates come from a shuffle equi-join on
    (table, bucket), never a Cartesian/BNLJ."""
    from native_sql_engine_spark.operators import similarity as S

    emb = load_table(spark, sf_small, "embeddings")
    left = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("left_id"), "embedding")
    right = emb.select(F.col("vec_id").alias("right_id"), "embedding")
    out = S.knn_join_lsh(left, right, 3, "left_id", "right_id")
    plan = P.executed_plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_embedding_lsh_no_driver_collect_plan(spark, sf_small):
    """The distributed embedding-dedup path must be a pure distributed plan:
    bucket explode (mapInPandas) → per-bucket kernel (FlatMapGroupsInPandas)
    — no Cartesian stage, no local (driver-side) relation of the corpus."""
    from native_sql_engine_spark.operators import dedup as D

    emb = load_table(spark, sf_small, "embeddings")
    out = D.embedding_neardup_pairs_lsh(emb, "vec_id", "embedding", threshold=0.45)
    plan = P.executed_plan(out)
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "LocalTableScan" not in plan


def test_salted_join_spreads_hot_key(spark, sf_small):
    """The deterministic whole-row salt must (a) leave the join result
    row-identical to the plain join and (b) spread a hot key's probe rows
    over multiple salt values (a key-derived or constant salt would pass
    (a) but concentrate the hot key on one reducer)."""
    from native_sql_engine_spark.operators.skew import salted_join

    ev = load_table(spark, sf_small, "events").select("user_id", "value")
    cust = load_table(spark, sf_small, "customer").select(
        F.col("c_custkey").alias("ck"), "c_mktsegment"
    )
    plain = ev.join(cust, ev.user_id == cust.ck).groupBy("c_mktsegment").count()
    salted = (
        salted_join(ev, cust, "user_id", "ck", salt=8).groupBy("c_mktsegment").count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    hot = ev.groupBy("user_id").count().orderBy(F.col("count").desc()).first()
    spread = (
        ev.filter(F.col("user_id") == hot.user_id)
        .select(F.pmod(F.hash("user_id", "value", F.lit("salt")), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert spread > 1, "hot key's rows must land in multiple salt buckets"


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_small):
    """A selectively-filtered dim side of a shuffle join injects a
    bloom_filter_might_contain runtime filter on the fact side — at 100 TB
    this drops most fact rows before the shuffle instead of after it.
    Thresholds are lowered to make the sf0.001 harness eligible; on a real
    cluster the defaults (10 MB creation side / 10 GB application side)
    gate it to where it pays."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_small, "lineitem")
        part = load_table(spark, sf_small, "part").filter(F.col("p_size") == 1)
        j = li.join(part, F.col("l_partkey") == F.col("p_partkey")).groupBy("p_brand").count()
        plan = P.executed_plan(j)
        assert "might_contain" in plan.lower(), plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_pandas_window_udf_plans_arrow_native(spark, sf_small):
    """A grouped-agg pandas UDF with a Window spec must plan as
    ArrowWindowPython (Spark 4's Arrow-batched successor of
    WindowInPandasExec, reference operators.md row 27) — not fall back to
    a row-at-a-time python eval."""
    from native_sql_engine_spark.queries.udf import QUERIES

    df = QUERIES["udf_window_in_pandas"](spark, sf_small)
    assert "ArrowWindowPython" in P.executed_plan(df)


def test_sql_hints_reach_the_planner(spark, sf_small):
    """Query hints must actually steer the physical plan: BROADCAST forces
    a broadcast join on the hinted side, REPARTITION pins the output
    partition count, and MERGE forces sort-merge — the knobs a user turns
    when AQE's default choice is wrong for a known workload."""
    from native_sql_engine_spark.catalog import register_tables

    register_tables(spark, sf_small)
    b = spark.sql(
        "SELECT /*+ BROADCAST(n) */ r.r_name, count(*) AS c "
        "FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey "
        "GROUP BY r.r_name"
    )
    assert P.has_node(b, "BroadcastHashJoin")
    m = spark.sql(
        "SELECT /*+ MERGE(n) */ r.r_name, n.n_name "
        "FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey"
    )
    assert P.has_node(m, "SortMergeJoin")
    rep = spark.sql("SELECT /*+ REPARTITION(7) */ n_nationkey FROM nation")
    assert rep.rdd.getNumPartitions() == 7


def test_salted_join_spreads_duplicate_probe_rows(spark):
    """Exact-duplicate probe rows (same row hash) share a bucket on the
    default retry-safe content-hash salt; ``spread_duplicates=True`` must
    spread them deterministically AND stay row-identical to the plain join."""
    from pyspark.sql import functions as F

    from native_sql_engine_spark.operators.skew import salted_join

    # 4000 IDENTICAL rows of one hot key, spread over 8 input partitions
    probe = (
        spark.range(4000)
        .repartition(8)
        .select(F.lit(7).alias("k"), F.lit("same").alias("payload"))
    )
    build = spark.createDataFrame([(7, "dim")], ["bk", "attr"])
    out = salted_join(probe, build, "k", "bk", salt=8)
    assert out.count() == 4000  # row-identical to the unsalted join

    # default salt is content-only: placement-independent (retry-safe), so
    # identical duplicates intentionally land in ONE bucket
    salted = probe.withColumn(
        "_salt_p",
        F.pmod(F.hash(*probe.columns, F.lit("salt")), F.lit(8)).cast("int"),
    )
    assert salted.select("_salt_p").distinct().count() == 1

    # spread_duplicates pre-aggregates and salts on a deterministic
    # per-duplicate index — spreads the identical-row hot key over buckets
    out2 = salted_join(probe, build, "k", "bk", salt=8, spread_duplicates=True)
    assert out2.count() == 4000
    spread = (
        probe.groupBy(*probe.columns)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.col("n") - 1)))
        .withColumn(
            "_salt_p",
            F.pmod(F.hash(*probe.columns, F.col("i"), F.lit("salt")), F.lit(8)).cast(
                "int"
            ),
        )
    )
    assert spread.select("_salt_p").distinct().count() > 1


def test_exchange_cache_entries_plan_shapes(spark, sf_small):
    """The round-6 §2.2/§2.9/§2.1 driver entries must actually plan their
    claimed operators: cache_columnar_reuse reuses one InMemoryTableScan
    from two consumers; exchange_range_partition plans a rangepartitioning
    exchange; exchange_coalesce keeps a single-partition output."""
    from native_sql_engine_spark.queries import ops

    cached = ops.QUERIES["cache_columnar_reuse"](spark, sf_small)
    plan = cached._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2

    ranged = ops.QUERIES["exchange_range_partition"](spark, sf_small)
    rplan = ranged._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in rplan.lower()

    coalesced = ops.QUERIES["exchange_coalesce"](spark, sf_small)
    assert coalesced.first()["n_parts"] == 1


def test_web_entries_stay_jvm_side(spark, sf_small):
    """web_html_extract / web_url_normalize promise expression-only
    execution: no Python evaluation operator anywhere in the plan, and no
    Exchange before the final global sort (the stripping chain pipelines
    into the scan)."""
    from native_sql_engine_spark.queries import pipeline

    for name in ("web_html_extract", "web_url_normalize"):
        df = pipeline.QUERIES[name](spark, sf_small)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "MapInPandas" not in plan, name
        # exactly the sort's range-partitioning exchange, nothing else
        # (WSCG spans only materialize in the AQE final plan, so the
        # positive assertion here is the absence of Python operators)
        assert plan.count("Exchange") <= 1, name


def test_connected_components_plan_stays_flat_across_rounds(spark):
    """Iterative CC references the previous labels TWICE per round (neighbor
    join + pointer jump), so a persist-only loop DOUBLES the logical tree
    per round — a ~12-round chain graph made every downstream plan-string
    generation (Spark UI description) effectively hang (round-6 suite
    stall, 40 min in AdaptiveSparkPlanExec.generateTreeString).  After the
    localCheckpoint fix the final plan must be a leaf-sized tree, and a
    long chain must label correctly through the distributed path."""
    from native_sql_engine_spark.operators import dedup

    edges = [(i, i + 1) for i in range(300)]  # chain: ~8 path-halving rounds
    df = spark.createDataFrame(edges, ["a_id", "b_id"])
    saved = dedup.SMALL_GRAPH_EDGES
    try:
        dedup.SMALL_GRAPH_EDGES = 0  # force the distributed rounds
        out = dedup.connected_components(df)
        rows = out.collect()
    finally:
        dedup.SMALL_GRAPH_EDGES = saved
    assert len(rows) == 301 and all(r.component == 0 for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < 2000, f"plan re-expanded: {len(plan)} chars"
