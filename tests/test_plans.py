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
