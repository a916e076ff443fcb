"""Operator battery vs DuckDB oracle (reference model:
NativeSQLConvertedSuite.scala checkAnswer-style golden tests)."""

from __future__ import annotations

import pytest

from native_sql_engine_spark.compare import assert_matches_oracle
from native_sql_engine_spark.queries import ops


@pytest.mark.parametrize("name", sorted(ops.ORACLE))
def test_ops_matches_duckdb(spark, sf_small, name):
    df = ops.QUERIES[name](spark, sf_small)
    assert_matches_oracle(df, ops.ORACLE[name], sf_small, name)


@pytest.mark.parametrize("name", sorted(set(ops.QUERIES) - set(ops.ORACLE)))
def test_ops_rows_only(spark, sf_small, name):
    """Queries without an oracle (approx/sketch ops): schema + rows sanity."""
    df = ops.QUERIES[name](spark, sf_small)
    rows = df.collect()
    assert df.schema.fields
    assert len(rows) >= 0


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(ops.ORACLE))
def test_ops_matches_duckdb_sf001(spark, sf_oracle, name):
    df = ops.QUERIES[name](spark, sf_oracle)
    assert_matches_oracle(df, ops.ORACLE[name], sf_oracle, name)


def test_hll_sketch_estimates_near_exact(spark, sf_small):
    """Mergeable-HLL estimates stay within 2% of exact distinct counts
    (ground truth via countDistinct on the same data)."""
    from pyspark.sql import functions as F

    from native_sql_engine_spark.catalog import load_table

    got = {
        r.l_returnflag: r.approx_orders
        for r in ops.QUERIES["agg_hll_mergeable"](spark, sf_small).collect()
    }
    li = load_table(spark, sf_small, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for flag, est in got.items():
        assert abs(est - exact[flag]) / exact[flag] < 0.02, (flag, est, exact[flag])
