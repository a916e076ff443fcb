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
    """The self-validating agg_hll_mergeable entry reports every two-level
    sketch-union estimate within tolerance of the exact distinct count, and
    its exact companions agree with countDistinct on the same data."""
    from pyspark.sql import functions as F

    from native_sql_engine_spark.catalog import load_table

    rows = ops.QUERIES["agg_hll_mergeable"](spark, sf_small).collect()
    li = load_table(spark, sf_small, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert {r.l_returnflag for r in rows} == set(exact)
    for r in rows:
        assert r.exact_orders == exact[r.l_returnflag]
        assert r.union_within_tol is True, (r.l_returnflag, r.exact_orders)
