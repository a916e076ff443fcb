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
