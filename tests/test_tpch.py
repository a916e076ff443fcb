"""TPC-H battery vs DuckDB oracle (reference gate: TPCHSuite.scala:42-100)."""

from __future__ import annotations

import pytest

from native_sql_engine_spark.compare import assert_matches_oracle
from native_sql_engine_spark.queries import tpch


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_matches_duckdb(spark, sf_small, name):
    df = tpch.QUERIES[name](spark, sf_small)
    assert_matches_oracle(df, tpch.ORACLE[name], sf_small, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_matches_duckdb_sf001(spark, sf_oracle, name):
    df = tpch.QUERIES[name](spark, sf_oracle)
    assert_matches_oracle(df, tpch.ORACLE[name], sf_oracle, name)
