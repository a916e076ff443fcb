"""TPC-DS-derived battery vs DuckDB oracle (shared-SQL definition equality)."""

from __future__ import annotations

import pytest

from native_sql_engine_spark.compare import assert_matches_oracle
from native_sql_engine_spark.queries import tpcds


@pytest.mark.parametrize("name", sorted(tpcds.QUERIES))
def test_tpcds_matches_duckdb(spark, sf_small, name):
    df = tpcds.QUERIES[name](spark, sf_small)
    assert_matches_oracle(df, tpcds.ORACLE[name], sf_small, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(tpcds.QUERIES))
def test_tpcds_matches_duckdb_sf001(spark, sf_oracle, name):
    df = tpcds.QUERIES[name](spark, sf_oracle)
    assert_matches_oracle(df, tpcds.ORACLE[name], sf_oracle, name)
