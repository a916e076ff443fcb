"""Pandas-UDF battery vs DuckDB oracle (Arrow transport losslessness)."""

from __future__ import annotations

import pytest

from native_sql_engine_spark.compare import assert_matches_oracle
from native_sql_engine_spark.queries import udf


@pytest.mark.parametrize("name", sorted(udf.QUERIES))
def test_udf_matches_duckdb(spark, sf_small, name):
    df = udf.QUERIES[name](spark, sf_small)
    assert_matches_oracle(df, udf.ORACLE[name], sf_small, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(udf.QUERIES))
def test_udf_matches_duckdb_sf001(spark, sf_oracle, name):
    df = udf.QUERIES[name](spark, sf_oracle)
    assert_matches_oracle(df, udf.ORACLE[name], sf_oracle, name)
