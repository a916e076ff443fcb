"""As-of / range / salted join battery vs DuckDB oracle."""

from __future__ import annotations

import pytest

from native_sql_engine_spark.compare import assert_matches_oracle
from native_sql_engine_spark.queries import extra


@pytest.mark.parametrize("name", sorted(extra.QUERIES))
def test_extra_matches_duckdb(spark, sf_small, name):
    df = extra.QUERIES[name](spark, sf_small)
    assert_matches_oracle(df, extra.ORACLE[name], sf_small, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(extra.QUERIES))
def test_extra_matches_duckdb_sf001(spark, sf_oracle, name):
    df = extra.QUERIES[name](spark, sf_oracle)
    assert_matches_oracle(df, extra.ORACLE[name], sf_oracle, name)
