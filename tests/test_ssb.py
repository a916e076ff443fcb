"""SSB battery vs DuckDB oracle (reference: resources/ssb/*.sql)."""

from __future__ import annotations

import pytest

from native_sql_engine_spark.compare import assert_matches_oracle
from native_sql_engine_spark.queries import ssb


@pytest.mark.parametrize("name", sorted(ssb.QUERIES))
def test_ssb_matches_duckdb(spark, sf_small, name):
    df = ssb.QUERIES[name](spark, sf_small)
    assert_matches_oracle(df, ssb.ORACLE[name], sf_small, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(ssb.QUERIES))
def test_ssb_matches_duckdb_sf001(spark, sf_oracle, name):
    df = ssb.QUERIES[name](spark, sf_oracle)
    assert_matches_oracle(df, ssb.ORACLE[name], sf_oracle, name)
