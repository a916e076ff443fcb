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


def test_scale_numeric_udtf_skips_non_numeric_and_propagates_nulls(spark):
    """ScaleNumeric's analyze() keeps only NumericType fields (the docstring
    contract) and eval() NULL-propagates instead of crashing on float(None);
    a string field must affect neither the plan-time schema nor runtime."""
    from native_sql_engine_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    src = spark.createDataFrame(
        [(1, "a", 2.5), (None, "b", None)], "i int, s string, d double"
    )
    src.createOrReplaceTempView("scale_mix")
    out = spark.sql(
        "SELECT t.* FROM scale_mix, LATERAL scale_numeric(struct(i, s, d)) t"
    ).collect()
    assert out[0].__fields__ == ["i_x2", "d_x2"]
    assert sorted((tuple(r) for r in out), key=str) == [(2.0, 5.0), (None, None)]
