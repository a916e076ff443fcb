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


_A_VARIANT_PAIRS = [
    ("tpcds_q10a", "tpcds_q10"),
    ("tpcds_q22a", "tpcds_q22"),
    ("tpcds_q27a", "tpcds_q27"),
    ("tpcds_q35a", "tpcds_q35"),
    ("tpcds_q36a", "tpcds_q36"),
    ("tpcds_q67a", "tpcds_q67"),
    ("tpcds_q5a", "tpcds_q5"),
    ("tpcds_q14a", "tpcds_q14"),
    ("tpcds_q18a", "tpcds_q18"),
    ("tpcds_q51a", "tpcds_q51"),
    ("tpcds_q77a", "tpcds_q77"),
    ("tpcds_q80a", "tpcds_q80"),
    ("tpcds_q70a", "tpcds_q70"),
    ("tpcds_q86a", "tpcds_q86"),
]


@pytest.mark.parametrize("variant,base", _A_VARIANT_PAIRS)
def test_v27_a_variant_equals_base(spark, sf_small, variant, base):
    """tpcds-v2.7.0 'a' rewrites (ROLLUP -> union of levels, OR-EXISTS ->
    IN-over-UNION) must return row-identical results to the base shape —
    two plan formulations cross-checking each other."""
    from native_sql_engine_spark.compare import normalize

    a = normalize(tpcds.QUERIES[variant](spark, sf_small).toPandas())
    b = normalize(tpcds.QUERIES[base](spark, sf_small).toPandas())
    assert a == b
