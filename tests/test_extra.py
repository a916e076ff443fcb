"""As-of / range / salted join battery vs DuckDB oracle."""

from __future__ import annotations

import pytest

from native_sql_engine_spark.compare import assert_matches_oracle
from native_sql_engine_spark.queries import extra


@pytest.mark.parametrize("name", sorted(extra.QUERIES))
def test_extra_matches_duckdb(spark, sf_small, name):
    if name not in extra.ORACLE:
        pytest.skip("rows-only query (exact test elsewhere in this file)")
    df = extra.QUERIES[name](spark, sf_small)
    assert_matches_oracle(df, extra.ORACLE[name], sf_small, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(extra.QUERIES))
def test_extra_matches_duckdb_sf001(spark, sf_oracle, name):
    if name not in extra.ORACLE:
        pytest.skip("rows-only query (exact test elsewhere in this file)")
    df = extra.QUERIES[name](spark, sf_oracle)
    assert_matches_oracle(df, extra.ORACLE[name], sf_oracle, name)


def test_ewma_matches_pandas(spark, sf_small):
    """Distributed EWMA ≡ pandas ewm on the same series, per key."""
    import pandas as pd

    from pyspark.sql import functions as F

    from native_sql_engine_spark.catalog import load_table
    from native_sql_engine_spark.operators.temporal import ewma

    ev = (
        load_table(spark, sf_small, "events")
        .filter(F.col("user_id") < 50)
        .select("user_id", "ts", "event_id", "value")
    )
    got = ewma(ev, "user_id", "ts", "value", alpha=0.3).toPandas()
    pdf = ev.toPandas()
    want = (
        pdf.sort_values("ts", kind="stable")
        .groupby("user_id", group_keys=False)
        .apply(lambda g: g.assign(ewma=g["value"].ewm(alpha=0.3, adjust=True).mean()))
    )
    g = got.sort_values("event_id")[["event_id", "ewma"]].reset_index(drop=True)
    w = want.sort_values("event_id")[["event_id", "ewma"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_exact=False, rtol=1e-12)
