"""Scale-infrastructure battery (zone maps, sketches, interval joins,
skew profiling, collation) vs DuckDB oracle."""

from __future__ import annotations

import pytest

from native_sql_engine_spark.compare import assert_matches_oracle
from native_sql_engine_spark.queries import advanced


@pytest.mark.parametrize("name", sorted(advanced.QUERIES))
def test_advanced_matches_duckdb(spark, sf_small, name):
    df = advanced.QUERIES[name](spark, sf_small)
    assert_matches_oracle(df, advanced.ORACLE[name], sf_small, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(advanced.QUERIES))
def test_advanced_matches_duckdb_sf001(spark, sf_oracle, name):
    df = advanced.QUERIES[name](spark, sf_oracle)
    assert_matches_oracle(df, advanced.ORACLE[name], sf_oracle, name)


def test_zonemap_prunes_most_files(spark, sf_small):
    """The one-month predicate must actually prune: scanned ≪ total files."""
    row = advanced.QUERIES["index_zonemap_pruning"](spark, sf_small).first()
    assert row.files_total > 20
    assert row.files_scanned <= 6
    assert row.files_pruned == row.files_total - row.files_scanned
    assert row.n_rows > 0


def test_count_min_never_undercounts(spark, sf_small):
    """CMS invariant: estimate >= true count for every probed key."""
    rows = advanced.QUERIES["sketch_count_min"](spark, sf_small).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.est_cnt >= r.true_cnt
        assert r.overcount == r.est_cnt - r.true_cnt
