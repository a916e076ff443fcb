"""Behavioral-analytics / CDC / distribution-stats battery vs DuckDB oracle."""

from __future__ import annotations

import pytest

from native_sql_engine_spark.compare import assert_matches_oracle
from native_sql_engine_spark.queries import analytics


@pytest.mark.parametrize("name", sorted(analytics.QUERIES))
def test_analytics_matches_duckdb(spark, sf_small, name):
    df = analytics.QUERIES[name](spark, sf_small)
    assert_matches_oracle(df, analytics.ORACLE[name], sf_small, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(analytics.QUERIES))
def test_analytics_matches_duckdb_sf001(spark, sf_oracle, name):
    df = analytics.QUERIES[name](spark, sf_oracle)
    assert_matches_oracle(df, analytics.ORACLE[name], sf_oracle, name)


def test_merge_upsert_rowlevel(spark):
    """Row-level MERGE semantics: update wins, delete removes, untouched kept."""
    from pyspark.sql import functions as F

    from native_sql_engine_spark.operators.cdc import merge_upsert

    tgt = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    src = spark.createDataFrame(
        [(2, "B", "U"), (3, None, "D"), (4, "d", "U")], ["k", "v", "op"]
    )
    out = {r["k"]: r["v"] for r in merge_upsert(tgt, src, "k").collect()}
    assert out == {1: "a", 2: "B", 4: "d"}
    # target never shuffles: plan has no Exchange on the kept branch
    plan = merge_upsert(tgt, src, "k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_asof_forward_direction(spark):
    """Forward as-of picks the smallest right_ts >= left_ts; tolerance nulls
    matches farther than the bound."""
    from pyspark.sql import functions as F

    from native_sql_engine_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 10), (1, 25), (2, 5)], ["k", "t"])
    right = spark.createDataFrame([(1, 12, "x"), (1, 30, "y"), (2, 50, "z")], ["k", "t", "v"])
    out = asof_join(
        left,
        right,
        key="k",
        left_ts="t",
        right_ts="t",
        value_cols=["v"],
        direction="forward",
        tolerance=lambda lt, rt: (rt - lt) <= 10,
    )
    got = {(r["k"], r["t"]): r["right_v"] for r in out.collect()}
    assert got == {(1, 10): "x", (1, 25): "y", (2, 5): None}


def test_pagerank_matches_dense_power_iteration(spark):
    """pagerank() agrees with a dense numpy power iteration on an asymmetric
    graph with a dangling-free node set (ground truth independent of both
    Spark and DuckDB)."""
    import numpy as np

    from native_sql_engine_spark.operators.graph import pagerank

    # 4 nodes, directed, every node has at least one outgoing edge
    e = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (2, 3)]
    edges = spark.createDataFrame(e, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}

    n, d = 4, 0.85
    out = np.zeros((n, n))
    for s, t in e:
        out[s, t] = 1.0
    p = out / out.sum(axis=1, keepdims=True)
    r = np.full(n, 1.0 / n)
    for _ in range(5):
        r = (1 - d) / n + d * (p.T @ r)
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-12, (i, got[i], r[i])


def test_triangle_count_known_graph(spark):
    """triangle_count on a hand-built graph: K4 (4 triangles) plus a
    pendant vertex and an isolated edge (0 extra triangles)."""
    from itertools import permutations

    from native_sql_engine_spark.operators.graph import triangle_count

    und = [(a, b) for a, b in permutations(range(4), 2)]  # K4, both directions
    und += [(3, 4), (4, 3), (8, 9), (9, 8)]  # pendant + isolated edge
    edges = spark.createDataFrame(und, ["src", "dst"])
    assert triangle_count(edges).first()["n_triangles"] == 4
