"""Plan-stability goldens — the engine's analog of the reference's
`tpcds-plan-stability/` snapshot files (SURVEY §5.4).

Every TPC-H / TPC-DS / SSB query's strategy-level physical-plan signature
(join algorithms, aggregate kinds, Expand/Window/Exchange counts) is
committed in `plan_golden/signatures.json`.  A diff means the optimizer
picked a different strategy than the one reviewed for 100 TB — a broadcast
degrading to sort-merge, an extra shuffle appearing — and must be either
fixed or deliberately re-blessed.

Re-bless after an intentional change:
    SPARK_GRAFT_BLESS_PLANS=1 python -m pytest tests/test_plan_stability.py -q
"""

from __future__ import annotations

import json
import os

import pytest

from native_sql_engine_spark import plans as P
from native_sql_engine_spark.queries import analytics, ssb, tpcds, tpch

_GOLDEN = os.path.join(os.path.dirname(__file__), "plan_golden", "signatures.json")
_BLESS = os.environ.get("SPARK_GRAFT_BLESS_PLANS") == "1"


def _all_queries():
    out = {}
    for mod in (tpch, tpcds, ssb, analytics):
        out.update(mod.QUERIES)
    return out


def test_benchmark_plan_signatures_stable(spark, sf_small):
    with open(_GOLDEN) as f:
        golden = json.load(f)
    queries = _all_queries()
    # every golden entry must still exist, every query must have a golden
    if not _BLESS:
        assert set(golden) == set(queries), (
            "query set changed — re-bless with SPARK_GRAFT_BLESS_PLANS=1"
        )
    drift: dict[str, tuple[dict, dict]] = {}
    current: dict[str, dict] = {}
    for name, fn in sorted(queries.items()):
        # canonical cache state: a persisted subtree materialized by an
        # earlier test (or an earlier entry in this loop) changes both the
        # InMemoryRelation rendering AND the outer plan (known cache stats
        # flip shuffle joins to broadcasts), making signatures depend on
        # session history.  Fresh cache per entry = the fresh-session shape.
        spark.catalog.clearCache()
        sig = P.plan_signature(fn(spark, sf_small))
        current[name] = sig
        if sig != golden.get(name):
            drift[name] = (golden.get(name), sig)
    if _BLESS:
        with open(_GOLDEN, "w") as f:
            json.dump(current, f, indent=1, sort_keys=True)
        pytest.skip(f"re-blessed {len(current)} signatures ({len(drift)} changed)")
    assert not drift, "plan drift (golden → current):\n" + "\n".join(
        f"  {n}: {g} -> {s}" for n, (g, s) in sorted(drift.items())
    )


_SUBTREE_GOLDEN = os.path.join(
    os.path.dirname(__file__), "plan_golden", "subtree_signatures.json"
)


def _subtree_builders(spark, sf_small):
    """Multiply-consumed intermediates that entries materialize (checkpoint/
    persist): their producing plan is hidden behind a leaf/InMemoryRelation
    in every consumer's signature, so it gets its own golden here, taken
    PRE-materialization where it is built."""
    from pyspark.sql import functions as F

    from native_sql_engine_spark.catalog import load_table
    from native_sql_engine_spark.operators.dedup import _shingle_plan, simhash_table
    from native_sql_engine_spark.operators.graph import _pagerank_edge_state

    docs = load_table(spark, sf_small, "documents")
    li = (
        load_table(spark, sf_small, "lineitem")
        .filter(F.col("l_shipdate") < "1998-01-01")
        .select("l_orderkey", "l_partkey")
    )
    other = li.select(F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("dst"))
    edges = li.join(
        other, (li.l_orderkey == other.o2) & (li.l_partkey != other.dst)
    ).select(F.col("l_partkey").alias("src"), "dst")
    return {
        "pagerank_edge_state": lambda: _pagerank_edge_state(edges),
        "dedup_shingle_plan": lambda: _shingle_plan(docs, "doc_id", "text", 3),
        "dedup_simhash_table": lambda: simhash_table(docs, "doc_id", "text"),
    }


def test_materialized_subtree_signatures_stable(spark, sf_small):
    with open(_SUBTREE_GOLDEN) as f:
        golden = json.load(f)
    builders = _subtree_builders(spark, sf_small)
    if not _BLESS:
        assert set(golden) == set(builders), (
            "subtree set changed — re-bless with SPARK_GRAFT_BLESS_PLANS=1"
        )
    current: dict[str, dict] = {}
    drift: dict[str, tuple[dict, dict]] = {}
    for name, build in sorted(builders.items()):
        spark.catalog.clearCache()
        sig = P.plan_signature(build())
        current[name] = sig
        if sig != golden.get(name):
            drift[name] = (golden.get(name), sig)
    if _BLESS:
        with open(_SUBTREE_GOLDEN, "w") as f:
            json.dump(current, f, indent=1, sort_keys=True)
        pytest.skip(f"re-blessed {len(current)} subtree signatures ({len(drift)} changed)")
    assert not drift, "materialized-subtree plan drift (golden → current):\n" + "\n".join(
        f"  {n}: {g} -> {s}" for n, (g, s) in sorted(drift.items())
    )
