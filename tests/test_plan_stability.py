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
