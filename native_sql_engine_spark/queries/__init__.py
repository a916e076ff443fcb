"""Query battery: one entry per operator/query from SURVEY.md §2.

Each module defines ``QUERIES`` (name → callable(spark, sf_dir) → DataFrame)
and ``ORACLE`` (name → DuckDB-dialect ANSI SQL).  ``all_queries()`` /
``all_oracles()`` merge them for the driver contract in __spark_entry__.py.

Ordering contract: the per-round correctness harness verifies only the FIRST
50 entries of ``queries()`` (CORRECTNESS_r01.json recorded exactly the first
50 of the insertion order).  With a ~175-query battery, a fixed order would
leave most of the surface permanently unverified, so ``all_queries()`` re-orders the
merged dict each run from the cumulative CORRECTNESS_r*.json history in the
repo root:

1. queries whose last recorded check FAILED (re-verify fixes first),
2. queries never checked in any prior round,
3. queries that already passed, least-recently-verified first.

Within each bucket the stable module order (tpch, tpcds, ssb, ops, pipeline,
stream, udf, extra) is preserved.  Over rounds this rotates the 50-entry
verification window across the entire battery.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _modules():
    from . import advanced, analytics, extra, ops, pipeline, ssb, stream, tpcds, tpch, udf

    return (tpch, tpcds, ssb, ops, pipeline, stream, udf, extra, analytics, advanced)


def _verification_history() -> dict[str, tuple[int, bool]]:
    """name → (round of most recent check, did it pass)."""
    history: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, res in data.items():
            if not isinstance(res, dict):
                continue
            passed = (
                res.get("err") is None
                and res.get("rows_match", False)
                and res.get("schema_match", True) is not False
                and res.get("hash_match", True) is not False
            )
            prev = history.get(name)
            if prev is None or rnd >= prev[0]:
                history[name] = (rnd, bool(passed))
    return history


def _priority_names() -> set[str]:
    """Benchmark-suite + §2 micro-battery entries: drained first within the
    never-checked bucket (operator-level driver proofs for the coverage table).
    The §2.1 source family (scan/write/cache/IPC/python-datasource) and §2.10
    UDF/UDTF family are promoted too, so their coverage rows get hard driver
    proofs instead of waiting for the interleave to drain."""
    from . import ops, pipeline, ssb, tpcds, tpch, udf

    out: set[str] = set()
    for mod in (tpch, tpcds, ssb, ops):
        out.update(mod.QUERIES)
    out.update(udf.QUERIES)
    out.update(n for n in pipeline.QUERIES if n.startswith("source_"))
    out.update({"generate_explode", "distinct_rows"})
    return out


def _ordered(names: list[str]) -> list[str]:
    hist = _verification_history()
    priority = _priority_names()

    # Family-interleave rank for non-priority never-checked entries: the k-th
    # entry of each family (prefix before the first '_') gets rank k, so each
    # 50-entry driver window spans many operator families instead of draining
    # one module at a time.
    fam_counts: dict[str, int] = {}
    interleave_rank: dict[str, int] = {}
    for name in names:
        if name in hist or name in priority:
            continue
        fam = name.split("_", 1)[0]
        interleave_rank[name] = fam_counts.get(fam, 0)
        fam_counts[fam] = interleave_rank[name] + 1

    def key(item: tuple[int, str]) -> tuple[int, int, int, int]:
        pos, name = item
        rec = hist.get(name)
        if rec is None:
            if name in priority:
                return (1, 0, 0, pos)  # never checked, priority: module order
            return (1, 1, interleave_rank[name], pos)  # never checked: interleaved
        if not rec[1]:
            return (0, 0, 0, pos)  # failed last check — front of the line
        return (2, rec[0], 0, pos)  # passed; least-recently-verified first

    return [name for _, name in sorted(enumerate(names), key=lambda it: key(it))]


def _pinned(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    """Entries must behave identically in ANY host session (the driver builds
    its own, proven ANSI-on in round 7), so every registered callable first
    re-asserts the engine's semantics confs — see session.PINNED_SEMANTICS."""
    import functools

    from ..session import pin_session_semantics

    @functools.wraps(fn)
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        pin_session_semantics(spark)
        # Entries may persist() a multiply-consumed subtree (one compute
        # shared by several consumers of the SAME execution) but never
        # unpersist — the callable returns a lazy DataFrame, so there is no
        # in-entry point after the collect to release it.  Without this,
        # the NEXT invocation of the same entry cache-hits the previous
        # run's materialized subtree (CacheManager matches logically-equal
        # plans) and a repeated benchmark pass silently skips recomputing
        # it — cross-run result reuse, which the bench methodology forbids.
        # Clearing here keeps every invocation computing from the parquet
        # inputs while preserving the within-invocation sharing.
        spark.catalog.clearCache()
        return fn(spark, sf_dir)

    return wrapper


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        dup = merged.keys() & mod.QUERIES.keys()
        if dup:  # a silent overwrite would shadow a battery entry
            raise ValueError(f"duplicate battery entry name(s) across modules: {sorted(dup)}")
        merged.update(mod.QUERIES)
    return {name: _pinned(merged[name]) for name in _ordered(list(merged))}


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _modules():
        merged.update(mod.ORACLE)
    return merged
