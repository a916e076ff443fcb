"""Physical-plan inspection — the engine's capability-assertion toolkit.

The reference proves operator coverage at runtime with a trial-convert
guard (ColumnarGuardRule.scala:48-200 dry-runs each operator and falls back
on failure).  This engine inverts that idea (SURVEY §3 note): capabilities
are *declared* (CAPABILITIES.md) and *asserted* — tests use these helpers to
check that the optimized plan actually has the shape the capability claims:
filters pushed to the scan, columns pruned, the intended join strategy
chosen, whole-stage codegen spans covering the hot path.

These helpers are also the 100 TB review loop: `.explain("formatted")`
every new operator and iterate until the plan is the one you'd want on a
1000-executor cluster (no stray shuffle, broadcast where a side is small,
scan-level pruning).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Executed (physical) plan string — after AQE re-optimization kicks in
    only on execution, so for pre-execution checks this is the initial plan."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text (node tree + per-node details)."""
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", executed_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names in the scan's ReadSchema (what actually gets read)."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", executed_plan(df)):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def has_node(df: DataFrame, node: str) -> bool:
    """True if the physical plan contains the named operator
    (e.g. 'BroadcastHashJoin', 'SortMergeJoin', 'HashAggregate')."""
    return node in executed_plan(df)


def wholestage_span_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider/fewer is better; 0 on a hot
    path means Spark fell back to interpreted evaluation."""
    return len(set(re.findall(r"\*\((\d+)\)", executed_plan(df))))


def assert_scan_pruned(
    df: DataFrame,
    must_read: list[str] = (),
    must_not_read: list[str] = (),
    must_push: list[str] = (),
) -> None:
    """Assert column pruning + predicate pushdown reached the parquet scan."""
    cols = read_schema_columns(df)
    for c in must_read:
        assert c in cols, f"{c} missing from ReadSchema {cols}"
    for c in must_not_read:
        assert c not in cols, f"{c} should be pruned but is read: {cols}"
    pushed = " ".join(pushed_filters(df))
    for c in must_push:
        assert c in pushed, f"no pushed filter mentions {c}: [{pushed}]"


#: Physical node names that define a plan's "shape" for stability purposes.
#: Deliberately strategy-level (join algorithm, aggregate kind, Expand,
#: Window, Exchange, cartesian) — node ids, expression ids and AQE
#: wrappers are noise and excluded.
_SIGNATURE_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Expand",
    "Window",
    "Generate",
    "Exchange",
    "TakeOrderedAndProject",
    "GlobalLimit",
    # Python-boundary nodes: a BatchEvalPython sneaking into a goldened plan
    # (row-at-a-time pickled UDF) or an Arrow kernel silently degrading is a
    # strategy regression, same class as a broadcast degrading to sort-merge
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "FlatMapGroupsInPandas",
)


def _strip_cached_bodies(plan: str) -> str:
    """Drop the nested cached-plan text under every ``InMemoryRelation``.

    The relation's body is a *re-print* of the plan that populates the
    cache, and its rendering is session-state-dependent: before the cache
    is materialized it shows ``AdaptiveSparkPlan isFinalPlan=false`` (one
    copy of the subtree), after materialization it shows BOTH the "Final
    Plan" and "Initial Plan" sections — so a signature that counts it
    changes depending on whether any earlier query in the session happened
    to materialize the same cache entry.  Depth = leading spaces + ':'
    tree bars; a line deeper than its ``InMemoryRelation`` belongs to the
    cached body."""
    out: list[str] = []
    skip_depth: int | None = None
    for line in plan.splitlines():
        depth = len(line) - len(line.lstrip(" :"))
        if skip_depth is not None:
            if depth > skip_depth:
                continue
            skip_depth = None
        out.append(line)
        if "InMemoryRelation" in line:
            skip_depth = depth
    return "\n".join(out)


def plan_signature(df: DataFrame) -> dict[str, int]:
    """Canonical strategy-level signature of the physical plan: counts of
    the join/aggregate/exchange operators that determine cost at scale.

    This is the engine's analog of the reference's `tpcds-plan-stability/`
    golden plan files (SURVEY §5.4): a committed snapshot of every
    benchmark query's signature turns an accidental plan regression (a
    broadcast silently degrading to a sort-merge join, a second Exchange
    appearing) into a test failure instead of a production incident.

    Cached-subtree bodies are excluded (``_strip_cached_bodies``): they are
    a redundant re-print whose rendering flips with session cache state,
    and the subtree's own shape is reviewed where it is built.
    """
    plan = _strip_cached_bodies(executed_plan(df))
    sig: dict[str, int] = {}
    for node in _SIGNATURE_NODES:
        n = len(re.findall(rf"\b{node}\b", plan))
        if n:
            sig[node] = n
    return sig
