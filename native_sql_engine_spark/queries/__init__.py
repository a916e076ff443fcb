"""Query battery: one entry per operator/query from SURVEY.md §2.

Each module defines ``QUERIES`` (name → callable(spark, sf_dir) → DataFrame)
and ``ORACLE`` (name → DuckDB-dialect ANSI SQL).  ``all_queries()`` /
``all_oracles()`` merge them for the driver contract in __spark_entry__.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from . import extra, ops, pipeline, ssb, stream, tpcds, tpch, udf

    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (tpch, tpcds, ssb, ops, pipeline, stream, udf, extra):
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    from . import extra, ops, pipeline, ssb, stream, tpcds, tpch, udf

    merged: dict[str, str] = {}
    for mod in (tpch, tpcds, ssb, ops, pipeline, stream, udf, extra):
        merged.update(mod.ORACLE)
    return merged
