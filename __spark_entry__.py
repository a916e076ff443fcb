"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (TPC-H Q1 pipeline: scan → filter →
  project → hash aggregate → sort) on sf0.001.
- ``queries()`` — every implemented operator/query from SURVEY.md §2 plus
  the beyond-reference pipeline operators.
- ``oracle_sql()`` — DuckDB-dialect equivalents (same column names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from native_sql_engine_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from native_sql_engine_spark.queries.tpch import QUERIES
    from native_sql_engine_spark.session import pin_session_semantics

    pin_session_semantics(spark)
    return QUERIES["tpch_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
