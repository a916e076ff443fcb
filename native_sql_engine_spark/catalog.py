"""Table registry over the driver-generated parquet test data.

The reference reads Parquet/CSV through its Arrow Dataset DSv2 source with
filter pushdown + column pruning (arrow-data-source/.../ArrowDataSourceV2.scala,
ArrowFilters.scala:27-60 — SURVEY §2.1).  Spark's built-in vectorized parquet
reader provides the identical capability (PushedFilters / ReadSchema in the
scan node), so the engine's "source" layer is a thin registry that creates
temp views and returns DataFrames.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

#: All driver-generated tables (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# DataFrame plans are immutable, so the reader handle for a given
# (session, sf_dir, table) can be built once and reused: each
# spark.read.parquet costs a py4j round trip + a parquet footer read, and a
# battery of a hundred queries re-resolving 10 tables each pays it hundreds
# of times.  Keyed by applicationId so a restarted session re-resolves.
_table_cache: dict[tuple[str, str, str], DataFrame] = {}
# applicationId → (sf_dir, tables) most recently registered as temp views;
# re-registration is skipped only when both match (switching sf_dir between
# calls MUST rebind the views or queries would silently read the old scale).
_registered: dict[str, tuple[str, tuple[str, ...]]] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table; column pruning + predicate pushdown come free.

    ``events.ts`` is parquet TIMESTAMP(NANOS) which Spark reads as a long
    (nanos since epoch, via spark.sql.legacy.parquet.nanosAsLong) — convert
    to a microsecond timestamp so the engine sees a real TimestampType, the
    same µs truncation DuckDB applies.
    """
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    df = _table_cache.get(key)
    if df is None:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            # integer DIV: double division loses µs precision at 1.7e18 nanos
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        _table_cache[key] = df
    return df


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each parquet table as a temp view; returns name → DataFrame.

    Views are lazy — a query that touches 2 of 10 tables scans only those 2,
    and only the columns it references (ReadSchema pruning).  Registration
    is idempotent and memoized per session; it re-runs whenever the target
    ``sf_dir`` (or table set) differs from the last call.
    """
    out = {name: load_table(spark, sf_dir, name) for name in tables}
    app = spark.sparkContext.applicationId
    state = (os.path.abspath(sf_dir), tables)
    if _registered.get(app) != state:
        for name, df in out.items():
            df.createOrReplaceTempView(name)
        _registered[app] = state
    return out
