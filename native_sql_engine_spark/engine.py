"""Engine facade — the user-facing entry point.

Mirrors the reference plugin's install surface: where the reference is
enabled via ``spark.sql.extensions=com.intel.oap.ColumnarPlugin``
(ColumnarPlugin.scala:387-394) and then transparently accelerates
``spark.sql(...)``, this engine wraps a SparkSession with table registration,
``sql()``, and the extended operator library (dedup / similarity / text /
multimodal) as first-class methods.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import DEFAULT_SF_DIR, TABLES, register_tables


class Engine:
    """Facade over a SparkSession + registered tables.

    >>> eng = Engine(spark, sf_dir="/root/testdata/sf0.01")
    >>> eng.sql("select count(*) from lineitem")
    """

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir
        self.tables = register_tables(spark, sf_dir)

    def table(self, name: str) -> DataFrame:
        return self.tables[name]

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def explain(self, query: str) -> str:
        """Formatted physical plan — the engine's plan-inspection hook."""
        return self.spark.sql(query)._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
