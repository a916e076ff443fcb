"""native_sql_engine_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of
oap-project/native-sql-engine ("Gazelle Plugin"), re-expressed Spark-first:
the reference swaps Spark's physical operators for Arrow/C++ kernels
(see /root/reference/README.md:27-37); this engine instead declares the same
query surface with the DataFrame/SQL API and lets Catalyst + Tungsten pick
the physical strategy.  Beyond reference parity it adds the LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns) and
Structured Streaming equivalents, all designed for 100 TB scale.
"""

from .session import get_spark, ENGINE_CONF
from .catalog import TABLES, register_tables, load_table
from .engine import Engine

__all__ = [
    "get_spark",
    "ENGINE_CONF",
    "TABLES",
    "register_tables",
    "load_table",
    "Engine",
]

__version__ = "0.1.0"
