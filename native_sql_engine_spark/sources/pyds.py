"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The reference ships a whole module (`arrow-data-source`) whose job is a
custom columnar DSv2 source feeding Arrow batches to the engine (parity:
ArrowDataSourceV2.scala, ArrowScan.scala:33 partition planning,
ArrowPartitionReaderFactory.scala batch reads).  This is the
PySpark-4-native expression of the same capability: a user-defined
source registered with ``spark.dataSource.register`` whose reader

- plans one InputPartition per parquet ROW GROUP (distributed, no driver
  bottleneck: the executor task opens only its own row group),
- yields ``pyarrow.RecordBatch`` directly (the arrow-optimized read path —
  batches cross into the JVM without row conversion), and
- prunes columns via the ``columns`` option.

Scale: task granularity = row group (the same unit Spark's built-in reader
uses), so a 100 TB directory becomes ~800k independent tasks; the driver
only lists footers.  This source exists to prove the extension surface —
for plain parquet the built-in vectorized reader (sources/io.py) is the
hot path.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _RowGroup(InputPartition):
    def __init__(self, path: str, row_group: int):
        self.path = path
        self.row_group = row_group


class PyArrowParquetReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        cols = options.get("columns", "")
        self.columns = [c.strip() for c in cols.split(",") if c.strip()] or None

    def _files(self) -> list[str]:
        if os.path.isdir(self.path):
            return sorted(glob.glob(os.path.join(self.path, "*.parquet")))
        return [self.path]

    def partitions(self):
        import pyarrow.parquet as pq

        parts = []
        for f in self._files():
            for rg in range(pq.ParquetFile(f).num_row_groups):
                parts.append(_RowGroup(f, rg))
        return parts

    def read(self, partition: _RowGroup):
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        table = pf.read_row_group(partition.row_group, columns=self.columns)
        yield from table.to_batches()


class PyArrowParquetDataSource(DataSource):
    """``spark.read.format("pyarrow_parquet").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "pyarrow_parquet"

    def schema(self):
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        reader = PyArrowParquetReader(self.options)
        first = reader._files()[0]
        schema = pq.ParquetFile(first).schema_arrow
        if reader.columns:
            import pyarrow as pa

            schema = pa.schema([schema.field(c) for c in reader.columns])
        return from_arrow_schema(schema)

    def reader(self, schema) -> PyArrowParquetReader:
        return PyArrowParquetReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on the session."""
    try:
        spark.dataSource.register(PyArrowParquetDataSource)
    except Exception:
        pass  # already registered
