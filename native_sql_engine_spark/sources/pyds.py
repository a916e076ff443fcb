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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


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


class _Committed(WriterCommitMessage):
    def __init__(self, staged: str, final: str):
        self.staged = staged
        self.final = final


class PyArrowParquetWriter(DataSourceArrowWriter):
    """Arrow-batch writer with a two-phase commit protocol (the shape of
    the reference's ArrowFileFormat write path, and of every production
    file sink): tasks stage ``_temporary/<uuid>.parquet`` and report it in
    their commit message; only the driver's ``commit()`` renames staged
    files into place and drops a ``_SUCCESS`` marker, so a failed/
    speculated task can never leave a half-visible file.  ``abort()``
    removes the staging dir.  On object stores swap the rename for a
    manifest commit — the protocol is identical."""

    def __init__(self, options, overwrite: bool = False):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(os.path.join(self.path, "_temporary"), exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.parquet"
        staged = os.path.join(self.path, "_temporary", name)
        batches = list(iterator)
        if batches:
            pq.write_table(pa.Table.from_batches(batches), staged)
            return _Committed(staged, os.path.join(self.path, name))
        return _Committed("", "")

    def commit(self, messages):
        if self.overwrite:
            # mode("overwrite") contract: the committed result is ONLY this
            # write's files.  Clear pre-existing data files before renaming
            # staged ones in, so old+new rows can never be read merged.
            for old in glob.glob(os.path.join(self.path, "*.parquet")):
                os.remove(old)
            success = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(success):
                os.remove(success)
        for m in messages:
            if m.staged:
                os.replace(m.staged, m.final)
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass
        self._cleanup()

    def abort(self, messages):
        import shutil

        shutil.rmtree(os.path.join(self.path, "_temporary"), ignore_errors=True)

    def _cleanup(self):
        import shutil

        shutil.rmtree(os.path.join(self.path, "_temporary"), ignore_errors=True)


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

    def writer(self, schema, overwrite: bool) -> PyArrowParquetWriter:
        return PyArrowParquetWriter(self.options, overwrite=overwrite)


class PyArrowChunkStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming replay of a parquet file in fixed-row
    chunks: the Python expression of a replayable micro-batch source.
    Offsets are row positions ({"row": n}); ``read(start)`` returns the
    next chunk and the advanced offset, and ``readBetweenOffsets`` re-reads
    any committed range deterministically — which is exactly the
    exactly-once contract a Kafka-style source implements (offsets =
    partition positions, replay on recovery)."""

    def __init__(self, options):
        self.path = options["path"]
        self.chunk = int(options.get("chunk_rows", "4096"))
        cols = options.get("columns", "")
        self.columns = [c.strip() for c in cols.split(",") if c.strip()] or None
        self._table = None

    def _load(self):
        if self._table is None:
            import pyarrow.parquet as pq

            self._table = pq.read_table(self.path, columns=self.columns)
        return self._table

    def initialOffset(self) -> dict:
        return {"row": 0}

    def _slice(self, lo: int, hi: int) -> list[tuple]:
        # a concrete list, not a generator: the streaming harness caches the
        # prefetched chunk and copy()s it for replay, which a generator
        # cannot support
        tbl = self._load().slice(lo, hi - lo)
        rows: list[tuple] = []
        for batch in tbl.to_batches():
            rows.extend(zip(*[col.to_pylist() for col in batch.columns]))
        return rows

    def read(self, start: dict):
        lo = start["row"]
        hi = min(lo + self.chunk, self._load().num_rows)
        return iter(self._slice(lo, hi)), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._slice(start["row"], end["row"]))


class PyArrowStreamDataSource(DataSource):
    """``spark.readStream.format("pyarrow_chunks").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "pyarrow_chunks"

    def schema(self):
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        schema = pq.ParquetFile(self.options["path"]).schema_arrow
        cols = self.options.get("columns", "")
        wanted = [c.strip() for c in cols.split(",") if c.strip()]
        if wanted:
            import pyarrow as pa

            schema = pa.schema([schema.field(c) for c in wanted])
        return from_arrow_schema(schema)

    def simpleStreamReader(self, schema) -> PyArrowChunkStreamReader:
        return PyArrowChunkStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register both custom sources on the session.

    Only the specific already-registered collision is swallowed; any other
    failure (API change, import error) propagates instead of surfacing
    later as a confusing "source not found" at read time.
    """
    for src in (PyArrowParquetDataSource, PyArrowStreamDataSource):
        try:
            spark.dataSource.register(src)
        except Exception as exc:
            if "already" in str(exc).lower() and "register" in str(exc).lower():
                continue
            raise
