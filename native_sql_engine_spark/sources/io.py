"""Sources & sinks — the reference's Arrow Dataset surface, Spark-native.

The reference reads Parquet and CSV through an Arrow Dataset DSv2 source
with filter pushdown + column pruning (ArrowDataSourceV2.scala,
ArrowUtils.scala:114-121 format switch, ArrowFilters.scala:27-60 pushdown),
writes Parquet via ArrowFileFormat (ArrowFileFormat.scala:49,68-95), caches
columnar batches (ColumnarInMemoryTableScanExec.scala:31), and rewrites
s3:// → s3a:// URIs (ArrowUtils.scala:123-135).

Spark's built-in vectorized Parquet/CSV readers provide the identical
capability set, so this layer is deliberately thin: schema handling, write
modes, partitioned layout, and the URI rewrite — plus plan-level assertions
in tests that pushdown/pruning actually reach the scan
(PushedFilters/ReadSchema in .explain).

Scale notes (100 TB):
- writers take ``partition_by`` so downstream reads prune partitions
  (directory-level pruning beats row-group stats by orders of magnitude);
- ``target_file_mb`` repartitions before write to avoid the
  many-small-files problem that kills NameNode/S3 listing at scale;
- readers never infer CSV schemas in production paths (a full extra pass
  over 100 TB) — pass an explicit schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def normalize_object_store_uri(uri: str) -> str:
    """s3:// and s3n:// → s3a:// (the maintained Hadoop connector), mirroring
    the reference's rewrite (ArrowUtils.scala:123-135)."""
    for bad in ("s3://", "s3n://"):
        if uri.startswith(bad):
            return "s3a://" + uri[len(bad):]
    return uri


def read_parquet(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """Vectorized parquet scan; column pruning via explicit select so the
    scan's ReadSchema carries only what's needed."""
    df = spark.read.parquet(normalize_object_store_uri(path))
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan (the reference's second Arrow Dataset format).  Explicit
    schema avoids the inference pass; inference only as a dev convenience."""
    reader = spark.read.option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(normalize_object_store_uri(path))


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_file_mb: int | None = None,
    compression: str = "snappy",
) -> None:
    """Parquet sink (reference: ArrowFileFormat write queue).

    ``partition_by`` → hive-style directory layout (partition pruning on
    read); ``target_file_mb`` → coalesce/repartition to a sane file size so
    a 100 TB write doesn't emit millions of tiny files."""
    out = df
    if target_file_mb is not None:
        # estimate via Spark's own size stats when available; fall back to 1
        try:
            nbytes = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            nfiles = max(1, int(nbytes) // (target_file_mb * 1024 * 1024))
        except Exception:
            nfiles = 1
        out = df.repartition(nfiles, *partition_by) if partition_by else df.repartition(nfiles)
    writer = out.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(normalize_object_store_uri(path))


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(
        normalize_object_store_uri(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (hash-clustered files + metastore metadata).

    The co-located-join primitive at 100 TB: two tables bucketed on the same
    key with the same bucket count join with ZERO shuffle — each task reads
    bucket i of both sides (plan shows SortMergeJoin with no Exchange,
    asserted in tests/test_sources.py).  ``sort_cols`` additionally
    pre-sorts within buckets so the merge join skips its sort.

    The input is hash-repartitioned on the bucket columns into a multiple
    of ``n_buckets`` before the write (write.distribution-mode=hash in
    Iceberg terms): repartition and bucket-file assignment share Spark's
    Murmur3 HashPartitioning, so with k·n_buckets partitions every write
    task holds exactly one bucket's rows — one sorted file per task, k
    files per bucket, parallelism k·n_buckets.  Without it, each SCAN task
    sorts and writes all ``n_buckets`` files (a handful of input splits =
    a near-serial sort of the whole table)."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    k = max(1, nparts // n_buckets)
    df = df.repartition(k * n_buckets, *[F.col(c) for c in bucket_cols])
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """JSON-lines scan (beyond the reference's parquet+csv surface).  Explicit
    schema avoids the full inference pass — mandatory at 100 TB."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(normalize_object_store_uri(path))


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(normalize_object_store_uri(path))


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Fault-tolerant JSONL corpus ingestion: PERMISSIVE mode with an
    explicit quarantine column for malformed lines.

    Real web-scale JSONL shards always contain broken lines (truncated
    writes, invalid UTF-8 escapes, schema drift); failing the job
    (FAILFAST) or silently dropping them (DROPMALFORMED) both lose data
    silently at 100 TB.  PERMISSIVE + a corrupt-record column lets the
    pipeline route bad lines to a quarantine sink in the same single pass:

        df = read_jsonl_corpus(...).cache()
        good = df.filter(col(corrupt_col).isNull()).drop(corrupt_col)
        bad  = df.filter(col(corrupt_col).isNotNull())

    The explicit ``schema`` is mandatory: it avoids the full inference scan
    AND is where the corrupt column is declared (Spark only populates it
    when it appears in the schema).  NOTE: Spark disallows queries that
    prune the scan down to ONLY the corrupt column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache or write
    the parsed result before splitting, as above.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if corrupt_col not in schema.fieldNames():
        schema = schema.add(T.StructField(corrupt_col, T.StringType()))
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(normalize_object_store_uri(path))
    )


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    mode: str = "overwrite",
) -> int:
    """Small-file compaction: rewrite a parquet dataset into
    ceil(total_bytes / target) files.  Returns the output file count.

    The 100 TB maintenance primitive: streaming/micro-batch sinks and
    over-parallel writes leave datasets with millions of KB-sized files,
    and every future scan then pays per-file open/footer/scheduling cost
    that dwarfs the I/O.  Sizing from the ACTUAL on-disk bytes (via the
    Hadoop FS API, so it works on object stores too) rather than row
    counts keeps output files near the row-group sweet spot regardless of
    schema width.  `coalesce` (not `repartition`): merging files needs no
    shuffle, just fewer write tasks."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(normalize_object_store_uri(src))
    fs = path.getFileSystem(hconf)
    total = fs.getContentSummary(path).getLength()
    n_files = max(1, -(-int(total) // target_file_bytes))
    df = spark.read.parquet(normalize_object_store_uri(src))
    df.coalesce(n_files).write.mode(mode).parquet(normalize_object_store_uri(dst))
    return n_files


def read_orc(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """ORC scan — Spark's vectorized ORC reader gives the same
    pushdown/pruning guarantees as parquet (asserted in tests)."""
    df = spark.read.orc(normalize_object_store_uri(path))
    return df.select(*columns) if columns else df


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(normalize_object_store_uri(path))


def read_arrow_ipc(
    spark: SparkSession, path: str, pattern: str = "*.arrow"
) -> DataFrame:
    """Distributed Arrow IPC (Feather v2 / stream) reader.

    The reference's identity is an Arrow data source ("arrow" DSv2 format,
    ArrowDataSourceV2.scala); Spark has no built-in IPC file source, so this
    is the genuinely-new piece of its surface: Spark's binaryFile source
    lists+reads the files in parallel (one task per file), and a mapInPandas
    stage decodes each file's bytes with pyarrow — Arrow-native end to end,
    never row-at-a-time.

    Schema comes from one file's IPC header read on the driver (a few KB),
    not a data pass.  Scale note: binaryFile materializes a whole file per
    row, so IPC inputs should be written in sane file sizes (the writer
    below emits one file per partition).
    """
    import pyarrow as pa
    from pyspark.sql.pandas.types import from_arrow_schema

    norm = normalize_object_store_uri(path)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(norm)
        .select("content")
    )
    first = files.limit(1).collect()
    if not first:
        raise FileNotFoundError(f"no {pattern} files under {path}")
    arrow_schema = _open_ipc(first[0].content).schema
    # tz-less Arrow timestamps are TIMESTAMP_NTZ (a tz-naive pandas column
    # would otherwise be reinterpreted through the session timezone)
    spark_schema = from_arrow_schema(arrow_schema, prefer_timestamp_ntz=True)

    def decode(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                reader = _open_ipc(blob)
                if hasattr(reader, "num_record_batches"):  # file format
                    for i in range(reader.num_record_batches):
                        yield reader.get_batch(i).to_pandas()
                else:  # stream format
                    for batch in reader:
                        yield batch.to_pandas()

    return files.mapInPandas(decode, schema=spark_schema)


def _open_ipc(blob: bytes):
    """Open Arrow IPC bytes in either file (Feather v2) or stream format."""
    import pyarrow as pa

    try:
        return pa.ipc.open_file(pa.BufferReader(blob))
    except pa.ArrowInvalid:
        return pa.ipc.open_stream(pa.BufferReader(blob))


def write_arrow_ipc(df: DataFrame, path: str) -> int:
    """Distributed Arrow IPC sink: each partition streams its Arrow batches
    straight into one IPC file via mapInArrow — no pandas detour, no driver
    collect.  Returns total rows written."""
    import os

    norm = normalize_object_store_uri(path)
    os.makedirs(norm, exist_ok=True)

    def write_partition(batches):
        import os
        import uuid

        import pyarrow as pa

        writer = None
        rows = 0
        fname = os.path.join(norm, f"part-{uuid.uuid4().hex}.arrow")
        for batch in batches:
            if writer is None:
                writer = pa.ipc.new_file(fname, batch.schema)
            writer.write_batch(batch)
            rows += batch.num_rows
        if writer is not None:
            writer.close()
        yield pa.RecordBatch.from_pylist([{"rows": rows}])

    stats = df.mapInArrow(write_partition, "rows long").collect()
    return sum(r.rows for r in stats)


def cached(df: DataFrame) -> DataFrame:
    """Columnar cache (reference: ArrowColumnarCachedBatchSerializer /
    df.cache) — Spark's in-memory columnar cache is the same idea built in."""
    return df.persist()
