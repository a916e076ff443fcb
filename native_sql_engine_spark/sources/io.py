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
    pre-sorts within buckets so the merge join skips its sort."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def cached(df: DataFrame) -> DataFrame:
    """Columnar cache (reference: ArrowColumnarCachedBatchSerializer /
    df.cache) — Spark's in-memory columnar cache is the same idea built in."""
    return df.persist()
