#!/usr/bin/env python
"""Scale probe: execute the three heaviest scale paths far above battery SF.

SCALE.md argues the engine's dedup/graph/ANN paths survive a 100-TB
cluster because every candidate generator is a bucketed equi-join and no
driver-side materialization grows with the data.  This script converts
that argument into measured evidence, on synthetic `spark.range` data (no
new testdata), at up to 50x the sf0.1 row counts:

  1. ``minhash_lsh_pairs``       — 5k / 50k / 250k documents (1x/10x/50x sf0.1)
  2. ``connected_components``    — 6M / 12M edges (forces the distributed
                                   path-halving loop; SMALL_GRAPH_EDGES=5M)
  3. ``knn_join_lsh``            — 2k / 20k / 100k embeddings (1x/10x/50x)
  4. ``read_iceberg`` merge-on-read — 1M / 4M-row tables, 8 data files,
     8 positional delete files + 4 equality delete files each (the
     round-9 row-level machinery: (path,pos) anti-join + null-safe
     equality anti-join with sequence residual over a broadcast seq map)

Asserted per the round-8 verdict's order #5:

  (a) **completion under a fixed memory cap** — the session is built with
      ``spark.driver.memory=6g`` (local mode: the single JVM, so this is
      the -Xmx of every executor thread too); the probe verifies the cap
      was actually applied (MemoryMXBean heap max) and completion itself
      is the proof the workload fits — an over-cap run OOMs rather than
      finishing.  The per-pool peak sum is reported as an upper bound.
  (b) **shuffle bytes grow ~linearly** — total shuffle-write bytes are
      read from the Spark UI REST API before/after each run; for each
      consecutive scale pair with row ratio r the probe asserts
      ``bytes_ratio <= r * SLACK`` (quadratic blowup would be ~r^2).
  (c) **zero driver collects above the documented thresholds** — while a
      path runs, ``DataFrame.collect`` is wrapped and every invocation
      must return <= 1 row (the connected-components convergence scalar is
      the only legitimate driver materialization on these paths).

For the kNN probe, ``n_planes`` scales with log2(N_right) so per-bucket
occupancy stays constant — the documented 100-TB recipe (bucket the right
side once, probes touch n_tables buckets); holding planes fixed while N
grows is the known quadratic trap and exactly what the assertion would
catch.

Run:  python scripts/scale_probe.py [--quick]
Emits one JSON line; exit 0 iff every assertion holds.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import urllib.request
from contextlib import contextmanager

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from native_sql_engine_spark.session import get_spark  # noqa: E402
from native_sql_engine_spark.operators.dedup import (  # noqa: E402
    SMALL_GRAPH_EDGES,
    connected_components,
    minhash_lsh_pairs,
)
from native_sql_engine_spark.operators.similarity import knn_join_lsh  # noqa: E402

DRIVER_MEM_GB = 6
#: linearity tolerance on shuffle-bytes growth vs row growth.  AQE replans
#: (skew splits, coalesce decisions, range-partition sampling) change the
#: absolute shuffle bytes of the SAME code by up to ~2x between runs, so
#: the tolerance must absorb that; a quadratic path grows >= r^2 (25x at
#: r=5), which 2.5x still separates from cleanly.
SLACK = 2.5


# ---------------------------------------------------------------- metrics
def _shuffle_write_bytes(spark) -> int:
    """Cumulative shuffle-write bytes across all completed stages (REST API)."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        stages = json.loads(r.read())
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def _heap_mb(spark) -> tuple[int, int]:
    """(heap_max_mb, pool_peak_sum_mb).  heap_max is the -Xmx the JVM is
    actually running under — the ENFORCED cap, so mere completion proves
    the workload fits it.  The pool-peak sum is reported as an upper
    bound only: per-pool peaks happen at different times (G1 Eden + Old
    peaks can sum past -Xmx), and an instantaneous Runtime read would
    under-report spikes already collected — neither is a true heap-wide
    high-water mark, which the JVM does not expose."""
    mf = spark._jvm.java.lang.management.ManagementFactory
    heap_max = mf.getMemoryMXBean().getHeapMemoryUsage().getMax()
    total = 0
    it = mf.getMemoryPoolMXBeans().iterator()
    while it.hasNext():
        pool = it.next()
        if pool.getType().toString() == "Heap memory":
            total += pool.getPeakUsage().getUsed()
    return int(heap_max / (1024 * 1024)), int(total / (1024 * 1024))


@contextmanager
def collect_guard(spark, log: list):
    """Fail any driver collect returning more than one row.

    The scale paths' contract (SCALE.md) is that nothing data-sized ever
    reaches the driver; the one allowed collect is the connected-components
    per-round convergence scalar (1 row).  ``count()`` does not route
    through ``collect`` and is unaffected.  PySpark 4 note: instances are
    ``pyspark.sql.classic.dataframe.DataFrame`` which OVERRIDES the
    abstract ``pyspark.sql.DataFrame.collect`` — the patch must land on
    the concrete class or it intercepts nothing.
    """
    cls = type(spark.range(1))
    orig = cls.collect

    def guarded(self):
        rows = orig(self)
        log.append(len(rows))
        if len(rows) > 1:
            raise AssertionError(
                f"driver collect returned {len(rows)} rows on a scale path"
            )
        return rows

    cls.collect = guarded
    try:
        yield
    finally:
        cls.collect = orig


# ------------------------------------------------------------ generators
def gen_documents(spark, n: int) -> DataFrame:
    """n docs; doc 2k+1 is a 3-token mutation of doc 2k (near-dup pairs).

    Tokens are xxhash64-derived from (id div 2, position) so distinct
    pairs share no shingles — bucket joins stay candidate-only, like real
    near-dup corpora and unlike adversarial all-same-text inputs.
    """
    return spark.range(n).selectExpr(
        "id AS doc_id",
        """concat_ws(' ', transform(sequence(0, 39), j ->
             hex(xxhash64(id div 2, j,
                          CASE WHEN j >= 37 AND id % 2 = 1 THEN 1 ELSE 0 END))
           )) AS text""",
    )


def gen_chain_edges(spark, n_edges: int, block: int = 16) -> DataFrame:
    """Undirected chains of length ``block`` — n_edges total, ~log2(block)
    path-halving rounds; node ids are non-contiguous (x17 stride) so the
    min-label is not trivially the partition-local min."""
    blocks = n_edges // (block - 1)
    return (
        spark.range(blocks * block)
        .selectExpr("id", f"id div {block} AS b", f"id % {block} AS pos")
        .filter(F.col("pos") < block - 1)
        .selectExpr("id * 17 AS a_id", "(id + 1) * 17 AS b_id")
    )


def gen_embeddings(spark, n: int, dim: int = 32) -> DataFrame:
    """Clustered vectors: center(id % clusters) + small hash noise — the
    realistic (clusterable) regime LSH is designed for.  Cluster COUNT
    scales with corpus size (new data brings new content) while cluster
    size stays ~64: the regime where bucket occupancy — and therefore
    candidate count — stays flat per row.  Holding cluster count fixed
    while N grows makes every row's true-neighbor set grow with N, i.e. a
    genuinely quadratic kNN-join output no index can linearize."""
    clusters = max(32, n // 64)
    return spark.range(n).selectExpr(
        "id AS vec_id",
        f"""transform(sequence(0, {dim - 1}), j ->
              cast(pmod(xxhash64(id % {clusters}, j), 1000) / 500.0 - 1.0
                   + pmod(xxhash64(id, j), 100) / 2000.0 AS float)
            ) AS embedding""",
    )


def gen_iceberg_mor(spark, n: int) -> str:
    """Build an Iceberg MOR table of ``n`` rows on disk: 8 data files,
    8 positional delete files (1% of each file's rows) and 4 GLOBAL
    sequence-tracked equality delete files, each deleting a key stripe.
    Returns the table dir; the read under test is the full row-level
    merge-on-read scan (anti-joins for both delete kinds)."""
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from native_sql_engine_spark.operators.iceberg import (
        write_equality_delete_file,
        write_iceberg_fixture,
        write_position_delete_file,
    )

    d = tempfile.mkdtemp(prefix=f"ice_mor_{n}_")
    per = n // 8
    entries = []
    for i in range(8):
        p = os.path.join(d, "data", f"part-{i}.parquet")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        ks = np.arange(i * per, (i + 1) * per, dtype="int64")
        pq.write_table(
            pa.table({"k": ks, "v": (ks * 7) % 1000}), p
        )
        entries.append({"status": 1, "path": p, "sequence": 1})
        pos = write_position_delete_file(
            os.path.join(d, "data", f"posdel-{i}.parquet"),
            [(p, int(x)) for x in range(0, per, 100)],  # 1% of rows
        )
        entries.append({"status": 1, "path": pos, "content": 1, "sequence": 2})
    for j in range(4):
        stripe = np.arange(j * per // 2, j * per // 2 + per // 8, dtype="int64")
        eq = write_equality_delete_file(
            os.path.join(d, "data", f"eqdel-{j}.parquet"), {"k": pa.array(stripe)}
        )
        entries.append(
            {"status": 1, "path": eq, "content": 2, "equality_ids": [1], "sequence": 3}
        )
    write_iceberg_fixture(
        d, {3: entries}, current=3, schema_fields=[(1, "k", "long")]
    )
    return d


# ----------------------------------------------------------------- probes
def run_path(spark, name, scales, build_df, run, collects: list):
    out = []
    for rows in scales:
        before = _shuffle_write_bytes(spark)
        t0 = time.monotonic()
        with collect_guard(spark, collects):
            n_out = run(build_df(spark, rows))
        sec = round(time.monotonic() - t0, 2)
        bytes_ = _shuffle_write_bytes(spark) - before
        out.append({"rows": rows, "sec": sec, "shuffle_bytes": bytes_, "out_rows": n_out})
        print(f"  {name} rows={rows:>9,} {sec:7.1f}s shuffle={bytes_ / 1e6:,.1f}MB "
              f"out={n_out:,}", file=sys.stderr)
    return out


def check_linear(points) -> bool:
    ok = True
    for lo, hi in zip(points, points[1:]):
        if lo["shuffle_bytes"] <= 0:
            continue
        r = hi["rows"] / lo["rows"]
        ok &= hi["shuffle_bytes"] / lo["shuffle_bytes"] <= r * SLACK
    return ok


def main() -> int:
    quick = "--quick" in sys.argv
    only = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")), None)
    spark = get_spark(
        "scale_probe",
        **{
            "spark.driver.memory": f"{DRIVER_MEM_GB}g",
            "spark.sql.shuffle.partitions": "64",
            # the engine default disables the UI (battery startup cost);
            # the probe needs the status REST API for shuffle-bytes reads
            "spark.ui.enabled": "true",
        },
    )
    results, collects = {}, []

    doc_scales = [5_000, 50_000] if quick else [5_000, 50_000, 250_000]
    if only in (None, "minhash"):
        results["minhash_lsh"] = run_path(
            spark, "minhash_lsh", doc_scales, gen_documents,
            lambda df: minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5).count(),
            collects,
        )

    edge_scales = [6_000_000] if quick else [6_000_000, 12_000_000]
    assert all(s > SMALL_GRAPH_EDGES for s in edge_scales)
    if only in (None, "cc"):
        results["connected_components"] = run_path(
            spark, "connected_components", edge_scales, gen_chain_edges,
            lambda df: connected_components(df).count(),
            collects,
        )

    emb_scales = [2_000, 20_000] if quick else [2_000, 20_000, 100_000]

    def knn(df):
        n = df.count()
        planes = max(6, int(math.ceil(math.log2(max(n, 2) / 16))))  # ~16 rows/bucket
        left = df.limit(max(200, n // 10)).withColumnRenamed("vec_id", "q_id")
        return knn_join_lsh(left, df, k=5, left_id="q_id", right_id="vec_id",
                            n_planes=planes).count()

    if only in (None, "knn"):
        results["knn_join_lsh"] = run_path(
            spark, "knn_join_lsh", emb_scales, gen_embeddings, knn, collects)

    ice_scales = [1_000_000] if quick else [1_000_000, 4_000_000]
    if only in (None, "iceberg"):
        results["iceberg_mor_read"] = run_path(
            spark, "iceberg_mor_read", ice_scales, gen_iceberg_mor,
            lambda table_dir: __import__(
                "native_sql_engine_spark.operators.iceberg", fromlist=["read_iceberg"]
            ).read_iceberg(spark, table_dir).count(),
            collects,
        )

    heap_max, pool_peak_sum = _heap_mb(spark)
    checks = {
        # the cap is ENFORCED by -Xmx: the check is that the cap was
        # actually applied (heap max ~= requested) AND the run completed
        # (an over-cap workload would have OOMed, not finished)
        "completed_under_mem_cap": heap_max <= DRIVER_MEM_GB * 1024 * 1.05,
        "shuffle_linear": all(check_linear(v) for v in results.values()),
        "zero_big_driver_collects": all(c <= 1 for c in collects),
    }
    print(json.dumps({
        "probe": "scale_probe", "driver_mem_cap_gb": DRIVER_MEM_GB,
        "jvm_heap_max_mb": heap_max, "pool_peak_sum_mb": pool_peak_sum,
        "slack": SLACK, "paths": results,
        "driver_collect_row_counts": collects, "checks": checks,
        "ok": all(checks.values()),
    }))
    spark.stop()
    return 0 if all(checks.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
