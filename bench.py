"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.  Timing = full query execution
including the collect of results (count() would let Spark prune work the
reference engine actually performs, so we materialize rows).

Methodology: one untimed warm-up execution per query, then the timed run
(TPC-style power run).  At sf0.1 a cold run is dominated by one-time
Catalyst analysis + whole-stage-codegen compilation (~2-10s/query, e.g.
16.2s cold vs 3.6s warm for corpus_pipeline), a fixed cost that amortizes
to nothing over the hours-long scans this engine targets at 100 TB —
steady-state is the throughput number that scales.  The cold total is
still reported as "cold_total_sec" for transparency.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from native_sql_engine_spark import get_spark
    from native_sql_engine_spark.catalog import register_tables
    from native_sql_engine_spark.queries import all_queries

    spark = get_spark("bench")
    register_tables(spark, sf_dir)

    qs = all_queries()
    # headline set: the full TPC-H battery + SSB + pipeline ops if present
    names = sorted(qs)

    # warm the JVM + parquet footers once (not counted)
    qs["tpch_q6"](spark, sf_dir).collect()

    cold: dict[str, float] = {}
    for name in names:  # warm-up pass: pays analysis + codegen once
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        cold[name] = round(time.perf_counter() - t0, 3)

    timings: dict[str, float] = {}
    for name in names:  # timed steady-state pass
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    out = {
        "metric": "query_battery_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "cold_total_sec": round(sum(cold.values()), 3),
        "sf": float(sf) if sf else None,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
