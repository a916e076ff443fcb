"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.  Timing = full query execution
including the collect of results (count() would let Spark prune work the
reference engine actually performs, so we materialize rows).
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

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    out = {
        "metric": "query_battery_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
