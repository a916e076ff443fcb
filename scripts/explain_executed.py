"""Dump the EXECUTED physical plan (after collect, AQE final + reuse nodes)
for named battery entries to plans/<dir>/<name>_<suffix>.txt.

The initial plan (scripts/explain_entries.py) shows an inlined CTE once per
reference; only the executed plan shows which duplicate subtrees Spark's
exchange reuse actually deduplicated at runtime (ReusedExchange nodes).

Usage: python scripts/explain_executed.py <out_subdir> <suffix> name1 ...
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, ".")

from native_sql_engine_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_dir = os.path.join("plans", sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from native_sql_engine_spark.queries import all_queries

    qs = all_queries()
    spark = get_spark("explain-executed")
    for name in names:
        df = qs[name](spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        reused = len(re.findall(r"\bReusedExchange\b", plan))
        exch = len(re.findall(r"\bExchange\b", plan))
        print(f"{name}: {exch} Exchange, {reused} ReusedExchange -> {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
