"""Dump .explain("formatted") for named battery entries to plans/<dir>/.

Usage: python scripts/explain_entries.py <out_subdir> <suffix> name1 name2 ...
Writes plans/<out_subdir>/<name>_<suffix>.txt for each entry.

The plan is captured at sf0.1 (the bench scale) on the engine session.
"""

from __future__ import annotations

import os
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
    spark = get_spark("explain")
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exch = plan.count("Exchange")
        print(f"{name}: {len(plan)} chars, {n_exch} Exchange -> {path}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
