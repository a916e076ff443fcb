"""Pre-verify the upcoming driver correctness window at sf0.01.

Replicates the driver's t2 check: run the first N entries of all_queries()
through both Spark and the DuckDB oracle and compare. Run before each round's
driver pass so any env drift is caught here, not in CORRECTNESS_r{N}.json.

Round-8 addition — the ANSI pass. The round-7 red (dedup_minhash_lsh,
ARITHMETIC_OVERFLOW) proved the driver executes entries in its OWN session
with spark.sql.ansi.enabled=true, while get_spark() pins ANSI off — a class
of failure the old preverify could never see. Two layers now close it:

1. every registered entry re-asserts the engine's semantics confs on the
   session it receives (queries.all_queries() wraps callables with
   session.pin_session_semantics — the driver-replica scenario), and
2. this script runs each window entry TWICE: once under the normal pin, and
   once with the pin forced to ANSI-ON (strictly harsher than any driver
   session — every expression must be overflow/div0-clean, not merely
   pin-protected).

Also sweeps the sqllogic corpus (tests/test_sqllogic.py) under the same
rendering-strict comparison, so a harness change can never land with the
battery green but the shared-SQL tests red (the round-4 failure mode).

Usage: python scripts/preverify_window.py [N|ALL] [sf_dir]
       N=0 skips the window and runs only the sqllogic sweep
       ALL sweeps the entire battery (both modes) — run once per round
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")

from __spark_entry__ import queries, oracle_sql  # noqa: E402
from native_sql_engine_spark import session as S  # noqa: E402
from native_sql_engine_spark.compare import assert_matches_oracle  # noqa: E402
from native_sql_engine_spark.session import get_spark  # noqa: E402


#: DuckDB output types whose pandas materialization renders differently
#: than Spark's (the driver hashes RENDERED values). HUGEINT is the known
#: case: sum(BIGINT) widens to HUGEINT, fetchdf() emits float64, and the
#: driver sees `3754.0` vs Spark's `3754` (tpcds_q18a, red r3–r5).
_DRIFT_TYPES = ("HUGEINT", "UHUGEINT")


def type_drift_sweep(oracles: dict[str, str], sf_dir: str) -> list[str]:
    """DESCRIBE every oracle; flag output columns with drift-prone types."""
    from native_sql_engine_spark.compare import duck_connection

    flagged = []
    con = duck_connection(sf_dir)
    try:
        for name, sql in oracles.items():
            try:
                desc = con.execute(f"DESCRIBE {sql}").fetchall()
            except Exception as exc:  # DESCRIBE can't see temp-table oracles etc.
                print(f"  [describe-skip] {name}: {type(exc).__name__}")
                continue
            bad = [(c, t) for c, t, *_ in desc if any(d in t.upper() for d in _DRIFT_TYPES)]
            if bad:
                flagged.append(name)
                print(f"  [TYPE-DRIFT] {name}: {bad}")
    finally:
        con.close()
    return flagged


def run_pass(window, qs, oracles, spark, sf_dir, label: str) -> list[str]:
    failed = []
    t0 = time.time()
    for i, name in enumerate(window):
        try:
            df = qs[name](spark, sf_dir)
            if name in oracles:
                assert_matches_oracle(df, oracles[name], sf_dir, name)
                status = "ok"
            else:
                cnt = df.count()
                status = f"rows-only ({cnt})"
            print(f"[{label} {i + 1}/{len(window)}] {name}: {status}", flush=True)
        except Exception:
            failed.append(name)
            print(f"[{label} {i + 1}/{len(window)}] {name}: FAIL", flush=True)
            traceback.print_exc()
    print(
        f"\n{label}: {len(window) - len(failed)}/{len(window)} green "
        f"in {time.time() - t0:.0f}s",
        flush=True,
    )
    return failed


def main() -> int:
    arg = sys.argv[1] if len(sys.argv) > 1 else "50"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark()
    qs = queries()
    oracles = oracle_sql()

    print("oracle type-drift sweep (all oracles):", flush=True)
    drifted = type_drift_sweep(oracles, sf_dir)
    print(f"  {len(drifted)} drift-prone oracle(s)\n", flush=True)

    window = list(qs) if arg.upper() == "ALL" else list(qs)[: int(arg)]
    failed = run_pass(window, qs, oracles, spark, sf_dir, "pinned")

    # Forced-ANSI pass: flip the pinned conf so every entry EXECUTES under
    # ANSI-on (harsher than the driver, whose session the per-entry pin
    # normalizes anyway). Catches overflow/div0 expressions the non-ANSI
    # harness silently wraps to NULL.
    saved = dict(S.PINNED_SEMANTICS)
    S.PINNED_SEMANTICS["spark.sql.ansi.enabled"] = "true"
    try:
        failed_ansi = run_pass(window, qs, oracles, spark, sf_dir, "ANSI-on")
    finally:
        S.PINNED_SEMANTICS.clear()
        S.PINNED_SEMANTICS.update(saved)
        S.pin_session_semantics(spark)

    if failed:
        print("FAILED (pinned):", failed)
    if failed_ansi:
        print("FAILED (ANSI-on):", failed_ansi)

    # sqllogic corpus under the same strict harness (CI-style guard)
    import subprocess

    print("\nsqllogic corpus sweep:", flush=True)
    rc = subprocess.call(
        [sys.executable, "-m", "pytest", "tests/test_sqllogic.py", "-q", "--no-header"]
    )
    if rc != 0:
        print("sqllogic corpus RED")
    return 1 if (failed or failed_ansi or drifted or rc != 0) else 0


if __name__ == "__main__":
    raise SystemExit(main())
