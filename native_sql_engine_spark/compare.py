"""DuckDB-oracle comparison harness (mirrors the driver's t2 check).

Runs a Spark DataFrame and a DuckDB SQL side-by-side on the same parquet
tables and compares row count, column names, and order-insensitive values.
Modeled on the reference's checkAnswer-style golden testing
(NativeSQLConvertedSuite.scala:26-50) with DuckDB as the external oracle.
"""

from __future__ import annotations

import decimal
import math
import os
from typing import Any

import duckdb
import pandas as pd

from .catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _normalize_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse fp noise below oracle-visible precision
        return round(v, 6)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_normalize_cell(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return tuple(_normalize_cell(x) for x in v.tolist())
        if isinstance(v, np.generic):
            return _normalize_cell(v.item())
    except ImportError:
        pass
    return v


def normalize(df: pd.DataFrame) -> list[tuple]:
    """Sort columns by name, normalize cells, return sorted row tuples."""
    df = df[sorted(df.columns)]
    rows = [tuple(_normalize_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def _rendering_drift(a: Any, b: Any) -> str | None:
    """Detect decimal-scale rendering drift the numeric compare is blind to.

    The driver hashes *rendered* values, so ``Decimal('25.5100')`` vs
    ``Decimal('25.51')`` is a hash mismatch even though they compare equal
    numerically (the tpcds_q18a round-3 red row). Mirror that: two Decimals
    must render identically, and a Decimal paired with a float is an
    uncast-decimal output whose driver-side rendering we can't trust —
    cast it to double in both the Spark query and the oracle SQL.
    """
    a_dec = isinstance(a, decimal.Decimal)
    b_dec = isinstance(b, decimal.Decimal)
    if a_dec and b_dec:
        if str(a) != str(b):
            return f"decimal scale drift: spark renders {a!r}, oracle renders {b!r}"
        return None
    if a_dec or b_dec:
        return (
            f"uncast decimal output: spark={a!r} vs oracle={b!r} — "
            "cast to double on both sides for driver hash stability"
        )
    # int-vs-float: DuckDB widens sum(BIGINT) to HUGEINT, which fetchdf()
    # materializes as float64, so the driver renders `3754.0` against
    # Spark's `3754` — a hash miss on every row while `3754 == 3754.0`
    # sails through the numeric compare (the tpcds_q18a r3–r5 red row).
    a_int = isinstance(a, int) and not isinstance(a, bool)
    b_int = isinstance(b, int) and not isinstance(b, bool)
    if (a_int and isinstance(b, float)) or (b_int and isinstance(a, float)):
        return (
            f"int-vs-float rendering drift: spark={a!r} vs oracle={b!r} — "
            "cast the oracle column (HUGEINT from sum(BIGINT)?) to BIGINT, "
            "or cast both sides to double"
        )
    if isinstance(a, tuple) and isinstance(b, tuple):
        for x, y in zip(a, b):
            msg = _rendering_drift(x, y)
            if msg:
                return msg
    return None


def assert_matches_oracle(
    spark_df, duck_sql: str, sf_dir: str, name: str = "query"
) -> None:
    """Raise AssertionError unless Spark result ≡ DuckDB result.

    Checks numeric equality first, then a driver-faithful canonical-rendering
    pass (decimal scale must match exactly — see _rendering_drift).
    """
    got = spark_df.toPandas()
    con = duck_connection(sf_dir)
    try:
        want = con.execute(duck_sql).fetchdf()
    finally:
        con.close()

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch spark={sorted(got.columns)} duck={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count spark={len(got)} duck={len(want)}"
    g, w = normalize(got), normalize(want)
    for i, (a, b) in enumerate(zip(g, w)):
        assert a == b, f"{name}: row {i} differs\n  spark={a}\n  duck ={b}"
        drift = _rendering_drift(a, b)
        assert drift is None, f"{name}: row {i} {drift}\n  spark={a}\n  duck ={b}"
