"""Skew-aware join: salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most skew at runtime
by splitting oversized shuffle partitions; salting is the plan-level tool
for the pathological case — one join key carrying a disproportionate share
of rows (power-law user ids, null-bucket keys) where even a split partition
re-concentrates on the same reducer.

``salted_join`` replicates the build side R times and scatters the probe
side across the R salt values: the hot key's rows spread over R reducers.
Output is identical to the plain join (oracle-checked in the battery).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with ``salt``-way key salting (probe scattered, build
    replicated).  Build-side replication costs |build|×salt rows — use for
    large-probe ∙ modest-build joins where one probe key is hot; result is
    row-identical to the unsalted join."""
    # deterministic salt from the WHOLE probe row + input partition id, not
    # rand(): a task retry must salt identically or a recomputed partition
    # joins differently mid-query; and not from the key alone — a key-derived
    # salt would put every row of the hot key in ONE bucket, defeating the
    # spread.  spark_partition_id() disambiguates EXACT-duplicate rows (same
    # row-hash) that live in different input partitions, so a hot key made of
    # identical rows still spreads; identical duplicates inside a single
    # input partition share a bucket, but that residue is bounded by the
    # input partition size (~one split), not by the key's global row count —
    # pre-aggregate duplicates first if even that matters.
    p = probe.withColumn(
        "_salt_p",
        F.pmod(
            F.hash(*probe.columns, F.spark_partition_id(), F.lit("salt")), F.lit(salt)
        ).cast("int"),
    )
    b = build.withColumn("_salt_b", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = p.join(
        b,
        (F.col(probe_key) == F.col(build_key)) & (F.col("_salt_p") == F.col("_salt_b")),
        how,
    )
    return out.drop("_salt_p", "_salt_b")
