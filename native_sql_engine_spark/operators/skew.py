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
    spread_duplicates: bool = False,
) -> DataFrame:
    """Equi-join with ``salt``-way key salting (probe scattered, build
    replicated).  Build-side replication costs |build|×salt rows — use for
    large-probe ∙ modest-build joins where one probe key is hot; result is
    row-identical to the unsalted join."""
    # deterministic salt from the WHOLE probe row content, not rand() and not
    # spark_partition_id(): a fetch-failure partial recompute must salt every
    # row identically or rows move between reducers mid-query
    # (SPARK-23207-style duplicates/losses).  A content-only hash is stable
    # even when the upstream partitioning is order/placement-nondeterministic
    # (round-robin repartition, unordered shuffle reads), where a
    # partition-id-seeded salt is not.  Not from the key alone either — a
    # key-derived salt would put every row of the hot key in ONE bucket,
    # defeating the spread.
    #
    # Residue: EXACT-duplicate probe rows share a salt bucket.  A hot key made
    # of identical rows therefore does not spread — that case needs
    # ``spread_duplicates=True``, which pre-aggregates duplicates (one groupBy
    # shuffle over row content, uniformly distributed by construction), salts
    # each (row, i<count) pair with a deterministic per-duplicate index, and
    # is retry-safe because the index derives from the aggregated count, not
    # from physical placement.
    if spread_duplicates:
        cols = probe.columns
        p = (
            probe.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("_dup_n"))
            .withColumn("_dup_i", F.explode(F.sequence(F.lit(0), F.col("_dup_n") - 1)))
            .withColumn(
                "_salt_p",
                F.pmod(F.hash(*cols, F.col("_dup_i"), F.lit("salt")), F.lit(salt)).cast(
                    "int"
                ),
            )
            .drop("_dup_n", "_dup_i")
        )
    else:
        p = probe.withColumn(
            "_salt_p",
            F.pmod(F.hash(*probe.columns, F.lit("salt")), F.lit(salt)).cast("int"),
        )
    b = build.withColumn("_salt_b", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = p.join(
        b,
        (F.col(probe_key) == F.col(build_key)) & (F.col("_salt_p") == F.col("_salt_b")),
        how,
    )
    return out.drop("_salt_p", "_salt_b")
