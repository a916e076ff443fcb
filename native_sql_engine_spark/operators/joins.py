"""Join strategies — parity with the reference's three join execs.

Reference (SURVEY §2.3):
- ColumnarBroadcastHashJoinExec  (ColumnarBroadcastHashJoinExec.scala:50)
- ColumnarShuffledHashJoinExec   (ColumnarShuffledHashJoinExec.scala:61)
- ColumnarSortMergeJoinExec      (ColumnarSortMergeJoinExec.scala:61)
supporting Inner, LeftOuter, RightOuter, FullOuter (SMJ), LeftSemi,
LeftAnti (incl. null-aware), Existence, plus residual non-equi conditions.

Spark-first: the join *type* is the DataFrame `how=` argument; the join
*strategy* is a plan-level choice we steer with hints — exactly the split
the reference implements in native code.  At 100 TB: broadcast for dim
tables (no shuffle), shuffled-hash for large∙medium with skew-tolerant AQE,
sort-merge as the safe default for fact∙fact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: join types the reference supports natively (docs/operators.md rows 1,19-21)
JOIN_TYPES = (
    "inner",
    "left",
    "right",
    "full",
    "left_semi",
    "left_anti",
    "cross",
)

#: strategy → DataFrame hint name
STRATEGIES = {
    "broadcast": "broadcast",
    "shuffle_hash": "shuffle_hash",
    "sort_merge": "merge",
    "shuffle_replicate_nl": "shuffle_replicate_nl",
}


def join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | Column,
    how: str = "inner",
    strategy: str | None = None,
) -> DataFrame:
    """Join with an explicit physical strategy (None = let Catalyst/AQE pick).

    ``strategy='broadcast'`` replaces the reference's driver-side
    ColumnarHashedRelation broadcast (ColumnarBroadcastExchangeExec.scala:46);
    ``'shuffle_hash'``/``'sort_merge'`` pick the corresponding exchange+probe
    plan.  Residual non-equi conditions ride inside ``on`` as a Column.
    """
    if strategy is not None:
        right = right.hint(STRATEGIES[strategy])
    return left.join(right, on, how)


def null_aware_anti_join(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str
) -> DataFrame:
    """NOT IN (subquery) with null-aware semantics.

    Mirrors the reference's ``nullAware`` BroadcastHashJoin path
    (ColumnarPlugin.scala:165-173): if the right side contains any NULL key,
    the result is empty; left rows with NULL keys never match.  Expressed
    declaratively so Catalyst plans its null-aware anti join.
    """
    left.createOrReplaceTempView("_naaj_l")
    right.createOrReplaceTempView("_naaj_r")
    return left.sparkSession.sql(
        f"SELECT * FROM _naaj_l WHERE {left_key} NOT IN (SELECT {right_key} FROM _naaj_r)"
    )


def existence_join(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str, flag: str
) -> DataFrame:
    """Existence join: left rows + boolean "has a match" column.

    The reference plans this as join type Existence
    (ColumnarBroadcastHashJoinExec.scala:93-95); in Spark it falls out of an
    IN-subquery used as a value expression.
    """
    left.createOrReplaceTempView("_ex_l")
    right.createOrReplaceTempView("_ex_r")
    cols = ", ".join(left.columns)
    return left.sparkSession.sql(
        f"SELECT {cols}, {left_key} IN (SELECT {right_key} FROM _ex_r) AS {flag} "
        "FROM _ex_l"
    )

