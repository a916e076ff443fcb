"""Temporal joins the reference lacks: as-of join and bucketed range join.

SURVEY §2.3: "No range/as-of/interval join operators exist in the
reference" — these are beyond-parity additions, built as compositions of
existing DataFrame ops (no UDFs).

Scale design (100 TB):
- ``asof_join`` is the union-merge formulation: tag both sides, one shuffle
  by key, one ordered window pass carrying the latest right-side values
  forward (``last(..., ignorenulls)`` over rows-unbounded-preceding).  No
  join product is ever materialized — state per key is O(1), vs the naive
  join+filter+rank which explodes on hot keys.
- ``range_join_buckets`` turns an interval/inequality join into an
  equi-join by bucketing the point side and exploding each interval into
  the buckets it overlaps; the residual BETWEEN filter runs post-join.
  Candidate volume is |points| + Σ interval_width/bucket instead of
  |points| × |intervals|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tie_break: str | None = None,
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the nearest right row for the same ``key``:
    the greatest ``right_ts`` ≤ ``left_ts`` (``direction="backward"``, the
    default ASOF JOIN) or the smallest ``right_ts`` ≥ ``left_ts``
    (``direction="forward"``).

    Union-merge: both sides are tagged and merged into one stream, shuffled
    once by ``key`` and sorted by time; the matched right-side values are
    carried across with ``last(ignorenulls)`` (time order reversed for the
    forward direction).  At equal timestamps the right row sorts first
    (≤ / ≥ semantics).  ``tie_break`` (a right column name) makes multiple
    right rows at the same timestamp deterministic: the greatest value wins.

    ``tolerance`` bounds the match distance: a callable
    ``(left_ts_col, matched_right_ts_col) -> BooleanColumn``; matches
    failing the predicate are nulled out (pandas ``merge_asof`` tolerance).
    State per key stays O(1) regardless of tolerance.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if direction == "nearest":
        return _asof_nearest(left, right, key, left_ts, right_ts, value_cols, tie_break, tolerance)
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("double").alias("_tb"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r__ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.struct(*left.columns).alias("_row"),
    )
    rt = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        (F.col(tie_break) if tie_break else F.lit(0)).cast("double").alias("_tb"),
        F.col(right_ts).alias("_r__ts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(lt.schema["_row"].dataType).alias("_row"),
    )
    merged = lt.unionByName(rt)
    # right rows first at equal ts (asof is <= / >=); among tied right rows
    # the winning tie_break lands last, so last(ignorenulls) picks it
    ts_order = F.col("_ts") if direction == "backward" else F.col("_ts").desc()
    w = (
        W.partitionBy("_k")
        .orderBy(ts_order, F.col("_side").desc(), F.col("_tb").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carry_cols = ["__ts"] + [f"_{c}" for c in value_cols]
    carried = merged.select(
        "_side",
        "_row",
        *[F.last(f"_r{c}", ignorenulls=True).over(w).alias(f"_r{c}") for c in carry_cols],
    ).filter(F.col("_side") == 0)
    if tolerance is not None:
        ok = tolerance(F.col(f"_row.{left_ts}"), F.col("_r__ts"))
        carried = carried.select(
            "_row",
            *[F.when(ok, F.col(f"_r{c}")).alias(f"_r{c}") for c in carry_cols],
        )
    return carried.select(
        *[F.col(f"_row.{c}").alias(c) for c in left.columns],
        *[F.col(f"_r_{c}").alias(f"right_{c}") for c in value_cols],
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tie_break: str | None,
    tolerance,
) -> DataFrame:
    """direction="nearest": whichever of the backward/forward candidates is
    closer in time wins; exact ties prefer the backward (earlier) row — the
    pandas merge_asof convention.  Both candidate carries run over the SAME
    key-hash exchange (one shuffle, two sorted window passes) — still no
    join product and O(1) state per key."""
    from pyspark.sql import types as T

    lt = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("double").alias("_tb"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r__ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.struct(*left.columns).alias("_row"),
    )
    rt = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        (F.col(tie_break) if tie_break else F.lit(0)).cast("double").alias("_tb"),
        F.col(right_ts).alias("_r__ts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(lt.schema["_row"].dataType).alias("_row"),
    )
    merged = lt.unionByName(rt)
    w_b = (
        W.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_side").desc(), F.col("_tb").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_f = (
        W.partitionBy("_k")
        .orderBy(F.col("_ts").desc(), F.col("_side").desc(), F.col("_tb").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carry = ["__ts"] + [f"_{c}" for c in value_cols]
    carried = merged.select(
        "_side",
        "_row",
        "_ts",
        *[F.last(f"_r{c}", ignorenulls=True).over(w_b).alias(f"_b{c}") for c in carry],
        *[F.last(f"_r{c}", ignorenulls=True).over(w_f).alias(f"_f{c}") for c in carry],
    ).filter(F.col("_side") == 0)

    ts_type = left.schema[left_ts].dataType
    temporal = isinstance(ts_type, (T.TimestampType, T.TimestampNTZType, T.DateType))

    def _dist(a: Column, b: Column) -> Column:
        if temporal:
            return F.abs(
                F.unix_micros(a.cast("timestamp")) - F.unix_micros(b.cast("timestamp"))
            )
        return F.abs(a - b)

    back_wins = F.col("_b__ts").isNotNull() & (
        F.col("_f__ts").isNull()
        | (_dist(F.col("_ts"), F.col("_b__ts")) <= _dist(F.col("_f__ts"), F.col("_ts")))
    )
    chosen = carried.select(
        "_row",
        "_ts",
        *[
            F.when(back_wins, F.col(f"_b{c}")).otherwise(F.col(f"_f{c}")).alias(f"_r{c}")
            for c in carry
        ],
    )
    if tolerance is not None:
        ok = tolerance(F.col("_ts"), F.col("_r__ts"))
        chosen = chosen.select(
            "_row",
            *[F.when(ok, F.col(f"_r{c}")).alias(f"_r{c}") for c in carry],
        )
    return chosen.select(
        *[F.col(f"_row.{c}").alias(c) for c in left.columns],
        *[F.col(f"_r_{c}").alias(f"right_{c}") for c in value_cols],
    )


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    extra_key: str | None = None,
) -> DataFrame:
    """Join each point row to every interval row with
    start ≤ point < end (optionally also matching ``extra_key``).

    Bucketed equi-join: points get bucket = floor(p/width); intervals
    explode into every bucket they overlap (sequence of bucket ids); the
    equi-join on (bucket[, key]) prunes candidates, the exact BETWEEN
    filter finishes.  Interval columns survive with their names, point
    columns with theirs (caller guarantees disjointness).
    """
    p_bkt = F.floor(F.col(point_col) / bucket_width).cast("long")
    pts = points.withColumn("_bkt", p_bkt)
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width).cast("long"),
                F.floor((F.col(end_col) - 1e-9) / bucket_width).cast("long"),
            )
        ),
    )
    on = ["_bkt"] + ([extra_key] if extra_key else [])
    return (
        pts.join(iv, on)
        .filter((F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col)))
        .drop("_bkt")
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tie_break: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history: collapse an event stream
    into (key, attr, valid_from, valid_to) intervals, one row per attribute
    *change* (valid_to is NULL on the open interval).

    One hash shuffle by ``key_col`` feeds both window passes (change
    detection via ``lag``, interval close via ``lead`` after the filter —
    Spark reuses the partitioning, so the whole operator is a single
    exchange).  At 100 TB this is the standard dimension-compaction shape:
    state per key is O(1), no self-join, and the output partitioning matches
    the downstream as-of join that consumes the history.
    """
    w = W.partitionBy(key_col).orderBy(ts_col, tie_break)
    changed = (
        df.withColumn("_prev", F.lag(attr_col).over(w))
        .withColumn("_rn", F.row_number().over(w))
        # rn=1 kept unconditionally: lag() is NULL on the first row, so a
        # leading NULL attr value would make eqNullSafe(NULL, NULL) true and
        # silently drop the opening interval (ADVICE r1). Null-safe
        # inequality handles every later NULL↔value transition.
        .filter((F.col("_rn") == 1) | ~F.col("_prev").eqNullSafe(F.col(attr_col)))
        .drop("_prev", "_rn")
    )
    return changed.withColumn("valid_to", F.lead(ts_col).over(w))


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average per key, ordered by time —
    the time-series smoothing primitive (pandas ``ewm(alpha).mean()``
    semantics, adjust=True).

    EWMA is a linear recurrence, which plain window aggregates cannot
    express (the naive closed form Σ x_j·α̅^(i−j) overflows for long
    series).  It runs as Arrow-batched ``applyInPandas``: ONE hash shuffle
    by key, each group smoothed by the exact pandas kernel in-memory.
    At 100 TB the constraint is per-key series size (a group must fit a
    worker); hot keys get windowed/segmented upstream.
    """
    import pandas as pd

    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="stable")
        pdf[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=True).mean()
        return pdf

    return df.groupBy(key_col).applyInPandas(smooth, schema=schema)


def lttb_downsample(
    pts: DataFrame,
    series_col: str,
    t_col: str,
    v_col: str,
    k: int = 10,
) -> DataFrame:
    """LTTB (Largest-Triangle-Three-Buckets, Steinarsson 2013) downsample
    to ``k`` points per series (battery `timeseries_lttb_downsample`).

    Input: one row per (series, t, v) with INTEGER t and v (exactness
    contract: every triangle-area comparison is bigint arithmetic — the
    next-bucket centroid division is multiplied through by the bucket
    size, so the selection is bit-reproducible and oracle-replayable).
    Series shorter than max(k, 12) points are dropped (nothing to thin).

    Plan: one series-key shuffle assembles per-bucket point arrays +
    next-bucket centroid sums; an ``aggregate()`` HOF walks the k-2
    buckets per series inside codegen, carrying the previously chosen
    point — the sequential recursion never leaves the executor.  Returns
    (series, idx, t, v), idx 0..k-1 (first and last points always kept).
    """
    nb = k - 2
    p = pts.select(
        F.col(series_col).alias("_s"),
        F.col(t_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    w = W.partitionBy("_s").orderBy("t")
    # persisted: the numbered point set feeds FOUR consumers (interior →
    # centroid agg + bucket-array agg, firsts, lasts); without
    # materialization Spark duplicates the whole upstream subtree — input
    # pre-aggregation, series shuffle, two window passes — once per
    # consumer (measured: 28 Exchanges in the battery entry's plan).  The
    # cached set is the downsampler input (one row per retained point
    # AFTER any upstream pre-agg), not the raw events.
    num = (
        p.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(W.partitionBy("_s")))
        .filter(F.col("n") >= max(k, 12))
        .persist()
    )
    interior = num.filter((F.col("rn") > 1) & (F.col("rn") < F.col("n"))).withColumn(
        "b", F.expr(f"((rn - 2) * {nb}) div (n - 2)")
    )
    firsts = num.filter(F.col("rn") == 1).select(
        "_s", F.col("t").alias("ft"), F.col("v").alias("fv")
    )
    lasts = num.filter(F.col("rn") == F.col("n")).select(
        "_s", F.col("t").alias("lt"), F.col("v").alias("lv")
    )
    cent = interior.groupBy("_s", "b").agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum("t").cast("bigint").alias("St"),
        F.sum("v").cast("bigint").alias("Sv"),
    )
    nextc = cent.filter(F.col("b") >= 1).select(
        "_s", (F.col("b") - 1).alias("b"), "m", "St", "Sv"
    ).unionByName(
        lasts.select(
            "_s",
            F.lit(nb - 1).alias("b"),
            F.lit(1).cast("bigint").alias("m"),
            F.col("lt").alias("St"),
            F.col("lv").alias("Sv"),
        )
    )
    bucket_pts = interior.groupBy("_s", "b").agg(
        F.array_sort(F.collect_list(F.struct("t", "v"))).alias("pts")
    )
    buckets = (
        bucket_pts.join(nextc, ["_s", "b"])
        .groupBy("_s")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("b", "pts", "m", "St", "Sv"))
            ).alias("bks")
        )
    )
    # the argmax sub-expression repeats because HOF lambdas cannot bind a
    # local; it re-evaluates per bucket (<= k-2 times per series), not per
    # point, so the recompute is noise
    argmax = (
        "array_max(transform(bk.pts, p -> named_struct("
        "'metric', abs((p.t - acc.pt) * (bk.Sv - bk.m * acc.pv)"
        "             - (bk.St - bk.m * acc.pt) * (p.v - acc.pv)),"
        "'nt', -p.t, 'vv', p.v)))"
    )
    fold = (
        "aggregate(bks, "
        "named_struct('pt', ft, 'pv', fv, 'out', array(named_struct('t', ft, 'v', fv))), "
        f"(acc, bk) -> named_struct("
        f"'pt', -{argmax}.nt, "
        f"'pv', {argmax}.vv, "
        f"'out', array_append(acc.out, named_struct('t', -{argmax}.nt, 'v', {argmax}.vv)))"
        ")"
    )
    return (
        buckets.join(firsts, "_s")
        .join(lasts, "_s")
        .withColumn("st", F.expr(fold))
        .withColumn(
            "all_pts", F.expr("array_append(st.out, named_struct('t', lt, 'v', lv))")
        )
        .select("_s", F.posexplode("all_pts").alias("idx", "p"))
        .select(
            F.col("_s").alias(series_col),
            "idx",
            F.col("p.t").alias(t_col),
            F.col("p.v").alias(v_col),
        )
    )
