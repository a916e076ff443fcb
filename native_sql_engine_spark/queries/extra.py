"""Beyond-reference join operators: as-of, bucketed range, salted skew join.

The reference has no range/as-of/interval joins (SURVEY §2.3) and relies on
AQE alone for skew.  Each query here hash-matches a DuckDB oracle written
with plain correlated/inequality SQL — proving the scalable formulation
(union-merge window, bucketed equi-join, salted scatter) is semantically
identical to the naive one.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.skew import salted_join
from ..operators.temporal import asof_join, range_join_buckets

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


@q(
    "join_asof_events_orders",
    """
    SELECT e.event_id,
           e.user_id,
           cast((SELECT max(o.o_orderdate) FROM orders o
                 WHERE o.o_custkey = e.user_id
                   AND o.o_orderdate <= cast(e.ts AS date)) AS varchar) AS last_order_date,
           (SELECT round(max(o.o_totalprice), 2) FROM orders o
            WHERE o.o_custkey = e.user_id
              AND o.o_orderdate = (SELECT max(o2.o_orderdate) FROM orders o2
                                   WHERE o2.o_custkey = e.user_id
                                     AND o2.o_orderdate <= cast(e.ts AS date)))
             AS last_order_price
    FROM events e
    ORDER BY e.event_id
    """,
)
def join_asof_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks up the user's most recent order on or
    before the event date (ties at the date resolved to max price) —
    one shuffle + one window pass, no join product."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.to_date("ts").alias("ts_date")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey"), F.col("o_orderdate"), F.round("o_totalprice", 2).alias("o_totalprice")
    )
    out = asof_join(
        ev,
        orders.withColumnRenamed("o_custkey", "user_id"),
        key="user_id",
        left_ts="ts_date",
        right_ts="o_orderdate",
        value_cols=["o_orderdate", "o_totalprice"],
        tie_break="o_totalprice",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("right_o_orderdate").cast("string").alias("last_order_date"),
        F.col("right_o_totalprice").alias("last_order_price"),
    )


@q(
    "join_range_price_bands",
    """
    WITH bands AS (
      SELECT o_orderpriority AS band,
             min(o_totalprice) AS lo,
             avg(o_totalprice) AS hi
      FROM orders GROUP BY o_orderpriority)
    SELECT band,
           cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(o_totalprice AS decimal(38,9))), 2) AS double) AS total
    FROM orders, bands
    WHERE o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band ORDER BY band
    """,
)
def join_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join via bucketed equi-join: orders priced inside
    each priority's [min, avg) band; candidates pruned by bucket id instead
    of a cross product."""
    orders = load_table(spark, sf_dir, "orders")
    bands = orders.groupBy(F.col("o_orderpriority").alias("band")).agg(
        F.min("o_totalprice").alias("lo"), F.avg("o_totalprice").alias("hi")
    )
    pts = orders.select("o_orderkey", "o_totalprice")
    joined = range_join_buckets(pts, bands, "o_totalprice", "lo", "hi", bucket_width=25000.0)
    return (
        joined.groupBy("band")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(38,9)")), 2)
            .cast("double")
            .alias("total"),
        )
        .orderBy("band")
    )


@q(
    "join_salted_skew",
    """
    SELECT p_brand, cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(l_quantity AS decimal(38,9))), 2) AS double) AS qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-way salted join (probe scattered, build replicated) — row-identical
    to the plain join, verified by the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    out = salted_join(li, part, "l_partkey", "p_partkey", salt=8)
    return (
        out.groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(38,9)")), 2)
            .cast("double")
            .alias("qty"),
        )
        .orderBy("p_brand")
    )


@q(
    "timeseries_gapfill",
    """
    WITH daily AS (
      SELECT c_mktsegment AS seg, cast(o_orderdate AS date) AS d,
             sum(cast(o_totalprice AS decimal(38,9))) AS rev
      FROM orders, customer
      WHERE o_custkey = c_custkey AND year(cast(o_orderdate AS date)) = 1998
      GROUP BY seg, d
    ),
    cal AS (SELECT cast(gs AS date) AS d
            FROM generate_series(DATE '1998-01-01', DATE '1998-12-31', INTERVAL 1 DAY) t(gs)),
    segs AS (SELECT DISTINCT c_mktsegment AS seg FROM customer),
    grid AS (SELECT seg, d FROM segs CROSS JOIN cal)
    SELECT g.seg,
           cast(g.d AS varchar) AS day,
           cast(round(coalesce(daily.rev, 0), 2) AS double) AS revenue,
           cast(round(coalesce(last_value(daily.rev IGNORE NULLS)
                 OVER (PARTITION BY g.seg ORDER BY g.d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0), 2)
                AS double) AS revenue_locf
    FROM grid g LEFT JOIN daily ON g.seg = daily.seg AND g.d = daily.d
    ORDER BY 1, 2
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill + last-observation-carried-forward over a daily
    revenue series (the time-series resample primitive the reference lacks).

    The dense calendar comes from one `sequence` literal exploded JVM-side
    (365 rows) cross-joined with the distinct segments — a broadcast-sized
    grid at any corpus scale, since its size is |segments| × |days|, not
    |rows|; the fact table contributes only its per-day aggregate.  LOCF is
    a running `last(ignorenulls)` window — one shuffle by segment."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    daily = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.year(F.col("o_orderdate").cast("date")) == 1998)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderdate").cast("date").alias("d"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,9)")).alias("rev"))
    )
    cal = spark.sql(
        "SELECT explode(sequence(DATE'1998-01-01', DATE'1998-12-31', INTERVAL 1 DAY)) AS d"
    )
    segs = customer.select(F.col("c_mktsegment").alias("seg")).distinct()
    grid = segs.crossJoin(cal)
    w = W.partitionBy("seg").orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        grid.join(daily, ["seg", "d"], "left")
        .select(
            "seg",
            F.col("d").cast("string").alias("day"),
            F.round(F.coalesce("rev", F.lit(0)), 2).cast("double").alias("revenue"),
            F.round(
                F.coalesce(F.last("rev", ignorenulls=True).over(w), F.lit(0)), 2
            )
            .cast("double")
            .alias("revenue_locf"),
        )
        .orderBy("seg", "day")
    )


@q(
    "scd2_user_history",
    """
    WITH ch AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events WHERE user_id < 200
    ),
    c2 AS (
      SELECT user_id, event_type, ts, event_id
      -- rn=1 kept unconditionally (mirrors the engine: a leading NULL attr
      -- still opens the first interval)
      FROM ch WHERE rn = 1 OR prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type,
           cast(ts AS varchar) AS valid_from,
           cast(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS varchar) AS valid_to
    FROM c2
    ORDER BY user_id, valid_from
    """,
)
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 compaction of the event stream: one interval row per
    change of a user's event_type (open interval has valid_to NULL).
    Single exchange: change-detect lag + interval-close lead share the
    per-user hash partitioning (operators/temporal.py::scd2_history)."""
    from ..operators.temporal import scd2_history

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 200)
        .select("user_id", "event_type", "ts", "event_id")
    )
    hist = scd2_history(ev, "user_id", "event_type", "ts", "event_id")
    return (
        hist.select(
            "user_id",
            "event_type",
            F.col("ts").cast("string").alias("valid_from"),
            F.col("valid_to").cast("string").alias("valid_to"),
        )
        .orderBy("user_id", "valid_from")
    )


@q(
    "timeseries_ewma",
    """
    WITH RECURSIVE base AS (
      SELECT user_id, event_id, cast(value AS double) AS value,
             cast(row_number() OVER (PARTITION BY user_id ORDER BY ts) AS bigint) AS rn
      FROM events WHERE user_id < 100
    ),
    rec AS (
      SELECT user_id, event_id, rn, value,
             value AS num, cast(1.0 AS double) AS den
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.user_id, b.event_id, b.rn, b.value,
             b.value + 0.7 * r.num, 1.0 + 0.7 * r.den
      FROM base b JOIN rec r ON b.user_id = r.user_id AND b.rn = r.rn + 1
    )
    SELECT user_id, event_id, round(value, 4) AS value, round(num / den, 4) AS ewma
    FROM rec ORDER BY user_id, event_id
    """,
)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA smoothing of the event value series (pandas
    ewm(alpha=0.3, adjust=True) kernel over ONE key-hash shuffle).  The
    adjust=True weighted mean is the ratio of two linear recurrences
    (num_t = x_t + (1-α)·num_{t-1}, den_t = 1 + (1-α)·den_{t-1}), which the
    DuckDB oracle replays as a recursive CTE — same double arithmetic, so
    hash-checkable at round(4).  Also pinned against pandas in
    tests/test_extra.py::test_ewma_matches_pandas."""
    from ..operators.temporal import ewma

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 100)
        .select("user_id", "ts", "event_id", "value")
    )
    out = ewma(ev, "user_id", "ts", "value", alpha=0.3)
    return out.select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value"),
        F.round("ewma", 4).alias("ewma"),
    ).orderBy("user_id", "event_id")


@q(
    "join_asof_nearest",
    """
    SELECT c.event_id,
           c.user_id,
           (SELECT p.event_id FROM events p
            WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
            ORDER BY abs(epoch_us(cast(p.ts AS timestamp))
                         - epoch_us(cast(c.ts AS timestamp))) ASC,
                     p.ts ASC, p.event_id DESC
            LIMIT 1) AS nearest_purchase
    FROM events c
    WHERE c.event_type = 'click'
    ORDER BY c.event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, direction='nearest' (completes the backward/forward/
    nearest family; pandas merge_asof semantics, ties prefer the earlier
    row): each click matched to the temporally closest purchase of the
    same user.  Both candidate carries share ONE user-hash exchange (two
    sorted window passes) — no click x purchase product at any scale."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    out = asof_join(
        clicks,
        purchases.select(F.col("p_user").alias("user_id"), F.col("p_ts").alias("ts2"),
                         F.col("p_id")),
        key="user_id",
        left_ts="ts",
        right_ts="ts2",
        value_cols=["p_id"],
        tie_break="p_id",
        direction="nearest",
    )
    return out.select(
        "event_id", "user_id", F.col("right_p_id").alias("nearest_purchase")
    ).orderBy("event_id")


_WS_A, _WS_B, _WS_P = 1103515245, 12345, 2_147_483_647
_WS_N = 10


@q(
    "sample_weighted",
    f"""
    WITH k AS (
      SELECT o_orderpriority, o_orderkey,
             -ln((((o_orderkey * {_WS_A} + {_WS_B}) % {_WS_P}) + 1) * 1.0
                 / (cast({_WS_P} AS bigint) + 1)) / o_totalprice AS skey
      FROM orders),
    r AS (
      SELECT o_orderpriority, o_orderkey,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY skey, o_orderkey) AS rn
      FROM k)
    SELECT o_orderpriority, cast(rn AS bigint) AS rank,
           cast(o_orderkey AS bigint) AS o_orderkey
    FROM r WHERE rn <= {_WS_N}
    ORDER BY o_orderpriority, rank
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, {n} per stratum
    (Efraimidis–Spirakis A-Res): each row draws u ∈ (0,1] from a portable
    integer hash of its key and scores −ln(u)/weight; the n smallest
    scores per group are an exact weighted sample.

    One scan + one TopK-per-group — selection probability ∝ o_totalprice
    with NO global pass over the weights (the classic cumulative-sum
    approach needs a prefix sum over all 100 TB; this needs per-group
    heaps of n rows).  Deterministic: the oracle replays the identical
    hash→u→score pipeline, so the sampled ids hash-match; swapping the
    hash seed re-rolls the sample.  This is the sampler a training-data
    pipeline uses for quality-weighted corpus subsampling.
    """
    orders = load_table(spark, sf_dir, "orders")
    u = (((F.col("o_orderkey") * _WS_A + _WS_B) % _WS_P) + 1) / F.lit(
        float(_WS_P + 1)
    )
    k = orders.select(
        "o_orderpriority",
        "o_orderkey",
        (-F.log(u) / F.col("o_totalprice")).alias("skey"),
    )
    w = W.partitionBy("o_orderpriority").orderBy("skey", "o_orderkey")
    return (
        k.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _WS_N)
        .select(
            "o_orderpriority",
            F.col("rn").cast("long").alias("rank"),
            "o_orderkey",
        )
        .orderBy("o_orderpriority", "rank")
    )


@q(
    "timeseries_seasonal_decompose",
    """
    WITH daily AS (
      SELECT event_type, cast(cast(ts AS timestamp) AS date) AS d,
             sum(value) AS v
      FROM events GROUP BY 1, 2),
    trended AS (
      SELECT event_type, d, v,
             avg(v) OVER (PARTITION BY event_type ORDER BY d
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
      FROM daily),
    detr AS (
      SELECT event_type,
             (datediff('day', DATE '1970-01-01', d) + 4) % 7 AS dow,
             v - trend AS resid0
      FROM trended)
    SELECT event_type, cast(dow AS int) AS dow,
           cast(round(cast(avg(resid0) AS decimal(38,9)), 2) AS double)
             AS seasonal,
           cast(count(*) AS bigint) AS n_days
    FROM detr GROUP BY event_type, dow
    ORDER BY event_type, dow
    """,
)
def timeseries_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical (moving-average) seasonal decomposition: daily totals per
    event_type → trend = centered 7-day rolling mean → seasonal index =
    mean detrended value per day-of-week.

    Day-of-week is computed portably as (days-since-1970 + 4) mod 7
    (0 = Sunday) — engine dayofweek() conventions differ, integer date
    arithmetic doesn't.  The rolling window and the final aggregate share
    one event_type partitioning; at 100 TB the pre-aggregation to
    |types|×|days| rows happens BEFORE any window work, so the window
    pass is metadata-sized regardless of raw event volume (same pre-agg
    discipline as `rollup_time_multigrain`).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.col("ts").cast("timestamp")).alias("d")
    ).agg(F.sum("value").alias("v"))
    w = W.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
    detr = daily.select(
        "event_type",
        ((F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")) + 4) % 7).alias(
            "dow"
        ),
        (F.col("v") - F.avg("v").over(w)).alias("resid0"),
    )
    return (
        detr.groupBy("event_type", F.col("dow").cast("int").alias("dow"))
        .agg(
            F.round(F.avg("resid0").cast("decimal(38,9)"), 2)
            .cast("double")
            .alias("seasonal"),
            F.count("*").alias("n_days"),
        )
        .orderBy("event_type", "dow")
    )
