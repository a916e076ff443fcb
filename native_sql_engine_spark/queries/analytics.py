"""Behavioral-analytics + data-management battery (beyond-reference).

Clickstream analytics the reference cannot express as single operators
(funnel, cohort retention, path n-grams), write-side MERGE/CDC semantics
(its sinks are plain file writes, SURVEY §2.1), tolerance/forward as-of
joins, and distribution statistics (quantile binning, winsorization,
fixed-width histograms, multi-granularity time rollups, inverted-index
postings).  Spark side is DataFrame API; ORACLE is the DuckDB-dialect
equivalent with identical column names (hash-stability conventions as in
tpch.py: computed doubles rounded, counts cast BIGINT, deterministic total
orders under LIMIT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..materialize import materialize
from ..operators.cdc import merge_upsert
from ..operators.temporal import asof_join

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
    "funnel_view_click_purchase",
    """
    WITH e1 AS (
      SELECT user_id, event_type, ts,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS fv
      FROM events),
    e2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts > fv THEN ts END)
               OVER (PARTITION BY user_id) AS fc
      FROM e1),
    e3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > fc THEN ts END)
               OVER (PARTITION BY user_id) AS fp
      FROM e2)
    SELECT cast(count(DISTINCT CASE WHEN fv IS NOT NULL THEN user_id END) AS bigint) AS n_view,
           cast(count(DISTINCT CASE WHEN fc IS NOT NULL THEN user_id END) AS bigint) AS n_click_after_view,
           cast(count(DISTINCT CASE WHEN fp IS NOT NULL THEN user_id END) AS bigint) AS n_purchase_after_click
    FROM e3
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: users counted at a
    stage only if the event happened strictly AFTER their first prior-stage
    event.  Three stacked windows over ONE user-hash partitioning (no
    self-joins, no event×event product); the final count-distinct
    re-aggregates user-level flags.  At 100 TB: state per user is O(1) and
    the only exchange is the single hash-by-user shuffle."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = W.partitionBy("user_id")
    e1 = ev.withColumn(
        "fv", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    e2 = e1.withColumn(
        "fc",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("fv")), F.col("ts"))
        ).over(w),
    )
    e3 = e2.withColumn(
        "fp",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("fc")), F.col("ts")
            )
        ).over(w),
    )
    return e3.agg(
        F.count_distinct(F.when(F.col("fv").isNotNull(), F.col("user_id"))).alias("n_view"),
        F.count_distinct(F.when(F.col("fc").isNotNull(), F.col("user_id"))).alias(
            "n_click_after_view"
        ),
        F.count_distinct(F.when(F.col("fp").isNotNull(), F.col("user_id"))).alias(
            "n_purchase_after_click"
        ),
    )


@q(
    "retention_cohort_weekly",
    """
    WITH firsts AS (
      SELECT user_id, cast(date_trunc('week', min(ts)) AS date) AS cohort
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, cast(date_trunc('week', ts) AS date) AS wk
      FROM events)
    SELECT cast(f.cohort AS varchar) AS cohort_week,
           cast(date_diff('day', f.cohort, a.wk) / 7 AS bigint) AS week_offset,
           cast(count(DISTINCT a.user_id) AS bigint) AS active_users
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    WHERE date_diff('day', f.cohort, a.wk) / 7 BETWEEN 0 AND 4
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def retention_cohort_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen ISO week,
    counted as active at week offsets 0–4.  Two aggregates share the
    user-hash shuffle (first-seen min + distinct user-weeks); the cohort
    side is |users| rows, the join is key-colocated.  The classic growth
    report the reference's batch-relational surface has no operator for."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    off = (F.datediff(F.col("wk"), F.col("cohort")) / 7).cast("long")
    return (
        firsts.join(activity, "user_id")
        .withColumn("week_offset", off)
        .filter((F.col("week_offset") >= 0) & (F.col("week_offset") <= 4))
        .groupBy(F.col("cohort").cast("string").alias("cohort_week"), "week_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@q(
    "cdc_merge_orders",
    """
    WITH tgt AS (
      SELECT o_orderkey, o_orderpriority,
             cast(o_totalprice AS decimal(18,2)) AS price
      FROM orders),
    merged AS (
      SELECT o_orderkey, o_orderpriority,
             cast(round(price * cast(1.10 AS decimal(3,2)), 2) AS decimal(18,2)) AS price
      FROM tgt WHERE o_orderkey % 97 = 0
      UNION ALL
      SELECT o_orderkey, o_orderpriority, price
      FROM tgt WHERE o_orderkey % 97 <> 0 AND o_orderkey % 101 <> 0)
    SELECT o_orderpriority, cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(price AS decimal(38,9))), 2) AS double) AS total
    FROM merged GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def cdc_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (operators/cdc.py::merge_upsert): a CDC batch of
    price updates (keys % 97 = 0, +10%) and deletes (keys % 101 = 0) applied
    onto the orders snapshot; verified through the post-merge aggregate.
    The snapshot is never shuffled — one broadcast left-anti join + union."""
    tgt = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    upd = (
        tgt.filter(F.col("o_orderkey") % 97 == 0)
        .withColumn(
            "price",
            F.round(F.col("price") * F.lit("1.10").cast("decimal(3,2)"), 2).cast(
                "decimal(18,2)"
            ),
        )
        .withColumn("op", F.lit("U"))
    )
    dels = (
        tgt.filter((F.col("o_orderkey") % 101 == 0) & (F.col("o_orderkey") % 97 != 0))
        .withColumn("op", F.lit("D"))
    )
    merged = merge_upsert(tgt, upd.unionByName(dels), key="o_orderkey")
    return (
        merged.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("price").cast("decimal(38,9)")), 2)
            .cast("double")
            .alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@q(
    "join_asof_forward_tolerance",
    """
    SELECT e.event_id, e.user_id,
           cast((SELECT min(o.o_orderdate) FROM orders o
                 WHERE o.o_custkey = e.user_id
                   AND o.o_orderdate >= cast(e.ts AS date)
                   AND date_diff('day', cast(e.ts AS date), o.o_orderdate) <= 30)
                AS varchar) AS next_order_date,
           (SELECT round(max(o.o_totalprice), 2) FROM orders o
            WHERE o.o_custkey = e.user_id
              AND o.o_orderdate = (SELECT min(o2.o_orderdate) FROM orders o2
                                   WHERE o2.o_custkey = e.user_id
                                     AND o2.o_orderdate >= cast(e.ts AS date)
                                     AND date_diff('day', cast(e.ts AS date),
                                                   o2.o_orderdate) <= 30))
             AS next_order_price
    FROM events e
    ORDER BY e.event_id
    """,
)
def join_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance (pandas merge_asof semantics): each
    event picks up the user's NEXT order within 30 days (ties at the date →
    max price).  Same union-merge single-shuffle plan as the backward as-of
    — time order reversed, matches outside the tolerance nulled — state per
    key stays O(1) at any scale."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.to_date("ts").alias("ts_date")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate"),
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    out = asof_join(
        ev,
        orders,
        key="user_id",
        left_ts="ts_date",
        right_ts="o_orderdate",
        value_cols=["o_orderdate", "o_totalprice"],
        tie_break="o_totalprice",
        direction="forward",
        tolerance=lambda lts, rts: F.datediff(rts, lts) <= 30,
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("right_o_orderdate").cast("string").alias("next_order_date"),
        F.col("right_o_totalprice").alias("next_order_price"),
    )


@q(
    "feature_binning_deciles",
    """
    WITH priced AS (
      SELECT c_mktsegment AS seg,
             cast(o_totalprice AS decimal(18,2)) AS price, o_orderkey,
             ntile(10) OVER (PARTITION BY c_mktsegment
                             ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders JOIN customer ON o_custkey = c_custkey)
    SELECT seg, decile, cast(count(*) AS bigint) AS n,
           cast(min(price) AS double) AS lo,
           cast(max(price) AS double) AS hi,
           cast(round(avg(cast(price AS decimal(38,9))), 2) AS double) AS mean_price
    FROM priced GROUP BY seg, decile ORDER BY seg, decile
    """,
)
def feature_binning_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile feature binning: per-segment price deciles (ntile) with
    per-bin stats — the feature-engineering discretization primitive.
    The window partitions by segment so the sort is per-partition-parallel;
    at 100 TB swap ntile for approx-quantile boundaries broadcast to a
    map-side width assignment (same output schema, documented trade)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    priced = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
            "o_orderkey",
            F.col("o_totalprice").alias("raw_price"),
        )
        .withColumn(
            "decile",
            F.ntile(10).over(W.partitionBy("seg").orderBy("raw_price", "o_orderkey")),
        )
    )
    return (
        priced.groupBy("seg", "decile")
        .agg(
            F.count("*").alias("n"),
            F.min("price").cast("double").alias("lo"),
            F.max("price").cast("double").alias("hi"),
            F.round(F.avg(F.col("price").cast("decimal(38,9)")), 2)
            .cast("double")
            .alias("mean_price"),
        )
        .orderBy("seg", "decile")
    )


@q(
    "outlier_winsorize",
    """
    WITH bounds AS (
      SELECT c_mktsegment AS seg,
             quantile_cont(o_totalprice, 0.05) AS p05,
             quantile_cont(o_totalprice, 0.95) AS p95
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1)
    SELECT b.seg, cast(count(*) AS bigint) AS n,
           cast(round(avg(o_totalprice), 2) AS double) AS raw_mean,
           cast(round(avg(least(greatest(o_totalprice, b.p05), b.p95)), 2) AS double)
             AS winsorized_mean
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN bounds b ON b.seg = c_mktsegment
    GROUP BY b.seg ORDER BY b.seg
    """,
)
def outlier_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p05/p95-clamped) mean per segment — the outlier-robust
    statistic pass of a feature pipeline.  Two aggregates: exact
    interpolated percentiles per segment (tiny result, broadcast back),
    then one clamped mean over the same join — the fact side shuffles
    once and the bounds join is a broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(cust, F.col("o_custkey") == F.col("c_custkey")).select(
        F.col("c_mktsegment").alias("seg"), "o_totalprice"
    )
    bounds = joined.groupBy("seg").agg(
        F.percentile("o_totalprice", 0.05).alias("p05"),
        F.percentile("o_totalprice", 0.95).alias("p95"),
    )
    return (
        joined.join(F.broadcast(bounds), "seg")
        .groupBy("seg")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("o_totalprice"), 2).cast("double").alias("raw_mean"),
            F.round(
                F.avg(F.least(F.greatest(F.col("o_totalprice"), F.col("p05")), F.col("p95"))),
                2,
            )
            .cast("double")
            .alias("winsorized_mean"),
        )
        .orderBy("seg")
    )


@q(
    "rollup_time_multigrain",
    """
    SELECT cast(year(cast(o_orderdate AS date)) AS int) AS yr,
           cast(quarter(cast(o_orderdate AS date)) AS int) AS qtr,
           cast(month(cast(o_orderdate AS date)) AS int) AS mon,
           cast(grouping(year(cast(o_orderdate AS date))) +
                grouping(quarter(cast(o_orderdate AS date))) +
                grouping(month(cast(o_orderdate AS date))) AS int) AS grain,
           cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(o_totalprice AS decimal(38,9))), 2) AS double) AS revenue
    FROM orders
    GROUP BY ROLLUP(year(cast(o_orderdate AS date)),
                    quarter(cast(o_orderdate AS date)),
                    month(cast(o_orderdate AS date)))
    ORDER BY grain, yr NULLS FIRST, qtr NULLS FIRST, mon NULLS FIRST
    """,
)
def rollup_time_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity time rollup: ONE pass produces the
    month, quarter, year, and grand-total revenue series via ROLLUP (the
    reference's ColumnarExpandExec shape, SURVEY §2.4) — at 100 TB this
    replaces four separate scans with one Expand over the partial
    aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_rollup_orders")
    return spark.sql(
        """
        SELECT cast(year(cast(o_orderdate AS date)) AS int) AS yr,
               cast(quarter(cast(o_orderdate AS date)) AS int) AS qtr,
               cast(month(cast(o_orderdate AS date)) AS int) AS mon,
               cast(grouping(year(cast(o_orderdate AS date))) +
                    grouping(quarter(cast(o_orderdate AS date))) +
                    grouping(month(cast(o_orderdate AS date))) AS int) AS grain,
               cast(count(*) AS bigint) AS n,
               cast(round(sum(cast(o_totalprice AS decimal(38,9))), 2) AS double) AS revenue
        FROM _rollup_orders
        GROUP BY ROLLUP(year(cast(o_orderdate AS date)),
                        quarter(cast(o_orderdate AS date)),
                        month(cast(o_orderdate AS date)))
        ORDER BY grain, yr NULLS FIRST, qtr NULLS FIRST, mon NULLS FIRST
        """
    )


@q(
    "inverted_index_postings",
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS tok
      FROM documents)
    SELECT tok, cast(count(DISTINCT doc_id) AS bigint) AS df,
           array_to_string((list_sort(list(DISTINCT doc_id)))[1:5], ',') AS posting_head
    FROM toks WHERE length(tok) >= 4
    GROUP BY tok ORDER BY df DESC, tok LIMIT 50
    """,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (token → document-frequency + head of the sorted
    posting list) over the corpus: explode codegen'd tokenization, ONE hash
    aggregate keyed by token (collect_set is map-side combined), top-50 by
    document frequency.  The full posting list is the same plan without the
    slice; at 100 TB postings shard naturally by token hash."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("tok"),
    ).filter(F.length("tok") >= 4)
    return (
        toks.groupBy("tok")
        .agg(
            F.count_distinct("doc_id").alias("df"),
            # comma-joined string (not array): the only battery output that
            # would otherwise carry a complex type through the driver's
            # value-hash compare
            F.array_join(F.slice(F.sort_array(F.collect_set("doc_id")), 1, 5), ",").alias(
                "posting_head"
            ),
        )
        .orderBy(F.col("df").desc(), "tok")
        .limit(50)
    )


@q(
    "agg_histogram_fixed",
    """
    WITH b AS (
      SELECT CASE WHEN l_extendedprice < 0 THEN 0
                  WHEN l_extendedprice >= 100000 THEN 21
                  ELSE cast(floor(l_extendedprice / 5000.0) AS bigint) + 1 END AS bucket,
             l_extendedprice
      FROM lineitem)
    SELECT bucket, cast(count(*) AS bigint) AS n,
           cast(round(min(l_extendedprice), 2) AS double) AS lo,
           cast(round(max(l_extendedprice), 2) AS double) AS hi
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def agg_histogram_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width 20-bucket histogram of l_extendedprice on [0, 100000)
    via `width_bucket` — a pure map-side expression + one hash aggregate
    (shuffles 22 rows max at any scale); the distribution-profiling
    primitive behind data-quality dashboards."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.width_bucket(F.col("l_extendedprice"), F.lit(0.0), F.lit(100000.0), F.lit(20))
            .alias("bucket"),
            "l_extendedprice",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("l_extendedprice"), 2).cast("double").alias("lo"),
            F.round(F.max("l_extendedprice"), 2).cast("double").alias("hi"),
        )
        .orderBy("bucket")
    )


@q(
    "events_top_paths",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
             lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      FROM events)
    SELECT event_type || '>' || e2 || '>' || e3 AS path,
           cast(count(*) AS bigint) AS n
    FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY path ORDER BY n DESC, path LIMIT 20
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step user paths (clickstream sequence mining): two
    `lead` windows over one user-hash shuffle emit every consecutive
    event-type trigram, then a hash aggregate counts them.  No self-joins
    — the naive 3-way event join is quadratic on hot users; this is linear
    with O(1) window state."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("e2", F.lead("event_type", 1).over(w)).withColumn(
        "e3", F.lead("event_type", 2).over(w)
    )
    return (
        seq.filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path"),
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


@q(
    "rollup_incremental_merge",
    """
    WITH base AS (
      SELECT strftime(cast(o_orderdate AS date), '%Y-%m') AS mon,
             cast(count(*) AS bigint) AS n,
             sum(cast(o_totalprice AS decimal(38,9))) AS rev
      FROM orders WHERE cast(o_orderdate AS date) < DATE '1998-01-01'
      GROUP BY mon),
    delta AS (
      SELECT strftime(cast(o_orderdate AS date), '%Y-%m') AS mon,
             cast(count(*) AS bigint) AS n,
             sum(cast(o_totalprice AS decimal(38,9))) AS rev
      FROM orders WHERE cast(o_orderdate AS date) >= DATE '1998-01-01'
      GROUP BY mon)
    SELECT mon, cast(sum(n) AS bigint) AS n,
           cast(round(sum(rev), 2) AS double) AS revenue
    FROM (SELECT * FROM base UNION ALL SELECT * FROM delta) t
    GROUP BY mon ORDER BY mon
    """,
)
def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup maintenance: yesterday's aggregate
    table merges with today's delta partition by RE-AGGREGATING partials
    (sum-of-sums, sum-of-counts) — no re-read of history.  The oracle
    recomputes from scratch, proving partial-merge exactness (decimal sums
    are associative).  At 100 TB this is the only affordable way to keep a
    rollup current: cost is O(delta + |rollup|), not O(history)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d"),
        F.col("o_totalprice").cast("decimal(38,9)").alias("price"),
    )
    cutoff = F.lit("1998-01-01").cast("date")

    def agg(df):
        return df.groupBy(F.date_format("d", "yyyy-MM").alias("mon")).agg(
            F.count("*").alias("n"), F.sum("price").alias("rev")
        )

    base = agg(orders.filter(F.col("d") < cutoff))      # the stored rollup
    delta = agg(orders.filter(F.col("d") >= cutoff))    # today's partition
    return (
        base.unionByName(delta)
        .groupBy("mon")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
        )
        .orderBy("mon")
    )


@q(
    "events_anomaly_mad",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_type, e.value, abs(e.value - m.med) AS absdev, m.med
      FROM events e JOIN med m ON e.event_type = m.event_type),
    mad AS (
      SELECT event_type, quantile_cont(absdev, 0.5) AS mad
      FROM dev GROUP BY event_type)
    SELECT d.event_type,
           cast(count(*) AS bigint) AS n,
           cast(round(max(d.med), 4) AS double) AS med,
           cast(round(max(m.mad), 4) AS double) AS mad,
           cast(sum(CASE WHEN d.absdev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
                AS bigint) AS n_outliers
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type ORDER BY d.event_type
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: median-absolute-deviation outliers per
    event type (|x − med| > 3·1.4826·MAD — the robust z-score that mean/
    stddev-based detection gets wrong under heavy tails).  Two exact-
    percentile aggregates with their tiny per-type results broadcast back;
    the events table streams through twice, never self-joins."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "absdev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.percentile("absdev", 0.5).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.max("med"), 4).cast("double").alias("med"),
            F.round(F.max("mad"), 4).cast("double").alias("mad"),
            F.sum(
                F.when(F.col("absdev") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@q(
    "text_keywords_per_doc",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_distinct(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                              s -> len(s) >= 4))) AS tok
      FROM documents),
    tf AS (
      SELECT t.doc_id, t.tok,
             len(list_filter(string_split_regex(lower(d.text), '[^a-z]+'),
                             s -> s = t.tok)) AS tf
      FROM toks t JOIN documents d ON t.doc_id = d.doc_id),
    df AS (SELECT tok, cast(count(*) AS bigint) AS df FROM toks GROUP BY tok),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok, tf.tf, df.df,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, df.df ASC, tf.tok) AS rnk,
             round(tf.tf * ln(n.n_docs * 1.0 / df.df), 4) AS tfidf
      FROM tf, df, n WHERE tf.tok = df.tok)
    SELECT doc_id, tok, cast(tf AS bigint) AS tf, df, tfidf
    FROM scored WHERE rnk <= 3 AND doc_id < 100
    ORDER BY doc_id, tf DESC, df, tok
    """,
)
def text_keywords_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 tokens by TF-IDF (ranked on
    integer (tf desc, df asc, tok) so ordering is engine-exact; the float
    tfidf is a reported score, not the sort key).  One explode + two hash
    aggregates sharing the token keying + a broadcast of the DF table —
    the per-doc window never sees more than the doc's own tokens."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("tok"),
        )
        .filter(F.length("tok") >= 4)
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    w = W.partitionBy("doc_id").orderBy(F.col("tf").desc(), F.col("df").asc(), "tok")
    return (
        tf.join(dfreq, "tok")
        .withColumn("rnk", F.row_number().over(w))
        .filter((F.col("rnk") <= 3) & (F.col("doc_id") < 100))
        .select(
            "doc_id",
            "tok",
            F.col("tf").cast("bigint").alias("tf"),
            "df",
            F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4).alias(
                "tfidf"
            ),
        )
        .orderBy("doc_id", F.col("tf").desc(), "df", "tok")
    )


@q(
    "attribution_last_touch",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, value,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch,
             last_value(CASE WHEN event_type <> 'purchase' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_ts
      FROM events)
    SELECT coalesce(CASE WHEN date_diff('day', cast(touch_ts AS timestamp),
                                        cast(ts AS timestamp)) <= 7
                         THEN touch END, 'direct') AS channel,
           cast(count(*) AS bigint) AS n_purchases,
           cast(round(sum(cast(value AS decimal(38,9))), 2) AS double) AS revenue
    FROM seq WHERE event_type = 'purchase'
    GROUP BY channel ORDER BY channel
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the user's
    most recent preceding non-purchase event within a 7-day lookback
    ('direct' when none).  One user-hash shuffle, two `last(ignorenulls)`
    windows over a 1-PRECEDING frame — the naive formulation is a
    purchase×event self-join that explodes on active users; this is
    linear with O(1) window state."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    non_purchase = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    np_ts = F.when(F.col("event_type") != "purchase", F.col("ts"))
    seq = ev.withColumn("touch", F.last(non_purchase, ignorenulls=True).over(w)).withColumn(
        "touch_ts", F.last(np_ts, ignorenulls=True).over(w)
    )
    channel = F.coalesce(
        F.when(F.datediff(F.col("ts"), F.col("touch_ts")) <= 7, F.col("touch")),
        F.lit("direct"),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .select(channel.alias("channel"), "value")
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum(F.col("value").cast("decimal(38,9)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("channel")
    )


@q(
    "graph_pagerank",
    """
    WITH edges AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        WHERE a.l_shipdate < date '1998-01-01' AND b.l_shipdate < date '1998-01-01'
    ),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    nn AS (SELECT count(*) AS n FROM nodes),
    contrib AS (SELECT e.src, e.dst, 1.0 / d.outdeg AS w
                FROM edges e JOIN deg d ON e.src = d.src),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
    r1 AS (SELECT nodes.node,
                  0.15 / (SELECT n FROM nn)
                  + 0.85 * coalesce(m.mass, 0.0) AS rank
           FROM nodes LEFT JOIN (
               SELECT c.dst, sum(r.rank * c.w) AS mass
               FROM contrib c JOIN r0 r ON c.src = r.node GROUP BY c.dst
           ) m ON nodes.node = m.dst),
    r2 AS (SELECT nodes.node,
                  0.15 / (SELECT n FROM nn)
                  + 0.85 * coalesce(m.mass, 0.0) AS rank
           FROM nodes LEFT JOIN (
               SELECT c.dst, sum(r.rank * c.w) AS mass
               FROM contrib c JOIN r1 r ON c.src = r.node GROUP BY c.dst
           ) m ON nodes.node = m.dst),
    r3 AS (SELECT nodes.node,
                  0.15 / (SELECT n FROM nn)
                  + 0.85 * coalesce(m.mass, 0.0) AS rank
           FROM nodes LEFT JOIN (
               SELECT c.dst, sum(r.rank * c.w) AS mass
               FROM contrib c JOIN r2 r ON c.src = r.node GROUP BY c.dst
           ) m ON nodes.node = m.dst)
    SELECT cast(node AS bigint) AS node, round(rank * 1000, 8) AS rank_permille
    FROM r3
    ORDER BY round(rank * 1000, 8) DESC, node
    LIMIT 20
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph (parts sharing an order are
    linked, both directions).  Each power iteration is one join-shuffle plus
    one hash aggregate — the plan a Pregel engine lowers to — with edges,
    degrees and per-edge contributions cached across iterations.  No graph
    surface exists in the reference at all."""
    from ..operators.graph import pagerank

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < "1998-01-01")
        .select("l_orderkey", "l_partkey")
    )
    other = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("dst")
    )
    edges = (
        li.join(other, (li.l_orderkey == other.o2) & (li.l_partkey != other.dst))
        .select(F.col("l_partkey").alias("src"), "dst")
    )
    ranks = pagerank(edges, iterations=3, damping=0.85, symmetric=True)
    scaled = F.round(F.col("rank") * 1000, 8).alias("rank_permille")
    return (
        ranks.select(F.col("node").cast("bigint").alias("node"), scaled)
        .orderBy(F.col("rank_permille").desc(), "node")
        .limit(20)
    )


@q(
    "profile_columns",
    """
    SELECT 'o_orderkey' AS col,
           cast(count(o_orderkey) AS bigint) AS n_nonnull,
           cast(count(*) - count(o_orderkey) AS bigint) AS n_null,
           cast(count(DISTINCT o_orderkey) AS bigint) AS n_distinct,
           round(min(o_orderkey), 2) AS min_num, round(max(o_orderkey), 2) AS max_num,
           cast(NULL AS varchar) AS min_str, cast(NULL AS varchar) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey', cast(count(o_custkey) AS bigint),
           cast(count(*) - count(o_custkey) AS bigint),
           cast(count(DISTINCT o_custkey) AS bigint),
           round(min(o_custkey), 2), round(max(o_custkey), 2), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', cast(count(o_totalprice) AS bigint),
           cast(count(*) - count(o_totalprice) AS bigint),
           cast(count(DISTINCT o_totalprice) AS bigint),
           round(min(o_totalprice), 2), round(max(o_totalprice), 2), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', cast(count(o_orderstatus) AS bigint),
           cast(count(*) - count(o_orderstatus) AS bigint),
           cast(count(DISTINCT o_orderstatus) AS bigint),
           NULL, NULL, min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', cast(count(o_orderpriority) AS bigint),
           cast(count(*) - count(o_orderpriority) AS bigint),
           cast(count(DISTINCT o_orderpriority) AS bigint),
           NULL, NULL, min(o_orderpriority), max(o_orderpriority)
    FROM orders
    ORDER BY col
    """,
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (the ANALYZE TABLE / data-catalog stats collector a
    100 TB lakehouse runs before planning): per-column non-null / null /
    exact-distinct counts and min-max, one dedup-then-profile aggregate per
    column, unioned.  Columnar pruning makes the per-column scans
    I/O-equivalent to a single five-column pass, and every aggregation
    stays a two-phase codegen'd HashAggregate — the multi-countDistinct
    Expand form this replaces forced min/max(string) buffers into every
    stage, turning the 6×-expanded scan into Sort + SortAggregate chains."""
    o = load_table(spark, sf_dir, "orders")
    num_cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    str_cols = ["o_orderstatus", "o_orderpriority"]

    def col_profile(c: str, numeric: bool):
        # dedup-first: groupBy(value) is a two-phase codegen'd HashAggregate
        # (string GROUP KEYS are hash-friendly; it is string AGG BUFFERS that
        # are not), and the follow-up stats run over the tiny distinct set —
        # so the string min/max SortAggregate sees |distinct| rows with no
        # grouping keys (no sort inserted).  The multi-countDistinct Expand
        # form this replaces put min/max(string) buffers into every stage:
        # the whole 6×-expanded scan went through Sort + SortAggregate
        # chains.  I/O is unchanged: columnar pruning means five one-column
        # scans read the same bytes as one five-column scan.
        d = o.groupBy(F.col(c)).agg(F.count("*").alias("_cnt"))
        stats = [
            F.sum(F.when(F.col(c).isNotNull(), F.col("_cnt")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_nonnull"),
            F.sum(F.when(F.col(c).isNull(), F.col("_cnt")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_null"),
            F.count(F.col(c)).alias("n_distinct"),
        ]
        if numeric:
            stats += [
                F.round(F.min(F.col(c)).cast("double"), 2).alias("min_num"),
                F.round(F.max(F.col(c)).cast("double"), 2).alias("max_num"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            ]
        else:
            stats += [
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                F.min(F.col(c)).alias("min_str"),
                F.max(F.col(c)).alias("max_str"),
            ]
        return d.agg(*stats).select(F.lit(c).alias("col"), "*")

    out = col_profile(num_cols[0], True)
    for c in num_cols[1:]:
        out = out.unionAll(col_profile(c, True))
    for c in str_cols:
        out = out.unionAll(col_profile(c, False))
    return out.orderBy("col")


@q(
    "quality_expectations",
    """
    SELECT 'enum_orderstatus' AS check_name,
           cast(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
                AS bigint) AS violations
    FROM orders
    UNION ALL
    SELECT 'fk_orders_customer',
           cast(count(*) AS bigint)
    FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
    UNION ALL
    SELECT 'null_orderdate',
           cast(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS bigint)
    FROM orders
    UNION ALL
    SELECT 'pk_orders_unique',
           cast(count(*) - count(DISTINCT o_orderkey) AS bigint)
    FROM orders
    UNION ALL
    SELECT 'range_totalprice_nonpositive',
           cast(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS bigint)
    FROM orders
    ORDER BY check_name
    """,
)
def quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (Deequ/GX-style expectations) compiled
    to a minimal plan: the three row-level predicates fuse into ONE scan's
    conditional aggregates, uniqueness is a distinct-count delta on the same
    scan, and referential integrity is a broadcast left-anti probe — the
    shape that still works when orders is 100 TB and customer is the only
    thing small enough to ship."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    rowlevel = o.agg(
        F.sum((~F.col("o_orderstatus").isin("O", "F", "P")).cast("bigint")).alias(
            "enum_orderstatus"
        ),
        F.sum(F.col("o_orderdate").isNull().cast("bigint")).alias("null_orderdate"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("pk_orders_unique"),
        F.sum((F.col("o_totalprice") <= 0).cast("bigint")).alias(
            "range_totalprice_nonpositive"
        ),
    )
    fk = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("fk_orders_customer"))
    )
    long = rowlevel.selectExpr(
        "stack(4, 'enum_orderstatus', enum_orderstatus, "
        "'null_orderdate', null_orderdate, "
        "'pk_orders_unique', pk_orders_unique, "
        "'range_totalprice_nonpositive', range_totalprice_nonpositive) "
        "AS (check_name, violations)"
    ).unionAll(
        fk.selectExpr("'fk_orders_customer' AS check_name", "fk_orders_customer AS violations")
    )
    return long.orderBy("check_name")


@q(
    "events_session_window",
    """
    WITH g AS (
      SELECT user_id, epoch(cast(ts AS timestamp)) AS es,
             CASE WHEN epoch(cast(ts AS timestamp))
                       - lag(epoch(cast(ts AS timestamp)), 1)
                         OVER (PARTITION BY user_id ORDER BY ts)
                       > 900
                       OR lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events),
    s AS (
      SELECT user_id, es,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY es
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM g)
    SELECT user_id,
           cast(count(DISTINCT sess_id) AS bigint) AS n_sessions,
           cast(sum(span) AS bigint) AS total_span_s,
           cast(max(cnt) AS bigint) AS max_events
    FROM (SELECT user_id, sess_id, count(*) AS cnt,
                 floor(max(es)) - floor(min(es)) AS span
          FROM s GROUP BY user_id, sess_id) t
    GROUP BY user_id ORDER BY user_id
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in session_window aggregation in BATCH mode (15-min gap):
    Spark's native gap-merge operator, the same machinery the streaming
    battery uses, cross-checked against the lag+cumsum island oracle.
    One shuffle on user_id; session merge happens inside the aggregate."""
    ev = load_table(spark, sf_dir, "events")
    per_sess = (
        ev.groupBy("user_id", F.session_window("ts", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("cnt"),
            (
                F.floor(F.unix_timestamp(F.max("ts")))
                - F.floor(F.unix_timestamp(F.min("ts")))
            ).alias("span"),
        )
    )
    return (
        per_sess.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("span").cast("bigint").alias("total_span_s"),
            F.max("cnt").cast("bigint").alias("max_events"),
        )
        .orderBy("user_id")
    )


@q(
    "graph_bfs_hops",
    """
    WITH edges AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        WHERE a.l_shipdate < date '1998-01-01' AND b.l_shipdate < date '1998-01-01'
    ),
    l0 AS (SELECT DISTINCT src AS node FROM edges WHERE src <= 10),
    l1 AS (SELECT DISTINCT e.dst AS node FROM edges e JOIN l0 ON e.src = l0.node
           WHERE e.dst NOT IN (SELECT node FROM l0)),
    l2 AS (SELECT DISTINCT e.dst AS node FROM edges e JOIN l1 ON e.src = l1.node
           WHERE e.dst NOT IN (SELECT node FROM l0 UNION ALL SELECT node FROM l1)),
    l3 AS (SELECT DISTINCT e.dst AS node FROM edges e JOIN l2 ON e.src = l2.node
           WHERE e.dst NOT IN (SELECT node FROM l0 UNION ALL SELECT node FROM l1
                               UNION ALL SELECT node FROM l2)),
    all_d AS (
        SELECT node, 0 AS dist FROM l0
        UNION ALL SELECT node, 1 FROM l1
        UNION ALL SELECT node, 2 FROM l2
        UNION ALL SELECT node, 3 FROM l3
    )
    SELECT dist, cast(count(*) AS bigint) AS n_nodes,
           cast(min(node) AS bigint) AS min_node,
           cast(max(node) AS bigint) AS max_node
    FROM all_d GROUP BY dist ORDER BY dist
    """,
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances (≤3) from the low-key part hub set over the same
    co-purchase graph as graph_pagerank: per hop one frontier⋈edges shuffle
    plus a left-anti visited probe — node-bounded state, no path explosion.
    Oracle unrolls the three levels with NOT-IN dedup."""
    from ..operators.graph import shortest_paths

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < "1998-01-01")
        .select("l_orderkey", "l_partkey")
    )
    other = li.select(F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("dst"))
    # materialize the co-purchase edge build ONCE and derive both the edge
    # list and the source set from it: sources previously hung off the
    # unmaterialized pipeline, so the self-join + distinct ran a second
    # time into the frontier checkpoint (guide §2.4 — don't recompute what
    # a consumer already materialized)
    edges = materialize(
        li.join(other, (li.l_orderkey == other.o2) & (li.l_partkey != other.dst))
        .select(F.col("l_partkey").alias("src"), "dst")
        .distinct()
    )
    sources = edges.select(F.col("src").alias("node")).filter(F.col("node") <= 10)
    d = shortest_paths(edges, sources, max_hops=3, edges_materialized=True)
    return (
        d.groupBy("dist")
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("node").cast("bigint").alias("min_node"),
            F.max("node").cast("bigint").alias("max_node"),
        )
        .orderBy("dist")
    )


@q(
    "graph_triangles",
    """
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        WHERE a.l_shipdate < date '1997-01-01' AND b.l_shipdate < date '1997-01-01'
    ),
    deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY src),
    oriented AS (
        SELECT e.src, e.dst FROM e
        JOIN deg s ON s.node = e.src
        JOIN deg t ON t.node = e.dst
        WHERE s.d < t.d OR (s.d = t.d AND e.src < e.dst)
    ),
    wedges AS (
        SELECT o1.src AS a, o2.dst AS c
        FROM oriented o1 JOIN oriented o2 ON o1.dst = o2.src
    )
    SELECT cast(count(*) AS bigint) AS n_triangles
    FROM wedges w JOIN oriented o ON w.a = o.src AND w.c = o.dst
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the (1997-scoped) co-purchase graph via
    degree-ordered orientation — each triangle becomes exactly one wedge +
    one closing-edge hash lookup, and per-node wedge fan-out is bounded by
    the oriented out-degree (≤ sqrt(2|E|)), so the plan survives power-law
    hubs that explode the naive wedge join."""
    from ..operators.graph import triangle_count

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < "1997-01-01")
        .select("l_orderkey", "l_partkey")
    )
    other = li.select(F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("dst"))
    edges = (
        li.join(other, (li.l_orderkey == other.o2) & (li.l_partkey != other.dst))
        .select(F.col("l_partkey").alias("src"), "dst")
    )
    return triangle_count(edges)


@q(
    "events_session_window_dynamic",
    """
    WITH g AS (
      SELECT user_id, ts, epoch_us(cast(ts AS timestamp)) AS es,
             CASE WHEN event_type = 'click' THEN 300000000
                  ELSE 1800000000 END AS gap_us
      FROM events),
    marked AS (
      SELECT user_id, es,
             CASE WHEN max(es + gap_us) OVER (
                        PARTITION BY user_id ORDER BY es
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       IS NULL
                    OR es >= max(es + gap_us) OVER (
                        PARTITION BY user_id ORDER BY es
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_sess
      FROM g),
    s AS (
      SELECT user_id,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY es
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked)
    SELECT user_id,
           cast(count(DISTINCT sess_id) AS bigint) AS n_sessions,
           cast(max(cnt) AS bigint) AS max_events
    FROM (SELECT user_id, sess_id, count(*) AS cnt FROM s GROUP BY user_id, sess_id) t
    GROUP BY user_id ORDER BY user_id
    """,
)
def events_session_window_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap session windows (Spark's session_window with a per-event
    gap expression: clicks cool off in 5 minutes, everything else in 30):
    each event contributes [ts, ts+gap) and overlapping intervals merge
    inside the native gap-merge aggregate.  The oracle is the interval-
    union island formulation — a running max of interval ends over one
    user-hash window."""
    ev = load_table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "click", F.lit("5 minutes")).otherwise(
        F.lit("30 minutes")
    )
    per_sess = ev.groupBy("user_id", F.session_window("ts", gap).alias("w")).agg(
        F.count("*").alias("cnt")
    )
    return (
        per_sess.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("cnt").cast("bigint").alias("max_events"),
        )
        .orderBy("user_id")
    )


@q(
    "events_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    pairs AS (
      SELECT event_type AS src, next_type AS dst, count(*) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
    tot AS (SELECT src, sum(n) AS t FROM pairs GROUP BY src)
    SELECT p.src, p.dst, cast(p.n AS bigint) AS n,
           cast(round(p.n * 1.0 / t.t, 4) AS double) AS prob
    FROM pairs p JOIN tot t USING (src)
    ORDER BY src, dst
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event sequences
    (click→purchase probability etc.) — the user-journey model behind
    next-action prediction and anomalous-flow detection.

    One (user) shuffle serves the sequencing window; the transition
    counts are a hash agg over ≤|types|² rows, so the matrix costs one
    pass at any scale (same partition-sharing discipline as
    `timeseries_ohlc_bars`).  Probabilities are exact-integer ratios —
    deterministic across engines.  Ties in the event order break on
    event_id, making the sequence (and the matrix) replay-stable."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    pairs = seq.groupBy(
        F.col("event_type").alias("src"), F.col("next_type").alias("dst")
    ).agg(F.count("*").alias("n"))
    tot = pairs.groupBy("src").agg(F.sum("n").alias("t"))
    return (
        pairs.join(tot, "src")
        .select(
            "src",
            "dst",
            "n",
            F.round(F.col("n") / F.col("t"), 4).cast("double").alias("prob"),
        )
        .orderBy("src", "dst")
    )


@q(
    "analytics_pareto_abc",
    """
    WITH rev AS (
      SELECT s.s_nationkey, l.l_suppkey,
             sum(cast(l.l_extendedprice AS decimal(38,9))) AS revenue
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_nationkey, l.l_suppkey),
    ranked AS (
      SELECT s_nationkey, l_suppkey, revenue,
             sum(revenue) OVER (PARTITION BY s_nationkey
                                ORDER BY revenue DESC, l_suppkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cum,
             sum(revenue) OVER (PARTITION BY s_nationkey) AS tot
      FROM rev)
    SELECT cast(s_nationkey AS bigint) AS nationkey,
           cast(l_suppkey AS bigint) AS suppkey,
           cast(round(revenue, 2) AS double) AS revenue,
           CASE WHEN cum * 2 <= tot THEN 'A'
                WHEN cum * 5 <= tot * 4 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked ORDER BY nationkey, suppkey
    """,
)
def analytics_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification: per nation, suppliers ranked by
    revenue get class A (first half of cumulative revenue), B (to 80%),
    C (tail) — the inventory-analytics classic.

    The ranking window, cumulative sum, and per-group total share ONE
    (nationkey) hash partitioning; classification thresholds are
    EXACT-DECIMAL integer comparisons (cum·2 ≤ tot, cum·5 ≤ 4·tot) on
    decimal(38,9) sums, so the class boundaries are bit-identical across
    engines — no float cumulative-share hazard.  Partitioning by nation
    keeps every window bounded; there is no global ordering anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(38,9)")).alias("revenue"))
    )
    w_cum = (
        W.partitionBy("s_nationkey")
        .orderBy(F.desc("revenue"), "l_suppkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_tot = W.partitionBy("s_nationkey")
    ranked = rev.select(
        "s_nationkey",
        "l_suppkey",
        "revenue",
        F.sum("revenue").over(w_cum).alias("cum"),
        F.sum("revenue").over(w_tot).alias("tot"),
    )
    return ranked.select(
        F.col("s_nationkey").alias("nationkey"),
        F.col("l_suppkey").alias("suppkey"),
        F.round("revenue", 2).cast("double").alias("revenue"),
        F.when(F.col("cum") * 2 <= F.col("tot"), "A")
        .when(F.col("cum") * 5 <= F.col("tot") * 4, "B")
        .otherwise("C")
        .alias("abc_class"),
    ).orderBy("nationkey", "suppkey")


@q(
    "events_pmi_cooccurrence",
    """
    WITH grp AS (
      SELECT DISTINCT user_id, cast(cast(ts AS timestamp) AS date) AS d,
             event_type
      FROM events),
    n AS (
      SELECT count(DISTINCT (user_id, d)) AS n_groups FROM grp),
    singles AS (
      SELECT event_type, count(*) AS c FROM grp GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS t_a, b.event_type AS t_b, count(*) AS c_ab
      FROM grp a JOIN grp b
        ON a.user_id = b.user_id AND a.d = b.d AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT p.t_a, p.t_b, cast(p.c_ab AS bigint) AS c_ab,
           cast(round(ln(p.c_ab * 1.0 * n.n_groups / (sa.c * 1.0 * sb.c)), 4)
                AS double) AS pmi
    FROM pairs p JOIN singles sa ON sa.event_type = p.t_a
                 JOIN singles sb ON sb.event_type = p.t_b
                 CROSS JOIN n
    ORDER BY t_a, t_b
    """,
)
def events_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over event-type co-occurrence (per
    user×day context): PMI = ln(c_ab·N / (c_a·c_b)) — the statistic
    behind item2vec-style negative sampling tables and co-occurrence
    embeddings, computed exactly.

    Contexts dedupe first (DISTINCT on (user, day, type)); the pair join
    is per-context only (≤|types|² pairs per context, never a corpus
    cross join); counts are exact integers, so the single ln is the only
    float op.  At 100 TB the shuffles carry (type, count) and
    (type-pair, count) rows — vocabulary-sized, not corpus-sized."""
    ev = load_table(spark, sf_dir, "events")
    grp = ev.select(
        "user_id",
        F.to_date(F.col("ts").cast("timestamp")).alias("d"),
        "event_type",
    ).distinct()
    n = grp.select("user_id", "d").distinct().agg(F.count("*").alias("n_groups"))
    singles = grp.groupBy("event_type").agg(F.count("*").alias("c"))
    a = grp.select("user_id", "d", F.col("event_type").alias("t_a"))
    b = grp.select("user_id", "d", F.col("event_type").alias("t_b"))
    pairs = (
        a.join(b, ["user_id", "d"])
        .filter(F.col("t_a") < F.col("t_b"))
        .groupBy("t_a", "t_b")
        .agg(F.count("*").alias("c_ab"))
    )
    sa = singles.select(F.col("event_type").alias("t_a"), F.col("c").alias("c_a"))
    sb = singles.select(F.col("event_type").alias("t_b"), F.col("c").alias("c_b"))
    return (
        pairs.join(F.broadcast(sa), "t_a")
        .join(F.broadcast(sb), "t_b")
        .crossJoin(F.broadcast(n))
        .select(
            "t_a",
            "t_b",
            "c_ab",
            F.round(
                F.log(
                    F.col("c_ab") * F.col("n_groups")
                    / (F.col("c_a").cast("double") * F.col("c_b"))
                ),
                4,
            )
            .cast("double")
            .alias("pmi"),
        )
        .orderBy("t_a", "t_b")
    )


@q(
    "timeseries_cusum_changepoint",
    """
    WITH daily AS (
      SELECT event_type, cast(cast(ts AS timestamp) AS date) AS d,
             sum(cast(value AS decimal(38,9))) AS v
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type, sum(v) AS total, count(*) AS n
      FROM daily GROUP BY event_type),
    cum AS (
      SELECT d.event_type, d.d,
             sum(d.v) OVER (PARTITION BY d.event_type ORDER BY d.d
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cv,
             row_number() OVER (PARTITION BY d.event_type ORDER BY d.d) AS t
      FROM daily d),
    scored AS (
      SELECT c.event_type, c.d,
             s.n * c.cv - c.t * s.total AS tstat, s.n
      FROM cum c JOIN stats s USING (event_type)),
    ranked AS (
      SELECT event_type, d, tstat, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(tstat) DESC, d) AS rk
      FROM scored)
    SELECT event_type, cast(d AS varchar) AS changepoint_day,
           cast(round(cast(abs(tstat) AS double) / n, 2) AS double)
             AS max_cusum_dev
    FROM ranked WHERE rk = 1 ORDER BY event_type
    """,
)
def timeseries_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type: the day where the
    cumulative deviation from the series mean peaks — the standard
    drift/level-shift detector a monitoring pipeline runs over daily
    rollups.

    EXACT arithmetic throughout the argmax: the test statistic is scaled
    to integers/decimals (n·cumsum − t·total, all decimal(38,9)) so the
    peak day is bit-identical across engines — no float cumulative-sum
    association hazard; the single double division happens only on the
    already-selected row.  One (event_type) partitioning serves the
    cumsum window, the rank, and the stats join."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.col("ts").cast("timestamp")).alias("d")
    ).agg(F.sum(F.col("value").cast("decimal(38,9)")).alias("v"))
    stats = daily.groupBy("event_type").agg(
        F.sum("v").alias("total"), F.count("*").alias("n")
    )
    w_cum = (
        W.partitionBy("event_type").orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    )
    cum = daily.select(
        "event_type",
        "d",
        F.sum("v").over(w_cum).alias("cv"),
        F.row_number().over(W.partitionBy("event_type").orderBy("d")).alias("t"),
    )
    scored = cum.join(stats, "event_type").select(
        "event_type",
        "d",
        (F.col("n") * F.col("cv") - F.col("t") * F.col("total")).alias("tstat"),
        "n",
    )
    w_rk = W.partitionBy("event_type").orderBy(F.abs(F.col("tstat")).desc(), "d")
    return (
        scored.withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("d").cast("string").alias("changepoint_day"),
            F.round(F.abs(F.col("tstat")).cast("double") / F.col("n"), 2)
            .cast("double")
            .alias("max_cusum_dev"),
        )
        .orderBy("event_type")
    )


@q(
    "cdc_snapshot_diff",
    """
    WITH snap_a AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey < 4000
    ),
    snap_b AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderstatus = 'F' THEN o_totalprice + 10.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 5000
    )
    SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'deleted'
                WHEN a.o_totalprice <> b.o_totalprice
                     OR a.o_orderstatus <> b.o_orderstatus THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           cast(count(*) AS bigint) AS n,
           cast(sum(coalesce(a.o_orderkey, b.o_orderkey)) AS bigint) AS key_sum
    FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
    GROUP BY 1 ORDER BY change_type
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff audit between two table versions — the change-data
    report a pipeline runs after every load when the source has no CDC feed
    (the reference's sinks are append-only file writes, SURVEY §2.1, so
    version diffing is always an external query there).  One co-partitioned
    FULL OUTER join on the key classifies every row added / deleted /
    changed / unchanged; at 100 TB both snapshots hash-shuffle once on the
    same key (AQE-coalesced), and the value compare happens post-join
    without materializing row fingerprints."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") < 4000).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    b = (
        orders.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 5000))
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice") + 10.0)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    j = a.alias("a").join(b.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    change = (
        F.when(F.col("a.o_orderkey").isNull(), F.lit("added"))
        .when(F.col("b.o_orderkey").isNull(), F.lit("deleted"))
        .when(
            (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
            | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            change.alias("change_type"),
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("k"),
        )
        .groupBy("change_type")
        .agg(F.count("*").alias("n"), F.sum("k").cast("bigint").alias("key_sum"))
        .orderBy("change_type")
    )


@q(
    "cdc_gdpr_erasure",
    """
    WITH erased AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
    ),
    surv_cust AS (
      SELECT * FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM erased)
    ),
    surv_orders AS (
      SELECT o.* FROM orders o
      WHERE o.o_custkey NOT IN (SELECT c_custkey FROM erased)
    ),
    surv_line AS (
      SELECT l.* FROM lineitem l
      WHERE l.l_orderkey IN (SELECT o_orderkey FROM surv_orders)
    )
    SELECT cast((SELECT count(*) FROM surv_cust) AS bigint)  AS n_customers,
           cast((SELECT count(*) FROM surv_orders) AS bigint) AS n_orders,
           cast((SELECT count(*) FROM surv_line) AS bigint)   AS n_lineitems,
           cast((SELECT sum(o_orderkey) FROM surv_orders) AS bigint) AS order_key_sum
    """,
)
def cdc_gdpr_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure cascade: given a deletion-request set of customer
    keys, remove the customers, their orders, and those orders' line items,
    and emit the surviving-row audit counts.  The erasure list is tiny
    relative to the corpus, so both anti-joins BROADCAST it (plan:
    BroadcastHashJoin LeftAnti); the lineitem cascade semi-joins on the
    surviving orders' keys — the one shuffle in the plan, on the natural
    l_orderkey/o_orderkey co-partitioning.  At 100 TB nothing but key
    columns moves: no fact-table rewrite happens until the audit is
    approved (the merge itself is cdc_merge_orders' territory)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    erased = (
        cust.filter(F.col("c_custkey") % 97 == 0)
        .select(F.col("c_custkey").alias("erased_key"))
    )
    surv_cust = cust.join(
        F.broadcast(erased), cust["c_custkey"] == erased["erased_key"], "left_anti"
    )
    surv_orders = orders.join(
        F.broadcast(erased), orders["o_custkey"] == erased["erased_key"], "left_anti"
    )
    surv_line = li.join(
        surv_orders.select("o_orderkey"),
        li["l_orderkey"] == F.col("o_orderkey"),
        "left_semi",
    )
    nc = surv_cust.agg(F.count("*").alias("n_customers"))
    no = surv_orders.agg(
        F.count("*").alias("n_orders"),
        F.sum("o_orderkey").cast("bigint").alias("order_key_sum"),
    )
    nl = surv_line.agg(F.count("*").alias("n_lineitems"))
    return nc.crossJoin(no).crossJoin(nl).select(
        "n_customers", "n_orders", "n_lineitems", "order_key_sum"
    )


@q(
    "events_rfm_segmentation",
    """
    WITH anchor AS (SELECT max(ts) AS mx FROM events),
    u AS (
      SELECT user_id,
             date_diff('day', cast(max(ts) AS date), cast((SELECT mx FROM anchor) AS date)) AS recency,
             cast(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS bigint) AS frequency,
             cast(sum(CASE WHEN event_type = 'purchase'
                           THEN cast(floor(value * 100) AS bigint) ELSE 0 END) AS bigint) AS monetary
      FROM events GROUP BY user_id
    ),
    cuts AS (
      SELECT quantile_cont(recency, [0.25, 0.5, 0.75]) AS rq,
             quantile_cont(frequency, [0.25, 0.5, 0.75]) AS fq,
             quantile_cont(monetary, [0.25, 0.5, 0.75]) AS mq
      FROM u
    ),
    scored AS (
      SELECT user_id, monetary,
             1 + cast(recency < rq[3] AS int) + cast(recency < rq[2] AS int)
               + cast(recency < rq[1] AS int) AS r_score,
             1 + cast(frequency > fq[1] AS int) + cast(frequency > fq[2] AS int)
               + cast(frequency > fq[3] AS int) AS f_score,
             1 + cast(monetary > mq[1] AS int) + cast(monetary > mq[2] AS int)
               + cast(monetary > mq[3] AS int) AS m_score
      FROM u, cuts
    )
    SELECT concat('R', r_score, 'F', f_score, 'M', m_score) AS segment,
           cast(count(*) AS bigint) AS n_users,
           cast(sum(user_id) AS bigint) AS user_key_sum,
           cast(sum(monetary) AS bigint) AS monetary_cents
    FROM scored GROUP BY 1 ORDER BY segment
    """,
)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation with
    EXACT quartile cut-points — scale-correctly: instead of a global
    ``ntile(4)`` window (single-partition sort at 100 TB), the three cut
    values per dimension come from one distributed exact ``percentile``
    aggregate and are broadcast back, so scoring is a map-side comparison.
    Monetary sums integer cents (floor(value*100)) so the quartile
    interpolation is exact-portable across engines; user-level rollup
    shuffles once on user_id."""
    ev = load_table(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    u = ev.groupBy("user_id").agg(
        F.max("ts").alias("mx_ts"),
        F.count(F.when(is_p, 1)).alias("frequency"),
        F.sum(
            F.when(is_p, F.floor(F.col("value") * 100).cast("bigint")).otherwise(F.lit(0))
        ).alias("monetary"),
    )
    anchor = ev.agg(F.max("ts").alias("gmx"))
    u = u.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.datediff(F.to_date("gmx"), F.to_date("mx_ts")).alias("recency"),
        "frequency",
        "monetary",
    )
    qs = [0.25, 0.5, 0.75]
    cuts = u.agg(
        F.percentile("recency", F.array(*[F.lit(x) for x in qs])).alias("rq"),
        F.percentile("frequency", F.array(*[F.lit(x) for x in qs])).alias("fq"),
        F.percentile("monetary", F.array(*[F.lit(x) for x in qs])).alias("mq"),
    )
    s = u.crossJoin(F.broadcast(cuts))
    r_score = (
        F.lit(1)
        + (F.col("recency") < F.col("rq")[2]).cast("int")
        + (F.col("recency") < F.col("rq")[1]).cast("int")
        + (F.col("recency") < F.col("rq")[0]).cast("int")
    )
    f_score = (
        F.lit(1)
        + (F.col("frequency") > F.col("fq")[0]).cast("int")
        + (F.col("frequency") > F.col("fq")[1]).cast("int")
        + (F.col("frequency") > F.col("fq")[2]).cast("int")
    )
    m_score = (
        F.lit(1)
        + (F.col("monetary") > F.col("mq")[0]).cast("int")
        + (F.col("monetary") > F.col("mq")[1]).cast("int")
        + (F.col("monetary") > F.col("mq")[2]).cast("int")
    )
    return (
        s.select(
            F.concat(
                F.lit("R"), r_score.cast("string"),
                F.lit("F"), f_score.cast("string"),
                F.lit("M"), m_score.cast("string"),
            ).alias("segment"),
            "user_id",
            "monetary",
        )
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("user_id").cast("bigint").alias("user_key_sum"),
            F.sum("monetary").cast("bigint").alias("monetary_cents"),
        )
        .orderBy("segment")
    )


@q(
    "analytics_groupwise_ols",
    """
    WITH monthly AS (
      SELECT c_mktsegment,
             (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS mi,
             sum(cast(floor(l_extendedprice * (1.0 - l_discount) * 100) AS bigint)) AS cents
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    sums AS (
      SELECT c_mktsegment,
             cast(count(*) AS bigint)        AS n,
             cast(sum(mi) AS bigint)         AS sx,
             cast(sum(cents) AS bigint)      AS sy,
             cast(sum(mi * mi) AS bigint)    AS sxx,
             cast(sum(mi * cents) AS bigint) AS sxy
      FROM monthly GROUP BY 1
    )
    SELECT c_mktsegment, n AS n_months,
           round(cast(n * sxy - sx * sy AS double)
                 / cast(n * sxx - sx * sx AS double) / 100.0, 4) AS slope_per_month,
           round((cast(sy AS double) / cast(n AS double)
                  - cast(n * sxy - sx * sy AS double) / cast(n * sxx - sx * sx AS double)
                    * cast(sx AS double) / cast(n AS double)) / 100.0, 4) AS intercept
    FROM sums ORDER BY c_mktsegment
    """,
)
def analytics_groupwise_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise least-squares trend (revenue slope per market segment):
    the closed-form OLS slope computed from EXACT integer sums — n, Σx, Σy,
    Σx², Σxy accumulate as bigints over (month-index, revenue-cents), so
    the result is bit-reproducible regardless of partitioning / combine
    order, unlike ``regr_slope`` whose float accumulation is
    order-dependent across engines.  Two-level aggregation: month-grain
    pre-agg (map-side combine over the natural date clustering), then the
    tiny per-segment closed form.  At 100 TB only (segment × month) rows —
    thousands — reach the second agg."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    monthly = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_mktsegment",
            ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1).alias("mi"),
            F.floor(F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("c_mktsegment", "mi")
        .agg(F.sum("cents").alias("cents"))
    )
    sums = monthly.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum("mi").cast("bigint").alias("sx"),
        F.sum("cents").cast("bigint").alias("sy"),
        F.sum(F.col("mi") * F.col("mi")).cast("bigint").alias("sxx"),
        F.sum(F.col("mi") * F.col("cents")).cast("bigint").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") / F.col("n").cast("double")
        - slope * F.col("sx").cast("double") / F.col("n").cast("double")
    )
    return sums.select(
        "c_mktsegment",
        F.col("n").alias("n_months"),
        F.round(slope / 100.0, 4).alias("slope_per_month"),
        F.round(intercept / 100.0, 4).alias("intercept"),
    ).orderBy("c_mktsegment")


@q(
    "analytics_skyline",
    """
    WITH stair AS (
      SELECT p_size, min(p_retailprice) AS mn
      FROM part GROUP BY p_size
    ),
    sky_sizes AS (
      SELECT p_size, mn FROM (
        SELECT p_size, mn,
               min(mn) OVER (ORDER BY p_size
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        FROM stair
      ) WHERE pm IS NULL OR mn < pm
    )
    SELECT p.p_partkey, p.p_size, p.p_retailprice
    FROM part p JOIN sky_sizes s
      ON p.p_size = s.p_size AND p.p_retailprice = s.mn
    ORDER BY p.p_size, p.p_partkey
    """,
)
def analytics_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-dominance) query — minimize (p_size, p_retailprice)
    jointly; a part survives iff no other part is <= on both dimensions and
    < on at least one.  The naive formulation is an O(n^2) NOT-EXISTS
    self-join (that IS the DuckDB oracle); the engine instead exploits the
    2-D staircase structure: one hash agg to per-size minima, a running
    strict-prefix min over the SIZE DOMAIN (window input is the distinct-
    value grain — ~50 rows regardless of corpus size, the classic
    sort-filter skyline of Borzsony et al.), then a broadcast semi join
    back to the fact.  At 100 TB: one shuffle on p_size, a dim-sized
    window, zero all-pairs work."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    stair = p.groupBy("p_size").agg(F.min("p_retailprice").alias("mn"))
    w = W.orderBy("p_size").rowsBetween(W.unboundedPreceding, -1)
    sky_sizes = (
        stair.withColumn("pm", F.min("mn").over(w))
        .filter(F.col("pm").isNull() | (F.col("mn") < F.col("pm")))
        .select(F.col("p_size").alias("s_size"), F.col("mn"))
    )
    return (
        p.join(
            F.broadcast(sky_sizes),
            (p["p_size"] == F.col("s_size")) & (p["p_retailprice"] == F.col("mn")),
            "left_semi",
        )
        .select("p_partkey", "p_size", "p_retailprice")
        .orderBy("p_size", "p_partkey")
    )


@q(
    "analytics_ab_test",
    """
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS variant,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT cast(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS bigint) AS n_a,
             cast(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS bigint) AS c_a,
             cast(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS bigint) AS n_b,
             cast(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS bigint) AS c_b
      FROM per_user
    )
    SELECT n_a, c_a, n_b, c_b,
           round(cast(c_a AS double) / cast(n_a AS double), 6) AS rate_a,
           round(cast(c_b AS double) / cast(n_b AS double), 6) AS rate_b,
           round((cast(c_a AS double) / cast(n_a AS double)
                  - cast(c_b AS double) / cast(n_b AS double))
                 / sqrt((cast(c_a + c_b AS double) / cast(n_a + n_b AS double))
                        * (1.0 - cast(c_a + c_b AS double) / cast(n_a + n_b AS double))
                        * (1.0 / cast(n_a AS double) + 1.0 / cast(n_b AS double))),
                 6) AS z_score
    FROM s
    """,
)
def analytics_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment readout (variant =
    deterministic hash split on user_id, conversion = any purchase event).
    Counts accumulate as exact bigints in one hash agg over the user grain;
    the z statistic is computed once, at the end, from those four integers
    with an expression tree written IDENTICALLY on both engines — IEEE-754
    doubles are deterministic given identical inputs and operation order,
    so even the 6th decimal hash-matches.  At 100 TB: user-grain rollup
    shuffles once on user_id; the final stats row is a single-row reduce."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(F.lit(0))
        ).alias("conv")
    ).select((F.col("user_id") % 2).alias("variant"), "conv")
    s = per_user.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0)).cast("bigint").alias("c_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0)).cast("bigint").alias("c_b"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    pa = d(F.col("c_a")) / d(F.col("n_a"))
    pb = d(F.col("c_b")) / d(F.col("n_b"))
    pp = d(F.col("c_a") + F.col("c_b")) / d(F.col("n_a") + F.col("n_b"))
    # try_divide, not `/`: when the pooled rate is 0 or 1 the denominator is
    # exactly 0.0 and ANSI-mode division throws DIVIDE_BY_ZERO; NULL is the
    # statistically honest answer (z undefined) and matches the oracle.
    z = F.try_divide(
        pa - pb,
        F.sqrt(
            pp * (F.lit(1.0) - pp)
            * (F.lit(1.0) / d(F.col("n_a")) + F.lit(1.0) / d(F.col("n_b")))
        ),
    )
    return s.select(
        "n_a", "c_a", "n_b", "c_b",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
    )


@q(
    "analytics_gini",
    """
    WITH u AS (
      SELECT o_custkey,
             sum(cast(round(o_totalprice * 100) AS bigint)) AS cents
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT cents,
             cast(row_number() OVER (ORDER BY cents, o_custkey) AS bigint) AS rn
      FROM u
    )
    SELECT cast(count(*) AS bigint) AS n_customers,
           cast(sum(cents) AS bigint) AS total_cents,
           round(cast(2 * sum(rn * cents) - (count(*) + 1) * sum(cents) AS double)
                 / cast(count(*) * sum(cents) AS double), 6) AS gini
    FROM r
    """,
)
def analytics_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration.  The textbook
    formula needs a GLOBAL rank over every customer — a single-partition
    sort at scale.  The engine never ranks rows: revenue collapses to the
    distinct-VALUE grain (cents -> count, one hash agg), and the global
    prefix count is a TWO-LEVEL prefix sum — range-bucket the value domain
    (fixed $10,486 buckets), prefix the per-bucket totals (a window over
    only the bucket boundaries, thousands of rows at any corpus size),
    broadcast the bucket bases back, and finish the prefix WITHIN each
    bucket with a window PARTITIONED by bucket.  Within a tie block the
    rank sum telescopes in closed form (ranks base+1..base+cnt over a
    constant value x contribute x*(base*cnt + cnt*(cnt+1)/2)).  Every
    accumulation is bigint-exact, so the result is bit-identical to the
    oracle's row_number() formulation at any partitioning.  At 100 TB: two
    hash aggs + partitioned windows; nothing single-partition but the
    bucket-boundary ledger."""
    o = load_table(spark, sf_dir, "orders")
    u = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
    )
    t = (
        u.groupBy("cents")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .withColumn("bkt", F.expr(f"cents DIV {1 << 20}"))
    )
    bkt_tot = t.groupBy("bkt").agg(F.sum("cnt").alias("bcnt"))
    wb = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    bkt_base = bkt_tot.select(
        "bkt", F.coalesce(F.sum("bcnt").over(wb), F.lit(0)).alias("bbase")
    )
    wi = (
        W.partitionBy("bkt")
        .orderBy("cents")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    t2 = t.join(F.broadcast(bkt_base), "bkt").withColumn(
        "base",
        F.col("bbase") + F.coalesce(F.sum("cnt").over(wi), F.lit(0)),
    )
    contrib = F.col("cents") * (
        F.col("base") * F.col("cnt")
        + F.expr("(cnt * (cnt + 1)) DIV 2")
    )
    s = t2.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.col("cents") * F.col("cnt")).cast("bigint").alias("sx"),
        F.sum(contrib).cast("bigint").alias("srx"),
    )
    num = (F.lit(2) * F.col("srx") - (F.col("n") + 1) * F.col("sx")).cast("double")
    den = (F.col("n") * F.col("sx")).cast("double")
    return s.select(
        F.col("n").alias("n_customers"),
        F.col("sx").alias("total_cents"),
        F.round(num / den, 6).alias("gini"),
    )


@q(
    "analytics_basket_lift",
    """
    WITH b AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (
      SELECT cast(count(DISTINCT l_orderkey) AS bigint) AS n FROM b
    ),
    pairs AS (
      SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
             cast(count(*) AS bigint) AS n_both
      FROM b x JOIN b y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2
    ),
    freq AS (
      SELECT l_partkey, cast(count(*) AS bigint) AS n_item FROM b GROUP BY 1
    )
    SELECT p.part_a, p.part_b, p.n_both, fa.n_item AS n_a, fb.n_item AS n_b,
           round(cast(p.n_both * o.n AS double)
                 / cast(fa.n_item * fb.n_item AS double), 6) AS lift
    FROM pairs p
    JOIN freq fa ON p.part_a = fa.l_partkey
    JOIN freq fb ON p.part_b = fb.l_partkey
    CROSS JOIN n_orders o
    WHERE p.n_both >= 2
    ORDER BY p.n_both DESC, p.part_a, p.part_b
    LIMIT 100
    """,
)
def analytics_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (support / lift) over order baskets.
    Pair generation is a WITHIN-BASKET self-join on l_orderkey with
    part_a < part_b — fan-out bounded by basket size squared (TPC-H
    baskets hold <=7 items -> <=21 pairs), so the join is one co-partitioned
    shuffle, never an all-pairs catalog product.  Item frequencies and the
    basket count join back on the part key; lift = P(ab)/(P(a)P(b)) comes
    out of exact bigint counts, rounded once.  At 100 TB the pair agg is
    the only large shuffle and it map-side combines; the freq join is a
    dim-sized shuffle join on partkey."""
    li = load_table(spark, sf_dir, "lineitem")
    # NOT persisted although four consumers share it: a matched-probe A/B
    # (r10) measured the persist 0.9s SLOWER — the distinct is a cheap
    # codegen'd pass over a 2-column scan, and caching it costs a
    # materialization barrier plus InMemoryRelation stats that demote the
    # frequency joins from broadcast to shuffle.
    b = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = b.agg(F.count_distinct("l_orderkey").cast("bigint").alias("n"))
    x, y = b.alias("x"), b.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("part_a"),
            F.col("y.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )
    freq = b.groupBy("l_partkey").agg(F.count("*").cast("bigint").alias("n_item"))
    fa = freq.select(F.col("l_partkey").alias("ka"), F.col("n_item").alias("n_a"))
    fb = freq.select(F.col("l_partkey").alias("kb"), F.col("n_item").alias("n_b"))
    return (
        pairs.join(fa, pairs["part_a"] == fa["ka"])
        .join(fb, pairs["part_b"] == fb["kb"])
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a", "part_b", "n_both", "n_a", "n_b",
            F.round(
                (F.col("n_both") * F.col("n")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("n_both").desc(), "part_a", "part_b")
        .limit(100)
    )


@q(
    "analytics_cohort_ltv",
    """
    WITH o AS (
      SELECT o_custkey,
             (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS mi,
             cast(round(o_totalprice * 100) AS bigint) AS cents
      FROM orders
    ),
    cohort AS (
      SELECT o_custkey, min(mi) AS cohort_mi FROM o GROUP BY o_custkey
    ),
    size AS (
      SELECT cohort_mi, cast(count(*) AS bigint) AS n_users
      FROM cohort GROUP BY cohort_mi
    ),
    monthly AS (
      SELECT o.o_custkey, c.cohort_mi, o.mi - c.cohort_mi AS age,
             sum(o.cents) AS cents
      FROM o JOIN cohort c ON o.o_custkey = c.o_custkey
      GROUP BY 1, 2, 3
    ),
    g AS (
      SELECT cohort_mi, age,
             cast(count(*) AS bigint) AS n_active,
             cast(sum(cents) AS bigint) AS cents
      FROM monthly GROUP BY 1, 2
    )
    SELECT g.cohort_mi, g.age, g.n_active, s.n_users,
           cast(sum(g.cents) OVER (PARTITION BY g.cohort_mi ORDER BY g.age
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bigint)
             AS cum_cents,
           (cast(sum(g.cents) OVER (PARTITION BY g.cohort_mi ORDER BY g.age
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bigint)
                 * 100 // cast(s.n_users AS bigint)) / 10000.0 AS ltv_per_user
    FROM g JOIN size s ON g.cohort_mi = s.cohort_mi
    ORDER BY g.cohort_mi, g.age
    """,
)
def analytics_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers cohorted by first-order
    month, cumulative revenue per user tracked by cohort age.  Month
    arithmetic uses an integer month index ((y-1992)*12 + m-1) so age is
    exact on both engines (no months_between float).  The custkey-grain
    cohort assignment and the monthly rollup co-partition on o_custkey
    (one shuffle reused); the LTV cumsum is a window PARTITIONED by cohort
    over the (cohort x age) aggregate — thousands of rows at any corpus
    size, and revenue accumulates in bigint cents.  The per-user LTV is
    floor-divided in integer micro-units (cents*100 div users) before one
    float division, so no round-half tie can split the engines.  At 100 TB
    nothing unpartitioned exists in the plan."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1).alias("mi"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cohort = o.groupBy("o_custkey").agg(F.min("mi").alias("cohort_mi"))
    size = cohort.groupBy("cohort_mi").agg(
        F.count("*").cast("bigint").alias("n_users")
    )
    per_cust = (
        o.join(cohort, "o_custkey")
        .groupBy(
            "o_custkey", "cohort_mi", (F.col("mi") - F.col("cohort_mi")).alias("age")
        )
        .agg(F.sum("cents").alias("cents"))
    )
    monthly = per_cust.groupBy("cohort_mi", "age").agg(
        F.count("*").cast("bigint").alias("n_active"),
        F.sum("cents").alias("cents"),
    )
    w = (
        W.partitionBy("cohort_mi")
        .orderBy("age")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("cents").over(w).cast("bigint")
    return (
        monthly.withColumn("cum_cents", cum)
        .join(size, "cohort_mi")
        .select(
            "cohort_mi", "age", "n_active", "n_users", "cum_cents",
            (F.expr("cum_cents * 100L div n_users") / 10000.0).alias(
                "ltv_per_user"
            ),
        )
        .orderBy("cohort_mi", "age")
    )


@q(
    "events_cumulative_distinct_users",
    """
    WITH first_seen AS (
      SELECT user_id, min(cast(ts AS date)) AS d FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT d, cast(count(*) AS bigint) AS new_users FROM first_seen GROUP BY d
    )
    SELECT cast(d AS varchar) AS day, new_users,
           cast(sum(new_users) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bigint)
             AS cum_users
    FROM daily ORDER BY day
    """,
)
def events_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users to date (the growth-dashboard staple).
    ``count(DISTINCT user) OVER (ORDER BY day)`` is unevaluable at scale —
    distinct state per window frame.  The identity that makes it linear:
    a user counts on exactly one day, their FIRST.  So: first-touch dedup
    (one user-grain hash agg, the only big shuffle), a day-grain count, and
    a running sum over the DAY domain — bounded by the calendar (a few
    thousand rows in any corpus), the one intentionally-global window.
    At 100 TB the plan is two hash aggs + a dim-sized window."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d"))
    daily = first_seen.groupBy("d").agg(
        F.count("*").cast("bigint").alias("new_users")
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        daily.select(
            F.col("d").cast("string").alias("day"),
            "new_users",
            F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
        )
        .orderBy("day")
    )


_BENFORD_P = {d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)}
_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {p!r}" for d, p in _BENFORD_P.items()
) + " END"


@q(
    "quality_benford",
    f"""
    WITH src AS (
      SELECT cast(substr(cast(cast(floor(o_totalprice) AS bigint) AS varchar), 1, 1)
                  AS int) AS digit
      FROM orders
    ),
    counts AS (
      SELECT digit, cast(count(*) AS bigint) AS n FROM src GROUP BY digit
    ),
    tot AS (SELECT cast(sum(n) AS bigint) AS total FROM counts)
    SELECT digit, n,
           round(cast(n AS double) / cast(total AS double), 6) AS freq,
           round(
             (cast(n AS double) - cast(total AS double) * ({_BENFORD_CASE}))
             * (cast(n AS double) - cast(total AS double) * ({_BENFORD_CASE}))
             / (cast(total AS double) * ({_BENFORD_CASE})), 6) AS chi2_term
    FROM counts, tot ORDER BY digit
    """,
)
def quality_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance audit on order amounts — the
    fraud/synthetic-data screen a quality pipeline runs over every numeric
    ledger column: first-significant-digit frequencies against
    log10(1+1/d), with per-digit chi-square contributions.  Counts are one
    hash agg to a NINE-row table; the expected probabilities are shared
    Python-float literals interpolated into BOTH engines' expressions, and
    every division happens after aggregation, so the doubles agree bitwise.
    At 100 TB: one map-side digit extraction + a 9-group agg; the stats
    math runs on 9 rows."""
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").cast("bigint").alias("n")
    )
    tot = counts.agg(F.sum("n").cast("bigint").alias("total"))
    p = F.when(F.col("digit") == 1, F.lit(_BENFORD_P[1]))
    for d in range(2, 10):
        p = p.when(F.col("digit") == d, F.lit(_BENFORD_P[d]))
    nn, tt = F.col("n").cast("double"), F.col("total").cast("double")
    dev = nn - tt * p
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(nn / tt, 6).alias("freq"),
            F.round(dev * dev / (tt * p), 6).alias("chi2_term"),
        )
        .orderBy("digit")
    )


@q(
    "events_stickiness_dau_mau",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, cast(ts AS date) AS d FROM events
    ),
    m AS (
      SELECT (year(d) - 1992) * 12 + month(d) - 1 AS mi,
             cast(count(*) AS bigint) AS user_days,
             cast(count(DISTINCT user_id) AS bigint) AS mau,
             cast(count(DISTINCT d) AS bigint) AS days_obs
      FROM ud GROUP BY 1
    )
    SELECT mi, mau, user_days, days_obs,
           round(cast(user_days AS double) / cast(days_obs AS double)
                 / cast(mau AS double), 6) AS stickiness
    FROM m ORDER BY mi
    """,
)
def events_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month — the engagement ratio every growth
    dashboard tracks.  avg-DAU/MAU = user_days / (days_observed × MAU),
    all three EXACT integer counts off ONE distinct (user, day) grain —
    the corpus shuffles once to that grain, the month rollup is hundreds
    of rows, and the single float division happens post-agg with an
    identical expression tree on both engines.  Never a per-day distinct
    window.  At 100 TB: one dedup shuffle + a calendar-bounded agg."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    m = ud.groupBy(
        ((F.year("d") - 1992) * 12 + F.month("d") - 1).alias("mi")
    ).agg(
        F.count("*").cast("bigint").alias("user_days"),
        F.count_distinct("user_id").cast("bigint").alias("mau"),
        F.count_distinct("d").cast("bigint").alias("days_obs"),
    )
    return (
        m.select(
            "mi", "mau", "user_days", "days_obs",
            F.round(
                F.col("user_days").cast("double")
                / F.col("days_obs").cast("double")
                / F.col("mau").cast("double"),
                6,
            ).alias("stickiness"),
        )
        .orderBy("mi")
    )


_HOLT_FOLD_SPARK = (
    "aggregate(slice(vals, 2, size(vals) - 1), "
    "named_struct('l', vals[0], 'b', cast(0.0 AS double)), "
    "(acc, x) -> named_struct("
    "'l', 0.5D * x + 0.5D * (acc.l + acc.b), "
    "'b', 0.5D * ((0.5D * x + 0.5D * (acc.l + acc.b)) - acc.l) + 0.5D * acc.b))"
)


@q(
    "analytics_holt_linear",
    """
    WITH monthly AS (
      SELECT o_orderpriority AS pri,
             (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS mi,
             cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS double)
               AS cents
      FROM orders GROUP BY 1, 2
    ),
    series AS (
      SELECT pri, list(cents ORDER BY mi) AS vals FROM monthly GROUP BY pri
    ),
    fold AS (
      WITH RECURSIVE f(pri, i, l, b) AS (
        SELECT pri, 1, cast(vals[1] AS double), cast(0.0 AS double) FROM series
        UNION ALL
        SELECT f.pri, f.i + 1,
               0.5 * s.vals[f.i + 1] + 0.5 * (f.l + f.b),
               0.5 * ((0.5 * s.vals[f.i + 1] + 0.5 * (f.l + f.b)) - f.l)
                 + 0.5 * f.b
        FROM f JOIN series s ON f.pri = s.pri
        WHERE f.i < len(s.vals)
      )
      SELECT * FROM f
    )
    SELECT s.pri, cast(len(s.vals) AS bigint) AS n_months,
           round(f.l / 100.0, 4) AS level_dollars,
           round(f.b / 100.0, 4) AS trend_dollars,
           round((f.l + 3.0 * f.b) / 100.0, 4) AS forecast_3m
    FROM series s JOIN fold f ON s.pri = f.pri AND f.i = len(s.vals)
    ORDER BY s.pri
    """,
)
def analytics_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing per series (the standard
    level+trend forecaster; one step beyond `timeseries_ewma`), fitted with
    a HIGHER-ORDER-FUNCTION fold — no driver loop, no UDF: the monthly
    series collects per key (bounded by the calendar), and ``aggregate()``
    folds the (level, trend) struct left-to-right inside codegen.
    Bit-portability: both engines run the IDENTICAL left fold from the
    same first-element init (l0=y0, b0=0, alpha=beta=0.5 literals), so
    every IEEE double matches exactly — the DuckDB oracle replays the fold
    as a RECURSIVE CTE row-at-a-time (DuckDB's own ``list_reduce`` cannot
    express it: it updates struct accumulators field-by-field IN PLACE, so
    the 'b' formula would read the already-overwritten 'l').
    At 100 TB: one (key, month) pre-agg shuffle,
    then per-key folds over ≤ calendar-length arrays."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.col("o_orderpriority").alias("pri"),
            ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1).alias("mi"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("double")
            .alias("cents")
        )
    )
    series = monthly.groupBy("pri").agg(
        F.array_sort(F.collect_list(F.struct("mi", "cents"))).alias("a")
    )
    st = (
        series.withColumn("vals", F.expr("transform(a, s -> s.cents)"))
        .withColumn("st", F.expr(_HOLT_FOLD_SPARK))
        .select(
            "pri",
            F.size("vals").cast("bigint").alias("n_months"),
            F.round(F.col("st.l") / 100.0, 4).alias("level_dollars"),
            F.round(F.col("st.b") / 100.0, 4).alias("trend_dollars"),
            F.round((F.col("st.l") + 3.0 * F.col("st.b")) / 100.0, 4).alias(
                "forecast_3m"
            ),
        )
    )
    return st.orderBy("pri")


@q(
    "events_rolling_7d_active",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, cast(ts AS date) AS d FROM events
    ),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM ud),
    contrib AS (
      SELECT DISTINCT ud.user_id, cast(ud.d + g.k * INTERVAL 1 DAY AS date) AS wd
      FROM ud, unnest(generate_series(0, 6)) AS g(k)
    )
    SELECT cast(wd AS varchar) AS day,
           cast(count(DISTINCT user_id) AS bigint) AS n_active_7d
    FROM contrib, bounds
    WHERE wd BETWEEN bounds.lo AND bounds.hi
    GROUP BY wd ORDER BY day
    """,
)
def events_rolling_7d_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (WAU curve).  A sliding
    `count(DISTINCT) OVER (RANGE 6 PRECEDING)` is unevaluable at scale —
    distinct state per frame.  The linear identity: a user active on day d
    contributes to exactly the 7 window-days d..d+6, so the (user, day)
    grain explodes 7× and ONE distinct aggregate per window-day finishes
    it.  At 100 TB: the dedup-to-(user, day) shuffle dominates (same grain
    as DAU), the 7× fan-out rides map-side, and the per-day distinct agg
    is Spark's standard two-phase distinct.  The window-day domain is
    calendar-bounded."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    lo, hi = ud.agg(F.min("d"), F.max("d")).first()
    contrib = ud.select(
        "user_id",
        F.explode(F.expr("sequence(0, 6)")).alias("k"),
        "d",
    ).select("user_id", F.date_add(F.col("d"), F.col("k")).alias("wd"))
    return (
        contrib.filter((F.col("wd") >= F.lit(lo)) & (F.col("wd") <= F.lit(hi)))
        .groupBy("wd")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_active_7d"))
        .select(F.col("wd").cast("string").alias("day"), "n_active_7d")
        .orderBy("day")
    )


@q(
    "feature_pit_training_set",
    """
    WITH clicks AS (
      SELECT event_id, user_id, cast(ts AS timestamp) AS ts
      FROM events WHERE event_type = 'click'
    ),
    status_at AS (
      SELECT c.event_id,
             (SELECT o.o_orderstatus FROM orders o
              WHERE o.o_custkey = c.user_id
                AND o.o_orderdate <= cast(c.ts AS date)
              ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS status
      FROM clicks c
    ),
    lab AS (
      SELECT c.event_id,
             CASE WHEN EXISTS (
               SELECT 1 FROM events p
               WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
                 AND cast(p.ts AS timestamp) >= c.ts
                 AND cast(p.ts AS timestamp) <= c.ts + INTERVAL 7 DAY)
             THEN 1 ELSE 0 END AS label
      FROM clicks c
    )
    SELECT c.event_id, c.user_id, cast(c.ts AS varchar) AS ts,
           coalesce(s.status, 'NONE') AS status_at_event,
           l.label
    FROM clicks c
    JOIN status_at s USING (event_id)
    JOIN lab l USING (event_id)
    ORDER BY c.event_id LIMIT 2000
    """,
)
def feature_pit_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct training-set assembly — the feature-store
    operation that prevents label leakage: each click example gets (a) the
    dimension attribute AS OF the event time (customer's order status from
    the SCD2 history — never a value from the future) and (b) a label from
    a bounded FUTURE window (purchase within 7 days).  Both sides are the
    union-merge as-of join (operators/temporal.py): ONE shuffle per join,
    O(1) state per key, no event×order or event×event product — the
    oracle IS those quadratic correlated subqueries.  At 100 TB this is
    the shape that makes backfilling a training set a linear scan."""
    from ..operators.temporal import asof_join, scd2_history

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", F.col("user_id").alias("k"), "ts", F.to_date("ts").alias("d")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"), "o_orderstatus", "o_orderdate", "o_orderkey"
    )
    changes = scd2_history(orders, "k", "o_orderstatus", "o_orderdate", "o_orderkey")
    pit = asof_join(
        clicks,
        changes,
        key="k",
        left_ts="d",
        right_ts="o_orderdate",
        value_cols=["o_orderstatus"],
        tie_break="o_orderkey",
        direction="backward",
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"), F.col("ts").alias("p_ts")
    )
    labeled = asof_join(
        pit,
        purchases,
        key="k",
        left_ts="ts",
        right_ts="p_ts",
        value_cols=["p_ts"],
        direction="forward",
        tolerance=lambda l, r: r <= l + F.expr("INTERVAL 7 DAYS"),
    )
    return (
        labeled.select(
            "event_id",
            F.col("k").alias("user_id"),
            F.col("ts").cast("string").alias("ts"),
            F.coalesce(F.col("right_o_orderstatus"), F.lit("NONE")).alias(
                "status_at_event"
            ),
            F.when(F.col("right_p_ts").isNotNull(), 1).otherwise(0).alias("label"),
        )
        .orderBy("event_id")
        .limit(2000)
    )


@q(
    "analytics_conversion_lag",
    """
    WITH clicks AS (
      SELECT user_id, epoch_us(cast(ts AS timestamp)) // 1000000 AS cs
      FROM events WHERE event_type = 'click'
    ),
    lagged AS (
      SELECT c.user_id,
             (SELECT min(epoch_us(cast(p.ts AS timestamp)) // 1000000)
              FROM events p
              WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
                AND epoch_us(cast(p.ts AS timestamp)) // 1000000 >= c.cs)
               - c.cs AS lag_s
      FROM clicks c
    ),
    conv AS (
      SELECT l.user_id, l.lag_s FROM lagged l
      WHERE l.lag_s IS NOT NULL AND l.lag_s <= 604800
    )
    SELECT c_mktsegment AS segment,
           cast(count(*) AS bigint) AS n_conversions,
           round(quantile_cont(lag_s, 0.25), 2) AS p25_s,
           round(quantile_cont(lag_s, 0.5), 2) AS p50_s,
           round(quantile_cont(lag_s, 0.75), 2) AS p75_s
    FROM conv JOIN customer ON user_id = c_custkey
    GROUP BY 1 ORDER BY segment
    """,
)
def analytics_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-to-purchase latency distribution per market segment — the
    product-analytics readout behind 'how fast do users convert'.  Each
    click pairs with the NEXT purchase via the union-merge forward as-of
    join bounded to 7 days (one shuffle, O(1) state; the oracle is the
    quadratic correlated min-subquery), lags accumulate as exact integer
    seconds, and the quartiles are one distributed exact ``percentile``
    per segment (integer inputs keep the two-point interpolation
    bit-portable, the `events_rfm_segmentation` discipline).  Segment
    enrichment broadcasts the customer dim."""
    from ..operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("k"), F.unix_timestamp("ts").alias("cs")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"), F.unix_timestamp("ts").alias("ps")
    )
    matched = asof_join(
        clicks,
        purchases,
        key="k",
        left_ts="cs",
        right_ts="ps",
        value_cols=["ps"],
        direction="forward",
    )
    conv = (
        matched.withColumn("lag_s", F.col("right_ps") - F.col("cs"))
        .filter(F.col("lag_s").isNotNull() & (F.col("lag_s") <= 604800))
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_mktsegment"
    )
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    return (
        conv.join(F.broadcast(cust), "k")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("bigint").alias("n_conversions"),
            F.percentile("lag_s", qs).alias("q"),
        )
        .select(
            "segment",
            "n_conversions",
            F.round(F.col("q")[0], 2).alias("p25_s"),
            F.round(F.col("q")[1], 2).alias("p50_s"),
            F.round(F.col("q")[2], 2).alias("p75_s"),
        )
        .orderBy("segment")
    )


_LTTB_K = 10  # output points per series: first + 8 chosen + last


def _lttb_oracle_sql(k: int = _LTTB_K) -> str:
    """Unrolled-CTE LTTB replay (the `graph_pagerank` oracle discipline:
    the sequential dependency unrolls into k-2 chained CTEs, each picking
    its bucket's max-triangle point against the previous choice)."""
    nb = k - 2
    steps = []
    prev = "ch0"
    for b in range(nb):
        steps.append(f"""
    ch{b + 1} AS (
      SELECT event_type, t, v FROM (
        SELECT i.event_type, i.t, i.v,
               row_number() OVER (PARTITION BY i.event_type ORDER BY
                 abs((i.t - c.t) * (nc.Sv - nc.m * c.v)
                     - (nc.St - nc.m * c.t) * (i.v - c.v)) DESC, i.t ASC) AS r
        FROM interior i
        JOIN {prev} c ON i.event_type = c.event_type
        JOIN nextc nc ON nc.event_type = i.event_type AND nc.b = {b}
        WHERE i.b = {b}) WHERE r = 1
    )""")
        prev = f"ch{b + 1}"
    selects = ["SELECT event_type, 0 AS idx, t, v FROM ch0"]
    selects += [
        f"SELECT event_type, {b + 1} AS idx, t, v FROM ch{b + 1}" for b in range(nb)
    ]
    selects.append(f"SELECT event_type, {k - 1} AS idx, t, v FROM lasts")
    union = "\n    UNION ALL ".join(selects)
    return f"""
    WITH pts0 AS (
      SELECT event_type,
             cast(epoch_us(cast(ts AS timestamp)) // 60000000 AS bigint) AS t,
             cast(sum(cast(floor(value * 100) AS bigint)) AS bigint) AS v
      FROM events GROUP BY 1, 2
    ),
    num AS (
      SELECT event_type, t, v,
             row_number() OVER (PARTITION BY event_type ORDER BY t) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM pts0
    ),
    keep AS (SELECT * FROM num WHERE n >= 12),
    interior AS (
      SELECT event_type, t, v,
             ((rn - 2) * {nb}) // (n - 2) AS b
      FROM keep WHERE rn > 1 AND rn < n
    ),
    firsts AS (SELECT event_type, t, v FROM keep WHERE rn = 1),
    lasts AS (SELECT event_type, t, v FROM keep WHERE rn = n),
    cent AS (
      SELECT event_type, b, cast(count(*) AS bigint) AS m,
             cast(sum(t) AS bigint) AS St, cast(sum(v) AS bigint) AS Sv
      FROM interior GROUP BY 1, 2
    ),
    nextc AS (
      SELECT c.event_type, c.b - 1 AS b, c.m, c.St, c.Sv FROM cent c WHERE c.b >= 1
      UNION ALL
      SELECT l.event_type, {nb - 1}, 1, l.t, l.v FROM lasts l
    ),
    ch0 AS (SELECT event_type, t, v FROM firsts),{",".join(steps)}
    SELECT event_type, idx, t, v FROM ({union})
    ORDER BY event_type, idx
    """


@q("timeseries_lttb_downsample", _lttb_oracle_sql())
def timeseries_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB (Largest-Triangle-Three-Buckets, Steinarsson 2013) — THE
    standard time-series downsampler for dashboards: keep the k points
    that preserve the line's visual shape, not every k-th point.  The
    choice in bucket i depends on the choice in bucket i-1 (triangle
    against the next bucket's centroid), so it folds like Holt: bucket
    arrays assemble in DataFrame land (minute pre-agg, one series-key
    shuffle), then ``aggregate()`` walks the ≤k-element bucket list
    per series inside codegen — no driver loop, no UDF.  Every area
    comparison is EXACT bigint (the centroid division multiplies through
    by the bucket size), so the oracle — the same recursion unrolled into
    chained CTEs — matches bit-for-bit.  At 100 TB: the minute pre-agg
    absorbs the event volume; the fold sees k·bucket-width structs per
    series."""
    from ..operators.temporal import lttb_downsample

    ev = load_table(spark, sf_dir, "events")
    pts = ev.groupBy(
        "event_type",
        F.expr("unix_timestamp(ts) div 60").cast("bigint").alias("t"),
    ).agg(F.sum(F.floor(F.col("value") * 100).cast("bigint")).cast("bigint").alias("v"))
    return lttb_downsample(pts, "event_type", "t", "v", k=_LTTB_K).orderBy(
        "event_type", "idx"
    )


@q(
    "timeseries_autocorrelation",
    """
    WITH daily AS (
      SELECT event_type,
             cast(ts AS date) AS d,
             sum(cast(floor(value * 100) AS bigint)) AS cents
      FROM events GROUP BY 1, 2
    ),
    paired AS (
      SELECT event_type, cents AS y,
             lag(cents, 1) OVER (PARTITION BY event_type ORDER BY d) AS x
      FROM daily
    ),
    s AS (
      SELECT event_type,
             cast(count(*) AS bigint) AS n,
             cast(sum(x) AS bigint) AS sx,
             cast(sum(y) AS bigint) AS sy,
             cast(sum(x * x) AS bigint) AS sxx,
             cast(sum(y * y) AS bigint) AS syy,
             cast(sum(x * y) AS bigint) AS sxy
      FROM paired WHERE x IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n,
           round(cast(n * sxy - sx * sy AS double)
                 / sqrt(cast(n * sxx - sx * sx AS double))
                 / sqrt(cast(n * syy - sy * sy AS double)), 6) AS acf_lag1
    FROM s ORDER BY event_type
    """,
)
def timeseries_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation per series (seasonality / trend-persistence
    screen: ACF near 0 = noise, near 1 = momentum — the test run before
    fitting any forecaster like `analytics_holt_linear`).  Pearson r over
    (xₜ₋₁, xₜ) pairs computed from EXACT bigint sums (n, Σx, Σy, Σx²,
    Σy², Σxy) — combine-order-independent, unlike float `corr` — with the
    float expression evaluated once per series on the day-grain rollup.
    One lag window + one agg, both partitioned by series."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("cents")
    )
    w = W.partitionBy("event_type").orderBy("d")
    paired = daily.select(
        "event_type",
        F.col("cents").alias("y"),
        F.lag("cents", 1).over(w).alias("x"),
    ).filter(F.col("x").isNotNull())
    s = paired.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    dy = F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return s.select(
        "event_type", "n", F.round(num / dx / dy, 6).alias("acf_lag1")
    ).orderBy("event_type")
