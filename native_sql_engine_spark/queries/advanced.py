"""Scale-infrastructure battery: metadata pruning, portable sketches,
interval joins, skew diagnostics, collation-aware text ops.

These model the *infrastructure* queries a 100 TB deployment runs around its
analytics: zone-map (row-group min/max) pruning — the mechanism behind the
reference's Arrow Dataset filter pushdown (arrow-data-source/.../
ArrowFilters.scala:27-60) and behind every parquet reader's row-group skip;
a count-min frequency sketch built as a plain aggregation (mergeable across
partitions, the same shape the reference's partial/final hash aggregate
pipelines — ColumnarHashAggregateExec.scala — rely on); a binned
interval-overlap join (the two-sided generalization of the as-of/range joins
in extra.py); a join-key skew profiler that sizes the salting factor
operators/skew.py::salted_join takes as input; and Spark-4 collation
(`collate`) driving case-insensitive comparison/grouping JVM-side instead of
the lower()-everywhere rewrite.

Every entry hash-matches a DuckDB oracle written with engine-portable
integer/date arithmetic (no dialect-specific hash functions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Zone-map pruning: build per-file min/max stats, prune files whose range
# cannot match the predicate, prove the pruned scan is lossless.
# --------------------------------------------------------------------------

_ZM_LO, _ZM_HI = "1995-06-01", "1995-06-30"


@q(
    "index_zonemap_pruning",
    f"""
    WITH tagged AS (
      SELECT l_orderkey, l_shipdate, l_extendedprice,
             (year(l_shipdate) * 12 + month(l_shipdate) - 1) + l_orderkey % 5
               AS file_id
      FROM lineitem),
    zm AS (
      SELECT file_id, min(l_shipdate) AS mn, max(l_shipdate) AS mx
      FROM tagged GROUP BY file_id),
    surv AS (
      SELECT file_id FROM zm
      WHERE mx >= DATE '{_ZM_LO}' AND mn <= DATE '{_ZM_HI}'),
    res AS (
      SELECT count(*) AS n_rows,
             cast(round(sum(cast(l_extendedprice AS decimal(38,9))), 2)
                  AS double) AS revenue
      FROM tagged t JOIN surv s USING (file_id)
      WHERE t.l_shipdate BETWEEN DATE '{_ZM_LO}' AND DATE '{_ZM_HI}')
    SELECT (SELECT cast(count(*) AS bigint) FROM zm) AS files_total,
           (SELECT cast(count(*) AS bigint) FROM surv) AS files_scanned,
           (SELECT cast(count(*) AS bigint) FROM zm)
             - (SELECT cast(count(*) AS bigint) FROM surv) AS files_pruned,
           cast(res.n_rows AS bigint) AS n_rows,
           res.revenue AS revenue
    FROM res
    """,
)
def index_zonemap_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max) file pruning, modeled end-to-end.

    `file_id` simulates an ingest layout where each file holds ~5 adjacent
    months (month index + orderkey%5 jitter).  One tiny stats pass builds
    the zone map (one row per file: min/max l_shipdate); a one-month
    predicate then keeps only files whose [min,max] intersects it, and the
    query runs on the surviving files alone.  The output proves the prune
    is lossless (n_rows/revenue equal the direct filter) *and* reports the
    prune ratio.  At 100 TB the zone map is pure metadata (parquet row-group
    stats / Iceberg manifests) — ~800k rows for 100 TB of 128 MiB row
    groups — and the surviving-file set is a broadcast semi join, exactly
    the plan shape here.  Mirrors the reference's row-group skipping via
    Arrow Dataset filter pushdown (ArrowFilters.scala:27-60).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    months = F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1
    tagged = li.withColumn("file_id", months + F.col("l_orderkey") % 5)
    zm = tagged.groupBy("file_id").agg(
        F.min("l_shipdate").alias("mn"), F.max("l_shipdate").alias("mx")
    )
    lo, hi = F.lit(_ZM_LO).cast("date"), F.lit(_ZM_HI).cast("date")
    surv = zm.filter((F.col("mx") >= lo) & (F.col("mn") <= hi)).select("file_id")
    res = (
        tagged.join(F.broadcast(surv), "file_id")
        .filter(F.col("l_shipdate").between(lo, hi))
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(38,9)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )
    stats = zm.agg(F.count("*").alias("files_total")).crossJoin(
        surv.agg(F.count("*").alias("files_scanned"))
    )
    return stats.crossJoin(res).select(
        "files_total",
        "files_scanned",
        (F.col("files_total") - F.col("files_scanned")).alias("files_pruned"),
        "n_rows",
        "revenue",
    )


# --------------------------------------------------------------------------
# Binned interval-overlap join: user activity intervals × purchase windows.
# --------------------------------------------------------------------------

_IV_BIN_US = 4 * 3600 * 1_000_000  # 4-hour bins
_IV_HALF_US = 2 * 3600 * 1_000_000  # ±2-hour window
_IV_VALUE = 200.0


@q(
    "join_interval_overlap",
    f"""
    WITH act AS (
      SELECT user_id,
             min(epoch_us(cast(ts AS timestamp))) AS a_lo,
             max(epoch_us(cast(ts AS timestamp))) AS a_hi
      FROM events
      GROUP BY user_id, cast(cast(ts AS timestamp) AS date)),
    win AS (
      SELECT event_id, user_id AS purchaser,
             epoch_us(cast(ts AS timestamp)) - {_IV_HALF_US} AS p_lo,
             epoch_us(cast(ts AS timestamp)) + {_IV_HALF_US} AS p_hi
      FROM events
      WHERE event_type = 'purchase' AND value > {_IV_VALUE})
    SELECT w.event_id, cast(w.purchaser AS bigint) AS purchaser,
           cast(w.p_lo AS bigint) AS win_start_us,
           cast(w.p_hi AS bigint) AS win_end_us,
           cast(count(DISTINCT a.user_id) AS bigint) AS n_active_users
    FROM win w JOIN act a
      ON a.a_lo <= w.p_hi AND w.p_lo <= a.a_hi
    GROUP BY w.event_id, w.purchaser, w.p_lo, w.p_hi
    ORDER BY w.event_id
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via bin blocking (the two-sided generalization
    of the as-of/range joins in extra.py, absent from the reference).

    Both interval sets explode into the 4-hour bins they cover
    (`sequence(lo/W, hi/W)`), the theta join becomes an equi-join on the
    bin, duplicate bin-matches collapse with DISTINCT, and the exact
    overlap predicate runs as a residual.  The oracle is the naive
    inequality join.  At 100 TB the bin equi-join shuffles each interval
    O(span/W) times instead of building an O(n·m) cross product — W is
    tuned to the median interval span, the same discipline as the bucketed
    range join (temporal.py::range_join_buckets).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        # ts is TIMESTAMP_NTZ; session tz is pinned UTC, so the cast is exact
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    act = ev.groupBy(
        "user_id", F.to_date(F.timestamp_micros(F.col("us"))).alias("day")
    ).agg(F.min("us").alias("a_lo"), F.max("us").alias("a_hi"))
    win = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > _IV_VALUE)).select(
        "event_id",
        F.col("user_id").alias("purchaser"),
        (F.col("us") - _IV_HALF_US).alias("p_lo"),
        (F.col("us") + _IV_HALF_US).alias("p_hi"),
    )
    binned = lambda df, lo, hi: df.withColumn(  # noqa: E731
        "bin",
        F.explode(
            F.sequence(
                (F.col(lo) / _IV_BIN_US).cast("long"),
                (F.col(hi) / _IV_BIN_US).cast("long"),
            )
        ),
    )
    pairs = (
        binned(act.select("user_id", "a_lo", "a_hi"), "a_lo", "a_hi")
        .join(binned(win, "p_lo", "p_hi"), "bin")
        .filter((F.col("a_lo") <= F.col("p_hi")) & (F.col("p_lo") <= F.col("a_hi")))
        .select("event_id", "purchaser", "p_lo", "p_hi", "user_id")
        .distinct()
    )
    return (
        pairs.groupBy("event_id", "purchaser", "p_lo", "p_hi")
        .agg(F.count("user_id").alias("n_active_users"))
        .select(
            "event_id",
            "purchaser",
            F.col("p_lo").alias("win_start_us"),
            F.col("p_hi").alias("win_end_us"),
            "n_active_users",
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Count-min sketch as a plain (mergeable) aggregation, portable hashes.
# --------------------------------------------------------------------------

_CMS_P = 1_048_573  # prime modulus
_CMS_W = 128  # buckets per row
_CMS_AB = ((31, 7), (131, 101), (523, 1009), (2053, 10007))


@q(
    "sketch_count_min",
    f"""
    WITH params AS (
      SELECT * FROM (VALUES (0, 31, 7), (1, 131, 101),
                            (2, 523, 1009), (3, 2053, 10007)) AS t(d, a, b)),
    keys AS (SELECT l_suppkey AS k FROM lineitem),
    sk AS (
      SELECT p.d, ((y.k * p.a + p.b) % {_CMS_P}) % {_CMS_W} AS bkt,
             count(*) AS c
      FROM keys y CROSS JOIN params p
      GROUP BY p.d, bkt),
    truth AS (
      SELECT k, count(*) AS true_cnt FROM keys
      GROUP BY k ORDER BY true_cnt DESC, k LIMIT 10),
    est AS (
      SELECT t.k, t.true_cnt, min(s.c) AS est_cnt
      FROM truth t CROSS JOIN params p
      JOIN sk s ON s.d = p.d
               AND s.bkt = ((t.k * p.a + p.b) % {_CMS_P}) % {_CMS_W}
      GROUP BY t.k, t.true_cnt)
    SELECT cast(k AS bigint) AS suppkey,
           cast(true_cnt AS bigint) AS true_cnt,
           cast(est_cnt AS bigint) AS est_cnt,
           cast(est_cnt - true_cnt AS bigint) AS overcount
    FROM est ORDER BY true_cnt DESC, suppkey
    """,
)
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch built as a plain hash aggregation.

    Each row hashes into one bucket per depth (4 pairwise-independent
    integer hashes, engine-portable arithmetic); the sketch is the
    (depth, bucket) → count table — 512 rows regardless of input size,
    partial/final-aggregated map-side like any count, and mergeable across
    corpora by adding bucket counts (same mergeability contract as the
    reference's partial/final ColumnarHashAggregateExec pipelines).
    Probing the top-10 true heavy hitters returns min-over-depths, and the
    oracle rebuilds the identical sketch in SQL, so estimate *and*
    overcount hash-match exactly.  At 100 TB the sketch stays 512 rows
    while the input grows — the canonical pre-pass for skew detection and
    heavy-hitter routing.
    """
    keys = load_table(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("k"))

    def bucket(k, d):
        a, b = _CMS_AB[d]
        return ((k * a + b) % _CMS_P) % _CMS_W

    hashed = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), bucket(F.col("k"), d).alias("bkt")
                    )
                    for d in range(len(_CMS_AB))
                ]
            )
        ).alias("e")
    ).select("e.d", "e.bkt")
    sketch = hashed.groupBy("d", "bkt").agg(F.count("*").alias("c"))

    truth = (
        keys.groupBy("k")
        .agg(F.count("*").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), "k")
        .limit(10)
    )
    probes = truth.select(
        "k",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), bucket(F.col("k"), d).alias("bkt")
                    )
                    for d in range(len(_CMS_AB))
                ]
            )
        ).alias("e"),
    ).select("k", "true_cnt", "e.d", "e.bkt")
    est = (
        probes.join(F.broadcast(sketch), ["d", "bkt"])
        .groupBy("k", "true_cnt")
        .agg(F.min("c").alias("est_cnt"))
    )
    return est.select(
        F.col("k").alias("suppkey"),
        "true_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("true_cnt")).alias("overcount"),
    ).orderBy(F.desc("true_cnt"), "suppkey")


# --------------------------------------------------------------------------
# Spark-4 collation: case-insensitive compare/group/match without lower().
# --------------------------------------------------------------------------


@q(
    "expr_collation",
    """
    WITH mixed AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                  ELSE lower(c_mktsegment) END AS seg
      FROM customer)
    SELECT cast(count(DISTINCT seg) AS bigint) AS n_distinct_cs,
           cast(count(DISTINCT lower(seg)) AS bigint) AS n_distinct_ci,
           cast(count(CASE WHEN lower(seg) = 'building' THEN 1 END) AS bigint)
             AS n_eq_ci,
           cast(count(CASE WHEN contains(lower(seg), 'uild') THEN 1 END)
                AS bigint) AS n_contains_ci,
           cast(count(CASE WHEN lower(seg) LIKE '%uto%' THEN 1 END) AS bigint)
             AS n_like_ci
    FROM mixed
    """,
)
def expr_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 collation-aware string semantics (`collate(col,
    'UTF8_LCASE')`): equality, DISTINCT, contains() and LIKE all become
    case-insensitive *inside the comparison operator* — no lower() rewrite
    of the data.  The reference's Gandiva expressions are binary-collation
    only (SURVEY §2.8); the oracle expresses the identical semantics with
    the classic lower() rewrite, proving the collated operators match it.
    At 100 TB collation beats the rewrite because the original bytes flow
    through shuffle/sort unchanged (no second copy of every string column)
    and hash/compare specializations stay JVM-codegen'd.
    """
    mixed = load_table(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment"))
        .otherwise(F.lower("c_mktsegment"))
        .alias("seg")
    )
    ci = F.expr("collate(seg, 'UTF8_LCASE')")
    return mixed.agg(
        F.countDistinct("seg").alias("n_distinct_cs"),
        F.countDistinct(ci).alias("n_distinct_ci"),
        F.count(F.when(ci == "building", 1)).alias("n_eq_ci"),
        F.count(F.when(F.contains(ci, F.lit("uild")), 1)).alias("n_contains_ci"),
        F.count(F.when(ci.like("%uto%"), 1)).alias("n_like_ci"),
    )


# --------------------------------------------------------------------------
# Join-key skew profiler: feeds the salt factor of skew.py::salted_join.
# --------------------------------------------------------------------------


@q(
    "profile_skew_topkeys",
    """
    WITH freq AS (SELECT user_id, count(*) AS freq FROM events GROUP BY user_id),
    stats AS (
      SELECT cast(sum(freq) AS bigint) AS n_rows,
             cast(count(*) AS bigint) AS n_keys,
             sum(freq) * 1.0 / count(*) AS avg_freq
      FROM freq)
    SELECT cast(f.user_id AS bigint) AS user_id,
           cast(f.freq AS bigint) AS freq,
           cast(round(f.freq / s.avg_freq, 4) AS double) AS skew_ratio,
           cast(greatest(1, ceil(f.freq / s.avg_freq)) AS bigint) AS salt_parts,
           s.n_rows, s.n_keys
    FROM freq f CROSS JOIN stats s
    ORDER BY f.freq DESC, f.user_id LIMIT 5
    """,
)
def profile_skew_topkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler: per-key frequency vs the mean, emitting the
    salt factor `skew.py::salted_join` would need for each hot key.

    One hash aggregation over the key column (map-side combined), a 1-row
    global stats aggregate broadcast back, top-k via TakeOrdered.  This is
    the pre-flight a 100 TB join runs to decide between plain shuffle, AQE
    skew split, and explicit salting — the reference leaves skew entirely
    to AQE (SURVEY §2.9); profiling makes the decision data-driven.
    """
    freq = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("freq"))
    )
    stats = freq.agg(
        F.sum("freq").alias("n_rows"),
        F.count("*").alias("n_keys"),
        (F.sum("freq") / F.count("*")).alias("avg_freq"),
    )
    return (
        freq.crossJoin(F.broadcast(stats))
        .select(
            "user_id",
            "freq",
            F.round(F.col("freq") / F.col("avg_freq"), 4)
            .cast("double")
            .alias("skew_ratio"),
            F.greatest(F.lit(1), F.ceil(F.col("freq") / F.col("avg_freq")))
            .cast("long")
            .alias("salt_parts"),
            "n_rows",
            "n_keys",
        )
        .orderBy(F.desc("freq"), "user_id")
        .limit(5)
    )
