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


@q(
    "expr_variant_semistructured",
    """
    SELECT o_orderstatus AS grp,
           cast(count(*) AS bigint) AS n,
           cast(sum(o_orderkey) AS bigint) AS key_sum,
           round(sum(o_totalprice), 2) AS total,
           cast(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
                AS bigint) AS n_urgent,
           cast(count(NULL) AS bigint) AS miss_n
    FROM orders WHERE o_orderkey < 8000
    GROUP BY o_orderstatus ORDER BY grp
    """,
)
def expr_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 VARIANT semi-structured pipeline: each order row becomes a
    JSON document, `parse_json` ingests it as an open-schema VARIANT, and
    typed `variant_get` path extraction (`$.k`, `$.nested.s`, array index
    `$.tags[0]`) feeds a normal relational aggregate; `try_variant_get` on
    a missing path must yield NULL (counted: 0), not error.  The oracle
    computes the identical aggregate straight from the base columns, so a
    path/typing slip in the VARIANT layer changes every group.  VARIANT
    binary encoding stays JVM-side end-to-end (no Python in the loop) —
    at 100 TB this is the schema-drift-tolerant ingestion path: one
    VARIANT column instead of a brittle wide schema, shredded on read.
    Beyond the reference: Gandiva has no semi-structured type (SURVEY
    §2.8); this is the modern replacement for its JSON string UDF chains."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 8000)
    doc = orders.select(
        F.parse_json(
            F.to_json(
                F.struct(
                    F.col("o_orderkey").alias("k"),
                    F.struct(
                        F.col("o_orderstatus").alias("s"),
                        F.col("o_totalprice").alias("p"),
                    ).alias("nested"),
                    F.array(F.col("o_orderpriority")).alias("tags"),
                )
            )
        ).alias("v")
    )
    got = doc.select(
        F.expr("variant_get(v, '$.nested.s', 'string')").alias("grp"),
        F.expr("variant_get(v, '$.k', 'long')").alias("k"),
        F.expr("variant_get(v, '$.nested.p', 'double')").alias("p"),
        F.expr("variant_get(v, '$.tags[0]', 'string')").alias("pri"),
        F.expr("try_variant_get(v, '$.zzz.nope', 'long')").alias("miss"),
    )
    return (
        got.groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("bigint").alias("key_sum"),
            F.round(F.sum("p"), 2).alias("total"),
            F.count(F.when(F.col("pri") == "1-URGENT", 1)).alias("n_urgent"),
            F.count("miss").alias("miss_n"),
        )
        .orderBy("grp")
    )


@q(
    "expr_recursive_date_spine",
    """
    WITH RECURSIVE spine(d) AS (
      SELECT DATE '1992-01-01'
      UNION ALL
      SELECT cast(d + INTERVAL '1' MONTH AS date) FROM spine
      WHERE d < DATE '1992-12-01'
    )
    SELECT cast(count(*) AS bigint) AS months,
           cast(min(d) AS string) AS first_month,
           cast(max(d) AS string) AS last_month,
           cast(sum(extract(month FROM d)) AS bigint) AS month_sum
    FROM spine
    """,
)
def expr_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 recursive CTE (`WITH RECURSIVE`, SPARK-24497): a date-spine
    generator — the canonical analytics use (calendar fill for gap-free
    time series) — run as the SAME SQL text on both engines; the oracle is
    the identical recursion in DuckDB, so anchor/step semantics and the
    termination condition must agree exactly.  Recursion executes as
    iterated union steps on the driver plan; each step is a distributed
    job, so a 10^4-row spine costs 12 tiny steps, never a collect.  Beyond
    the reference: Gandiva has no iterative construct (SURVEY §2.8)."""
    return spark.sql(
        """
        WITH RECURSIVE spine(d) AS (
          SELECT DATE '1992-01-01'
          UNION ALL
          SELECT cast(d + INTERVAL '1' MONTH AS date) FROM spine
          WHERE d < DATE '1992-12-01'
        )
        SELECT cast(count(*) AS bigint) AS months,
               cast(min(d) AS string) AS first_month,
               cast(max(d) AS string) AS last_month,
               cast(sum(extract(month FROM d)) AS bigint) AS month_sum
        FROM spine
        """
    )


@q(
    "expr_xml_roundtrip",
    """
    SELECT o_orderstatus AS grp,
           cast(count(*) AS bigint) AS n,
           cast(sum(o_orderkey) AS bigint) AS key_sum,
           round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_orderkey < 8000
    GROUP BY o_orderstatus ORDER BY grp
    """,
)
def expr_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 built-in XML expressions: each order row serializes to an
    XML document (`to_xml`) and parses back through a typed schema
    (`from_xml`) before aggregating — the XML sibling of the VARIANT and
    Avro interchange entries, covering the last first-class semi-structured
    text format Spark 4 added (SPARK-44751).  Both directions are JVM
    codegen'd expressions (no Python in the loop).  The oracle computes
    the same aggregate from the base columns, so any escaping/typing loss
    in the XML layer changes the sums."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 8000)
    xml = orders.select(
        F.to_xml(
            F.struct(
                F.col("o_orderkey").alias("k"),
                F.col("o_orderstatus").alias("s"),
                F.col("o_totalprice").alias("p"),
            )
        ).alias("doc")
    )
    back = xml.select(
        F.from_xml("doc", "k bigint, s string, p double").alias("r")
    ).select("r.*")
    return (
        back.groupBy(F.col("s").alias("grp"))
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("bigint").alias("key_sum"),
            F.round(F.sum("p"), 2).alias("total"),
        )
        .orderBy("grp")
    )


@q(
    "expr_sql_scripting",
    """
    SELECT cast(sum(CASE WHEN o_orderkey % 2 = 0 THEN o_orderkey END) AS bigint)
             AS even_sum,
           cast(385 AS bigint) AS loop_sum
    FROM orders WHERE o_orderkey < 1000
    """,
)
def expr_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 SQL scripting (`BEGIN … END`, session variables, WHILE):
    a procedural block declares variables, runs a WHILE loop (sum of
    squares 1..10 = 385 — the oracle pins the closed form) and finishes
    with a query that mixes the loop result into a real aggregate over
    orders.  The loop is driver-side control flow over tiny state; the
    final SELECT is the only distributed job — the right division of
    labor for procedural SQL on a cluster."""
    from native_sql_engine_spark.catalog import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(
        """
        BEGIN
          DECLARE i INT DEFAULT 1;
          DECLARE acc BIGINT DEFAULT 0;
          WHILE i <= 10 DO
            SET acc = acc + i * i;
            SET i = i + 1;
          END WHILE;
          SELECT cast(sum(CASE WHEN o_orderkey % 2 = 0 THEN o_orderkey END)
                      AS bigint) AS even_sum,
                 cast(acc AS bigint) AS loop_sum
          FROM orders WHERE o_orderkey < 1000;
        END
        """
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


# --------------------------------------------------------------------------
# Bloom-filter semi-join reduction, bitset-as-data (portable hashes).
# --------------------------------------------------------------------------

_BF_M = 65536
_BF_P = 2_147_483_647  # 2^31 - 1, prime
_BF_AB = ((2654435761, 1), (40503, 2017), (2246822519, 97))


@q(
    "join_bloom_bitset",
    f"""
    WITH params AS (
      SELECT * FROM (VALUES (0, 2654435761, 1), (1, 40503, 2017),
                            (2, 2246822519, 97)) AS t(i, a, b)),
    build AS (
      SELECT DISTINCT o_orderkey AS k FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000),
    bits AS (
      SELECT DISTINCT ((d.k * p.a + p.b) % {_BF_P}) % {_BF_M} AS pos
      FROM build d CROSS JOIN params p),
    probe AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
    cand AS (
      SELECT pr.k
      FROM probe pr CROSS JOIN params p
      JOIN bits s ON s.pos = ((pr.k * p.a + p.b) % {_BF_P}) % {_BF_M}
      GROUP BY pr.k HAVING count(*) = 3),
    truek AS (SELECT k FROM cand WHERE k IN (SELECT k FROM build)),
    res AS (
      SELECT count(*) AS n_rows,
             cast(round(sum(cast(l_quantity AS decimal(38,9))), 2) AS double)
               AS sum_qty
      FROM lineitem WHERE l_orderkey IN (SELECT k FROM truek))
    SELECT (SELECT cast(count(*) AS bigint) FROM cand) AS n_candidates,
           (SELECT cast(count(*) AS bigint) FROM truek) AS n_true_keys,
           (SELECT cast(count(*) AS bigint) FROM cand)
             - (SELECT cast(count(*) AS bigint) FROM truek)
             AS n_false_positives,
           cast(res.n_rows AS bigint) AS n_rows, res.sum_qty AS sum_qty
    FROM res
    """,
)
def join_bloom_bitset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction with the filter materialized AS DATA.

    The build side's keys set k=3 portable hash positions in a 65536-slot
    bitset (stored as the distinct-position table — ≤ m rows no matter how
    many keys); the probe side keeps only keys whose 3 positions are all
    set (broadcast join on position + HAVING count(*)=3), then an exact
    semi join removes false positives, so the final answer is exact and
    the oracle rebuilds the identical bitset to hash-match the candidate
    and false-positive counts too.  This is the semi-join-reduction the
    reference gets from its broadcast build side
    (ColumnarBroadcastExchangeExec.scala:46) and Spark gets from runtime
    bloom filters (plan-asserted in
    tests/test_plans.py::test_runtime_bloom_filter_prunes_fact_scan) —
    materializing it as data makes it shippable across queries/systems
    (store it next to the table, reuse it for every probe).  At 100 TB the
    bitset stays ≤ 65536 rows (or a scaled m) while pruning the probe's
    shuffle before the expensive join.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    build = (
        orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 300000)
        )
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )

    def positions(k):
        return [((k * a + b) % _BF_P) % _BF_M for a, b in _BF_AB]

    bits = (
        build.select(
            F.explode(F.array(*[p.alias("pos") for p in positions(F.col("k"))])).alias(
                "pos"
            )
        )
        .distinct()
    )
    probe = li.select(F.col("l_orderkey").alias("k")).distinct()
    probed = probe.select(
        "k", F.explode(F.array(*positions(F.col("k")))).alias("pos")
    )
    cand = (
        probed.join(F.broadcast(bits), "pos")
        .groupBy("k")
        .agg(F.count("*").alias("nhit"))
        .filter(F.col("nhit") == len(_BF_AB))
        .select("k")
    )
    # flag true keys with ONE broadcast join and persist the (tiny,
    # ≤candidate-count rows) flagged set: the candidate pipeline — which
    # includes the full probe-side distinct shuffle — previously recomputed
    # once per consumer (truek semi-join, n_candidates count, n_true_keys
    # count: 22 Exchanges); now it runs once.  Downstream joins broadcast
    # truek explicitly, so InMemoryRelation stats cannot demote them.
    cand_flag = cand.join(
        F.broadcast(build.withColumn("_b", F.lit(1))), "k", "left"
    ).persist()
    truek = cand_flag.filter(F.col("_b").isNotNull()).select("k")
    res = li.join(F.broadcast(truek), li.l_orderkey == truek.k, "left_semi").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(38,9)")), 2)
        .cast("double")
        .alias("sum_qty"),
    )
    counts = cand_flag.agg(
        F.count("*").alias("n_candidates"),
        F.count("_b").alias("n_true_keys"),
    )
    return counts.crossJoin(res).select(
        "n_candidates",
        "n_true_keys",
        (F.col("n_candidates") - F.col("n_true_keys")).alias("n_false_positives"),
        "n_rows",
        "sum_qty",
    )


# --------------------------------------------------------------------------
# Linear-counting distinct sketch (portable hash, closed-form estimator).
# --------------------------------------------------------------------------

_LC_M = 4096
_LC_A, _LC_B = 48271, 11


@q(
    "sketch_linear_counting",
    f"""
    WITH h AS (
      SELECT DISTINCT ((o_custkey * {_LC_A} + {_LC_B}) % {_BF_P}) % {_LC_M}
               AS bkt
      FROM orders),
    f AS (SELECT count(*) AS filled FROM h),
    t AS (SELECT count(DISTINCT o_custkey) AS true_distinct FROM orders)
    SELECT cast(f.filled AS bigint) AS n_buckets_filled,
           cast(round(-{_LC_M} * ln(1.0 - f.filled / {_LC_M}.0), 2) AS double)
             AS est_distinct,
           cast(t.true_distinct AS bigint) AS true_distinct
    FROM f, t
    """,
)
def sketch_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-counting distinct sketch: hash keys into a 4096-slot bitmap,
    estimate distinct = -m·ln(1 - filled/m).

    The sketch state is the set of filled buckets (≤ m rows), mergeable
    across partitions/corpora by union — the same partial/final shape as
    approx_count_distinct's HLL but with portable arithmetic the oracle
    replays exactly, so the bucket count AND the closed-form estimate
    hash-match DuckDB.  At 100 TB: one scan, map-side distinct on
    (bucket), constant-size state; accuracy degrades predictably as
    filled→m, at which point the same plan swaps in HLL
    (`agg_hll_mergeable`).
    """
    orders = load_table(spark, sf_dir, "orders")
    h = (
        orders.select(
            (((F.col("o_custkey") * _LC_A + _LC_B) % _BF_P) % _LC_M).alias("bkt")
        )
        .distinct()
    )
    f = h.agg(F.count("*").alias("filled"))
    t = orders.agg(F.countDistinct("o_custkey").alias("true_distinct"))
    return f.crossJoin(t).select(
        F.col("filled").alias("n_buckets_filled"),
        F.round(
            -F.lit(float(_LC_M))
            * F.log(F.lit(1.0) - F.col("filled") / F.lit(float(_LC_M))),
            2,
        )
        .cast("double")
        .alias("est_distinct"),
        "true_distinct",
    )


# --------------------------------------------------------------------------
# Linear interpolation over a dense calendar grid (gap-fill's smooth twin).
# --------------------------------------------------------------------------


@q(
    "timeseries_interpolate_linear",
    """
    WITH daily AS (
      SELECT user_id, cast(cast(ts AS timestamp) AS date) AS d,
             sum(value) AS v
      FROM events GROUP BY 1, 2),
    span AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
    grid AS (
      SELECT u.user_id, g.d
      FROM (SELECT DISTINCT user_id FROM daily) u
      CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::date
                    AS d FROM span) g),
    joined AS (
      SELECT g.user_id, g.d, daily.v
      FROM grid g LEFT JOIN daily ON daily.user_id = g.user_id
                                 AND daily.d = g.d),
    anchored AS (
      SELECT user_id, d, v,
             last_value(v IGNORE NULLS) OVER w_prev AS v_prev,
             last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
               OVER w_prev AS d_prev,
             first_value(v IGNORE NULLS) OVER w_next AS v_next,
             first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
               OVER w_next AS d_next
      FROM joined
      WINDOW
        w_prev AS (PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT cast(user_id AS bigint) AS user_id, cast(d AS varchar) AS day,
           cast(round(cast(CASE
             WHEN v IS NOT NULL THEN v
             WHEN v_prev IS NULL THEN v_next
             WHEN v_next IS NULL THEN v_prev
             ELSE v_prev + (v_next - v_prev)
                  * (d - d_prev) * 1.0 / (d_next - d_prev)
           END AS decimal(38,9)), 2) AS double) AS v_interp,
           cast(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS bigint)
             AS was_missing
    FROM anchored
    ORDER BY user_id, d
    """,
)
def timeseries_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over a dense user×day grid — the smooth twin of
    `timeseries_gapfill`'s LOCF.

    One shuffle on user_id serves both window passes (prev/next non-null
    anchor value AND anchor date via last/first IGNORE NULLS); missing
    days get v_prev + slope·(d−d_prev), boundary gaps fall back to
    nearest-anchor fill.  The calendar grid is |users|×|days| rows built
    with `sequence()`; at 100 TB the grid explodes distributedly from the
    per-user span (no driver materialization) and the plan stays two
    window passes over one hash partitioning.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date(F.col("ts").cast("timestamp")).alias("d")
    ).agg(F.sum("value").alias("v"))
    span = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    grid = (
        daily.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d"),
        )
    )
    joined = grid.join(daily, ["user_id", "d"], "left")
    from pyspark.sql import Window as W

    w_prev = (
        W.partitionBy("user_id").orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    )
    w_next = (
        W.partitionBy("user_id").orderBy("d").rowsBetween(0, W.unboundedFollowing)
    )
    anchor_d = F.when(F.col("v").isNotNull(), F.col("d"))
    anchored = joined.select(
        "user_id",
        "d",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("v_prev"),
        F.last(anchor_d, ignorenulls=True).over(w_prev).alias("d_prev"),
        F.first("v", ignorenulls=True).over(w_next).alias("v_next"),
        F.first(anchor_d, ignorenulls=True).over(w_next).alias("d_next"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("v_prev").isNull(), F.col("v_next"))
        .when(F.col("v_next").isNull(), F.col("v_prev"))
        .otherwise(
            F.col("v_prev")
            + (F.col("v_next") - F.col("v_prev"))
            * F.datediff("d", "d_prev")
            / F.datediff("d_next", "d_prev")
        )
    )
    return anchored.select(
        "user_id",
        F.col("d").cast("string").alias("day"),
        F.round(interp.cast("decimal(38,9)"), 2).cast("double").alias("v_interp"),
        F.when(F.col("v").isNull(), 1).otherwise(0).cast("long").alias("was_missing"),
    ).orderBy("user_id", "day")


# --------------------------------------------------------------------------
# Incremental view maintenance: apply CDC deltas to a materialized aggregate.
# --------------------------------------------------------------------------

_IVM_CUTOFF = "1998-01-01"


@q(
    "ivm_aggregate_deltas",
    f"""
    WITH base AS (
      SELECT * FROM orders WHERE o_orderdate < DATE '{_IVM_CUTOFF}'),
    view_base AS (
      SELECT o_orderpriority, count(*) AS n, sum(o_totalprice) AS total
      FROM base GROUP BY o_orderpriority),
    cdc AS (
      SELECT o_orderpriority, -1 AS sign, o_totalprice
      FROM base WHERE o_orderkey % 97 = 0
      UNION ALL
      SELECT o_orderpriority, 1 AS sign, o_totalprice
      FROM orders WHERE o_orderdate >= DATE '{_IVM_CUTOFF}'),
    delta AS (
      SELECT o_orderpriority, sum(sign) AS dn,
             sum(sign * o_totalprice) AS dtotal
      FROM cdc GROUP BY o_orderpriority),
    merged AS (
      SELECT coalesce(v.o_orderpriority, d.o_orderpriority) AS o_orderpriority,
             coalesce(v.n, 0) + coalesce(d.dn, 0) AS n,
             coalesce(v.total, 0) + coalesce(d.dtotal, 0) AS total
      FROM view_base v FULL OUTER JOIN delta d USING (o_orderpriority))
    SELECT o_orderpriority, cast(n AS bigint) AS n_orders,
           cast(round(cast(total AS decimal(38,9)), 2) AS double)
             AS total_price
    FROM merged WHERE n > 0
    ORDER BY o_orderpriority
    """,
)
def ivm_aggregate_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a materialized GROUP BY is updated
    from a CDC delta stream (inserts +1 / deletes −1) WITHOUT rescanning
    the base table.

    The view stores (group, count, sum); the delta batch aggregates to
    (group, Δcount, Δsum) and a full-outer merge adds them — groups
    dropping to zero rows disappear.  The oracle recomputes the post-CDC
    view directly, proving delta-application ≡ recomputation.  At 100 TB
    the base is never re-read: maintenance cost scales with the delta
    (the same partial/final agg mergeability the reference's
    ColumnarHashAggregateExec partial pipelines rely on; avg/stddev extend
    via (count, sum, m2) state like `rollup_incremental_merge`).
    """
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(_IVM_CUTOFF).cast("date")
    base = orders.filter(F.col("o_orderdate") < cutoff)
    view_base = base.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.sum("o_totalprice").alias("total")
    )
    deletes = base.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderpriority", F.lit(-1).alias("sign"), "o_totalprice"
    )
    inserts = orders.filter(F.col("o_orderdate") >= cutoff).select(
        "o_orderpriority", F.lit(1).alias("sign"), "o_totalprice"
    )
    delta = (
        deletes.unionAll(inserts)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("sign").alias("dn"),
            F.sum(F.col("sign") * F.col("o_totalprice")).alias("dtotal"),
        )
    )
    merged = view_base.join(delta, "o_orderpriority", "full_outer").select(
        "o_orderpriority",
        (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
        (F.coalesce("total", F.lit(0.0)) + F.coalesce("dtotal", F.lit(0.0))).alias(
            "total"
        ),
    )
    return (
        merged.filter(F.col("n") > 0)
        .select(
            "o_orderpriority",
            F.col("n").alias("n_orders"),
            F.round(F.col("total").cast("decimal(38,9)"), 2)
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Connected components as a first-class battery entry (recursive-CTE oracle).
# --------------------------------------------------------------------------

_CC_SUPP_OFFSET = 1_000_000
_CC_MONTH_LO, _CC_MONTH_HI = "1995-03-01", "1995-03-31"
_CC_MIN_QTY = 48


@q(
    "graph_connected_components",
    f"""
    WITH scoped AS (
      SELECT DISTINCT o.o_custkey AS cust,
                      l.l_suppkey + {_CC_SUPP_OFFSET} AS supp
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate BETWEEN DATE '{_CC_MONTH_LO}'
                              AND DATE '{_CC_MONTH_HI}'
        AND l.l_quantity >= {_CC_MIN_QTY}),
    edges0 AS (
      SELECT cust AS src, supp AS dst FROM scoped
      UNION
      SELECT supp AS src, cust AS dst FROM scoped),
    nodes AS (SELECT DISTINCT src AS node FROM edges0),
    reach AS (
      WITH RECURSIVE r(node, lbl) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.dst, r.lbl FROM r JOIN edges0 e ON e.src = r.node)
      SELECT * FROM r)
    SELECT cast(node AS bigint) AS node,
           cast(min(lbl) AS bigint) AS component
    FROM reach GROUP BY node ORDER BY node
    """,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over a bipartite customer–supplier trade graph
    (suppliers offset into their own id space), labels = min reachable id.

    Runs `operators/dedup.py::connected_components` — driver union-find
    under the documented SMALL_GRAPH_EDGES bound, distributed min-label
    propagation with path halving (O(log diameter) rounds, two map-side-
    combinable shuffle joins per round) beyond it.  The oracle is a
    recursive-CTE transitive closure, tractable because the graph is
    scoped (one month, high-quantity lineitems) — the same label
    definition the distributed path computes on billions of edges.
    """
    from ..operators.dedup import connected_components

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    scoped = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("o_orderdate").between(
                F.lit(_CC_MONTH_LO).cast("date"), F.lit(_CC_MONTH_HI).cast("date")
            )
            & (F.col("l_quantity") >= _CC_MIN_QTY)
        )
        .select(
            F.col("o_custkey").alias("a_id"),
            (F.col("l_suppkey") + _CC_SUPP_OFFSET).alias("b_id"),
        )
        .distinct()
    )
    return connected_components(scoped, "a_id", "b_id").orderBy("node")


# --------------------------------------------------------------------------
# Exact mergeable distinct via RoaringBitmap-style bitmap aggregates
# (Spark 3.5+ bitmap_construct_agg / bitmap_or_agg).
# --------------------------------------------------------------------------


@q(
    "sketch_bitmap_distinct",
    """
    WITH direct AS (
      SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_distinct_direct
      FROM orders GROUP BY o_orderpriority)
    SELECT o_orderpriority,
           cast(n_distinct_direct AS bigint) AS n_distinct_direct,
           cast(n_distinct_direct AS bigint) AS n_distinct_merged
    FROM direct ORDER BY o_orderpriority
    """,
)
def sketch_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting as a mergeable aggregation: keys become set
    bits in fixed 4096-byte bitmap segments (Spark's bitmap_construct_agg,
    segment = bitmap_bucket_number), counted with bitmap_count and merged
    across sub-aggregations with bitmap_or_agg.

    Two paths must agree: (a) direct — one bitmap per (priority, segment);
    (b) merged — bitmaps built per (priority, month, segment), then OR-folded
    over months.  (b) is the shape that makes exact distinct *incremental*
    at 100 TB: daily/monthly partial bitmaps persist next to the data and a
    rollup is a cheap OR, never a re-scan — the exact-math twin of
    `agg_hll_mergeable`, with memory proportional to key range per segment
    instead of a fixed sketch error.  COUNT(DISTINCT) forces Spark's
    two-shuffle Expand plan; the bitmap path is one partial/final agg over
    (group, segment), the same mergeable-partial-state discipline as the
    reference's ColumnarHashAggregateExec partial pipelines.
    """
    orders = load_table(spark, sf_dir, "orders")
    seg = F.bitmap_bucket_number(F.col("o_custkey")).alias("seg")
    pos = F.bitmap_bit_position(F.col("o_custkey"))
    direct = (
        orders.groupBy("o_orderpriority", seg)
        .agg(F.bitmap_construct_agg(pos).alias("bm"))
        .groupBy("o_orderpriority")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_distinct_direct"))
    )
    merged = (
        orders.groupBy(
            "o_orderpriority", F.trunc("o_orderdate", "month").alias("mon"), seg
        )
        .agg(F.bitmap_construct_agg(pos).alias("bm"))
        .groupBy("o_orderpriority", "seg")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("o_orderpriority")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_distinct_merged"))
    )
    return (
        direct.join(merged, "o_orderpriority")
        .select("o_orderpriority", "n_distinct_direct", "n_distinct_merged")
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — deterministic, oracle-replayable.
# --------------------------------------------------------------------------

_KMV_K = 64
_KMV_A, _KMV_B = 69621, 113


@q(
    "sketch_kmv_distinct",
    f"""
    WITH h AS (
      SELECT DISTINCT o_orderpriority,
             ((o_custkey * {_KMV_A} + {_KMV_B}) % {_BF_P}) AS hv
      FROM orders),
    ranked AS (
      SELECT o_orderpriority, hv,
             row_number() OVER (PARTITION BY o_orderpriority ORDER BY hv)
               AS rn
      FROM h),
    kth AS (
      SELECT o_orderpriority, hv AS kth_hash FROM ranked
      WHERE rn = {_KMV_K}),
    t AS (
      SELECT o_orderpriority, count(DISTINCT o_custkey) AS true_distinct
      FROM orders GROUP BY o_orderpriority)
    SELECT k.o_orderpriority, cast(k.kth_hash AS bigint) AS kth_hash,
           cast(round(({_KMV_K} - 1) * {_BF_P}.0 / k.kth_hash, 2) AS double)
             AS est_distinct,
           cast(t.true_distinct AS bigint) AS true_distinct
    FROM kth k JOIN t USING (o_orderpriority)
    ORDER BY o_orderpriority
    """,
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct sketch per group: keep the K smallest
    distinct hash values; estimate distinct ≈ (K−1)·P / kth_min.

    The sketch state is K numbers per group — mergeable by "union, keep K
    smallest", which is exactly a partial TopK/min-heap aggregation — and
    because the hash is portable integer arithmetic the oracle replays the
    identical sketch, so the kth hash AND the closed-form estimate
    hash-match DuckDB (same IEEE-double division).  At 100 TB this is the
    distinct sketch you pick when sketches must be *set-algebra composable*
    (union = merge; intersection via inclusion–exclusion on the union
    sketch), which HLL cannot do exactly; per-group state stays K·8 bytes.
    """
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    h = orders.select(
        "o_orderpriority",
        ((F.col("o_custkey") * _KMV_A + _KMV_B) % _BF_P).alias("hv"),
    ).distinct()
    w = W.partitionBy("o_orderpriority").orderBy("hv")
    kth = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == _KMV_K)
        .select("o_orderpriority", F.col("hv").alias("kth_hash"))
    )
    t = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("true_distinct")
    )
    return (
        kth.join(t, "o_orderpriority")
        .select(
            "o_orderpriority",
            "kth_hash",
            F.round(F.lit(float(_KMV_K - 1)) * F.lit(float(_BF_P)) / F.col("kth_hash"), 2)
            .cast("double")
            .alias("est_distinct"),
            "true_distinct",
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# OHLC candlestick downsampling (time-series bar aggregation).
# --------------------------------------------------------------------------


@q(
    "timeseries_ohlc_bars",
    """
    WITH base AS (
      SELECT user_id, cast(date_trunc('week', cast(ts AS timestamp)) AS date)
               AS wk,
             value, ts, event_id
      FROM events WHERE event_type IN ('purchase', 'click')),
    ranked AS (
      SELECT user_id, wk, value,
             row_number() OVER (PARTITION BY user_id, wk
                                ORDER BY ts, event_id) AS rn_open,
             row_number() OVER (PARTITION BY user_id, wk
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM base)
    SELECT cast(user_id AS bigint) AS user_id, cast(wk AS varchar) AS week,
           cast(round(cast(max(CASE WHEN rn_open = 1 THEN value END)
                 AS decimal(38,9)), 2) AS double) AS open,
           cast(round(cast(max(value) AS decimal(38,9)), 2) AS double) AS high,
           cast(round(cast(min(value) AS decimal(38,9)), 2) AS double) AS low,
           cast(round(cast(max(CASE WHEN rn_close = 1 THEN value END)
                 AS decimal(38,9)), 2) AS double) AS close,
           cast(count(*) AS bigint) AS n_events
    FROM ranked
    GROUP BY user_id, wk
    HAVING count(*) >= 3
    ORDER BY user_id, wk
    """,
)
def timeseries_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick downsampling: per user×week bars with open (first
    value by (ts, event_id)), high, low, close (last value) and the bar's
    event count — the canonical tick→bar compaction every time-series store
    (and the reference's window-agg surface) serves.

    Both row_number passes and the final aggregation share ONE hash
    partitioning on (user_id, week) — Spark plans a single Exchange
    followed by two sorts and the agg, so at 100 TB the tick table moves
    through the cluster exactly once.  Ties are broken by event_id, making
    open/close deterministic under parallel replay (and oracle-replayable:
    DuckDB runs the identical ranked CTE).
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    base = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        F.date_trunc("week", F.col("ts").cast("timestamp")).cast("date").alias("wk"),
        "value",
        "ts",
        "event_id",
    )
    w_open = W.partitionBy("user_id", "wk").orderBy("ts", "event_id")
    w_close = W.partitionBy("user_id", "wk").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = base.select(
        "user_id",
        "wk",
        "value",
        F.row_number().over(w_open).alias("rn_open"),
        F.row_number().over(w_close).alias("rn_close"),
    )

    def _r2(c):
        return F.round(c.cast("decimal(38,9)"), 2).cast("double")

    return (
        ranked.groupBy("user_id", "wk")
        .agg(
            _r2(F.max(F.when(F.col("rn_open") == 1, F.col("value")))).alias("open"),
            _r2(F.max("value")).alias("high"),
            _r2(F.min("value")).alias("low"),
            _r2(F.max(F.when(F.col("rn_close") == 1, F.col("value")))).alias("close"),
            F.count("*").alias("n_events"),
        )
        .filter(F.col("n_events") >= 3)
        .select(
            "user_id",
            F.col("wk").cast("string").alias("week"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
        .orderBy("user_id", "week")
    )


# --------------------------------------------------------------------------
# KMV sketch set algebra: union / intersection estimates by sketch merge.
# --------------------------------------------------------------------------


@q(
    "sketch_kmv_setops",
    f"""
    WITH a AS (
      SELECT DISTINCT ((o_custkey * {_KMV_A} + {_KMV_B}) % {_BF_P}) AS hv,
             o_custkey
      FROM orders WHERE o_orderpriority = '1-URGENT'),
    b AS (
      SELECT DISTINCT ((o_custkey * {_KMV_A} + {_KMV_B}) % {_BF_P}) AS hv,
             o_custkey
      FROM orders WHERE o_orderpriority = '5-LOW'),
    ka AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) rn
                           FROM (SELECT DISTINCT hv FROM a)) WHERE rn = {_KMV_K}),
    kb AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) rn
                           FROM (SELECT DISTINCT hv FROM b)) WHERE rn = {_KMV_K}),
    ku AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) rn
                           FROM (SELECT DISTINCT hv FROM
                                 (SELECT hv FROM a UNION SELECT hv FROM b)))
           WHERE rn = {_KMV_K}),
    t AS (
      SELECT count(DISTINCT x.o_custkey) AS true_union,
             count(DISTINCT CASE WHEN ina AND inb THEN x.o_custkey END)
               AS true_intersection
      FROM (SELECT o_custkey,
                   max(o_orderpriority = '1-URGENT') AS ina,
                   max(o_orderpriority = '5-LOW') AS inb
            FROM orders
            WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
            GROUP BY o_custkey) x)
    SELECT cast(ka.hv AS bigint) AS kth_a, cast(kb.hv AS bigint) AS kth_b,
           cast(ku.hv AS bigint) AS kth_union,
           cast(round(({_KMV_K} - 1) * {_BF_P}.0 / ku.hv, 2) AS double)
             AS est_union,
           cast(round(({_KMV_K} - 1) * {_BF_P}.0 / ka.hv
                      + ({_KMV_K} - 1) * {_BF_P}.0 / kb.hv
                      - ({_KMV_K} - 1) * {_BF_P}.0 / ku.hv, 2) AS double)
             AS est_intersection,
           cast(t.true_union AS bigint) AS true_union,
           cast(t.true_intersection AS bigint) AS true_intersection
    FROM ka, kb, ku, t
    """,
)
def sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET ALGEBRA — the property HLL doesn't have: two KMV
    sketches merge by union-keep-K-smallest into a valid sketch of A∪B,
    and |A∩B| follows by inclusion–exclusion on the three estimates.

    At 100 TB this answers "how many users overlap between corpus X and
    corpus Y" from two K·8-byte sketches computed independently (per
    corpus, per day, per shard — merged later), never co-scanning the
    corpora.  All three kth-hashes AND both estimates hash-match the
    oracle's replay; the true union/intersection ride along to show the
    error envelope."""
    orders = load_table(spark, sf_dir, "orders")
    hv = ((F.col("o_custkey") * _KMV_A + _KMV_B) % _BF_P).alias("hv")

    def sketch_kth(prio: str):
        return (
            orders.filter(F.col("o_orderpriority") == prio)
            .select(hv)
            .distinct()
            .orderBy("hv")
            .limit(_KMV_K)
            .agg(F.max("hv"))
            .first()[0]
        )

    ha = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(hv).distinct()
    hb = orders.filter(F.col("o_orderpriority") == "5-LOW").select(hv).distinct()
    kth_a, kth_b = sketch_kth("1-URGENT"), sketch_kth("5-LOW")
    kth_u = (
        ha.union(hb).distinct().orderBy("hv").limit(_KMV_K).agg(F.max("hv")).first()[0]
    )
    est = lambda kth: float(_KMV_K - 1) * float(_BF_P) / kth  # noqa: E731
    marks = (
        orders.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderpriority") == "1-URGENT").alias("ina"),
            F.max(F.col("o_orderpriority") == "5-LOW").alias("inb"),
        )
    )
    t = marks.agg(
        F.count("*").alias("true_union"),
        F.sum((F.col("ina") & F.col("inb")).cast("long")).alias("true_intersection"),
    )
    return t.select(
        F.lit(kth_a).cast("long").alias("kth_a"),
        F.lit(kth_b).cast("long").alias("kth_b"),
        F.lit(kth_u).cast("long").alias("kth_union"),
        F.round(F.lit(est(kth_u)), 2).cast("double").alias("est_union"),
        F.round(F.lit(est(kth_a) + est(kth_b) - est(kth_u)), 2)
        .cast("double")
        .alias("est_intersection"),
        "true_union",
        "true_intersection",
    )


# --------------------------------------------------------------------------
# Incremental view maintenance for a JOIN view (delta rules).
# --------------------------------------------------------------------------

_IVMJ_CUT = "1997-01-01"


@q(
    "ivm_join_view_deltas",
    f"""
    SELECT o_orderpriority, cast(count(*) AS bigint) AS n_items,
           cast(round(sum(cast(l_extendedprice AS decimal(38,9))), 2)
                AS double) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def ivm_join_view_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view: V = γ(A ⋈ B) kept current
    under inserts to BOTH sides using the delta rule
    ΔV = γ(ΔA⋈B₀) + γ(A₀⋈ΔB) + γ(ΔA⋈ΔB) — never re-joining A₀⋈B₀.

    A = orders (Δ = orderdate ≥ {_IVMJ_CUT}), B = lineitem (Δ = shipdate ≥
    {_IVMJ_CUT}); the view aggregates per priority.  Maintenance cost at
    100 TB is |Δ|·(index probes into the other side) instead of a full
    re-join: each delta term is a join of a SMALL delta against the stored
    base (in a real deployment, against its join-key index/bucketed
    layout, cf. `source_bucketed_join`).  The oracle computes the view
    directly from the full tables, proving delta-merge ≡ recompute.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cut = F.lit(_IVMJ_CUT).cast("date")
    a_old, a_new = (
        orders.filter(F.col("o_orderdate") < cut),
        orders.filter(F.col("o_orderdate") >= cut),
    )
    b_old, b_new = (
        li.filter(F.col("l_shipdate") < cut),
        li.filter(F.col("l_shipdate") >= cut),
    )

    def agg_join(a, b):
        return (
            a.select("o_orderkey", "o_orderpriority")
            .join(b.select("l_orderkey", "l_extendedprice"),
                  F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n"),
                F.sum("l_extendedprice").alias("rev"),
            )
        )

    v_base = agg_join(a_old, b_old)
    deltas = (
        agg_join(a_new, b_old)
        .unionAll(agg_join(a_old, b_new))
        .unionAll(agg_join(a_new, b_new))
        .groupBy("o_orderpriority")
        .agg(F.sum("n").alias("dn"), F.sum("rev").alias("drev"))
    )
    merged = v_base.join(deltas, "o_orderpriority", "full_outer").select(
        "o_orderpriority",
        (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n_items"),
        (F.coalesce("rev", F.lit(0.0)) + F.coalesce("drev", F.lit(0.0))).alias("rev"),
    )
    return (
        merged.filter(F.col("n_items") > 0)
        .select(
            "o_orderpriority",
            "n_items",
            F.round(F.col("rev").cast("decimal(38,9)"), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Z-order (Morton) locality: interleaved bits give every indexed column
# narrow per-file ranges — the bounding boxes prove it.
# --------------------------------------------------------------------------

_ZO_BITS = 8
_ZO_FILES = 16


@q(
    "layout_zorder_locality",
    f"""
    WITH binned AS (
      SELECT l_orderkey, l_linenumber,
             cast(l_quantity AS int) AS x,
             cast(least(floor(l_extendedprice / 1000), 255) AS int) AS y
      FROM lineitem),
    z AS (
      SELECT l_orderkey, l_linenumber, x, y,
             (SELECT sum((( x >> b.b) & 1) * power(2, 2 * b.b)
                       + ((y >> b.b) & 1) * power(2, 2 * b.b + 1))
              FROM range({_ZO_BITS}) b(b)) AS zval
      FROM binned),
    filed AS (
      SELECT x, y, cast(zval AS bigint) >> (2 * {_ZO_BITS} - 4) AS file_id
      FROM z)
    SELECT cast(file_id AS int) AS file_id, cast(count(*) AS bigint) AS n_rows,
           cast(min(x) AS int) AS x_min, cast(max(x) AS int) AS x_max,
           cast(min(y) AS int) AS y_min, cast(max(y) AS int) AS y_max
    FROM filed GROUP BY file_id ORDER BY file_id
    """,
)
def layout_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering's locality, measured: lineitem rows binned on
    (quantity, price/1000) get Morton z-values (bit interleave, the same
    shift/or fold as operators/layout.py::zorder_value), are packed into
    16 z-range files, and the per-file bounding boxes come
    back — BOTH dimensions stay narrow per file, which is why selective
    filters on EITHER column prune most files (single-column sort narrows
    one dimension only; `tests/test_sources.py::
    test_zorder_write_narrows_per_file_ranges` asserts the write path).
    Integer bins + integer interleave keep the oracle replay exact; file
    assignment is the TOP 4 BITS of z (16 disjoint z-ranges) — the
    embarrassingly-parallel stand-in for repartitionByRange(z), no global
    window anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    binned = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("x"),
        F.least(F.floor(F.col("l_extendedprice") / 1000), F.lit(255))
        .cast("int")
        .alias("y"),
    )
    z = F.lit(0).cast("long")
    for b in range(_ZO_BITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(F.col("x"), b).bitwiseAND(F.lit(1)), 2 * b)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(F.col("y"), b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    filed = binned.withColumn("zval", z).select(
        "x", "y", F.shiftright("zval", 2 * _ZO_BITS - 4).alias("file_id")
    )
    return (
        filed.groupBy(F.col("file_id").cast("int").alias("file_id"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("x").cast("int").alias("x_min"),
            F.max("x").cast("int").alias("x_max"),
            F.min("y").cast("int").alias("y_min"),
            F.max("y").cast("int").alias("y_max"),
        )
        .orderBy("file_id")
    )


# --------------------------------------------------------------------------
# Join-size estimation from two count-min sketches (inner product).
# --------------------------------------------------------------------------


@q(
    "sketch_cms_join_size",
    f"""
    WITH params AS (
      SELECT * FROM (VALUES (0, 31, 7), (1, 131, 101),
                            (2, 523, 1009), (3, 2053, 10007)) AS t(d, a, b)),
    ska AS (
      SELECT p.d, ((e.user_id * p.a + p.b) % {_CMS_P}) % {_CMS_W} AS bkt,
             count(*) AS c
      FROM events e CROSS JOIN params p GROUP BY p.d, bkt),
    skb AS (
      SELECT p.d, ((o.o_custkey * p.a + p.b) % {_CMS_P}) % {_CMS_W} AS bkt,
             count(*) AS c
      FROM orders o CROSS JOIN params p GROUP BY p.d, bkt),
    per_depth AS (
      SELECT a.d, sum(a.c * b.c) AS dot
      FROM ska a JOIN skb b ON a.d = b.d AND a.bkt = b.bkt
      GROUP BY a.d),
    est AS (SELECT min(dot) AS est_join FROM per_depth),
    t AS (
      SELECT count(*) AS true_join
      FROM events e JOIN orders o ON e.user_id = o.o_custkey)
    SELECT cast(est.est_join AS bigint) AS est_join_size,
           cast(t.true_join AS bigint) AS true_join_size,
           cast(est.est_join - t.true_join AS bigint) AS overestimate
    FROM est, t
    """,
)
def sketch_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join CARDINALITY estimation from two count-min sketches: |A⋈B|
    = Σ_k f_A(k)·f_B(k) is estimated by min-over-depths of the sketch
    row inner products Σ_b cms_A[d][b]·cms_B[d][b] (always ≥ true — hash
    collisions only add).

    This is what a cost-based planner (or `salted_join`'s sizing pass)
    wants BEFORE running a 100 TB join: both sketches are 512-row
    aggregates computed independently per table (mergeable per partition/
    epoch like `sketch_count_min`), and the estimate is a 512-row join —
    no contact with the data itself.  The oracle rebuilds both sketches
    and the true join count, so estimate AND overestimate hash-match.
    """
    ev = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))

    def sketch(df):
        hashed = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"),
                            (((F.col("k") * a + b) % _CMS_P) % _CMS_W).alias("bkt"),
                        )
                        for d, (a, b) in enumerate(_CMS_AB)
                    ]
                )
            ).alias("e")
        ).select("e.d", "e.bkt")
        return hashed.groupBy("d", "bkt").agg(F.count("*").alias("c"))

    ska, skb = sketch(ev), sketch(orders)
    per_depth = (
        ska.alias("a")
        .join(skb.alias("b"), ["d", "bkt"])
        .groupBy("d")
        .agg(F.sum(F.col("a.c") * F.col("b.c")).alias("dot"))
    )
    est = per_depth.agg(F.min("dot").alias("est_join_size"))
    true = (
        load_table(spark, sf_dir, "events")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("user_id") == F.col("o_custkey"),
        )
        .agg(F.count("*").alias("true_join_size"))
    )
    return est.crossJoin(true).select(
        "est_join_size",
        "true_join_size",
        (F.col("est_join_size") - F.col("true_join_size")).alias("overestimate"),
    )


# --------------------------------------------------------------------------
# 2D grid-blocked spatial join (point-in-box) — the spatial analog of the
# binned interval-overlap join.
# --------------------------------------------------------------------------

_SP_W = 64  # grid cell width
_SP_OFF = 256  # domain offset keeps all coordinates positive
_SP_VALUE = 300.0


@q(
    "join_spatial_grid",
    f"""
    WITH pts AS (
      SELECT event_id,
             (event_id * 48271) % 1000 + {_SP_OFF} AS px,
             (event_id * 16807) % 1000 + {_SP_OFF} AS py
      FROM events),
    boxes AS (
      SELECT event_id AS box_id,
             (event_id * 31) % 1000 + {_SP_OFF} AS cx,
             (event_id * 37) % 1000 + {_SP_OFF} AS cy,
             25 + (event_id % 4) * 25 AS half
      FROM events WHERE event_type = 'purchase' AND value > {_SP_VALUE})
    SELECT b.box_id, cast(count(p.event_id) AS bigint) AS n_points
    FROM boxes b LEFT JOIN pts p
      ON p.px BETWEEN b.cx - b.half AND b.cx + b.half
     AND p.py BETWEEN b.cy - b.half AND b.cy + b.half
    GROUP BY b.box_id ORDER BY b.box_id
    """,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-box spatial join via GRID BLOCKING (the 2D generalization
    of `join_interval_overlap`'s bin blocking): points land in exactly one
    {_SP_W}-unit grid cell; each query box explodes into the cells it
    covers; the theta join becomes an equi-join on cell id with the exact
    containment predicate as residual.  Coordinates are synthesized from
    event ids with portable integer arithmetic (same discipline as the
    multimodal closed-form payloads) so the naive-inequality oracle
    replays exactly.

    At 100 TB: candidate pairs ∝ points-per-covered-cell, never |points|×
    |boxes|; a point is in ONE cell so no post-join dedup is needed; the
    grid id is a plain integer pair, so the blocking join is a standard
    hash shuffle — the same pattern every geospatial engine (GeoSpark/
    Sedona's grid partitioner) uses under its R-tree sugar.
    """
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        ((F.col("event_id") * 48271) % 1000 + _SP_OFF).alias("px"),
        ((F.col("event_id") * 16807) % 1000 + _SP_OFF).alias("py"),
    ).withColumn("cell_x", F.floor(F.col("px") / _SP_W)).withColumn(
        "cell_y", F.floor(F.col("py") / _SP_W)
    )
    boxes = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > _SP_VALUE))
        .select(
            F.col("event_id").alias("box_id"),
            ((F.col("event_id") * 31) % 1000 + _SP_OFF).alias("cx"),
            ((F.col("event_id") * 37) % 1000 + _SP_OFF).alias("cy"),
            (25 + (F.col("event_id") % 4) * 25).alias("half"),
        )
        .withColumn("lo_x", F.col("cx") - F.col("half"))
        .withColumn("hi_x", F.col("cx") + F.col("half"))
        .withColumn("lo_y", F.col("cy") - F.col("half"))
        .withColumn("hi_y", F.col("cy") + F.col("half"))
    )
    cells = boxes.select(
        "box_id",
        "lo_x",
        "hi_x",
        "lo_y",
        "hi_y",
        F.explode(
            F.sequence(F.floor(F.col("lo_x") / _SP_W), F.floor(F.col("hi_x") / _SP_W))
        ).alias("cell_x"),
    ).select(
        "*",
        F.explode(
            F.sequence(F.floor(F.col("lo_y") / _SP_W), F.floor(F.col("hi_y") / _SP_W))
        ).alias("cell_y"),
    )
    matched = (
        cells.join(pts, ["cell_x", "cell_y"])
        .filter(
            F.col("px").between(F.col("lo_x"), F.col("hi_x"))
            & F.col("py").between(F.col("lo_y"), F.col("hi_y"))
        )
        .groupBy("box_id")
        .agg(F.count("*").alias("n_points"))
    )
    return (
        boxes.select("box_id")
        .join(matched, "box_id", "left")
        .select("box_id", F.coalesce("n_points", F.lit(0)).alias("n_points"))
        .orderBy("box_id")
    )


# --------------------------------------------------------------------------
# Batch hopping (overlapping) windows — window(ts, size, hop) outside
# streaming, with an arithmetic oracle.
# --------------------------------------------------------------------------

_HOP_US = 900 * 1_000_000  # 15-minute hop
_HOP_K = 4  # 1-hour window = 4 hops


@q(
    "events_hopping_window",
    f"""
    WITH e AS (
      SELECT epoch_us(cast(ts AS timestamp)) AS us, value
      FROM events WHERE event_type = 'click'),
    hops AS (
      SELECT (us - (us % {_HOP_US})) - k.k * {_HOP_US} AS win_start_us,
             value
      FROM e, range({_HOP_K}) k(k))
    SELECT cast(win_start_us AS bigint) AS win_start_us,
           cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(value AS decimal(38,9))), 2) AS double)
             AS total
    FROM hops GROUP BY win_start_us
    HAVING count(*) >= 5
    ORDER BY win_start_us
    """,
)
def events_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding-by-fixed-hop) windows in BATCH mode: Spark's
    `window(ts, '1 hour', '15 minutes')` TVF assigns each click to its 4
    overlapping hour windows; counts/sums per window.  The batch twin of
    `stream_sliding` — same grouping function, provable against an
    arithmetic oracle (window_start = epoch-aligned 15-min floor minus
    k·hop, k<4), which pins Spark's epoch alignment exactly.

    The Expand (×4 per row) happens BEFORE the shuffle but the shuffle
    carries (window, partial-agg) rows thanks to map-side combine — at
    100 TB the network moves |windows| rows, not 4×|events|."""
    ev = load_table(spark, sf_dir, "events")
    win = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour", "15 minutes"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(38,9)")), 2)
            .cast("double")
            .alias("total"),
        )
        .filter(F.col("n") >= 5)
    )
    return win.select(
        F.unix_micros(F.col("window.start")).alias("win_start_us"), "n", "total"
    ).orderBy("win_start_us")


# --------------------------------------------------------------------------
# Population-stability-index drift detection between two epochs.
# --------------------------------------------------------------------------

_PSI_BIN = 50_000.0
_PSI_NBINS = 9
_PSI_YEAR_A, _PSI_YEAR_B = 1995, 1997


@q(
    "quality_psi_drift",
    f"""
    WITH binned AS (
      SELECT least(cast(floor(o_totalprice / {_PSI_BIN}) AS int),
                   {_PSI_NBINS} - 1) AS bin,
             year(o_orderdate) AS yr
      FROM orders
      WHERE year(o_orderdate) IN ({_PSI_YEAR_A}, {_PSI_YEAR_B})),
    counts AS (
      SELECT b.bin,
             count(CASE WHEN yr = {_PSI_YEAR_A} THEN 1 END) AS n_a,
             count(CASE WHEN yr = {_PSI_YEAR_B} THEN 1 END) AS n_b
      FROM binned b GROUP BY b.bin),
    tot AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM counts),
    scored AS (
      SELECT c.bin, c.n_a, c.n_b,
             ((c.n_a + 1.0) / (t.ta + {_PSI_NBINS})
              - (c.n_b + 1.0) / (t.tb + {_PSI_NBINS}))
             * ln(((c.n_a + 1.0) / (t.ta + {_PSI_NBINS}))
                  / ((c.n_b + 1.0) / (t.tb + {_PSI_NBINS}))) AS contrib
      FROM counts c, tot t)
    SELECT cast(bin AS int) AS bin, cast(n_a AS bigint) AS n_a,
           cast(n_b AS bigint) AS n_b,
           cast(round(contrib, 6) AS double) AS psi_contrib
    FROM scored ORDER BY bin
    """,
)
def quality_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detection between two data epochs via the
    population stability index: fixed price bins, Laplace-smoothed shares
    per epoch, per-bin contribution (pA−pB)·ln(pA/pB) — the standard
    ingest-quality gate ("did this month's data shift?") a 100 TB
    pipeline runs before training on a new snapshot.

    One scan, one hash agg over ≤{_PSI_NBINS} bins (both epochs counted in
    the same pass via conditional counts), broadcast totals — cost is
    O(scan), state is O(bins).  Fixed integer bin edges (not quantiles)
    keep the replay exact across engines; companions: `profile_columns`
    for per-column stats, `feature_binning_deciles` for quantile bins."""
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    binned = orders.filter(yr.isin(_PSI_YEAR_A, _PSI_YEAR_B)).select(
        F.least(
            F.floor(F.col("o_totalprice") / _PSI_BIN).cast("int"),
            F.lit(_PSI_NBINS - 1),
        ).alias("bin"),
        yr.alias("yr"),
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.when(F.col("yr") == _PSI_YEAR_A, 1)).alias("n_a"),
        F.count(F.when(F.col("yr") == _PSI_YEAR_B, 1)).alias("n_b"),
    )
    tot = counts.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    pa = (F.col("n_a") + 1.0) / (F.col("ta") + _PSI_NBINS)
    pb = (F.col("n_b") + 1.0) / (F.col("tb") + _PSI_NBINS)
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").cast("int").alias("bin"),
            "n_a",
            "n_b",
            F.round((pa - pb) * F.log(pa / pb), 6)
            .cast("double")
            .alias("psi_contrib"),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# Spark 4 SQL surface: pipe syntax, session variables, parameterized SQL.
# --------------------------------------------------------------------------


@q(
    "expr_sql_pipe_syntax",
    """
    SELECT o_orderpriority, cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(o_totalprice AS decimal(38,9))), 2) AS double)
             AS total
    FROM orders WHERE o_totalprice > 100000
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def expr_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL PIPE syntax (SPARK-49555, `FROM t |> WHERE … |>
    AGGREGATE …`): the linear query form lands in the SAME Catalyst plan
    as the nested SELECT — proven by hash-matching the classic-SQL oracle.
    Surface parity matters for migration: a user of the reference can
    bring pipe-style queries (ZetaSQL/BigQuery dialect) unchanged."""
    from ..catalog import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_totalprice > 100000
        |> AGGREGATE count(*) AS n,
                     cast(round(sum(cast(o_totalprice AS decimal(38,9))), 2)
                          AS double) AS total
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, n, total
        |> ORDER BY o_orderpriority
        """
    )


@q(
    "expr_sql_variables",
    """
    SELECT o_orderpriority, cast(count(*) AS bigint) AS n
    FROM orders
    WHERE o_totalprice > 150000 AND year(o_orderdate) = 1996
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def expr_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL session variables (DECLARE / SET VAR) + named-parameter
    SQL (`spark.sql(..., args=...)`): the threshold lives in a session
    variable, the year arrives as a bound :param — no string interpolation
    anywhere (the injection-safe pattern for templated 100 TB jobs).  The
    oracle inlines both constants, proving binding semantics."""
    from ..catalog import register_tables

    register_tables(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE v_price_floor DOUBLE DEFAULT 0.0")
    spark.sql("SET VAR v_price_floor = 150000.0")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE o_totalprice > v_price_floor AND year(o_orderdate) = :yr
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        args={"yr": 1996},
    )
