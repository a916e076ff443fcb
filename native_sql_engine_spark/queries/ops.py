"""Operator-level battery — one query per operator in SURVEY.md §2.

Spark side uses the DataFrame API (the engine's native idiom); ORACLE holds
the DuckDB-dialect equivalent with identical column names.  Hash-stability
conventions as in tpch.py: computed doubles rounded, integer sums cast to
BIGINT (DuckDB sums to HUGEINT), deterministic total orders under LIMIT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.joins import existence_join, join, null_aware_anti_join

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# =========================================================================
# Joins (§2.3) — Broadcast / ShuffledHash / SortMerge × all join types
# =========================================================================


@q(
    "join_broadcast_inner",
    """
    SELECT p_brand, cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(l_extendedprice AS decimal(38,9))), 2) AS double) AS total_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 10
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def join_broadcast_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner broadcast-hash join: dim side broadcast, fact side never shuffles
    (parity: ColumnarBroadcastHashJoinExec.scala:50)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return (
        join(lineitem, part, [F.col("l_partkey") == F.col("p_partkey")], "inner", "broadcast")
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(38,9)")), 2).cast("double").alias("total_price"),
        )
        .orderBy("p_brand")
    )


@q(
    "join_shuffle_hash",
    """
    SELECT o_orderpriority, cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(o_totalprice AS decimal(38,9))), 2) AS double) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal > 1000
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffled-hash join (parity: ColumnarShuffledHashJoinExec.scala:61):
    both sides hash-partition on the key; no sort. At scale: the choice for
    large∙medium joins where one side fits per-partition memory."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 1000)
    return (
        join(orders, customer, [F.col("o_custkey") == F.col("c_custkey")], "inner", "shuffle_hash")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum(F.col("o_totalprice").cast("decimal(38,9)")), 2).cast("double").alias("total"))
        .orderBy("o_orderpriority")
    )


@q(
    "join_sort_merge",
    """
    SELECT l_returnflag, cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(l_quantity AS decimal(38,9))), 2) AS double) AS qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def join_sort_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-merge join (parity: ColumnarSortMergeJoinExec.scala:61) — the
    fact∙fact default; spills gracefully at 100 TB unlike hash builds."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        join(lineitem, orders, [F.col("l_orderkey") == F.col("o_orderkey")], "inner", "sort_merge")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.round(F.sum(F.col("l_quantity").cast("decimal(38,9)")), 2).cast("double").alias("qty"))
        .orderBy("l_returnflag")
    )


@q(
    "join_left_outer",
    """
    SELECT c_mktsegment, cast(count(*) AS bigint) AS n_rows,
           cast(count(o_orderkey) AS bigint) AS n_orders
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 300000
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_totalprice") > 300000)
    return (
        customer.join(orders, cond, "left")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_rows"), F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_mktsegment")
    )


@q(
    "join_right_outer",
    """
    SELECT o_orderstatus, cast(count(*) AS bigint) AS n_rows,
           cast(count(c_custkey) AS bigint) AS n_matched
    FROM customer RIGHT JOIN orders
      ON c_custkey = o_custkey AND c_acctbal > 9000
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (F.col("c_acctbal") > 9000)
    return (
        customer.join(orders, cond, "right")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_rows"), F.count("c_custkey").alias("n_matched"))
        .orderBy("o_orderstatus")
    )


@q(
    "join_full_outer",
    """
    WITH big_cust AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 8000),
         big_ord AS (SELECT o_custkey, cast(count(*) AS bigint) AS n_big
                     FROM orders WHERE o_totalprice > 250000 GROUP BY o_custkey)
    SELECT
      cast(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS bigint) AS right_only,
      cast(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS bigint) AS left_only,
      cast(sum(CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL
               THEN 1 ELSE 0 END) AS bigint) AS both_sides
    FROM big_cust FULL OUTER JOIN big_ord ON c_custkey = o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer — SMJ-only in the reference (ColumnarSortMergeJoinExec.scala:124-131)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big_cust = customer.filter(F.col("c_acctbal") > 8000).select("c_custkey", "c_acctbal")
    big_ord = (
        orders.filter(F.col("o_totalprice") > 250000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_big"))
    )
    joined = big_cust.join(big_ord, F.col("c_custkey") == F.col("o_custkey"), "full")
    return joined.agg(
        F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).cast("bigint").alias("right_only"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).cast("bigint").alias("left_only"),
        F.sum(
            F.when(F.col("c_custkey").isNotNull() & F.col("o_custkey").isNotNull(), 1).otherwise(0)
        ).cast("bigint").alias("both_sides"),
    )


@q(
    "join_left_semi",
    """
    SELECT c_mktsegment, cast(count(*) AS bigint) AS n
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .orderBy("c_mktsegment")
    )


@q(
    "join_left_anti",
    """
    SELECT c_mktsegment, cast(count(*) AS bigint) AS n
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .orderBy("c_mktsegment")
    )


@q(
    "join_null_aware_anti",
    """
    SELECT o_orderpriority, cast(count(*) AS bigint) AS n
    FROM (SELECT o_orderpriority, nullif(o_custkey, 7) AS k FROM orders) o
    WHERE k NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with NULLs on the probe side: NULL keys never qualify —
    the reference's nullAware BHJ (ColumnarPlugin.scala:165-173)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", F.nullif(F.col("o_custkey"), F.lit(7)).alias("k")
    )
    rich = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    return (
        null_aware_anti_join(orders, rich, "k", "c_custkey")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
    )


@q(
    "join_existence",
    """
    SELECT has_urgent, cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(c_acctbal AS decimal(38,9))), 2) AS double) AS bal
    FROM (SELECT c_acctbal,
                 c_custkey IN (SELECT o_custkey FROM orders
                               WHERE o_orderpriority = '1-URGENT') AS has_urgent
          FROM customer) t
    GROUP BY has_urgent ORDER BY has_urgent
    """,
)
def join_existence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence join (reference join type Existence,
    ColumnarBroadcastHashJoinExec.scala:93-95): IN-subquery as a value."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    flagged = existence_join(customer, urgent, "c_custkey", "o_custkey", "has_urgent")
    return (
        flagged.groupBy("has_urgent")
        .agg(F.count("*").alias("n"), F.round(F.sum(F.col("c_acctbal").cast("decimal(38,9)")), 2).cast("double").alias("bal"))
        .orderBy("has_urgent")
    )


@q(
    "join_cross",
    """
    SELECT n_name, r_name
    FROM nation CROSS JOIN region
    WHERE n_regionkey <> r_regionkey AND n_nationkey < 3
    ORDER BY n_name, r_name
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian + theta filter — BNLJ/CartesianProduct stay row execs in the
    reference (docs/operators.md rows 22-23); first-class here."""
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 3)
    region = load_table(spark, sf_dir, "region")
    return (
        nation.crossJoin(region)
        .filter(F.col("n_regionkey") != F.col("r_regionkey"))
        .select("n_name", "r_name")
        .orderBy("n_name", "r_name")
    )


@q(
    "join_non_equi_residual",
    """
    SELECT p_brand, cast(count(*) AS bigint) AS n
    FROM lineitem JOIN part
      ON l_partkey = p_partkey
     AND l_quantity BETWEEN p_size AND p_size + 5
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def join_non_equi_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key + residual non-equi condition (the reference threads the
    residual through its probe kernels, conditioned_probe_kernel.cc)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("l_partkey") == F.col("p_partkey"))
        & (F.col("l_quantity") >= F.col("p_size"))
        & (F.col("l_quantity") <= F.col("p_size") + 5)
    )
    return (
        lineitem.join(part, cond)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
        .orderBy("p_brand")
    )


@q(
    "join_theta_bnlj",
    """
    SELECT band, cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(o_totalprice AS decimal(38,9))), 2) AS double) AS total
    FROM orders
    JOIN (VALUES ('low',  0.0,      100000.0),
                 ('mid',  100000.0, 200000.0),
                 ('high', 200000.0, 1e18)) bands(band, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band ORDER BY band
    """,
)
def join_theta_bnlj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta join (no equi keys) — BroadcastNestedLoopJoin.  The
    reference keeps BNLJ on the row path (docs/operators.md row 22); here the
    tiny band table broadcasts so the fact side streams with no shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 100000.0), ("mid", 100000.0, 200000.0), ("high", 200000.0, 1e18)],
        "band string, lo double, hi double",
    )
    cond = (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi"))
    return (
        orders.join(F.broadcast(bands), cond)
        .groupBy("band")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(38,9)")), 2)
            .cast("double")
            .alias("total"),
        )
        .orderBy("band")
    )


@q(
    "range_generate",
    """
    SELECT cast(id % 7 AS bigint) AS bucket,
           cast(count(*) AS bigint) AS n,
           cast(sum(id) AS bigint) AS id_sum
    FROM range(0, 100000) t(id)
    GROUP BY bucket ORDER BY bucket
    """,
)
def range_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazy distributed sequence — RangeExec (row fallback in the reference,
    docs/operators.md row 10).  spark.range partitions the interval across
    executors; no data is materialized on the driver."""
    return (
        spark.range(0, 100000)
        .groupBy((F.col("id") % 7).alias("bucket"))
        .agg(F.count("*").alias("n"), F.sum("id").alias("id_sum"))
        .orderBy("bucket")
    )


# =========================================================================
# Aggregation (§2.4) — the reference's native action set + beyond
# =========================================================================


@q(
    "agg_functions",
    """
    SELECT l_returnflag,
           cast(round(sum(cast(l_quantity AS decimal(38,9))), 2) AS double)          AS sum_qty,
           round(avg(l_extendedprice), 4)     AS avg_price,
           cast(count(l_partkey) AS bigint)   AS cnt_col,
           cast(count(*) AS bigint)           AS cnt_all,
           round(min(l_discount), 4)          AS min_disc,
           round(max(l_tax), 4)               AS max_tax,
           round(stddev_samp(l_quantity), 4)  AS sd_qty
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full native action set in one pass: sum/avg/count/
    count(1)/min/max/stddev_samp (actions_impl.cc:4496-4946) — Spark plans
    partial+final automatically (map-side combine, one shuffle)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(38,9)")), 2).cast("double").alias("sum_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count("l_partkey").alias("cnt_col"),
            F.count(F.lit(1)).alias("cnt_all"),
            F.round(F.min("l_discount"), 4).alias("min_disc"),
            F.round(F.max("l_tax"), 4).alias("max_tax"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        )
        .orderBy("l_returnflag")
    )


@q(
    "agg_distinct",
    """
    SELECT l_linestatus,
           cast(count(DISTINCT l_suppkey) AS bigint) AS n_supp,
           cast(count(DISTINCT l_partkey) AS bigint) AS n_part,
           cast(round(sum(DISTINCT cast(l_quantity AS decimal(38,9))), 2) AS double) AS sum_distinct_qty
    FROM lineitem
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregates — row fallback in the reference (§2.4),
    built-in here (Expand + two-phase agg under the hood)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_linestatus")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.round(F.sum_distinct(F.col("l_quantity").cast("decimal(38,9)")), 2).cast("double").alias("sum_distinct_qty"),
        )
        .orderBy("l_linestatus")
    )


@q(
    "agg_approx_distinct",
    """
    SELECT l_returnflag,
           cast(count(DISTINCT l_orderkey) AS bigint) AS exact_orders,
           true AS approx_within_tol,
           true AS median_within_band
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct + percentile_approx, made hash-checkable: the
    sketches are deterministic (fixed hash, no RNG), so the entry emits the
    EXACT companions plus in-query tolerance verdicts — the oracle recomputes
    the exact values and the literal-true verdicts.  A wrong sketch (or a
    broken tolerance) flips a boolean and fails the hash.

    The distinct aggregates and the percentile sketches run as SEPARATE
    aggregations joined on the 3-row group key: mixing countDistinct with an
    ObjectAggregate in one groupBy makes the two-phase distinct rewrite
    carry a percentile buffer per (flag, orderkey) partial group — a
    ~1 GiB shuffle at sf0.1 and unbounded at 100 TB.  Split, the distinct
    path stays whole-stage-codegen HashAggregate and the percentile pass
    holds one bounded sketch per flag."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    # rsd 0.02 halves HLL++ register cost vs 0.01 for the same
    # order-of-magnitude answer; sketch size is per-group state that
    # every map task carries at 100 TB, so precision is a real knob.
    # HLL is duplicate-insensitive, so the sketch and the exact count both
    # ride ONE distinct-first aggregation (codegen HashAggregate) instead of
    # the expand rewrite that would carry an HLL buffer per partial group.
    dedup = lineitem.select("l_returnflag", "l_orderkey").distinct()
    counts = dedup.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.count("*").alias("exact_orders"),
    )
    # coarse sketch validated against a fine sketch (accuracy 10000 → rank
    # error ~0.01%): the 40/60 band is >100× wider, and both sketches stay
    # bounded + mergeable — no exact-percentile full-group buffering
    pcts = lineitem.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 500).alias("approx_median"),
        F.percentile_approx(
            "l_extendedprice", F.array(F.lit(0.4), F.lit(0.6)), 10000
        ).alias("band"),
    )
    return (
        counts.join(pcts, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_orders",
            (
                F.abs(F.col("approx_orders") - F.col("exact_orders"))
                <= 3 * 0.02 * F.col("exact_orders")
            ).alias("approx_within_tol"),
            (
                (F.col("approx_median") >= F.element_at("band", 1))
                & (F.col("approx_median") <= F.element_at("band", 2))
            ).alias("median_within_band"),
        )
        .orderBy("l_returnflag")
    )


@q(
    "agg_stats_extended",
    """
    SELECT l_returnflag,
           round(corr(l_extendedprice, l_quantity), 4)       AS corr_pq,
           round(covar_samp(l_extendedprice, l_quantity), 2) AS cov_s,
           round(covar_pop(l_extendedprice, l_quantity), 2)  AS cov_p,
           round(var_samp(l_quantity), 4)                    AS var_s,
           round(var_pop(l_quantity), 4)                     AS var_p,
           round(quantile_cont(l_quantity, 0.5), 1)          AS median_qty
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_stats_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates beyond the reference's native action set
    (stddev_samp is its only moment aggregate — actions_impl.cc:4496-4946;
    the rest fell back to row execution): corr, covariance, variance, exact
    interpolated percentile.  All single-pass moment aggregates with
    map-side partial merge except percentile (sort-based within group)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("corr_pq"),
            F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("cov_s"),
            F.round(F.covar_pop("l_extendedprice", "l_quantity"), 2).alias("cov_p"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_s"),
            F.round(F.var_pop("l_quantity"), 4).alias("var_p"),
            # percentile over an integer-valued column: interpolated midpoints
            # are .0/.5 (exact in binary), so the round() can't straddle an
            # engine-dependent half-cent boundary like a price median can
            F.round(F.percentile("l_quantity", 0.5), 1).alias("median_qty"),
        )
        .orderBy("l_returnflag")
    )


@q(
    "reshape_unpivot",
    """
    WITH wide AS (
      SELECT n_name,
             cast(round(sum(CASE WHEN o_orderstatus = 'F'
                                 THEN cast(o_totalprice AS decimal(38,9)) ELSE 0 END), 2)
                  AS double) AS sales_f,
             cast(round(sum(CASE WHEN o_orderstatus = 'O'
                                 THEN cast(o_totalprice AS decimal(38,9)) ELSE 0 END), 2)
                  AS double) AS sales_o,
             cast(round(sum(CASE WHEN o_orderstatus = 'P'
                                 THEN cast(o_totalprice AS decimal(38,9)) ELSE 0 END), 2)
                  AS double) AS sales_p
      FROM orders, customer, nation
      WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, status, sales FROM (
      SELECT n_name, 'sales_f' AS status, sales_f AS sales FROM wide
      UNION ALL
      SELECT n_name, 'sales_o' AS status, sales_o AS sales FROM wide
      UNION ALL
      SELECT n_name, 'sales_p' AS status, sales_p AS sales FROM wide
    )
    ORDER BY n_name, status
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape via ``DataFrame.unpivot`` (melt) — the inverse of
    pivot; Catalyst plans it as an Expand node, one pass over the input."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    sums = {
        s: F.round(
            F.sum(
                F.when(
                    F.col("o_orderstatus") == s.upper(),
                    F.col("o_totalprice").cast("decimal(38,9)"),
                ).otherwise(F.lit(0))
            ),
            2,
        )
        .cast("double")
        .alias(f"sales_{s}")
        for s in ("f", "o", "p")
    }
    wide = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(*sums.values())
    )
    return wide.unpivot(
        ids=["n_name"],
        values=["sales_f", "sales_o", "sales_p"],
        variableColumnName="status",
        valueColumnName="sales",
    ).orderBy("n_name", "status")


@q(
    "agg_min_max_by",
    """
    SELECT o_orderstatus,
           cast(arg_min(o_orderkey, printf('%018.4f#%012d', o_totalprice, o_orderkey)) AS bigint) AS cheapest_order,
           cast(arg_max(o_orderkey, printf('%018.4f#%012d', o_totalprice, o_orderkey)) AS bigint) AS priciest_order,
           bool_and(o_totalprice > 0)      AS all_positive,
           bool_or(o_totalprice > 400000)  AS any_over_400k
    FROM orders
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (argmin/argmax) + bool_and/bool_or aggregates — absent
    from the reference's native action set (actions_impl.cc), first-class
    here.  The ordering key is a zero-padded (price, key) string so argmin
    ties break identically in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    key = F.format_string("%018.4f#%012d", F.col("o_totalprice"), F.col("o_orderkey"))
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.min_by("o_orderkey", key).alias("cheapest_order"),
            F.max_by("o_orderkey", key).alias("priciest_order"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        )
        .orderBy("o_orderstatus")
    )


@q(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           cast(grouping(l_returnflag) AS bigint) AS g1,
           cast(grouping(l_linestatus) AS bigint) AS g2,
           cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(l_quantity AS decimal(38,9))), 2) AS double) AS qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g1, g2, l_returnflag, l_linestatus
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP via Expand (parity: ColumnarExpandExec.scala:37)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("bigint").alias("g1"),
            F.grouping("l_linestatus").cast("bigint").alias("g2"),
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(38,9)")), 2).cast("double").alias("qty"),
        )
        .orderBy("g1", "g2", "l_returnflag", "l_linestatus")
    )


@q(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus,
           cast(grouping(l_returnflag) AS bigint) AS g1,
           cast(grouping(l_linestatus) AS bigint) AS g2,
           cast(count(*) AS bigint) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY g1, g2, l_returnflag, l_linestatus
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("bigint").alias("g1"),
            F.grouping("l_linestatus").cast("bigint").alias("g2"),
            F.count("*").alias("n"),
        )
        .orderBy("g1", "g2", "l_returnflag", "l_linestatus")
    )


@q(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(o_totalprice AS decimal(38,9))), 2) AS double) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               cast(round(sum(cast(o_totalprice AS decimal(38,9))), 2) AS double) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@q(
    "agg_collect_list",
    """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS names,
           cast(count(*) AS bigint) AS n
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def agg_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list/collect_set — row fallback in the reference, first-class
    here; sorted + joined so the value is deterministic."""
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("names"),
            F.count("*").alias("n"),
        )
        .orderBy("n_regionkey")
    )


@q(
    "agg_having_filter",
    """
    SELECT l_suppkey, cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(l_extendedprice AS decimal(38,9))), 2) AS double) AS total
    FROM lineitem
    GROUP BY l_suppkey
    HAVING count(*) > 550
    ORDER BY l_suppkey
    """,
)
def agg_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_suppkey")
        .agg(F.count("*").alias("n"), F.round(F.sum(F.col("l_extendedprice").cast("decimal(38,9)")), 2).cast("double").alias("total"))
        .filter(F.col("n") > 550)
        .orderBy("l_suppkey")
    )


@q(
    "agg_pivot",
    """
    SELECT l_returnflag,
           cast(round(sum(cast(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END AS decimal(38,9))), 2) AS double) AS F,
           cast(round(sum(cast(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END AS decimal(38,9))), 2) AS double) AS O
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot — Catalyst rewrites to conditional aggregation."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(38,9)")), 2).cast("double"))
        .fillna(0.0, subset=["F", "O"])
        .orderBy("l_returnflag")
    )


# =========================================================================
# Window functions (§2.5) — reference subset + the full Spark surface
# =========================================================================


@q(
    "window_partition_agg",
    """
    SELECT s_suppkey, s_nationkey, s_acctbal,
           round(sum(s_acctbal) OVER (PARTITION BY s_nationkey), 2) AS nation_bal,
           round(avg(s_acctbal) OVER (PARTITION BY s_nationkey), 4) AS nation_avg,
           round(min(s_acctbal) OVER (PARTITION BY s_nationkey), 2) AS nation_min,
           round(max(s_acctbal) OVER (PARTITION BY s_nationkey), 2) AS nation_max,
           cast(count(*) OVER (PARTITION BY s_nationkey) AS bigint) AS nation_n
    FROM supplier ORDER BY s_suppkey
    """,
)
def window_partition_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-partition-frame agg windows — the ONLY agg windows the
    reference supports natively (ColumnarWindowExec.scala:94-99 throws on a
    non-empty order spec)."""
    supplier = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey")
    return supplier.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.round(F.sum("s_acctbal").over(w), 2).alias("nation_bal"),
        F.round(F.avg("s_acctbal").over(w), 4).alias("nation_avg"),
        F.round(F.min("s_acctbal").over(w), 2).alias("nation_min"),
        F.round(F.max("s_acctbal").over(w), 2).alias("nation_max"),
        F.count("*").over(w).alias("nation_n"),
    ).orderBy("s_suppkey")


@q(
    "window_rank",
    """
    SELECT p_partkey, p_brand, p_size,
           cast(rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS bigint) AS rk_asc,
           cast(rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS bigint) AS rk_desc
    FROM part WHERE p_partkey < 200 ORDER BY p_partkey
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank asc/desc — the reference's only native ranking
    (rank_asc/rank_desc, ColumnarWindowExec.scala:142-156); ties covered."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return part.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.rank().over(W.partitionBy("p_brand").orderBy("p_size")).cast("bigint").alias("rk_asc"),
        F.rank()
        .over(W.partitionBy("p_brand").orderBy(F.col("p_size").desc()))
        .cast("bigint")
        .alias("rk_desc"),
    ).orderBy("p_partkey")


@q(
    "window_ranking_full",
    """
    SELECT o_orderkey,
           cast(row_number() OVER w AS bigint)  AS rn,
           cast(dense_rank() OVER w AS bigint)  AS drk,
           round(percent_rank() OVER w, 6)      AS prk,
           round(cume_dist() OVER w, 6)         AS cd,
           cast(ntile(4) OVER w AS bigint)      AS nt
    FROM orders WHERE o_orderkey < 500
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def window_ranking_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/dense_rank/percent_rank/cume_dist/ntile — row fallback in
    the reference (§2.5 'NOT supported natively'), first-class here.
    Order key includes o_orderkey so row_number/ntile are deterministic."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.dense_rank().over(w).cast("bigint").alias("drk"),
        F.round(F.percent_rank().over(w), 6).alias("prk"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.ntile(4).over(w).cast("bigint").alias("nt"),
    ).orderBy("o_orderkey")


@q(
    "window_lag_lead",
    """
    SELECT o_orderkey, o_custkey,
           round(lag(o_totalprice, 1) OVER w, 2)        AS prev_price,
           round(lead(o_totalprice, 1, -1.0) OVER w, 2) AS next_price
    FROM orders WHERE o_custkey < 20
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice", 1, -1.0).over(w), 2).alias("next_price"),
    ).orderBy("o_orderkey")


@q(
    "window_rows_between",
    """
    SELECT l_orderkey, l_linenumber,
           round(sum(l_extendedprice) OVER (
               PARTITION BY l_orderkey ORDER BY l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running,
           round(avg(l_extendedprice) OVER (
               PARTITION BY l_orderkey ORDER BY l_linenumber
               ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 4) AS centered
    FROM lineitem WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def window_rows_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom ROWS frames — unsupported natively in the reference (§2.5)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.sum("l_extendedprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2
        ).alias("running"),
        F.round(F.avg("l_extendedprice").over(w.rowsBetween(-1, 1)), 4).alias("centered"),
    ).orderBy("l_orderkey", "l_linenumber")


@q(
    "window_range_between",
    """
    SELECT p_partkey, p_brand, p_size,
           cast(count(*) OVER (
               PARTITION BY p_brand
               ORDER BY p_size RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS bigint) AS n_close
    FROM part WHERE p_partkey < 300
    ORDER BY p_partkey
    """,
)
def window_range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame per brand — partitioned so the window parallelizes (an
    unpartitioned ordered window is single-partition at any scale)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    w = W.partitionBy("p_brand").orderBy("p_size").rangeBetween(-2, W.currentRow)
    return part.select(
        "p_partkey", "p_brand", "p_size", F.count("*").over(w).alias("n_close")
    ).orderBy("p_partkey")


@q(
    "window_value_fns",
    """
    SELECT s_suppkey, s_nationkey,
           round(first_value(s_acctbal) OVER w, 2) AS first_bal,
           round(last_value(s_acctbal) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_bal,
           round(nth_value(s_acctbal, 2) OVER w, 2) AS second_bal
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    ORDER BY s_suppkey
    """,
)
def window_value_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return supplier.select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.first_value("s_acctbal").over(w), 2).alias("first_bal"),
        F.round(F.last_value("s_acctbal").over(w_full), 2).alias("last_bal"),
        F.round(F.nth_value("s_acctbal", 2).over(w), 2).alias("second_bal"),
    ).orderBy("s_suppkey")


@q(
    "topk_per_group",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal
    FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer) t
    WHERE rn <= 3
    ORDER BY c_mktsegment, c_custkey
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — the canonical window+filter pattern; at scale this
    avoids a global sort (per-partition heap via WindowGroupLimit)."""
    customer = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        customer.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal")
        .orderBy("c_mktsegment", "c_custkey")
    )


# =========================================================================
# Sort / limit / top-k (§2.6)
# =========================================================================


@q(
    "sort_multikey_topk",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def sort_multikey_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key mixed-direction sort + limit → TakeOrderedAndProject (row
    fallback in the reference, docs/operators.md row 12). Spark pushes the
    limit into per-partition top-K heaps — no global sort at scale."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(
            F.col("o_orderstatus").asc(), F.col("o_totalprice").desc(), F.col("o_orderkey")
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(50)
    )


@q(
    "sort_nulls_nan",
    """
    WITH t AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_linenumber = 1 THEN NULL
                  WHEN l_linenumber = 2 THEN cast('NaN' AS double)
                  ELSE l_discount END AS d
      FROM lineitem WHERE l_orderkey < 60)
    SELECT l_orderkey, l_linenumber, round(d, 4) AS d,
           cast(rank() OVER (PARTITION BY l_orderkey
                             ORDER BY d ASC NULLS FIRST) AS bigint) AS rk_nulls_first,
           cast(rank() OVER (PARTITION BY l_orderkey
                             ORDER BY d DESC NULLS LAST) AS bigint) AS rk_desc_nulls_last
    FROM t
    ORDER BY l_orderkey, l_linenumber
    """,
)
def sort_nulls_nan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL/NaN ordering — the reference pre-partitions nulls/NaN in its sort
    kernels (sort_kernel.cc:63-66); Spark orders NaN after +Inf, and we pin
    NULLS FIRST/LAST explicitly (DuckDB's default differs). Ordering is
    encoded via rank() so the unordered hash compare still validates it;
    ranks are per-order (partitioned window) so the plan parallelizes —
    every order has a NULL line 1 and a NaN line 2, which must rank first
    under ASC NULLS FIRST and (NaN, then NULL) last under DESC NULLS LAST."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 60)
    t = li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_linenumber") == 1, F.lit(None).cast("double"))
        .when(F.col("l_linenumber") == 2, F.lit(float("nan")))
        .otherwise(F.col("l_discount"))
        .alias("d"),
    )
    w = W.partitionBy("l_orderkey")
    return t.select(
        "l_orderkey",
        "l_linenumber",
        F.round("d", 4).alias("d"),
        F.rank()
        .over(w.orderBy(F.col("d").asc_nulls_first()))
        .cast("bigint")
        .alias("rk_nulls_first"),
        F.rank()
        .over(w.orderBy(F.col("d").desc_nulls_last()))
        .cast("bigint")
        .alias("rk_desc_nulls_last"),
    ).orderBy("l_orderkey", "l_linenumber")


@q(
    "limit_offset",
    """
    SELECT c_custkey, c_name FROM customer
    ORDER BY c_custkey LIMIT 20 OFFSET 10
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.orderBy("c_custkey").select("c_custkey", "c_name").offset(10).limit(20)


# =========================================================================
# Set operations (§2.7)
# =========================================================================


@q(
    "setop_union_all",
    """
    SELECT k, cast(count(*) AS bigint) AS n FROM (
      SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000
      UNION ALL
      SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
    ) t GROUP BY k ORDER BY k
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL = ColumnarUnionExec (ColumnarBasicPhysicalOperators.scala:271)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = customer.filter(F.col("c_acctbal") > 9000).select(F.col("c_custkey").alias("k"))
    b = orders.filter(F.col("o_totalprice") > 400000).select(F.col("o_custkey").alias("k"))
    return a.union(b).groupBy("k").agg(F.count("*").alias("n")).orderBy("k")


@q(
    "setop_union_distinct",
    """
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
    ORDER BY k
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = customer.filter(F.col("c_acctbal") > 9000).select(F.col("c_custkey").alias("k"))
    b = orders.filter(F.col("o_totalprice") > 400000).select(F.col("o_custkey").alias("k"))
    return a.union(b).distinct().orderBy("k")


@q(
    "setop_intersect",
    """
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
    ORDER BY k
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT → Catalyst plans a left-semi join (SURVEY §2.7)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = customer.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("k"))
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("k"))
    return a.intersect(b).orderBy("k")


@q(
    "setop_except",
    """
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
    EXCEPT
    SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
    ORDER BY k
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT → left-anti join (e2e proof in the reference:
    NativeSQLConvertedSuite.scala:31-37)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = customer.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("k"))
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("k"))
    return a.exceptAll(b.distinct()).distinct().orderBy("k")


@q(
    "setop_intersect_all",
    """
    SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 45
    INTERSECT ALL
    SELECT l_suppkey AS k FROM lineitem WHERE l_discount > 0.08
    ORDER BY k
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 45).select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_discount") > 0.08).select(F.col("l_suppkey").alias("k"))
    return a.intersectAll(b).orderBy("k")


@q(
    "setop_except_all",
    """
    SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 45
    EXCEPT ALL
    SELECT l_suppkey AS k FROM lineitem WHERE l_discount > 0.08
    ORDER BY k
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 45).select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_discount") > 0.08).select(F.col("l_suppkey").alias("k"))
    return a.exceptAll(b).orderBy("k")


# =========================================================================
# Scalar expressions (§2.8) — the reference's Gandiva surface and beyond
# =========================================================================


@q(
    "expr_arithmetic",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice + l_tax, 4)            AS add_,
           round(l_extendedprice - l_discount, 4)       AS sub_,
           round(l_extendedprice * (1 - l_discount), 4) AS mul_,
           round(l_extendedprice / (1 + l_tax), 4)      AS div_,
           round(abs(l_discount - 0.05), 4)             AS abs_,
           round(l_extendedprice, 0)                    AS round_,
           cast(l_orderkey & l_partkey AS bigint)       AS band,
           cast(l_orderkey | l_partkey AS bigint)       AS bor,
           cast(xor(l_orderkey, l_partkey) AS bigint)   AS bxor,
           cast(~l_linenumber AS int)                   AS bnot,
           cast(l_linenumber << 2 AS int)               AS shl,
           cast(l_orderkey >> 1 AS bigint)              AS shr
    FROM lineitem WHERE l_orderkey < 40
    ORDER BY l_orderkey, l_linenumber
    """,
)
def expr_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic + bitwise surface (ColumnarArithmetic.scala, 449 LoC in the
    reference) — every op stays in whole-stage codegen here."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 40)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") + F.col("l_tax"), 4).alias("add_"),
        F.round(F.col("l_extendedprice") - F.col("l_discount"), 4).alias("sub_"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("mul_"),
        F.round(F.col("l_extendedprice") / (1 + F.col("l_tax")), 4).alias("div_"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("abs_"),
        F.round(F.col("l_extendedprice"), 0).alias("round_"),
        F.col("l_orderkey").bitwiseAND(F.col("l_partkey")).alias("band"),
        F.col("l_orderkey").bitwiseOR(F.col("l_partkey")).alias("bor"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).alias("bxor"),
        F.bitwise_not(F.col("l_linenumber")).alias("bnot"),
        F.shiftleft(F.col("l_linenumber"), 2).alias("shl"),
        F.shiftright(F.col("l_orderkey"), 1).alias("shr"),
    ).orderBy("l_orderkey", "l_linenumber")


@q(
    "expr_predicates",
    """
    SELECT o_orderkey,
           cast(o_orderstatus = 'F' AS int)                   AS eq_,
           cast(o_orderstatus <> 'F' AS int)                  AS neq,
           cast(o_totalprice < 100000 AS int)                 AS lt,
           cast(o_totalprice >= 300000 AS int)                AS gte,
           cast(o_custkey IS NULL AS int)                     AS isnull_,
           cast(o_custkey IS NOT NULL AS int)                 AS isnotnull_,
           cast(o_orderpriority IN ('1-URGENT','2-HIGH') AS int) AS in_,
           cast(o_orderpriority LIKE '%-L%' AS int)           AS like_,
           cast(o_orderpriority LIKE '1%' AS int)             AS starts,
           cast(o_orderpriority LIKE '%ED' AS int)            AS ends,
           cast(contains(o_orderpriority, 'HIGH') AS int)     AS contains_,
           cast((nullif(o_custkey, 3) IS NOT DISTINCT FROM nullif(o_custkey, 5)) AS int) AS eq_null_safe
    FROM orders WHERE o_orderkey < 200
    ORDER BY o_orderkey
    """,
)
def expr_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison/predicate surface incl. null-safe equality <=>
    (ColumnarBinaryOperator.scala:516, EqualNullSafe)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    k3 = F.nullif(F.col("o_custkey"), F.lit(3))
    k5 = F.nullif(F.col("o_custkey"), F.lit(5))
    return o.select(
        "o_orderkey",
        (F.col("o_orderstatus") == "F").cast("int").alias("eq_"),
        (F.col("o_orderstatus") != "F").cast("int").alias("neq"),
        (F.col("o_totalprice") < 100000).cast("int").alias("lt"),
        (F.col("o_totalprice") >= 300000).cast("int").alias("gte"),
        F.isnull(F.col("o_custkey")).cast("int").alias("isnull_"),
        F.col("o_custkey").isNotNull().cast("int").alias("isnotnull_"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int").alias("in_"),
        F.col("o_orderpriority").like("%-L%").cast("int").alias("like_"),
        F.col("o_orderpriority").startswith("1").cast("int").alias("starts"),
        F.col("o_orderpriority").endswith("ED").cast("int").alias("ends"),
        F.col("o_orderpriority").contains("HIGH").cast("int").alias("contains_"),
        k3.eqNullSafe(k5).cast("int").alias("eq_null_safe"),
    ).orderBy("o_orderkey")


@q(
    "expr_conditional",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END                              AS bucket,
           CASE c_mktsegment WHEN 'BUILDING' THEN 1 WHEN 'MACHINERY' THEN 2
                ELSE 0 END                                   AS seg_code,
           round(coalesce(nullif(c_acctbal, 0.0), -1.0), 2) AS bal_or_default,
           round(greatest(c_acctbal, 1000.0), 2)            AS at_least_1k,
           round(least(c_acctbal, 5000.0), 2)               AS at_most_5k,
           CASE WHEN c_acctbal > 0 THEN round(c_acctbal, 2) END AS if_pos
    FROM customer WHERE c_custkey < 300
    ORDER BY c_custkey
    """,
)
def expr_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """If/CaseWhen/Coalesce (ColumnarIfOperator/CaseWhen/Coalesce in the
    reference) + greatest/least/nullif."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bucket"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1)
        .when(F.col("c_mktsegment") == "MACHINERY", 2)
        .otherwise(0)
        .alias("seg_code"),
        F.round(F.coalesce(F.nullif(F.col("c_acctbal"), F.lit(0.0)), F.lit(-1.0)), 2).alias(
            "bal_or_default"
        ),
        F.round(F.greatest(F.col("c_acctbal"), F.lit(1000.0)), 2).alias("at_least_1k"),
        F.round(F.least(F.col("c_acctbal"), F.lit(5000.0)), 2).alias("at_most_5k"),
        F.when(F.col("c_acctbal") > 0, F.round(F.col("c_acctbal"), 2)).alias("if_pos"),
    ).orderBy("c_custkey")


@q(
    "expr_string",
    """
    SELECT p_partkey,
           upper(p_name)                          AS up,
           lower(p_brand)                         AS lo,
           substring(p_name, 1, 5)                AS sub,
           p_name || '/' || p_brand               AS cat,
           cast(length(p_name) AS int)            AS len,
           trim('  ' || p_name || ' ')            AS trimmed,
           ltrim('xx' || p_name, 'x')             AS ltrimmed,
           rtrim(p_name || 'yy', 'y')             AS rtrimmed,
           replace(p_name, ' ', '_')              AS repl,
           lpad(p_brand, 12, '*')                 AS padded,
           reverse(p_brand)                       AS rev,
           repeat(p_brand, 2)                     AS rep,
           split_part(p_name, ' ', 1)             AS first_word,
           cast(strpos(p_name, 'e') AS int)       AS pos_e,
           translate(p_name, 'aeiou', 'AEIOU')    AS vowels_up,
           left(p_name, 3)                        AS l3,
           right(p_name, 3)                       AS r3
    FROM part WHERE p_partkey < 150
    ORDER BY p_partkey
    """,
)
def expr_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface (ColumnarTernaryOperator.scala:78 Substring,
    ColumnarConcatOperator, castVARCHAR trim family) + the full Spark set."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 150)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.substring("p_name", 1, 5).alias("sub"),
        F.concat_ws("/", "p_name", "p_brand").alias("cat"),
        F.length("p_name").alias("len"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.ltrim(F.concat(F.lit("xx"), F.col("p_name")), F.lit("x")).alias("ltrimmed"),
        F.rtrim(F.concat(F.col("p_name"), F.lit("yy")), F.lit("y")).alias("rtrimmed"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("repl"),
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.reverse("p_brand").alias("rev"),
        F.repeat("p_brand", 2).alias("rep"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.instr("p_name", "e").alias("pos_e"),
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.left(F.col("p_name"), F.lit(3)).alias("l3"),
        F.right(F.col("p_name"), F.lit(3)).alias("r3"),
    ).orderBy("p_partkey")


@q(
    "expr_regexp",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)$', 1)        AS last_word,
           regexp_replace(p_name, '[aeiou]', '.', 'g')   AS masked,
           cast(regexp_matches(p_name, '^(red|blue)') AS int) AS starts_color
    FROM part WHERE p_partkey < 150
    ORDER BY p_partkey
    """,
)
def expr_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface — the reference only supports LIKE natively
    (StringRegexExpression, ColumnarExpressionConverter.scala:143-155);
    full regexp is first-class here."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 150)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", r"[aeiou]", ".").alias("masked"),
        F.col("p_name").rlike(r"^(red|blue)").cast("int").alias("starts_color"),
    ).orderBy("p_partkey")


@q(
    "expr_json",
    """
    SELECT event_type,
           cast(count(*) AS bigint) AS n,
           cast(sum(cast(props->>'k' AS bigint)) AS bigint) AS sum_k,
           round(avg(cast(json_extract_string(props, '$.k') AS bigint)), 4) AS avg_k,
           cast(min(cast(props->>'k' AS bigint)) AS bigint) AS min_k,
           cast(max(cast(props->>'k' AS bigint)) AS bigint) AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def expr_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction — absent from the reference's native surface (JSON
    funcs fall back, SURVEY §2.8); first-class here via both the path
    extractor (get_json_object) and the parsed-struct route (from_json),
    feeding a codegen'd aggregate."""
    ev = load_table(spark, sf_dir, "events")
    k_path = F.get_json_object("props", "$.k").cast("bigint")
    k_struct = F.from_json("props", "k BIGINT").getField("k")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k_path).alias("sum_k"),
            F.round(F.avg(k_path), 4).alias("avg_k"),
            F.min(k_struct).alias("min_k"),
            F.max(k_struct).alias("max_k"),
        )
        .orderBy("event_type")
    )


@q(
    "expr_complex_types",
    """
    SELECT l_orderkey, l_linenumber,
           round([l_quantity, l_discount, l_tax][1], 2)                  AS a_first,
           cast(len([l_quantity, l_discount, l_tax]) AS int)             AS a_len,
           round(list_aggregate([l_quantity, l_discount, l_tax], 'sum'), 4) AS a_sum,
           round(list_aggregate([l_quantity, l_discount, l_tax], 'min'), 4) AS a_min,
           list_contains([l_returnflag, l_linestatus], 'N')              AS has_n,
           round(map(['qty','disc'], [l_quantity, l_discount])['qty'][1], 2) AS m_qty,
           struct_pack(flag := l_returnflag, status := l_linestatus).flag AS s_flag
    FROM lineitem WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def expr_complex_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY / MAP / STRUCT expressions — the types the reference cannot
    execute natively at all (blank rows in docs/operators.md, SURVEY §1.3);
    Spark runs them codegen'd."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    arr = F.array("l_quantity", "l_discount", "l_tax")
    m = F.create_map(F.lit("qty"), F.col("l_quantity"), F.lit("disc"), F.col("l_discount"))
    st = F.struct(F.col("l_returnflag").alias("flag"), F.col("l_linestatus").alias("status"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.element_at(arr, 1), 2).alias("a_first"),
        F.size(arr).alias("a_len"),
        F.round(F.aggregate(arr, F.lit(0.0), lambda a, x: a + x), 4).alias("a_sum"),
        F.round(F.array_min(arr), 4).alias("a_min"),
        F.array_contains(F.array("l_returnflag", "l_linestatus"), "N").alias("has_n"),
        F.round(F.element_at(m, "qty"), 2).alias("m_qty"),
        st.getField("flag").alias("s_flag"),
    ).orderBy("l_orderkey", "l_linenumber")


@q(
    "expr_cast",
    """
    SELECT o_orderkey,
           cast(trunc(o_totalprice) AS bigint)            AS to_long,
           cast(cast(trunc(o_totalprice) AS int) AS double) AS to_int_back,
           cast(o_orderkey AS string)                     AS to_str,
           cast(o_orderkey AS double)                     AS to_dbl,
           try_cast(o_orderstatus AS int)                 AS bad_int,
           try_cast(cast(o_totalprice AS varchar) AS double) AS roundtrip,
           cast(cast(o_orderdate AS date) AS varchar)     AS to_date,
           cast(cast(o_orderkey AS smallint) AS int)      AS to_short
    FROM orders WHERE o_orderkey < 100 AND o_orderkey < 32768
    ORDER BY o_orderkey
    """,
)
def expr_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast family (castBYTE..castVARCHAR, ColumnarUnaryOperator.scala).
    DuckDB rounds double→int while Spark truncates, so the double→int cast
    goes through values where both agree is avoided via try_cast checks;
    invalid-string→int yields NULL on both (Spark non-ANSI / DuckDB
    try_cast)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderkey") < 100) & (F.col("o_orderkey") < 32768)
    )
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("bigint").alias("to_long"),
        F.col("o_totalprice").cast("int").cast("double").alias("to_int_back"),
        F.col("o_orderkey").cast("string").alias("to_str"),
        F.col("o_orderkey").cast("double").alias("to_dbl"),
        F.col("o_orderstatus").try_cast("int").alias("bad_int"),
        F.col("o_totalprice").cast("string").try_cast("double").alias("roundtrip"),
        F.col("o_orderdate").cast("date").cast("string").alias("to_date"),
        F.col("o_orderkey").cast("smallint").cast("int").alias("to_short"),
    ).orderBy("o_orderkey")


@q(
    "expr_decimal",
    """
    SELECT l_orderkey, l_linenumber,
           cast(round(cast(l_extendedprice AS decimal(12,2))
                 * cast(1 - l_discount AS decimal(8,4)), 2) AS double) AS dec_mul,
           cast(round(cast(l_extendedprice AS decimal(12,2))
                 + cast(l_tax AS decimal(8,4)), 4) AS double)          AS dec_add,
           cast(try_cast(l_extendedprice * 1e15 AS decimal(12,2)) AS double) AS dec_overflow
    FROM lineitem WHERE l_orderkey < 50
    ORDER BY l_orderkey, l_linenumber
    """,
)
def expr_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal arithmetic with precision promotion + null-on-overflow
    (reference: CheckOverflow/PromotePrecision/castDECIMALNullOnOverflow in
    ColumnarUnaryOperator.scala; benchmarks ran Decimal→Double,
    docs/index.md:128). Final values surfaced as rounded doubles so the
    oracle compare is scale-insensitive."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 50)
    price_dec = F.col("l_extendedprice").cast("decimal(12,2)")
    disc_dec = (1 - F.col("l_discount")).cast("decimal(8,4)")
    tax_dec = F.col("l_tax").cast("decimal(8,4)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(price_dec * disc_dec, 2).cast("double").alias("dec_mul"),
        F.round(price_dec + tax_dec, 4).cast("double").alias("dec_add"),
        (F.col("l_extendedprice") * 1e15).try_cast("decimal(12,2)")
        .cast("double")
        .alias("dec_overflow"),
    ).orderBy("l_orderkey", "l_linenumber")


@q(
    "expr_datetime",
    """
    SELECT o_orderkey,
           cast(extract(year FROM o_orderdate) AS bigint)    AS yr,
           cast(extract(month FROM o_orderdate) AS bigint)   AS mo,
           cast(extract(day FROM o_orderdate) AS bigint)     AS dy,
           cast(dayofweek(o_orderdate) + 1 AS bigint)        AS dow,
           cast(dayofyear(o_orderdate) AS bigint)            AS doy,
           cast(extract(quarter FROM o_orderdate) AS bigint) AS qtr,
           cast(date_diff('day', date '1995-01-01', o_orderdate) AS bigint) AS days_since,
           cast(epoch(o_orderdate) AS bigint)                AS unix_ts,
           cast(cast(o_orderdate AS date) + 30 AS varchar)   AS plus_30d,
           date_trunc('month', o_orderdate)                  AS month_start,
           cast(last_day(cast(o_orderdate AS date)) AS varchar) AS month_end,
           cast(make_date(2020, cast(extract(month FROM o_orderdate) AS int), 15) AS varchar) AS mid_month
    FROM orders WHERE o_orderkey < 100
    ORDER BY o_orderkey
    """,
)
def expr_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface (ColumnarDateTimeExpressions.scala:58-509):
    extract family, datediff, epoch seconds, date arithmetic, trunc,
    make_date. Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday —
    the oracle adds 1."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("yr"),
        F.month(d).cast("bigint").alias("mo"),
        F.dayofmonth(d).cast("bigint").alias("dy"),
        F.dayofweek(d).cast("bigint").alias("dow"),
        F.dayofyear(d).cast("bigint").alias("doy"),
        F.quarter(d).cast("bigint").alias("qtr"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since"),
        F.unix_timestamp(d).cast("bigint").alias("unix_ts"),
        F.date_add(d.cast("date"), 30).cast("string").alias("plus_30d"),
        F.date_trunc("month", d).alias("month_start"),
        F.last_day(d.cast("date")).cast("string").alias("month_end"),
        F.make_date(F.lit(2020), F.month(d), F.lit(15)).cast("string").alias("mid_month"),
    ).orderBy("o_orderkey")


@q(
    "expr_math",
    """
    SELECT p_partkey,
           round(sin(p_size), 6)           AS sin_,
           round(cos(p_size), 6)           AS cos_,
           round(exp(p_size / 25.0), 6)    AS exp_,
           round(ln(p_size + 1.0), 6)      AS ln_,
           round(log10(p_size + 1.0), 6)   AS log10_,
           round(pow(p_size, 1.5), 6)      AS pow_,
           round(sqrt(p_retailprice), 6)   AS sqrt_,
           cast(ceil(p_retailprice) AS bigint)  AS ceil_,
           cast(floor(p_retailprice) AS bigint) AS floor_,
           round(sign(p_size - 25), 1)     AS sign_,
           cast(mod(p_partkey, 7) AS bigint)    AS mod_
    FROM part WHERE p_partkey < 200
    ORDER BY p_partkey
    """,
)
def expr_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions — row fallback in the reference (§2.8 last row),
    JVM-codegen'd built-ins here."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    s = F.col("p_size")
    return p.select(
        "p_partkey",
        F.round(F.sin(s), 6).alias("sin_"),
        F.round(F.cos(s), 6).alias("cos_"),
        F.round(F.exp(s / 25.0), 6).alias("exp_"),
        F.round(F.log(s + 1.0), 6).alias("ln_"),
        F.round(F.log10(s + 1.0), 6).alias("log10_"),
        F.round(F.pow(s, 1.5), 6).alias("pow_"),
        F.round(F.sqrt(F.col("p_retailprice")), 6).alias("sqrt_"),
        F.ceil(F.col("p_retailprice")).cast("bigint").alias("ceil_"),
        F.floor(F.col("p_retailprice")).cast("bigint").alias("floor_"),
        F.round(F.signum(s - 25), 1).alias("sign_"),
        F.pmod(F.col("p_partkey"), F.lit(7)).cast("bigint").alias("mod_"),
    ).orderBy("p_partkey")


@q(
    "expr_nan_semantics",
    """
    WITH t AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_linenumber = 2 THEN cast('NaN' AS double)
                  WHEN l_linenumber = 3 THEN NULL
                  ELSE l_discount END AS d
      FROM lineitem WHERE l_orderkey < 200)
    SELECT coalesce(cast(isnan(d) AS int), 0) AS is_nan,
           cast(d IS NULL AS int) AS is_null,
           cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(CASE WHEN d IS NOT NULL AND NOT isnan(d) THEN d END AS decimal(38,9))), 4) AS double) AS sum_clean
    FROM t
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def expr_nan_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NaN-aware semantics: NaN groups as one key, NULL stays distinct —
    the reference ships dedicated *_with_nan comparison kernels
    (ColumnarBinaryOperator.scala); Spark's NormalizeFloatingNumbers rule
    provides the same guarantee."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    t = li.select(
        F.when(F.col("l_linenumber") == 2, F.lit(float("nan")))
        .when(F.col("l_linenumber") == 3, F.lit(None).cast("double"))
        .otherwise(F.col("l_discount"))
        .alias("d")
    )
    return (
        t.groupBy(
            F.isnan("d").cast("int").alias("is_nan"),
            F.isnull("d").cast("int").alias("is_null"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.when(~F.isnan("d"), F.col("d")).cast("decimal(38,9)")), 4).cast("double").alias("sum_clean"),
        )
        .orderBy("is_nan", "is_null")
    )


@q(
    "expr_scalar_subquery",
    """
    SELECT o_orderkey,
           round(o_totalprice / (SELECT avg(o_totalprice) FROM orders), 6) AS price_ratio
    FROM orders WHERE o_orderkey < 100
    ORDER BY o_orderkey
    """,
)
def expr_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (ColumnarScalarSubquery,
    ColumnarSubquery.scala:120)."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               round(o_totalprice / (SELECT avg(o_totalprice) FROM orders), 6) AS price_ratio
        FROM orders WHERE o_orderkey < 100
        ORDER BY o_orderkey
        """
    )


@q(
    "expr_in_set",
    """
    SELECT cast(count(*) AS bigint) AS n, cast(round(sum(cast(l_quantity AS decimal(38,9))), 2) AS double) AS qty
    FROM lineitem
    WHERE l_suppkey IN (1,2,3,5,8,13,21,34,55,89,90,91,92,93,94,95)
    """,
)
def expr_in_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large literal IN list → Spark's InSet (hash-set probe, the
    reference's ColumnarInSetOperator)."""
    li = load_table(spark, sf_dir, "lineitem")
    keys = [1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 90, 91, 92, 93, 94, 95]
    return li.filter(F.col("l_suppkey").isin(keys)).agg(
        F.count("*").alias("n"), F.round(F.sum(F.col("l_quantity").cast("decimal(38,9)")), 2).cast("double").alias("qty")
    )


@q(
    "generate_explode",
    """
    SELECT word, cast(count(*) AS bigint) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word
          FROM documents WHERE doc_id < 50) t
    WHERE word <> ''
    GROUP BY word ORDER BY n DESC, word
    LIMIT 25
    """,
)
def generate_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generate/explode — row fallback in the reference
    (docs/operators.md row 6), first-class here; the seed of every
    text-pipeline operator (§pipeline)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(25)
    )


@q(
    "distinct_rows",
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct().orderBy(
        "l_returnflag", "l_linestatus"
    )


@q(
    "agg_median_percentile",
    """
    SELECT l_returnflag,
           round(median(l_extendedprice), 3)                 AS med_price,
           round(quantile_cont(l_extendedprice, 0.25), 3)    AS p25_price,
           round(quantile_cont(l_extendedprice, 0.95), 3)    AS p95_price
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median / continuous percentiles (fallback-path aggregates in
    the reference; first-class here).  Exact percentile is a sort-based
    aggregate — at 100 TB prefer agg_approx_distinct's percentile_approx
    sketch unless exactness is contractual."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            # one percentile(col, array(...)) instead of three separate
            # aggregates: each exact percentile buffers the full value list
            # per group, so fusing them shares one buffer + one sort (3.4s →
            # 1.4s at sf0.1).
            F.percentile("l_extendedprice", F.lit([0.25, 0.5, 0.95])).alias("pct"),
        )
        .select(
            "l_returnflag",
            # round(…, 3) not 2: prices are exact cents so interpolated
            # percentiles are multiples of 0.0005 — a 2-decimal round sits ON
            # the x.xx5 tie boundary and Spark/DuckDB can land on opposite
            # sides; 3 decimals keeps the boundary a half-ulp away.
            F.round(F.col("pct")[1], 3).alias("med_price"),
            F.round(F.col("pct")[0], 3).alias("p25_price"),
            F.round(F.col("pct")[2], 3).alias("p95_price"),
        )
        .orderBy("l_returnflag")
    )


@q(
    "agg_bitwise_bool",
    """
    SELECT l_returnflag,
           cast(bit_and(l_orderkey) AS bigint) AS band,
           cast(bit_or(l_orderkey) AS bigint)  AS bor,
           cast(bit_xor(l_orderkey) AS bigint) AS bxor,
           bool_and(l_quantity > 0)            AS all_pos_qty,
           bool_or(l_discount > 0.05)          AS any_big_disc
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_bitwise_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise (bit_and/or/xor) and boolean (bool_and/or) aggregates —
    scalar bitwise ops are native in the reference
    (ColumnarArithmetic.scala bitwise_and/or/xor) but their aggregate forms
    fall back; all are single-pass hash aggregates here."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bit_and("l_orderkey").alias("band"),
            F.bit_or("l_orderkey").alias("bor"),
            F.bit_xor("l_orderkey").alias("bxor"),
            F.bool_and(F.col("l_quantity") > 0).alias("all_pos_qty"),
            F.bool_or(F.col("l_discount") > 0.05).alias("any_big_disc"),
        )
        .orderBy("l_returnflag")
    )


@q(
    "dedup_latest_by_key",
    """
    SELECT user_id, event_type, event_id,
           cast(ts AS varchar) AS ts_s,
           round(value, 2)     AS value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE user_id < 300) t
    WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def dedup_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key dedup (CDC compaction / training-snapshot
    semantics): one hash-partitioned window pass, no self-join.  The
    partition key is (user_id, event_type), so at scale the shuffle is the
    same one a downstream per-user aggregation needs anyway."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 300)
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.col("ts").cast("string").alias("ts_s"),
            F.round("value", 2).alias("value"),
        )
        .orderBy("user_id", "event_type")
    )


# =========================================================================
# Lateral join + mergeable sketches
# =========================================================================


@q(
    "join_lateral_topk",
    """
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer,
    LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) t
    WHERE c_mktsegment = 'MACHINERY'
    ORDER BY c_custkey, o_orderkey
    """,
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 orders per customer) — the
    join-lateral shape from the reference's inherited SQL test corpus
    (native-sql-engine/core/src/test/resources/sql-tests inputs, SURVEY
    §5.2).  Catalyst decorrelates the LATERAL LIMIT into a ranked window
    over one hash shuffle of orders — no per-row subquery execution, so the
    plan scales as a single exchange regardless of customer count."""
    register = load_table  # keep the DataFrame idiom: window + semi filter
    cust = register(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    orders = register(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    top2 = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )
    return (
        cust.join(top2, cust["c_custkey"] == top2["o_custkey"])
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .orderBy("c_custkey", "o_orderkey")
    )


@q(
    "agg_hll_mergeable",
    """
    SELECT l_returnflag,
           cast(count(DISTINCT l_orderkey) AS bigint) AS exact_orders,
           true AS union_within_tol
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches via hll_sketch_agg):
    per-group binary sketches are built map-side, merged across partitions,
    and only then estimated — the re-aggregatable distinct-count path a
    100 TB rollup needs (store sketches per partition/day, union for any
    slice without rescanning).  Hash-checkable: the DataSketches estimate is
    deterministic, so the entry emits the exact count plus an in-query
    tolerance verdict (lgConfigK=12 → rsd≈1.6%; 5% bound) that the oracle
    recomputes/asserts as literal true."""
    li = load_table(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr("hll_sketch_agg(l_orderkey)").alias("sk")
    )
    # second level: union the per-(flag,status) sketches up to per-flag —
    # proving re-aggregation without touching the base table again
    unioned = per_flag.groupBy("l_returnflag").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("approx_orders")
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders")
    )
    return (
        unioned.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_orders",
            (
                F.abs(F.col("approx_orders") - F.col("exact_orders"))
                <= 0.05 * F.col("exact_orders")
            ).alias("union_within_tol"),
        )
        .orderBy("l_returnflag")
    )


@q(
    "agg_approx_top_k",
    """
    WITH c AS (
      SELECT event_type, cast(count(*) AS bigint) AS n
      FROM events GROUP BY event_type)
    SELECT string_agg(event_type || ':' || n, ',' ORDER BY n DESC, event_type)
             AS top_items
    FROM c
    """,
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k heavy-hitters sketch (Spark 4 SQL surface; the
    reference has no sketch aggregates at all).  With maxItemsTracked ≥
    the column's cardinality the sketch is EXACT, so the result is
    oracle-checkable; at 100 TB the same one-pass mergeable sketch tracks
    heavy hitters over columns whose exact groupBy would not fit."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_atk_events")
    return spark.sql(
        """
        SELECT array_join(
                 transform(approx_top_k(event_type, 5, 10000),
                           s -> concat(s.item, ':', s.count)), ',') AS top_items
        FROM _atk_events
        """
    )


@q(
    "agg_listagg",
    """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS members
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg / string_agg with deterministic WITHIN GROUP ordering
    (Spark 4 surface; ref's collect_* falls back to row execution)."""
    nat = load_table(spark, sf_dir, "nation")
    nat.createOrReplaceTempView("_la_nation")
    return spark.sql(
        """
        SELECT n_regionkey,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS members
        FROM _la_nation GROUP BY n_regionkey ORDER BY n_regionkey
        """
    )


@q(
    "agg_mode_deterministic",
    """
    WITH b AS (
      SELECT event_type, cast(floor(value / 10) AS bigint) AS bucket,
             cast(count(*) AS bigint) AS n
      FROM events GROUP BY event_type, bucket)
    SELECT event_type,
           min(bucket) FILTER (WHERE n = mx) AS modal_bucket,
           mx AS modal_n
    FROM (SELECT event_type, bucket, n, max(n) OVER (PARTITION BY event_type) AS mx
          FROM b) t
    GROUP BY event_type, mx
    ORDER BY event_type
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic statistical mode per group (SQL `mode()` leaves ties
    engine-defined, so this builds it from two hash aggregates with a
    smallest-value tie-break: bucket counts → min_by over (count desc,
    bucket asc)).  Map-side combinable at every step — no sort, no
    ambiguity, identical answers on any engine."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type", F.floor(F.col("value") / 10).cast("bigint").alias("bucket")
    ).agg(F.count("*").alias("n"))
    return (
        counts.groupBy("event_type")
        .agg(
            # max_by with a composite key: highest count wins, ties resolved
            # to the SMALLEST bucket (negated bucket inside the max key)
            F.expr("max_by(bucket, struct(n, -bucket))").alias("modal_bucket"),
            F.max("n").alias("modal_n"),
        )
        .orderBy("event_type")
    )


@q(
    "expr_variant",
    """
    SELECT event_type,
           cast(count(*) AS bigint)                              AS n,
           cast(sum(cast(props->>'k' AS bigint)) AS bigint)      AS sum_k,
           cast(min(cast(props->>'k' AS bigint)) AS bigint)      AS min_k,
           cast(max(cast(props->>'k' AS bigint)) AS bigint)      AS max_k,
           cast(count(cast(props->>'missing' AS bigint)) AS bigint) AS n_missing
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def expr_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured type (Spark 4): parse once into an open-schema
    binary-encoded value, then typed path extraction with variant_get /
    try_variant_get.  Beyond the reference's surface entirely (its JSON
    handling is a row fallback, SURVEY §2.8); at 100 TB the win over
    string re-parsing is that the shredded binary encoding is parsed once
    per value, not once per extraction."""
    ev = load_table(spark, sf_dir, "events").withColumn("v", F.parse_json("props"))
    k = F.expr("variant_get(v, '$.k', 'bigint')")
    missing = F.expr("try_variant_get(v, '$.missing', 'bigint')")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            F.count(missing).alias("n_missing"),
        )
        .orderBy("event_type")
    )


@q(
    "expr_recursive_cte",
    """
    WITH RECURSIVE chain (part, node, depth) AS (
        SELECT p_partkey, p_partkey, 0 FROM part
        UNION ALL
        SELECT part, node // 2, depth + 1 FROM chain WHERE node > 1
    )
    SELECT depth,
           cast(count(*) AS bigint) AS n_parts,
           cast(min(part) AS bigint) AS min_part,
           cast(max(part) AS bigint) AS max_part
    FROM (SELECT part, max(depth) AS depth FROM chain GROUP BY part) d
    GROUP BY depth ORDER BY depth
    """,
)
def expr_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): walk each part key up an
    implicit binary tree (node -> node div 2) until the root, then histogram
    parts by their tree depth.  Data-dependent termination, no driver loop —
    the whole fixpoint runs as iterated UnionLoop steps inside the engine.
    The reference has no recursion surface at all."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_rec_src")
    return spark.sql(
        """
        WITH RECURSIVE chain (part, node, depth) AS (
            SELECT p_partkey, p_partkey, 0 FROM part_rec_src
            UNION ALL
            SELECT part, node DIV 2, depth + 1 FROM chain WHERE node > 1
        )
        SELECT depth,
               count(*)  AS n_parts,
               min(part) AS min_part,
               max(part) AS max_part
        FROM (SELECT part, max(depth) AS depth FROM chain GROUP BY part) d
        GROUP BY depth ORDER BY depth
        """
    )


@q(
    "agg_approx_percentile",
    """
    SELECT l_returnflag,
           round(quantile_disc(l_quantity, 0.25), 2) AS q25,
           round(quantile_disc(l_quantity, 0.50), 2) AS q50,
           round(quantile_disc(l_quantity, 0.75), 2) AS q75,
           cast(count(*) AS bigint) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (percentile_approx, the reference would row-
    fallback): map-side partial sketches merge associatively, so a 100 TB
    quantile is one combine tree, never a global sort.  At accuracy 10000 on
    a discrete domain the sketch answer is EXACT — hash-checked against
    DuckDB's quantile_disc, not a tolerance test."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_quantity", [0.25, 0.5, 0.75], 10000)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(q[0], 2).alias("q25"),
            F.round(q[1], 2).alias("q50"),
            F.round(q[2], 2).alias("q75"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@q(
    "expr_higher_order",
    """
    SELECT l_returnflag,
           round(sum(cast(list_aggregate(
                 list_transform([l_quantity, l_extendedprice, l_discount], x -> x * 2),
                 'sum') AS double)), 2)                                     AS doubled_sum,
           cast(sum(len(list_filter([l_quantity, l_extendedprice, l_discount],
                                    x -> x > 1))) AS bigint)               AS n_big,
           round(sum(cast(list_aggregate(
                 list_zip([l_quantity, l_discount],
                          [l_extendedprice, l_tax]).apply(p -> p[1] * p[2]),
                 'sum') AS double)), 2)                                     AS zip_dot
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def expr_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions with lambda expressions — transform /
    filter / aggregate / zip_with, all codegen'd JVM-side (the reference
    row-fallbacks every array expression, SURVEY §2.8).  Arrays are staged
    through a projection first: HOF lambdas re-evaluate captured
    expressions per element, so building the array once is the difference
    between O(cols) and O(cols x elements) work per row."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.array("l_quantity", "l_extendedprice", "l_discount").alias("arr"),
        F.array("l_quantity", "l_discount").alias("lhs"),
        F.array("l_extendedprice", "l_tax").alias("rhs"),
    )
    doubled = F.aggregate(
        F.transform("arr", lambda x: x * 2), F.lit(0.0), lambda acc, x: acc + x
    )
    n_big = F.size(F.filter("arr", lambda x: x > 1))
    zip_dot = F.aggregate(
        F.zip_with("lhs", "rhs", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum(doubled), 2).alias("doubled_sum"),
            F.sum(n_big).cast("bigint").alias("n_big"),
            F.round(F.sum(zip_dot), 2).alias("zip_dot"),
        )
        .orderBy("l_returnflag")
    )


@q(
    "expr_try_arithmetic",
    """
    SELECT l_returnflag,
           cast(count(*) AS bigint) AS n,
           cast(sum(CASE WHEN l_linenumber = 1 THEN 1 ELSE 0 END) AS bigint)
               AS n_div_by_zero,
           round(sum(CASE WHEN l_linenumber = 1 THEN NULL
                          ELSE l_extendedprice / (l_linenumber - 1) END), 2)
               AS sum_safe_div,
           cast(count(CASE WHEN l_orderkey % 9973 = 0 AND l_orderkey > 1
                           THEN NULL ELSE 1 END) AS bigint) AS n_mul_in_range,
           cast(count(CASE WHEN l_orderkey % 7919 = 0 AND l_orderkey >= 1
                           THEN NULL ELSE 1 END) AS bigint) AS n_add_in_range
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def expr_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic (try_divide / try_multiply / try_add, Spark 4):
    division by zero and bigint overflow yield NULL instead of failing the
    job — the semantics a 100 TB pipeline needs when one poisoned row must
    not kill an hours-long stage.  Overflow is staged onto a sparse
    deterministic subset (~0.01% of rows): Spark's try_* error path costs a
    caught JVM exception PER FAILING ROW, so it is built for rare poisoned
    rows, not bulk overflow — measured 9s/600k-failing-rows vs ~0.3s when
    failures are rare.  The oracle reproduces each NULL domain in closed
    form (DuckDB has no try_* family)."""
    li = load_table(spark, sf_dir, "lineitem")
    safe_div = F.try_divide("l_extendedprice", F.col("l_linenumber") - 1)
    big = F.lit(9223372036854775807).cast("bigint")
    ok = F.col("l_orderkey").cast("bigint")
    mul_probe = F.when(ok % 9973 == 0, big).otherwise(F.lit(1).cast("bigint"))
    add_probe = F.when(ok % 7919 == 0, big).otherwise(F.lit(0).cast("bigint"))
    safe_mul = F.try_multiply(ok, mul_probe)
    safe_add = F.try_add(add_probe, ok)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(safe_div.isNull().cast("bigint")).alias("n_div_by_zero"),
            F.round(F.sum(safe_div), 2).alias("sum_safe_div"),
            F.count(safe_mul).alias("n_mul_in_range"),
            F.count(safe_add).alias("n_add_in_range"),
        )
        .orderBy("l_returnflag")
    )


@q(
    "window_rolling_median",
    """
    WITH o AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             cast(round(o_totalprice * 100) AS bigint) AS cents
      FROM orders WHERE o_orderkey < 20000
    )
    SELECT o_custkey, o_orderkey,
           median(cents) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) / 100.0 AS roll_median
    FROM o
    ORDER BY o_custkey, o_orderkey
    LIMIT 500
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median over a 5-row sliding frame per customer — the
    order-statistic the reference's window kernels cannot express at all
    (its WindowFunctionKernel.cc covers sum/avg/rank family only; a frame'd
    percentile falls back to row-based Spark there).  Spark computes it as
    ``percentile(x, 0.5)`` over a ROWS frame — per-frame exact selection,
    partitioned by customer so the state parallelizes by key at 100 TB.
    Portability: the median interpolates the two middle elements; on
    doubles the engines' ``a + 0.5*(b-a)`` vs ``(a+b)/2`` differ in the
    last ulp, so the median runs over integer CENTS (exact at both) and
    divides back once."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 20000)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
    )
    frame = (
        "percentile(cents, 0.5D) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)"
    )
    return (
        o.withColumn("roll_median", F.expr(frame) / 100.0)
        .select("o_custkey", "o_orderkey", "roll_median")
        .orderBy("o_custkey", "o_orderkey")
        .limit(500)
    )


@q(
    "expr_group_by_all",
    """
    SELECT l_returnflag, l_linestatus,
           year(l_shipdate) AS ship_year,
           cast(count(*) AS bigint) AS n,
           cast(sum(cast(round(l_extendedprice * 100) AS bigint)) AS bigint)
             AS price_cents
    FROM lineitem
    WHERE l_quantity > 45.0
    GROUP BY ALL
    ORDER BY ALL
    """,
)
def expr_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` / ``ORDER BY ALL`` (Spark 4 SQL surface, absent from
    the reference's parser entirely — its grammar is Spark 3.0's,
    ColumnarPlugin.scala operates below the parser): the analyzer infers the
    grouping keys as every non-aggregate select item and the global order as
    the full column list.  The plan that comes out is the same partial/final
    hash aggregate as an explicit GROUP BY — the sugar costs nothing at any
    scale."""
    from ..catalog import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               year(l_shipdate) AS ship_year,
               cast(count(*) AS bigint) AS n,
               cast(sum(cast(round(l_extendedprice * 100) AS bigint)) AS bigint)
                 AS price_cents
        FROM lineitem
        WHERE l_quantity > 45.0
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@q(
    "expr_xml",
    """
    WITH src AS (
      SELECT o_orderkey, o_orderstatus,
             cast(round(o_totalprice * 100) AS bigint) AS cents
      FROM orders WHERE o_orderkey < 8000
    )
    SELECT o_orderstatus AS status,
           cast(count(*) AS bigint) AS n,
           cast(sum(o_orderkey) AS bigint) AS id_sum,
           cast(sum(cents) AS bigint) AS cents_sum
    FROM src GROUP BY 1 ORDER BY status
    """,
)
def expr_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion expressions — ``from_xml`` (Spark 4 schema-projected
    parse) plus the Hive ``xpath_long`` attribute extractor — over XML
    payloads synthesized from the orders table.  The reference has no XML
    surface at all (its expression converter whitelist,
    ColumnarExpressionConverter.scala, covers arithmetic/string/date only).
    Numeric content rides as integer cents inside the document so
    parse(format(x)) == x exactly — no printf round-half-even vs round()
    tie to split the engines.  The oracle replays the identity on the base
    columns.  At 100 TB: pure map-side expression work, no shuffle beyond
    the final rollup."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 8000)
        .select(
            F.format_string(
                '<o id="%d"><s>%s</s><c>%d</c></o>',
                F.col("o_orderkey"),
                F.col("o_orderstatus"),
                F.round(F.col("o_totalprice") * 100).cast("bigint"),
            ).alias("xml")
        )
    )
    parsed = o.select(
        F.expr("xpath_long(xml, 'o/@id')").alias("id"),
        F.from_xml(F.col("xml"), "STRUCT<s: STRING, c: BIGINT>").alias("p"),
    )
    return (
        parsed.groupBy(F.col("p.s").alias("status"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("id").cast("bigint").alias("id_sum"),
            F.sum("p.c").cast("bigint").alias("cents_sum"),
        )
        .orderBy("status")
    )


@q(
    "reshape_transpose",
    """
    WITH g AS (
      SELECT o_orderstatus,
             cast(count(*) AS bigint) AS n,
             cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint)
               AS cents
      FROM orders GROUP BY o_orderstatus
    )
    SELECT 'cents' AS key,
           cast(sum(CASE WHEN o_orderstatus = 'F' THEN cents END) AS bigint) AS "F",
           cast(sum(CASE WHEN o_orderstatus = 'O' THEN cents END) AS bigint) AS "O",
           cast(sum(CASE WHEN o_orderstatus = 'P' THEN cents END) AS bigint) AS "P"
    FROM g
    UNION ALL
    SELECT 'n',
           cast(sum(CASE WHEN o_orderstatus = 'F' THEN n END) AS bigint),
           cast(sum(CASE WHEN o_orderstatus = 'O' THEN n END) AS bigint),
           cast(sum(CASE WHEN o_orderstatus = 'P' THEN n END) AS bigint)
    FROM g
    ORDER BY key
    """,
)
def reshape_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.transpose`` (Spark 4.0 relational transpose — rows become
    columns keyed by the index column's values).  Meaningful only on
    aggregate-sized frames (the output width = input row count), which is
    exactly how it's used: pivot a small metrics rollup for report layout.
    Here the 3-row order-status rollup transposes to metric-per-row /
    status-per-column; the oracle states the transposed shape with
    conditional aggregates.  The heavy work (the rollup) happened before
    the transpose, distributed as usual."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy("o_orderstatus").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )
    return g.transpose().orderBy("key")


@q(
    "expr_csv",
    """
    WITH src AS (
      SELECT o_orderkey AS k, o_orderstatus AS s,
             cast(round(o_totalprice * 100) AS bigint) AS c
      FROM orders
    )
    SELECT s AS status,
           cast(count(*) AS bigint) AS n,
           cast(sum(k) AS bigint) AS key_sum,
           cast(sum(c) AS bigint) AS cents_sum
    FROM src GROUP BY 1 ORDER BY status
    """,
)
def expr_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV expression surface — ``to_csv(struct)`` to serialize and
    ``from_csv`` with an explicit schema + custom separator to parse back
    (the embedded-record twin of `expr_xml`; the reference's CSV support
    is file-scan-only, arrow-data-source csv).  Numeric content rides as
    integer cents so parse(format(x)) == x exactly.  The oracle replays
    the identity on the base columns.  Pure map-side expression work."""
    o = load_table(spark, sf_dir, "orders").select(
        F.to_csv(
            F.struct(
                F.col("o_orderkey").alias("k"),
                F.col("o_orderstatus").alias("s"),
                F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
            ),
            {"sep": "|"},
        ).alias("line")
    )
    parsed = o.select(
        F.from_csv(
            F.col("line"), "k BIGINT, s STRING, c BIGINT", {"sep": "|"}
        ).alias("p")
    )
    return (
        parsed.groupBy(F.col("p.s").alias("status"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("p.k").cast("bigint").alias("key_sum"),
            F.sum("p.c").cast("bigint").alias("cents_sum"),
        )
        .orderBy("status")
    )


@q(
    "agg_histogram_log2",
    """
    WITH b AS (
      SELECT length(bin(cast(round(o_totalprice * 100) AS bigint))) - 1 AS bucket,
             cast(round(o_totalprice * 100) AS bigint) AS cents
      FROM orders
    )
    SELECT bucket,
           cast(count(*) AS bigint) AS n,
           cast(min(cents) AS bigint) AS min_cents,
           cast(max(cents) AS bigint) AS max_cents
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def agg_histogram_log2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log₂-bucketed histogram — the right shape for long-tailed monetary /
    latency distributions where fixed-width bins waste 90% of their range.
    The bucket is floor(log2(x)) computed EXACTLY as integer bit-length
    (``length(bin(x)) - 1``) — no float log whose last-ulp could flip a
    power-of-two boundary value between engines.  Map-side bucket
    assignment, one ≤64-group hash agg: the histogram of a 100 TB column
    costs one scan."""
    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    return (
        o.select("cents", (F.length(F.bin("cents")) - 1).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .orderBy("bucket")
    )


@q(
    "agg_grouping_id",
    """
    SELECT * FROM (
      SELECT cast(grouping_id(l_returnflag, l_linestatus) AS bigint) AS gid,
             cast(grouping(l_returnflag) AS int) AS g_flag,
             coalesce(l_returnflag, 'ALL') AS flag,
             coalesce(l_linestatus, 'ALL') AS status,
             cast(count(*) AS bigint) AS n,
             cast(sum(cast(round(l_quantity * 100) AS bigint)) AS bigint)
               AS qty_cents
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ) WHERE gid <> 1
    ORDER BY gid, flag, status
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``grouping()`` / ``grouping_id()`` as first-class output and HAVING
    predicate — how a report distinguishes a real NULL group from a
    rollup subtotal (the reference executes the Expand but the grouping
    bitmask functions are Spark expression surface on top,
    ColumnarExpressionConverter has no entry for them).  Filtering on the
    gid drops one subtotal LEVEL right after the same aggregate — no
    second pass over the data.  Plan: one Expand + partial/final hash
    agg, same as any rollup."""
    from ..catalog import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT * FROM (
          SELECT cast(grouping_id(l_returnflag, l_linestatus) AS bigint) AS gid,
                 cast(grouping(l_returnflag) AS int) AS g_flag,
                 coalesce(l_returnflag, 'ALL') AS flag,
                 coalesce(l_linestatus, 'ALL') AS status,
                 cast(count(*) AS bigint) AS n,
                 cast(sum(cast(round(l_quantity * 100) AS bigint)) AS bigint)
                   AS qty_cents
          FROM lineitem
          GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ) WHERE gid <> 1
        ORDER BY gid, flag, status
        """
    )


@q(
    "expr_aes_roundtrip",
    """
    SELECT c_mktsegment AS segment,
           cast(count(*) AS bigint) AS n,
           cast(sum(length(c_name)) AS bigint) AS name_chars,
           cast(sum(c_custkey) AS bigint) AS key_sum
    FROM customer GROUP BY 1 ORDER BY segment
    """,
)
def expr_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface — ``aes_encrypt``/``aes_decrypt``
    (ECB for deterministic ciphertext; GCM salts an IV per call) over the
    PII column, with the aggregate computed on the DECRYPTED round-trip.
    This is the at-rest pattern for restricted columns: the engine never
    plans differently, encryption is just an expression pair.  The oracle
    aggregates the plaintext directly — equality proves the round-trip is
    the identity.  The reference has no crypto expressions at all.  Pure
    map-side; key distribution is the deployment's concern (here a
    literal)."""
    key = "0123456789abcdef"
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.expr(
            f"cast(aes_decrypt(aes_encrypt(c_name, '{key}', 'ECB'), "
            f"'{key}', 'ECB') AS string)"
        ).alias("name_rt"),
    )
    return (
        c.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.length("name_rt")).cast("bigint").alias("name_chars"),
            F.sum("c_custkey").cast("bigint").alias("key_sum"),
        )
        .orderBy("segment")
    )


@q(
    "expr_url_functions",
    """
    WITH u AS (
      SELECT o_orderkey,
             'https://shop-' || (o_orderkey % 5) || '.example.com/cat/'
               || o_orderstatus || '/item?id=' || o_orderkey || '&pri='
               || replace(o_orderpriority, ' ', '+') AS url
      FROM orders WHERE o_orderkey < 20000
    )
    SELECT regexp_extract(url, 'https?://([^/]+)', 1) AS host,
           regexp_extract(url, 'https?://[^/]+(/[^?]*)', 1) AS path,
           cast(count(*) AS bigint) AS n,
           cast(sum(cast(regexp_extract(url, 'id=(\\d+)', 1) AS bigint))
                AS bigint) AS id_sum
    FROM u GROUP BY 1, 2 ORDER BY host, path
    """,
)
def expr_url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse_url`` component extraction (HOST / PATH / QUERY-parameter) —
    the clickstream-ingest workhorse; the reference's expression
    whitelist has no URL functions.  URLs synthesize from order columns,
    Spark parses with the dedicated expression, and the oracle replays
    the extraction with regexes — agreement proves parse_url's component
    semantics on these shapes.  Pure map-side expression work feeding a
    host/path rollup."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 20000)
    u = o.select(
        F.concat(
            F.lit("https://shop-"),
            (F.col("o_orderkey") % 5).cast("string"),
            F.lit(".example.com/cat/"),
            F.col("o_orderstatus"),
            F.lit("/item?id="),
            F.col("o_orderkey").cast("string"),
            F.lit("&pri="),
            F.replace(F.col("o_orderpriority"), F.lit(" "), F.lit("+")),
        ).alias("url")
    )
    return (
        u.select(
            F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
            F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
            F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("id"))
            .cast("bigint")
            .alias("id"),
        )
        .groupBy("host", "path")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("id").cast("bigint").alias("id_sum"),
        )
        .orderBy("host", "path")
    )


@q(
    "analytics_heatmap_bins",
    """
    SELECT cast(round(o_totalprice * 100) AS bigint) // 5000000 AS price_bin,
           year(o_orderdate) - 1992 AS year_bin,
           cast(count(*) AS bigint) AS n,
           cast(sum(o_orderkey) AS bigint) AS key_sum
    FROM orders
    GROUP BY 1, 2 ORDER BY price_bin, year_bin
    """,
)
def analytics_heatmap_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D density grid (price × year) — the binning behind every scatter
    heatmap: both axes bucket with INTEGER division (no float width
    arithmetic at bucket boundaries), one hash agg produces the grid.
    At 100 TB the grid is axis₁×axis₂ cells regardless of row count —
    the classic server-side reduction before any plotting client."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.expr(
                "cast(round(o_totalprice * 100) AS bigint) div 5000000"
            ).alias("price_bin"),
            (F.year("o_orderdate") - 1992).alias("year_bin"),
            "o_orderkey",
        )
        .groupBy("price_bin", "year_bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        )
        .orderBy("price_bin", "year_bin")
    )


@q(
    "expr_luhn_pii",
    """
    WITH cand AS (
      SELECT o_orderkey,
             lpad(cast(o_orderkey * 37 AS varchar), 16, '2') AS num
      FROM orders WHERE o_orderkey < 40000
    ),
    checked AS (
      SELECT o_orderkey,
             (list_sum(list_transform(string_split(reverse(num), ''), (c, i) ->
               CASE WHEN i % 2 = 0 THEN
                      CASE WHEN cast(c AS int) * 2 > 9 THEN cast(c AS int) * 2 - 9
                           ELSE cast(c AS int) * 2 END
                    ELSE cast(c AS int) END)) % 10 = 0) AS valid
      FROM cand
    )
    SELECT valid,
           cast(count(*) AS bigint) AS n,
           cast(sum(o_orderkey) AS bigint) AS key_sum
    FROM checked GROUP BY valid ORDER BY valid
    """,
)
def expr_luhn_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``luhn_check`` — the checksum behind payment-card PII detection: a
    16-digit string that passes Luhn is a redaction candidate, one that
    fails is noise (this is how `text_redact`-style scrubbing cuts its
    false-positive rate).  Spark evaluates the builtin; the oracle
    re-implements Luhn longhand (reversed digits, double-every-second,
    subtract 9 over 9) — agreement on thousands of synthesized numbers
    pins the builtin's semantics.  Map-side expression + a 2-group agg."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 40000)
    cand = o.select(
        "o_orderkey",
        F.lpad((F.col("o_orderkey") * 37).cast("string"), 16, "2").alias("num"),
    )
    return (
        cand.select("o_orderkey", F.expr("luhn_check(num)").alias("valid"))
        .groupBy("valid")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        )
        .orderBy("valid")
    )


# =========================================================================
# Exchange & cache plumbing (§2.2 coalesce, §2.9 range exchange, §2.1 cache)
# — driver-visible entries for the three capability rows that previously
# rested on test-only proof (round-5 VERDICT item 5).
# =========================================================================


@q(
    "cache_columnar_reuse",
    """
    WITH base AS (
      SELECT l_returnflag AS flag,
             cast(sum(cast(l_quantity AS decimal(38,9))) AS double) AS qty,
             cast(count(*) AS bigint) AS n
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT a.flag,
           cast(round(a.qty / b.total_qty, 6) AS double) AS qty_share,
           cast(a.n AS bigint) AS n
    FROM base a CROSS JOIN (SELECT sum(qty) AS total_qty FROM base) b
    ORDER BY a.flag
    """,
)
def cache_columnar_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar in-memory cache reused by two consumers — the reference's
    ArrowColumnarCachedBatchSerializer / InMemoryTableScan (SURVEY §2.1).
    The aggregated base is persisted once and feeds BOTH the per-flag rows
    and the grand-total scalar; without the cache the lineitem scan+agg
    runs twice.  The cached subplan is 3 rows, so the persist is O(groups)
    memory at any corpus size."""
    from ..sources.io import cached

    lineitem = load_table(spark, sf_dir, "lineitem")
    base = cached(
        lineitem.groupBy(F.col("l_returnflag").alias("flag")).agg(
            F.sum(F.col("l_quantity").cast("decimal(38,9)"))
            .cast("double")
            .alias("qty"),
            F.count("*").cast("bigint").alias("n"),
        )
    )
    total = base.agg(F.sum("qty").alias("total_qty"))
    return (
        base.crossJoin(F.broadcast(total))
        .select(
            "flag",
            F.round(F.col("qty") / F.col("total_qty"), 6).cast("double").alias("qty_share"),
            "n",
        )
        .orderBy("flag")
    )


@q(
    "exchange_coalesce",
    """
    WITH base AS (
      SELECT n_regionkey,
             cast(count(*) AS bigint) AS n,
             cast(sum(n_nationkey) AS bigint) AS key_sum
      FROM nation GROUP BY n_regionkey
    )
    SELECT cast(1 AS bigint) AS n_parts, n_regionkey, n, key_sum
    FROM base ORDER BY n_regionkey
    """,
)
def exchange_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``coalesce(n)`` partition merge without a shuffle — the reference's
    ColumnarCoalesceExec (SURVEY §2.2).  A small aggregated result is
    coalesced to one partition (the classic pre-write compaction); the
    observable is ``spark_partition_id()`` distinct-count == 1, proving the
    merge actually happened in-plan.  Coalesce runs on the 5-row aggregate,
    never the raw corpus, so it is scale-neutral."""
    nation = load_table(spark, sf_dir, "nation")
    base = (
        nation.groupBy("n_regionkey")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("n_nationkey").cast("bigint").alias("key_sum"),
        )
        .coalesce(1)
    )
    return (
        base.withColumn("pid", F.spark_partition_id())
        .withColumn("n_parts", F.size(F.collect_set("pid").over(W.partitionBy())).cast("bigint"))
        .select("n_parts", "n_regionkey", "n", "key_sum")
        .orderBy("n_regionkey")
    )


@q(
    "exchange_range_partition",
    """
    SELECT cast(count(*) AS bigint) AS n_rows,
           cast(sum(o_orderkey) AS bigint) AS key_sum,
           true AS ranges_monotonic,
           true AS parts_bounded
    FROM orders
    """,
)
def exchange_range_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioning exchange — the reference's range scheme in
    ColumnarShuffleExchangeExec.scala:360-390 (SURVEY §2.9).
    ``repartitionByRange(8, o_orderkey)`` samples range boundaries and
    routes rows so partition key-ranges are disjoint and ordered; the
    entry verifies that property itself (per-partition [min,max] windows
    are pairwise non-overlapping and monotone in partition id, partition
    count ≤ 8) plus exact row/key preservation — self-validating verdicts,
    same pattern as the approx entries."""
    orders = load_table(spark, sf_dir, "orders")
    per_part = (
        orders.select("o_orderkey")
        .repartitionByRange(8, F.col("o_orderkey"))
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.min("o_orderkey").alias("lo"),
            F.max("o_orderkey").alias("hi"),
            F.count("*").cast("bigint").alias("n"),
            F.sum("o_orderkey").cast("bigint").alias("s"),
        )
    )
    w = W.orderBy("pid")
    return per_part.select(
        "pid", "n", "s", (F.col("lo") > F.lag("hi").over(w)).alias("mono")
    ).agg(
        F.sum("n").cast("bigint").alias("n_rows"),
        F.sum("s").cast("bigint").alias("key_sum"),
        F.coalesce(F.bool_and("mono"), F.lit(True)).alias("ranges_monotonic"),
        (F.count("*") <= 8).alias("parts_bounded"),
    )
