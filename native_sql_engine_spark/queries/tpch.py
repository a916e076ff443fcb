"""TPC-H battery, adapted to the driver-generated star schema.

The reference ships and CI-gates on TPC-H q1-q22
(/root/reference/native-sql-engine/core/src/test/resources/tpch/*.sql,
TPCHSuite.scala:42-100).  The driver data (TESTDATA.md) is a simplified
TPC-H: no partsupp table and fewer columns (no l_shipmode / l_commitdate /
l_receiptdate / o_shippriority / c_phone / p_container ...), so each query
is adapted to the available columns while preserving its operator shape
(the thing SURVEY §2 inventories): q2 correlated scalar subquery over a
5-way join, q4/q21/q22 EXISTS / NOT EXISTS, q13 left outer + distribution,
q18 IN + HAVING, q15 CTE + scalar subquery, etc.

Every query is a single ANSI-SQL string executable by BOTH Spark SQL and
DuckDB (the oracle), so the correctness contract is definition-equal.
Hash-stability rules: every computed double is wrapped in round(); every
ORDER BY ... LIMIT has a total order (deterministic under ties); integer
aggregates are cast to BIGINT (DuckDB sums to HUGEINT otherwise).

Scale notes (100 TB design): all queries are declarative SQL — Catalyst
does predicate pushdown to the parquet scan, column pruning, join
reordering; AQE (enabled in session.py) converts shuffle joins to broadcast
at runtime when a filtered side fits, coalesces post-shuffle partitions and
splits skewed ones.  Dimension tables (region/nation/supplier/part/customer)
stay broadcast-able at any SF while fact tables (lineitem/orders) shuffle
on join keys only where the plan genuinely needs co-location.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_tables

#: name → SQL shared by Spark and the DuckDB oracle.
SQL: dict[str, str] = {}


def _register(name: str, sql: str) -> None:
    SQL[name] = sql


def _runner(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_tables(spark, sf_dir)
        return spark.sql(sql)

    return run


# --- q1: pricing summary report (scan → filter → hash agg → sort) ---------
_register(
    "tpch_q1",
    """
    SELECT l_returnflag,
           l_linestatus,
           cast(round(sum(cast(l_quantity AS decimal(38,9))), 2) AS double)                                        AS sum_qty,
           cast(round(sum(cast(l_extendedprice AS decimal(38,9))), 2) AS double)                                   AS sum_base_price,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2) AS double)                AS sum_disc_price,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS decimal(38,9))), 2) AS double)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= date '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)

# --- q2: min-cost supplier (correlated scalar subquery, multi-join) -------
# partsupp-free adaptation: cheapest lineitem price plays supply cost.
_register(
    "tpch_q2",
    """
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_type
    FROM part, supplier, lineitem, nation, region
    WHERE p_partkey = l_partkey
      AND s_suppkey = l_suppkey
      AND p_size = 15
      AND p_type = 'STANDARD'
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND l_extendedprice = (
          SELECT min(l2.l_extendedprice)
          FROM lineitem l2, supplier s2, nation n2, region r2
          WHERE l2.l_partkey = p_partkey
            AND s2.s_suppkey = l2.l_suppkey
            AND s2.s_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r2.r_regionkey
            AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, p_type
    LIMIT 100
    """,
)

# --- q3: unshipped orders (3-way join + agg + top-k) -----------------------
_register(
    "tpch_q3",
    """
    SELECT l_orderkey,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2) AS double) AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < date '1998-03-15'
      AND l_shipdate > date '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)

# --- q4: order priority checking (correlated EXISTS) -----------------------
# commitdate/receiptdate-free: "late" = shipped after order date.
_register(
    "tpch_q4",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= date '1997-07-01'
      AND o_orderdate < date '1997-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)

# --- q5: local supplier volume (6-way join) --------------------------------
_register(
    "tpch_q5",
    """
    SELECT n_name,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2) AS double) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= date '1996-01-01'
      AND o_orderdate < date '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)

# --- q6: forecasting revenue change (pure scan+filter+agg) ------------------
_register(
    "tpch_q6",
    """
    SELECT cast(round(sum(cast(l_extendedprice * l_discount AS decimal(38,9))), 2) AS double) AS revenue
    FROM lineitem
    WHERE l_shipdate >= date '1996-01-01'
      AND l_shipdate < date '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)

# --- q7: volume shipping (self-joined dims, OR of nation pairs) -------------
_register(
    "tpch_q7",
    """
    SELECT supp_nation, cust_nation, l_year,
           cast(round(sum(cast(volume AS decimal(38,9))), 2) AS double) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               cast(extract(year FROM l_shipdate) AS bigint) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey
          AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey
          AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN date '1996-01-01' AND date '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)

# --- q8: national market share (8-way join, CASE inside agg ratio) ----------
_register(
    "tpch_q8",
    """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
        SELECT cast(extract(year FROM o_orderdate) AS bigint) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
        WHERE p_partkey = l_partkey
          AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey
          AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey
          AND n1.n_regionkey = r_regionkey
          AND r_name = 'AMERICA'
          AND s_nationkey = n2.n_nationkey
          AND o_orderdate BETWEEN date '1996-01-01' AND date '1997-12-31'
          AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)

# --- q9: product type profit (LIKE filter, derived profit) ------------------
# ps_supplycost-free: cost modeled as 60% of retail price.
_register(
    "tpch_q9",
    """
    SELECT nation, o_year, cast(round(sum(cast(amount AS decimal(38,9))), 2) AS double) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               cast(extract(year FROM o_orderdate) AS bigint) AS o_year,
               l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity AS amount
        FROM part, supplier, lineitem, orders, nation
        WHERE s_suppkey = l_suppkey
          AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey
          AND s_nationkey = n_nationkey
          AND p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)

# --- q10: returned item reporting (join + agg + top-k) ----------------------
_register(
    "tpch_q10",
    """
    SELECT c_custkey, c_name,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2) AS double) AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= date '1997-10-01'
      AND o_orderdate < date '1998-01-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)

# --- q11: important stock identification (HAVING w/ scalar subquery) --------
_register(
    "tpch_q11",
    """
    SELECT l_partkey AS ps_partkey,
           cast(round(sum(cast(l_extendedprice * l_quantity AS decimal(38,9))), 2) AS double) AS part_value
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_5'
    GROUP BY l_partkey
    HAVING sum(l_extendedprice * l_quantity) > (
        SELECT sum(l_extendedprice * l_quantity) * 0.002
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey
          AND s_nationkey = n_nationkey
          AND n_name = 'NATION_5')
    ORDER BY part_value DESC, ps_partkey
    """,
)

# --- q12: shipping modes / priority (conditional agg) ------------------------
# shipmode-free: bucket by line status, count priority classes of late lines.
_register(
    "tpch_q12",
    """
    SELECT l_linestatus,
           cast(sum(CASE WHEN o_orderpriority = '1-URGENT'
                           OR o_orderpriority = '2-HIGH'
                         THEN 1 ELSE 0 END) AS bigint) AS high_line_count,
           cast(sum(CASE WHEN o_orderpriority <> '1-URGENT'
                          AND o_orderpriority <> '2-HIGH'
                         THEN 1 ELSE 0 END) AS bigint) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate > o_orderdate
      AND l_shipdate >= date '1997-01-01'
      AND l_shipdate < date '1998-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)

# --- q13: customer order-count distribution (left outer join) ---------------
_register(
    "tpch_q13",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)

# --- q14: promotion effect (conditional ratio) -------------------------------
_register(
    "tpch_q14",
    """
    SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= date '1997-09-01'
      AND l_shipdate < date '1997-10-01'
    """,
)

# --- q15: top supplier (CTE + scalar-subquery max) ---------------------------
_register(
    "tpch_q15",
    """
    WITH revenue0 AS (
        SELECT l_suppkey AS supplier_no,
               cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2) AS double) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= date '1997-01-01'
          AND l_shipdate < date '1997-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue0
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue0)
    ORDER BY s_suppkey
    """,
)

# --- q16: supplier counts per part attrs (NOT IN + count distinct) -----------
_register(
    "tpch_q16",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)

# --- q17: small-quantity-order revenue (correlated avg subquery) -------------
_register(
    "tpch_q17",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#3'
      AND p_size = 5
      AND l_quantity < (
          SELECT 0.2 * avg(l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = p_partkey)
    """,
)

# --- q18: large volume customers (IN + HAVING + top-k) -----------------------
_register(
    "tpch_q18",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           cast(round(sum(cast(l_quantity AS decimal(38,9))), 2) AS double) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey
          HAVING sum(l_quantity) > 150)
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)

# --- q19: discounted revenue (disjunctive join predicates) -------------------
_register(
    "tpch_q19",
    """
    SELECT cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2) AS double) AS revenue
    FROM lineitem, part
    WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
           AND l_quantity >= 1 AND l_quantity <= 11
           AND p_size BETWEEN 1 AND 5)
       OR (p_partkey = l_partkey AND p_brand = 'Brand#23'
           AND l_quantity >= 10 AND l_quantity <= 20
           AND p_size BETWEEN 1 AND 10)
       OR (p_partkey = l_partkey AND p_brand = 'Brand#4'
           AND l_quantity >= 20 AND l_quantity <= 30
           AND p_size BETWEEN 1 AND 15)
    """,
)

# --- q20: potential part promotion (nested IN + HAVING) ----------------------
_register(
    "tpch_q20",
    """
    SELECT s_name, s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem, part
          WHERE l_partkey = p_partkey
            AND p_name LIKE 'small%'
            AND l_shipdate >= date '1997-01-01'
            AND l_shipdate < date '1998-01-01'
          GROUP BY l_suppkey
          HAVING sum(l_quantity) > 50)
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_4'
    ORDER BY s_name
    """,
)

# --- q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS) ------------
_register(
    "tpch_q21",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate)
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_2'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)

# --- q22: global sales opportunity (NOT EXISTS + scalar subquery) ------------
# c_phone-free: country code modeled as the customer-number suffix.
# ADAPTED from canonical TPC-H (like the NATION_* renames): the driver's
# synthetic data gives every customer at least one order, so the canonical
# "customers with no orders" anti-join is vacuous; restricting the NOT EXISTS
# to '1-URGENT' orders keeps the null-aware anti-join SHAPE while matching
# rows on this dataset.  Engine and DuckDB oracle share the predicate.
_register(
    "tpch_q22",
    """
    SELECT cntrycode, count(*) AS numcust,
           cast(round(sum(cast(c_acctbal AS decimal(38,9))), 2) AS double) AS totacctbal
    FROM (
        SELECT substring(c_name, 17, 2) AS cntrycode, c_acctbal
        FROM customer
        WHERE c_acctbal > (
              SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderpriority = '1-URGENT')
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    name: _runner(sql) for name, sql in SQL.items()
}
ORACLE: dict[str, str] = dict(SQL)
