"""TPC-DS-derived battery ("Decision Support Benchmark2" shapes).

The reference's second benchmark suite is TPC-DS: it ships the full query
set plus modified q3/q10/q19/q27/q34/q42/q43/q46/q52/q53/q55/q59/q63/q65/
q68/q73/q79/q89/q98 (resources/tpcds-modifiedQueries/) and CI-gates on the
modified subset (SURVEY §5.4).  The driver schema has no store_sales star,
so each query here reproduces the *operator shape* of its TPC-DS original
on the TPC-H-ish tables — the shapes are what SURVEY §2 inventories:

The full CI-gated modified subset (q3 q10 q19 q27 q34 q42 q43 q46 q52 q53
q55 q59 q63 q65 q68 q73 q79 q89 q98) is covered 1:1:

- q53/q63/q89: aggregate → window-over-aggregate (avg of group sums per
  super-group) → relative-deviation filter → ordered limit;
- q46/q68: multi-dimension star join → per-ticket two-level aggregation →
  join back to the customer dimension;
- q73/q34: per-order counts with HAVING band → customer join;
- q3/q42/q52/q55: date-dim star aggregate, top-k;
- q19: brand revenue with a cross-dimension (customer vs supplier nation)
  mismatch predicate;
- q43: day-of-week pivot-style conditional aggregation;
- q10: demographics count gated by EXISTS + (EXISTS OR EXISTS) subqueries;
- q27: multi-dimension ROLLUP of averages;
- q59: period-over-period comparison via self-join of an aggregate CTE.

Every query is one ANSI-SQL string executed verbatim by BOTH Spark and the
DuckDB oracle (day-of-week is day(date) % 7 to avoid engine-specific DOW
numbering).  House stability rules apply: decimal-summed doubles, round(),
total ORDER BY under LIMIT, bigint casts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_tables

SQL: dict[str, str] = {}


def _register(name: str, sql: str) -> None:
    SQL[name] = sql


def _runner(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_tables(spark, sf_dir)
        return spark.sql(sql)

    return run


# --- q53/q63-shape: window over aggregate + deviation filter ---------------
_register(
    "tpcds_q53",
    """
    SELECT p_brand, order_month, sum_sales, avg_monthly_sales
    FROM (
      SELECT p_brand,
             month(o_orderdate) AS order_month,
             cast(round(sum(cast(l_extendedprice AS decimal(38,9))), 2) AS double) AS sum_sales,
             cast(round(avg(sum(cast(l_extendedprice AS decimal(38,9))))
                        OVER (PARTITION BY p_brand), 2) AS double) AS avg_monthly_sales
      FROM lineitem, orders, part
      WHERE l_orderkey = o_orderkey
        AND l_partkey = p_partkey
        AND p_type IN ('STANDARD', 'SMALL', 'MEDIUM')
      GROUP BY p_brand, month(o_orderdate)
    ) tmp
    WHERE CASE WHEN avg_monthly_sales > 0
               THEN abs(sum_sales - avg_monthly_sales) / avg_monthly_sales
               ELSE NULL END > 0.1
    ORDER BY avg_monthly_sales, sum_sales, p_brand, order_month
    LIMIT 100
    """,
)

# --- q63-shape: window-over-aggregate deviation, compound OR dimension -----
# (tpcds-modifiedQueries/q63.sql: manager-level monthly sales vs the
#  manager's average month, with an OR of two (category,class,brand)
#  conjunctions; supplier nation plays the manager dimension here.)
_register(
    "tpcds_q63",
    """
    SELECT manager_id, d_moy, sum_sales, avg_monthly_sales
    FROM (
      SELECT s_nationkey AS manager_id,
             month(o_orderdate) AS d_moy,
             cast(round(sum(cast(l_extendedprice AS decimal(38,9))), 2) AS double) AS sum_sales,
             cast(round(avg(sum(cast(l_extendedprice AS decimal(38,9))))
                        OVER (PARTITION BY s_nationkey), 2) AS double) AS avg_monthly_sales
      FROM lineitem, orders, supplier, part
      WHERE l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey
        AND l_partkey = p_partkey
        AND ((p_type IN ('STANDARD', 'SMALL')
              AND p_brand IN ('Brand#11', 'Brand#12', 'Brand#13', 'Brand#21', 'Brand#22')
              AND p_size BETWEEN 1 AND 25)
          OR (p_type IN ('MEDIUM', 'LARGE')
              AND p_brand IN ('Brand#31', 'Brand#32', 'Brand#33', 'Brand#41', 'Brand#42')
              AND p_size BETWEEN 26 AND 50))
      GROUP BY s_nationkey, month(o_orderdate)
    ) tmp1
    WHERE CASE WHEN avg_monthly_sales > 0
               THEN abs(sum_sales - avg_monthly_sales) / avg_monthly_sales
               ELSE NULL END > 0.1
    ORDER BY manager_id, avg_monthly_sales, sum_sales, d_moy
    LIMIT 100
    """,
)

# --- q65-shape: per-group agg joined against avg-of-aggs (no window) -------
# (tpcds-modifiedQueries/q65.sql: items whose store revenue is below a
#  fraction of that store's average item revenue — two aggregate subqueries
#  joined on the store key, then dimension joins for names.)
_register(
    "tpcds_q65",
    """
    WITH sb AS (
      SELECT s_nationkey,
             p_brand,
             cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2)
                  AS double) AS revenue
      FROM lineitem, supplier, part
      WHERE l_suppkey = s_suppkey
        AND l_partkey = p_partkey
      GROUP BY s_nationkey, p_brand
    ),
    sa AS (
      SELECT s_nationkey, avg(revenue) AS ave
      FROM sb
      GROUP BY s_nationkey
    )
    SELECT n_name, p_brand, revenue,
           cast(round(ave, 2) AS double) AS avg_brand_revenue
    FROM sb, sa, nation
    WHERE sb.s_nationkey = sa.s_nationkey
      AND sb.s_nationkey = n_nationkey
      AND sb.revenue <= 0.5 * sa.ave
    ORDER BY n_name, p_brand
    LIMIT 100
    """,
)

# --- q79-shape: filtered ticket aggregation → customer join, substr --------
# (tpcds-modifiedQueries/q79.sql: per-ticket amt/profit under a demographic
#  OR-predicate and day-of-week filter, joined back to customer with a
#  substr'd city column; supplier nation stands in for the store city.)
_register(
    "tpcds_q79",
    """
    SELECT c_name,
           city_prefix,
           o_orderkey,
           amt,
           profit
    FROM (
      SELECT l_orderkey AS o_orderkey,
             o_custkey,
             substr(n_name, 1, 15) AS city_prefix,
             cast(round(sum(cast(l_extendedprice * l_discount AS decimal(38,9))), 2)
                  AS double) AS amt,
             cast(round(sum(cast(l_extendedprice * (1 - l_discount) - l_quantity * 100
                                 AS decimal(38,9))), 2) AS double) AS profit
      FROM lineitem, orders, supplier, nation
      WHERE l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey
        AND s_nationkey = n_nationkey
        AND day(o_orderdate) % 7 = 1
        AND (o_orderpriority = '1-URGENT' OR o_totalprice > 50000)
      GROUP BY l_orderkey, o_custkey, substr(n_name, 1, 15)
    ) ms, customer
    WHERE o_custkey = c_custkey
    ORDER BY c_name, city_prefix, profit, o_orderkey
    LIMIT 100
    """,
)

# --- q98-shape: revenue share of class via windowed total ------------------
# (tpcds-modifiedQueries/q98.sql: item revenue with revenueratio =
#  revenue * 100 / sum(revenue) over the item class.)
_register(
    "tpcds_q98",
    """
    SELECT p_brand, p_type, revenue, revenueratio
    FROM (
      SELECT p_brand,
             p_type,
             cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2)
                  AS double) AS revenue,
             cast(round(cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)))
                             AS double) * 100
                        / cast(sum(sum(cast(l_extendedprice * (1 - l_discount)
                                            AS decimal(38,9))))
                               OVER (PARTITION BY p_type) AS double), 5) AS double)
                  AS revenueratio
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
      GROUP BY p_brand, p_type
    ) t
    ORDER BY p_type, revenueratio, p_brand
    LIMIT 100
    """,
)

# --- q46/q68-shape: star join → per-ticket agg → customer join -------------
_register(
    "tpcds_q46",
    """
    SELECT c_name, n_name, o_orderkey, amt, profit
    FROM (
      SELECT o_orderkey,
             o_custkey,
             cast(round(sum(cast(l_extendedprice * l_discount AS decimal(38,9))), 2) AS double) AS amt,
             cast(round(sum(cast(l_extendedprice * (1 - l_discount) - l_quantity * 100
                                 AS decimal(38,9))), 2) AS double) AS profit
      FROM lineitem, orders
      WHERE l_orderkey = o_orderkey
        AND day(o_orderdate) % 7 IN (0, 6)
        AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY o_orderkey, o_custkey
    ) ticket, customer, nation
    WHERE ticket.o_custkey = c_custkey
      AND c_nationkey = n_nationkey
      AND n_name IN ('NATION_3', 'NATION_7', 'NATION_12', 'NATION_18', 'NATION_21')
    ORDER BY c_name, profit, o_orderkey
    LIMIT 100
    """,
)

# --- q73/q34-shape: order-size band via HAVING → customer join -------------
_register(
    "tpcds_q73",
    """
    SELECT c_name, c_mktsegment, o_orderkey, cnt
    FROM (
      SELECT l_orderkey, cast(count(*) AS bigint) AS cnt
      FROM lineitem
      GROUP BY l_orderkey
      HAVING count(*) BETWEEN 5 AND 7
    ) big, orders, customer
    WHERE big.l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    ORDER BY cnt DESC, c_name, o_orderkey
    LIMIT 100
    """,
)

# --- q42/q52/q55-shape: date-dim star aggregate, top-k ---------------------
_register(
    "tpcds_q52",
    """
    SELECT year(o_orderdate) AS d_year,
           p_brand,
           cast(round(sum(cast(l_extendedprice AS decimal(38,9))), 2) AS double) AS brand_revenue
    FROM lineitem, orders, part
    WHERE l_orderkey = o_orderkey
      AND l_partkey = p_partkey
      AND month(o_orderdate) = 11
    GROUP BY year(o_orderdate), p_brand
    ORDER BY d_year, brand_revenue DESC, p_brand
    LIMIT 100
    """,
)

# --- q19-shape: brand revenue with cross-dimension mismatch predicate ------
_register(
    "tpcds_q19",
    """
    SELECT p_type,
           p_brand,
           cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2)
                AS double) AS ext_revenue
    FROM lineitem, orders, customer, supplier, part
    WHERE l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND l_suppkey = s_suppkey
      AND l_partkey = p_partkey
      AND c_nationkey <> s_nationkey
      AND p_size BETWEEN 1 AND 15
    GROUP BY p_type, p_brand
    ORDER BY ext_revenue DESC, p_type, p_brand
    LIMIT 100
    """,
)

# --- q43-shape: day-of-week conditional aggregation (pivot) ----------------
_register(
    "tpcds_q43",
    """
    SELECT n_name,
           cast(round(sum(CASE WHEN day(o_orderdate) % 7 = 0
                               THEN cast(o_totalprice AS decimal(38,9)) ELSE 0 END), 2)
                AS double) AS sun_sales,
           cast(round(sum(CASE WHEN day(o_orderdate) % 7 = 3
                               THEN cast(o_totalprice AS decimal(38,9)) ELSE 0 END), 2)
                AS double) AS wed_sales,
           cast(round(sum(CASE WHEN day(o_orderdate) % 7 = 6
                               THEN cast(o_totalprice AS decimal(38,9)) ELSE 0 END), 2)
                AS double) AS sat_sales
    FROM orders, customer, nation
    WHERE o_custkey = c_custkey
      AND c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)

# --- q10-shape: demographics count gated by EXISTS + (EXISTS OR EXISTS) ----
_register(
    "tpcds_q10",
    """
    SELECT c_mktsegment, n_name, cast(count(*) AS bigint) AS cnt
    FROM customer, nation
    WHERE c_nationkey = n_nationkey
      AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      AND (EXISTS (SELECT 1 FROM orders o, lineitem l
                   WHERE o.o_custkey = c_custkey AND l.l_orderkey = o.o_orderkey
                     AND l.l_returnflag = 'R')
           OR EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000))
    GROUP BY c_mktsegment, n_name
    ORDER BY c_mktsegment, n_name
    """,
)

# --- q27-shape: multi-dimension ROLLUP of averages --------------------------
_register(
    "tpcds_q27",
    """
    SELECT n_name, c_mktsegment,
           cast(grouping(n_name) AS bigint)      AS g_nation,
           cast(grouping(c_mktsegment) AS bigint) AS g_segment,
           cast(count(*) AS bigint)               AS cnt,
           round(avg(o_totalprice), 2)            AS avg_price
    FROM orders, customer, nation
    WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST
    """,
)

# --- q59-shape: period-over-period comparison via aggregate self-join -------
_register(
    "tpcds_q59",
    """
    WITH monthly AS (
      SELECT n_name,
             year(o_orderdate)  AS yr,
             month(o_orderdate) AS mon,
             sum(cast(o_totalprice AS decimal(38,9))) AS sales
      FROM orders, customer, nation
      WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
      GROUP BY n_name, year(o_orderdate), month(o_orderdate)
    )
    SELECT cur.n_name,
           cast(cur.yr AS bigint)  AS yr,
           cast(cur.mon AS bigint) AS mon,
           cast(round(cur.sales, 2) AS double) AS sales,
           cast(round(prev.sales, 2) AS double) AS prev_year_sales,
           round(cast(cur.sales AS double) / cast(prev.sales AS double), 4) AS yoy_ratio
    FROM monthly cur
    JOIN monthly prev
      ON cur.n_name = prev.n_name AND cur.mon = prev.mon
     AND cur.yr = prev.yr + 1
    WHERE prev.sales <> 0
    ORDER BY cur.n_name, yr, mon
    """,
)

# --- q3-shape: manufacturer-line revenue by year, top-k --------------------
# (tpcds-modifiedQueries/q3.sql: one manufacturer's brand revenue per year;
#  brand prefix plays the manufacturer id.)
_register(
    "tpcds_q3",
    """
    SELECT year(o_orderdate) AS d_year,
           p_brand,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2)
                AS double) AS sum_agg
    FROM lineitem, orders, part
    WHERE l_orderkey = o_orderkey
      AND l_partkey = p_partkey
      AND p_brand LIKE 'Brand#1%'
      AND month(o_orderdate) = 12
    GROUP BY year(o_orderdate), p_brand
    ORDER BY d_year, sum_agg DESC, p_brand
    LIMIT 100
    """,
)

# --- q34-shape: order-size band (15-20) + status OR-predicate → customers --
# (tpcds-modifiedQueries/q34.sql: q73's sibling with a wider count band and
#  a buy-potential OR predicate; order status plays the demographic.)
_register(
    "tpcds_q34",
    """
    SELECT c_name, c_mktsegment, o_orderkey, cnt
    FROM (
      SELECT l_orderkey, cast(count(*) AS bigint) AS cnt
      FROM lineitem, orders
      WHERE l_orderkey = o_orderkey
        AND (o_orderstatus = 'F' OR o_totalprice > 100000)
      GROUP BY l_orderkey
      HAVING count(*) BETWEEN 4 AND 6
    ) big, orders, customer
    WHERE big.l_orderkey = o_orderkey
      AND o_custkey = c_custkey
    ORDER BY c_name, cnt DESC, o_orderkey
    LIMIT 100
    """,
)

# --- q42-shape: category revenue for one month, top-k ----------------------
# (tpcds-modifiedQueries/q42.sql: q52's sibling keyed on category instead
#  of brand; p_type plays the category.)
_register(
    "tpcds_q42",
    """
    SELECT year(o_orderdate) AS d_year,
           p_type,
           cast(round(sum(cast(l_extendedprice AS decimal(38,9))), 2) AS double) AS cat_revenue
    FROM lineitem, orders, part
    WHERE l_orderkey = o_orderkey
      AND l_partkey = p_partkey
      AND month(o_orderdate) = 11
      AND p_size BETWEEN 10 AND 40
    GROUP BY year(o_orderdate), p_type
    ORDER BY cat_revenue DESC, d_year, p_type
    LIMIT 100
    """,
)

# --- q55-shape: one manager's brand revenue for one month ------------------
# (tpcds-modifiedQueries/q55.sql: brand revenue under a manager filter;
#  supplier nation plays the manager.)
_register(
    "tpcds_q55",
    """
    SELECT p_brand,
           cast(round(sum(cast(l_extendedprice AS decimal(38,9))), 2) AS double) AS ext_price
    FROM lineitem, orders, supplier, part
    WHERE l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND l_partkey = p_partkey
      AND s_nationkey IN (1, 2, 3)
      AND month(o_orderdate) = 8
    GROUP BY p_brand
    ORDER BY ext_price DESC, p_brand
    LIMIT 100
    """,
)

# --- q68-shape: q46 + extended per-ticket measures (list price, tax) -------
# (tpcds-modifiedQueries/q68.sql: same ticket pattern as q46 with extra
#  ext_list_price / ext_tax sums and a two-city output.)
_register(
    "tpcds_q68",
    """
    SELECT c_name, n_name, o_orderkey, extended_price, extended_tax, list_discount
    FROM (
      SELECT o_orderkey,
             o_custkey,
             cast(round(sum(cast(l_extendedprice AS decimal(38,9))), 2) AS double)
                  AS extended_price,
             cast(round(sum(cast(l_extendedprice * l_tax AS decimal(38,9))), 2) AS double)
                  AS extended_tax,
             cast(round(sum(cast(l_extendedprice * l_discount AS decimal(38,9))), 2) AS double)
                  AS list_discount
      FROM lineitem, orders
      WHERE l_orderkey = o_orderkey
        AND day(o_orderdate) % 7 IN (1, 2)
        AND o_orderstatus IN ('O', 'F')
      GROUP BY o_orderkey, o_custkey
    ) ticket, customer, nation
    WHERE ticket.o_custkey = c_custkey
      AND c_nationkey = n_nationkey
      AND n_name IN ('NATION_2', 'NATION_5', 'NATION_11', 'NATION_19', 'NATION_20')
    ORDER BY c_name, o_orderkey
    LIMIT 100
    """,
)

# --- q89-shape: within-year monthly deviation per (category, manager) ------
# (tpcds-modifiedQueries/q89.sql: q53's sibling — the window partitions on
#  category × store so the deviation is against the pair's average month.)
_register(
    "tpcds_q89",
    """
    SELECT p_type, manager_id, order_month, sum_sales, avg_monthly_sales
    FROM (
      SELECT p_type,
             s_nationkey AS manager_id,
             month(o_orderdate) AS order_month,
             cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2)
                  AS double) AS sum_sales,
             cast(round(avg(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))))
                        OVER (PARTITION BY p_type, s_nationkey), 2) AS double)
                  AS avg_monthly_sales
      FROM lineitem, orders, supplier, part
      WHERE l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey
        AND l_partkey = p_partkey
        AND p_type IN ('STANDARD', 'LARGE', 'SMALL')
      GROUP BY p_type, s_nationkey, month(o_orderdate)
    ) tmp
    WHERE CASE WHEN avg_monthly_sales <> 0
               THEN abs(sum_sales - avg_monthly_sales) / avg_monthly_sales
               ELSE NULL END > 0.1
    ORDER BY sum_sales - avg_monthly_sales, p_type, manager_id, order_month
    LIMIT 100
    """,
)



# =========================================================================
# Full-set TPC-DS shapes (beyond the CI-gated modified subset): the
# reference also ships the complete 99-query set (resources/tpcds/ and
# tpcds-v2.7.0/ — SURVEY §5.4); these reproduce its most distinctive
# remaining operator shapes on the driver schema:
#
# - q1:  CTE aggregate + correlated scalar subquery vs 1.2x the group avg;
# - q11: year-over-year growth ratio across two channels (4-way self-join
#        of one aggregate CTE);
# - q14: INTERSECT of item sets across channels feeding a semi-join filter;
# - q16: count(distinct) gated by EXISTS (other supplier) + NOT EXISTS
#        (returned line);
# - q23: frequent-items CTE x best-customers CTE (HAVING vs a scalar
#        subquery over a nested aggregate);
# - q33: UNION ALL of three per-channel aggregates, re-aggregated;
# - q47: rank + lag + lead over a monthly aggregate (window-over-agg);
# - q51: cumulative windows from two channels FULL OUTER JOINed, filtered
#        where one overtakes the other;
# - q70: ROLLUP with rank() partitioned by grouping() level (lochierarchy);
# - q88: eight scalar count subqueries cross-joined into one row;
# - q95: orders with >= 2 distinct suppliers and no returns (IN + NOT IN
#        subqueries over grouped HAVING).
# =========================================================================
_SQL_NEW: dict[str, str] = {}

# --- q1-shape: CTE aggregate + correlated scalar subquery vs 1.2x group avg
_SQL_NEW["tpcds_q1"] = """
    WITH ctr AS (
      SELECT o_custkey AS ctr_custkey,
             c_nationkey AS ctr_nation,
             sum(cast(l_extendedprice AS decimal(38,9))) AS ctr_total_return
      FROM lineitem, orders, customer
      WHERE l_orderkey = o_orderkey
        AND o_custkey = c_custkey
        AND l_returnflag = 'R'
      GROUP BY o_custkey, c_nationkey
    )
    SELECT c_name, cast(round(ctr_total_return, 2) AS double) AS total_return
    FROM ctr c1, customer, nation
    WHERE ctr_total_return > (SELECT avg(ctr_total_return) * 1.2
                              FROM ctr c2
                              WHERE c1.ctr_nation = c2.ctr_nation)
      AND c1.ctr_custkey = c_custkey
      AND c_nationkey = n_nationkey
      AND n_name = 'NATION_19'
    ORDER BY c_name, total_return
    LIMIT 100
"""

# --- q11-shape: year-over-year growth ratio across two channels ------------
_SQL_NEW["tpcds_q11"] = """
    WITH yr AS (
      SELECT o_custkey, year(o_orderdate) AS yr, o_orderstatus AS chan,
             sum(cast(o_totalprice AS decimal(38,9))) AS total
      FROM orders
      WHERE o_orderstatus IN ('F', 'O') AND year(o_orderdate) IN (1995, 1996)
      GROUP BY o_custkey, year(o_orderdate), o_orderstatus
    )
    SELECT c_name,
           cast(round(w2.total / w1.total, 4) AS double) AS web_growth,
           cast(round(s2.total / s1.total, 4) AS double) AS store_growth
    FROM yr s1, yr s2, yr w1, yr w2, customer
    WHERE s1.o_custkey = c_custkey
      AND s1.chan = 'F' AND s2.chan = 'F' AND w1.chan = 'O' AND w2.chan = 'O'
      AND s2.o_custkey = c_custkey AND w1.o_custkey = c_custkey AND w2.o_custkey = c_custkey
      AND s1.yr = 1995 AND s2.yr = 1996 AND w1.yr = 1995 AND w2.yr = 1996
      AND s1.total > 0 AND w1.total > 0
      AND w2.total / w1.total > s2.total / s1.total
    ORDER BY c_name
    LIMIT 100
"""

# --- q14-shape: INTERSECT of item sets across channels, then re-aggregate --
_SQL_NEW["tpcds_q14"] = """
    WITH cross_items AS (
      SELECT p_brand FROM part, lineitem WHERE l_partkey = p_partkey AND l_returnflag = 'A'
      INTERSECT
      SELECT p_brand FROM part, lineitem WHERE l_partkey = p_partkey AND l_returnflag = 'N'
      INTERSECT
      SELECT p_brand FROM part, lineitem WHERE l_partkey = p_partkey AND l_returnflag = 'R'
    )
    SELECT p_brand,
           cast(count(*) AS bigint) AS n_sales,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2)
                AS double) AS revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND p_brand IN (SELECT p_brand FROM cross_items)
      AND year(l_shipdate) = 1996
    GROUP BY p_brand
    ORDER BY revenue DESC, p_brand
    LIMIT 100
"""

# --- q16-shape: EXISTS multi-supplier + NOT EXISTS returns, count distinct -
_SQL_NEW["tpcds_q16"] = """
    SELECT cast(count(DISTINCT l1.l_orderkey) AS bigint) AS order_count,
           cast(round(sum(cast(l1.l_extendedprice AS decimal(38,9))), 2) AS double)
                AS total_price
    FROM lineitem l1, orders
    WHERE l1.l_orderkey = o_orderkey
      AND o_orderpriority = '1-URGENT'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_returnflag = 'R')
"""

# --- q23-shape: frequent items x best customers, month slice ---------------
_SQL_NEW["tpcds_q23"] = """
    WITH frequent_parts AS (
      SELECT l_partkey
      FROM lineitem
      GROUP BY l_partkey
      HAVING count(DISTINCT l_orderkey) > 4
    ),
    best_customers AS (
      SELECT o_custkey
      FROM orders
      GROUP BY o_custkey
      HAVING sum(cast(o_totalprice AS decimal(38,9))) >
             (SELECT 0.5 * max(cust_total)
              FROM (SELECT sum(cast(o_totalprice AS decimal(38,9))) AS cust_total
                    FROM orders GROUP BY o_custkey) m)
    )
    SELECT cast(round(sum(cast(l_extendedprice AS decimal(38,9))), 2) AS double) AS sales
    FROM lineitem, orders
    WHERE l_orderkey = o_orderkey
      AND l_partkey IN (SELECT l_partkey FROM frequent_parts)
      AND o_custkey IN (SELECT o_custkey FROM best_customers)
      AND year(o_orderdate) = 1996
"""

# --- q33/q56/q60-shape: UNION ALL of per-channel aggregates, re-aggregated -
_SQL_NEW["tpcds_q33"] = """
    WITH flag_a AS (
      SELECT p_brand, sum(cast(l_extendedprice AS decimal(38,9))) AS total_sales
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND l_returnflag = 'A' AND p_size BETWEEN 1 AND 20
      GROUP BY p_brand
    ),
    flag_n AS (
      SELECT p_brand, sum(cast(l_extendedprice AS decimal(38,9))) AS total_sales
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND l_returnflag = 'N' AND p_size BETWEEN 1 AND 20
      GROUP BY p_brand
    ),
    flag_r AS (
      SELECT p_brand, sum(cast(l_extendedprice AS decimal(38,9))) AS total_sales
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND l_returnflag = 'R' AND p_size BETWEEN 1 AND 20
      GROUP BY p_brand
    )
    SELECT p_brand,
           cast(round(sum(total_sales), 2) AS double) AS total_sales
    FROM (SELECT * FROM flag_a UNION ALL SELECT * FROM flag_n UNION ALL SELECT * FROM flag_r) u
    GROUP BY p_brand
    ORDER BY total_sales DESC, p_brand
    LIMIT 100
"""

# --- q47/q57-shape: window rank + lag + lead over a monthly aggregate ------
_SQL_NEW["tpcds_q47"] = """
    WITH monthly AS (
      SELECT p_brand,
             year(o_orderdate) AS yr,
             month(o_orderdate) AS moy,
             sum(cast(l_extendedprice AS decimal(38,9))) AS sum_sales
      FROM lineitem, orders, part
      WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
        AND p_type IN ('STANDARD', 'PROMO')
      GROUP BY p_brand, year(o_orderdate), month(o_orderdate)
    ),
    v1 AS (
      SELECT p_brand, yr, moy, sum_sales,
             avg(sum_sales) OVER (PARTITION BY p_brand, yr) AS avg_monthly_sales,
             rank() OVER (PARTITION BY p_brand ORDER BY yr, moy) AS rn,
             lag(sum_sales) OVER (PARTITION BY p_brand ORDER BY yr, moy) AS psum,
             lead(sum_sales) OVER (PARTITION BY p_brand ORDER BY yr, moy) AS nsum
      FROM monthly
    )
    SELECT p_brand, yr, moy,
           cast(round(sum_sales, 2) AS double) AS sum_sales,
           cast(round(avg_monthly_sales, 2) AS double) AS avg_monthly_sales,
           cast(rn AS bigint) AS rn,
           cast(round(psum, 2) AS double) AS psum,
           cast(round(nsum, 2) AS double) AS nsum
    FROM v1
    WHERE yr = 1997
      AND avg_monthly_sales > 0
      AND abs(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.1
    ORDER BY sum_sales - avg_monthly_sales, p_brand, yr, moy
    LIMIT 100
"""

# --- q51-shape: cumulative windows from two channels, full outer join ------
_SQL_NEW["tpcds_q51"] = """
    WITH store_v AS (
      SELECT p_brand, month(o_orderdate) AS moy,
             sum(cast(l_extendedprice AS decimal(38,9))) AS sales
      FROM lineitem, orders, part
      WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
        AND o_orderstatus = 'F' AND year(o_orderdate) = 1996
      GROUP BY p_brand, month(o_orderdate)
    ),
    web_v AS (
      SELECT p_brand, month(o_orderdate) AS moy,
             sum(cast(l_extendedprice AS decimal(38,9))) AS sales
      FROM lineitem, orders, part
      WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
        AND o_orderstatus = 'O' AND year(o_orderdate) = 1996
      GROUP BY p_brand, month(o_orderdate)
    ),
    merged AS (
      SELECT coalesce(s.p_brand, w.p_brand) AS brand,
             coalesce(s.moy, w.moy) AS moy,
             s.sales AS store_sales,
             w.sales AS web_sales
      FROM store_v s FULL OUTER JOIN web_v w
        ON s.p_brand = w.p_brand AND s.moy = w.moy
    ),
    cume AS (
      SELECT brand, moy,
             sum(store_sales) OVER (PARTITION BY brand ORDER BY moy
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS store_cume,
             sum(web_sales) OVER (PARTITION BY brand ORDER BY moy
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS web_cume
      FROM merged
    )
    SELECT brand, moy,
           cast(round(store_cume, 2) AS double) AS store_cume,
           cast(round(web_cume, 2) AS double) AS web_cume
    FROM cume
    WHERE web_cume > store_cume
    ORDER BY brand, moy
    LIMIT 100
"""

# --- q70-shape: ROLLUP + rank partitioned by grouping level ----------------
# Pre-aggregated at the finest grain BEFORE the rollup Expand (same trick as
# q5/q36/q67): the Expand then triples ~|region × nation| grouped rows
# instead of every joined lineitem row.  Decimal sums re-aggregate exactly,
# so the result is bit-identical to rolling up the raw rows (verified
# row-for-row against the unsplit form at sf0.001/0.01/0.1 in round 11).
_SQL_NEW["tpcds_q70"] = """
    SELECT cast(round(total_sum, 2) AS double) AS total_sum,
           r_name, n_name, lochierarchy, rk
    FROM (
      SELECT sum(pre_sum) AS total_sum,
             r_name, n_name,
             grouping(r_name) + grouping(n_name) AS lochierarchy,
             cast(rank() OVER (
               PARTITION BY grouping(r_name) + grouping(n_name),
                            CASE WHEN grouping(n_name) = 1 THEN r_name END
               ORDER BY sum(pre_sum) DESC
             ) AS bigint) AS rk
      FROM (
        SELECT r_name, n_name,
               sum(cast(l_extendedprice AS decimal(38,9))) AS pre_sum
        FROM lineitem, supplier, nation, region
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
        GROUP BY r_name, n_name
      ) pre
      GROUP BY ROLLUP (r_name, n_name)
    ) t
    ORDER BY lochierarchy DESC,
             CASE WHEN lochierarchy = 0 THEN r_name END,
             rk, r_name NULLS FIRST, n_name NULLS FIRST
    LIMIT 100
"""

# --- q88-shape: scalar count subqueries cross-joined -----------------------
_SQL_NEW["tpcds_q88"] = """
    SELECT * FROM
      (SELECT cast(count(*) AS bigint) AS h1 FROM lineitem
       WHERE l_quantity BETWEEN 1 AND 10 AND l_discount < 0.05) s1,
      (SELECT cast(count(*) AS bigint) AS h2 FROM lineitem
       WHERE l_quantity BETWEEN 11 AND 20 AND l_discount < 0.05) s2,
      (SELECT cast(count(*) AS bigint) AS h3 FROM lineitem
       WHERE l_quantity BETWEEN 21 AND 30 AND l_discount < 0.05) s3,
      (SELECT cast(count(*) AS bigint) AS h4 FROM lineitem
       WHERE l_quantity BETWEEN 31 AND 40 AND l_discount < 0.05) s4,
      (SELECT cast(count(*) AS bigint) AS h5 FROM lineitem
       WHERE l_quantity BETWEEN 1 AND 10 AND l_discount >= 0.05) s5,
      (SELECT cast(count(*) AS bigint) AS h6 FROM lineitem
       WHERE l_quantity BETWEEN 11 AND 20 AND l_discount >= 0.05) s6,
      (SELECT cast(count(*) AS bigint) AS h7 FROM lineitem
       WHERE l_quantity BETWEEN 21 AND 30 AND l_discount >= 0.05) s7,
      (SELECT cast(count(*) AS bigint) AS h8 FROM lineitem
       WHERE l_quantity BETWEEN 31 AND 40 AND l_discount >= 0.05) s8
"""

# --- q95-shape: orders with >=2 suppliers, none returned, in a window ------
_SQL_NEW["tpcds_q95"] = """
    WITH multi_supp AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING count(DISTINCT l_suppkey) >= 2
    )
    SELECT cast(count(DISTINCT o_orderkey) AS bigint) AS order_count,
           cast(round(sum(cast(o_totalprice AS decimal(38,9))), 2) AS double)
                AS total_price
    FROM orders
    WHERE year(o_orderdate) = 1997
      AND o_orderkey IN (SELECT l_orderkey FROM multi_supp)
      AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
"""

for _name, _sql in _SQL_NEW.items():
    _register(_name, _sql)



# =========================================================================
# Full-set TPC-DS shapes, second batch:
# - q38/q87: INTERSECT / EXCEPT chains over per-channel customer sets
#   (distinct-set operations planned as semi/anti joins);
# - q97: FULL OUTER join of two distinct (customer, item) channel sets with
#   conditional-count overlap buckets;
# - q39: statistical filter (coefficient of variation via stddev_samp/avg)
#   + month-pair self-join;
# - q75: year-over-year decline by brand across UNION ALLed channels.
# =========================================================================
_SQL_NEW2: dict[str, str] = {}

# --- q38-shape: INTERSECT of per-channel customer sets ---------------------
_SQL_NEW2["tpcds_q38"] = """
    SELECT cast(count(*) AS bigint) AS n_loyal
    FROM (
      SELECT o_custkey FROM orders, lineitem
      WHERE l_orderkey = o_orderkey AND l_returnflag = 'A'
        AND year(o_orderdate) = 1996
      INTERSECT
      SELECT o_custkey FROM orders, lineitem
      WHERE l_orderkey = o_orderkey AND l_returnflag = 'N'
        AND year(o_orderdate) = 1996
      INTERSECT
      SELECT o_custkey FROM orders, lineitem
      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
        AND year(o_orderdate) = 1996
    ) hot
"""

# --- q87-shape: EXCEPT chain (customers in one channel but not others) -----
_SQL_NEW2["tpcds_q87"] = """
    SELECT cast(count(*) AS bigint) AS n_exclusive
    FROM (
      SELECT o_custkey FROM orders, lineitem
      WHERE l_orderkey = o_orderkey AND l_returnflag = 'A'
        AND year(o_orderdate) = 1996
      EXCEPT
      SELECT o_custkey FROM orders, lineitem
      WHERE l_orderkey = o_orderkey AND l_returnflag = 'N'
        AND year(o_orderdate) = 1996
      EXCEPT
      SELECT o_custkey FROM orders, lineitem
      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
        AND year(o_orderdate) = 1996
    ) ex
"""

# --- q97-shape: full outer join of channel customer-part sets --------------
_SQL_NEW2["tpcds_q97"] = """
    WITH ssci AS (
      SELECT DISTINCT o_custkey AS customer_sk, l_partkey AS item_sk
      FROM orders, lineitem
      WHERE l_orderkey = o_orderkey AND o_orderstatus = 'F'
    ),
    csci AS (
      SELECT DISTINCT o_custkey AS customer_sk, l_partkey AS item_sk
      FROM orders, lineitem
      WHERE l_orderkey = o_orderkey AND o_orderstatus = 'O'
    )
    SELECT cast(sum(CASE WHEN ssci.customer_sk IS NOT NULL
                          AND csci.customer_sk IS NULL THEN 1 ELSE 0 END) AS bigint)
             AS store_only,
           cast(sum(CASE WHEN ssci.customer_sk IS NULL
                          AND csci.customer_sk IS NOT NULL THEN 1 ELSE 0 END) AS bigint)
             AS catalog_only,
           cast(sum(CASE WHEN ssci.customer_sk IS NOT NULL
                          AND csci.customer_sk IS NOT NULL THEN 1 ELSE 0 END) AS bigint)
             AS store_and_catalog
    FROM ssci FULL OUTER JOIN csci
      ON ssci.customer_sk = csci.customer_sk AND ssci.item_sk = csci.item_sk
"""

# --- q39-shape: mean/stdev coefficient-of-variation filter + month self-join
_SQL_NEW2["tpcds_q39"] = """
    WITH inv AS (
      SELECT l_suppkey, month(l_shipdate) AS moy,
             stddev_samp(l_quantity) AS stdev, avg(l_quantity) AS mean
      FROM lineitem
      WHERE year(l_shipdate) = 1996
      GROUP BY l_suppkey, month(l_shipdate)
    ),
    flagged AS (
      SELECT l_suppkey, moy,
             round(CASE WHEN mean = 0 THEN NULL ELSE stdev / mean END, 4) AS cov
      FROM inv
      WHERE CASE WHEN mean = 0 THEN 0 ELSE stdev / mean END > 0.5
    )
    SELECT i1.l_suppkey, i1.moy AS moy1, i1.cov AS cov1,
           i2.moy AS moy2, i2.cov AS cov2
    FROM flagged i1, flagged i2
    WHERE i1.l_suppkey = i2.l_suppkey
      AND i1.moy = 3 AND i2.moy = 4
    ORDER BY i1.l_suppkey
    LIMIT 100
"""

# --- q75-shape: year-over-year decline by brand across unioned channels ----
_SQL_NEW2["tpcds_q75"] = """
    WITH all_sales AS (
      SELECT yr, p_brand,
             sum(cnt) AS sales_cnt,
             sum(amt) AS sales_amt
      FROM (
        SELECT year(o_orderdate) AS yr, p_brand,
               count(*) AS cnt,
               sum(cast(l_extendedprice AS decimal(38,9))) AS amt
        FROM lineitem, orders, part
        WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
          AND o_orderstatus = 'F'
        GROUP BY year(o_orderdate), p_brand
        UNION ALL
        SELECT year(o_orderdate) AS yr, p_brand,
               count(*) AS cnt,
               sum(cast(l_extendedprice AS decimal(38,9))) AS amt
        FROM lineitem, orders, part
        WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
          AND o_orderstatus = 'O'
        GROUP BY year(o_orderdate), p_brand
      ) u
      GROUP BY yr, p_brand
    )
    SELECT cur.p_brand,
           cast(prev.sales_cnt AS bigint) AS prev_cnt,
           cast(cur.sales_cnt AS bigint) AS cur_cnt,
           cast(cur.sales_cnt - prev.sales_cnt AS bigint) AS cnt_diff,
           cast(round(cur.sales_amt - prev.sales_amt, 2) AS double) AS amt_diff
    FROM all_sales cur, all_sales prev
    WHERE cur.p_brand = prev.p_brand
      AND cur.yr = 1997 AND prev.yr = 1996
      AND cur.sales_cnt < prev.sales_cnt
    ORDER BY cnt_diff, amt_diff, cur.p_brand
    LIMIT 100
"""

for _name, _sql in _SQL_NEW2.items():
    _register(_name, _sql)

# --- round 2: 15 more full-set shapes ---------------------------------------
# The driver schema has no l_shipmode / l_receiptdate / l_commitdate, so
# "channel" is modeled with l_linestatus ('O'/'F': web/store) or
# l_returnflag ('A'/'N'/'R': three channels) and shipping latency with the
# month gap between o_orderdate and l_shipdate.  Shapes map 1:1 to the
# reference's full TPC-DS set (resources/tpcds/).
_SQL_NEW3: dict[str, str] = {}

# q4: year-over-year growth ratio compared ACROSS two channels — the
# 4-way self-join of a per-(customer, year, channel) aggregate CTE, keeping
# customers whose web growth outpaces store growth (ratio-of-ratios).
_SQL_NEW3["tpcds_q4"] = """
    WITH year_total AS (
      SELECT c_custkey,
             c_name,
             year(o_orderdate) AS yr,
             l_linestatus AS channel,
             cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2)
                  AS double) AS total
      FROM customer, orders, lineitem
      WHERE c_custkey = o_custkey
        AND o_orderkey = l_orderkey
        AND year(o_orderdate) IN (1996, 1997)
      GROUP BY c_custkey, c_name, year(o_orderdate), l_linestatus
    )
    SELECT ts1.c_custkey, ts1.c_name,
           round(cast(tw2.total AS double) / tw1.total, 6) AS web_growth,
           round(cast(ts2.total AS double) / ts1.total, 6) AS store_growth
    FROM year_total ts1, year_total ts2, year_total tw1, year_total tw2
    WHERE ts1.c_custkey = ts2.c_custkey
      AND ts1.c_custkey = tw1.c_custkey
      AND ts1.c_custkey = tw2.c_custkey
      AND ts1.channel = 'F' AND ts2.channel = 'F'
      AND tw1.channel = 'O' AND tw2.channel = 'O'
      AND ts1.yr = 1996 AND ts2.yr = 1997
      AND tw1.yr = 1996 AND tw2.yr = 1997
      AND ts1.total > 0 AND tw1.total > 0
      AND cast(tw2.total AS double) / tw1.total
          > cast(ts2.total AS double) / ts1.total
    ORDER BY ts1.c_custkey, ts1.c_name
    LIMIT 100
    """

# q5: per-channel sales/returns/profit report rolled up over nation
# (UNION-of-channels × ROLLUP; grouping NULLs rewritten via grouping() for
# cross-engine-stable output).
_SQL_NEW3["tpcds_q5"] = """
    SELECT CASE WHEN grouping(channel) = 1 THEN 'ALL' ELSE channel END AS channel,
           CASE WHEN grouping(n_name) = 1 THEN 'ALL' ELSE n_name END AS nation,
           cast(round(sum(sales), 2) AS double) AS sales,
           cast(round(sum(returns_), 2) AS double) AS returns_,
           cast(round(sum(profit), 2) AS double) AS profit
    FROM (
      -- pre-aggregate per (channel, nation) BEFORE the rollup Expand: sum is
      -- re-aggregatable in exact decimal, so the Expand doubles ~50 grouped
      -- rows instead of every joined lineitem row (same trick as q36/q67)
      SELECT CASE WHEN l_linestatus = 'O' THEN 'web' ELSE 'store' END AS channel,
             n_name,
             sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))) AS sales,
             sum(CASE WHEN l_returnflag = 'R'
                  THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))
                  ELSE cast(0 AS decimal(38,9)) END) AS returns_,
             sum(cast(l_extendedprice * (1 - l_discount) - l_quantity * 100
                  AS decimal(38,9))) AS profit
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey
        AND s_nationkey = n_nationkey
      GROUP BY channel, n_name
    ) all_sales
    GROUP BY ROLLUP(channel, n_name)
    ORDER BY channel, nation
    """

# q6: nations whose customers buy items priced >= 1.2x the average of the
# item's type (correlated scalar subquery in the WHERE), count >= 10.
_SQL_NEW3["tpcds_q6"] = """
    SELECT n_name, cast(count(*) AS bigint) AS cnt
    FROM customer, nation, orders, lineitem, part p1
    WHERE c_nationkey = n_nationkey
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND l_partkey = p1.p_partkey
      AND year(o_orderdate) = 1997
      AND p1.p_retailprice > 1.2 * (
            SELECT avg(p2.p_retailprice) FROM part p2
            WHERE p2.p_type = p1.p_type)
    GROUP BY n_name
    HAVING count(*) >= 10
    ORDER BY cnt, n_name
    LIMIT 100
    """

# q9: five quantity-band buckets, each choosing between two scalar
# subqueries by a count threshold (CASE WHEN over correlated-free scalar
# subqueries, evaluated from a single-row driver table).
_SQL_NEW3["tpcds_q9"] = """
    SELECT CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) > 12000
                THEN (SELECT cast(round(avg(l_extendedprice), 2) AS double)
                      FROM lineitem WHERE l_quantity BETWEEN 1 AND 10)
                ELSE (SELECT cast(round(avg(l_discount) * 100000, 2) AS double)
                      FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) END AS bucket1,
           CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) > 12000
                THEN (SELECT cast(round(avg(l_extendedprice), 2) AS double)
                      FROM lineitem WHERE l_quantity BETWEEN 11 AND 20)
                ELSE (SELECT cast(round(avg(l_discount) * 100000, 2) AS double)
                      FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) END AS bucket2,
           CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) > 12000
                THEN (SELECT cast(round(avg(l_extendedprice), 2) AS double)
                      FROM lineitem WHERE l_quantity BETWEEN 21 AND 30)
                ELSE (SELECT cast(round(avg(l_discount) * 100000, 2) AS double)
                      FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) END AS bucket3,
           CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) > 12000
                THEN (SELECT cast(round(avg(l_extendedprice), 2) AS double)
                      FROM lineitem WHERE l_quantity BETWEEN 31 AND 40)
                ELSE (SELECT cast(round(avg(l_discount) * 100000, 2) AS double)
                      FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) END AS bucket4,
           CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) > 12000
                THEN (SELECT cast(round(avg(l_extendedprice), 2) AS double)
                      FROM lineitem WHERE l_quantity BETWEEN 41 AND 50)
                ELSE (SELECT cast(round(avg(l_discount) * 100000, 2) AS double)
                      FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) END AS bucket5
    FROM region
    WHERE r_regionkey = 0
    """

# q17: sold-vs-returned quantity statistics per brand — two aggregate legs
# (returnflag N / R) joined on the brand key, coefficient of variation on
# each leg plus the return-rate ratio across legs.
_SQL_NEW3["tpcds_q17"] = """
    WITH sold AS (
      SELECT p_brand,
             cast(count(*) AS bigint) AS sold_cnt,
             round(avg(l_quantity), 4) AS sold_mean,
             round(stddev_samp(l_quantity), 4) AS sold_stdev
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND l_returnflag = 'N'
      GROUP BY p_brand
    ),
    returned AS (
      SELECT p_brand,
             cast(count(*) AS bigint) AS ret_cnt,
             round(avg(l_quantity), 4) AS ret_mean,
             round(stddev_samp(l_quantity), 4) AS ret_stdev
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND l_returnflag = 'R'
      GROUP BY p_brand
    )
    SELECT sold.p_brand,
           sold_cnt, sold_mean,
           round(sold_stdev / sold_mean, 4) AS sold_cov,
           ret_cnt, ret_mean,
           round(ret_stdev / ret_mean, 4) AS ret_cov,
           round(cast(ret_cnt AS double) / sold_cnt, 4) AS return_rate
    FROM sold, returned
    WHERE sold.p_brand = returned.p_brand
    ORDER BY sold.p_brand
    LIMIT 100
    """

# q21: quantity shipped before/after a pivot date per (supplier-nation,
# brand), kept when the after/before ratio stays within [2/3, 3/2].
_SQL_NEW3["tpcds_q21"] = """
    SELECT n_name, p_brand, inv_before, inv_after
    FROM (
      SELECT n_name, p_brand,
             cast(sum(CASE WHEN l_shipdate < DATE '1997-07-01'
                           THEN l_quantity ELSE 0 END) AS bigint) AS inv_before,
             cast(sum(CASE WHEN l_shipdate >= DATE '1997-07-01'
                           THEN l_quantity ELSE 0 END) AS bigint) AS inv_after
      FROM lineitem, supplier, nation, part
      WHERE l_suppkey = s_suppkey
        AND s_nationkey = n_nationkey
        AND l_partkey = p_partkey
        AND l_shipdate BETWEEN DATE '1997-05-01' AND DATE '1997-08-31'
      GROUP BY n_name, p_brand
    ) x
    WHERE inv_before > 0
      -- ratio in [2/3, 3/2] via exact integer arithmetic: Spark parses the
      -- literal 2.0/3.0 as DECIMAL division (0.666667) while DuckDB uses
      -- double (0.6666666...), which flips rows landing exactly on 2/3
      AND 2 * inv_before <= 3 * inv_after
      AND 2 * inv_after <= 3 * inv_before
    ORDER BY n_name, p_brand
    LIMIT 100
    """

# q28: six price-band buckets, each computing avg / count / count-distinct
# under an OR of band predicates, cross-joined into one row.
_SQL_NEW3["tpcds_q28"] = """
    SELECT b1.avg1, b1.cnt1, b1.cntd1,
           b2.avg2, b2.cnt2, b2.cntd2,
           b3.avg3, b3.cnt3, b3.cntd3,
           b4.avg4, b4.cnt4, b4.cntd4,
           b5.avg5, b5.cnt5, b5.cntd5,
           b6.avg6, b6.cnt6, b6.cntd6
    FROM
      (SELECT cast(round(avg(l_extendedprice), 2) AS double) AS avg1,
              cast(count(*) AS bigint) AS cnt1,
              cast(count(DISTINCT l_partkey) AS bigint) AS cntd1
       FROM lineitem WHERE l_quantity BETWEEN 1 AND 8
         AND (l_extendedprice BETWEEN 10000 AND 40000
           OR l_discount BETWEEN 0.00 AND 0.03
           OR l_tax BETWEEN 0.05 AND 0.08)) b1,
      (SELECT cast(round(avg(l_extendedprice), 2) AS double) AS avg2,
              cast(count(*) AS bigint) AS cnt2,
              cast(count(DISTINCT l_partkey) AS bigint) AS cntd2
       FROM lineitem WHERE l_quantity BETWEEN 9 AND 16
         AND (l_extendedprice BETWEEN 20000 AND 50000
           OR l_discount BETWEEN 0.02 AND 0.05
           OR l_tax BETWEEN 0.04 AND 0.07)) b2,
      (SELECT cast(round(avg(l_extendedprice), 2) AS double) AS avg3,
              cast(count(*) AS bigint) AS cnt3,
              cast(count(DISTINCT l_partkey) AS bigint) AS cntd3
       FROM lineitem WHERE l_quantity BETWEEN 17 AND 24
         AND (l_extendedprice BETWEEN 30000 AND 60000
           OR l_discount BETWEEN 0.04 AND 0.07
           OR l_tax BETWEEN 0.03 AND 0.06)) b3,
      (SELECT cast(round(avg(l_extendedprice), 2) AS double) AS avg4,
              cast(count(*) AS bigint) AS cnt4,
              cast(count(DISTINCT l_partkey) AS bigint) AS cntd4
       FROM lineitem WHERE l_quantity BETWEEN 25 AND 32
         AND (l_extendedprice BETWEEN 40000 AND 70000
           OR l_discount BETWEEN 0.06 AND 0.09
           OR l_tax BETWEEN 0.02 AND 0.05)) b4,
      (SELECT cast(round(avg(l_extendedprice), 2) AS double) AS avg5,
              cast(count(*) AS bigint) AS cnt5,
              cast(count(DISTINCT l_partkey) AS bigint) AS cntd5
       FROM lineitem WHERE l_quantity BETWEEN 33 AND 40
         AND (l_extendedprice BETWEEN 50000 AND 80000
           OR l_discount BETWEEN 0.08 AND 0.10
           OR l_tax BETWEEN 0.01 AND 0.04)) b5,
      (SELECT cast(round(avg(l_extendedprice), 2) AS double) AS avg6,
              cast(count(*) AS bigint) AS cnt6,
              cast(count(DISTINCT l_partkey) AS bigint) AS cntd6
       FROM lineitem WHERE l_quantity BETWEEN 41 AND 50
         AND (l_extendedprice BETWEEN 60000 AND 90000
           OR l_discount BETWEEN 0.00 AND 0.02
           OR l_tax BETWEEN 0.00 AND 0.03)) b6
    """

# q31: quarter-over-quarter growth compared across channels — per
# (nation, quarter) revenue CTEs for web/store, 6-way join keeping nations
# where web growth beats store growth in BOTH consecutive transitions.
_SQL_NEW3["tpcds_q31"] = """
    WITH rev AS (
      SELECT n_name,
             quarter(o_orderdate) AS qtr,
             l_linestatus AS channel,
             cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2)
                  AS double) AS total
      FROM lineitem, orders, customer, nation
      WHERE l_orderkey = o_orderkey
        AND o_custkey = c_custkey
        AND c_nationkey = n_nationkey
        AND year(o_orderdate) = 1996
        AND quarter(o_orderdate) <= 3
      GROUP BY n_name, quarter(o_orderdate), l_linestatus
    )
    SELECT ss1.n_name,
           round(cast(ws2.total AS double) / ws1.total, 6) AS web_q1_q2,
           round(cast(ss2.total AS double) / ss1.total, 6) AS store_q1_q2,
           round(cast(ws3.total AS double) / ws2.total, 6) AS web_q2_q3,
           round(cast(ss3.total AS double) / ss2.total, 6) AS store_q2_q3
    FROM rev ss1, rev ss2, rev ss3, rev ws1, rev ws2, rev ws3
    WHERE ss1.n_name = ss2.n_name AND ss1.n_name = ss3.n_name
      AND ss1.n_name = ws1.n_name AND ss1.n_name = ws2.n_name
      AND ss1.n_name = ws3.n_name
      AND ss1.channel = 'F' AND ss2.channel = 'F' AND ss3.channel = 'F'
      AND ws1.channel = 'O' AND ws2.channel = 'O' AND ws3.channel = 'O'
      AND ss1.qtr = 1 AND ss2.qtr = 2 AND ss3.qtr = 3
      AND ws1.qtr = 1 AND ws2.qtr = 2 AND ws3.qtr = 3
      AND ss1.total > 0 AND ss2.total > 0 AND ws1.total > 0 AND ws2.total > 0
      AND cast(ws2.total AS double) / ws1.total
          > cast(ss2.total AS double) / ss1.total
      AND cast(ws3.total AS double) / ws2.total
          > cast(ss3.total AS double) / ss2.total
    ORDER BY ss1.n_name
    """

# q44: best and worst performing items side-by-side — two opposite-order
# rank() subqueries over one per-part aggregate, joined on the rank.
_SQL_NEW3["tpcds_q44"] = """
    WITH perf AS (
      SELECT l_partkey,
             cast(round(avg(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2)
                  AS double) AS avg_rev
      FROM lineitem
      GROUP BY l_partkey
    ),
    best AS (
      SELECT l_partkey, rank() OVER (ORDER BY avg_rev DESC, l_partkey) AS rnk
      FROM perf
    ),
    worst AS (
      SELECT l_partkey, rank() OVER (ORDER BY avg_rev ASC, l_partkey) AS rnk
      FROM perf
    )
    SELECT best.rnk,
           p1.p_name AS best_performing,
           p2.p_name AS worst_performing
    FROM best, worst, part p1, part p2
    WHERE best.rnk <= 10 AND worst.rnk <= 10
      AND best.rnk = worst.rnk
      AND p1.p_partkey = best.l_partkey
      AND p2.p_partkey = worst.l_partkey
    ORDER BY best.rnk
    """

# q48: one flat aggregate under a disjunction of three (segment ×
# price-band × nation-set) conjunctions.
_SQL_NEW3["tpcds_q48"] = """
    SELECT cast(sum(l_quantity) AS bigint) AS total_quantity
    FROM lineitem, orders, customer, nation
    WHERE l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND c_nationkey = n_nationkey
      AND ((c_mktsegment = 'BUILDING'
            AND o_totalprice BETWEEN 50000 AND 150000
            AND n_name IN ('NATION_0', 'NATION_3', 'NATION_6'))
        OR (c_mktsegment = 'MACHINERY'
            AND o_totalprice BETWEEN 100000 AND 250000
            AND n_name IN ('NATION_1', 'NATION_4', 'NATION_7'))
        OR (c_mktsegment = 'AUTOMOBILE'
            AND o_totalprice BETWEEN 150000 AND 400000
            AND n_name IN ('NATION_2', 'NATION_5', 'NATION_8')))
    """

# q49: worst return ratios per channel — per-(channel, part) returned/sold
# ratio, dense ranked within channel, top 10 reported for both channels.
_SQL_NEW3["tpcds_q49"] = """
    SELECT channel, l_partkey, ret_ratio, rnk
    FROM (
      SELECT channel, l_partkey, ret_ratio,
             rank() OVER (PARTITION BY channel
                          ORDER BY ret_ratio DESC, l_partkey) AS rnk
      FROM (
        SELECT l_linestatus AS channel,
               l_partkey,
               round(cast(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END)
                          AS double)
                     / sum(l_quantity), 6) AS ret_ratio
        FROM lineitem
        GROUP BY l_linestatus, l_partkey
        HAVING sum(l_quantity) >= 100
      ) ratios
    ) ranked
    WHERE rnk <= 10
    ORDER BY channel, rnk, l_partkey
    """

# q54: customer revenue segmentation — per-customer revenue bucketed into
# 5000-wide segments, counting customers per segment.
_SQL_NEW3["tpcds_q54"] = """
    SELECT segment,
           cast(count(*) AS bigint) AS num_customers,
           segment * 5000 AS segment_base
    FROM (
      SELECT o_custkey,
             cast(floor(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)))
                        / 5000) AS bigint) AS segment
      FROM lineitem, orders
      WHERE l_orderkey = o_orderkey
        AND year(o_orderdate) = 1997
      GROUP BY o_custkey
    ) segs
    GROUP BY segment
    ORDER BY segment
    LIMIT 100
    """

# q58: brands whose three return-flag-channel revenues are mutually within
# 10% of the cross-channel average (three aggregate legs joined pairwise).
_SQL_NEW3["tpcds_q58"] = """
    WITH rev AS (
      SELECT p_brand, l_returnflag AS channel,
             cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2)
                  AS double) AS total
      FROM lineitem, part
      WHERE l_partkey = p_partkey
      GROUP BY p_brand, l_returnflag
    )
    SELECT a.p_brand,
           a.total AS a_rev, n.total AS n_rev, r.total AS r_rev,
           round((a.total + n.total + r.total) / 3, 2) AS average
    FROM rev a, rev n, rev r
    WHERE a.p_brand = n.p_brand AND a.p_brand = r.p_brand
      AND a.channel = 'A' AND n.channel = 'N' AND r.channel = 'R'
      AND a.total BETWEEN 0.9 * (a.total + n.total + r.total) / 3
                      AND 1.1 * (a.total + n.total + r.total) / 3
      AND n.total BETWEEN 0.9 * (a.total + n.total + r.total) / 3
                      AND 1.1 * (a.total + n.total + r.total) / 3
      AND r.total BETWEEN 0.9 * (a.total + n.total + r.total) / 3
                      AND 1.1 * (a.total + n.total + r.total) / 3
    ORDER BY a.p_brand
    LIMIT 100
    """

# q62: shipping-latency bucket pivot — months between order and ship date
# bucketed into a conditional-sum pivot per (priority, nation "warehouse").
_SQL_NEW3["tpcds_q62"] = """
    SELECT o_orderpriority, n_name,
           cast(sum(CASE WHEN gap_months <= 0 THEN 1 ELSE 0 END) AS bigint) AS same_month,
           cast(sum(CASE WHEN gap_months = 1 THEN 1 ELSE 0 END) AS bigint) AS next_month,
           cast(sum(CASE WHEN gap_months = 2 THEN 1 ELSE 0 END) AS bigint) AS two_months,
           cast(sum(CASE WHEN gap_months >= 3 THEN 1 ELSE 0 END) AS bigint) AS three_plus
    FROM (
      SELECT o_orderpriority, s_nationkey,
             (year(l_shipdate) * 12 + month(l_shipdate))
             - (year(o_orderdate) * 12 + month(o_orderdate)) AS gap_months
      FROM lineitem, orders, supplier
      WHERE l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey
        AND year(o_orderdate) = 1997
    ) g, nation
    WHERE g.s_nationkey = n_nationkey
    GROUP BY o_orderpriority, n_name
    ORDER BY o_orderpriority, n_name
    LIMIT 100
    """

# q90: am/pm ratio — two disjoint hour-band counts from the events table,
# cross-joined into a single ratio row.
_SQL_NEW3["tpcds_q90"] = """
    SELECT round(cast(am_cnt AS double) / pm_cnt, 6) AS am_pm_ratio,
           cast(am_cnt AS bigint) AS am_cnt,
           cast(pm_cnt AS bigint) AS pm_cnt
    FROM (SELECT count(*) AS am_cnt FROM events
          WHERE hour(ts) BETWEEN 6 AND 11) am,
         (SELECT count(*) AS pm_cnt FROM events
          WHERE hour(ts) BETWEEN 15 AND 20) pm
    """

for _name, _sql in _SQL_NEW3.items():
    _register(_name, _sql)

# --- round 2b: 8 more full-set shapes ---------------------------------------
_SQL_NEW4: dict[str, str] = {}

# q7: flat demographic star aggregate — four averages per item under
# segment + priority dimension filters.
_SQL_NEW4["tpcds_q7"] = """
    SELECT p_brand,
           round(avg(l_quantity), 4) AS agg1,
           cast(round(avg(cast(l_extendedprice AS decimal(38,9))), 2) AS double) AS agg2,
           round(avg(l_discount), 6) AS agg3,
           cast(round(avg(cast(l_extendedprice * l_tax AS decimal(38,9))), 2) AS double) AS agg4
    FROM lineitem, orders, customer, part
    WHERE l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND l_partkey = p_partkey
      AND c_mktsegment = 'BUILDING'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY p_brand
    ORDER BY p_brand
    LIMIT 100
    """

# q15: revenue by customer "zip" (name-suffix code) under an OR of three
# qualification predicates (code list / balance / nation set).
_SQL_NEW4["tpcds_q15"] = """
    SELECT zip, cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2)
                     AS double) AS total_sales
    FROM (
      SELECT substring(c_name, 17, 2) AS zip, c_custkey, c_nationkey, c_acctbal
      FROM customer
    ) c, nation, orders, lineitem
    WHERE c.c_nationkey = n_nationkey
      AND c.c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND year(o_orderdate) = 1997 AND quarter(o_orderdate) = 1
      AND (zip IN ('10', '25', '40', '55', '70')
        OR c_acctbal > 9000
        OR n_name IN ('NATION_3', 'NATION_9', 'NATION_17'))
    GROUP BY zip
    ORDER BY zip
    LIMIT 100
    """

# q36: gross-margin ratio over a ROLLUP hierarchy with rank within each
# grouping level (lochierarchy = grouping(p_type)+grouping(p_brand)).
_SQL_NEW4["tpcds_q36"] = """
    WITH pre AS (
      -- pre-aggregate at the finest grain BEFORE the rollup Expand: the
      -- Expand then multiplies |type x brand| rows, not |lineitem| rows
      -- (decimal sums re-aggregate exactly)
      SELECT p_type, p_brand,
             sum(cast(l_extendedprice * (1 - l_discount) - l_quantity * 100
                      AS decimal(38,9))) AS margin_s,
             sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))) AS gross_s
      FROM lineitem, part
      WHERE l_partkey = p_partkey
      GROUP BY p_type, p_brand
    ),
    agg AS (
      SELECT CASE WHEN grouping(p_type) = 1 THEN 'ALL' ELSE p_type END AS pt,
             CASE WHEN grouping(p_brand) = 1 THEN 'ALL' ELSE p_brand END AS pb,
             grouping(p_type) + grouping(p_brand) AS lochierarchy,
             round(cast(sum(margin_s) AS double)
                   / cast(sum(gross_s) AS double), 6) AS gross_margin
      FROM pre
      GROUP BY ROLLUP(p_type, p_brand)
    )
    SELECT pt, pb, lochierarchy, gross_margin,
           rank() OVER (PARTITION BY lochierarchy,
                                     CASE WHEN lochierarchy = 0 THEN pt END
                        ORDER BY gross_margin ASC, pb) AS rank_within_parent
    FROM agg
    ORDER BY lochierarchy DESC, pt, rank_within_parent, pb
    LIMIT 100
    """

# q45: revenue by zip gated by (zip IN literal-list OR custkey IN
# subquery) — the IN-subquery inside a disjunction plans as an
# existence join, the null-aware cousin of q10's EXISTS gating.
_SQL_NEW4["tpcds_q45"] = """
    SELECT zip, cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2)
                     AS double) AS total_sales
    FROM (
      SELECT substring(c_name, 17, 2) AS zip, c_custkey
      FROM customer
    ) c, orders, lineitem
    WHERE c.c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND year(o_orderdate) = 1997
      AND (zip IN ('10', '25', '40', '55', '70')
        OR c.c_custkey IN (SELECT o_custkey FROM orders
                           WHERE o_totalprice > 400000))
    GROUP BY zip
    ORDER BY zip
    LIMIT 100
    """

# q61: promotional-to-total revenue ratio — two single-row aggregate legs
# cross-joined into one ratio row.
_SQL_NEW4["tpcds_q61"] = """
    SELECT promotions, total,
           round(cast(promotions AS double) / total * 100, 6) AS promo_pct
    FROM
      (SELECT cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2)
                   AS double) AS promotions
       FROM lineitem, part
       WHERE l_partkey = p_partkey
         AND p_type = 'PROMO'
         AND l_discount > 0.05
         AND year(l_shipdate) = 1997) p,
      (SELECT cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2)
                   AS double) AS total
       FROM lineitem, part
       WHERE l_partkey = p_partkey
         AND year(l_shipdate) = 1997) t
    """

# q66: wide monthly shipping pivot per nation "warehouse" — 12 conditional
# revenue sums, UNION ALL of the two linestatus "carriers", re-aggregated.
_SQL_NEW4["tpcds_q66"] = """
    SELECT n_name, yr,
           cast(round(sum(jan), 2) AS double) AS jan_rev,
           cast(round(sum(feb), 2) AS double) AS feb_rev,
           cast(round(sum(mar), 2) AS double) AS mar_rev,
           cast(round(sum(apr), 2) AS double) AS apr_rev,
           cast(round(sum(may), 2) AS double) AS may_rev,
           cast(round(sum(jun), 2) AS double) AS jun_rev,
           cast(round(sum(jul), 2) AS double) AS jul_rev,
           cast(round(sum(aug), 2) AS double) AS aug_rev,
           cast(round(sum(sep), 2) AS double) AS sep_rev,
           cast(round(sum(oct), 2) AS double) AS oct_rev,
           cast(round(sum(nov), 2) AS double) AS nov_rev,
           cast(round(sum(dec), 2) AS double) AS dec_rev,
           cast(count(*) AS bigint) AS n_slices
    FROM (
      SELECT n_name, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
             CASE WHEN month(o_orderdate) = 1 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END AS jan,
             CASE WHEN month(o_orderdate) = 2 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END AS feb,
             CASE WHEN month(o_orderdate) = 3 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END AS mar,
             CASE WHEN month(o_orderdate) = 4 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END AS apr,
             CASE WHEN month(o_orderdate) = 5 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END AS may,
             CASE WHEN month(o_orderdate) = 6 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END AS jun,
             CASE WHEN month(o_orderdate) = 7 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END AS jul,
             CASE WHEN month(o_orderdate) = 8 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END AS aug,
             CASE WHEN month(o_orderdate) = 9 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END AS sep,
             CASE WHEN month(o_orderdate) = 10 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END AS oct,
             CASE WHEN month(o_orderdate) = 11 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END AS nov,
             CASE WHEN month(o_orderdate) = 12 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END AS dec
      FROM lineitem, orders, supplier, nation
      WHERE l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey
        AND s_nationkey = n_nationkey
        AND l_linestatus = 'O'
        AND year(o_orderdate) = 1997
      UNION ALL
      SELECT n_name, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
             CASE WHEN month(o_orderdate) = 1 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END,
             CASE WHEN month(o_orderdate) = 2 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END,
             CASE WHEN month(o_orderdate) = 3 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END,
             CASE WHEN month(o_orderdate) = 4 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END,
             CASE WHEN month(o_orderdate) = 5 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END,
             CASE WHEN month(o_orderdate) = 6 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END,
             CASE WHEN month(o_orderdate) = 7 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END,
             CASE WHEN month(o_orderdate) = 8 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END,
             CASE WHEN month(o_orderdate) = 9 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END,
             CASE WHEN month(o_orderdate) = 10 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END,
             CASE WHEN month(o_orderdate) = 11 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END,
             CASE WHEN month(o_orderdate) = 12 THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) ELSE cast(0 AS decimal(38,9)) END
      FROM lineitem, orders, supplier, nation
      WHERE l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey
        AND s_nationkey = n_nationkey
        AND l_linestatus = 'F'
        AND year(o_orderdate) = 1997
    ) slices
    GROUP BY n_name, yr
    ORDER BY n_name, yr
    LIMIT 100
    """

# q67: ROLLUP over the product hierarchy then top-5 per p_type partition by
# ranked sales (Expand feeding a ranking window).
_SQL_NEW4["tpcds_q67"] = """
    WITH pre AS (
      -- finest-grain pre-aggregate before the 4-way rollup Expand (see q36)
      SELECT p_type, p_brand, p_size,
             sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))) AS s
      FROM lineitem, part
      WHERE l_partkey = p_partkey
      GROUP BY p_type, p_brand, p_size
    ),
    agg AS (
      SELECT CASE WHEN grouping(p_type) = 1 THEN 'ALL' ELSE p_type END AS pt,
             CASE WHEN grouping(p_brand) = 1 THEN 'ALL' ELSE p_brand END AS pb,
             CASE WHEN grouping(p_size) = 1 THEN -1 ELSE p_size END AS psz,
             cast(round(sum(s), 2) AS double) AS sumsales
      FROM pre
      GROUP BY ROLLUP(p_type, p_brand, p_size)
    )
    SELECT pt, pb, psz, sumsales, rnk
    FROM (
      SELECT pt, pb, psz, sumsales,
             rank() OVER (PARTITION BY pt
                          ORDER BY sumsales DESC, pb, psz) AS rnk
      FROM agg
    ) ranked
    WHERE rnk <= 5
    ORDER BY pt, rnk, pb, psz
    """

# q85: returned lines under a disjunction of three (segment × order-price ×
# discount) band conjunctions, averaged per segment.
_SQL_NEW4["tpcds_q85"] = """
    SELECT c_mktsegment,
           round(avg(l_quantity), 4) AS avg_qty,
           cast(round(avg(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2)
                AS double) AS avg_refunded,
           cast(round(avg(cast(l_extendedprice * l_tax AS decimal(38,9))), 2)
                AS double) AS avg_fee,
           cast(count(*) AS bigint) AS n_returns
    FROM lineitem, orders, customer
    WHERE l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND l_returnflag = 'R'
      AND ((c_mktsegment = 'BUILDING'
            AND o_totalprice BETWEEN 50000 AND 200000
            AND l_discount BETWEEN 0.00 AND 0.05)
        OR (c_mktsegment = 'MACHINERY'
            AND o_totalprice BETWEEN 100000 AND 300000
            AND l_discount BETWEEN 0.02 AND 0.07)
        OR (c_mktsegment = 'HOUSEHOLD'
            AND o_totalprice BETWEEN 150000 AND 450000
            AND l_discount BETWEEN 0.05 AND 0.10))
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """

for _name, _sql in _SQL_NEW4.items():
    _register(_name, _sql)

# --- round 2c: toward the full 99-query set ---------------------------------
# (resources/tpcds/ ships all 99; shapes adapted to the driver star schema.)
_SQL_NEW5: dict[str, str] = {}

# q2: week-over-week report — per-day-of-week sums for two years from one
# aggregate CTE, self-joined into a YoY ratio per dow.
_SQL_NEW5["tpcds_q2"] = """
    WITH wk AS (
      SELECT year(o_orderdate) AS yr,
             day(o_orderdate) % 7 AS dow,
             sum(cast(o_totalprice AS decimal(38,9))) AS sales
      FROM orders
      WHERE year(o_orderdate) IN (1996, 1997)
      GROUP BY year(o_orderdate), day(o_orderdate) % 7
    )
    SELECT a.dow AS dow,
           cast(round(a.sales, 2) AS double) AS sales_1996,
           cast(round(b.sales, 2) AS double) AS sales_1997,
           round(cast(a.sales AS double) / cast(b.sales AS double), 6) AS yoy_ratio
    FROM wk a JOIN wk b ON a.dow = b.dow
    WHERE a.yr = 1996 AND b.yr = 1997
    ORDER BY dow
    """

# q8: store sales limited to nations in the INTERSECT of a preferred-name
# list and nations with a large customer base (IN over INTERSECT subquery).
_SQL_NEW5["tpcds_q8"] = """
    SELECT s_name,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2)
                AS double) AS net_sales
    FROM lineitem, orders, supplier
    WHERE l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND year(o_orderdate) = 1997
      AND s_nationkey IN (
        SELECT n_nationkey FROM nation
        WHERE n_name LIKE 'NATION_1%' OR n_name LIKE 'NATION_2%'
        INTERSECT
        SELECT c_nationkey FROM customer GROUP BY c_nationkey HAVING count(*) > 40)
    GROUP BY s_name
    ORDER BY s_name
    LIMIT 100
    """

# q12: 30-day-window item revenue with ratio-to-class via a window sum
# (web_sales flavor of the q98 family; ship-date window, type partition).
_SQL_NEW5["tpcds_q12"] = """
    SELECT p_type, p_brand,
           cast(round(itemrevenue, 2) AS double) AS itemrevenue,
           round(cast(itemrevenue AS double) * 100
                 / cast(sum(itemrevenue) OVER (PARTITION BY p_type) AS double),
                 6) AS revenueratio
    FROM (
      SELECT p_type, p_brand,
             sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))) AS itemrevenue
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= date '1997-03-01' AND l_shipdate < date '1997-03-31'
      GROUP BY p_type, p_brand) t
    ORDER BY p_type, revenueratio, p_brand
    LIMIT 100
    """

# q13: single-row averages under a three-way OR of (segment × balance-band ×
# quantity-band) conjunctions spanning two dimension tables.
_SQL_NEW5["tpcds_q13"] = """
    SELECT round(avg(l_quantity), 4) AS avg_qty,
           cast(round(avg(cast(l_extendedprice AS decimal(38,9))), 2) AS double) AS avg_price,
           cast(round(avg(cast(o_totalprice AS decimal(38,9))), 2) AS double) AS avg_order,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2)
                AS double) AS net_paid
    FROM lineitem, orders, customer, nation
    WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey AND c_nationkey = n_nationkey
      AND ((c_mktsegment = 'AUTOMOBILE' AND c_acctbal BETWEEN 0 AND 3000
            AND l_quantity BETWEEN 1 AND 20)
        OR (c_mktsegment = 'FURNITURE' AND c_acctbal BETWEEN 2000 AND 6000
            AND l_quantity BETWEEN 10 AND 35)
        OR (c_mktsegment = 'MACHINERY' AND c_acctbal BETWEEN 5000 AND 10000
            AND l_quantity BETWEEN 25 AND 50))
    """

# q18: multi-measure averages under ROLLUP over (region, nation, segment).
_SQL_NEW5["tpcds_q18"] = """
    SELECT r_name, n_name, c_mktsegment,
           round(avg(l_quantity), 4) AS avg_qty,
           cast(round(avg(cast(l_extendedprice AS decimal(38,9))), 2) AS double) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           cast(round(avg(cast(o_totalprice AS decimal(38,9))), 2) AS double) AS avg_total,
           cast(count(*) AS bigint) AS n_rows
    FROM lineitem, orders, customer, nation, region
    WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND year(o_orderdate) = 1997
    GROUP BY ROLLUP(r_name, n_name, c_mktsegment)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST, c_mktsegment NULLS FIRST
    LIMIT 100
    """

# q20: order-date-window revenue ratio-to-brand (catalog flavor of q12/q98:
# different partition key, tax-inclusive measure, type IN-list filter).
_SQL_NEW5["tpcds_q20"] = """
    SELECT p_brand, p_type,
           cast(round(itemrevenue, 2) AS double) AS itemrevenue,
           round(cast(itemrevenue AS double) * 100
                 / cast(sum(itemrevenue) OVER (PARTITION BY p_brand) AS double),
                 6) AS revenueratio
    FROM (
      SELECT p_brand, p_type,
             sum(cast(l_extendedprice * (1 + l_tax) AS decimal(38,9))) AS itemrevenue
      FROM lineitem, orders, part
      WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
        AND o_orderdate >= date '1997-06-01' AND o_orderdate < date '1997-07-01'
        AND p_type IN ('PROMO', 'ECONOMY', 'STANDARD')
      GROUP BY p_brand, p_type) t
    ORDER BY p_brand, revenueratio, p_type
    LIMIT 100
    """

# q22: average quantity-on-hand ROLLUP down the part hierarchy
# (type → brand → size), ordered by the average.
_SQL_NEW5["tpcds_q22"] = """
    SELECT p_type, p_brand, p_size,
           round(avg(l_quantity), 4) AS qoh
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND year(l_shipdate) BETWEEN 1996 AND 1998
    GROUP BY ROLLUP(p_type, p_brand, p_size)
    ORDER BY qoh, p_type NULLS FIRST, p_brand NULLS FIRST, p_size NULLS FIRST
    LIMIT 100
    """

# q24: per-(customer, supplier, brand) net paid where customer and supplier
# share a nation, kept above a scalar-subquery threshold over the same CTE
# (exchange/CTE reuse: ss is scanned twice).
_SQL_NEW5["tpcds_q24"] = """
    WITH ss AS (
      SELECT c_name, s_name, p_brand,
             sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))) AS netpaid
      FROM lineitem, orders, customer, supplier, part
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND l_suppkey = s_suppkey AND l_partkey = p_partkey
        AND c_nationkey = s_nationkey
        AND l_returnflag = 'R'
      GROUP BY c_name, s_name, p_brand
    )
    SELECT c_name, s_name, p_brand,
           cast(round(netpaid, 2) AS double) AS paid
    FROM ss
    WHERE netpaid > (SELECT 0.05 * avg(netpaid) FROM ss)
    ORDER BY c_name, s_name, p_brand
    LIMIT 100
    """

# q25: three-channel profit flow — store-sold, returned, catalog-resold legs
# (one aggregate CTE per l_returnflag channel) joined on (part, supplier).
_SQL_NEW5["tpcds_q25"] = """
    WITH st AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))) AS profit
      FROM lineitem WHERE l_returnflag = 'N' AND year(l_shipdate) = 1996
      GROUP BY l_partkey, l_suppkey),
    rt AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             sum(cast(l_extendedprice * (1 + l_tax) AS decimal(38,9))) AS loss
      FROM lineitem WHERE l_returnflag = 'R' AND year(l_shipdate) IN (1996, 1997)
      GROUP BY l_partkey, l_suppkey),
    ct AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))) AS profit
      FROM lineitem WHERE l_returnflag = 'A' AND year(l_shipdate) IN (1996, 1997)
      GROUP BY l_partkey, l_suppkey)
    SELECT p_brand, s_name,
           cast(round(sum(st.profit), 2) AS double) AS store_profit,
           cast(round(sum(rt.loss), 2) AS double)   AS return_loss,
           cast(round(sum(ct.profit), 2) AS double) AS catalog_profit
    FROM st JOIN rt ON st.pk = rt.pk AND st.sk = rt.sk
            JOIN ct ON st.pk = ct.pk AND st.sk = ct.sk
            JOIN part ON st.pk = p_partkey
            JOIN supplier ON st.sk = s_suppkey
    GROUP BY p_brand, s_name
    ORDER BY p_brand, s_name
    LIMIT 100
    """

# q26: flat demographic star averages on the order-priority/status dimension
# (catalog flavor of the q7 family).
_SQL_NEW5["tpcds_q26"] = """
    SELECT p_brand,
           round(avg(l_quantity), 4) AS agg1,
           cast(round(avg(cast(l_extendedprice AS decimal(38,9))), 2) AS double) AS agg2,
           round(avg(l_discount), 6) AS agg3,
           cast(round(avg(cast(l_extendedprice * (1 + l_tax) AS decimal(38,9))), 2)
                AS double) AS agg4
    FROM lineitem, orders, part
    WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
      AND o_orderpriority IN ('3-MEDIUM', '4-NOT SPECIFIED')
      AND o_orderstatus = 'F'
      AND year(o_orderdate) = 1996
    GROUP BY p_brand
    ORDER BY p_brand
    LIMIT 100
    """

# q29: three-channel quantity flow with stepped date windows per leg
# (sold Q1 → returned within six months → restocked across two years).
_SQL_NEW5["tpcds_q29"] = """
    WITH sold AS (
      SELECT l_partkey AS pk, l_suppkey AS sk, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_returnflag = 'N' AND year(l_shipdate) = 1996
        AND month(l_shipdate) BETWEEN 1 AND 3
      GROUP BY l_partkey, l_suppkey),
    ret AS (
      SELECT l_partkey AS pk, l_suppkey AS sk, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_returnflag = 'R' AND year(l_shipdate) = 1996
        AND month(l_shipdate) BETWEEN 1 AND 9
      GROUP BY l_partkey, l_suppkey),
    restock AS (
      SELECT l_partkey AS pk, l_suppkey AS sk, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_returnflag = 'A' AND year(l_shipdate) IN (1996, 1997)
      GROUP BY l_partkey, l_suppkey)
    SELECT p_brand, s_name,
           round(sum(sold.qty), 2)    AS store_qty,
           round(sum(ret.qty), 2)     AS returned_qty,
           round(sum(restock.qty), 2) AS catalog_qty
    FROM sold JOIN ret     ON sold.pk = ret.pk AND sold.sk = ret.sk
              JOIN restock ON sold.pk = restock.pk AND sold.sk = restock.sk
              JOIN part     ON sold.pk = p_partkey
              JOIN supplier ON sold.sk = s_suppkey
    GROUP BY p_brand, s_name
    ORDER BY p_brand, s_name
    LIMIT 100
    """

# q30: customers whose return total exceeds 1.2× their nation's average —
# correlated scalar subquery over a shared aggregate CTE.
_SQL_NEW5["tpcds_q30"] = """
    WITH ret AS (
      SELECT o_custkey AS ck, c_nationkey AS nk,
             sum(cast(l_extendedprice * (1 + l_tax) AS decimal(38,9))) AS total_ret
      FROM lineitem, orders, customer
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND l_returnflag = 'R' AND year(l_shipdate) = 1997
      GROUP BY o_custkey, c_nationkey
    )
    SELECT c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
           cast(round(r1.total_ret, 2) AS double) AS total_returns
    FROM ret r1, customer, nation
    WHERE r1.ck = c_custkey AND c_nationkey = n_nationkey
      AND cast(r1.total_ret AS double) >
          (SELECT 1.2 * avg(cast(r2.total_ret AS double)) FROM ret r2
           WHERE r2.nk = r1.nk)
    ORDER BY c_name, total_returns
    LIMIT 100
    """

# q32: "excess discount" — lines whose discount beats 1.3× the per-part
# average (correlated scalar subquery on the fact table itself).
_SQL_NEW5["tpcds_q32"] = """
    SELECT cast(round(sum(cast(l1.l_extendedprice * l1.l_discount AS decimal(38,9))), 2)
                AS double) AS excess_discount
    FROM lineitem l1, part
    WHERE l1.l_partkey = p_partkey
      AND p_brand IN ('Brand#21', 'Brand#22', 'Brand#23')
      AND year(l1.l_shipdate) = 1997
      AND l1.l_discount > (
        SELECT 1.3 * avg(l2.l_discount) FROM lineitem l2
        WHERE l2.l_partkey = l1.l_partkey AND year(l2.l_shipdate) = 1997)
    """

# q35: demographic stats gated by EXISTS + (EXISTS OR EXISTS) — the q10
# gating pattern with a multi-measure aggregate payload.
_SQL_NEW5["tpcds_q35"] = """
    SELECT c_mktsegment, n_name,
           cast(count(*) AS bigint) AS cnt,
           round(min(c_acctbal), 2) AS min_bal,
           round(max(c_acctbal), 2) AS max_bal,
           cast(round(avg(cast(c_acctbal AS decimal(38,9))), 4) AS double) AS avg_bal
    FROM customer, nation
    WHERE c_nationkey = n_nationkey
      AND EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND year(o_orderdate) = 1997)
      AND (EXISTS (SELECT 1 FROM orders, lineitem
                   WHERE o_custkey = c_custkey AND l_orderkey = o_orderkey
                     AND l_returnflag = 'A')
        OR EXISTS (SELECT 1 FROM orders, lineitem
                   WHERE o_custkey = c_custkey AND l_orderkey = o_orderkey
                     AND l_returnflag = 'N'))
    GROUP BY c_mktsegment, n_name
    ORDER BY c_mktsegment, n_name
    LIMIT 100
    """

for _name, _sql in _SQL_NEW5.items():
    _register(_name, _sql)

# --- round 2d: 14 more full-set shapes --------------------------------------
_SQL_NEW6: dict[str, str] = {}

# q37: parts in a price band with sales in a date window, gated by an EXISTS
# on the supplier side; distinct part attributes out.
_SQL_NEW6["tpcds_q37"] = """
    SELECT p_name, p_brand, round(min(p_retailprice), 2) AS min_price
    FROM part, lineitem
    WHERE p_partkey = l_partkey
      AND p_retailprice BETWEEN 930 AND 960
      AND l_shipdate >= date '1997-01-01' AND l_shipdate < date '1997-03-01'
      AND EXISTS (SELECT 1 FROM supplier
                  WHERE s_suppkey = l_suppkey AND s_acctbal > 0)
    GROUP BY p_name, p_brand
    ORDER BY p_name, p_brand
    LIMIT 100
    """

# q40: net sales before/after a pivot date per (supplier nation, brand),
# with returned amounts subtracted via a LEFT JOIN + coalesce leg.
_SQL_NEW6["tpcds_q40"] = """
    SELECT n_name, p_brand,
           cast(round(sum(cast(CASE WHEN l.l_shipdate < date '1997-01-01'
                                    THEN l.l_extendedprice - coalesce(r.ret_amt, 0)
                                    ELSE 0 END AS decimal(38,9))), 2) AS double) AS sales_before,
           cast(round(sum(cast(CASE WHEN l.l_shipdate >= date '1997-01-01'
                                    THEN l.l_extendedprice - coalesce(r.ret_amt, 0)
                                    ELSE 0 END AS decimal(38,9))), 2) AS double) AS sales_after
    FROM lineitem l
    LEFT JOIN (SELECT l_orderkey, l_partkey,
                      sum(l_extendedprice) AS ret_amt
               FROM lineitem WHERE l_returnflag = 'R'
               GROUP BY l_orderkey, l_partkey) r
      ON l.l_orderkey = r.l_orderkey AND l.l_partkey = r.l_partkey
    JOIN supplier ON l.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN part ON l.l_partkey = p_partkey
    WHERE l.l_returnflag = 'N' AND year(l.l_shipdate) IN (1996, 1997)
    GROUP BY n_name, p_brand
    ORDER BY n_name, p_brand
    LIMIT 100
    """

# q41: distinct product names whose brand carries sibling parts matching an
# OR of (type, size-band) conjunctions — correlated scalar count > 0.
_SQL_NEW6["tpcds_q41"] = """
    SELECT DISTINCT p_name
    FROM part p1
    WHERE p_retailprice BETWEEN 950 AND 980
      AND (SELECT count(*) FROM part p2
           WHERE p2.p_brand = p1.p_brand
             AND ((p2.p_type IN ('STANDARD', 'SMALL') AND p2.p_size BETWEEN 1 AND 15)
               OR (p2.p_type IN ('MEDIUM', 'LARGE') AND p2.p_size BETWEEN 30 AND 45))) > 0
    ORDER BY p_name
    LIMIT 100
    """

# q50: return-latency day-bucket pivot per supplier nation (order date →
# return ship date, day gap via year*365 + dayofyear arithmetic).
_SQL_NEW6["tpcds_q50"] = """
    SELECT n_name,
           cast(sum(CASE WHEN gap_days <= 30 THEN 1 ELSE 0 END) AS bigint) AS d30,
           cast(sum(CASE WHEN gap_days > 30 AND gap_days <= 60 THEN 1 ELSE 0 END) AS bigint) AS d60,
           cast(sum(CASE WHEN gap_days > 60 AND gap_days <= 90 THEN 1 ELSE 0 END) AS bigint) AS d90,
           cast(sum(CASE WHEN gap_days > 90 AND gap_days <= 120 THEN 1 ELSE 0 END) AS bigint) AS d120,
           cast(sum(CASE WHEN gap_days > 120 THEN 1 ELSE 0 END) AS bigint) AS d_over_120
    FROM (
      SELECT s_nationkey,
             (year(l_shipdate) * 365 + dayofyear(l_shipdate))
             - (year(o_orderdate) * 365 + dayofyear(o_orderdate)) AS gap_days
      FROM lineitem, orders, supplier
      WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        AND l_returnflag = 'R' AND year(l_shipdate) = 1997
    ) g, nation
    WHERE g.s_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    LIMIT 100
    """

# q56: per-item revenue summed across three channel legs (UNION ALL of
# aggregate CTEs, q33 family) for a part-name prefix set.
_SQL_NEW6["tpcds_q56"] = """
    WITH ss AS (
      SELECT p_name AS item, sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))) AS total
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND l_returnflag = 'N'
        AND (p_name LIKE 'small%' OR p_name LIKE 'red%' OR p_name LIKE 'blue%')
        AND month(l_shipdate) = 5
      GROUP BY p_name),
    cs AS (
      SELECT p_name AS item, sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))) AS total
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND l_returnflag = 'A'
        AND (p_name LIKE 'small%' OR p_name LIKE 'red%' OR p_name LIKE 'blue%')
        AND month(l_shipdate) = 5
      GROUP BY p_name),
    ws AS (
      SELECT p_name AS item, sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))) AS total
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND l_returnflag = 'R'
        AND (p_name LIKE 'small%' OR p_name LIKE 'red%' OR p_name LIKE 'blue%')
        AND month(l_shipdate) = 5
      GROUP BY p_name)
    SELECT item, cast(round(sum(total), 2) AS double) AS total_sales
    FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs UNION ALL SELECT * FROM ws) t
    GROUP BY item
    ORDER BY total_sales, item
    LIMIT 100
    """

# q57: monthly deviation-from-average with lag/lead context per
# (nation, part type) — the q47 pattern on the supplier dimension.
_SQL_NEW6["tpcds_q57"] = """
    WITH m AS (
      SELECT n_name, p_type, month(l_shipdate) AS moy,
             sum(cast(l_extendedprice AS decimal(38,9))) AS sum_sales_d
      FROM lineitem, supplier, nation, part
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND l_partkey = p_partkey
        AND year(l_shipdate) = 1997
      GROUP BY n_name, p_type, month(l_shipdate)),
    v AS (
      SELECT n_name, p_type, moy,
             cast(round(sum_sales_d, 2) AS double) AS sum_sales,
             cast(round(avg(sum_sales_d) OVER (PARTITION BY n_name, p_type), 2)
                  AS double) AS avg_monthly,
             cast(round(lag(sum_sales_d) OVER (PARTITION BY n_name, p_type ORDER BY moy), 2)
                  AS double) AS prev_sales,
             cast(round(lead(sum_sales_d) OVER (PARTITION BY n_name, p_type ORDER BY moy), 2)
                  AS double) AS next_sales
      FROM m)
    SELECT n_name, p_type, moy, sum_sales, avg_monthly, prev_sales, next_sales
    FROM v
    WHERE avg_monthly > 0 AND abs(sum_sales - avg_monthly) / avg_monthly > 0.1
    ORDER BY n_name, p_type, moy
    LIMIT 100
    """

# q60: q56 family with a size-set filter and item ordering first.
_SQL_NEW6["tpcds_q60"] = """
    WITH ss AS (
      SELECT p_brand AS item, sum(cast(l_extendedprice AS decimal(38,9))) AS total
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND l_returnflag = 'N'
        AND p_size IN (5, 10, 15, 20, 25) AND month(l_shipdate) = 9
      GROUP BY p_brand),
    cs AS (
      SELECT p_brand AS item, sum(cast(l_extendedprice AS decimal(38,9))) AS total
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND l_returnflag = 'A'
        AND p_size IN (5, 10, 15, 20, 25) AND month(l_shipdate) = 9
      GROUP BY p_brand),
    ws AS (
      SELECT p_brand AS item, sum(cast(l_extendedprice AS decimal(38,9))) AS total
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND l_returnflag = 'R'
        AND p_size IN (5, 10, 15, 20, 25) AND month(l_shipdate) = 9
      GROUP BY p_brand)
    SELECT item, cast(round(sum(total), 2) AS double) AS total_sales
    FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs UNION ALL SELECT * FROM ws) t
    GROUP BY item
    ORDER BY item, total_sales
    LIMIT 100
    """

# q64: cross-year "repeat sales" — one multi-dim aggregate CTE self-joined
# across two years on (part, nation) where the later year sold no more.
_SQL_NEW6["tpcds_q64"] = """
    WITH cs AS (
      SELECT p_partkey AS pk, s_nationkey AS nk, year(o_orderdate) AS yr,
             cast(count(*) AS bigint) AS cnt,
             sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))) AS amt
      FROM lineitem, orders, supplier, part
      WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey AND l_partkey = p_partkey
        AND year(o_orderdate) IN (1996, 1997)
      GROUP BY p_partkey, s_nationkey, year(o_orderdate))
    SELECT p_brand, n_name,
           cs1.cnt AS cnt_1996, cast(round(cs1.amt, 2) AS double) AS amt_1996,
           cs2.cnt AS cnt_1997, cast(round(cs2.amt, 2) AS double) AS amt_1997
    FROM cs cs1 JOIN cs cs2 ON cs1.pk = cs2.pk AND cs1.nk = cs2.nk
         JOIN part ON cs1.pk = p_partkey
         JOIN nation ON cs1.nk = n_nationkey
    WHERE cs1.yr = 1996 AND cs2.yr = 1997 AND cs2.cnt <= cs1.cnt
    ORDER BY p_brand, n_name, cnt_1996, amt_1996, cnt_1997, amt_1997
    LIMIT 100
    """

# q69: active customers with no returns and no urgent orders —
# EXISTS + NOT EXISTS + NOT EXISTS gating, banded counts.
_SQL_NEW6["tpcds_q69"] = """
    SELECT c_mktsegment,
           CASE WHEN c_acctbal < 2500 THEN 'low'
                WHEN c_acctbal < 7500 THEN 'mid'
                ELSE 'high' END AS bal_band,
           cast(count(*) AS bigint) AS cnt
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND year(o_orderdate) = 1997)
      AND NOT EXISTS (SELECT 1 FROM orders, lineitem
                      WHERE o_custkey = c_custkey AND l_orderkey = o_orderkey
                        AND l_returnflag = 'R' AND year(l_shipdate) = 1997)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
                        AND year(o_orderdate) = 1997)
    GROUP BY c_mktsegment,
             CASE WHEN c_acctbal < 2500 THEN 'low'
                  WHEN c_acctbal < 7500 THEN 'mid'
                  ELSE 'high' END
    ORDER BY c_mktsegment, bal_band
    """

# q71: revenue by (type, hour-of-day) over three UNION ALL "time dim" legs
# of the events stream table, restricted to business hours.
_SQL_NEW6["tpcds_q71"] = """
    SELECT event_type, hr,
           cast(round(sum(amt), 2) AS double) AS revenue,
           cast(count(*) AS bigint) AS n_events
    FROM (
      SELECT event_type, hour(ts) AS hr, cast(value AS decimal(38,9)) AS amt
      FROM events WHERE value < 10
      UNION ALL
      SELECT event_type, hour(ts) AS hr, cast(value * 2 AS decimal(38,9)) AS amt
      FROM events WHERE value >= 10 AND value < 100
      UNION ALL
      SELECT event_type, hour(ts) AS hr, cast(value / 2 AS decimal(38,9)) AS amt
      FROM events WHERE value >= 100) t
    WHERE hr BETWEEN 8 AND 18
    GROUP BY event_type, hr
    ORDER BY event_type, hr
    LIMIT 100
    """

# q72: demand exceeding on-hand inventory — aggregate-then-join with an
# inequality residual (avg stocked quantity < ordered quantity).
_SQL_NEW6["tpcds_q72"] = """
    WITH inv AS (
      SELECT l_partkey AS pk, avg(l_quantity) AS inv_qty
      FROM lineitem WHERE l_returnflag = 'A'
      GROUP BY l_partkey)
    SELECT p_brand, month(l.l_shipdate) AS moy, cast(count(*) AS bigint) AS short_count
    FROM lineitem l
    JOIN inv ON l.l_partkey = inv.pk AND inv.inv_qty < l.l_quantity
    JOIN part ON l.l_partkey = p_partkey
    WHERE l.l_returnflag = 'N' AND year(l.l_shipdate) = 1997
    GROUP BY p_brand, month(l.l_shipdate)
    ORDER BY p_brand, moy
    LIMIT 100
    """

# q74: customers whose store-channel YoY growth beats their web-channel
# growth — four-leg self-join of one (customer, channel, year) aggregate.
_SQL_NEW6["tpcds_q74"] = """
    WITH yt AS (
      SELECT c_name AS cust, l_returnflag AS chan, year(o_orderdate) AS yr,
             sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))) AS total
      FROM lineitem, orders, customer
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND l_returnflag IN ('N', 'A') AND year(o_orderdate) IN (1996, 1997)
      GROUP BY c_name, l_returnflag, year(o_orderdate))
    SELECT s1.cust AS c_name
    FROM yt s1, yt s2, yt w1, yt w2
    WHERE s1.cust = s2.cust AND s1.cust = w1.cust AND s1.cust = w2.cust
      AND s1.chan = 'N' AND s2.chan = 'N' AND w1.chan = 'A' AND w2.chan = 'A'
      AND s1.yr = 1996 AND s2.yr = 1997 AND w1.yr = 1996 AND w2.yr = 1997
      AND s1.total > 0 AND w1.total > 0
      AND cast(s2.total AS double) / cast(s1.total AS double)
          > cast(w2.total AS double) / cast(w1.total AS double)
    ORDER BY c_name
    LIMIT 100
    """

# q76: channel-union counts of rows whose dimension key is NULL
# (synthesized deterministically via nullif).
_SQL_NEW6["tpcds_q76"] = """
    SELECT chan, yr, cast(count(*) AS bigint) AS cnt,
           cast(round(sum(amt), 2) AS double) AS sales
    FROM (
      SELECT 'store' AS chan, year(l_shipdate) AS yr,
             cast(l_extendedprice AS decimal(38,9)) AS amt
      FROM lineitem WHERE l_returnflag = 'N' AND nullif(l_linestatus, 'F') IS NULL
      UNION ALL
      SELECT 'web' AS chan, year(l_shipdate) AS yr,
             cast(l_extendedprice AS decimal(38,9)) AS amt
      FROM lineitem WHERE l_returnflag = 'R' AND nullif(l_linestatus, 'O') IS NULL
      UNION ALL
      SELECT 'catalog' AS chan, year(l_shipdate) AS yr,
             cast(l_extendedprice AS decimal(38,9)) AS amt
      FROM lineitem WHERE l_returnflag = 'A') t
    GROUP BY chan, yr
    ORDER BY chan, yr
    LIMIT 100
    """

# q77: per-channel sales vs returns (LEFT and FULL OUTER legs) unioned,
# then ROLLUP totals over (channel, nation).
_SQL_NEW6["tpcds_q77"] = """
    WITH ss AS (
      SELECT s_nationkey AS nk, sum(cast(l_extendedprice AS decimal(38,9))) AS sales
      FROM lineitem, supplier
      WHERE l_suppkey = s_suppkey AND l_returnflag = 'N' AND year(l_shipdate) = 1997
      GROUP BY s_nationkey),
    sr AS (
      SELECT s_nationkey AS nk,
             sum(cast(l_extendedprice * (1 + l_tax) AS decimal(38,9))) AS ret
      FROM lineitem, supplier
      WHERE l_suppkey = s_suppkey AND l_returnflag = 'R'
        AND year(l_shipdate) = 1997 AND month(l_shipdate) <= 6
      GROUP BY s_nationkey),
    cs AS (
      SELECT s_nationkey AS nk, sum(cast(l_extendedprice AS decimal(38,9))) AS sales
      FROM lineitem, supplier
      WHERE l_suppkey = s_suppkey AND l_returnflag = 'A' AND year(l_shipdate) = 1997
      GROUP BY s_nationkey),
    cr AS (
      SELECT s_nationkey AS nk,
             sum(cast(l_extendedprice * (1 + l_tax) AS decimal(38,9))) AS ret
      FROM lineitem, supplier
      WHERE l_suppkey = s_suppkey AND l_returnflag = 'R'
        AND year(l_shipdate) = 1997 AND month(l_shipdate) > 6
      GROUP BY s_nationkey)
    SELECT channel, nk,
           cast(round(sum(sales), 2) AS double) AS sales,
           cast(round(sum(returns_amt), 2) AS double) AS returns_amt,
           cast(round(sum(profit), 2) AS double) AS profit
    FROM (
      SELECT 'store channel' AS channel, ss.nk AS nk, ss.sales AS sales,
             coalesce(sr.ret, 0) AS returns_amt,
             ss.sales - coalesce(sr.ret, 0) AS profit
      FROM ss LEFT JOIN sr ON ss.nk = sr.nk
      UNION ALL
      SELECT 'catalog channel' AS channel, coalesce(cs.nk, cr.nk) AS nk,
             coalesce(cs.sales, 0) AS sales,
             coalesce(cr.ret, 0) AS returns_amt,
             coalesce(cs.sales, 0) - coalesce(cr.ret, 0) AS profit
      FROM cs FULL OUTER JOIN cr ON cs.nk = cr.nk) t
    GROUP BY ROLLUP(channel, nk)
    ORDER BY channel NULLS FIRST, nk NULLS FIRST
    LIMIT 100
    """

for _name, _sql in _SQL_NEW6.items():
    _register(_name, _sql)

# --- round 2e: final 13 shapes — the full-set battery is now 99/99 ----------
_SQL_NEW7: dict[str, str] = {}

# q78: unreturned sales per (year, part) in two channels (anti LEFT JOIN on
# the returns key), joined, with a cross-channel quantity ratio.
_SQL_NEW7["tpcds_q78"] = """
    WITH ret AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      FROM lineitem WHERE l_returnflag = 'R'),
    ss AS (
      SELECT year(l.l_shipdate) AS yr, l.l_partkey AS pk,
             sum(l.l_quantity) AS qty,
             sum(cast(l.l_extendedprice * (1 - l.l_discount) AS decimal(38,9))) AS amt
      FROM lineitem l LEFT JOIN ret r
        ON l.l_orderkey = r.ok AND l.l_partkey = r.pk
      WHERE l.l_returnflag = 'N' AND r.ok IS NULL
      GROUP BY year(l.l_shipdate), l.l_partkey),
    ws AS (
      SELECT year(l.l_shipdate) AS yr, l.l_partkey AS pk,
             sum(l.l_quantity) AS qty,
             sum(cast(l.l_extendedprice * (1 - l.l_discount) AS decimal(38,9))) AS amt
      FROM lineitem l LEFT JOIN ret r
        ON l.l_orderkey = r.ok AND l.l_partkey = r.pk
      WHERE l.l_returnflag = 'A' AND r.ok IS NULL
      GROUP BY year(l.l_shipdate), l.l_partkey)
    SELECT ss.yr AS yr, ss.pk AS p_key,
           round(ss.qty, 2) AS store_qty, round(ws.qty, 2) AS other_qty,
           cast(round(ss.amt, 2) AS double) AS store_amt,
           cast(round(ws.amt, 2) AS double) AS other_amt,
           round(cast(ss.qty AS double) / ws.qty, 6) AS qty_ratio
    FROM ss JOIN ws ON ss.yr = ws.yr AND ss.pk = ws.pk
    WHERE ss.yr = 1997
    ORDER BY qty_ratio, p_key
    LIMIT 100
    """

# q80: per-brand sales/returns/profit report with a LEFT-JOIN returns leg
# and channel split, totalled via ROLLUP(channel, brand).
_SQL_NEW7["tpcds_q80"] = """
    WITH ret AS (
      SELECT l_orderkey AS ok, l_partkey AS pk,
             sum(cast(l_extendedprice * (1 + l_tax) AS decimal(38,9))) AS ret_amt
      FROM lineitem WHERE l_returnflag = 'R'
      GROUP BY l_orderkey, l_partkey),
    leg AS (
      SELECT CASE WHEN l.l_linestatus = 'F' THEN 'store channel'
                  ELSE 'web channel' END AS channel,
             p_brand AS id,
             cast(l.l_extendedprice AS decimal(38,9)) AS sales,
             coalesce(r.ret_amt, 0) AS returns_amt
      FROM lineitem l
      LEFT JOIN ret r ON l.l_orderkey = r.ok AND l.l_partkey = r.pk
      JOIN part ON l.l_partkey = p_partkey
      WHERE l.l_returnflag = 'N' AND p_type <> 'PROMO'
        AND year(l.l_shipdate) = 1997)
    SELECT channel, id,
           cast(round(sum(sales), 2) AS double) AS sales,
           cast(round(sum(returns_amt), 2) AS double) AS returns_amt,
           cast(round(sum(sales - returns_amt), 2) AS double) AS profit
    FROM leg
    GROUP BY ROLLUP(channel, id)
    ORDER BY channel NULLS FIRST, id NULLS FIRST
    LIMIT 100
    """

# q81: customers whose 1996 return total beats 1.2× their nation's average
# (q30 family, earlier year, segment in the payload).
_SQL_NEW7["tpcds_q81"] = """
    WITH ret AS (
      SELECT o_custkey AS ck, c_nationkey AS nk,
             sum(cast(l_extendedprice * (1 + l_tax) AS decimal(38,9))) AS total_ret
      FROM lineitem, orders, customer
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND l_returnflag = 'R' AND year(l_shipdate) = 1996
      GROUP BY o_custkey, c_nationkey
    )
    SELECT c_name, c_mktsegment, n_name,
           cast(round(r1.total_ret, 2) AS double) AS total_returns
    FROM ret r1, customer, nation
    WHERE r1.ck = c_custkey AND c_nationkey = n_nationkey
      AND cast(r1.total_ret AS double) >
          (SELECT 1.2 * avg(cast(r2.total_ret AS double)) FROM ret r2
           WHERE r2.nk = r1.nk)
    ORDER BY total_returns DESC, c_name
    LIMIT 100
    """

# q82: store flavor of q37 — size-band parts with spring-1996 sales and a
# balance-banded supplier EXISTS.
_SQL_NEW7["tpcds_q82"] = """
    SELECT p_name, p_size, round(min(p_retailprice), 2) AS min_price
    FROM part, lineitem
    WHERE p_partkey = l_partkey
      AND p_size BETWEEN 10 AND 30
      AND l_shipdate >= date '1996-04-01' AND l_shipdate < date '1996-07-01'
      AND EXISTS (SELECT 1 FROM supplier
                  WHERE s_suppkey = l_suppkey AND s_acctbal BETWEEN 1000 AND 8000)
    GROUP BY p_name, p_size
    ORDER BY p_name, p_size
    LIMIT 100
    """

# q83: three return channels joined on brand, date gated by a month
# IN-subquery, each leg as a percentage of the three-leg average.
_SQL_NEW7["tpcds_q83"] = """
    WITH mos AS (
      SELECT DISTINCT month(o_orderdate) AS m FROM orders
      WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1997
        AND month(o_orderdate) <= 3),
    sr AS (
      SELECT p_brand AS item, sum(l_quantity) AS qty
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND l_returnflag = 'R'
        AND month(l_shipdate) IN (SELECT m FROM mos)
      GROUP BY p_brand),
    cr AS (
      SELECT p_brand AS item, sum(l_quantity) AS qty
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND l_returnflag = 'A'
        AND month(l_shipdate) IN (SELECT m FROM mos)
      GROUP BY p_brand),
    wr AS (
      SELECT p_brand AS item, sum(l_quantity) AS qty
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND l_returnflag = 'N'
        AND month(l_shipdate) IN (SELECT m FROM mos)
      GROUP BY p_brand)
    SELECT sr.item AS item,
           round(sr.qty, 2) AS sr_items,
           round(cr.qty, 2) AS cr_items,
           round(wr.qty, 2) AS wr_items,
           round(cast(sr.qty AS double) / ((sr.qty + cr.qty + wr.qty) / 3) * 100, 6)
             AS sr_dev
    FROM sr JOIN cr ON sr.item = cr.item
            JOIN wr ON sr.item = wr.item
    ORDER BY item
    LIMIT 100
    """

# q84: plain multi-dimension star lookup with a concatenated display name
# and a balance band.
_SQL_NEW7["tpcds_q84"] = """
    SELECT c_custkey AS customer_id,
           c_name || ', ' || n_name AS customer_name
    FROM customer, nation, region
    WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND c_acctbal BETWEEN 4000 AND 6000
    ORDER BY customer_id
    LIMIT 100
    """

# q86: ROLLUP down the part hierarchy with rank-within-grouping-level
# (grouping() in both the partition key and the ordering).
_SQL_NEW7["tpcds_q86"] = """
    SELECT p_type, p_brand,
           cast(round(total_sum, 2) AS double) AS total_sum,
           lochierarchy, rk
    FROM (
      SELECT p_type, p_brand,
             sum(cast(l_extendedprice AS decimal(38,9))) AS total_sum,
             grouping(p_type) + grouping(p_brand) AS lochierarchy,
             rank() OVER (
               PARTITION BY grouping(p_type) + grouping(p_brand),
                            CASE WHEN grouping(p_brand) = 0 THEN p_type END
               ORDER BY sum(cast(l_extendedprice AS decimal(38,9))) DESC) AS rk
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND l_returnflag = 'A'
        AND year(l_shipdate) = 1997
      GROUP BY ROLLUP(p_type, p_brand)) t
    ORDER BY lochierarchy DESC,
             CASE WHEN lochierarchy = 0 THEN p_type END NULLS FIRST,
             rk, p_type NULLS FIRST, p_brand NULLS FIRST
    LIMIT 100
    """

# q91: return losses by (priority, month) under demographic filters.
_SQL_NEW7["tpcds_q91"] = """
    SELECT o_orderpriority, month(l_shipdate) AS moy,
           cast(round(sum(cast(l_extendedprice * (1 + l_tax) AS decimal(38,9))), 2)
                AS double) AS returns_loss
    FROM lineitem, orders, customer
    WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND l_returnflag = 'R' AND year(l_shipdate) = 1997
      AND c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_acctbal < 5000
    GROUP BY o_orderpriority, month(l_shipdate)
    ORDER BY o_orderpriority, moy
    LIMIT 100
    """

# q92: "excess revenue" — lines priced above 1.3× the per-part average
# (q32 family on the price measure with a size-band filter).
_SQL_NEW7["tpcds_q92"] = """
    SELECT cast(round(sum(cast(l1.l_extendedprice AS decimal(38,9))), 2) AS double)
             AS excess_revenue
    FROM lineitem l1, part
    WHERE l1.l_partkey = p_partkey
      AND p_size BETWEEN 35 AND 50
      AND year(l1.l_shipdate) = 1996
      AND l1.l_extendedprice > (
        SELECT 1.3 * avg(l2.l_extendedprice) FROM lineitem l2
        WHERE l2.l_partkey = l1.l_partkey AND year(l2.l_shipdate) = 1996)
    """

# q93: per-customer net sales after conditional return netting (returned
# lines contribute negatively), finished-lines only.
_SQL_NEW7["tpcds_q93"] = """
    SELECT c_name,
           cast(round(sum(cast(CASE WHEN l_returnflag = 'R'
                                    THEN -(l_extendedprice * (1 - l_discount))
                                    ELSE l_extendedprice * (1 - l_discount)
                               END AS decimal(38,9))), 2) AS double) AS act_sales
    FROM lineitem, orders, customer
    WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND l_linestatus = 'F'
    GROUP BY c_name
    ORDER BY act_sales, c_name
    LIMIT 100
    """

# q94: single-nation shipments with a second-supplier EXISTS and a
# no-returns NOT EXISTS (web flavor of the q16/q21 anti-join family).
_SQL_NEW7["tpcds_q94"] = """
    SELECT cast(count(DISTINCT o_orderkey) AS bigint) AS order_count,
           cast(round(sum(cast(l1.l_extendedprice AS decimal(38,9))), 2) AS double)
             AS total_shipping,
           cast(round(sum(cast(l1.l_extendedprice * (1 - l1.l_discount)
                               AS decimal(38,9))), 2) AS double) AS net_paid
    FROM lineitem l1, orders, supplier
    WHERE l1.l_orderkey = o_orderkey AND l1.l_suppkey = s_suppkey
      AND s_nationkey = 5
      AND year(o_orderdate) = 1997
      AND o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_returnflag = 'R')
    """

# q96: gated star count — events in an evening half-hour for two event
# types, restricted to a customer segment via the user dimension.
_SQL_NEW7["tpcds_q96"] = """
    SELECT cast(count(*) AS bigint) AS cnt
    FROM events, customer
    WHERE user_id = c_custkey
      AND hour(ts) = 20 AND minute(ts) >= 30
      AND event_type IN ('click', 'view')
      AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
    """

# q99: wide day-gap buckets per (priority, line status) — the q62/q50
# latency family at a coarser grain.
_SQL_NEW7["tpcds_q99"] = """
    SELECT o_orderpriority, l_linestatus,
           cast(sum(CASE WHEN gap_days <= 60 THEN 1 ELSE 0 END) AS bigint) AS d60,
           cast(sum(CASE WHEN gap_days > 60 AND gap_days <= 120 THEN 1 ELSE 0 END)
                AS bigint) AS d120,
           cast(sum(CASE WHEN gap_days > 120 AND gap_days <= 180 THEN 1 ELSE 0 END)
                AS bigint) AS d180,
           cast(sum(CASE WHEN gap_days > 180 THEN 1 ELSE 0 END) AS bigint) AS d_over_180
    FROM (
      SELECT o_orderpriority, l_linestatus,
             (year(l_shipdate) * 365 + dayofyear(l_shipdate))
             - (year(o_orderdate) * 365 + dayofyear(o_orderdate)) AS gap_days
      FROM lineitem, orders
      WHERE l_orderkey = o_orderkey AND year(o_orderdate) = 1996
    ) g
    GROUP BY o_orderpriority, l_linestatus
    ORDER BY o_orderpriority, l_linestatus
    """

for _name, _sql in _SQL_NEW7.items():
    _register(_name, _sql)

# --- tpcds-v2.7.0 a/b split variants ---------------------------------------
# The reference additionally ships resources/tpcds-v2.7.0/ where q14/q23/
# q24/q39 are split into a/b pairs; the base battery carries the "a" shape
# under the plain name, these are the "b" halves.
_SQL_V27: dict[str, str] = {}

# q14b: brands sold in BOTH years (INTERSECT across years rather than
# across channels), with the two year legs joined side by side.
_SQL_V27["tpcds_q14b"] = """
    WITH shared AS (
      SELECT p_brand FROM part, lineitem
      WHERE l_partkey = p_partkey AND year(l_shipdate) = 1996
      INTERSECT
      SELECT p_brand FROM part, lineitem
      WHERE l_partkey = p_partkey AND year(l_shipdate) = 1997),
    y1 AS (
      SELECT p_brand, sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))) AS rev
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND year(l_shipdate) = 1996
        AND p_brand IN (SELECT p_brand FROM shared)
      GROUP BY p_brand),
    y2 AS (
      SELECT p_brand, sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))) AS rev
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND year(l_shipdate) = 1997
        AND p_brand IN (SELECT p_brand FROM shared)
      GROUP BY p_brand)
    SELECT y1.p_brand AS p_brand,
           cast(round(y1.rev, 2) AS double) AS rev_1996,
           cast(round(y2.rev, 2) AS double) AS rev_1997
    FROM y1 JOIN y2 ON y1.p_brand = y2.p_brand
    ORDER BY p_brand
    LIMIT 100
    """

# q23b: the per-customer breakdown of q23's frequent-items × best-customers
# revenue (same CTEs, grouped payload instead of one scalar).
_SQL_V27["tpcds_q23b"] = """
    WITH frequent_parts AS (
      SELECT l_partkey
      FROM lineitem
      GROUP BY l_partkey
      HAVING count(DISTINCT l_orderkey) > 4
    ),
    best_customers AS (
      SELECT o_custkey
      FROM orders
      GROUP BY o_custkey
      HAVING sum(cast(o_totalprice AS decimal(38,9))) >
             (SELECT 0.5 * max(cust_total)
              FROM (SELECT sum(cast(o_totalprice AS decimal(38,9))) AS cust_total
                    FROM orders GROUP BY o_custkey) m)
    )
    SELECT c_name,
           cast(round(sum(cast(l_extendedprice AS decimal(38,9))), 2) AS double) AS sales
    FROM lineitem, orders, customer
    WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND l_partkey IN (SELECT l_partkey FROM frequent_parts)
      AND o_custkey IN (SELECT o_custkey FROM best_customers)
      AND year(o_orderdate) = 1996
    GROUP BY c_name
    ORDER BY sales DESC, c_name
    LIMIT 100
    """

# q24b: q24 with the alternate channel/threshold literals (the v2.7.0 pair
# differs only in its filter constant).
_SQL_V27["tpcds_q24b"] = """
    WITH ss AS (
      SELECT c_name, s_name, p_brand,
             sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))) AS netpaid
      FROM lineitem, orders, customer, supplier, part
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND l_suppkey = s_suppkey AND l_partkey = p_partkey
        AND c_nationkey = s_nationkey
        AND l_returnflag = 'N'
      GROUP BY c_name, s_name, p_brand
    )
    SELECT c_name, s_name, p_brand,
           cast(round(netpaid, 2) AS double) AS paid
    FROM ss
    WHERE netpaid > (SELECT 0.1 * avg(netpaid) FROM ss)
    ORDER BY c_name, s_name, p_brand
    LIMIT 100
    """

# q39b: q39's stricter half — the coefficient-of-variation cut applies to
# BOTH months (v2.7.0 raises the second-period threshold).
_SQL_V27["tpcds_q39b"] = """
    WITH inv AS (
      SELECT l_suppkey, month(l_shipdate) AS moy,
             stddev_samp(l_quantity) AS stdev, avg(l_quantity) AS mean
      FROM lineitem
      WHERE year(l_shipdate) = 1996
      GROUP BY l_suppkey, month(l_shipdate)
    ),
    flagged AS (
      SELECT l_suppkey, moy,
             round(CASE WHEN mean = 0 THEN NULL ELSE stdev / mean END, 4) AS cov
      FROM inv
      WHERE CASE WHEN mean = 0 THEN 0 ELSE stdev / mean END > 0.6
    )
    SELECT i1.l_suppkey, i1.moy AS moy1, i1.cov AS cov1,
           i2.moy AS moy2, i2.cov AS cov2
    FROM flagged i1, flagged i2
    WHERE i1.l_suppkey = i2.l_suppkey
      AND i1.moy = 3 AND i2.moy = 4
      AND i2.cov > 0.6
    ORDER BY i1.l_suppkey
    LIMIT 100
    """


# ---------------------------------------------------------------------------
# v2.7.0 "a" rewrite variants: the same result set as the base query via the
# alternate formulation the suite ships (ROLLUP -> explicit UNION of grouping
# levels; OR-of-EXISTS -> IN over a UNION).  Each shares the base query's
# semantics exactly, so correctness cross-checks the two plan shapes against
# one DuckDB answer.

# q27a: ROLLUP(n_name, c_mktsegment) unrolled into three aggregate legs.
_SQL_V27["tpcds_q27a"] = """
    WITH j AS (
      SELECT n_name, c_mktsegment, o_totalprice
      FROM orders, customer, nation
      WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey)
    SELECT n_name, c_mktsegment,
           cast(0 AS bigint) AS g_nation, cast(0 AS bigint) AS g_segment,
           cast(count(*) AS bigint) AS cnt, round(avg(o_totalprice), 2) AS avg_price
    FROM j GROUP BY n_name, c_mktsegment
    UNION ALL
    SELECT n_name, cast(NULL AS string),
           cast(0 AS bigint), cast(1 AS bigint),
           cast(count(*) AS bigint), round(avg(o_totalprice), 2)
    FROM j GROUP BY n_name
    UNION ALL
    SELECT cast(NULL AS string), cast(NULL AS string),
           cast(1 AS bigint), cast(1 AS bigint),
           cast(count(*) AS bigint), round(avg(o_totalprice), 2)
    FROM j
    ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST
    """

# q22a: ROLLUP(p_type, p_brand, p_size) unrolled into four aggregate legs.
_SQL_V27["tpcds_q22a"] = """
    WITH j AS (
      SELECT p_type, p_brand, p_size, l_quantity
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND year(l_shipdate) BETWEEN 1996 AND 1998)
    SELECT p_type, p_brand, p_size, round(avg(l_quantity), 4) AS qoh
    FROM j GROUP BY p_type, p_brand, p_size
    UNION ALL
    SELECT p_type, p_brand, cast(NULL AS int), round(avg(l_quantity), 4)
    FROM j GROUP BY p_type, p_brand
    UNION ALL
    SELECT p_type, cast(NULL AS string), cast(NULL AS int), round(avg(l_quantity), 4)
    FROM j GROUP BY p_type
    UNION ALL
    SELECT cast(NULL AS string), cast(NULL AS string), cast(NULL AS int),
           round(avg(l_quantity), 4)
    FROM j
    ORDER BY qoh, p_type NULLS FIRST, p_brand NULLS FIRST, p_size NULLS FIRST
    LIMIT 100
    """

# q86a: rollup report unrolled; the rank runs over the unioned levels.
_SQL_V27["tpcds_q86a"] = """
    WITH j AS (
      SELECT p_type, p_brand, l_extendedprice
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND l_returnflag = 'A'
        AND year(l_shipdate) = 1997),
    lv AS (
      SELECT p_type, p_brand,
             sum(cast(l_extendedprice AS decimal(38,9))) AS total_sum,
             0 AS lochierarchy
      FROM j GROUP BY p_type, p_brand
      UNION ALL
      SELECT p_type, cast(NULL AS string),
             sum(cast(l_extendedprice AS decimal(38,9))), 1
      FROM j GROUP BY p_type
      UNION ALL
      SELECT cast(NULL AS string), cast(NULL AS string),
             sum(cast(l_extendedprice AS decimal(38,9))), 2
      FROM j)
    SELECT p_type, p_brand,
           cast(round(total_sum, 2) AS double) AS total_sum,
           lochierarchy,
           rank() OVER (PARTITION BY lochierarchy,
                                     CASE WHEN lochierarchy = 0 THEN p_type END
                        ORDER BY total_sum DESC) AS rk
    FROM lv
    ORDER BY lochierarchy DESC,
             CASE WHEN lochierarchy = 0 THEN p_type END NULLS FIRST,
             rk, p_type NULLS FIRST, p_brand NULLS FIRST
    LIMIT 100
    """

# q70a: region/nation rollup unrolled with post-union rank.  The coarser
# legs re-aggregate the finest-grain decimal partials (exact), not the raw
# joined rows: the scan+join+partial-agg subtree then sits under ONE
# reusable exchange, so Spark executes it once for all three legs (runtime
# ReusedExchange — the raw-row form ran the lineitem join per leg).
# Rewritten round 11; proven row-identical to the raw-row form in BOTH
# engines at sf0.001/0.01/0.1.
_SQL_V27["tpcds_q70a"] = """
    WITH pre AS (
      SELECT r_name, n_name,
             sum(cast(l_extendedprice AS decimal(38,9))) AS total_sum
      FROM lineitem, supplier, nation, region
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_regionkey = r_regionkey
      GROUP BY r_name, n_name),
    lv AS (
      SELECT r_name, n_name, total_sum, 0 AS lochierarchy FROM pre
      UNION ALL
      SELECT r_name, cast(NULL AS string), sum(total_sum), 1
      FROM pre GROUP BY r_name
      UNION ALL
      SELECT cast(NULL AS string), cast(NULL AS string), sum(total_sum), 2
      FROM pre)
    SELECT cast(round(total_sum, 2) AS double) AS total_sum,
           r_name, n_name, lochierarchy,
           cast(rank() OVER (PARTITION BY lochierarchy,
                                          CASE WHEN lochierarchy >= 1 THEN r_name END
                             ORDER BY total_sum DESC) AS bigint) AS rk
    FROM lv
    ORDER BY lochierarchy DESC,
             CASE WHEN lochierarchy = 0 THEN r_name END,
             rk, r_name NULLS FIRST, n_name NULLS FIRST
    LIMIT 100
    """

# q10a: the OR of correlated EXISTS legs becomes IN over a UNION of keys.
_SQL_V27["tpcds_q10a"] = """
    SELECT c_mktsegment, n_name, cast(count(*) AS bigint) AS cnt
    FROM customer, nation
    WHERE c_nationkey = n_nationkey
      AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      AND c_custkey IN (
        SELECT o.o_custkey FROM orders o, lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
        UNION
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    GROUP BY c_mktsegment, n_name
    ORDER BY c_mktsegment, n_name
    """

# q35a: same union-of-keys rewrite for the two returnflag legs.
_SQL_V27["tpcds_q35a"] = """
    SELECT c_mktsegment, n_name,
           cast(count(*) AS bigint) AS cnt,
           round(min(c_acctbal), 2) AS min_bal,
           round(max(c_acctbal), 2) AS max_bal,
           cast(round(avg(cast(c_acctbal AS decimal(38,9))), 4) AS double) AS avg_bal
    FROM customer, nation
    WHERE c_nationkey = n_nationkey
      AND EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND year(o_orderdate) = 1997)
      AND c_custkey IN (
        SELECT o_custkey FROM orders, lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'A'
        UNION
        SELECT o_custkey FROM orders, lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'N')
    GROUP BY c_mktsegment, n_name
    ORDER BY c_mktsegment, n_name
    LIMIT 100
    """



# q36a: gross-margin rollup unrolled into union-of-levels (ratio computed
# per leg from the same finest-grain partials as the base).
_SQL_V27["tpcds_q36a"] = """
    WITH pre AS (
      SELECT p_type, p_brand,
             sum(cast(l_extendedprice * (1 - l_discount) - l_quantity * 100
                      AS decimal(38,9))) AS margin_s,
             sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))) AS gross_s
      FROM lineitem, part
      WHERE l_partkey = p_partkey
      GROUP BY p_type, p_brand),
    agg AS (
      SELECT p_type AS pt, p_brand AS pb, 0 AS lochierarchy,
             round(cast(margin_s AS double) / cast(gross_s AS double), 6) AS gross_margin
      FROM pre
      UNION ALL
      SELECT p_type, 'ALL', 1,
             round(cast(sum(margin_s) AS double) / cast(sum(gross_s) AS double), 6)
      FROM pre GROUP BY p_type
      UNION ALL
      SELECT 'ALL', 'ALL', 2,
             round(cast(sum(margin_s) AS double) / cast(sum(gross_s) AS double), 6)
      FROM pre)
    SELECT pt, pb, lochierarchy, gross_margin,
           rank() OVER (PARTITION BY lochierarchy,
                                     CASE WHEN lochierarchy = 0 THEN pt END
                        ORDER BY gross_margin ASC, pb) AS rank_within_parent
    FROM agg
    ORDER BY lochierarchy DESC, pt, rank_within_parent, pb
    LIMIT 100
    """

# q67a: the 4-level sales rollup unrolled; per-type top-5 rank over the
# unioned levels.
_SQL_V27["tpcds_q67a"] = """
    WITH pre AS (
      SELECT p_type, p_brand, p_size,
             sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))) AS s
      FROM lineitem, part
      WHERE l_partkey = p_partkey
      GROUP BY p_type, p_brand, p_size),
    agg AS (
      SELECT p_type AS pt, p_brand AS pb, p_size AS psz,
             cast(round(s, 2) AS double) AS sumsales
      FROM pre
      UNION ALL
      SELECT p_type, p_brand, -1, cast(round(sum(s), 2) AS double)
      FROM pre GROUP BY p_type, p_brand
      UNION ALL
      SELECT p_type, 'ALL', -1, cast(round(sum(s), 2) AS double)
      FROM pre GROUP BY p_type
      UNION ALL
      SELECT 'ALL', 'ALL', -1,
             cast(round(sum(s), 2) AS double)
      FROM pre)
    SELECT pt, pb, psz, sumsales, rnk
    FROM (
      SELECT pt, pb, psz, sumsales,
             rank() OVER (PARTITION BY pt
                          ORDER BY sumsales DESC, pb, psz) AS rnk
      FROM agg) ranked
    WHERE rnk <= 5
    ORDER BY pt, rnk, pb, psz
    """



# q5a: channel/nation rollup unrolled over the finest-grain partial
# (decimal sums re-aggregate exactly; 'ALL' markers like the base).
_SQL_V27["tpcds_q5a"] = """
    WITH all_sales AS (
      SELECT CASE WHEN l_linestatus = 'O' THEN 'web' ELSE 'store' END AS channel,
             n_name,
             cast(l_extendedprice * (1 - l_discount) AS decimal(38,9)) AS sales,
             CASE WHEN l_returnflag = 'R'
                  THEN cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))
                  ELSE cast(0 AS decimal(38,9)) END AS returns_,
             cast(l_extendedprice * (1 - l_discount) - l_quantity * 100
                  AS decimal(38,9)) AS profit
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey),
    pre AS (
      SELECT channel, n_name, sum(sales) AS sales, sum(returns_) AS returns_,
             sum(profit) AS profit
      FROM all_sales GROUP BY channel, n_name)
    SELECT channel, nation,
           cast(round(sales, 2) AS double) AS sales,
           cast(round(returns_, 2) AS double) AS returns_,
           cast(round(profit, 2) AS double) AS profit
    FROM (
      SELECT channel, n_name AS nation, sales, returns_, profit FROM pre
      UNION ALL
      SELECT channel, 'ALL', sum(sales), sum(returns_), sum(profit)
      FROM pre GROUP BY channel
      UNION ALL
      SELECT 'ALL', 'ALL', sum(sales), sum(returns_), sum(profit) FROM pre) lv
    ORDER BY channel, nation
    """

# q18a: the 4-level demographic-averages rollup unrolled; averages rebuilt
# as sum/count from the shared finest-grain partial.
_SQL_V27["tpcds_q18a"] = """
    WITH pre AS (
      SELECT r_name, n_name, c_mktsegment,
             cast(count(*) AS bigint) AS cnt,
             sum(l_quantity) AS sq,
             sum(cast(l_extendedprice AS decimal(38,9))) AS sp,
             sum(l_discount) AS sd,
             sum(cast(o_totalprice AS decimal(38,9))) AS st
      FROM lineitem, orders, customer, nation, region
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND year(o_orderdate) = 1997
      GROUP BY r_name, n_name, c_mktsegment),
    lv AS (
      SELECT r_name, n_name, c_mktsegment, cnt, sq, sp, sd, st FROM pre
      UNION ALL
      SELECT r_name, n_name, cast(NULL AS string),
             sum(cnt), sum(sq), sum(sp), sum(sd), sum(st)
      FROM pre GROUP BY r_name, n_name
      UNION ALL
      SELECT r_name, cast(NULL AS string), cast(NULL AS string),
             sum(cnt), sum(sq), sum(sp), sum(sd), sum(st)
      FROM pre GROUP BY r_name
      UNION ALL
      SELECT cast(NULL AS string), cast(NULL AS string), cast(NULL AS string),
             sum(cnt), sum(sq), sum(sp), sum(sd), sum(st)
      FROM pre)
    SELECT r_name, n_name, c_mktsegment,
           cast(round(sq / cnt, 4) AS double) AS avg_qty,
           cast(round(sp / cnt, 2) AS double) AS avg_price,
           cast(round(sd / cnt, 6) AS double) AS avg_disc,
           cast(round(st / cnt, 2) AS double) AS avg_total,
           cast(cnt AS bigint) AS n_rows
    FROM lv
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST, c_mktsegment NULLS FIRST
    LIMIT 100
    """

# q77a: the channel/nation P&L rollup unrolled over the channel legs.
_SQL_V27["tpcds_q77a"] = """
    WITH ss AS (
      SELECT s_nationkey AS nk, sum(cast(l_extendedprice AS decimal(38,9))) AS sales
      FROM lineitem, supplier
      WHERE l_suppkey = s_suppkey AND l_returnflag = 'N' AND year(l_shipdate) = 1997
      GROUP BY s_nationkey),
    sr AS (
      SELECT s_nationkey AS nk,
             sum(cast(l_extendedprice * (1 + l_tax) AS decimal(38,9))) AS ret
      FROM lineitem, supplier
      WHERE l_suppkey = s_suppkey AND l_returnflag = 'R'
        AND year(l_shipdate) = 1997 AND month(l_shipdate) <= 6
      GROUP BY s_nationkey),
    cs AS (
      SELECT s_nationkey AS nk, sum(cast(l_extendedprice AS decimal(38,9))) AS sales
      FROM lineitem, supplier
      WHERE l_suppkey = s_suppkey AND l_returnflag = 'A' AND year(l_shipdate) = 1997
      GROUP BY s_nationkey),
    cr AS (
      SELECT s_nationkey AS nk,
             sum(cast(l_extendedprice * (1 + l_tax) AS decimal(38,9))) AS ret
      FROM lineitem, supplier
      WHERE l_suppkey = s_suppkey AND l_returnflag = 'R'
        AND year(l_shipdate) = 1997 AND month(l_shipdate) > 6
      GROUP BY s_nationkey),
    t AS (
      SELECT 'store channel' AS channel, ss.nk AS nk, ss.sales AS sales,
             coalesce(sr.ret, 0) AS returns_amt,
             ss.sales - coalesce(sr.ret, 0) AS profit
      FROM ss LEFT JOIN sr ON ss.nk = sr.nk
      UNION ALL
      SELECT 'catalog channel' AS channel, coalesce(cs.nk, cr.nk) AS nk,
             coalesce(cs.sales, 0) AS sales,
             coalesce(cr.ret, 0) AS returns_amt,
             coalesce(cs.sales, 0) - coalesce(cr.ret, 0) AS profit
      FROM cs FULL OUTER JOIN cr ON cs.nk = cr.nk)
    SELECT channel, nk,
           cast(round(sum(sales), 2) AS double) AS sales,
           cast(round(sum(returns_amt), 2) AS double) AS returns_amt,
           cast(round(sum(profit), 2) AS double) AS profit
    FROM (
      SELECT channel, nk, sales, returns_amt, profit FROM t
      UNION ALL
      SELECT channel, cast(NULL AS bigint), sales, returns_amt, profit FROM t
      UNION ALL
      SELECT cast(NULL AS string), cast(NULL AS bigint), sales, returns_amt, profit
      FROM t) lv
    GROUP BY channel, nk
    ORDER BY channel NULLS FIRST, nk NULLS FIRST
    LIMIT 100
    """

# q80a: the channel/brand return-netting rollup unrolled the same way.  The
# union legs project the (channel, brand) GROUPED partials, not the raw
# netted lines (exact: decimal sums are linear, so sum(sales - returns_amt)
# over raw rows equals the same sum over per-group partials) — the heavy
# scan + return-netting join subtree sits under one reusable exchange and
# executes once for all three legs.  Rewritten round 11; proven
# row-identical to the raw-row form in BOTH engines at sf0.001/0.01/0.1.
_SQL_V27["tpcds_q80a"] = """
    WITH ret AS (
      SELECT l_orderkey AS ok, l_partkey AS pk,
             sum(cast(l_extendedprice * (1 + l_tax) AS decimal(38,9))) AS ret_amt
      FROM lineitem WHERE l_returnflag = 'R'
      GROUP BY l_orderkey, l_partkey),
    leg AS (
      SELECT CASE WHEN l.l_linestatus = 'F' THEN 'store channel'
                  ELSE 'web channel' END AS channel,
             p_brand AS id,
             cast(l.l_extendedprice AS decimal(38,9)) AS sales,
             coalesce(r.ret_amt, 0) AS returns_amt
      FROM lineitem l
      LEFT JOIN ret r ON l.l_orderkey = r.ok AND l.l_partkey = r.pk
      JOIN part ON l.l_partkey = p_partkey
      WHERE l.l_returnflag = 'N' AND p_type <> 'PROMO'
        AND year(l.l_shipdate) = 1997),
    pre AS (
      SELECT channel, id, sum(sales) AS sales, sum(returns_amt) AS returns_amt
      FROM leg GROUP BY channel, id)
    SELECT channel, id,
           cast(round(sum(sales), 2) AS double) AS sales,
           cast(round(sum(returns_amt), 2) AS double) AS returns_amt,
           cast(round(sum(sales - returns_amt), 2) AS double) AS profit
    FROM (
      SELECT channel, id, sales, returns_amt FROM pre
      UNION ALL
      SELECT channel, cast(NULL AS string), sales, returns_amt FROM pre
      UNION ALL
      SELECT cast(NULL AS string), cast(NULL AS string), sales, returns_amt FROM pre) lv
    GROUP BY channel, id
    ORDER BY channel NULLS FIRST, id NULLS FIRST
    LIMIT 100
    """

# q51a: the FULL OUTER channel merge rewritten as union + max-per-key
# (each (brand, moy) appears at most once per side, so max == the value).
_SQL_V27["tpcds_q51a"] = """
    WITH store_v AS (
      SELECT p_brand, month(o_orderdate) AS moy,
             sum(cast(l_extendedprice AS decimal(38,9))) AS sales
      FROM lineitem, orders, part
      WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
        AND o_orderstatus = 'F' AND year(o_orderdate) = 1996
      GROUP BY p_brand, month(o_orderdate)),
    web_v AS (
      SELECT p_brand, month(o_orderdate) AS moy,
             sum(cast(l_extendedprice AS decimal(38,9))) AS sales
      FROM lineitem, orders, part
      WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
        AND o_orderstatus = 'O' AND year(o_orderdate) = 1996
      GROUP BY p_brand, month(o_orderdate)),
    merged AS (
      SELECT brand, moy,
             max(store_sales) AS store_sales, max(web_sales) AS web_sales
      FROM (
        SELECT p_brand AS brand, moy, sales AS store_sales,
               cast(NULL AS decimal(38,9)) AS web_sales
        FROM store_v
        UNION ALL
        SELECT p_brand, moy, cast(NULL AS decimal(38,9)), sales FROM web_v) u
      GROUP BY brand, moy),
    cume AS (
      SELECT brand, moy,
             sum(store_sales) OVER (PARTITION BY brand ORDER BY moy
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS store_cume,
             sum(web_sales) OVER (PARTITION BY brand ORDER BY moy
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS web_cume
      FROM merged)
    SELECT brand, moy,
           cast(round(store_cume, 2) AS double) AS store_cume,
           cast(round(web_cume, 2) AS double) AS web_cume
    FROM cume
    WHERE web_cume > store_cume
    ORDER BY brand, moy
    LIMIT 100
    """

# q14a: the three-way INTERSECT of cross-channel brands collapsed to one
# pass (returnflag domain is exactly {A, N, R}, so present-in-all-three ==
# count(DISTINCT l_returnflag) = 3).
_SQL_V27["tpcds_q14a"] = """
    WITH cross_items AS (
      SELECT p_brand FROM part, lineitem
      WHERE l_partkey = p_partkey
      GROUP BY p_brand
      HAVING count(DISTINCT l_returnflag) = 3)
    SELECT p_brand,
           cast(count(*) AS bigint) AS n_sales,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2)
                AS double) AS revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND p_brand IN (SELECT p_brand FROM cross_items)
      AND year(l_shipdate) = 1996
    GROUP BY p_brand
    ORDER BY revenue DESC, p_brand
    LIMIT 100
    """


for _name, _sql in _SQL_V27.items():
    _register(_name, _sql)


# --- round 11 negative result: shared-CTE materialization NOT adopted -------
#
# Measured and REVERTED: a split runner that computed each rollup-variant's
# finest-grain `pre` CTE once, materialized it (materialize.py) and ran the
# rest over the temp view.  Plans/r11 dumps show initial-plan Exchange counts
# collapsing (q36a 18->6, q5a 24->6, q67a 26->10), but a 6-rep in-session
# alternating A/B at sf0.1 measured FLAT to slightly worse (old medians
# 9.385 s vs new 9.050 s driven entirely by q70; the five split entries were
# 0.96-1.14x, 7/30 new-wins): Spark's exchange reuse already deduplicates the
# inlined CTE at runtime — the executed plans of the unsplit forms contain
# one ReusedExchange per duplicate leg (q36a/q5a: 2, q67a: 3), so the
# scan+join+partial-agg subtree executes ONCE at any scale and the split only
# adds an eager-materialization job barrier.  Where the legs re-aggregated
# RAW joined rows instead of reusable partials (q70/q70a/q80a), the fix is in
# the shared SQL itself (pre-aggregate before Expand / union from the grouped
# CTE), which both engines run and exchange reuse then shares.
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    name: _runner(sql) for name, sql in SQL.items()
}
ORACLE: dict[str, str] = dict(SQL)
