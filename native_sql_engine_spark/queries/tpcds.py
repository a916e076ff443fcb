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
      AND n_name IN ('FRANCE', 'GERMANY', 'EGYPT', 'JAPAN', 'BRAZIL')
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
      AND n_name IN ('CHINA', 'INDIA', 'RUSSIA', 'CANADA', 'KENYA')
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

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    name: _runner(sql) for name, sql in SQL.items()
}
ORACLE: dict[str, str] = dict(SQL)
