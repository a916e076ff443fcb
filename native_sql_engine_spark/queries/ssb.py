"""Star-Schema-Benchmark battery, adapted to the driver star schema.

The reference ships SSB 1.1-4.3
(/root/reference/native-sql-engine/core/src/test/resources/ssb/*.sql) over a
lineorder/date/part/supplier/customer star.  The driver data has no lineorder
or date dim, so each query is re-expressed on lineitem⋈orders (the fact) with
customer/supplier/part/nation/region dims — same shape: star joins with
dimension filters, year rollups, revenue/profit aggregation.

Flight-1 revenue = sum(extendedprice*discount) with year+discount+quantity
filters; flight-2 groups by year×brand under part/supplier-region filters;
flight-3 customer-nation × supplier-nation volume by year; flight-4 profit.
All shared-dialect SQL (runs verbatim on Spark and DuckDB).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_tables

SQL: dict[str, str] = {}

_YEAR = "cast(extract(year FROM o_orderdate) AS bigint)"
_SHIPYEAR = "cast(extract(year FROM l_shipdate) AS bigint)"

# --- flight 1: restricted revenue scans -----------------------------------
SQL["ssb_q1_1"] = f"""
    SELECT cast(round(sum(cast(l_extendedprice * l_discount AS decimal(38,9))), 2) AS double) AS revenue
    FROM lineitem, orders
    WHERE l_orderkey = o_orderkey
      AND {_YEAR} = 1996
      AND l_discount BETWEEN 0.01 AND 0.03
      AND l_quantity < 25
"""
SQL["ssb_q1_2"] = f"""
    SELECT cast(round(sum(cast(l_extendedprice * l_discount AS decimal(38,9))), 2) AS double) AS revenue
    FROM lineitem, orders
    WHERE l_orderkey = o_orderkey
      AND cast(extract(month FROM o_orderdate) AS bigint) = 1
      AND {_YEAR} = 1996
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity BETWEEN 26 AND 35
"""
SQL["ssb_q1_3"] = f"""
    SELECT cast(round(sum(cast(l_extendedprice * l_discount AS decimal(38,9))), 2) AS double) AS revenue
    FROM lineitem, orders
    WHERE l_orderkey = o_orderkey
      AND cast(extract(week FROM o_orderdate) AS bigint) = 6
      AND {_YEAR} = 1996
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity BETWEEN 26 AND 35
"""

# --- flight 2: year × brand revenue under dim filters ----------------------
SQL["ssb_q2_1"] = f"""
    SELECT cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2) AS double) AS revenue,
           {_YEAR} AS d_year, p_brand
    FROM lineitem, orders, part, supplier, nation, region
    WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
      AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND p_type = 'SMALL' AND r_name = 'AMERICA'
    GROUP BY d_year, p_brand
    ORDER BY d_year, p_brand
"""
SQL["ssb_q2_2"] = f"""
    SELECT cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2) AS double) AS revenue,
           {_YEAR} AS d_year, p_brand
    FROM lineitem, orders, part, supplier, nation, region
    WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
      AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND p_brand BETWEEN 'Brand#12' AND 'Brand#18' AND r_name = 'ASIA'
    GROUP BY d_year, p_brand
    ORDER BY d_year, p_brand
"""
SQL["ssb_q2_3"] = f"""
    SELECT cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2) AS double) AS revenue,
           {_YEAR} AS d_year, p_brand
    FROM lineitem, orders, part, supplier, nation, region
    WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
      AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND p_brand = 'Brand#14' AND r_name = 'EUROPE'
    GROUP BY d_year, p_brand
    ORDER BY d_year, p_brand
"""

# --- flight 3: customer-nation × supplier-nation volume --------------------
SQL["ssb_q3_1"] = f"""
    SELECT n1.n_name AS c_nation, n2.n_name AS s_nation, {_YEAR} AS d_year,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2) AS double) AS revenue
    FROM customer, orders, lineitem, supplier, nation n1, nation n2,
         region r1, region r2
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = n1.n_nationkey AND s_nationkey = n2.n_nationkey
      AND n1.n_regionkey = r1.r_regionkey AND n2.n_regionkey = r2.r_regionkey
      AND r1.r_name = 'ASIA' AND r2.r_name = 'ASIA'
      AND {_YEAR} BETWEEN 1996 AND 1998
    GROUP BY c_nation, s_nation, d_year
    ORDER BY d_year, revenue DESC, c_nation, s_nation
"""
SQL["ssb_q3_2"] = f"""
    SELECT n1.n_name AS c_nation, n2.n_name AS s_nation, {_YEAR} AS d_year,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2) AS double) AS revenue
    FROM customer, orders, lineitem, supplier, nation n1, nation n2
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = n1.n_nationkey AND s_nationkey = n2.n_nationkey
      AND n1.n_name IN ('NATION_1', 'NATION_2')
      AND n2.n_name IN ('NATION_1', 'NATION_2')
      AND {_YEAR} BETWEEN 1996 AND 1998
    GROUP BY c_nation, s_nation, d_year
    ORDER BY d_year, revenue DESC, c_nation, s_nation
"""
SQL["ssb_q3_3"] = f"""
    SELECT n1.n_name AS c_nation, n2.n_name AS s_nation, {_SHIPYEAR} AS d_year,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2) AS double) AS revenue
    FROM customer, orders, lineitem, supplier, nation n1, nation n2
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = n1.n_nationkey AND s_nationkey = n2.n_nationkey
      AND n1.n_name IN ('NATION_3', 'NATION_7')
      AND n2.n_name IN ('NATION_3', 'NATION_7')
      AND {_SHIPYEAR} BETWEEN 1996 AND 1998
    GROUP BY c_nation, s_nation, d_year
    ORDER BY d_year, revenue DESC, c_nation, s_nation
"""
SQL["ssb_q3_4"] = f"""
    SELECT n1.n_name AS c_nation, n2.n_name AS s_nation, {_YEAR} AS d_year,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(38,9))), 2) AS double) AS revenue
    FROM customer, orders, lineitem, supplier, nation n1, nation n2
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = n1.n_nationkey AND s_nationkey = n2.n_nationkey
      AND n1.n_name IN ('NATION_3', 'NATION_7')
      AND n2.n_name IN ('NATION_3', 'NATION_7')
      AND cast(extract(month FROM o_orderdate) AS bigint) = 12
      AND {_YEAR} = 1997
    GROUP BY c_nation, s_nation, d_year
    ORDER BY d_year, revenue DESC, c_nation, s_nation
"""

# --- flight 4: profit drill-down -------------------------------------------
SQL["ssb_q4_1"] = f"""
    SELECT {_YEAR} AS d_year, n1.n_name AS c_nation,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity AS decimal(38,9))), 2) AS double) AS profit
    FROM customer, orders, lineitem, supplier, part, nation n1, nation n2,
         region r1, region r2
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND l_partkey = p_partkey
      AND c_nationkey = n1.n_nationkey AND s_nationkey = n2.n_nationkey
      AND n1.n_regionkey = r1.r_regionkey AND n2.n_regionkey = r2.r_regionkey
      AND r1.r_name = 'AMERICA' AND r2.r_name = 'AMERICA'
      AND p_type IN ('ECONOMY', 'PROMO')
    GROUP BY d_year, c_nation
    ORDER BY d_year, c_nation
"""
SQL["ssb_q4_2"] = f"""
    SELECT {_YEAR} AS d_year, n2.n_name AS s_nation, p_type,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity AS decimal(38,9))), 2) AS double) AS profit
    FROM customer, orders, lineitem, supplier, part, nation n1, nation n2,
         region r1, region r2
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND l_partkey = p_partkey
      AND c_nationkey = n1.n_nationkey AND s_nationkey = n2.n_nationkey
      AND n1.n_regionkey = r1.r_regionkey AND n2.n_regionkey = r2.r_regionkey
      AND r1.r_name = 'AMERICA' AND r2.r_name = 'AMERICA'
      AND {_YEAR} IN (1997, 1998)
      AND p_type IN ('ECONOMY', 'PROMO')
    GROUP BY d_year, s_nation, p_type
    ORDER BY d_year, s_nation, p_type
"""
SQL["ssb_q4_3"] = f"""
    SELECT {_YEAR} AS d_year, s_nationkey, p_brand,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity AS decimal(38,9))), 2) AS double) AS profit
    FROM orders, lineitem, supplier, part, nation n2
    WHERE l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND l_partkey = p_partkey
      AND s_nationkey = n2.n_nationkey
      AND n2.n_name = 'NATION_9'
      AND {_YEAR} IN (1997, 1998)
      AND p_type = 'ECONOMY'
    GROUP BY d_year, s_nationkey, p_brand
    ORDER BY d_year, s_nationkey, p_brand
"""


def _runner(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_tables(spark, sf_dir)
        return spark.sql(sql)

    return run


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    name: _runner(sql) for name, sql in SQL.items()
}
ORACLE: dict[str, str] = dict(SQL)
