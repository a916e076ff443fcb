"""Pandas-UDF battery — the reference's columnar Python UDF path (§2.10).

Each query routes through an Arrow-batched Python UDF (scalar pandas_udf,
grouped-agg pandas_udf, applyInPandas, mapInPandas) and still hash-matches
the DuckDB oracle — demonstrating the UDF transport is lossless, the same
claim the reference makes for ColumnarArrowEvalPythonExec.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.pandas_udfs import (
    discounted_revenue,
    geo_mean,
    weighted_avg_apply,
    zscore_map,
)

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
    "udf_scalar_pandas",
    """
    SELECT l_returnflag,
           cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount)
                               AS decimal(38,9))), 0) AS double) AS revenue
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF inside an aggregate pipeline."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = discounted_revenue(F.col("l_extendedprice"), F.col("l_discount"))
    return (
        li.select("l_returnflag", rev.cast("decimal(38,9)").alias("_rev"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("_rev"), 0).cast("double").alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


@q(
    "udf_grouped_agg",
    """
    SELECT l_linestatus,
           round(exp(avg(ln(l_quantity))), 4) AS geo_mean_qty
    FROM lineitem WHERE l_quantity > 0
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (UDAF — row-fallback-only in the reference)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    return (
        li.groupBy("l_linestatus")
        .agg(F.round(geo_mean(F.col("l_quantity")), 4).alias("geo_mean_qty"))
        .orderBy("l_linestatus")
    )


@q(
    "udf_apply_in_pandas",
    """
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2)
             AS weighted_avg
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: quantity-weighted mean price per flag.

    Explicit select of the 3 needed columns before the opaque grouped-map:
    Spark cannot see which columns the Python function touches, so without
    it all 16 lineitem columns are scanned, shuffled AND Arrow-shipped to
    the workers (guide §4.1 / §2.3)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    out = weighted_avg_apply(li, "l_returnflag", "l_extendedprice", "l_quantity")
    return out.select(
        "l_returnflag", F.round("weighted_avg", 2).alias("weighted_avg")
    ).orderBy("l_returnflag")


@q(
    "udf_map_in_pandas",
    """
    WITH stats AS (SELECT avg(value) AS mu, stddev_samp(value) AS sd FROM events)
    SELECT event_type,
           cast(sum(CASE WHEN abs((value - mu) / sd) > 2 THEN 1 ELSE 0 END)
                AS bigint) AS n_outliers,
           cast(count(*) AS bigint) AS n
    FROM events, stats
    GROUP BY event_type ORDER BY event_type
    """,
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas z-score pass (global moments as literals), then outlier
    counts per event type."""
    ev = load_table(spark, sf_dir, "events")
    mu, sd = ev.agg(F.avg("value"), F.stddev_samp("value")).first()
    # select the 2 consumed columns before the opaque mapInPandas — Spark
    # cannot prune through it, so the full events row would otherwise be
    # scanned and Arrow-shipped both ways (guide §4.1)
    scored = zscore_map(ev.select("event_type", "value"), "value", float(mu), float(sd))
    return (
        scored.groupBy("event_type")
        .agg(
            F.sum(F.when(F.abs(F.col("zscore")) > 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


@q(
    "udf_python_udtf",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), s -> s <> '') AS toks
      FROM documents WHERE doc_id < 50)
    SELECT doc_id,
           cast(len(toks) AS bigint) AS n_toks,
           toks[1] AS first_tok,
           toks[len(toks)] AS last_tok
    FROM t ORDER BY doc_id
    """,
)
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (PySpark 4 table function — no reference equivalent at
    all, §2.10) in a LATERAL join: a row→rows tokenizer emits (pos, tok)
    per document, re-aggregated to per-doc stats that hash-match the
    set-based oracle — proving the UDTF transport is lossless and
    order-faithful."""
    from ..functions.udtfs import register_udtfs

    register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id,
               cast(count(*) AS bigint) AS n_toks,
               min_by(s.tok, s.pos) AS first_tok,
               max_by(s.tok, s.pos) AS last_tok
        FROM _udtf_docs d, LATERAL split_tokens(d.text) s
        GROUP BY d.doc_id ORDER BY d.doc_id
        """
    )


@q(
    "udf_map_in_arrow",
    """
    SELECT l_returnflag,
           cast(count(*) AS bigint) AS n,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge
    FROM lineitem WHERE l_shipdate <= date '1998-09-02'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow charge computation (pure pyarrow.compute kernels, zero
    pandas conversion) feeding a codegen'd hash aggregate — the vanilla-Spark
    analog of the reference's ColumnarArrowEvalPythonExec batch path, minus
    even the pandas materialization the other UDF entries pay."""
    from ..functions.pandas_udfs import charge_map_arrow

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= "1998-09-02")
        .select("l_returnflag", "l_extendedprice", "l_discount", "l_tax")
    )
    return (
        charge_map_arrow(li)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.round(F.sum("charge"), 2).alias("sum_charge"))
        .orderBy("l_returnflag")
    )


@q(
    "udf_window_in_pandas",
    """
    WITH st AS (
      SELECT event_type, value,
             avg(value) OVER (PARTITION BY event_type) AS mu,
             stddev_samp(value) OVER (PARTITION BY event_type) AS sd
      FROM events)
    SELECT event_type,
           cast(sum(CASE WHEN abs((value - mu) / sd) > 2 THEN 1 ELSE 0 END)
                AS bigint) AS n_outliers,
           cast(count(*) AS bigint) AS n
    FROM st GROUP BY event_type ORDER BY event_type
    """,
)
def udf_window_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDF evaluated OVER a window partition (the reference's
    operators.md row 27 WindowInPandasExec, a row-version fallback there;
    Spark 4 plans it as ArrowWindowPython — fully Arrow-batched, asserted
    in tests/test_plans.py): per-event-type mean/stddev computed by
    grouped-agg pandas UDFs with a Window spec, feeding a codegen'd outlier
    count that hash-matches the built-in window-function oracle."""
    from pyspark.sql import Window as W

    from ..functions.pandas_udfs import pd_mean, pd_stddev

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type")
    st = ev.select(
        "event_type",
        "value",
        pd_mean("value").over(w).alias("mu"),
        pd_stddev("value").over(w).alias("sd"),
    )
    return (
        st.groupBy("event_type")
        .agg(
            F.sum(
                (F.abs((F.col("value") - F.col("mu")) / F.col("sd")) > 2).cast("bigint")
            ).alias("n_outliers"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


@q(
    "udf_arrow_scalar",
    """
    WITH ds AS (
      SELECT o_totalprice,
             list_sum(list_transform(
               string_split(cast(o_orderkey AS varchar), ''),
               x -> cast(x AS int))) % 9 AS bucket
      FROM orders)
    SELECT cast(bucket AS int) AS bucket, cast(count(*) AS bigint) AS n,
           cast(round(sum(cast(o_totalprice AS decimal(38,9))), 2) AS double)
             AS total
    FROM ds GROUP BY bucket ORDER BY bucket
    """,
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (Spark 4 `F.udf(..., useArrow=True)`,
    SPARK-40307): the row-at-a-time Python UDF API with Arrow-batched
    transport — the drop-in upgrade path for legacy `F.udf` code that can't
    be rewritten to pandas_udf.  Kernel = digit-sum bucket of the order key
    (genuinely Pythonic string iteration); plan shows ArrowEvalPython, not
    BatchEvalPython.  The groupBy downstream stays codegen'd; the oracle
    recomputes the digit sum in SQL.  (Hot paths should still prefer
    `pandas_udf` — `udf_scalar_pandas` — but at 100 TB the Arrow transport
    alone is the 10× between this and pickled row UDFs.)"""
    digit_bucket = F.udf(
        lambda k: sum(int(c) for c in str(k)) % 9, "int", useArrow=True
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(digit_bucket("o_orderkey").alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(38,9)")), 2)
            .cast("double")
            .alias("total"),
        )
        .orderBy("bucket")
    )


@q(
    "udf_python_udtf_polymorphic",
    """
    SELECT l_returnflag,
           cast(round(avg(l_quantity * 2.0), 4) AS double) AS avg_qty_x2,
           cast(round(avg(l_discount * 2.0), 4) AS double) AS avg_disc_x2,
           cast(count(*) AS bigint) AS n
    FROM lineitem
    WHERE l_shipdate BETWEEN DATE '1995-06-01' AND DATE '1995-06-30'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def udf_python_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (PySpark 4 `analyze()`): the UDTF's OUTPUT
    SCHEMA is computed at plan time from the input struct — column names
    and arity derive from whatever the caller passes (here the schema
    resolves to l_quantity_x2/l_discount_x2 without any static
    declaration).  The LATERAL join + downstream codegen'd aggregation
    prove the dynamic schema flows through Catalyst like a static one;
    the oracle recomputes the doubled averages directly.  Scoped to one
    ship-month: a per-row Python UDTF is the SLOW path by design (use
    `udf_scalar_pandas`/`mapInPandas` for bulk math); the entry exists
    for the plan-time-polymorphism surface, not throughput."""
    from ..catalog import register_tables
    from ..functions.udtfs import register_udtfs

    register_tables(spark, sf_dir)
    register_udtfs(spark)
    return spark.sql(
        """
        SELECT l.l_returnflag,
               cast(round(avg(s.l_quantity_x2), 4) AS double) AS avg_qty_x2,
               cast(round(avg(s.l_discount_x2), 4) AS double) AS avg_disc_x2,
               count(*) AS n
        FROM (SELECT l_returnflag, l_quantity, l_discount FROM lineitem
              WHERE l_shipdate BETWEEN DATE '1995-06-01'
                                   AND DATE '1995-06-30') l,
             LATERAL scale_numeric(struct(l.l_quantity, l.l_discount)) s
        GROUP BY l.l_returnflag ORDER BY l.l_returnflag
        """
    )


@q(
    "udf_sql_function",
    """
    WITH big AS (
      SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0
    )
    SELECT l_returnflag,
           cast(count(*) AS bigint) AS n,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS disc_revenue,
           round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2)
             AS charged
    FROM lineitem JOIN big ON l_orderkey = o_orderkey
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def udf_sql_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative SQL UDFs (Spark 4: CREATE FUNCTION ... RETURN <expr>) —
    the zero-cost UDF path the reference cannot offer at all (its UDF story
    is JNI-registered native kernels, ExpressionEvaluator.scala): a scalar
    SQL function inlines into the Catalyst plan at analysis time, so it
    codegens with the surrounding expressions — no Python worker, no Arrow
    hop, no JNI.  A SQL *table* function (RETURNS TABLE) likewise inlines
    as a correlated subplan.  Both stay whole-stage-codegen'd; the oracle
    is the hand-inlined SQL."""
    from ..catalog import register_tables

    register_tables(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_rev(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION charged(p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN disc_rev(p, d) * (1.0 + t)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION big_orders(lim DOUBLE) "
        "RETURNS TABLE(o_orderkey BIGINT) "
        "RETURN SELECT o_orderkey FROM orders WHERE o_totalprice > lim"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               cast(count(*) AS bigint) AS n,
               round(sum(disc_rev(l_extendedprice, l_discount)), 2) AS disc_revenue,
               round(sum(charged(l_extendedprice, l_discount, l_tax)), 2) AS charged
        FROM lineitem JOIN big_orders(150000.0D) b ON l_orderkey = b.o_orderkey
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


@q(
    "udf_cogroup_apply",
    """
    WITH o AS (
      SELECT o_custkey,
             cast(count(*) AS bigint) AS n_orders,
             cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint)
               AS cents
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey AS custkey,
           coalesce(o.n_orders, 0) AS n_orders,
           coalesce(o.cents, 0) AS cents,
           cast(round(c.c_acctbal * 100) AS bigint) AS acctbal_cents
    FROM customer c LEFT JOIN o ON c.c_custkey = o.o_custkey
    WHERE c.c_custkey % 50 = 0
    ORDER BY custkey
    """,
)
def udf_cogroup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas`` (FlatMapCoGroupsInPandas) — the two-sided
    Arrow UDF surface: customer and orders groups co-shuffled on the key
    arrive as a PAIR of pandas frames per key, the Python function merges
    them (here: per-customer order rollup against the account balance).
    The reference's columnar engine has no Python co-group at all — its
    closest shape is the JNI hash join.  Arrow-batched both directions;
    both sides hash-partition once on the key, exactly like a shuffle
    join.  BOTH sides pre-filter to the sampled keys — groups that would
    produce no output must never reach Python (each key pays a Python
    function call + frame construction, the per-GROUP overhead that
    dominates this operator; shipping 10× the groups to discard them
    inside the UDF was measured 25× slower).  The oracle is the
    equivalent LEFT JOIN + GROUP BY.

    Round-11 conf sweep (all flat, in-session medians): shuffle
    partitions {32: 2.25, 8: 2.17, 4: 2.17 s} × Arrow batch {10k, 1k:
    2.27 s} — neither lever moves it; the per-group Python call and the
    two-sided Arrow channel ARE the demonstrated surface."""
    import pandas as pd

    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 50 == 0)
        .select("c_custkey", "c_acctbal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 50 == 0)
        .select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
    )

    def merge(cust: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
        if cust.empty:  # defensive: both sides are pre-filtered to the same keys
            return pd.DataFrame(
                {"custkey": [], "n_orders": [], "cents": [], "acctbal_cents": []}
            )
        key = int(cust["c_custkey"].iloc[0])
        bal = cust["c_acctbal"].iloc[0]
        return pd.DataFrame(
            {
                "custkey": [key],
                "n_orders": [len(orders)],
                "cents": [int(orders["cents"].sum()) if len(orders) else 0],
                "acctbal_cents": [int(round(bal * 100))],
            }
        )

    out = c.groupBy("c_custkey").cogroup(o.groupBy("o_custkey")).applyInPandas(
        merge,
        schema="custkey bigint, n_orders bigint, cents bigint, acctbal_cents bigint",
    )
    return out.orderBy("custkey")


@q(
    "udf_apply_in_arrow",
    """
    SELECT l_returnflag,
           cast(count(*) AS bigint) AS n,
           cast(sum(cast(round(l_quantity * 100) AS bigint)) AS bigint)
             AS qty_cents
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped ``applyInArrow`` (Spark 4, FlatMapGroupsInArrow): the group
    arrives as a ``pyarrow.Table`` and the result returns as one — zero
    pandas materialization on either side, the pure-Arrow twin of
    ``applyInPandas`` and the closest Python analog of the reference's
    columnar-batch operator ABI (its kernels also consume/produce Arrow
    record batches, via JNI instead of IPC).  Aggregation inside the group
    uses ``pyarrow.compute`` kernels (vectorized C++).  One hash shuffle on
    the group key, same as any grouped agg."""
    import pyarrow as pa
    import pyarrow.compute as pc

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("qty_cents"),
    )

    def rollup(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": [tbl["l_returnflag"][0].as_py()],
                "n": [tbl.num_rows],
                "qty_cents": [pc.sum(tbl["qty_cents"]).as_py()],
            },
            schema=pa.schema(
                [
                    ("l_returnflag", pa.string()),
                    ("n", pa.int64()),
                    ("qty_cents", pa.int64()),
                ]
            ),
        )

    out = li.groupBy("l_returnflag").applyInArrow(
        rollup, schema="l_returnflag string, n bigint, qty_cents bigint"
    )
    return out.orderBy("l_returnflag")


@q(
    "udf_scalar_iter",
    """
    SELECT l_linestatus,
           cast(count(*) AS bigint) AS n,
           cast(sum(cast(round(l_extendedprice * (1.0 - l_discount) * 100)
                         AS bigint)) AS bigint) AS disc_cents
    FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def udf_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form scalar pandas UDF (``Iterator[pd.Series] ->
    Iterator[pd.Series]``, SCALAR_ITER) — the variant built for expensive
    per-worker initialization (model weights, codec tables): setup runs
    ONCE per Python worker, then streams every Arrow batch through, unlike
    the plain scalar form which has no init hook.  Here the 'expensive
    init' is a trivial constant to keep the oracle exact; the mechanics —
    one worker-lifetime generator wrapping the batch stream — are the
    production shape for UDF-side model scoring over 100 TB."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType is explicit because this module's `from __future__ import
    # annotations` turns type hints into strings the UDF registry can't
    # resolve against function-local imports
    @pandas_udf("double", PandasUDFType.SCALAR_ITER)
    def disc_price_iter(it):
        one = 1.0  # stands in for per-worker init (loaded once)
        for price, disc in it:
            yield price * (one - disc)

    # rounding happens JVM-side: pandas .round() is half-even, SQL round is
    # half-up — keep the tie-breaking convention in one engine
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_linestatus",
            F.round(
                disc_price_iter(F.col("l_extendedprice"), F.col("l_discount"))
                * 100
            )
            .cast("bigint")
            .alias("dc"),
        )
        .groupBy("l_linestatus")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("dc").cast("bigint").alias("disc_cents"),
        )
        .orderBy("l_linestatus")
    )
