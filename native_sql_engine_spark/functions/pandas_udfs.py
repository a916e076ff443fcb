"""Pandas/Arrow UDF surface — parity with the reference's columnar Python UDFs.

The reference's one UDF innovation is feeding pandas UDFs Arrow batches
without row conversion (ColumnarArrowEvalPythonExec.scala:51,204-243, toggle
spark.oap.sql.columnar.arrowudf).  PySpark's @pandas_udf / applyInPandas /
mapInPandas are the same Arrow-batched transport, built in — this module
pins the idioms the engine blesses and the tests verify:

- scalar ``@pandas_udf``: vectorized per-batch columns (the hot-path shape);
- grouped-agg ``@pandas_udf``: a UDAF (reference: row fallback only);
- ``applyInPandas``: grouped-map UDAF-ish transforms;
- ``mapInPandas``: whole-partition batch iteration (multimodal decode path).

Scale: every one of these ships ~10k-row Arrow batches across the process
boundary (spark.sql.execution.arrow.maxRecordsPerBatch, same knob as the
reference's batch size) — never per-row pickling.  Still 10-100× slower than
staying JVM-side, so the engine only drops to these when column expressions
can't express the kernel (see operators/multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.DoubleType())
def discounted_revenue(extended: pd.Series, discount: pd.Series) -> pd.Series:
    """Scalar pandas UDF: revenue = extendedprice * (1 - discount).
    (Expressible as a column op — kept as the canonical scalar-UDF test.)"""
    return extended * (1.0 - discount)


@pandas_udf(T.DoubleType())
def geo_mean(values: pd.Series) -> float:
    """Grouped-agg pandas UDF (UDAF): geometric mean of positive values."""
    import numpy as np

    v = values[values > 0]
    if len(v) == 0:
        return 0.0
    return float(np.exp(np.log(v.astype("float64")).mean()))


def weighted_avg_apply(df: DataFrame, group_col: str, value_col: str,
                       weight_col: str) -> DataFrame:
    """applyInPandas grouped-map: weighted average per group.

    One shuffle on the group key; each group is a single pandas frame —
    callers must keep groups bounded (salting first if a key is hot)."""
    schema = T.StructType(
        [
            T.StructField(group_col, T.StringType()),
            T.StructField("weighted_avg", T.DoubleType()),
        ]
    )

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        w = pdf[weight_col].sum()
        val = (pdf[value_col] * pdf[weight_col]).sum() / w if w else 0.0
        return pd.DataFrame({group_col: [pdf[group_col].iloc[0]], "weighted_avg": [val]})

    return df.groupBy(group_col).applyInPandas(agg, schema)


def zscore_map(df: DataFrame, value_col: str, mean: float, std: float,
               out_col: str = "zscore") -> DataFrame:
    """mapInPandas: per-batch z-score against precomputed global moments.

    Stats come in as plan literals (computed by a prior aggregate), so the
    pass stays embarrassingly parallel — no second shuffle."""
    fields = df.schema.fields + [T.StructField(out_col, T.DoubleType())]
    schema = T.StructType(fields)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf[out_col] = (pdf[value_col] - mean) / std if std else 0.0
            yield pdf

    return df.mapInPandas(batches, schema)


def charge_map_arrow(df: DataFrame) -> DataFrame:
    """mapInArrow: per-batch pyarrow.compute pass with NO pandas detour —
    the closest vanilla-Spark analog of the reference's native columnar
    processing (batches stay Arrow end-to-end: JVM -> arrow IPC ->
    pyarrow.compute kernels -> arrow IPC -> JVM).

    Appends charge = extendedprice * (1 - discount) * (1 + tax).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    schema = T.StructType(df.schema.fields + [T.StructField("charge", T.DoubleType())])

    def batches(it):
        for batch in it:
            ep = batch.column(batch.schema.get_field_index("l_extendedprice"))
            disc = batch.column(batch.schema.get_field_index("l_discount"))
            tax = batch.column(batch.schema.get_field_index("l_tax"))
            charge = pc.multiply(
                pc.multiply(ep, pc.subtract(pa.scalar(1.0), disc)),
                pc.add(pa.scalar(1.0), tax),
            )
            yield batch.append_column("charge", charge)

    return df.mapInArrow(batches, schema)


@pandas_udf(T.DoubleType())
def pd_mean(values: pd.Series) -> float:
    """Grouped-agg pandas UDF usable OVER a window (WindowInPandasExec —
    reference operators.md row 27, a row-version fallback there)."""
    return float(values.mean())


@pandas_udf(T.DoubleType())
def pd_stddev(values: pd.Series) -> float:
    """Sample standard deviation (ddof=1, matches stddev_samp) as a
    grouped-agg pandas UDF for window use."""
    return float(values.std(ddof=1))
