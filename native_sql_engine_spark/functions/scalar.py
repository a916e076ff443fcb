"""Scalar function registry — the reference's native expression surface.

One entry per Gandiva/native function the reference's expression converter
emits (SURVEY §2.8; ColumnarExpressionConverter.scala:35-300,
ColumnarArithmetic.scala, ColumnarBinaryOperator.scala,
ColumnarDateTimeExpressions.scala:58-509).  Each maps the reference's
function name to its PySpark builder — JVM-side, codegen'd, never a Python
UDF.  This is the engine's declared capability matrix: tests assert every
entry evaluates and matches the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnFn = Callable[..., Column]

#: reference native name → PySpark implementation
FUNCTIONS: dict[str, ColumnFn] = {
    # --- arithmetic (ColumnarArithmetic.scala) ---
    "add": lambda a, b: a + b,
    "subtract": lambda a, b: a - b,
    "multiply": lambda a, b: a * b,
    "divide": lambda a, b: a / b,
    "abs": F.abs,
    "round": F.round,
    "bitwise_and": lambda a, b: a.bitwiseAND(b),
    "bitwise_or": lambda a, b: a.bitwiseOR(b),
    "bitwise_xor": lambda a, b: a.bitwiseXOR(b),
    "bitwise_not": lambda a: F.bitwise_not(a),
    "shift_left": F.shiftleft,
    "shift_right": F.shiftright,
    # NaN normalize (KnownFloatingPointNormalized): Spark normalizes NaN/-0.0
    # in aggregation/join keys automatically (NormalizeFloatingNumbers rule)
    "normalize": lambda a: F.nanvl(a, F.lit(float("nan"))),
    # --- comparison / predicates (ColumnarBinaryOperator.scala) ---
    "equal": lambda a, b: a == b,
    "not_equal": lambda a, b: a != b,
    "less_than": lambda a, b: a < b,
    "less_than_or_equal_to": lambda a, b: a <= b,
    "greater_than": lambda a, b: a > b,
    "greater_than_or_equal_to": lambda a, b: a >= b,
    # *_with_nan variants: Spark's comparators already order NaN last/equal
    "less_than_with_nan": lambda a, b: a < b,
    "greater_than_with_nan": lambda a, b: a > b,
    "equal_with_nan": lambda a, b: a == b,
    "equal_null_safe": lambda a, b: a.eqNullSafe(b),
    "isnull": F.isnull,
    "isnotnull": lambda a: a.isNotNull(),
    "isnan": F.isnan,
    "not": lambda a: ~a,
    "and": lambda a, b: a & b,
    "or": lambda a, b: a | b,
    "in": lambda a, values: a.isin(*values),
    "inset": lambda a, values: a.isin(*values),  # InSet = big literal IN
    "like": lambda a, p: a.like(p),
    "rlike": lambda a, p: a.rlike(p),
    "starts_with": lambda a, p: a.startswith(p),
    "ends_with": lambda a, p: a.endswith(p),
    "is_substr": lambda a, p: a.contains(p),  # Contains
    # --- conditional (ColumnarIfOperator/CaseWhen/Coalesce) ---
    "if": lambda c, t, e: F.when(c, t).otherwise(e),
    "case_when": lambda c, t, e: F.when(c, t).otherwise(e),
    "coalesce": F.coalesce,
    # --- string (ColumnarTernaryOperator.scala:78, ColumnarConcatOperator) ---
    "substr": F.substring,
    "upper": F.upper,
    "lower": F.lower,
    "concatOperator": F.concat,
    "btrim": F.trim,
    "ltrim": F.ltrim,
    "rtrim": F.rtrim,
    "length": F.length,
    "replace": lambda a, s, r: F.replace(a, s, r),
    "space": F.repeat,
    "split_part": F.split_part,
    "instr": F.instr,
    "translate": F.translate,
    # --- casts (ColumnarUnaryOperator.scala) ---
    "castBYTE": lambda a: a.cast("byte"),
    "castSHORT": lambda a: a.cast("short"),
    "castINT": lambda a: a.cast("int"),
    "castBIGINT": lambda a: a.cast("long"),
    "castFLOAT4": lambda a: a.cast("float"),
    "castFLOAT8": lambda a: a.cast("double"),
    "castDATE": lambda a: a.cast("date"),
    "castTIMESTAMP": lambda a: a.cast("timestamp"),
    "castDECIMAL": lambda a, p, s: a.cast(f"decimal({p},{s})"),
    # non-ANSI cast: overflow → NULL (spark.sql.ansi.enabled=false + try_cast)
    "castDECIMALNullOnOverflow": lambda a, p, s: a.try_cast(f"decimal({p},{s})"),
    "castVARCHAR": lambda a: a.cast("string"),
    "rescaleDECIMAL": lambda a, p, s: a.cast(f"decimal({p},{s})"),
    # --- date/time (ColumnarDateTimeExpressions.scala:58-509) ---
    "extractYear": F.year,
    "extractMonth": F.month,
    "extractDay": F.dayofmonth,
    "extractHour": F.hour,
    "extractMinute": F.minute,
    "extractSecond": F.second,
    "dayOfWeek": F.dayofweek,
    "dayOfYear": F.dayofyear,
    "unixDate": F.unix_date,
    "unixSeconds": F.unix_seconds,
    "unixMillis": F.unix_millis,
    "unixMicros": F.unix_micros,
    "secondsToTimestamp": F.timestamp_seconds,
    "millisToTimestamp": F.timestamp_millis,
    "microsToTimestamp": F.timestamp_micros,
    "unixTimestamp": F.unix_timestamp,
    "dateDiff": F.datediff,
    "makeDate": F.make_date,
    "makeTimestamp": F.make_timestamp,
    "currentDate": F.current_date,
    "currentTimestamp": F.current_timestamp,
    "now": F.now,
    "dateAddYearMonthInterval": F.add_months,
    "dateTrunc": F.date_trunc,
    "lastDay": F.last_day,
    # --- literals / misc ---
    "literal": F.lit,
    # math — row-fallback in the reference, first-class here (§2.8 last row)
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "asin": F.asin,
    "acos": F.acos,
    "atan": F.atan,
    "exp": F.exp,
    "log": F.log,
    "log10": F.log10,
    "log2": F.log2,
    "pow": F.pow,
    "sqrt": F.sqrt,
    "cbrt": F.cbrt,
    "ceil": F.ceil,
    "floor": F.floor,
    "sign": F.signum,
    "pmod": F.pmod,
    "greatest": F.greatest,
    "least": F.least,
    "nanvl": F.nanvl,
    "nullif": F.nullif,
    "md5": F.md5,
    "sha2": F.sha2,
    "crc32": F.crc32,
    "xxhash64": F.xxhash64,
    "murmur3hash": F.hash,
}


def get(name: str) -> ColumnFn:
    return FUNCTIONS[name]
