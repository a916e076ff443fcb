"""Every entry in the scalar-function registry evaluates and returns the
expected value (the declared-capability check for SURVEY §2.8: the registry
IS the reference's native expression surface, so each name must be backed by
a working JVM-side implementation — one Spark job for all of them)."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

from native_sql_engine_spark.functions.scalar import FUNCTIONS

L = F.lit
D = lambda s: L(s).cast("date")  # noqa: E731
TS = lambda s: L(s).cast("timestamp")  # noqa: E731


def _cases() -> dict[str, tuple[tuple, object]]:
    """name → (args, expected) — built lazily: Column construction needs an
    active SparkContext, which only the ``spark`` fixture guarantees."""
    return {
    "add": ((L(2), L(3)), 5),
    "subtract": ((L(7), L(3)), 4),
    "multiply": ((L(6), L(7)), 42),
    "divide": ((L(7.0), L(2.0)), 3.5),
    "abs": ((L(-4),), 4),
    "round": ((L(2.567), 2), 2.57),
    "bitwise_and": ((L(12), L(10)), 8),
    "bitwise_or": ((L(12), L(10)), 14),
    "bitwise_xor": ((L(12), L(10)), 6),
    "bitwise_not": ((L(0),), -1),
    "shift_left": ((L(1), 4), 16),
    "shift_right": ((L(16), 2), 4),
    "normalize": ((L(1.5),), 1.5),
    "equal": ((L(1), L(1)), True),
    "not_equal": ((L(1), L(2)), True),
    "less_than": ((L(1), L(2)), True),
    "less_than_or_equal_to": ((L(2), L(2)), True),
    "greater_than": ((L(3), L(2)), True),
    "greater_than_or_equal_to": ((L(2), L(2)), True),
    "less_than_with_nan": ((L(1.0), L(2.0)), True),
    "greater_than_with_nan": ((L(3.0), L(2.0)), True),
    "equal_with_nan": ((L(2.0), L(2.0)), True),
    "equal_null_safe": ((L(None).cast("int"), L(None).cast("int")), True),
    "isnull": ((L(None).cast("int"),), True),
    "isnotnull": ((L(1),), True),
    "isnan": ((L(float("nan")),), True),
    "not": ((L(False),), True),
    "and": ((L(True), L(True)), True),
    "or": ((L(False), L(True)), True),
    "in": ((L(2), [1, 2, 3]), True),
    "inset": ((L(9), [7, 8, 9]), True),
    "like": ((L("spark"), "sp%"), True),
    "rlike": ((L("spark"), "^sp.*k$"), True),
    "starts_with": ((L("spark"), "sp"), True),
    "ends_with": ((L("spark"), "rk"), True),
    "is_substr": ((L("spark"), "par"), True),
    "if": ((L(True), L(1), L(2)), 1),
    "case_when": ((L(False), L(1), L(2)), 2),
    "coalesce": ((L(None).cast("int"), L(5)), 5),
    "substr": ((L("abcdef"), 2, 3), "bcd"),
    "upper": ((L("abc"),), "ABC"),
    "lower": ((L("ABC"),), "abc"),
    "concatOperator": ((L("ab"), L("cd")), "abcd"),
    "btrim": ((L("  x  "),), "x"),
    "ltrim": ((L("  x"),), "x"),
    "rtrim": ((L("x  "),), "x"),
    "length": ((L("abcd"),), 4),
    "replace": ((L("aab"), L("a"), L("z")), "zzb"),
    "space": ((L(" "), 3), "   "),
    "split_part": ((L("a,b,c"), L(","), L(2)), "b"),
    "instr": ((L("abcd"), "cd"), 3),
    "translate": ((L("abc"), "ab", "xy"), "xyc"),
    "castBYTE": ((L(7),), 7),
    "castSHORT": ((L(7),), 7),
    "castINT": ((L("42"),), 42),
    "castBIGINT": ((L("42"),), 42),
    "castFLOAT4": ((L("1.5"),), 1.5),
    "castFLOAT8": ((L("1.5"),), 1.5),
    "castDATE": ((L("2024-03-01"),), datetime.date(2024, 3, 1)),
    "castTIMESTAMP": (
        (L("2024-03-01 12:30:00"),),
        datetime.datetime(2024, 3, 1, 12, 30),
    ),
    "castDECIMAL": ((L("12.345"), 10, 2), None),  # value checked below
    "castDECIMALNullOnOverflow": ((L("99999"), 3, 0), None),  # overflow→NULL
    "castVARCHAR": ((L(42),), "42"),
    "rescaleDECIMAL": ((L(1.25), 10, 1), None),
    "extractYear": ((D("2024-03-05"),), 2024),
    "extractMonth": ((D("2024-03-05"),), 3),
    "extractDay": ((D("2024-03-05"),), 5),
    "extractHour": ((TS("2024-03-05 13:45:50"),), 13),
    "extractMinute": ((TS("2024-03-05 13:45:50"),), 45),
    "extractSecond": ((TS("2024-03-05 13:45:50"),), 50),
    "dayOfWeek": ((D("2024-03-05"),), 3),  # Tuesday (1=Sunday)
    "dayOfYear": ((D("2024-02-01"),), 32),
    "unixDate": ((D("1970-01-11"),), 10),
    "unixSeconds": ((TS("1970-01-01 00:01:00"),), 60),
    "unixMillis": ((TS("1970-01-01 00:01:00"),), 60000),
    "unixMicros": ((TS("1970-01-01 00:01:00"),), 60000000),
    "secondsToTimestamp": ((L(60),), datetime.datetime(1970, 1, 1, 0, 1)),
    "millisToTimestamp": ((L(60000),), datetime.datetime(1970, 1, 1, 0, 1)),
    "microsToTimestamp": ((L(60000000),), datetime.datetime(1970, 1, 1, 0, 1)),
    "unixTimestamp": ((TS("1970-01-02 00:00:00"),), 86400),
    "dateDiff": ((D("2024-03-05"), D("2024-03-01")), 4),
    "makeDate": ((L(2024), L(3), L(5)), datetime.date(2024, 3, 5)),
    "makeTimestamp": (
        (L(2024), L(3), L(5), L(13), L(45), L(50.0)),
        datetime.datetime(2024, 3, 5, 13, 45, 50),
    ),
    "currentDate": ((), None),  # nondeterministic: evaluate-only
    "currentTimestamp": ((), None),
    "now": ((), None),
    "dateAddYearMonthInterval": ((D("2024-01-31"), 1), datetime.date(2024, 2, 29)),
    "dateTrunc": (
        ("month", TS("2024-03-05 13:45:50")),
        datetime.datetime(2024, 3, 1),
    ),
    "lastDay": ((D("2024-02-05"),), datetime.date(2024, 2, 29)),
    "literal": ((7,), 7),
    "sin": ((L(0.0),), 0.0),
    "cos": ((L(0.0),), 1.0),
    "tan": ((L(0.0),), 0.0),
    "asin": ((L(1.0),), math.pi / 2),
    "acos": ((L(1.0),), 0.0),
    "atan": ((L(0.0),), 0.0),
    "exp": ((L(0.0),), 1.0),
    "log": ((L(math.e),), 1.0),
    "log10": ((L(100.0),), 2.0),
    "log2": ((L(8.0),), 3.0),
    "pow": ((L(2.0), L(10.0)), 1024.0),
    "sqrt": ((L(9.0),), 3.0),
    "cbrt": ((L(27.0),), 3.0),
    "ceil": ((L(1.2),), 2),
    "floor": ((L(1.8),), 1),
    "sign": ((L(-5.0),), -1.0),
    "pmod": ((L(-7), L(3)), 2),
    "greatest": ((L(1), L(3), L(2)), 3),
    "least": ((L(1), L(3), L(2)), 1),
    "nanvl": ((L(float("nan")), L(0.0)), 0.0),
    "nullif": ((L(1), L(1)), None),  # NULL expected — checked specially
    "md5": ((L(""),), "d41d8cd98f00b204e9800998ecf8427e"),
    "sha2": ((L(""), 256), None),
    "crc32": ((L("spark"),), None),
    "xxhash64": ((L("spark"),), None),
    "murmur3hash": ((L("spark"),), None),
    }

#: names whose expected value is checked as "evaluates without error"
EVAL_ONLY = {
    "currentDate", "currentTimestamp", "now", "sha2", "crc32", "xxhash64",
    "murmur3hash", "castDECIMAL", "rescaleDECIMAL",
}
#: names where NULL is the *correct* answer
NULL_EXPECTED = {"nullif", "castDECIMALNullOnOverflow"}


def test_registry_is_fully_covered(spark):
    cases = _cases()
    missing = set(FUNCTIONS) - set(cases)
    extra = set(cases) - set(FUNCTIONS)
    assert not missing, f"registry entries without a test case: {sorted(missing)}"
    assert not extra, f"test cases without a registry entry: {sorted(extra)}"


def test_every_registry_function_evaluates_correctly(spark):
    cases = _cases()
    exprs = [
        FUNCTIONS[name](*args).alias(f"c{i}")
        for i, (name, (args, _)) in enumerate(sorted(cases.items()))
    ]
    row = spark.range(1).select(*exprs).first()
    for i, (name, (_, want)) in enumerate(sorted(cases.items())):
        got = row[f"c{i}"]
        if name in NULL_EXPECTED:
            assert got is None, f"{name}: expected NULL, got {got!r}"
        elif name in EVAL_ONLY or want is None:
            continue
        elif isinstance(want, float):
            assert got == want or abs(got - want) < 1e-12, f"{name}: {got!r} != {want!r}"
        else:
            assert got == want, f"{name}: {got!r} != {want!r}"
