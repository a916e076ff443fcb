"""Python UDTFs (user-defined TABLE functions) — PySpark 4 surface.

The reference executes `Generate`/explode as a row fallback (SURVEY §2.10,
docs/operators.md row 6) and has no user-defined table functions at all;
PySpark 4's `@udtf` gives the engine a first-class, Arrow-batched
set-returning function that composes with LATERAL joins.

Scale note: a UDTF runs per input row inside the Python worker with Arrow
transport — same cost model as mapInPandas.  For kernels expressible as
`explode` of a codegen'd array expression, prefer that (JVM-side); UDTFs
are for genuinely imperative row→rows logic (custom parsers, tokenizers
with state, protocol decoders).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.functions import udtf
from pyspark.sql.udtf import AnalyzeResult


@dataclass
class _ScaleNumericAnalyzeResult(AnalyzeResult):
    """AnalyzeResult + the numeric field names the plan-time schema kept."""

    numeric_fields: tuple = field(default_factory=tuple)


@udtf(returnType="pos int, tok string")
class SplitTokens:
    """Emit (position, token) rows for every whitespace token of the input —
    the canonical row→rows kernel (a tokenizer the optimizer can't see
    into).  Matches tokens() / DuckDB string_split_regex semantics."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if text is None:
            return
        pos = 0
        for tok in text.split():
            yield (pos, tok)
            pos += 1


def register_udtfs(spark) -> None:
    """Register all engine UDTFs for SQL/LATERAL use (idempotent)."""
    spark.udtf.register("split_tokens", SplitTokens)
    spark.udtf.register("scale_numeric", ScaleNumeric)


@udtf
class ScaleNumeric:
    """POLYMORPHIC UDTF (PySpark 4 `analyze()` API): the output schema is
    computed at PLAN TIME from the input struct's fields — one doubled
    column per numeric input field, names derived from the argument.  The
    reference has nothing like plan-time-polymorphic table functions; this
    is the Spark-4 surface that makes generic row transformers (pivot
    helpers, schema-driven parsers) first-class without codegen per schema."""

    def __init__(self, analyze_result=None):
        # Spark passes the AnalyzeResult to __init__ (plan-time → run-time
        # state hand-off); the numeric field list rides along so eval()
        # selects exactly the fields analyze() projected.
        self._numeric = getattr(analyze_result, "numeric_fields", None)

    @staticmethod
    def analyze(arg):  # noqa: D102 — UDTF contract (AnalyzeArgument → AnalyzeResult)
        from pyspark.sql.types import DoubleType, NumericType, StructField, StructType

        numeric = [
            f.name for f in arg.dataType.fields if isinstance(f.dataType, NumericType)
        ]
        return _ScaleNumericAnalyzeResult(
            StructType([StructField(f"{n}_x2", DoubleType()) for n in numeric]),
            numeric_fields=tuple(numeric),
        )

    def eval(self, row):  # noqa: D102 — UDTF contract method
        # only the numeric fields analyze() kept; NULLs propagate as NULL
        names = self._numeric if self._numeric is not None else row.__fields__
        d = row.asDict()
        yield tuple(None if d[n] is None else float(d[n]) * 2.0 for n in names)
