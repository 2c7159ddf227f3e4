"""Feature-key text formatting.

Reimplements the observable output rules of the reference formatter
(``fg_lite/feature/FeatureFormatter.h:100-233``):

  - integers render as plain decimal text;
  - float/double render as C ``printf("%.0f", v)`` — i.e. rounded to
    *integer text* with round-half-to-even ties (glibc). Spark's
    ``format_string`` delegates to Java (HALF_UP ties), so we pre-round with
    ``F.bround`` (HALF_EVEN) and then print the integral double;
  - strings pass through verbatim;
  - sparse feature keys get prefix ``feature_name + "_"`` when
    ``need_prefix`` (``fg_lite/feature/FeatureConfig.cpp:66-71``);
  - invalid sentinels are *skipped*: INT32/INT64 max for ints, NaN for
    floats (``fg_lite/feature/FeatureFormatter.h:369-392``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

INT32_SENTINEL = 2_147_483_647
INT64_SENTINEL = 9_223_372_036_854_775_807

_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_TYPES = (T.FloatType, T.DoubleType)


def fmt_float_0f(col: Column) -> Column:
    """``printf("%.0f", x)`` with C (half-even) tie semantics.

    ``bround`` is Spark's HALF_EVEN round; the result is integral, so
    ``format_string('%.0f', .)`` then prints exact digits for any magnitude
    (no scientific notation, unlike ``cast(string)`` on doubles).
    """
    d = col.cast("double")
    r = F.bround(d, 0)
    body = F.format_string("%.0f", r)
    # C prints "-0" for negative values that round to zero; Spark's bround
    # loses the sign, so restore it explicitly.
    return F.when((d < 0) & (r == 0), F.lit("-0")).otherwise(body)


def fmt_feature(col: Column, dtype: T.DataType | None = None) -> Column:
    """Render one value as its feature-key text, by (declared) type."""
    if dtype is not None and isinstance(dtype, _FLOAT_TYPES):
        return fmt_float_0f(col)
    if dtype is not None and isinstance(dtype, _INT_TYPES):
        return col.cast("string")
    if dtype is not None and isinstance(dtype, T.StringType):
        return col
    if dtype is not None and isinstance(dtype, T.BooleanType):
        return F.when(col, F.lit("1")).otherwise(F.lit("0"))
    # unknown static type: route numerics through %.0f only if fractional
    return col.cast("string")


def with_prefix(col: Column, feature_name: str, need_prefix: bool) -> Column:
    """Prefix a formatted key with ``feature_name + '_'`` iff need_prefix."""
    if not need_prefix:
        return col
    return F.concat(F.lit(feature_name + "_"), col)


def drop_invalid(
    arr: Column,
    dtype: T.DataType,
    invalid_values: list | None = None,
) -> Column:
    """Filter an array column: drop sentinel/NaN and per-feature blacklist.

    Mirrors the skip behaviour of ``IdFeatureFunction.cpp:74-78`` +
    ``FeatureFormatter.h:369-392``.
    """
    def keep(v: Column) -> Column:
        cond = v.isNotNull()
        if isinstance(dtype, _FLOAT_TYPES):
            cond = cond & ~F.isnan(v)
        elif isinstance(dtype, (T.IntegerType,)):
            cond = cond & (v != F.lit(INT32_SENTINEL))
        elif isinstance(dtype, (T.LongType,)):
            cond = cond & (v != F.lit(INT64_SENTINEL))
        if invalid_values:
            cond = cond & ~v.isin(*invalid_values)
        return cond

    return F.filter(arr, keep)
