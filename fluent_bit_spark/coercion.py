"""fluent-bit comparison / coercion semantics as Column builders.

The reference's WHERE evaluator (src/stream_processor/flb_sp.c:828-998
comparison dispatch, :788-797 int->float promotion, :799-826 string<->number
auto-conversion, :853-887 cross-type => false; missing key => condition
false) differs from ANSI NULL logic. This module is the single choke point
that reproduces those semantics with Catalyst expressions — shared by the SP
WHERE clause, filter_grep, filter_modify conditions, the conditionals engine
(src/flb_conditionals.c) and conditional routing.

Rules implemented:
- missing key (path not in schema)            -> FALSE
- NULL value at runtime                        -> FALSE (coalesce(cmp, false))
- int vs float                                 -> promote to double
- string vs number                             -> try_cast string to double;
                                                  unparseable -> NULL -> FALSE
- bool vs bool                                 -> =, != only; ordered -> FALSE
- bool vs non-bool, other cross-type           -> FALSE
- IS NULL on a MISSING key -> FALSE; IS NOT NULL -> TRUE (pure
  negation). Both sp_select_keys.h goldens pin this: cond_null counts
  only the explicit 'word3': null record, while "word2='rlz' AND word3
  IS NOT NULL" = 1 passes a record that has no word3 at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)

OPS = ("=", "!=", "<>", "<", "<=", ">", ">=")


def kind_of(dtype: T.DataType) -> str:
    if isinstance(dtype, _NUMERIC):
        return "num"
    if isinstance(dtype, T.StringType):
        return "str"
    if isinstance(dtype, T.BooleanType):
        return "bool"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "time"
    if isinstance(dtype, T.VariantType):
        return "variant"
    return "other"


def _apply_op(left: Column, right: Column, op: str) -> Column:
    if op == "=":
        return left == right
    if op in ("!=", "<>"):
        return left != right
    if op == "<":
        return left < right
    if op == "<=":
        return left <= right
    if op == ">":
        return left > right
    if op == ">=":
        return left >= right
    raise ValueError(f"unknown comparison op {op!r}")


def fb_compare(
    left: Column | None,
    left_kind: str,
    right: Column | None,
    right_kind: str,
    op: str,
) -> Column:
    """Build a fluent-bit-semantics comparison.

    ``left``/``right`` are resolved Columns (None = missing key);
    ``*_kind`` one of num/str/bool/time/other/null.
    """
    if left is None or right is None:
        return F.lit(False)
    if left_kind == "null" or right_kind == "null":
        # literal NULL comparisons never match (use IS NULL instead)
        return F.lit(False)

    lk, rk = left_kind, right_kind
    # variant side adapts to the other operand's type (the reference's
    # dynamic msgpack value lattice, flb_sp_key.c:54-95)
    if lk == "variant" and rk == "variant":
        num_cmp = _apply_op(left.try_cast("double"), right.try_cast("double"), op)
        str_cmp = _apply_op(left.cast("string"), right.cast("string"), op)
        return F.coalesce(num_cmp, str_cmp, F.lit(False))
    if lk == "variant":
        left = _variant_as(left, rk)
        lk = rk
    elif rk == "variant":
        right = _variant_as(right, lk)
        rk = lk
    if lk == "bool" or rk == "bool":
        if lk == "bool" and rk == "bool" and op in ("=", "!=", "<>"):
            return F.coalesce(_apply_op(left, right, op), F.lit(False))
        return F.lit(False)
    if lk == "num" and rk == "num":
        pass
    elif lk == "str" and rk == "str":
        pass
    elif lk == "time" and rk == "time":
        pass
    elif {lk, rk} == {"str", "num"}:
        # string side auto-converted to number (flb_sp.c:799-826)
        left = left.try_cast("double") if lk == "str" else left.cast("double")
        right = right.try_cast("double") if rk == "str" else right.cast("double")
    elif {lk, rk} == {"time", "str"}:
        # allow string timestamps against time columns (Spark-natural extension)
        left = left.cast("timestamp") if lk == "str" else left
        right = right.cast("timestamp") if rk == "str" else right
    elif {lk, rk} == {"time", "num"}:
        left = left.cast("double") if lk == "time" else left.cast("double")
        right = right.cast("double") if rk == "time" else right.cast("double")
    else:
        return F.lit(False)
    return F.coalesce(_apply_op(left, right, op), F.lit(False))


def _variant_as(col: Column, kind: str) -> Column:
    """Cast a variant value toward the other operand's kind; unconvertible
    values -> NULL -> comparison folds to FALSE."""
    if kind == "num":
        return col.try_cast("double")
    if kind == "str":
        return col.try_cast("string")
    if kind == "bool":
        return col.try_cast("boolean")
    if kind == "time":
        return col.try_cast("timestamp")
    return col.try_cast("string")


def variant_is_null(col: Column) -> Column:
    """fluent-bit IS NULL on a schemaless body: TRUE only when the key is
    PRESENT with an explicit null value; a missing key is neither NULL nor
    NOT NULL-failing (sp_select_keys.h cond_null/cond_not_null goldens)."""
    return F.coalesce(F.is_variant_null(col), F.lit(False))


def lit_kind(value) -> str:
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "bool"
    if isinstance(value, (int, float)):
        return "num"
    if isinstance(value, str):
        return "str"
    return "other"
