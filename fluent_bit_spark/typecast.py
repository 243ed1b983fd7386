"""Typecast engine: int / uint / float / string / bool / hex.

Reference: src/flb_typecast.c:28-49 (type table) and the parser-embedded
casts (include/fluent-bit/flb_parser.h:72-78). Used by
filter_type_converter (plugins/filter_type_converter/type_converter.c:120-135)
and parser ``types`` options.

All casts are Catalyst built-ins — no UDFs: hex -> ``conv(x, 16, 10)``;
bool accepts the fluent-bit truthy strings ("true"/"false" case-insensitive).
Failed casts yield NULL (fluent-bit keeps the original string on failure;
``keep_original_on_error=True`` reproduces that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CAST_TYPES = ("int", "uint", "float", "string", "bool", "hex")


def cast_column(col: Column, to_type: str) -> Column:
    t = to_type.lower()
    if t == "int":
        return col.try_cast("bigint")
    if t == "uint":
        # Spark has no unsigned; clamp negatives to NULL like a failed parse
        c = col.try_cast("bigint")
        return F.when(c >= 0, c)
    if t == "float":
        return col.try_cast("double")
    if t == "string":
        return col.cast("string")
    if t == "bool":
        lowered = F.lower(col.cast("string"))
        return F.when(lowered == "true", F.lit(True)).when(
            lowered == "false", F.lit(False)
        )
    if t == "hex":
        # hex string -> decimal integer (flb_typecast.c hex path)
        cleaned = F.regexp_replace(col.cast("string"), r"^0[xX]", "")
        return F.conv(cleaned, 16, 10).try_cast("bigint")
    raise ValueError(f"unknown cast type {to_type!r}; expected one of {CAST_TYPES}")


def type_converter(
    df: DataFrame, rules: list[tuple[str, str, str]], keep_original: bool = True
) -> DataFrame:
    """filter_type_converter: rules of (from_key, to_key, type).

    Adds ``to_key`` as the casted value of ``from_key``; the original column
    is kept (reference semantics: converted value written under to_key).
    """
    for from_key, to_key, to_type in rules:
        src = F.col(from_key)
        casted = cast_column(src, to_type)
        if keep_original and to_key == from_key:
            casted = F.coalesce(casted.cast("string"), src.cast("string"))
        df = df.withColumn(to_key, casted)
    return df
