"""processor_content_modifier: insert/upsert/delete/rename/hash/extract/convert.

Reference: plugins/processor_content_modifier/cm_config.c:27-146 (actions),
cm_logs.c (logs implementation). Actions operate on body columns (the
'metadata' context maps to columns under a chosen prefix/struct);
conditions gate rows via the shared conditions engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.operators.conditions import Rule, conditions
from fluent_bit_spark.typecast import cast_column


def content_modifier(
    df: DataFrame,
    action: str,
    key: str,
    value: object | None = None,
    pattern: str | None = None,
    converted_type: str | None = None,
    conds: list[Rule] | None = None,
    combine: str = "AND",
) -> DataFrame:
    """One content-modifier action (compose calls for multiples)."""
    gate = conditions(df, conds or [], combine)
    has_gate = bool(conds)
    act = action.lower()

    def gated(new, old):
        return F.when(gate, new).otherwise(old) if has_gate else new

    if act == "insert":  # only if absent
        if key not in df.columns:
            return df.withColumn(key, gated(F.lit(value), F.lit(None)))
        return df
    if act == "upsert":
        old = F.col(key) if key in df.columns else F.lit(None)
        return df.withColumn(key, gated(F.lit(value), old))
    if act == "delete":
        if key in df.columns:
            if has_gate:
                return df.withColumn(key, gated(F.lit(None).cast(dict(df.dtypes)[key]), F.col(key)))
            return df.drop(key)
        return df
    if act == "rename":
        if key in df.columns:
            return df.withColumnRenamed(key, str(value))
        return df
    if act == "hash":  # sha256 in place (cm_config.c:41)
        if key in df.columns:
            return df.withColumn(key, gated(F.sha2(F.col(key).cast("string"), 256), F.col(key)))
        return df
    if act == "extract":  # regex named groups -> new keys
        if key not in df.columns or not pattern:
            return df
        # _group_indexes, not enumerate: unnamed capturing groups shift
        # later named groups' indexes (e.g. '(?<a>x(y|z))(?<b>\\d+)'
        # puts b at group 3, not 2) — extracting by position would
        # silently emit the wrong capture
        from fluent_bit_spark.functions.parsers import _group_indexes

        indexes = _group_indexes(pattern)
        jpat = pattern.replace("(?P<", "(?<")
        for name, i in indexes.items():
            ext = F.when(
                F.col(key).cast("string").rlike(jpat),
                F.regexp_extract(F.col(key).cast("string"), jpat, i),
            )
            df = df.withColumn(name, gated(ext, F.col(name) if name in df.columns else F.lit(None)))
        return df
    if act == "convert":
        if key in df.columns and converted_type:
            return df.withColumn(key, gated(cast_column(F.col(key), converted_type), F.col(key)))
        return df
    raise ValueError(f"unknown content_modifier action {action!r}")
