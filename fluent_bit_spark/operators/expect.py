"""filter_expect: per-record assertions (data-quality checks).

Reference: plugins/filter_expect/expect.c:35-76 (rules: key_exists,
key_not_exists, key_val_is_null, key_val_is_not_null, key_val_eq),
:164-175 (actions: warn, exit, result_key).

Spark: a violation predicate per rule; action 'result_key' adds a boolean
column, 'exit' raises if any violation exists, 'count' returns violation
counts per rule (the test-harness form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.accessor import parse_accessor, resolve


def _rule_ok(df: DataFrame, rule: tuple) -> Column:
    kind = rule[0].lower()
    r = resolve(df, parse_accessor(rule[1]))
    col = r[0] if r is not None else None
    if kind == "key_exists":
        return F.lit(False) if col is None else col.isNotNull()
    if kind == "key_not_exists":
        return F.lit(True) if col is None else col.isNull()
    if kind == "key_val_is_null":
        return F.lit(False) if col is None else col.isNull()
    if kind == "key_val_is_not_null":
        return F.lit(False) if col is None else col.isNotNull()
    if kind == "key_val_eq":
        if col is None:
            return F.lit(False)
        return F.coalesce(col.cast("string") == F.lit(str(rule[2])), F.lit(False))
    raise ValueError(f"unknown expect rule {rule[0]!r}")


def expect(
    df: DataFrame, rules: list[tuple], action: str = "result_key", result_key: str = "matched"
) -> DataFrame:
    ok = F.lit(True)
    for rule in rules:
        ok = ok & _rule_ok(df, rule)
    if action == "result_key":
        return df.withColumn(result_key, ok)
    if action == "exit":
        n_bad = df.filter(~ok).limit(1).count()
        if n_bad:
            raise AssertionError("expect: record violated assertion rules")
        return df
    if action == "count":
        return df.select(
            F.count(F.lit(1)).alias("records"),
            F.sum(F.when(~ok, 1).otherwise(0)).alias("violations"),
        )
    raise ValueError(f"unknown expect action {action!r}")
