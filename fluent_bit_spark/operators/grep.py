"""filter_grep: keep/drop rows by regex on a record-accessor field.

Reference: plugins/filter_grep/grep.c:286-434; ops enum grep.h:37-41.
Rules: ('regex', key, pattern) keeps matching rows; ('exclude', key,
pattern) drops matching rows. logical_op:
- 'legacy' : rules applied sequentially (net effect: AND of all rules)
- 'AND'    : all rules must hold
- 'OR'     : any rule may hold

A missing key never matches a 'regex' rule (row dropped) and never
matches an 'exclude' rule (row kept) — reference behavior for absent
fields.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.accessor import parse_accessor, resolve


def _rule_pred(df: DataFrame, kind: str, key: str, pattern: str) -> Column:
    r = resolve(df, parse_accessor(key))
    if r is None:
        matched = F.lit(False)
    else:
        matched = F.coalesce(r[0].cast("string").rlike(pattern), F.lit(False))
    return matched if kind == "regex" else ~matched


def grep(
    df: DataFrame,
    rules: list[tuple[str, str, str]],
    logical_op: str = "legacy",
) -> DataFrame:
    """rules: [(op, key, pattern)] with op in {'regex','exclude'}."""
    if not rules:
        return df
    preds = [_rule_pred(df, k, key, pat) for (k, key, pat) in rules]
    out = preds[0]
    for p in preds[1:]:
        out = (out | p) if logical_op.upper() == "OR" else (out & p)
    return df.filter(out)
