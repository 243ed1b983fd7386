"""Conditions engine: rule predicates over record-accessor fields.

Reference: src/flb_conditionals.c:70-102 (ops eq, neq, gt, lt, gte, lte,
regex, not_regex, in, not_in) combined with AND/OR (:28-55); drives
processor gating and conditional routing (src/flb_router_condition.c:275).
Comparisons use the fluent-bit coercion semantics from
fluent_bit_spark.coercion (missing key / cross-type => no match).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark import coercion
from fluent_bit_spark.accessor import parse_accessor, resolve

_CMP = {"eq": "=", "neq": "!=", "gt": ">", "lt": "<", "gte": ">=", "lte": "<="}


@dataclass(frozen=True)
class Rule:
    field: str  # record-accessor path ('$key' or bare name)
    op: str  # eq|neq|gt|lt|gte|lte|regex|not_regex|in|not_in
    value: object


def rule_condition(df: DataFrame, rule: Rule) -> Column:
    r = resolve(df, parse_accessor(rule.field))
    if r is None:
        return F.lit(False)
    col, dtype = r
    kind = coercion.kind_of(dtype)
    op = rule.op.lower()
    if op in _CMP:
        lk = coercion.lit_kind(rule.value)
        return coercion.fb_compare(col, kind, F.lit(rule.value), lk, _CMP[op])
    if op in ("regex", "not_regex"):
        c = col.cast("string").rlike(str(rule.value))
        c = F.coalesce(c, F.lit(False))
        return ~c if op == "not_regex" else c
    if op in ("in", "not_in"):
        vals = list(rule.value)  # type: ignore[arg-type]
        c = F.coalesce(col.isin(vals), F.lit(False))
        return ~c if op == "not_in" else c
    raise ValueError(f"unknown condition op {rule.op!r}")


def conditions(df: DataFrame, rules: list[Rule], combine: str = "AND") -> Column:
    if not rules:
        return F.lit(True)
    cols = [rule_condition(df, r) for r in rules]
    out = cols[0]
    for c in cols[1:]:
        out = (out & c) if combine.upper() == "AND" else (out | c)
    return out
