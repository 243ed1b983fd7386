"""Exhaustive cross-type comparison grid for the coercion engine.

The reference's WHERE evaluator (flb_sp.c:788-998) has non-SQL semantics:
missing/NULL => false, string<->number auto-convert, cross-type => false,
bools only under =/!=. SURVEY §7 flags this as a hard part to
property-test; this grid evaluates EVERY (value, value, op) combination
of a representative value set in ONE Spark job and checks each cell
against an independent Python model of the C semantics tables.
"""

from pyspark.sql import functions as F

from fluent_bit_spark.coercion import OPS, fb_compare, lit_kind

VALUES = [
    None,
    True,
    False,
    0,
    1,
    -3,
    2.5,
    10,
    10.0,
    "10",
    "10.0",
    " 2.5 ",
    "abc",
    "",
    "zzz",
]


def _apply(a, b, op):
    return {
        "=": a == b, "!=": a != b, "<>": a != b,
        "<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b,
    }[op]


def _model(lv, rv, op):
    lk, rk = lit_kind(lv), lit_kind(rv)
    if lk == "null" or rk == "null":
        return False
    if lk == "bool" or rk == "bool":
        if lk == "bool" and rk == "bool" and op in ("=", "!=", "<>"):
            return _apply(lv, rv, op)
        return False
    if lk == "num" and rk == "num":
        return _apply(float(lv), float(rv), op)
    if lk == "str" and rk == "str":
        return _apply(lv, rv, op)
    # str vs num: string side auto-converts; unparseable -> false
    s = lv if lk == "str" else rv
    try:
        sv = float(s.strip()) if s.strip() != "" else None
    except ValueError:
        sv = None
    if sv is None:
        return False
    left = sv if lk == "str" else float(lv)
    right = sv if rk == "str" else float(rv)
    return _apply(left, right, op)


def test_coercion_grid(spark):
    cols, expected = [], []
    for i, lv in enumerate(VALUES):
        for j, rv in enumerate(VALUES):
            for op in OPS:
                c = fb_compare(F.lit(lv), lit_kind(lv), F.lit(rv), lit_kind(rv), op)
                cols.append(c.alias(f"c_{len(cols)}"))
                expected.append((lv, rv, op, _model(lv, rv, op)))
    row = spark.range(1).select(*cols).collect()[0]
    mismatches = [
        (lv, rv, op, want, got)
        for (lv, rv, op, want), got in zip(expected, row)
        if got != want
    ]
    assert not mismatches, f"{len(mismatches)} cells diverge, first: {mismatches[:5]}"
