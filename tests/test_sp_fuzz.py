"""Grammar fuzz for the SP dialect's WHERE lattice.

The reference's coercion semantics (missing key => false, str<->num
auto-convert, cross-type compare => false) mean every condition our
compiler emits must be a TOTAL boolean — never NULL — so for ANY
generated condition c, `WHERE c` and `WHERE NOT c` must partition the
stream exactly. A NULL leaking out of a coercion arm breaks the
complement count; a parser/compiler crash fails the example outright.
This is the property fluent-bit's own cond_* test tables spot-check at
fixed points, generalized to the whole grammar.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# operands that exist in the samples fixture, plus a guaranteed-missing
# key (the missing => false arm) and mixed-type literals
_KEYS = ["id", "word2", "word3", "bool", "bytes", "nokey_xyz"]
_LITS = ["3", "10.29", "'rlz'", "'zz'", "true", "false", "0"]
_OPS = ["=", "!=", "<>", "<", "<=", ">", ">="]


def _cmp(draw):
    k = draw(st.sampled_from(_KEYS))
    op = draw(st.sampled_from(_OPS))
    lit = draw(st.sampled_from(_LITS))
    return f"{k} {op} {lit}"


@st.composite
def conditions(draw, depth=0):
    choice = draw(st.integers(0, 5 if depth < 2 else 2))
    if choice == 0:
        return _cmp(draw)
    if choice == 1:
        k = draw(st.sampled_from(_KEYS))
        neg = draw(st.booleans())
        return f"{k} IS {'NOT ' if neg else ''}NULL"
    if choice == 2:
        k = draw(st.sampled_from(_KEYS))
        return f"@record.contains({k})"
    if choice == 3:
        return f"NOT ({draw(conditions(depth=depth + 1))})"
    op = "AND" if choice == 4 else "OR"
    l_ = draw(conditions(depth=depth + 1))
    r_ = draw(conditions(depth=depth + 1))
    return f"({l_}) {op} ({r_})"


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(cond=conditions())
def test_where_conditions_are_total_booleans(sp, cond):
    total = sp.sql("SELECT id FROM STREAM:FLB;").count()
    pos = sp.sql(f"SELECT id FROM STREAM:FLB WHERE {cond};").count()
    neg = sp.sql(f"SELECT id FROM STREAM:FLB WHERE NOT ({cond});").count()
    assert pos + neg == total, (cond, pos, neg, total)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(cond=conditions())
def test_aggregates_respect_condition_partition(sp, cond):
    """COUNT(*) under c and NOT c sums to the stream size through the
    aggregate path too (the condition feeds a different compiler arm
    than bare SELECT)."""

    def one(c):
        rows = sp.sql(f"SELECT COUNT(*) AS c FROM STREAM:FLB WHERE {c};").collect()
        return rows[0]["c"] if rows else 0

    total = one("id >= 0")  # every sample has id >= 0
    assert one(cond) + one(f"NOT ({cond})") == total, cond
