"""Property-based tests (hypothesis) — SURVEY §5.2's property tier.

Spark jobs are too slow for per-example execution, so each property either
(a) exercises a pure-Python component (accessor parsing, template
splitting), or (b) folds all hypothesis examples into ONE DataFrame and
runs a single Spark action per test case.
"""

import json
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fluent_bit_spark.accessor import parse_accessor

KEY = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True)
# string subscripts: anything without quotes/brackets
SUB_S = st.text(
    alphabet=st.characters(blacklist_characters="'\"[]\\", min_codepoint=32, max_codepoint=126),
    max_size=8,
)
SUB = st.one_of(SUB_S, st.integers(min_value=0, max_value=999))


@given(name=KEY, subs=st.lists(SUB, max_size=4))
def test_accessor_parse_roundtrip(name, subs):
    """parse(display(p)) == p for every buildable path."""
    path = "$" + name + "".join(
        f"[{s}]" if isinstance(s, int) else f"['{s}']" for s in subs
    )
    acc = parse_accessor(path)
    assert acc.name == name
    assert list(acc.subkeys) == list(subs)
    # re-rendering the parsed form parses back to the same accessor
    rendered = "$" + acc.name + "".join(
        f"[{s}]" if isinstance(s, int) else f"['{s}']" for s in acc.subkeys
    )
    assert parse_accessor(rendered) == acc


@given(n=st.integers(min_value=0, max_value=9))
def test_accessor_tag_part(n):
    acc = parse_accessor(f"$TAG[{n}]")
    assert acc.is_tag and acc.subkeys == (n,)


@given(
    tpl_parts=st.lists(
        st.text(
            alphabet=st.characters(blacklist_characters="{}", min_codepoint=32, max_codepoint=126),
            max_size=6,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_template_line_splitting(tpl_parts):
    """template_line's placeholder regex splits any literal/placeholder mix
    losslessly (pure string property of the splitter regex)."""
    tpl = "{a}".join(tpl_parts)
    spans = [m.span() for m in re.finditer(r"\{([A-Za-z_][A-Za-z0-9_]*)\}", tpl)]
    rebuilt, pos = "", 0
    for s, e in spans:
        rebuilt += tpl[pos:s] + "{a}"
        pos = e
    rebuilt += tpl[pos:]
    assert rebuilt == tpl


# ---------------------------------------------------------------------------
# batched Spark properties: one DataFrame per test case
# ---------------------------------------------------------------------------
LOGFMT_VAL = st.text(
    alphabet=st.characters(
        blacklist_characters='"\\\n\t=', min_codepoint=32, max_codepoint=126
    ),
    min_size=0,
    max_size=12,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    records=st.lists(
        st.dictionaries(KEY, LOGFMT_VAL, min_size=1, max_size=4), min_size=1, max_size=8
    )
)
def test_logfmt_encode_parse_roundtrip(spark, records):
    """encode as logfmt text -> LogfmtParser -> original map (for values in
    logfmt's unquoted-safe alphabet; quoting covered by unit tests)."""
    from fluent_bit_spark.functions.parsers import LogfmtParser

    lines = [
        (" ".join(f'{k}="{v}"' for k, v in rec.items()), json.dumps(rec))
        for rec in records
    ]
    df = spark.createDataFrame(lines, "line string, expected string")
    parsed = df.select(
        LogfmtParser().parse_map(F.col("line")).alias("m"), "expected"
    ).collect()
    for row in parsed:
        assert row.m == json.loads(row.expected)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    records=st.lists(
        st.dictionaries(KEY, LOGFMT_VAL.filter(lambda s: ":" not in s), min_size=1, max_size=4),
        min_size=1,
        max_size=8,
    )
)
def test_ltsv_encode_parse_roundtrip(spark, records):
    from fluent_bit_spark.functions.parsers import LtsvParser

    lines = [
        ("\t".join(f"{k}:{v}" for k, v in rec.items()), json.dumps(rec))
        for rec in records
    ]
    df = spark.createDataFrame(lines, "line string, expected string")
    parsed = df.select(
        LtsvParser().parse_map(F.col("line")).alias("m"), "expected"
    ).collect()
    for row in parsed:
        assert row.m == json.loads(row.expected)


VALS = st.lists(
    st.one_of(
        st.integers(min_value=-(2**31), max_value=2**31 - 1).map(str),
        st.floats(allow_nan=False, allow_infinity=False, width=16).map(str),
        st.sampled_from(["true", "False", "TRUEish", "falsey", "on", "0", "-0", " 12abc"]),
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=6
        ),
    ),
    min_size=1,
    max_size=40,
)


def _strtol(s):
    m = re.match(r"[ \t\n]*([+-]?[0-9]+)", s)
    return int(m.group(1)) if m else None


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=VALS)
def test_typecast_int_both_engines(spark, vals):
    """'int' cast vs pure-Python strtol models of BOTH reference engines:
    parser mode = atoll (flb_parser.c:2097, garbage -> 0); converter mode =
    strtoimax with 0-as-error (flb_typecast.c:100-104)."""
    from fluent_bit_spark.typecast import cast_column

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = df.select(
        cast_column(F.col("v"), "int", mode="parser").alias("p"),
        cast_column(F.col("v"), "int", mode="converter").alias("c"),
    ).collect()
    for v, row in zip(vals, got):
        n = _strtol(v)
        assert row.p == (n if n is not None else 0), (v, row.p)
        assert row.c == (n if n not in (None, 0) else None), (v, row.c)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=VALS)
def test_typecast_bool_prefix_match(spark, vals):
    """bool cast is a case-insensitive PREFIX match on true/false
    (strncasecmp, flb_parser.c:2121-2126), not equality."""
    from fluent_bit_spark.typecast import cast_column

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r.b for r in df.select(cast_column(F.col("v"), "bool").alias("b")).collect()]
    for v, b in zip(vals, got):
        lo = v.lower()
        expect = True if lo.startswith("true") else False if lo.startswith("false") else None
        assert b is expect or b == expect, (v, b)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32).map(repr),
        min_size=1,
        max_size=30,
    )
)
def test_typecast_float_exact_on_clean_input(spark, vals):
    """atof on a clean float repr recovers the value exactly in both modes
    (atof never errors; garbage handling covered by the int/bool tests)."""
    from fluent_bit_spark.typecast import cast_column

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r.f for r in df.select(cast_column(F.col("v"), "float").alias("f")).collect()]
    assert got == [float(v) for v in vals]
