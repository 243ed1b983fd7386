"""Record-accessor path language tests — the ra.y grammar semantics
(src/record_accessor/ra.y:63-99, $TAG parts src/flb_record_accessor.c)
exercised the way tests/internal/record_accessor.c does: nested maps,
arrays, integer indexes, tag parts, and missing-path behavior.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from fluent_bit_spark.accessor import exists, parse_accessor, resolve


def test_parse_forms():
    a = parse_accessor("$key['a'][0]['b']")
    assert a.name == "key" and a.subkeys == ("a", 0, "b")
    assert parse_accessor("plain").subkeys == ()
    assert parse_accessor("$TAG[1]").is_tag
    assert parse_accessor('$k["dq"]').subkeys == ("dq",)
    with pytest.raises(ValueError):
        parse_accessor("$bad['unclosed'")


def test_display_names():
    assert parse_accessor("$key['a'][0]").display() == "0"
    assert parse_accessor("$key['a']['b']").display() == "b"
    assert parse_accessor("$TAG").display() == "TAG"
    assert parse_accessor("$TAG[2]").display() == "TAG[2]"


@pytest.fixture(scope="module")
def nested(spark):
    rows = [
        Row(
            tag="aa.bb.cc",
            top="x",
            obj=Row(sub="s1", arr=[10, 20, 30], deeper=Row(leaf=7)),
            m={"k1": "v1"},
        )
    ]
    return spark.createDataFrame(rows)


def _val(df, path):
    col, _ = resolve(df, parse_accessor(path))
    return df.select(col.alias("v")).collect()[0].v


def test_resolve_struct_array_map(nested):
    assert _val(nested, "$obj['sub']") == "s1"
    assert _val(nested, "$obj['arr'][1]") == 20
    assert _val(nested, "$obj['deeper']['leaf']") == 7
    assert _val(nested, "$m['k1']") == "v1"
    assert _val(nested, "$m['nope']") is None  # map: runtime-missing -> NULL


def test_resolve_tag_parts(nested):
    assert _val(nested, "$TAG") == "aa.bb.cc"
    assert _val(nested, "$TAG[0]") == "aa"
    assert _val(nested, "$TAG[2]") == "cc"


def test_missing_paths_resolve_none(nested):
    assert resolve(nested, parse_accessor("$nosuch")) is None
    assert resolve(nested, parse_accessor("$obj['nokey']")) is None
    assert resolve(nested, parse_accessor("$top[0]")) is None  # index into scalar


def test_exists_semantics(nested):
    df = nested
    assert df.select(exists(df, parse_accessor("$obj['sub']")).alias("e")).collect()[0].e
    assert not df.select(exists(df, parse_accessor("$nosuch")).alias("e")).collect()[0].e
    assert not df.select(exists(df, parse_accessor("$m['nope']")).alias("e")).collect()[0].e
