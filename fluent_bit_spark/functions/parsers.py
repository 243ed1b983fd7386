"""Parsers: unstructured text -> typed columns.

Reference: src/flb_parser.c (regex/json/ltsv/logfmt dispatch flb_parser_do
:1784), plugins/filter_parser/ applies a named parser to one string field.
All four parsers here are pure Catalyst expressions (regexp_extract,
from_json, str_to_map, regexp_extract_all) — no UDFs, so parsing inlines
into whole-stage codegen and scales linearly with executors.

Each parser exposes:
- fields()                  -> output field names (may be None = dynamic)
- parse(col) -> dict[str, Column]  (static fields)  OR
- parse_map(col) -> Column (MapType) for dynamic-key parsers (ltsv/logfmt/json-map)

Typed extraction: pass types={'field': 'int'|'float'|'bool'|...} (the
parser ``types`` option, flb_parser.h:72-78) and a time_key/time_format
(strptime) to materialize the event timestamp.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluent_bit_spark.functions.timefmt import parse_time
from fluent_bit_spark.typecast import cast_column

_NAMED_GROUP_RE = _re.compile(r"\(\?P?<([A-Za-z][A-Za-z0-9_]*)>")


class RegexParser:
    """Named-group regex parser (reference: onigmo patterns, src/flb_regex.c;
    e.g. the apache/syslog patterns in conf/parsers.conf).

    Python/onigmo ``(?<name>...)`` named groups are Java-compatible; each
    group extracts via regexp_extract(col, pattern, group_index).
    Non-matching lines yield all-NULL fields (fluent-bit drops them —
    use ``matched(col)`` to filter).
    """

    def __init__(
        self,
        pattern: str,
        types: dict[str, str] | None = None,
        time_key: str | None = None,
        time_format: str | None = None,
    ):
        self.pattern = pattern.replace("(?P<", "(?<")
        self.group_names = _NAMED_GROUP_RE.findall(pattern)
        if not self.group_names:
            raise ValueError("regex parser needs named capture groups")
        self.types = types or {}
        self.time_key = time_key
        self.time_format = time_format

    def fields(self) -> list[str]:
        return list(self.group_names)

    def matched(self, col: Column) -> Column:
        return col.rlike(self.pattern)

    def parse(self, col: Column) -> dict[str, Column]:
        out: dict[str, Column] = {}
        for i, name in enumerate(self.group_names, start=1):
            raw = F.regexp_extract(col, self.pattern, i)
            raw = F.when(col.rlike(self.pattern), raw)  # non-match -> NULL, not ''
            if name in self.types:
                raw = cast_column(raw, self.types[name])
            out[name] = raw
        if self.time_key and self.time_format and self.time_key in out:
            out[self.time_key] = parse_time(
                F.regexp_extract(col, self.pattern, self.group_names.index(self.time_key) + 1),
                self.time_format,
            )
        return out


class JsonParser:
    """JSON parser (reference: src/flb_pack.c:670 flb_pack_json).

    With a schema -> typed struct via from_json; without -> string map
    (schemaless bodies). Duplicate keys: Jackson keeps the LAST occurrence,
    matching the reference's dup-key removal keeping the latest
    (tests/internal/data/pack/dup_keys_out.json).
    """

    def __init__(self, schema: T.StructType | str | None = None, types: dict[str, str] | None = None):
        self.schema = schema
        self.types = types or {}

    def fields(self) -> list[str] | None:
        if isinstance(self.schema, T.StructType):
            return [f.name for f in self.schema.fields]
        return None

    def parse_struct(self, col: Column) -> Column:
        if self.schema is None:
            raise ValueError("parse_struct needs a schema; use parse_map for schemaless")
        return F.from_json(col, self.schema)

    def parse_map(self, col: Column) -> Column:
        return F.from_json(col, "map<string,string>")

    def parse(self, col: Column) -> dict[str, Column]:
        if self.schema is not None:
            st = self.parse_struct(col)
            names = self.fields() or []
            out = {n: st.getField(n) for n in names}
        else:
            mp = self.parse_map(col)
            raise ValueError("schemaless JSON: use parse_map and getItem per key")
        for n, t in self.types.items():
            if n in out:
                out[n] = cast_column(out[n], t)
        return out


class LtsvParser:
    """LTSV: tab-separated ``key:value`` pairs (reference src/flb_parser_ltsv.c)."""

    def parse_map(self, col: Column) -> Column:
        return F.str_to_map(col, F.lit("\t"), F.lit(":"))


class LogfmtParser:
    r"""logfmt: space-separated key=value with optional double quotes
    (reference src/flb_parser_logfmt.c). Implemented as two
    regexp_extract_all passes + map_from_arrays — handles bare and
    quoted values; no UDF.
    """

    _PAIR = r'([A-Za-z0-9_.\-/]+)=("(?:[^"\\]|\\.)*"|[^\s"]*)'

    def parse_map(self, col: Column) -> Column:
        keys = F.regexp_extract_all(col, F.lit(self._PAIR), 1)
        vals = F.regexp_extract_all(col, F.lit(self._PAIR), 2)
        vals = F.transform(
            vals,
            lambda v: F.when(
                v.startswith('"') & v.endswith('"') & (F.length(v) >= 2),
                F.regexp_replace(F.substring(v, 2, F.length(v) - 2), r'\\(.)', "$1"),
            ).otherwise(v),
        )
        return F.map_from_arrays(keys, vals)


def map_fields(
    mp: Column, names: list[str], types: dict[str, str] | None = None
) -> dict[str, Column]:
    """Materialize named fields out of a dynamic map-parser result."""
    types = types or {}
    out: dict[str, Column] = {}
    for n in names:
        c = mp.getItem(n)
        if n in types:
            c = cast_column(c, types[n])
        out[n] = c
    return out


# --------------------------------------------------------------------------
# field decoders (src/flb_parser_decoder.c:39-130: json / escaped /
# escaped_utf8 / mysql_quoted)
# --------------------------------------------------------------------------
def decode_field(col: Column, decoder: str) -> Column:
    """Decode_Field analog. decoder:

    - 'json': stringified JSON -> VariantType value (decode_json,
      flb_parser_decoder.c:39-66)
    - 'escaped' / 'escaped_utf8': unescape backslash sequences
      (\\n \\t \\r \\" \\\\ \\uXXXX) via JVM-side JSON string decoding —
      the exotic C escapes (\\a \\v) are not round-tripped
      (flb_parser_decoder.c:85-112, src/flb_unescape.c)
    - 'mysql_quoted': strip surrounding quotes, collapse doubled and
      backslash-escaped quotes (flb_parser_decoder.c:114-130)
    """
    d = decoder.lower()
    if d == "json":
        return F.parse_json(col)
    if d in ("escaped", "escaped_utf8"):
        # wrap as a one-element JSON array literal and let the JSON reader
        # decode every escape (from_json needs a container schema);
        # pre-escape bare double quotes so wrapping is safe
        quoted = F.concat(F.lit('["'), F.regexp_replace(col, r'(?<!\\)"', '\\\\"'), F.lit('"]'))
        return F.from_json(quoted, "array<string>").getItem(0)
    if d == "mysql_quoted":
        inner = F.when(
            (F.length(col) >= 2)
            & (
                (col.startswith("'") & col.endswith("'"))
                | (col.startswith('"') & col.endswith('"'))
            ),
            F.substring(col, 2, F.length(col) - 2),
        ).otherwise(col)
        inner = F.regexp_replace(inner, r"''", "'")
        inner = F.regexp_replace(inner, r"\\'", "'")
        return F.regexp_replace(inner, r'\\"', '"')
    raise ValueError(f"unknown decoder {decoder!r}")
