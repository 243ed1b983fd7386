"""filter_parser: parse one string field with a named parser.

Reference: plugins/filter_parser/filter_parser.c:104-260 — options
key_name (field to parse), reserve_data (keep other fields), preserve_key
(keep the raw field). Non-matching records pass through unchanged when
reserve_data, else are dropped (reference keeps them only with
reserve_data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.functions.parsers import (
    JsonParser,
    LogfmtParser,
    LtsvParser,
    RegexParser,
    map_fields,
)


def parser_filter(
    df: DataFrame,
    key_name: str,
    parser,
    reserve_data: bool = True,
    preserve_key: bool = False,
    fields: list[str] | None = None,
    types: dict[str, str] | None = None,
) -> DataFrame:
    """Apply a parser to column ``key_name``.

    ``fields`` is required for dynamic-key parsers (ltsv/logfmt/schemaless
    json) to pick which parsed keys become columns.
    """
    src = F.col(key_name)
    if isinstance(parser, RegexParser):
        parsed = parser.parse(src)
        if not reserve_data:
            df = df.filter(parser.matched(src))
    elif isinstance(parser, JsonParser) and parser.schema is not None:
        parsed = parser.parse(src)
    elif isinstance(parser, (LtsvParser, LogfmtParser, JsonParser)):
        if fields is None:
            raise ValueError("dynamic-key parser needs fields=[...]")
        mp = parser.parse_map(src)
        parsed = map_fields(mp, fields, types)
    else:
        raise TypeError(f"unknown parser {parser!r}")

    keep = df.columns if reserve_data else [key_name]
    out_cols = [F.col(c) for c in keep if c != key_name or preserve_key]
    out_cols += [col.alias(name) for name, col in parsed.items()]
    return df.select(*out_cols)
