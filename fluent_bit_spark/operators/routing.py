"""Tag-based routing: wildcard match + conditional routes.

Reference: src/flb_router.c:59-138 (exact / '*' glob match),
src/flb_routes_mask.c (per-chunk route bitmask),
src/flb_router_condition.c:275 (conditional routes over record fields).

Spark: routing is predicate-split — each output's DataFrame is the source
filtered by its tag pattern (and optional conditions). Writes then run in
parallel; with partitionBy(tag) on the sink, one pass writes every route
(the out_s3 '$TAG in the key template' pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.model import TAG_COL
from fluent_bit_spark.operators.conditions import Rule, conditions
from fluent_bit_spark.sp.compiler import tag_pattern_to_regex


def match_tag(df: DataFrame, pattern: str, tag_col: str = TAG_COL) -> DataFrame:
    return df.filter(F.col(tag_col).rlike(tag_pattern_to_regex(pattern)))


def route(
    df: DataFrame,
    routes: dict[str, str | tuple[str, list[Rule]]],
    tag_col: str = TAG_COL,
) -> dict[str, DataFrame]:
    """routes: name -> tag_pattern, or name -> (tag_pattern, condition rules).

    Returns name -> routed DataFrame. A record can match multiple routes
    (fluent-bit fans chunks to every matching output)."""
    out: dict[str, DataFrame] = {}
    for name, spec in routes.items():
        if isinstance(spec, tuple):
            pattern, rules = spec
            routed = match_tag(df, pattern, tag_col)
            routed = routed.filter(conditions(routed, rules))
        else:
            routed = match_tag(df, spec, tag_col)
        out[name] = routed
    return out
