"""filter_nest: NEST keys under a map/struct; LIFT a nested map up.

Reference: plugins/filter_nest/nest.c:66-92 (config), :676 (apply).
NEST: fold keys matching a wildcard under a new struct key, with
remove_prefix/add_prefix renames. LIFT: splat a struct's fields to the top
level, optionally prefixed.
"""

from __future__ import annotations

import fnmatch

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def nest(
    df: DataFrame,
    wildcard: str,
    nest_under: str,
    remove_prefix: str | None = None,
    add_prefix: str | None = None,
) -> DataFrame:
    """Fold columns matching ``wildcard`` (fluent-bit glob, '*' allowed)
    into a struct column ``nest_under``."""
    hit = [c for c in df.columns if fnmatch.fnmatchcase(c, wildcard)]
    if not hit:
        return df
    fields = []
    for c in hit:
        name = c
        if remove_prefix and name.startswith(remove_prefix):
            name = name[len(remove_prefix):]
        if add_prefix:
            name = add_prefix + name
        fields.append(F.col(c).alias(name))
    out = df.withColumn(nest_under, F.struct(*fields))
    return out.drop(*hit)


def lift(df: DataFrame, nested_under: str, add_prefix: str | None = None) -> DataFrame:
    """Splat struct column ``nested_under`` up to top level."""
    if nested_under not in df.columns:
        return df
    dtype = df.schema[nested_under].dataType
    if not isinstance(dtype, T.StructType):
        raise ValueError(f"lift target {nested_under!r} is not a struct")
    keep = [F.col(c) for c in df.columns if c != nested_under]
    lifted = [
        F.col(f"{nested_under}.{f.name}").alias((add_prefix or "") + f.name)
        for f in dtype.fields
    ]
    return df.select(*keep, *lifted)
