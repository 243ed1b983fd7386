"""Lookup/enrichment joins: checklist, kubernetes/geoip-style metadata.

Reference joins are all stream-to-static lookups (SURVEY §2.5):
- filter_checklist (plugins/filter_checklist/checklist.c): file of values
  loaded into a hash; when a record's key matches an entry, set record k-vs.
- filter_kubernetes (kube_meta.c:2642), filter_geoip2 (geoip2.c:50),
  filter_aws/ecs: enrich from a metadata table.

Spark: broadcast hash joins — the dimension side is tiny, so no shuffle of
the fact stream at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def checklist(
    df: DataFrame,
    watchlist: DataFrame,
    key: str,
    list_key: str,
    set_values: dict[str, object],
    case_insensitive: bool = False,
) -> DataFrame:
    """Set ``set_values`` columns on rows whose ``key`` appears in
    ``watchlist[list_key]`` (exact mode)."""
    lk = F.col(list_key).cast("string")
    rk = F.col(key).cast("string")
    if case_insensitive:
        lk, rk = F.lower(lk), F.lower(rk)
    marks = watchlist.select(lk.alias("__wl_key")).distinct().withColumn("__hit", F.lit(True))
    joined = df.join(F.broadcast(marks), rk == F.col("__wl_key"), "left")
    for k, v in set_values.items():
        old = F.col(k) if k in df.columns else F.lit(None)
        joined = joined.withColumn(k, F.when(F.col("__hit"), F.lit(v)).otherwise(old))
    return joined.drop("__wl_key", "__hit")


def enrich(
    df: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    select_map: dict[str, str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Generic metadata enrichment (kubernetes/geoip/aws-shaped): broadcast
    left join; ``select_map`` renames dim columns into the record."""
    if select_map:
        keys = [on] if isinstance(on, str) else list(on)
        cols = [F.col(k) for k in keys] + [
            F.col(src).alias(dst) for src, dst in select_map.items()
        ]
        dim = dim.select(*cols)
    return df.join(F.broadcast(dim), on, how)
