"""filter_record_modifier: remove_keys / allowlist_keys / static append / uuid.

Reference: plugins/filter_record_modifier/filter_modifier.c:37-113.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def record_modifier(
    df: DataFrame,
    remove_keys: list[str] | None = None,
    allowlist_keys: list[str] | None = None,
    records: dict[str, object] | None = None,
    uuid_key: str | None = None,
) -> DataFrame:
    if allowlist_keys:
        keep = [c for c in df.columns if c in set(allowlist_keys)]
        df = df.select(*keep)
    if remove_keys:
        df = df.drop(*[k for k in remove_keys if k in df.columns])
    if records:
        for k, v in records.items():
            df = df.withColumn(k, F.lit(v))
    if uuid_key:
        df = df.withColumn(uuid_key, F.expr("uuid()"))
    return df
