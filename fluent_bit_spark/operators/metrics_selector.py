"""processor_metrics_selector: include/exclude metrics by name or label.

Reference: plugins/processor_metrics_selector/selector.c:97-135 (action
INCLUDE default / EXCLUDE; operation_type full-regex default, PREFIX, or
SUBSTRING on the metric name; context metric_name or delete_label_value),
keep/exclude decision selector.c:329-334.

A pure Catalyst filter — pushes down to the scan when the metrics frame
comes straight off storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def metrics_selector(
    df: DataFrame,
    metric_name: str,
    action: str = "include",
    operation_type: str = "regex",
    name_col: str = "metric_name",
) -> DataFrame:
    op = operation_type.lower()
    col = F.col(name_col)
    if op == "prefix":
        found = col.startswith(metric_name)
    elif op == "substring":
        found = col.contains(metric_name)
    elif op == "regex":
        found = col.rlike(metric_name)
    else:
        raise ValueError(f"unknown operation_type {operation_type!r}")
    keep = found if action.lower() == "include" else ~found
    return df.filter(F.coalesce(keep, F.lit(action.lower() != "include")))


def delete_label_value(
    df: DataFrame, label_key: str, label_value: str, labels_col: str = "labels"
) -> DataFrame:
    """context delete_label_value (selector.c:337-366): drop series whose
    label matches the given key/value pair."""
    hit = F.col(labels_col).getItem(label_key) == F.lit(label_value)
    return df.filter(~F.coalesce(hit, F.lit(False)))
