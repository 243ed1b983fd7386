"""processor_labels: insert/update/upsert/delete/hash on metric labels.

Reference: plugins/processor_labels/labels.c:1904-1933 (config map:
update/insert/upsert take 'label_name value', delete/hash take
'label_name'; hash replaces the value with its SHA256,
labels.c config_map "Replaces a label's value with its SHA256 hash").
Values containing a record-accessor ``$key`` resolve against the record
(labels.c:47-56 struct label_kv.ra).

The metrics frame here carries labels as a ``map<string,string>`` column
(SURVEY §1.5 long-format metrics). All ops are JVM map expressions —
map_filter / map_concat / transform_values — no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _value_col(df: DataFrame, value: str) -> Column:
    """'$colname' -> record column (cast to string), else literal."""
    if isinstance(value, str) and value.startswith("$"):
        return F.col(value[1:]).cast("string")
    return F.lit(value).cast("string")


def _without(labels: Column, key: str) -> Column:
    return F.map_filter(labels, lambda k, _: k != F.lit(key))


def labels_modify(
    df: DataFrame,
    ops: list[tuple],
    labels_col: str = "labels",
) -> DataFrame:
    """Apply a list of ('insert'|'update'|'upsert'|'delete'|'hash', key
    [, value]) ops in order to the labels map column."""
    labels = F.col(labels_col)
    for op in ops:
        action, key = op[0].lower(), op[1]
        if action == "insert":  # only if absent
            val = _value_col(df, op[2])
            labels = F.when(
                F.map_contains_key(labels, F.lit(key)), labels
            ).otherwise(F.map_concat(labels, F.create_map(F.lit(key), val)))
        elif action == "update":  # only if present
            val = _value_col(df, op[2])

            def _upd(k, v):
                return F.when(k == F.lit(key), val).otherwise(v)

            labels = F.transform_values(labels, _upd)
        elif action == "upsert":
            val = _value_col(df, op[2])
            labels = F.map_concat(_without(labels, key), F.create_map(F.lit(key), val))
        elif action == "delete":
            labels = _without(labels, key)
        elif action == "hash":
            labels = F.transform_values(
                labels, lambda k, v: F.when(k == F.lit(key), F.sha2(v, 256)).otherwise(v)
            )
        else:
            raise ValueError(f"unknown labels action {action!r}")
        # re-anchor so each op builds on the previous one's result
        df = df.withColumn(labels_col, labels)
        labels = F.col(labels_col)
    return df


def columns_to_labels(df: DataFrame, keys: list[str], labels_col: str = "labels") -> DataFrame:
    """Fold label columns (log_to_metrics output shape) into one map."""
    entries = []
    for k in keys:
        entries.extend([F.lit(k), F.col(k).cast("string")])
    return df.withColumn(labels_col, F.create_map(*entries)).drop(*keys)


def labels_to_columns(df: DataFrame, keys: list[str], labels_col: str = "labels") -> DataFrame:
    """Project map entries back out as string columns."""
    for k in keys:
        df = df.withColumn(k, F.col(labels_col).getItem(k))
    return df.drop(labels_col)
