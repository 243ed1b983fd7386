"""filter_throttle / filter_throttle_size: rate limits over time windows.

Reference: plugins/filter_throttle/throttle.h:27-56 (sliding window of
``window_size`` panes each ``interval`` wide; drop records beyond ``rate``
per pane-average) and plugins/filter_throttle_size/throttle_size.c (same
with a byte budget per key group).

Batch translation: assign each record to its interval pane, keep the first
``rate`` records per pane (row_number over event-time order — deterministic,
unlike the reference's arrival order) or records while the running byte sum
stays under budget. Scale note: the window partitions by (pane [, key]), so
skew only arises from genuinely hot panes; AQE skew-split handles that.
Streaming mode: fluent_bit_spark.streaming.stateful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fluent_bit_spark.model import TS_COL


def _pane(ts_col: str, interval_sec: int):
    return (F.unix_timestamp(F.col(ts_col)) / interval_sec).cast("long").alias("__pane")


def throttle(
    df: DataFrame,
    rate: int,
    interval_sec: int = 1,
    time_col: str = TS_COL,
    key: str | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Keep at most ``rate`` records per ``interval_sec`` pane (per key)."""
    parts = ["__pane"] + ([key] if key else [])
    order = [F.col(time_col)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*parts).orderBy(*order)
    return (
        df.withColumn("__pane", _pane(time_col, interval_sec))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= rate)
        .drop("__pane", "__rn")
    )


def throttle_size(
    df: DataFrame,
    max_bytes: int,
    size_col_expr,
    interval_sec: int = 1,
    time_col: str = TS_COL,
    key: str | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Keep records while the running byte total per pane (per key) stays
    within ``max_bytes``. ``size_col_expr``: Column giving the record's size
    (e.g. F.octet_length('msg'))."""
    parts = ["__pane"] + ([key] if key else [])
    order = [F.col(time_col)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*parts).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return (
        df.withColumn("__pane", _pane(time_col, interval_sec))
        .withColumn("__running", F.sum(size_col_expr).over(w))
        .filter(F.col("__running") <= max_bytes)
        .drop("__pane", "__running")
    )
