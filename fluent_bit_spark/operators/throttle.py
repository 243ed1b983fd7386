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
    # floor, not a truncating cast: negative-epoch timestamps must pane
    # as wall-clock intervals, not merge into the adjacent 1970 pane
    return (
        F.floor(F.unix_timestamp(F.col(ts_col)) / interval_sec)
        .cast("long")
        .alias("__pane")
    )


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
    """Greedy byte budget per pane (per key): a record is admitted iff
    the ADMITTED total so far + its size stays within ``max_bytes`` —
    dropped records do not charge the budget, so one oversized record
    cannot empty the rest of its pane (throttle_size.c:406-423: only
    kept records add_load(); a drop leaves window->total unchanged and
    later smaller records still fit). That fold is sequential by
    nature (a prefix SUM would charge rejected rows), so it runs as an
    Arrow applyInPandas per (pane[, key]) group — bounded, uniformly
    spread groups. ``size_col_expr``: Column giving the record's size
    (e.g. F.octet_length('msg'))."""
    parts = ["__pane"] + ([key] if key else [])
    order_cols = [time_col] + list(tiebreak or [])
    base = df.withColumn("__pane", _pane(time_col, interval_sec)).withColumn(
        "__sz", size_col_expr.cast("long")
    )

    def fold(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_cols, kind="mergesort")
        total = 0
        keep = []
        for sz in pdf["__sz"]:
            s = 0 if sz is None or pd.isna(sz) else int(sz)
            ok = total + s <= max_bytes
            if ok:
                total += s
            keep.append(ok)
        return pdf[keep]

    return (
        base.groupBy(*parts)
        .applyInPandas(fold, schema=base.schema)
        .drop("__pane", "__sz")
    )
