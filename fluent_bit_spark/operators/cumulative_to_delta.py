"""processor_cumulative_to_delta: cumulative counters -> per-interval deltas.

Reference: plugins/processor_cumulative_to_delta/cumulative_to_delta.c:109-120
— delta = value - previous value per metric series, with counter-reset
detection (value dropped below previous -> the new value IS the delta,
i.e. the counter restarted from 0).

Spark: value - lag(value) over (partition by series keys order by ts).
The partition keys keep series colocated, so at 100 TB this is one shuffle
on the series key — exactly the partitioning a metrics store wants anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fluent_bit_spark.model import TS_COL


def cumulative_to_delta(
    df: DataFrame,
    value_col: str,
    series_keys: list[str],
    time_col: str = TS_COL,
    out_col: str | None = None,
    drop_first: bool = False,
) -> DataFrame:
    """Adds ``out_col`` (default '<value_col>_delta').

    First point of a series: NULL delta if drop_first else the raw value
    (reference emits the first observation as its own delta).
    """
    out_col = out_col or f"{value_col}_delta"
    w = Window.partitionBy(*series_keys).orderBy(F.col(time_col))
    prev = F.lag(F.col(value_col)).over(w)
    raw_delta = F.col(value_col) - prev
    delta = (
        F.when(prev.isNull(), None if drop_first else F.col(value_col))
        .when(raw_delta < 0, F.col(value_col))  # reset detection
        .otherwise(raw_delta)
    )
    return df.withColumn(out_col, delta)
