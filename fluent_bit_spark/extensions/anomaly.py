"""Windowed anomaly detection on metric series.

Reference: plugins/processor_tda/tda.c:767-1182 runs topological data
analysis (ripser Betti numbers over a sliding window's distance matrix)
to flag anomalous metric windows. That exact algorithm is a research
plugin; the capability it delivers — "score each point of a metric
series against its recent window, flag outliers" — is re-expressed here
with two Spark-native detectors that scale per series:

- rolling z-score: |x - mean(window)| / std(window)
- rolling range-ratio: a persistence-like feature, how far the point
  sits outside the window's [min, max] band

Both are pure window functions: one shuffle on the series key, then
ordered evaluation inside each series partition — the same shape at
100 TB as at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def anomaly_scores(
    df: DataFrame,
    value_col: str,
    series_keys: list[str],
    time_col: str = "timestamp",
    window_rows: int = 20,
    z_threshold: float = 3.0,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Add ``z_score``, ``range_ratio`` and ``is_anomaly`` columns.

    The window is the previous ``window_rows`` points (exclusive of the
    current one, so a spike can't mask itself). Early points with fewer
    than 3 predecessors score 0 (insufficient context, never anomalous).
    ``tiebreak`` columns pin the frame order when timestamps collide.
    """
    v = F.col(value_col).cast("double")
    order = [F.col(time_col)] + [F.col(c) for c in (tiebreak or [])]
    w = (
        Window.partitionBy(*series_keys)
        .orderBy(*order)
        .rowsBetween(-window_rows, -1)
    )
    mean = F.mean(v).over(w)
    std = F.stddev_samp(v).over(w)
    n = F.count(v).over(w)
    wmin, wmax = F.min(v).over(w), F.max(v).over(w)
    z = F.when((n >= 3) & (std > 0), F.abs(v - mean) / std).otherwise(F.lit(0.0))
    span = F.when(wmax - wmin > 0, wmax - wmin).otherwise(F.lit(1.0))
    rr = F.when(
        n >= 3,
        F.greatest(wmin - v, v - wmax, F.lit(0.0)) / span,
    ).otherwise(F.lit(0.0))
    return (
        df.withColumn("z_score", z)
        .withColumn("range_ratio", rr)
        .withColumn("is_anomaly", z > F.lit(z_threshold))
    )
