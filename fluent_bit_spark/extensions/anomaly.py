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


def robust_anomaly_scores(
    df: DataFrame,
    value_col: str,
    series_keys: list[str],
    z_threshold: float = 3.5,
) -> DataFrame:
    """Median/MAD robust outlier scoring per series — the global
    companion to the rolling z-score above for the case its docstring
    flags: a contaminated window inflates mean/std and masks the very
    outliers being hunted, while the median and the median absolute
    deviation have a 50% breakdown point (Iglewicz & Hoadley 1993
    modified z-score, |0.6745 * (x - median) / MAD|).

    Adds ``med``, ``mad``, ``robust_z``, ``is_anomaly``. Degenerate
    series (MAD = 0 — over half the points identical) score 0 with
    is_anomaly false for points AT the median and true for any point
    off it (any deviation from a half-constant series is an outlier at
    every threshold). Values round to 6 decimals for cross-engine
    replay; median and MAD use the DISCRETE percentile (an actual data
    value, lower-middle at even counts) — interpolated percentiles
    differ across engines in the last ulp ((1-f)a+fb vs a+f(b-a)), and
    an ulp under the robust_z division flips its final rounding, so the
    exact-value form is the replayable one.

    Shape: one per-series aggregate (two percentile passes ship only
    per-series scalars) broadcast back by key — no window sort, no
    per-row Python; scales with series count, not points per series."""
    r = F.round(F.col(value_col).cast("double"), 6)
    med = (
        df.withColumn("__r", r)
        .groupBy(*series_keys)
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __r)").alias("med")
        )
    )
    dev = df.join(med, series_keys).withColumn(
        "__adev", F.abs(r - F.col("med"))
    )
    mad = dev.groupBy(*series_keys).agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __adev)").alias("mad")
    )
    # floor(x*1e6 + 0.5)/1e6, NOT F.round: Spark rounds the double's
    # SHORTEST decimal string (BigDecimal.valueOf) while SQL engines
    # round the true binary value, and a quotient landing on an exact
    # .5 boundary of a non-representable double splits the two; the
    # floor form is plain IEEE arithmetic both engines compute bit-
    # identically (robust_z >= 0, so no negative-floor correction)
    z6 = F.floor(
        F.lit(0.6745) * F.col("__adev") / F.col("mad") * F.lit(1e6) + F.lit(0.5)
    ) / F.lit(1e6)
    scored = dev.join(mad, series_keys).withColumn(
        "robust_z",
        F.when(F.col("mad") > 0, z6).otherwise(F.lit(0.0)),
    )
    return scored.withColumn(
        "is_anomaly",
        F.when(F.col("mad") > 0, F.col("robust_z") > z_threshold).otherwise(
            F.col("__adev") > 0
        ),
    ).drop("__adev")
