"""filter_log_to_metrics: derive counter/gauge/histogram metrics from logs.

Reference: plugins/filter_log_to_metrics/log_to_metrics.c:970-1283; modes
log_to_metrics.h:38-41 (COUNTER, GAUGE, HISTOGRAM), regex include/exclude
gating, value_field, label keys.

Output is the long-format metrics frame from SURVEY §1.5:
(metric_name, metric_type, labels..., value [, bucket]). Aggregation is a
plain groupBy — map-side partial aggregation makes this shuffle-light at
scale; optional event-time window column for windowed metric series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.model import TS_COL

DEFAULT_BUCKETS = (0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1, 2.5, 5, 10)


def _gate(df: DataFrame, include: tuple[str, str] | None, exclude: tuple[str, str] | None):
    if include is not None:
        key, pat = include
        df = df.filter(F.coalesce(F.col(key).cast("string").rlike(pat), F.lit(False)))
    if exclude is not None:
        key, pat = exclude
        df = df.filter(~F.coalesce(F.col(key).cast("string").rlike(pat), F.lit(False)))
    return df


def log_to_metrics(
    df: DataFrame,
    mode: str,
    metric_name: str,
    label_keys: list[str] | None = None,
    value_field: str | None = None,
    include: tuple[str, str] | None = None,
    exclude: tuple[str, str] | None = None,
    window_sec: int | None = None,
    time_col: str = TS_COL,
    buckets: tuple[float, ...] = DEFAULT_BUCKETS,
    quantiles: tuple[float, ...] | None = None,
    approx_quantiles: bool = False,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """mode: 'counter' (count records), 'gauge' (latest value_field),
    'histogram' (bucketed counts of value_field), 'summary' (quantiles +
    sum/count, the cmetrics summary type, cmetrics.h:26-30), 'untyped'
    (raw passthrough value, cmetrics untyped type)."""
    mode = mode.lower()
    labels = label_keys or []
    df = _gate(df, include, exclude)

    gb = [F.col(k) for k in labels]
    base_cols = []
    if window_sec is not None:
        w = F.window(F.col(time_col), f"{window_sec} seconds")
        gb = [w.alias("__w")] + gb
        base_cols = [F.col("__w.start").alias("window_start"), F.col("__w.end").alias("window_end")]

    meta = [F.lit(metric_name).alias("metric_name"), F.lit(mode).alias("metric_type")]

    if mode == "counter":
        agg = df.groupBy(*gb).agg(F.count(F.lit(1)).cast("double").alias("value"))
        return agg.select(*base_cols, *meta, *[F.col(k) for k in labels], "value")
    if mode == "gauge":
        if not value_field:
            raise ValueError("gauge mode requires value_field")
        agg = df.groupBy(*gb).agg(
            F.max_by(F.col(value_field), F.col(time_col)).cast("double").alias("value")
        )
        return agg.select(*base_cols, *meta, *[F.col(k) for k in labels], "value")
    if mode == "histogram":
        if not value_field:
            raise ValueError("histogram mode requires value_field")
        v = F.col(value_field).cast("double")
        # cumulative buckets like prometheus: le=b counts values <= b, +Inf
        # = all; '.' in bucket labels sanitized to '_' (column-name-safe)
        def bname(b):
            return f"le_{b}".replace(".", "_")

        bucket_exprs = [
            F.sum(F.when(v <= b, 1).otherwise(0)).cast("double").alias(bname(b))
            for b in buckets
        ] + [
            F.count(F.lit(1)).cast("double").alias("le_inf"),
            F.sum(v).alias("sum_value"),
        ]
        agg = df.groupBy(*gb).agg(*bucket_exprs)
        return agg.select(
            *base_cols, *meta, *[F.col(k) for k in labels],
            *[F.col(bname(b)) for b in buckets], "le_inf", "sum_value",
        )
    if mode == "summary":
        if not value_field:
            raise ValueError("summary mode requires value_field")
        v = F.col(value_field).cast("double")
        # exact percentiles by default (linear interpolation — matches SQL
        # percentile_cont). approx_quantiles=True switches to the
        # Greenwald-Khanna sketch (percentile_approx): bounded memory per
        # group regardless of group size — the 100 TB path when a hot label
        # set would otherwise buffer its whole value list in the exact agg.
        qs = quantiles or (0.5, 0.9, 0.99)

        def qname(q):
            return f"q_{q}".replace(".", "_")

        if approx_quantiles:
            q_exprs = [
                F.percentile_approx(v, F.lit(q), F.lit(approx_accuracy)).alias(qname(q))
                for q in qs
            ]
        else:
            q_exprs = [F.percentile(v, F.lit(q)).alias(qname(q)) for q in qs]
        agg = df.groupBy(*gb).agg(
            *q_exprs,
            F.sum(v).alias("sum_value"),
            F.count(F.lit(1)).cast("double").alias("count_value"),
        )
        return agg.select(
            *base_cols, *meta, *[F.col(k) for k in labels],
            *[F.col(qname(q)) for q in qs], "sum_value", "count_value",
        )
    if mode == "untyped":
        if not value_field:
            raise ValueError("untyped mode requires value_field")
        return df.select(
            *meta, *[F.col(k) for k in labels],
            F.col(value_field).cast("double").alias("value"),
        )
    raise ValueError(f"unknown log_to_metrics mode {mode!r}")
