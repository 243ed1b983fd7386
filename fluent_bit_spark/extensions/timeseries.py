"""Time-series operators: bucketing, downsampling, gap-filling.

The hypertable/continuous-aggregate surface: regularize an event stream
into fixed time buckets, aggregate per bucket, then materialize the
missing buckets and fill them (NULL, last-observation-carried-forward, or
linear interpolation). fluent-bit's nearest analog is the tumbling-window
aggregate (src/stream_processor/flb_sp_window.c) which only EMITS buckets
that saw data; gap-aware output is what the downstream dashboards and
rate() calculations actually need.

Scale shape: downsample is one shuffle on (series keys, bucket) — a
uniform composite key. Gap-fill partitions by series and sorts by bucket
(the canonical time-series layout: a series fits an executor; the number
of series scales out), so state per task is one series slice, and the
spine explode materializes only each series' own [min, max] bucket range.
Everything is Catalyst expressions — codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_bucket(ts: Column, every_seconds: int) -> Column:
    """Floor a timestamp to a fixed-width bucket (exact integer
    arithmetic on epoch seconds — no timezone drift). floor(), not a
    truncating cast: pre-1970 (negative-epoch) timestamps must land in
    their own [-N, 0) bucket, not round toward the 1970 one."""
    secs = F.unix_timestamp(ts)
    return F.timestamp_seconds(
        F.floor(secs / every_seconds).cast("long") * every_seconds
    )


def downsample(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    every_seconds: int,
    aggs: list[Column],
) -> DataFrame:
    """Per-(series, bucket) aggregation: the continuous-aggregate /
    rollup building block. ``aggs`` are ordinary aggregate Columns with
    aliases. Output has ``bucket`` plus the keys and aggregates."""
    return (
        df.withColumn("bucket", time_bucket(F.col(ts_col), every_seconds))
        .groupBy(*keys, "bucket")
        .agg(*aggs)
    )


def downsample_stream(
    sdf: DataFrame,
    keys: list[str],
    ts_col: str,
    every_seconds: int,
    aggs: list[Column],
    watermark: str = "1 minute",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Streaming continuous-aggregate form of :func:`downsample`: the
    same per-(series, bucket) aggregation expressed as an event-time
    TUMBLING window with a watermark, so the state store holds only the
    open windows (closed ones emit and evict once the watermark passes —
    bounded state at any ingest rate). Output schema matches the batch
    downsample (bucket = window start), so the downstream gap_fill /
    rate() steps run unchanged on the materialized aggregate — the
    telemetry shape: stream maintains the rollup, queries read it."""
    out = (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), f"{every_seconds} seconds"), *keys)
        .agg(*aggs)
    )
    agg_cols = [c for c in out.columns if c not in ("window", *keys)]
    return out.select(
        F.col("window.start").alias(bucket_col), *keys, *agg_cols
    )


def gap_fill(
    df: DataFrame,
    keys: list[str],
    every_seconds: int,
    value_cols: list[str],
    method: str = "null",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Materialize the missing buckets of an already-downsampled frame and
    fill the value columns.

    For each series (distinct ``keys``), generates the complete bucket
    spine from that series' first to last observed bucket, left-joins the
    observations, and fills gaps per ``method``:

    - ``"null"``: emit the missing buckets with NULL values (the gap is
      made visible — what rate()/dashboard layers want as input);
    - ``"locf"``: last observation carried forward;
    - ``"linear"``: linear interpolation between the neighboring
      observations (rows outside any pair of observations stay NULL).

    Adds ``is_gap`` marking materialized rows — by JOIN provenance, not
    value NULL-ness: an OBSERVED bucket whose first value column happens
    to be NULL is not a gap (the old value-based flag mislabeled it and
    let locf/linear silently overwrite genuinely-observed NULLs'
    neighbours in gap audits). The spine join is keyed on (series,
    bucket) — same composite key as the downsample shuffle.
    """
    if method not in ("null", "locf", "linear"):
        raise ValueError(f"unknown gap-fill method {method!r}")
    step = F.lit(every_seconds)
    spine = (
        df.groupBy(*keys)
        .agg(
            F.min(bucket_col).alias("_lo"),
            F.max(bucket_col).alias("_hi"),
        )
        .select(
            *keys,
            F.explode(
                F.sequence(
                    F.unix_timestamp("_lo"),
                    F.unix_timestamp("_hi"),
                    step,
                )
            ).alias("_bs"),
        )
        .select(*keys, F.timestamp_seconds(F.col("_bs")).alias(bucket_col))
    )
    joined = (
        spine.join(
            df.withColumn("__obs", F.lit(True)), [*keys, bucket_col], "left"
        )
        .withColumn("is_gap", F.col("__obs").isNull())
        .drop("__obs")
    )
    if method == "null":
        return joined

    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    out = joined
    for v in value_cols:
        if method == "locf":
            out = out.withColumn(v, F.last(v, ignorenulls=True).over(w_prev))
        else:  # linear
            prev_v = F.last(v, ignorenulls=True).over(w_prev)
            next_v = F.first(v, ignorenulls=True).over(w_next)
            obs_t = F.when(F.col(v).isNotNull(), F.unix_timestamp(bucket_col))
            prev_t = F.last(obs_t, ignorenulls=True).over(w_prev)
            next_t = F.first(obs_t, ignorenulls=True).over(w_next)
            frac = (F.unix_timestamp(bucket_col) - prev_t) / (next_t - prev_t)
            interp = prev_v + (next_v - prev_v) * frac
            out = out.withColumn(
                v,
                F.when(F.col(v).isNotNull(), F.col(v)).otherwise(
                    F.when(
                        prev_v.isNotNull() & next_v.isNotNull(), interp
                    )
                ),
            )
    return out


def rate(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    time_col: str = "bucket",
    out_col: str = "rate",
) -> DataFrame:
    """Per-second rate of a cumulative counter series — the PromQL
    ``rate()`` shape composed from the cumulative_to_delta semantics
    (plugins/processor_cumulative_to_delta/cumulative_to_delta.c:109-120):
    delta between consecutive observations with counter-reset detection
    (a drop means the counter restarted, so the new value IS the
    increase), divided by the elapsed seconds between the observations.

    First point of each series has NULL rate (no elapsed interval).
    Same one-shuffle-per-series layout as gap_fill; composes with it —
    gap-fill the downsampled counter first and rates come out spaced on
    the regular bucket grid.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(time_col))
    prev_v = F.lag(F.col(value_col)).over(w)
    prev_t = F.lag(F.unix_timestamp(F.col(time_col))).over(w)
    elapsed = F.unix_timestamp(F.col(time_col)) - prev_t
    inc = F.when(F.col(value_col) >= prev_v, F.col(value_col) - prev_v).otherwise(
        F.col(value_col)  # reset: counter restarted from 0
    )
    return df.withColumn(
        out_col,
        F.when(
            prev_v.isNotNull() & (elapsed > 0), inc / elapsed
        ),
    )
