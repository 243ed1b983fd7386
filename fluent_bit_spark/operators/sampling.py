"""processor_sampling: probabilistic and tail trace sampling.

Reference: plugins/processor_sampling/sampling_conf.c:25-48 (types),
sampling_tail.c (decision-wait buffering of whole traces),
sampling_cond_*.c (conditions: latency threshold, span count, status codes,
attribute matches).

- Probabilistic: deterministic hash-of-trace-id sampling — every span of a
  trace gets the same verdict, no RNG state, reproducible across retries
  (the reference hashes trace_id for the same reason). xxhash64 stays
  JVM-side.
- Tail: group spans by trace_id, compute trace-level stats, apply keep
  conditions, semi-join the winners back. In batch this is exact; in
  streaming the decision-wait maps to a session/window + state op.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample_probabilistic(
    df: DataFrame,
    percentage: float,
    key: str = "trace_id",
    seed: int = 0,
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Keep ~percentage% of traces, deterministically by key hash.
    Fractional percentages are honored to 0.01% granularity (the default
    hash buckets are basis points — ``int(percentage)`` truncation would
    keep NOTHING at the sub-1% rates tail sampling actually uses).

    ``bucket_expr`` overrides the default bucketing with a custom bucket
    column compared directly against ``percentage`` (e.g. a 0..99
    multiplicative-hash sampler reproducible in other engines)."""
    if bucket_expr is None:
        return df.filter(
            F.pmod(
                F.xxhash64(F.col(key).cast("string"), F.lit(seed)),
                F.lit(10_000),
            )
            < F.round(F.lit(percentage) * 100).cast("long")
        )
    return df.filter(bucket_expr < F.lit(percentage))


def sample_tail(
    df: DataFrame,
    trace_key: str = "trace_id",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    status_col: str | None = None,
    error_statuses: tuple = ("ERROR",),
    min_latency_sec: float | None = None,
    min_span_count: int | None = None,
    keep_condition: Column | None = None,
    base_percentage: float | None = None,
) -> DataFrame:
    """Tail sampling: keep full traces that are slow, big, errored, or match
    ``keep_condition``; optionally plus a deterministic base percentage."""
    aggs = [
        (F.max(F.col(end_col).cast("double")) - F.min(F.col(start_col).cast("double"))).alias(
            "__latency"
        ),
        F.count(F.lit(1)).alias("__span_count"),
    ]
    if status_col is not None:
        aggs.append(
            F.max(F.when(F.col(status_col).isin(list(error_statuses)), 1).otherwise(0)).alias(
                "__has_error"
            )
        )
    if keep_condition is not None:
        aggs.append(F.max(F.when(keep_condition, 1).otherwise(0)).alias("__cond"))

    stats = df.groupBy(trace_key).agg(*aggs)

    keep = F.lit(False)
    if min_latency_sec is not None:
        keep = keep | (F.col("__latency") >= min_latency_sec)
    if min_span_count is not None:
        keep = keep | (F.col("__span_count") >= min_span_count)
    if status_col is not None:
        keep = keep | (F.col("__has_error") == 1)
    if keep_condition is not None:
        keep = keep | (F.col("__cond") == 1)
    if base_percentage is not None:
        keep = keep | (
            F.pmod(F.xxhash64(F.col(trace_key).cast("string")), F.lit(100)) < int(base_percentage)
        )

    winners = stats.filter(keep).select(trace_key)
    # trace-id set is small relative to spans -> broadcastable semi-join
    return df.join(F.broadcast(winners), trace_key, "left_semi")
