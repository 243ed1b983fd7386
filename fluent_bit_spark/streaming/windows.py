"""Streaming window aggregation — the SP dialect on unbounded input.

The reference's windows are processing-time (timers, flb_sp.c:512-545) with
no watermarks (SURVEY §2.9). Default here is event-time + watermark (the
deterministic, late-data-aware upgrade); `time_mode='processing'` stamps
current_timestamp() for behavioral parity with the reference.

The compiled plan is the same one the batch path produces — Structured
Streaming runs it incrementally with state-store-backed aggregation, which
replaces the reference's subtractable-aggregate hopping slots
(flb_sp.c:1852-2004) wholesale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.model import TS_COL
from fluent_bit_spark.sp import ast
from fluent_bit_spark.sp.compiler import compile_select
from fluent_bit_spark.sp.parser import parse_sql


def sp_stream_query(
    sdf: DataFrame,
    sql: str,
    watermark: str = "30 seconds",
    time_mode: str = "event",
    time_col: str = TS_COL,
) -> DataFrame:
    """Compile one SP SELECT against a streaming DataFrame.

    time_mode='processing' reproduces the reference's wall-clock windows;
    'event' (default) uses the event timestamp + watermark for late data.
    """
    cmd = parse_sql(sql)
    if cmd.kind != "select":
        raise ValueError("streaming path takes a plain SELECT (use SPContext for DDL)")
    sel = cmd.select
    src = sdf
    if time_mode == "processing":
        src = src.withColumn(time_col, F.current_timestamp())
    if sel.window is not None and watermark:
        src = src.withWatermark(time_col, watermark)
    return compile_select(sel, src, time_col=time_col)


def windowed_counts(
    sdf: DataFrame,
    size_sec: int,
    keys: list[str],
    advance_sec: int | None = None,
    watermark: str = "30 seconds",
    time_col: str = TS_COL,
) -> DataFrame:
    """Convenience: tumbling/hopping count+rate per key group."""
    size = f"{size_sec} seconds"
    w = (
        F.window(F.col(time_col), size, f"{advance_sec} seconds")
        if advance_sec
        else F.window(F.col(time_col), size)
    )
    return (
        sdf.withWatermark(time_col, watermark)
        .groupBy(w.alias("__w"), *[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            *[F.col(k) for k in keys],
            "cnt",
        )
    )
