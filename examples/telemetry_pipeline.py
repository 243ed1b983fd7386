"""End-to-end telemetry analytics over Prometheus scrape pages.

The continuous-aggregate loop a metrics user runs, each stage one of
the engine's telemetry operators:

  1. decode scrape pages     (per-page header maps — streaming-legal)
  2. downsample              (per-(metric, instance) time buckets)
  3. gap fill (LOCF)         (missing buckets made explicit, then filled)
  4. counter rate()          (PromQL shape, reset detection)
  5. re-encode               (Prometheus exposition page of the rates)

Usage: python examples/telemetry_pipeline.py
Synthesizes a few scrape pages (two instances, 90 seconds of a counter
with one reset), prints the per-stage row counts and the final page.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def make_pages(spark):
    """Scrape pages: one page per (instance, scrape tick), counter samples
    with a reset on instance b at t=60."""
    pages = []
    for inst in ("a", "b"):
        for t in range(0, 90, 15):
            v = t * 2 if not (inst == "b" and t >= 60) else (t - 60)
            pages.append((
                "# TYPE http_requests_total counter\n"
                f'http_requests_total{{instance="{inst}"}} {v} {1700000000000 + t * 1000}\n',
            ))
    return spark.createDataFrame(pages, ["page"])


def run(spark) -> dict:
    from fluent_bit_spark.connectors import prom_exposition_decode_pages
    from fluent_bit_spark.extensions.timeseries import downsample, gap_fill, rate
    from fluent_bit_spark.sinks import prometheus_exposition

    counts = {}
    decoded = prom_exposition_decode_pages(make_pages(spark)).select(
        "metric_name",
        "metric_type",
        F.col("labels").getItem("instance").alias("instance"),
        "value",
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
    )
    counts["decoded_samples"] = decoded.count()

    ds = downsample(
        decoded, ["metric_name", "instance"], "ts", 30,
        [F.max("value").alias("value")],
    )
    counts["buckets"] = ds.count()

    filled = gap_fill(ds, ["metric_name", "instance"], 30, ["value"], method="locf")
    counts["filled"] = filled.count()

    rated = rate(filled, ["metric_name", "instance"], "value")
    counts["rated"] = rated.filter(F.col("rate").isNotNull()).count()

    page = prometheus_exposition(
        rated.filter(F.col("rate").isNotNull()).select(
            F.concat(F.col("metric_name"), F.lit(":rate30s")).alias("metric_name"),
            F.lit("gauge").alias("metric_type"),
            "instance",
            F.col("rate").alias("value"),
        ),
        label_cols=["instance"],
    )
    counts["page_lines"] = page.count()
    counts["_page"] = "\n".join(
        r.line for r in page.orderBy("metric", "kind", "line").collect()
    )
    return counts


if __name__ == "__main__":
    from fluent_bit_spark import get_spark

    counts = run(get_spark("fbs-telemetry-example"))
    page = counts.pop("_page")
    for stage, n in counts.items():
        print(f"{stage:16s} {n}")
    print("---")
    print(page)
