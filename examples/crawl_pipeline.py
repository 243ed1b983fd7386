"""End-to-end crawl-to-corpus preparation — the front half of the
training-data recipe that corpus_pipeline.py finishes:

  1. WARC response parsing       (extensions/html.py::warc_parse)
  2. HTTP/status + content gate  (200 + text/html only)
  3. HTML -> text extraction     (html_extract; the WET step)
  4. robots.txt compliance       (parse_robots + robots_filter, RFC 9309)
  5. URL canonicalize + dedup    (extensions/urls.py)
  6. structural quality gate     (Gopher rules, prose rules skipped on
                                  synthetic text — same note as the
                                  batch corpus example)
  7. exact dedup + dataset write (dedup, storage)

Every stage is a scan-speed projection or a single keyed shuffle; the
whole chain is the shape a 100 TB Common-Crawl-style ingest runs.

Usage: python examples/crawl_pipeline.py [n_pages] — synthesizes a
deterministic WARC batch and prints per-stage surviving counts.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def synthesize_warc(spark, n_pages: int):
    """Deterministic WARC records: ~1/8 non-200, ~1/8 non-HTML, a
    robots-disallowed path band, duplicate page bodies, and short junk."""
    p = spark.range(n_pages)
    pid = F.col("id")
    status = F.when(pid % 8 == 3, "404 Not Found").otherwise("200 OK")
    ctype = F.when(pid % 8 == 5, "application/pdf").otherwise("text/html")
    # duplicate body text for id % 6 == 1 (copies its group leader id-1)
    base = F.when(pid % 6 == 1, pid - 1).otherwise(pid)
    words = F.concat_ws(
        " ",
        F.array(
            # the uid token makes every non-duplicate page distinct; dup
            # pages (base = leader id) reproduce their leader exactly
            F.concat(F.lit("uid"), base.cast("string")),
            *[
                F.concat(F.lit(f"w{j}tok"), (base * (j + 7) % 97).cast("string"))
                for j in range(59)
            ],
        ),
    )
    text = F.when(pid % 11 == 7, F.lit("too short")).otherwise(words)
    path = F.when(pid % 5 == 2, F.concat(F.lit("/private/"), pid.cast("string"))) \
            .otherwise(F.concat(F.lit("/article/"), pid.cast("string")))
    raw = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://site"),
        (pid % 10).cast("string"), F.lit(".example"), path,
        F.lit("\r\nWARC-Date: 2024-03-01T00:00:00Z\r\n\r\nHTTP/1.1 "),
        status,
        F.lit("\r\nContent-Type: "), ctype,
        F.lit("\r\n\r\n<html><head><title>t</title></head><body><p>"),
        text,
        F.lit("</p></body></html>"),
    )
    return p.select(pid.alias("doc_id"), raw.alias("raw"))


def run(spark, warc_df, out_dir: str, stage_counts: bool = True) -> dict[str, int]:
    """``stage_counts=True`` (the pedagogical default) counts every stage,
    which re-executes the growing lineage once per stage — fine for a
    demo, wrong for throughput. ``stage_counts=False`` runs the chain
    once into the final write (plus write_dataset's sizing count) — the
    deployment shape; only the final count is reported."""
    from fluent_bit_spark.extensions.dedup import exact_dedup
    from fluent_bit_spark.extensions.html import html_extract, warc_parse
    from fluent_bit_spark.extensions.text import gopher_quality
    from fluent_bit_spark.extensions.urls import (
        parse_robots, robots_filter, url_filter_dedup,
    )
    from fluent_bit_spark.storage import write_dataset

    def note(name, df):
        if stage_counts:
            counts[name] = df.count()
        return df

    counts: dict[str, int] = {}
    recs = note("warc_records", warc_parse(warc_df))

    pages = recs.filter(
        (F.col("http_status") == 200) & (F.col("content_type") == "text/html")
    )
    note("html_200", pages)

    wet = html_extract(
        pages.select("doc_id", "target_uri", F.col("body").alias("html")),
        html_col="html",
    ).join(pages.select("doc_id", "target_uri"), "doc_id")
    note("extracted", wet)

    # every site disallows /private/ for all agents
    robots = wet.select(
        F.regexp_extract("target_uri", r"://([^/]+)", 1).alias("domain")
    ).distinct().select(
        "domain", F.lit("User-agent: *\nDisallow: /private/").alias("robots_txt")
    )
    polite = robots_filter(
        wet.withColumnRenamed("target_uri", "url"), parse_robots(robots)
    )
    note("robots_ok", polite)

    deduped_url = url_filter_dedup(polite.select("doc_id", "url", F.col("body").alias("text")))
    note("url_dedup", deduped_url)

    g = gopher_quality(deduped_url)
    structural = (
        F.col("r_word_count") & F.col("r_mean_word_len") & F.col("r_symbol_ratio")
        & F.col("r_bullet_lines") & F.col("r_ellipsis_lines") & F.col("r_alpha_words")
    )
    quality = g.filter(structural).select("doc_id", "url", "text")
    note("quality", quality)

    final = note("exact_dedup", exact_dedup(quality))

    write_dataset(final, out_dir, target_rows_per_file=100_000)
    counts["written"] = spark.read.parquet(out_dir).count()
    return counts


def main() -> None:
    import tempfile

    from fluent_bit_spark import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
    spark = get_spark("crawl-pipeline")
    out = tempfile.mkdtemp(prefix="fbs_crawl_out_")
    counts = run(spark, synthesize_warc(spark, n), out)
    for stage, c in counts.items():
        print(f"{stage}: {c}")


if __name__ == "__main__":
    main()
