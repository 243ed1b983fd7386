"""Streaming ingest throughput: JSON-lines tail -> parse -> windowed
count -> memory sink, one availableNow pass. Prints rows/sec.

Protocol: one warmup pass over a small directory first (the first
streaming query in a session pays ~4 s of codegen/JIT/state-store class
loading that steady-state ingest never sees), then best of
$SPARK_GRAFT_BENCH_RUNS timed passes (default 2) — same min-discards-noise
rule as bench.py.

Usage: python tools/stream_bench.py [n_rows]
       python tools/stream_bench.py corpus [n_docs]
       python tools/stream_bench.py warc [n_archives] [recs_per_archive]
(the second form benches examples/corpus_stream_pipeline.py: tail ->
gopher gate -> watermarked content-hash dedup -> partitioned parquet;
the third benches warc_source: a spooled directory of .warc.gz crawl
archives -> member inflate -> Content-Length framing -> WARC/HTTP parse
-> WARC-Date event time -> per-minute fetch windows, reporting
archives/s, records/s, and inflated MB/s)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from fluent_bit_spark import get_spark
from fluent_bit_spark.model import TS_COL
from fluent_bit_spark.streaming.sources import tail_source


def _write_corpus(n_rows: int, n_files: int = 8) -> tuple[str, int]:
    d = tempfile.mkdtemp(prefix="fbs_stream_")
    per_file = n_rows // n_files
    for f_idx in range(n_files):
        with open(Path(d) / f"in{f_idx}.json", "w") as f:
            for i in range(per_file):
                f.write(
                    json.dumps(
                        {"event_type": f"t{i % 5}", "value": float(i % 997), "sec": i % 86400}
                    )
                    + "\n"
                )
    return d, n_files * per_file


def _one_pass(spark, d: str, name: str) -> float:
    sdf = tail_source(
        spark, d, fmt="json",
        schema="event_type string, value double, sec long",
        tag_template="bench.stream",
    ).withColumn(
        TS_COL,
        F.timestamp_seconds(F.unix_timestamp(F.lit("2024-01-01 00:00:00")) + F.col("sec")),
    )
    agg = sdf.withWatermark(TS_COL, "10 minutes").groupBy(
        F.window(TS_COL, "1 hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sv"))
    t0 = time.perf_counter()
    q = (
        agg.writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(600)
    return time.perf_counter() - t0


def _corpus_pass(spark, in_dir: str, tag: str) -> float:
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    import corpus_stream_pipeline as csp

    out = tempfile.mkdtemp(prefix=f"fbs_cb_out_{tag}_")
    cp = tempfile.mkdtemp(prefix=f"fbs_cb_cp_{tag}_")
    t0 = time.perf_counter()
    csp.run(spark, in_dir, out, cp)
    return time.perf_counter() - t0


def corpus_main() -> None:
    """Default 600k docs — the same scale as the plain-ingest bench, so
    the ~2.5 s fixed cost of an availableNow pass (query start, state
    store init across partitions, the empty watermark-commit batch,
    parquet commit) amortizes and the number reads as STEADY-STATE
    ingest throughput. At 200k docs the same pipeline measures ~3x
    lower purely from that fixed cost (both sizes recorded in
    BASELINE.md)."""
    import os

    n = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    spark = get_spark("fbs-corpus-stream-bench")
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    import corpus_stream_pipeline as csp

    warm = tempfile.mkdtemp(prefix="fbs_cb_warm_")
    csp.synthesize(warm, n_docs=2_000)
    _corpus_pass(spark, warm, "warm")
    d = tempfile.mkdtemp(prefix="fbs_cb_in_")
    expect = csp.synthesize(d, n_docs=n)
    wall = min(_corpus_pass(spark, d, str(i)) for i in range(runs))
    print(
        json.dumps(
            {
                "metric": "corpus stream pipeline (tail -> gopher gate -> "
                          "watermark dedup -> partitioned parquet)",
                "rows": expect["input"],
                "wall_sec": round(wall, 2),
                "rows_per_sec": round(expect["input"] / wall),
            }
        )
    )


def _write_warc(
    n_archives: int, recs_per: int, body_repeat: int = 180
) -> tuple[str, int, int]:
    """Spool ``n_archives`` .warc.gz crawl segments of ``recs_per``
    response records each (~3 KB text bodies, WARC-Date values spread
    over an hour), alternating the canonical member-per-record layout
    with the whole-stream single member some writers emit. Returns
    (dir, n_records, inflated_bytes)."""
    from fluent_bit_spark.extensions.html import (
        make_warc_gz, make_warc_record,
    )

    d = tempfile.mkdtemp(prefix="fbs_warc_")
    inflated = 0
    for a in range(n_archives):
        recs = []
        for i in range(recs_per):
            sec = (a * recs_per + i) % 3600
            body = f"doc {a}:{i} " + "crawl body text data " * body_repeat
            recs.append(make_warc_record(
                "response", f"https://crawl.example/{a}/{i}", body,
                content_type="text/plain",
                date=f"2024-05-01T10:{sec // 60:02d}:{sec % 60:02d}Z",
            ))
        inflated += sum(len(r.encode()) for r in recs)
        (Path(d) / f"seg{a:04d}.warc.gz").write_bytes(
            make_warc_gz(recs, per_record_members=(a % 2 == 0))
        )
    return d, n_archives * recs_per, inflated


def _warc_pass(spark, d: str, name: str) -> float:
    from fluent_bit_spark.streaming.sources import warc_source

    sdf = warc_source(spark, d, streaming=True, ts_from="warc_date")
    agg = sdf.withWatermark(TS_COL, "10 minutes").groupBy(
        F.window(TS_COL, "1 minute")
    ).agg(
        F.count(F.lit(1)).alias("fetches"),
        F.sum(F.length("body")).alias("body_bytes"),
    )
    t0 = time.perf_counter()
    q = (
        agg.writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(600)
    return time.perf_counter() - t0


def warc_main() -> None:
    import os

    n_archives = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    recs_per = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    spark = get_spark("fbs-warc-stream-bench")
    warm, _, _ = _write_warc(4, 50)
    _warc_pass(spark, warm, "wb_warm")
    d, n_recs, inflated = _write_warc(n_archives, recs_per)
    wall = min(_warc_pass(spark, d, f"wb{i}") for i in range(runs))
    print(json.dumps({
        "metric": "warc stream ingest (archives -> inflate -> framing -> "
                  "parse -> event-time fetch windows)",
        "archives": n_archives,
        "records": n_recs,
        "inflated_mb": round(inflated / 1e6, 1),
        "wall_sec": round(wall, 2),
        "archives_per_sec": round(n_archives / wall, 1),
        "records_per_sec": round(n_recs / wall),
        "inflated_mb_per_sec": round(inflated / 1e6 / wall, 1),
    }))


def main() -> None:
    import os

    if len(sys.argv) > 1 and sys.argv[1] == "corpus":
        return corpus_main()
    if len(sys.argv) > 1 and sys.argv[1] == "warc":
        return warc_main()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    spark = get_spark("fbs-stream-bench")
    warm_dir, _ = _write_corpus(10_000)
    _one_pass(spark, warm_dir, "sb_warm")
    d, total = _write_corpus(n)
    wall = min(_one_pass(spark, d, f"sb{i}") for i in range(runs))
    print(
        json.dumps(
            {
                "metric": "streaming ingest (json tail -> event-time windowed agg)",
                "rows": total,
                "wall_sec": round(wall, 2),
                "rows_per_sec": round(total / wall),
            }
        )
    )


if __name__ == "__main__":
    main()
