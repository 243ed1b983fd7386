"""Scaling measurement: run the heavy-query tier at sf0.1 (driver data)
and at a generated sf1 (tools/gen_sf.py) and report per-query seconds
plus the scaling exponent  alpha = log(t_hi / t_lo) / log(rows_hi /
rows_lo)  — alpha <= ~1 means the plan scales linearly or better (the
fixed per-query overhead of job scheduling makes small queries sublinear);
alpha substantially above 1 flags a super-linear stage (a quadratic
bucket, a driver collect, a broadcast that stopped fitting).

Protocol mirrors bench.py: warm the tables + the Arrow worker pool, then
best-of-$SPARK_GRAFT_BENCH_RUNS (default 2) per query per scale.

Usage: python tools/scale_check.py [lo_dir hi_dir]
(defaults /root/testdata/sf0.1 and /tmp/sf1 — generate the latter with
`python tools/gen_sf.py 1 /tmp/sf1` first).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod

# the heaviest bench queries that read only the documents/events tables
# gen_sf.py synthesizes (BENCH_r04 ranking + the round-5 heavy additions)
HEAVY = [
    "dedup_minhash",
    "fuzzy_decontaminate",
    "pipeline_e2e",
    "dedup_clusters",
    "domain_cap",
    "url_canonicalize",
    "otlp_traces_roundtrip",
    "otlp_metrics_roundtrip",
    "line_dedup",
    "multiline_sessionize",
    "bm25_topk",
    "repeated_spans",
    "lm_bigram_quality",
    "pagerank_nodes",
    "robots_compliance",
    "dsir_select",
    # round-6 heavy additions
    "exact_substr_trim",
    "span_decontaminate",
    "nb_quality_classifier",
    "pack_ffd",
    "cluster_balanced",
    # round-8 additions (persisted serving + multimodal near-dup +
    # attribution); SPARK_GRAFT_BENCH_ONLY narrows a run to a subset
    "ann_serve_only",
    "image_neardup",
    "audio_neardup",
    # round-9: both quadratic-pocket guards engaged (max_bucket +
    # energy_floor) — the production config's alpha next to the exact one
    "audio_neardup_guarded",
    "attribution",
    # round-9: frame-level video near-dup (banded dHash probe + aligned
    # mean-Hamming verify)
    "video_neardup",
    # the max_bucket=32 production config next to the exact one (the
    # audio_neardup_guarded pattern); the pair_probe form is bench-only
    # (measured: concentrates structured hashes, BASELINE.md r9)
    "video_neardup_guarded",
    # round-9 scan-shaped additions: linear by design, measured to prove it
    "video_scene_sample",
    "caption_frames",
    "tar_shard_roundtrip",
    # round-10 additions: the codec/triage envelope queries (Arrow scan
    # passes, linear by design) + the coverage left-join + the
    # operational bm25 append split
    "gif_animation",
    "mkv_frame_plan",
    "adpcm_roundtrip",
    "media_sniff_extended",
    "caption_coverage",
    "bm25_append_only",
    "mojibake_repair",
    "warc_gz_roundtrip",
    "fmp4_frame_plan",
    "exif_orientation",
    # round-11 additions: the edit-list / muxed-fragment / mp3 frame
    # plans (Arrow scan passes, linear by design) + the crawl-source
    # composition (inflate + framing + parse + quality in one chain)
    "elst_frame_plan",
    "fmp4_multitrack_plan",
    "mp3_frame_plan",
    "warc_quality_pipeline",
    "boilerplate_blocks",
    # round-12 additions: the audio-track plans (Arrow scan passes,
    # linear by design), crawl event-time windows, and the jusText
    # context pass (one (doc, block_idx) window exchange)
    "fmp4_audio_track_plan",
    "aac_frame_plan",
    "warc_fetch_windows",
    "boilerplate_context",
    # round-13: the optimized heavy operators the r12 VERDICT flagged as
    # missing scale evidence (8-vs-32-core ratios read ~1 at sf0.1
    # because per-query fixed cost dominates there)
    "bm25_appended",
    "ann_served",
    "pack_sequences",
]


def run_suite(spark, sf_dir: str, runs: int) -> dict[str, float]:
    import bench

    qs = entrymod.queries()
    for t in ("documents", "events", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    only = {
        q.strip()
        for q in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",")
        if q.strip()
    }
    names = [q for q in HEAVY if not only or q in only]
    for name in names:
        if name in getattr(bench, "BENCH_SETUP", {}):
            bench.BENCH_SETUP[name](spark, sf_dir)
    timings: dict[str, float] = {}
    for _ in range(runs):
        for name in names:
            fn = bench.BENCH_FORMS.get(name, qs.get(name))
            t0 = time.perf_counter()
            if name == "pipeline_e2e":
                bench._pipeline_e2e(spark, sf_dir)
            else:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            took = time.perf_counter() - t0
            timings[name] = round(min(timings.get(name, float("inf")), took), 3)
    return timings


def main() -> None:
    from fluent_bit_spark import get_spark

    lo = sys.argv[1] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    hi = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    spark = get_spark("fbs-scale-check")
    ratio = (
        spark.read.parquet(f"{hi}/events.parquet").count()
        / spark.read.parquet(f"{lo}/events.parquet").count()
    )
    t_lo = run_suite(spark, lo, runs)
    t_hi = run_suite(spark, hi, runs)
    out = {}
    for name in t_lo:
        a, b = t_lo[name], t_hi[name]
        out[name] = {
            "lo_sec": a,
            "hi_sec": b,
            "alpha": round(math.log(b / a) / math.log(ratio), 2) if a > 0 else None,
        }
    print(json.dumps({"rows_ratio": round(ratio, 2), "queries": out}, indent=1))


if __name__ == "__main__":
    main()
