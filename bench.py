"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query materializes via the noop sink (full execution, no driver
collect). Timings are wall-clock per query, warm session, best of
$SPARK_GRAFT_BENCH_RUNS attempts (default 2) — the min discards CPU-steal
spikes from co-tenant VMs, which otherwise inflate single readings by up
to ~8x (observed run-to-run variance on an idle guest).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod
from fluent_bit_spark import get_spark

BENCH_QUERIES = [
    "q1_pricing_summary",
    "join_q3_shipping",
    "join_q5_region",
    "sp_projection",
    "sp_window_tumbling",
    "sp_window_hopping",
    "sp_forecast",
    "throttle_rate",
    "cumulative_to_delta",
    "log_to_metrics_counter",
    "multiline_sessionize",
    "window_rank_topk",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "similarity_topk",
    "similarity_lsh_ann",
    "text_quality",
    "doc_fingerprint",
    "q6_forecast_revenue",
    "anomaly_zscore",
    "udf_hook",
    "pii_redaction",
    "log_to_metrics_summary",
    "ml_inference_scores",
    "text_repetition",
    "decontaminate",
    "dedup_clusters",
    "domain_mix",
    "c4_clean_docs",
    "syslog_5424_lines",
    "influxdb_lines",
    "http_body",
    "forward_wire_roundtrip",
    "multimodal_headers",
    "ml_inference_mlp",
    "line_dedup",
    "embedding_quantize",
    "sketch_distinct",
    "sketch_rollup",
    "sketch_quantiles",
    "sketch_ranks",
    "sketch_overlap",
    "ts_downsample",
    "ts_gapfill_locf",
    "ts_rate",
    "interval_band_join",
    "dataset_split",
    "otlp_traces_roundtrip",
    "otlp_metrics_roundtrip",
    "otlp_histogram_roundtrip",
    "prom_scrape_roundtrip",
    "gopher_quality",
    "url_canonicalize",
    "domain_cap",
    "lm_quality",
    "fuzzy_decontaminate",
    "bpe_roundtrip",
    "sp_projection_variant",
    "dsir_select",
    "bm25_topk",
    "repeated_spans",
    "lm_bigram_quality",
    "ccnet_buckets",
    "media_resize_grid",
    "pagerank_nodes",
    "html_extract",
    "warc_wet",
    "robots_compliance",
    "stratified_sample",
    "dataset_diff",
    "pack_sequences",
    "table_profile",
    "bm25_indexed",
    "cluster_balanced",
    "pack_ffd",
    "exact_substr_trim",
    "nb_quality_classifier",
    "token_budget_select",
    "shuffle_shards",
    "span_decontaminate",
    "leakage_safe_split",
    "fuzzy_join_trigram",
    "entity_resolution",
    "edit_distance_join",
    "funnel_levels",
    "cohort_retention",
    "active_users_window",
    "top_session_paths",
    "event_transitions",
    "rfm_segments",
    "session_summaries",
    "experiment_stats",
    "log_templates",
    "bm25_served",
    "bm25_serve_only",
    "bm25_appended",
    "bm25_append_only",
    "pq_appended",
    "ann_served",
    "ann_serve_only",
    "triangle_count",
    "skew_profile",
    "heavy_hitters",
    "winsorize",
    "image_neardup",
    "audio_neardup",
    "audio_neardup_guarded",
    "attribution",
    "robust_anomaly",
    "video_neardup",
    "video_neardup_paired",
    "video_neardup_guarded",
    "video_frame_plan",
    "video_scene_sample",
    "caption_frames",
    "caption_coverage",
    "tar_shard_roundtrip",
    "mkv_headers",
    "mkv_frame_plan",
    "gif_animation",
    "adpcm_roundtrip",
    "media_sniff_extended",
    "mojibake_repair",
    "warc_gz_roundtrip",
    "fmp4_frame_plan",
    "exif_orientation",
    "elst_frame_plan",
    "fmp4_multitrack_plan",
    "warc_quality_pipeline",
    "mp3_frame_plan",
    "boilerplate_blocks",
    "fmp4_audio_track_plan",
    "aac_frame_plan",
    "warc_fetch_windows",
    "boilerplate_context",
    "pipeline_e2e",
]

# the registry versions of these wrap the operator in an oracle-checkable
# verification harness (brute-force witness joins / exact-topk recall
# gates); the bench — and tools/plan_audit.py — time/audit the bare
# OPERATOR under the same name so the numbers stay comparable to
# BASELINE.md, which recorded the operator alone.
BENCH_FORMS = {
    "dedup_minhash": entrymod.dedup_minhash_raw,
    "dedup_simhash": entrymod.dedup_simhash_raw,
    "similarity_lsh_ann": entrymod.similarity_lsh_ann_raw,
    "fuzzy_decontaminate": entrymod.fuzzy_decontaminate_raw,
    "bm25_serve_only": entrymod.bm25_serve_only_raw,
    "bm25_append_only": entrymod.bm25_append_only_raw,
    "ann_serve_only": entrymod.ann_serve_only_raw,
    "audio_neardup_guarded": entrymod.audio_neardup_guarded_raw,
    "video_neardup": entrymod.video_neardup_raw,
    "video_neardup_paired": entrymod.video_neardup_paired_raw,
    "video_neardup_guarded": entrymod.video_neardup_guarded_raw,
}

# run once per session BEFORE the timed loop: build-once/serve-many
# operators amortize their build, so the serve-only bench numbers must
# not include it (bm25_served / ann_served time the full cycle)
BENCH_SETUP = {
    "bm25_serve_only": entrymod.bm25_serve_setup,
    "bm25_append_only": entrymod.bm25_append_setup,
    "ann_serve_only": entrymod.ann_serve_setup,
}


def _pipeline_e2e(spark, sf_dir: str) -> dict:
    """Config-driven end-to-end: classic .conf -> tagged input -> filters ->
    five sink routes (file/es/loki/influxdb/null), counts riding each write
    via observe(). This is the 'config is the plan' path a migrating
    fluent-bit user runs."""
    import shutil
    import tempfile

    from fluent_bit_spark.pipeline import load_pipeline

    tmp = tempfile.mkdtemp(prefix="fbs_bench_pipe_")
    conf_text = f"""
[INPUT]
    Name parquet
    Path {sf_dir}/events.parquet
    Tag app.events
    Time_Key ts
    Repartition auto

[FILTER]
    Name grep
    Match app.*
    Regex event_type ^(view|click|purchase|error|signup)$

[FILTER]
    Name modify
    Match *
    Add env prod

[OUTPUT]
    Name file
    Match *
    Path {tmp}/file
    Format json

[OUTPUT]
    Name es
    Match *
    Path {tmp}/es

[OUTPUT]
    Name loki
    Match *
    Path {tmp}/loki
    Line_Key props

[OUTPUT]
    Name influxdb
    Match *
    Path {tmp}/influx
    Field_Keys value
    Tag_Keys event_type

[OUTPUT]
    Name null
    Match *
"""
    try:
        pipe = load_pipeline(spark, conf_text)
        return pipe.run_outputs()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("fbs-bench")
    qs = entrymod.queries()

    # warmup: touch every table once (parquet footers, JVM codegen paths)
    # and fork the Arrow python workers once (numpy import + worker pool)
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from fluent_bit_spark.model import TESTDATA_TABLES, load_table

    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).count()

    @pandas_udf("long")
    def _warm(s):
        import numpy as _np  # noqa: F401

        return s

    spark.range(10_000, numPartitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        _warm(F.col("id"))
    ).write.format("noop").mode("overwrite").save()

    # Whole-suite passes with per-query min ACROSS passes: a CPU-steal burst
    # from a co-tenant VM lasts seconds, so two back-to-back attempts of the
    # same query both eat it — attempts ~30s apart (one full pass) don't.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    only = {
        q.strip()
        for q in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",")
        if q.strip()
    }
    names = [q for q in BENCH_QUERIES if not only or q in only]
    for name in names:
        if name in BENCH_SETUP:
            BENCH_SETUP[name](spark, sf_dir)
    timings: dict[str, float] = {}
    for _ in range(runs):
        for name in names:
            fn = BENCH_FORMS.get(name, qs.get(name))
            t0 = time.perf_counter()
            if name == "pipeline_e2e":
                _pipeline_e2e(spark, sf_dir)  # runs its own sink writes
            else:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            took = time.perf_counter() - t0
            timings[name] = round(min(timings.get(name, float("inf")), took), 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    line = json.dumps(
        {
            "metric": "fluent_bit_spark headline suite wall-clock",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        }
    )
    # the per-query dict outgrew harness stdout-tail caps (r11: only 77
    # of 133 queries were recoverable from the truncated driver
    # artifact) — persist the full line next to the script so every run
    # leaves a complete record regardless of how stdout is captured
    try:
        (Path(__file__).resolve().parent / "BENCH_LATEST.json").write_text(
            line + "\n"
        )
    except OSError:
        pass  # read-only checkout: stdout still carries the line
    print(line)


_USAGE = """\
usage: python bench.py

Runs the full headline-query suite (no positional arguments; any flag,
including --help, prints this and exits). Configuration is via env vars:
  SPARK_GRAFT_SF_DIR      parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS        local[] cores (default 32)
  SPARK_GRAFT_BENCH_RUNS  passes, per-query min kept (default 2)
  SPARK_GRAFT_BENCH_ONLY  comma-separated query-name allowlist
Prints ONE JSON line: {"metric": ..., "value": sec, "queries": {...}}.
"""

if __name__ == "__main__":
    # an unknown arg must not silently launch a multi-minute suite run
    if len(sys.argv) > 1:
        print(_USAGE, end="")
        sys.exit(0 if sys.argv[1] in ("-h", "--help") else 2)
    main()
