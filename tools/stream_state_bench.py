"""Long-run streaming STATE measurement (not throughput): drive a
multi-batch sequence through the two stateful dedup paths and record
per-batch state growth.

1. ``dropDuplicatesWithinWatermark`` (dedup_stream): state-store rows,
   memory, and the watermark's EVICTION behavior — rows for hashes older
   than the horizon must leave state, so steady-state size is bounded by
   (distinct hashes per horizon), not stream length. Runs on the RocksDB
   state store provider when the JVM has it (it ships with Spark 4),
   falling back to the default HDFS-backed provider otherwise; the
   provider in effect is printed.

2. The band-hash HISTORY table (dedup_against_history via
   neardup_foreach_batch's semantics): by design membership never
   expires, so the table grows with distinct kept docs — the measurement
   records bytes/rows per batch and the effect of compact_history after
   replayed (duplicate) appends. The TTL knob for history is horizon
   pruning at compaction time (drop bands whose docs fell out of the
   retention window) — NOT implemented here because near-dup history is
   intentionally unbounded; compaction keeps it at one row per
   (band, doc) forever.

Each micro-batch carries ``DOCS_PER_BATCH`` docs: ~30% exact duplicates
of the previous batch (inside the watermark -> must be dropped and must
not grow state), the rest fresh. Event time advances BATCH_GAP_S per
batch so the watermark moves and eviction is observable.

Usage: python tools/stream_state_bench.py [n_batches] [docs_per_batch]
Prints a per-batch table and a JSON summary line for BASELINE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

BATCH_GAP_S = 60           # event-time advance per batch
WATERMARK = "90 seconds"   # ~1.5 batches of horizon


def synth_batch(spark, batch_idx: int, n: int):
    """n docs at event time T0 + batch_idx*gap; ids globally unique;
    ~30% of texts repeat the PREVIOUS batch's fresh texts (dups inside
    the watermark horizon)."""
    base = batch_idx * n
    rows = spark.range(base, base + n).select(
        F.col("id").alias("doc_id"),
        F.when(
            (F.col("id") % 10 < 3) & F.lit(batch_idx > 0),
            # duplicate: previous batch's text for the same offset
            F.concat(F.lit("document payload "), (F.col("id") - n).cast("string")),
        ).otherwise(
            F.concat(F.lit("document payload "), F.col("id").cast("string"))
        ).alias("text"),
        F.timestamp_seconds(
            F.lit(1_700_000_000 + batch_idx * BATCH_GAP_S) + (F.col("id") % 7)
        ).alias("timestamp"),
    )
    return rows


def run(n_batches: int, docs_per_batch: int) -> dict:
    from fluent_bit_spark import get_spark
    from fluent_bit_spark.extensions.dedup import (
        append_history, compact_history, dedup_against_history,
    )
    from fluent_bit_spark.streaming.stateful import dedup_stream

    spark = get_spark("stream-state-bench")
    rocksdb = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    try:
        spark._jvm.java.lang.Class.forName(rocksdb)
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocksdb)
        provider = "rocksdb"
    except Exception:
        provider = "hdfs-backed (default)"
    print(f"state store provider: {provider}")

    work = Path(tempfile.mkdtemp(prefix="fbs_state_bench_"))
    src = work / "in"
    src.mkdir()
    ckpt = str(work / "ckpt")
    out = str(work / "out")
    hist = str(work / "hist")

    sdf = (
        spark.readStream.schema("doc_id long, text string, timestamp timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    deduped = dedup_stream(sdf, text_col="text", watermark=WATERMARK)
    per_batch = []

    q = None
    try:
        for b in range(n_batches):
            pdf = synth_batch(spark, b, docs_per_batch).toPandas()
            with open(src / f"b{b:05d}.json", "w") as f:
                for r in pdf.itertuples(index=False):
                    f.write(json.dumps({
                        "doc_id": int(r.doc_id), "text": r.text,
                        "timestamp": r.timestamp.isoformat(),
                    }) + "\n")
            # drain exactly the new file, then stop (per-batch metrics)
            q = (
                deduped.writeStream.format("parquet")
                .option("path", out).option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start()
            )
            q.awaitTermination(600)
            prog = q.lastProgress
            ops = (prog or {}).get("stateOperators") or [{}]
            st = ops[0]
            survivors = spark.read.parquet(out)
            # history-table ingest: the kept rows' band hashes append
            kept_this = survivors.filter(
                F.col("doc_id") >= b * docs_per_batch
            )
            dedup_against_history(kept_this, hist, update_state=True)
            hist_rows = spark.read.parquet(hist).count()
            hist_bytes = sum(
                p.stat().st_size for p in Path(hist).rglob("*.parquet")
            )
            per_batch.append({
                "batch": b,
                "state_rows": st.get("numRowsTotal"),
                "state_mem_bytes": st.get("memoryUsedBytes"),
                "rows_evicted": st.get("numRowsRemoved"),
                "hist_rows": hist_rows,
                "hist_bytes": hist_bytes,
            })
            print(per_batch[-1])
    finally:
        if q is not None and q.isActive:
            q.stop()

    # duplicate-append replay, then compaction: rows collapse back
    survivors = spark.read.parquet(out)
    append_history(survivors, hist)  # simulated replayed batch
    inflated = spark.read.parquet(hist).count()
    compacted = compact_history(spark, hist)
    summary = {
        "metric": "stream state growth",
        "provider": provider,
        "n_batches": n_batches,
        "docs_per_batch": docs_per_batch,
        "watermark": WATERMARK,
        "per_batch": per_batch,
        "history_rows_after_replay": inflated,
        "history_rows_after_compaction": compacted,
    }
    print(json.dumps(summary))
    shutil.rmtree(work, ignore_errors=True)
    return summary


def run_heavy_hitters(n_batches: int, rows_per_batch: int, k: int = 100,
                      shards: int = 8) -> dict:
    """State-bound measurement for heavy_hitters_stream: drive batches
    of Zipf-ish keys whose CARDINALITY GROWS with stream length (every
    batch introduces rows_per_batch/2 never-seen keys) and record the
    state operator's numRowsTotal per batch — the claim under test is
    that state stays EXACTLY ``shards`` rows (one MG summary per shard,
    at most k-1 counters inside) no matter how many distinct keys have
    flowed through."""
    import os
    import time

    from fluent_bit_spark import get_spark
    from fluent_bit_spark.streaming.stateful import heavy_hitters_stream

    spark = get_spark("fbs-state-bench-hh")
    work = Path(tempfile.mkdtemp(prefix="fbs_hh_state_"))
    src = work / "in"
    src.mkdir()
    # hot keys + an unbounded cold tail: key cardinality grows linearly
    base = time.time() - 10_000
    for b in range(n_batches):
        fp = src / f"b{b:04d}.json"
        with open(fp, "w") as f:
            for i in range(rows_per_batch):
                if i % 2 == 0:
                    key = f"hot{i % 20}"
                else:
                    key = f"cold{b}_{i}"  # never repeats across batches
                f.write(json.dumps({"k": key}) + "\n")
        os.utime(fp, (base + b, base + b))
    sdf = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    per_batch = []

    def sink(df, epoch_id):
        df.persist().count()
        df.unpersist()

    q = (
        heavy_hitters_stream(sdf, "k", k=k, shards=shards)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(work / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1200)
    for p_ in q.recentProgress:
        ops = p_.get("stateOperators") or []
        if ops:
            per_batch.append(
                {
                    "batch": p_["batchId"],
                    "input_rows": p_["numInputRows"],
                    "state_rows": ops[0]["numRowsTotal"],
                    "state_bytes": ops[0]["stateMemory"]
                    if "stateMemory" in ops[0]
                    else ops[0].get("memoryUsedBytes"),
                }
            )
    distinct_seen = 20 + (n_batches * rows_per_batch) // 2
    summary = {
        "mode": "heavy_hitters",
        "batches": n_batches,
        "rows_per_batch": rows_per_batch,
        "k": k,
        "shards": shards,
        "distinct_keys_seen_approx": distinct_seen,
        "state_rows_final": per_batch[-1]["state_rows"] if per_batch else None,
        "state_rows_max": max((p_["state_rows"] for p_ in per_batch), default=None),
        "per_batch": per_batch,
    }
    print(json.dumps(summary))
    shutil.rmtree(work, ignore_errors=True)
    return summary


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "hh":
        n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
        rows = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
        run_heavy_hitters(n_batches, rows)
    else:
        n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
        docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
        run(n_batches, docs)
