"""Streaming twin of corpus_pipeline.py — the ingest shape a corpus user
actually deploys: documents arrive as JSON-lines files in a drop
directory; each micro-batch is gated by the Gopher structural rules,
duplicates near in time are dropped by content hash under a watermark
bound, and survivors land in a date-partitioned dataset that the batch
stages (minhash near-dup, decontamination, split) sweep on a schedule.

  tail (json) -> gopher structural gate -> dropDuplicatesWithinWatermark
       -> partitioned parquet sink (append, exactly-once via checkpoint)

Scale shape: the gate is a pure per-row projection (no state); dedup
state is ONE small row (md5 hash + timestamp) per distinct doc inside
the watermark horizon, evicted by event time — the streaming analog of
exact_dedup's single uniform-key shuffle. Nothing here accumulates
unbounded state, so the pipeline runs indefinitely at ingest speed.

Usage: python examples/corpus_stream_pipeline.py [in_dir] [out_dir]
(with no args, synthesizes a drop directory and runs one availableNow
pass; prints surviving-document counts per stage).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from fluent_bit_spark.model import TS_COL


def build(spark, in_dir: str):
    """The streaming DataFrame: tail -> gate -> watermarked dedup.
    Returned un-started so callers pick the sink (parquet here, memory in
    tests, foreachBatch in a custom deploy)."""
    from fluent_bit_spark.extensions.dedup import normalize_text
    from fluent_bit_spark.extensions.text import gopher_quality
    from fluent_bit_spark.streaming.sources import tail_source

    sdf = tail_source(
        spark, in_dir, fmt="json",
        schema="doc_id long, text string, ets timestamp",
        tag_template="corpus.drop",
    ).withColumn(TS_COL, F.col("ets")).drop("ets")

    # Gopher structural rules (same subset the batch example gates on:
    # the synthetic corpus is not English prose, so the stopword rule is
    # left to a real deployment's composite `keep`)
    g = gopher_quality(sdf)
    structural = (
        F.col("r_word_count") & F.col("r_mean_word_len")
        & F.col("r_symbol_ratio") & F.col("r_bullet_lines")
        & F.col("r_ellipsis_lines") & F.col("r_alpha_words")
    )
    gated = g.filter(structural).select("doc_id", "text", TS_COL)

    # content-hash dedup with watermark-bounded state: a duplicate doc
    # arriving within 1 hour (event time) of the original is dropped;
    # state for older hashes is evicted, so memory is bounded by the
    # distinct-doc arrival rate, not corpus size
    hashed = gated.withColumn("content_h", F.md5(normalize_text(F.col("text"))))
    return hashed.withWatermark(TS_COL, "1 hour").dropDuplicatesWithinWatermark(
        ["content_h"]
    )


def run(spark, in_dir: str, out_dir: str, checkpoint_dir: str) -> None:
    """One availableNow pass into the date-partitioned parquet sink."""
    from fluent_bit_spark.storage import with_date_bucket

    out = with_date_bucket(build(spark, in_dir), ts_col=TS_COL, col_name="dt")
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("dt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)


def synthesize(in_dir: str, n_docs: int = 2000, dup_every: int = 4,
               junk_every: int = 10, n_files: int = 4) -> dict[str, int]:
    """Deterministic drop-directory corpus: good 60-word docs, short junk
    docs (fail the word-count rule), and exact duplicates of earlier good
    docs. Returns the expected per-stage counts."""
    import json

    Path(in_dir).mkdir(parents=True, exist_ok=True)
    per_file = n_docs // n_files
    expect = {"input": 0, "gated": 0, "deduped": 0}
    for f_idx in range(n_files):
        with open(Path(in_dir) / f"drop{f_idx}.json", "w") as f:
            for i in range(per_file):
                doc_id = f_idx * per_file + i
                if doc_id % junk_every == 0:
                    text = "too short"
                else:
                    base = doc_id - (doc_id % dup_every)
                    # dup_every-1 of every dup_every good docs repeat the
                    # group leader's text exactly
                    words = [f"w{base}x{j} token{j} sample{base}" for j in range(20)]
                    text = " ".join(words)
                ts = f"2024-01-01 00:{(doc_id // 60) % 60:02d}:{doc_id % 60:02d}"
                f.write(json.dumps({"doc_id": doc_id, "text": text, "ets": ts}) + "\n")
                expect["input"] += 1
    return expect


def main() -> None:
    import tempfile

    from fluent_bit_spark import get_spark

    spark = get_spark("corpus-stream-pipeline")
    if len(sys.argv) >= 3:
        in_dir, out_dir = sys.argv[1], sys.argv[2]
    else:
        in_dir = tempfile.mkdtemp(prefix="fbs_corpus_in_")
        out_dir = tempfile.mkdtemp(prefix="fbs_corpus_out_")
        synthesize(in_dir)
    cp = tempfile.mkdtemp(prefix="fbs_corpus_cp_")
    run(spark, in_dir, out_dir, cp)
    got = spark.read.parquet(out_dir)
    print(f"docs written: {got.count()} (partitions: "
          f"{[r.dt for r in got.select('dt').distinct().collect()]})")


if __name__ == "__main__":
    main()
