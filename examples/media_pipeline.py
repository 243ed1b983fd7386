"""Multimodal training-data pipeline, end-to-end — the media quartet
composed the way a vision-language data build consumes it:

  1. header triage           (extract_video_headers: route by container,
                              drop unparseable payloads at the scan)
  2. video near-dup dedup    (video_neardup_join: banded frame-dHash
                              probe + exact aligned mean-Hamming verify;
                              the lower id of each pair survives — trims
                              and re-encodes collapse too)
  3. scene segmentation      (scene_sample_plan: one representative
                              frame per SHOT, not per wall-clock tick)
  4. frame extraction        (decode_video_frames filtered to the
                              selected scene representatives — the rows
                              a codec fleet would fan out over)
  5. caption alignment       (align_captions_to_frames over the SAME
                              sampling: each kept frame paired with the
                              cue covering its timestamp)
  6. training-pair layout    ((media_id, scene_idx, ts_ms, pixels,
                              caption) — the sample a contrastive or
                              captioning trainer reads)

Every stage is the oracle-verified operator behind a registry query
(video_headers / video_neardup / video_scene_sample / caption_frames);
this example is the composition test — dedup feeds segmentation feeds
alignment, and the counts interlock.

Usage: python examples/media_pipeline.py [sf_dir]
Prints per-stage surviving counts.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def _corpus(spark, sf_dir: str):
    """Deterministic mixed corpus from the embeddings table: one scened
    AVI per vector (two shots of three frames), a TRIMMED duplicate
    every 10th clip, plus an SRT caption track per clip."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from fluent_bit_spark.extensions.video import make_avi
    from fluent_bit_spark.model import load_table

    emb = load_table(spark, sf_dir, "embeddings")

    @pandas_udf("binary")
    def to_avi(vecs: pd.Series, trims: pd.Series) -> pd.Series:
        out = []
        for v, trim in zip(vecs, trims):
            a = np.asarray(v, dtype="float64")
            px = (np.floor(np.abs(a) * 997.0) % 256).astype(np.uint8)
            g1 = np.concatenate([px, px[:8]]).reshape(8, 9)
            g2 = 255 - g1  # second shot: inverted raster (clean cut)
            frames = [g1.tobytes()] * 3 + [g2.tobytes()] * 3
            out.append(make_avi(9, 8, frames[int(trim) :], fps_num=10))
        return pd.Series(out)

    @pandas_udf("string")
    def to_srt(ids: pd.Series) -> pd.Series:
        # cue 2 ends at 500 ms: the LAST frame (ts 500) is uncovered by
        # construction, so the coverage accounting stage has real work
        return pd.Series(
            [
                f"1\n00:00:00,000 --> 00:00:00,300\nshot one of {int(i)}\n\n"
                f"2\n00:00:00,300 --> 00:00:00,500\nshot two of {int(i)}\n"
                for i in ids
            ]
        )

    base = emb.select(
        F.col("vec_id").alias("media_id"),
        to_avi(F.col("embedding"), F.lit(0)).alias("content"),
    )
    dups = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("media_id"),
        to_avi(F.col("embedding"), F.lit(1)).alias("content"),
    )
    captions = emb.select(
        F.col("vec_id").alias("media_id"),
        to_srt(F.col("vec_id")).alias("caption_text"),
    )
    return base.unionByName(dups), captions


def run(spark, sf_dir: str) -> dict[str, int]:
    from fluent_bit_spark.extensions.multimodal import to_media_frame
    from fluent_bit_spark.extensions.video import (
        align_captions_to_frames,
        decode_video_frames,
        extract_captions,
        extract_video_headers,
        scene_sample_plan,
        video_neardup_join,
    )

    counts: dict[str, int] = {}
    raw, caption_src = _corpus(spark, sf_dir)
    media = to_media_frame(raw, "media_id", F.col("content"), "video")
    media = media.localCheckpoint(eager=True)  # one fixture render
    counts["input_clips"] = media.count()

    # 1. header triage: keep parseable AVI/MP4 rows
    headers = extract_video_headers(media)
    parseable = headers.where(F.col("container").isNotNull())
    counts["parseable"] = parseable.count()

    # 2. near-dup dedup: lower id of each verified pair survives
    pairs = video_neardup_join(media, max_hamming=3)
    losers = pairs.select(F.col("id_b").alias("media_id")).distinct()
    kept = media.join(losers, "media_id", "left_anti").localCheckpoint(
        eager=True
    )
    counts["after_dedup"] = kept.count()

    # 3. scene segmentation on the survivors
    plan = scene_sample_plan(kept, threshold=16)
    counts["scenes"] = (
        plan.select("media_id", "scene_idx").distinct().count()
    )

    # 4. decode only the per-scene representatives
    reps = plan.where(F.col("selected")).select(
        "media_id", "frame_idx", "scene_idx"
    )
    frames = decode_video_frames(kept).join(
        reps, ["media_id", "frame_idx"]
    )
    counts["rep_frames"] = frames.count()

    # 5. caption alignment over the same timestamps
    cues = extract_captions(caption_src)
    paired = align_captions_to_frames(
        cues, frames.select("media_id", "frame_idx", "scene_idx", "ts_ms", "pixels")
    )
    counts["training_pairs"] = paired.count()

    # 6. caption-coverage accounting over the FULL plan (uncovered=True:
    # frames with no covering cue ride along as NULL-cue rows, so the
    # coverage rate is one aggregate away instead of a separate anti-join)
    cov = align_captions_to_frames(
        cues, plan.select("media_id", "frame_idx", "ts_ms"), uncovered=True
    )
    counts["planned_frames"] = cov.count()
    counts["uncovered_frames"] = cov.where(F.col("cue_idx").isNull()).count()
    return counts


def run_stream(spark, sf_dir: str, work_dir: str) -> dict[str, int]:
    """The SAME composition as ``run`` in its always-on deployment
    shape: a foreachBatch stage that per micro-batch triages, collapses
    within-batch near-dups, drops clips colliding with the video
    HISTORY store (so a trim re-ingested in a later batch still
    collapses — video_dedup_against_history's cross-batch contract),
    then scene-samples, decodes representatives and caption-aligns the
    survivors. The corpus is spooled as two micro-batches with every
    trimmed duplicate in a LATER batch than its original, so the summed
    per-batch counts equal the batch run's — asserted in
    tests/test_examples.py."""
    import os
    import time

    from fluent_bit_spark.extensions.multimodal import to_media_frame
    from fluent_bit_spark.extensions.video import (
        align_captions_to_frames,
        append_video_history,
        decode_video_frames,
        extract_captions,
        extract_video_headers,
        scene_sample_plan,
        video_dedup_against_history,
        video_neardup_join,
    )

    raw, caption_src = _corpus(spark, sf_dir)
    base = raw.where(F.col("media_id") < 1_000_000)
    dups = raw.where(F.col("media_id") >= 1_000_000)
    spool = os.path.join(work_dir, "in")
    os.makedirs(spool, exist_ok=True)
    t0 = time.time() - 1000
    for i, part in enumerate((base, dups)):
        bdir = os.path.join(work_dir, f"render_b{i}")
        part.coalesce(1).write.mode("overwrite").parquet(bdir)
        src = next(p for p in os.listdir(bdir) if p.endswith(".parquet"))
        dst = os.path.join(spool, f"b{i}.parquet")
        os.replace(os.path.join(bdir, src), dst)
        os.utime(dst, (t0 + i, t0 + i))

    state = os.path.join(work_dir, "video_history")
    cues = extract_captions(caption_src).localCheckpoint(eager=True)
    counts: dict[str, int] = {
        k: 0
        for k in (
            "input_clips", "parseable", "after_dedup", "scenes",
            "rep_frames", "training_pairs", "planned_frames",
            "uncovered_frames", "n_batches",
        )
    }

    def process(batch_df, batch_id: int) -> None:
        media = to_media_frame(
            batch_df, "media_id", F.col("content"), "video"
        ).localCheckpoint(eager=True)
        counts["n_batches"] += 1
        counts["input_clips"] += media.count()
        headers = extract_video_headers(media)
        counts["parseable"] += headers.where(
            F.col("container").isNotNull()
        ).count()
        pairs = video_neardup_join(media, max_hamming=3)
        losers = pairs.select(F.col("id_b").alias("media_id")).distinct()
        within = media.join(losers, "media_id", "left_anti")
        kept = video_dedup_against_history(
            within, state, max_hamming=3, update_state=False
        ).localCheckpoint(eager=True)
        counts["after_dedup"] += kept.count()
        plan = scene_sample_plan(kept, threshold=16)
        counts["scenes"] += (
            plan.select("media_id", "scene_idx").distinct().count()
        )
        reps = plan.where(F.col("selected")).select(
            "media_id", "frame_idx", "scene_idx"
        )
        frames = decode_video_frames(kept).join(reps, ["media_id", "frame_idx"])
        counts["rep_frames"] += frames.count()
        paired = align_captions_to_frames(
            cues,
            frames.select("media_id", "frame_idx", "scene_idx", "ts_ms", "pixels"),
        )
        counts["training_pairs"] += paired.count()
        cov = align_captions_to_frames(
            cues, plan.select("media_id", "frame_idx", "ts_ms"), uncovered=True
        )
        counts["planned_frames"] += cov.count()
        counts["uncovered_frames"] += cov.where(
            F.col("cue_idx").isNull()
        ).count()
        # sink-before-state happened above (the counts ARE the sink);
        # survivors' band rows append last — the at-least-once contract
        append_video_history(kept, state, max_hamming=3)

    sdf = (
        spark.readStream.schema("media_id long, content binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )
    q = (
        sdf.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    return counts


if __name__ == "__main__":
    from fluent_bit_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("media-pipeline")
    for stage, n in run(spark, sf_dir).items():
        print(f"{stage}: {n}")
