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
        return pd.Series(
            [
                f"1\n00:00:00,000 --> 00:00:00,300\nshot one of {int(i)}\n\n"
                f"2\n00:00:00,300 --> 00:00:00,600\nshot two of {int(i)}\n"
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
    return counts


if __name__ == "__main__":
    from fluent_bit_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("media-pipeline")
    for stage, n in run(spark, sf_dir).items():
        print(f"{stage}: {n}")
