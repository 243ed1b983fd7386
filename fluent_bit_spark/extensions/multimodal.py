"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
behind ``decode_stub`` (deterministic fake) / NotImplementedError — but the
Spark-side plumbing is real and tested: binary columns, typed metadata
structs, Arrow-batched mapInPandas with an explicit output schema, and
batch-shape control via maxRecordsPerBatch.

At 100 TB the pattern is: binary payloads stay columnar in parquet,
metadata extraction runs as mapInPandas over row groups (one Arrow batch
per ~N rows), and downstream filters use only the typed metadata so the
binary column is pruned from scans that don't need it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, fake_width int, fake_height int, "
    "fake_duration_ms int, sha string"
)


def to_media_frame(df: DataFrame, id_col: str, payload_col, kind: str) -> DataFrame:
    """Wrap an arbitrary source as (media_id, kind, content binary)."""
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload_col.cast("binary").alias("content"),
    )


def decode_stub(content: bytes, kind: str) -> dict:
    """Deterministic fake decode. A real deployment swaps this for
    PIL/ffmpeg; everything around it (schema, batching, pruning) is the
    production path."""
    n = len(content or b"")
    return {
        "n_bytes": n,
        "fake_width": (n % 640) + 1,
        "fake_height": (n % 480) + 1,
        "fake_duration_ms": (n * 7) % 10000,
    }


def real_decode(content: bytes, kind: str):  # pragma: no cover
    raise NotImplementedError(
        "media codecs are not available in this environment; use decode_stub"
    )


def extract_media_metadata(media: DataFrame, use_stub: bool = True) -> DataFrame:
    """mapInPandas metadata extraction: Arrow batches in, typed rows out.
    The binary column is consumed here and NOT carried downstream, so later
    stages prune it from the scan."""
    import hashlib

    decode = decode_stub if use_stub else real_decode

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for _, row in pdf.iterrows():
                m = decode(row["content"], row["kind"])
                m["media_id"] = row["media_id"]
                m["kind"] = row["kind"]
                m["sha"] = hashlib.sha256(row["content"] or b"").hexdigest()
                metas.append(m)
            yield pd.DataFrame(metas)[
                ["media_id", "kind", "n_bytes", "fake_width", "fake_height",
                 "fake_duration_ms", "sha"]
            ]

    return media.mapInPandas(extract, schema=MEDIA_META_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each media row into frame
    timestamps (decode itself stubbed). Shows the explode-side shape: one
    row per frame to extract, distributable across executors."""
    meta = extract_media_metadata(media)
    return meta.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("fake_duration_ms") / every_ms).cast("int") - 1, F.lit(0)))
        ).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
