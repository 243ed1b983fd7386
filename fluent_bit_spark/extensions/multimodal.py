"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Metadata decode is REAL at the container-header level: pure-Python parsers
for the public PNG/JPEG/GIF/BMP/WAV formats (``parse_media_header``) read
width/height/channels/bit depth/sample rate/duration from the payload
bytes — exactly what scale metadata extraction reads, since full
pixel/sample decode is never done in the scan path. ``decode_stub``
remains as the deterministic fake for plumbing tests. Full pixel/sample
decode (resize, frame extraction) would need codec libraries not present
in this environment; the Spark-side plumbing for it — binary columns,
Arrow-batched mapInPandas, explicit schemas, batch-shape control — is the
same code path exercised here.

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


# --------------------------------------------------------------------------
# Real container-header decoding — pure-Python parsers for the public file
# formats (PNG, JPEG, GIF, BMP, WAV). Full pixel/sample decode would need
# codec libraries; dimensions/channels/rate/duration live in the headers,
# which is what metadata extraction at scale reads (no full decode).
# --------------------------------------------------------------------------
import struct as _struct

MEDIA_HEADER_SCHEMA = (
    "media_id bigint, format string, width int, height int, channels int, "
    "bit_depth int, sample_rate int, duration_ms int, n_bytes int, sha string"
)


def parse_media_header(b: bytes) -> dict:
    """Sniff + parse the container header of a media payload. Returns a dict
    with ``format`` plus whichever of width/height/channels/bit_depth/
    sample_rate/duration_ms the format carries; unknown bytes -> format
    'unknown' with everything null."""
    out = {"format": "unknown", "width": None, "height": None, "channels": None,
           "bit_depth": None, "sample_rate": None, "duration_ms": None}
    if not b:
        return out
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
            w, h = _struct.unpack(">II", b[16:24])
            depth, color_type = b[24], b[25]
            nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
            out.update(format="png", width=w, height=h, channels=nch, bit_depth=depth)
        elif b[:2] == b"\xff\xd8":
            off = 2
            while off + 4 <= len(b):
                if b[off] != 0xFF:
                    break
                marker = b[off + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    off += 2
                    continue
                seglen = _struct.unpack(">H", b[off + 2 : off + 4])[0]
                # SOF0-SOF15 except DHT(C4)/JPG(C8)/DAC(CC) carry dimensions
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    depth = b[off + 4]
                    h, w = _struct.unpack(">HH", b[off + 5 : off + 9])
                    nch = b[off + 9]
                    out.update(format="jpeg", width=w, height=h, channels=nch,
                               bit_depth=depth)
                    break
                off += 2 + seglen
        elif b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = _struct.unpack("<HH", b[6:10])
            out.update(format="gif", width=w, height=h, bit_depth=(b[10] & 0x07) + 1)
        elif b[:2] == b"BM" and len(b) >= 26:
            w, h = _struct.unpack("<ii", b[18:26])
            out.update(format="bmp", width=w, height=abs(h))
            if len(b) >= 30:
                out["bit_depth"] = _struct.unpack("<H", b[28:30])[0]
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            off = 12
            nch = rate = bits = None
            data_len = None
            while off + 8 <= len(b):
                cid = b[off : off + 4]
                clen = _struct.unpack("<I", b[off + 4 : off + 8])[0]
                if cid == b"fmt ":
                    nch, rate = _struct.unpack("<HI", b[off + 10 : off + 16])
                    bits = _struct.unpack("<H", b[off + 22 : off + 24])[0]
                elif cid == b"data":
                    data_len = clen
                off += 8 + clen + (clen & 1)  # chunks are word-aligned
            out.update(format="wav", channels=nch, sample_rate=rate, bit_depth=bits)
            if None not in (nch, rate, bits, data_len) and nch and rate and bits:
                frames = data_len // (nch * (bits // 8))
                out["duration_ms"] = int(frames * 1000 // rate)
    except (IndexError, _struct.error):
        return {"format": "unknown", "width": None, "height": None, "channels": None,
                "bit_depth": None, "sample_rate": None, "duration_ms": None}
    return out


# minimal encoders for the same formats — test/synthesis support (valid
# headers, deterministic filler payload)
def make_png(w: int, h: int, bit_depth: int = 8, color_type: int = 2) -> bytes:
    ihdr = _struct.pack(">II", w, h) + bytes([bit_depth, color_type, 0, 0, 0])
    return (b"\x89PNG\r\n\x1a\n" + _struct.pack(">I", 13) + b"IHDR" + ihdr
            + b"\x00\x00\x00\x00" + _struct.pack(">I", 0) + b"IEND\x00\x00\x00\x00")


def make_jpeg(w: int, h: int, channels: int = 3) -> bytes:
    sof = b"\xff\xc0" + _struct.pack(">H", 8 + 3 * channels) + b"\x08"
    sof += _struct.pack(">HH", h, w) + bytes([channels])
    sof += b"".join(bytes([i + 1, 0x11, 0]) for i in range(channels))
    return b"\xff\xd8" + sof + b"\xff\xd9"


def make_gif(w: int, h: int) -> bytes:
    return b"GIF89a" + _struct.pack("<HH", w, h) + b"\x77\x00\x00" + b"\x3b"


def make_bmp(w: int, h: int, bits: int = 24) -> bytes:
    dib = _struct.pack("<IiiHH", 40, w, h, 1, bits) + b"\x00" * 24
    return b"BM" + _struct.pack("<IHHI", 54, 0, 0, 54) + dib


def make_wav(channels: int, sample_rate: int, bits: int, n_frames: int) -> bytes:
    data_len = n_frames * channels * (bits // 8)
    fmt = _struct.pack("<HHIIHH", 1, channels, sample_rate,
                       sample_rate * channels * (bits // 8),
                       channels * (bits // 8), bits)
    return (b"RIFF" + _struct.pack("<I", 36 + data_len) + b"WAVE"
            + b"fmt " + _struct.pack("<I", 16) + fmt
            + b"data" + _struct.pack("<I", data_len) + b"\x00" * data_len)


def real_decode(content: bytes, kind: str) -> dict:
    """Header-level decode of a media payload (see parse_media_header).
    ``kind`` is advisory — the sniffer trusts magic bytes."""
    return parse_media_header(content or b"")


def extract_media_headers(media: DataFrame) -> DataFrame:
    """mapInPandas real-header extraction: Arrow batches in, typed metadata
    out; the binary column dies here so downstream scans prune it."""
    import hashlib

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "format", "width", "height", "channels",
                "bit_depth", "sample_rate", "duration_ms", "n_bytes", "sha"]
        for pdf in batches:
            metas = []
            for _, row in pdf.iterrows():
                content = row["content"] or b""
                m = parse_media_header(bytes(content))
                m["media_id"] = row["media_id"]
                m["n_bytes"] = len(content)
                m["sha"] = hashlib.sha256(bytes(content)).hexdigest()
                metas.append(m)
            yield pd.DataFrame(metas)[cols]

    return media.mapInPandas(extract, schema=MEDIA_HEADER_SCHEMA)


def extract_media_metadata(media: DataFrame, use_stub: bool = True) -> DataFrame:
    """mapInPandas metadata extraction: Arrow batches in, typed rows out.
    The binary column is consumed here and NOT carried downstream, so later
    stages prune it from the scan.

    ``use_stub=False`` returns the real container-header decode
    (``extract_media_headers``, MEDIA_HEADER_SCHEMA) instead of the
    deterministic fake (MEDIA_META_SCHEMA)."""
    import hashlib

    if not use_stub:
        return extract_media_headers(media)
    decode = decode_stub

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


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    library=None,
) -> DataFrame:
    """Image-resize plumbing: (media_id, content, width, height) out.

    The Spark-side contract is the real one — Arrow-batched
    binary-in/binary-out mapInPandas, output dimensions in typed columns,
    the source binary consumed inside the stage so downstream scans prune
    it. The PIXEL work delegates to ``library`` (a callable
    ``bytes -> bytes`` producing the resized payload); imaging libs are
    not in this container, so the default stand-in emits a REAL tiny PNG
    of the target dimensions (make_png) whose palette byte derives from
    the source sha — deterministic, parseable by parse_media_header, and
    the right schema/size shape for plumbing tests. Swap ``library`` for
    a PIL/turbojpeg closure in deployment; the plan does not change."""
    target_w, target_h = int(width), int(height)

    def default_lib(content: bytes) -> bytes:
        import hashlib

        return make_png(target_w, target_h,
                        color_type=2 if (hashlib.sha256(content).digest()[0] % 2) else 0)

    lib = library or default_lib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                resized = lib(bytes(row["content"] or b""))
                out.append({
                    "media_id": row["media_id"],
                    "content": resized,
                    "width": target_w,
                    "height": target_h,
                })
            yield pd.DataFrame(out)[["media_id", "content", "width", "height"]]

    return media.mapInPandas(
        run, schema="media_id bigint, content binary, width int, height int"
    )


def image_patch_grid(
    meta: DataFrame,
    patch: int = 16,
    id_col: str = "media_id",
    w_col: str = "width",
    h_col: str = "height",
) -> DataFrame:
    """ViT-style patch inventory: one row per (patch_row, patch_col) tile
    of each image's dimension grid — the work-list a patch-embedding
    stage fans out over. Pure Catalyst explode; images whose dims don't
    divide evenly keep their floor grid (the standard center-crop
    contract). Emits (id, patch_row, patch_col, x0, y0)."""
    rows = (F.col(h_col) / patch).cast("int")
    cols = (F.col(w_col) / patch).cast("int")
    g = meta.select(
        F.col(id_col), rows.alias("__r"), cols.alias("__c")
    ).filter((F.col("__r") > 0) & (F.col("__c") > 0))
    return (
        g.select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.col("__r") - 1)).alias("patch_row"),
            "__c",
        )
        .select(
            id_col,
            "patch_row",
            F.explode(F.sequence(F.lit(0), F.col("__c") - 1)).alias("patch_col"),
        )
        .withColumn("x0", F.col("patch_col") * patch)
        .withColumn("y0", F.col("patch_row") * patch)
    )
