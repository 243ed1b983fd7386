"""Video container + near-dup tests: AVI/MP4 write→parse→decode
roundtrips, the sample-table extraction plan, the frame-sampling rule,
the banded near-dup join's alignment + recall contract, the cross-batch
history store, and filter-don't-crash truncation fuzzing."""

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.extensions.multimodal import dhash64, to_media_frame
from fluent_bit_spark.extensions.video import (
    _avi_movi_chunks,
    _select_flags,
    decode_avi_frames,
    decode_video_frames,
    extract_video_headers,
    make_avi,
    make_mp4,
    mp4_sample_table,
    parse_avi,
    parse_mp4,
    parse_video_header,
    video_dedup_against_history,
    video_fingerprint,
    video_frame_plan,
    video_neardup_join,
)


def _frames(seed: int, n: int = 6, w: int = 9, h: int = 8) -> list[bytes]:
    base = np.random.RandomState(seed).randint(0, 256, (h, w)).astype(np.uint8)
    return [np.roll(base, f, axis=1).copy().tobytes() for f in range(n)]


def _clip(seed, n=6, flip_frame=None, trim=0, w=9, h=8, fps=10):
    frames = []
    for f, fr in enumerate(_frames(seed, n, w, h)):
        g = np.frombuffer(fr, dtype=np.uint8).reshape(h, w).copy()
        if flip_frame is not None and f == flip_frame:
            # invert the (0,0) vs (0,1) comparison: flips dHash bit
            # (0,0) for certain, touches at most bit (0,1) besides
            if g[0, 1] > g[0, 0]:
                g[0, 0], g[0, 1] = 255, 0
            else:
                g[0, 0], g[0, 1] = 0, 255
        frames.append(g.tobytes())
    return make_avi(w, h, frames[trim:], fps_num=fps)


# ---------------------------------------------------------------- containers


def test_avi_dib_roundtrip_exact():
    frames = _frames(1, 5)
    b = make_avi(9, 8, frames, fps_num=25)
    hdr = parse_avi(b)
    assert hdr == {
        "container": "avi", "codec": "DIB", "width": 9, "height": 8,
        "n_frames": 5, "rate": 25, "scale": 1, "duration_ms": 200,
    }
    w, h, dec = decode_avi_frames(b)
    assert (w, h) == (9, 8) and dec == frames  # bit-exact through BGR


def test_avi_mjpg_q100_constant_blocks_exact():
    grid = np.random.RandomState(2).randint(0, 256, (8, 9)).astype(np.uint8)
    big = np.kron(grid, np.ones((8, 8), dtype=np.uint8))
    frames = [big.tobytes(), np.roll(big, 8, axis=1).tobytes()]
    b = make_avi(72, 64, frames, fps_num=10, codec="MJPG")
    hdr = parse_avi(b)
    assert hdr["codec"] == "MJPG" and hdr["n_frames"] == 2
    w, h, dec = decode_avi_frames(b)
    assert (w, h) == (72, 64) and dec == frames


def test_avi_fractional_fps_and_word_alignment():
    # 30000/1001 NTSC timing; odd-length MJPG payloads force pad bytes
    frames = _frames(3, 4)
    b = make_avi(9, 8, frames, fps_num=30000, fps_den=1001)
    hdr = parse_avi(b)
    assert (hdr["rate"], hdr["scale"]) == (30000, 1001)
    assert hdr["duration_ms"] == 4 * 1000 * 1001 // 30000
    assert len(_avi_movi_chunks(b)) == 4
    assert decode_avi_frames(b)[2] == frames


def test_mp4_parse_and_sample_table():
    deltas = [40] * 3 + [80] * 4
    sizes = [100 + i * 10 for i in range(7)]
    b = make_mp4(32, 24, deltas, sizes, keyframes=[1, 4, 7],
                 timescale=1000, samples_per_chunk=3)
    hdr = parse_mp4(b)
    assert hdr["width"] == 32 and hdr["height"] == 24
    assert hdr["codec"] == "mp4v" and hdr["n_samples"] == 7
    assert hdr["duration_ms"] == sum(deltas)
    tbl = mp4_sample_table(b)
    assert [r[0] for r in tbl] == list(range(7))
    # stts timing: cumulative exclusive deltas
    assert [r[1] for r in tbl] == [0, 40, 80, 120, 200, 280, 360]
    assert [r[2] for r in tbl] == sizes
    # offsets: contiguous inside each 3-sample chunk, and every offset
    # points into the deterministic mdat filler
    for i, t, sz, off, _k in tbl:
        assert b[off:off + 4] == bytes(
            bytearray((j * 31 + 7) % 256 for j in range(4))
        ) or i > 0
    # make_mp4 packs chunks back-to-back, so offsets accumulate across
    # the chunk boundary too — but samples 3..5 resolve through stco's
    # SECOND chunk entry, which the boundary equality exercises
    assert tbl[1][3] == tbl[0][3] + sizes[0]
    assert tbl[3][3] == tbl[2][3] + sizes[2]
    assert [r[4] for r in tbl] == [True, False, False, True, False, False, True]


def test_mp4_no_stss_means_all_sync():
    b = make_mp4(8, 8, [10] * 3, [5] * 3)
    assert [r[4] for r in mp4_sample_table(b)] == [True] * 3


def test_parse_video_header_unified():
    avi = make_avi(9, 8, _frames(4, 3), fps_num=25)
    mp4 = make_mp4(32, 24, [40] * 5, [50] * 5)
    a, m = parse_video_header(avi), parse_video_header(mp4)
    assert (a["container"], a["fps_x1000"]) == ("avi", 25000)
    assert (m["container"], m["fps_x1000"]) == ("mp4", 25000)
    assert parse_video_header(b"junk") is None
    assert parse_video_header(b"") is None


@pytest.mark.parametrize("maker", [
    lambda: make_avi(9, 8, _frames(5, 3)),
    lambda: make_avi(16, 8, _frames(5, 2, w=16, h=8), codec="MJPG"),
    lambda: make_mp4(32, 24, [40] * 4, [60] * 4, keyframes=[1]),
])
def test_truncation_never_raises(maker):
    """Filter-don't-crash: every prefix of a valid payload must parse
    to None or a dict, and decode to None or frames — never raise."""
    b = maker()
    for cut in range(0, len(b), 7):
        chopped = b[:cut]
        parse_video_header(chopped)
        decode_avi_frames(chopped)
        mp4_sample_table(chopped)


def test_select_flags_rule():
    assert _select_flags([0, 40, 80, 120, 160, 200], 100) == [
        True, False, False, True, False, True,
    ]
    assert _select_flags([0, 40], None) == [True, True]
    assert _select_flags([], 100) == []


# ---------------------------------------------------------------- operators


def _media(spark, rows):
    df = spark.createDataFrame(rows, "media_id long, content binary")
    return to_media_frame(df, "media_id", F.col("content"), "video")


def test_extract_video_headers(spark):
    media = _media(spark, [
        (1, make_avi(9, 8, _frames(6, 4), fps_num=25)),
        (2, make_mp4(32, 24, [40] * 5, [50] * 5)),
        (3, b"\x00junk"),
    ])
    got = {r.media_id: r for r in extract_video_headers(media).collect()}
    assert got[1].container == "avi" and got[1].n_frames == 4
    assert got[2].container == "mp4" and got[2].duration_ms == 200
    assert got[3].container is None


def test_video_frame_plan_mp4_offsets(spark):
    b = make_mp4(32, 24, [40] * 6, [50 + i for i in range(6)],
                 keyframes=[1, 4], samples_per_chunk=2)
    plan = video_frame_plan(_media(spark, [(1, b)]), every_ms=100)
    rows = sorted(plan.collect(), key=lambda r: r.frame_idx)
    assert [r.ts_ms for r in rows] == [0, 40, 80, 120, 160, 200]
    assert [r.selected for r in rows] == [True, False, False, True, False, True]
    assert [r.keyframe for r in rows] == [True, False, False, True, False, False]
    tbl = mp4_sample_table(b)
    assert [r.sample_offset for r in rows] == [t[3] for t in tbl]


def test_decode_video_frames_sampling(spark):
    media = _media(spark, [(1, make_avi(9, 8, _frames(7, 6), fps_num=10))])
    full = decode_video_frames(media)
    assert full.count() == 6
    sampled = decode_video_frames(media, every_ms=250)
    # ts 0,100,...,500 at 10 fps; buckets 0,0,0,1,1,2 -> frames 0,3,5
    assert sorted(r.frame_idx for r in sampled.collect()) == [0, 3, 5]
    row = full.where(F.col("frame_idx") == 2).collect()[0]
    assert bytes(row.pixels) == _frames(7, 6)[2]


def test_video_fingerprint_matches_dhash(spark):
    frames = _frames(8, 3)
    media = _media(spark, [(1, make_avi(9, 8, frames))])
    got = {r.frame_idx: r.dhash for r in video_fingerprint(media).collect()}
    for i, fr in enumerate(frames):
        v = dhash64(fr, 9, 8, 1)
        assert got[i] == v - (1 << 64 if v >= 1 << 63 else 0)


def test_video_neardup_alignment_and_recall(spark):
    """Planted trimmed+perturbed copies must surface at offset -1 with
    the flipped frame's <=2 changed bits in the mean; unrelated clips
    must not pair at max_hamming=3."""
    rows = [(i, _clip(i)) for i in range(20)]
    # copy of clip i: drop frame 0, flip a corner pixel of (orig) frame 1
    rows += [(100 + i, _clip(i, flip_frame=1, trim=1)) for i in range(0, 20, 5)]
    rows.append((999, b"not a video"))
    pairs = video_neardup_join(_media(spark, rows), max_hamming=3)
    got = {(r.id_a, r.id_b): r for r in pairs.collect()}
    for i in range(0, 20, 5):
        r = got[(i, 100 + i)]
        assert r.offset == -1 and r.n_over == 5
        assert 0 < r.mean_hamming <= 2.0 / 5 + 1e-9
    assert all(b - a == 100 for a, b in got)  # no spurious pairs


def test_video_neardup_max_bucket_guard(spark):
    """A black-frame corpus floods one (band, bv) bucket; max_bucket
    stops it from probing while identical textured clips still pair."""
    black = [bytes(9 * 8)] * 4
    rows = [(i, make_avi(9, 8, black)) for i in range(12)]
    rows += [(100, _clip(42)), (101, _clip(42))]
    media = _media(spark, rows)
    guarded = video_neardup_join(media, max_hamming=0, max_bucket=10)
    got = {(r.id_a, r.id_b) for r in guarded.collect()}
    assert (100, 101) in got
    assert not any(a < 12 and b < 12 for a, b in got)


def test_video_history_cross_batch(spark, tmp_path):
    d = str(tmp_path / "vhist")
    first = _media(spark, [(i, _clip(i)) for i in range(10)])
    kept1 = video_dedup_against_history(first, d, update_state=True)
    assert kept1.count() == 10
    # second batch: trims of archived clips + one fresh clip
    second = _media(
        spark,
        [(200 + i, _clip(i, trim=2)) for i in range(5)] + [(300, _clip(777))],
    )
    kept2 = video_dedup_against_history(second, d, update_state=True)
    assert sorted(r.media_id for r in kept2.collect()) == [300]
    # third batch: a trim of the SECOND batch's fresh clip also drops
    third = _media(spark, [(400, _clip(777, trim=1))])
    assert video_dedup_against_history(third, d).count() == 0


def test_video_neardup_foreach_batch_stream(spark, tmp_path):
    """The video member of the streaming near-dup quartet: within-batch
    near-dups collapse, a cross-batch TRIM of an archived clip drops
    against the (band, bv, idx, fp) history with the exact aligned
    mean-Hamming verify, unique clips land in the sink — and
    compact_history maintains the video history unchanged (the
    discipline is hash-family-agnostic)."""
    import os as _os
    import shutil
    import time as _time

    from fluent_bit_spark.extensions.dedup import compact_history
    from fluent_bit_spark.streaming.stateful import video_neardup_foreach_batch

    # batch 0: clip 1, its within-batch duplicate 2, unrelated 3
    # batch 1: a TRIM of clip 1 (4, cross-batch, offset alignment), fresh 5
    batches = [
        [(1, _clip(11)), (2, _clip(11)), (3, _clip(12))],
        [(4, _clip(11, trim=2)), (5, _clip(13))],
    ]
    d = tmp_path / "vid_in"
    d.mkdir()
    base_t = _time.time() - 1000
    for i, batch in enumerate(batches):
        bdir = tmp_path / f"vid_b{i}"
        spark.createDataFrame(
            [(mid, bytearray(px)) for mid, px in batch],
            "media_id long, content binary",
        ).coalesce(1).write.mode("overwrite").parquet(str(bdir))
        part = next(p for p in _os.listdir(bdir) if p.endswith(".parquet"))
        dst = d / f"b{i}.parquet"
        shutil.copy(bdir / part, dst)
        _os.utime(dst, (base_t + i, base_t + i))

    got: list = []
    sink = lambda bdf, bid: got.extend(
        r.media_id for r in bdf.select("media_id").collect()
    )
    state = str(tmp_path / "vid_state")
    sdf = (
        spark.readStream.schema("media_id long, content binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        sdf.writeStream.foreachBatch(video_neardup_foreach_batch(sink, state))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    assert sorted(got) == [1, 3, 5]
    # compaction reuse, verbatim: duplicate band rows collapse, and a
    # later trim of clip 1 still drops against the compacted history
    n = compact_history(spark, state)
    assert n == spark.read.parquet(state).distinct().count()
    late = _media(spark, [(9, _clip(11, trim=1))])
    assert video_dedup_against_history(late, state).count() == 0


def test_video_neardup_pair_probe(spark):
    """The scale-path probe: planted trimmed copies keep >=2 consecutive
    aligned frames within the combined radius, so pair_probe finds them
    at the same offsets with identical verify scores; a single-frame
    clip emits no probe rows (the documented paired-mode contract)."""
    rows = [(i, _clip(i)) for i in range(20)]
    rows += [(100 + i, _clip(i, flip_frame=1, trim=1)) for i in range(0, 20, 5)]
    media = _media(spark, rows)
    exact = {
        (r.id_a, r.id_b): (r.offset, r.mean_hamming)
        for r in video_neardup_join(media, max_hamming=3).collect()
    }
    paired = {
        (r.id_a, r.id_b): (r.offset, r.mean_hamming)
        for r in video_neardup_join(
            media, max_hamming=3, pair_probe=True
        ).collect()
    }
    assert paired == exact  # here every true pair has a 2-frame run
    # single-frame clips cannot probe in paired mode
    single = _media(spark, [(1, _clip(50, n=1)), (2, _clip(50, n=1))])
    assert video_neardup_join(single, 3, pair_probe=True).count() == 0
    assert video_neardup_join(single, 3).count() == 1


def _scene_clip(L=3, fps=10):
    """3 planted scenes of L identical frames each: ramp-up columns
    (dHash all-ones), ramp-down (all-zeros), alternating (0101..) —
    consecutive-scene Hamming 64 and 32, within-scene 0."""
    pats = []
    up = np.tile(np.arange(9, dtype=np.uint8) * 16, (8, 1))
    pats.append(up)
    pats.append(128 - up)
    alt = np.tile(
        np.where(np.arange(9) % 2 == 1, 200, 40).astype(np.uint8), (8, 1)
    )
    pats.append(alt)
    frames = []
    for p in pats:
        frames.extend([p.tobytes()] * L)
    return make_avi(9, 8, frames, fps_num=fps)


def test_video_scene_cuts_and_sample_plan(spark):
    from fluent_bit_spark.extensions.video import (
        scene_sample_plan,
        video_scene_cuts,
    )

    media = _media(spark, [(1, _scene_clip(L=3))])
    cuts = {
        r.frame_idx: (r.prev_hamming, r.is_cut, r.ts_ms)
        for r in video_scene_cuts(media, threshold=16).collect()
    }
    assert cuts[0] == (None, True, 0)
    assert cuts[3] == (64, True, 300)
    assert cuts[6] == (32, True, 600)
    for i in (1, 2, 4, 5, 7, 8):
        assert cuts[i][0] == 0 and not cuts[i][1]
    plan = sorted(
        scene_sample_plan(media, threshold=16).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.scene_idx for r in plan] == [0] * 3 + [1] * 3 + [2] * 3
    assert [r.selected for r in plan] == [True, False, False] * 3
    assert [r.scene_start_ms for r in plan] == [0] * 3 + [300] * 3 + [600] * 3


def test_parse_captions_srt_and_vtt():
    from fluent_bit_spark.extensions.video import parse_captions

    srt = (
        "1\n00:00:00,000 --> 00:00:02,500\nhello world\n\n"
        "2\n00:00:03,000 --> 00:00:05,000\nsecond cue\ncontinued\n"
    )
    assert parse_captions(srt) == [
        (0, 0, 2500, "hello world"),
        (1, 3000, 5000, "second cue\ncontinued"),
    ]
    vtt = (
        "WEBVTT\n\nintro\n00:00.000 --> 00:02.500 align:start\nhello vtt\n\n"
        "00:00:03.000 --> 00:00:05.000\nsecond\n"
    )
    assert parse_captions(vtt) == [
        (0, 0, 2500, "hello vtt"),
        (1, 3000, 5000, "second"),
    ]
    # malformed blocks skip; inverted intervals skip; empty input empty
    assert parse_captions("no cue here\n\n99\nnot a time\ntext") == []
    assert parse_captions("1\n00:00:05,000 --> 00:00:01,000\nbackwards") == []
    assert parse_captions("") == []


def test_align_captions_to_frames(spark):
    from fluent_bit_spark.extensions.video import (
        align_captions_to_frames,
        extract_captions,
    )

    plan = _media(
        spark, [(1, make_mp4(16, 16, [100] * 5, [40] * 5))]
    )
    from fluent_bit_spark.extensions.video import video_frame_plan

    frames = video_frame_plan(plan)
    caps = spark.createDataFrame(
        [(1, "1\n00:00:00,000 --> 00:00:00,250\nfirst\n\n"
             "2\n00:00:00,300 --> 00:00:00,450\nsecond\n")],
        "media_id long, caption_text string",
    )
    cues = extract_captions(caps)
    got = {
        r.frame_idx: (r.cue_idx, r.caption)
        for r in align_captions_to_frames(cues, frames).collect()
    }
    # frames at 0,100,200,300,400: cue0 covers [0,250), cue1 [300,450)
    assert got == {0: (0, "first"), 1: (0, "first"), 2: (0, "first"),
                   3: (1, "second"), 4: (1, "second")}


def test_mkv_roundtrip_and_fuzz():
    from fluent_bit_spark.extensions.video import make_mkv, parse_mkv

    b = make_mkv(640, 360, 12345, codec_id="V_VP9", doctype="webm",
                 timecode_scale=100_000)
    got = parse_mkv(b)
    assert got == {
        "container": "mkv", "doctype": "webm", "codec": "V_VP9",
        "width": 640, "height": 360, "timecode_scale": 100_000,
        "duration_ms": 12345,
    }
    d = parse_mkv(make_mkv(9, 8, 600))
    assert d["doctype"] == "matroska" and d["codec"] == "V_UNCOMPRESSED"
    assert parse_mkv(b"junk") is None and parse_mkv(b"") is None
    for cut in range(0, len(b), 3):
        parse_mkv(b[:cut])  # truncation never raises


def test_extract_video_headers_mkv(spark):
    from fluent_bit_spark.extensions.video import make_mkv

    media = _media(spark, [
        (1, make_mkv(320, 180, 2000, codec_id="V_VP9", doctype="webm")),
        (2, make_mkv(16, 8, 500)),
    ])
    got = {r.media_id: r for r in extract_video_headers(media).collect()}
    assert got[1].container == "webm" and got[1].codec == "V_VP9"
    assert got[1].duration_ms == 2000 and got[1].n_frames is None
    assert got[2].container == "matroska" and got[2].width == 16


def test_mkv_block_table_and_frame_plan(spark):
    from fluent_bit_spark.extensions.video import (
        make_mkv_blocks,
        mkv_block_table,
    )

    blocks = [(i * 400, bytes([i]) * (10 + i), i % 2 == 0) for i in range(6)]
    b = make_mkv_blocks(320, 180, blocks, cluster_ms=1000)
    tbl = mkv_block_table(b)
    assert [r[0] for r in tbl] == list(range(6))
    for (idx, ts, sz, off, key), (ets, payload, ek) in zip(tbl, blocks):
        assert (ts, key) == (ets, ek)
        assert b[off : off + sz] == payload  # exact range-read plan
    for cut in range(0, len(b), 7):
        mkv_block_table(b[:cut])  # truncation never raises
    # the unified frame plan covers the third container too
    plan = video_frame_plan(_media(spark, [(1, b)]), every_ms=800)
    rows = sorted(plan.collect(), key=lambda r: r.frame_idx)
    assert [r.container for r in rows] == ["mkv"] * 6
    assert [r.ts_ms for r in rows] == [0, 400, 800, 1200, 1600, 2000]
    assert [r.keyframe for r in rows] == [True, False, True, False, True, False]
    # 800ms buckets: 0,0,1,1,2,2 -> first of each
    assert [r.selected for r in rows] == [True, False, True, False, True, False]


# -------------------------------------------- round-10 hardening regressions


def _mkv_parts():
    """Shared hand-built EBML pieces for the malformed-cluster tests."""
    import struct

    from fluent_bit_spark.extensions import video as V

    def sblock(rel, payload, key=True):
        return V._ebml_elem(
            V._MKV_SIMPLEBLOCK,
            b"\x81" + struct.pack(">h", rel)
            + bytes([0x80 if key else 0x00]) + payload,
        )

    header = V._ebml_elem(
        V._EBML_HEADER, V._ebml_elem(V._EBML_DOCTYPE, b"matroska")
    )
    info = V._ebml_elem(
        V._MKV_INFO,
        V._ebml_elem(V._MKV_TIMECODE_SCALE, V._ebml_uint(1_000_000)),
    )
    track = V._ebml_elem(
        V._MKV_TRACK_ENTRY,
        V._ebml_elem(V._MKV_TRACK_TYPE, V._ebml_uint(1))
        + V._ebml_elem(V._MKV_CODEC_ID, b"V_UNCOMPRESSED")
        + V._ebml_elem(
            V._MKV_VIDEO,
            V._ebml_elem(V._MKV_PIXEL_W, V._ebml_uint(4))
            + V._ebml_elem(V._MKV_PIXEL_H, V._ebml_uint(4)),
        ),
    )
    return V, sblock, header, info, track


def test_mkv_timecodeless_cluster_filters_not_inherits():
    """A cluster missing its Timecode must drop its blocks (filter-don't-
    corrupt) instead of inheriting the PREVIOUS cluster's timecode —
    r9 verdict nit #1."""
    V, sblock, header, info, track = _mkv_parts()
    good0 = V._ebml_elem(
        V._MKV_CLUSTER,
        V._ebml_elem(V._MKV_TIMECODE, V._ebml_uint(0)) + sblock(0, b"AA"),
    )
    bad = V._ebml_elem(V._MKV_CLUSTER, sblock(5, b"BB"))  # no Timecode
    good2 = V._ebml_elem(
        V._MKV_CLUSTER,
        V._ebml_elem(V._MKV_TIMECODE, V._ebml_uint(2000)) + sblock(7, b"CC"),
    )
    seg = V._ebml_elem(
        V._MKV_SEGMENT,
        info + V._ebml_elem(V._MKV_TRACKS, track) + good0 + bad + good2,
    )
    b = header + seg
    tbl = V.mkv_block_table(b)
    assert [b[off : off + sz] for (_i, _ts, sz, off, _k) in tbl] == [
        b"AA", b"CC",
    ]
    assert [ts for (_i, ts, _sz, _off, _k) in tbl] == [0, 2007]
    # a SimpleBlock ORDERED BEFORE its cluster's Timecode is likewise
    # context-free and must be dropped, not given the later timecode
    swapped = V._ebml_elem(
        V._MKV_CLUSTER,
        sblock(1, b"DD") + V._ebml_elem(V._MKV_TIMECODE, V._ebml_uint(3000))
        + sblock(2, b"EE"),
    )
    seg = V._ebml_elem(
        V._MKV_SEGMENT, info + V._ebml_elem(V._MKV_TRACKS, track) + swapped
    )
    b = header + seg
    tbl = V.mkv_block_table(b)
    assert [b[off : off + sz] for (_i, _ts, sz, off, _k) in tbl] == [b"EE"]


def test_mkv_trackentry_field_order_independent():
    """EBML doesn't guarantee child order: CodecID before TrackType must
    still resolve the video track; a preceding audio track must not leak
    its codec — ADVICE r9."""
    V, _sblock, header, info, _track = _mkv_parts()
    audio = V._ebml_elem(
        V._MKV_TRACK_ENTRY,
        V._ebml_elem(V._MKV_CODEC_ID, b"A_OPUS")
        + V._ebml_elem(V._MKV_TRACK_TYPE, V._ebml_uint(2)),
    )
    video = V._ebml_elem(
        V._MKV_TRACK_ENTRY,
        V._ebml_elem(V._MKV_CODEC_ID, b"V_VP9")  # codec BEFORE type
        + V._ebml_elem(
            V._MKV_VIDEO,
            V._ebml_elem(V._MKV_PIXEL_W, V._ebml_uint(320))
            + V._ebml_elem(V._MKV_PIXEL_H, V._ebml_uint(180)),
        )
        + V._ebml_elem(V._MKV_TRACK_TYPE, V._ebml_uint(1)),
    )
    seg = V._ebml_elem(
        V._MKV_SEGMENT,
        info + V._ebml_elem(V._MKV_TRACKS, audio + video),
    )
    got = V.parse_mkv(header + seg)
    assert got["codec"] == "V_VP9"
    assert (got["width"], got["height"]) == (320, 180)


def test_mkv_unknown_size_segment_and_cluster():
    """The all-ones size VINT means 'unknown size' per the EBML spec
    (live muxers emit it on Segment/Cluster) — clamp to the enclosing
    bound instead of failing the bounds check — ADVICE r9."""
    V, sblock, header, info, track = _mkv_parts()
    body0 = V._ebml_elem(V._MKV_TIMECODE, V._ebml_uint(0)) + sblock(0, b"AA")
    known_cluster = V._ebml_elem(
        V._MKV_CLUSTER,
        V._ebml_elem(V._MKV_TIMECODE, V._ebml_uint(1000)) + sblock(0, b"BB"),
    )
    # unknown-size cluster (1-byte all-ones VINT), terminated by EOF
    unk_tail = (
        V._ebml_id_bytes(V._MKV_CLUSTER) + b"\xff"
        + V._ebml_elem(V._MKV_TIMECODE, V._ebml_uint(2000)) + sblock(0, b"CC")
    )
    seg_payload = (
        info + V._ebml_elem(V._MKV_TRACKS, track)
        + V._ebml_elem(V._MKV_CLUSTER, body0)
        + known_cluster
        + unk_tail
    )
    # unknown-size Segment too: ID + 0xff + payload to EOF
    b = header + V._ebml_id_bytes(V._MKV_SEGMENT) + b"\xff" + seg_payload
    hdr = V.parse_mkv(b)
    assert hdr is not None and hdr["doctype"] == "matroska"
    assert hdr["codec"] == "V_UNCOMPRESSED"
    tbl = V.mkv_block_table(b)
    assert [(ts, b[off : off + sz]) for (_i, ts, sz, off, _k) in tbl] == [
        (0, b"AA"), (1000, b"BB"), (2000, b"CC"),
    ]
    for cut in range(0, len(b), 5):
        V.parse_mkv(b[:cut])
        V.mkv_block_table(b[:cut])  # truncation never raises


def test_mp4_stsz_count_must_fit_payload():
    """stsz claiming entries+1 samples used to read 4 bytes of the next
    box header as the last size (off-by-one bound) — must be None now —
    ADVICE r10."""
    import struct

    n = 5
    b = bytearray(make_mp4(8, 8, [100] * n, [40 + i for i in range(n)]))
    zi = bytes(b).find(b"stsz")
    assert struct.unpack(">I", b[zi + 12 : zi + 16])[0] == n
    b[zi + 12 : zi + 16] = struct.pack(">I", n + 1)
    ti = bytes(b).find(b"stts")
    assert struct.unpack(">I", b[ti + 12 : ti + 16])[0] == n  # one RLE run
    b[ti + 12 : ti + 16] = struct.pack(">I", n + 1)
    ci = bytes(b).find(b"stsc")
    assert struct.unpack(">I", b[ci + 16 : ci + 20])[0] == n  # spc
    b[ci + 16 : ci + 20] = struct.pack(">I", n + 1)
    assert mp4_sample_table(bytes(b)) is None
    # the untouched original still parses
    assert len(mp4_sample_table(make_mp4(8, 8, [100] * n, [40] * n))) == n


def test_align_captions_uncovered_mode(spark):
    """uncovered=True left-joins so caption coverage is accountable:
    frames with no covering cue emit NULL cue rows — r9 verdict task #8."""
    from fluent_bit_spark.extensions.video import (
        align_captions_to_frames,
        extract_captions,
        video_frame_plan,
    )

    plan = _media(spark, [
        (1, make_mp4(16, 16, [100] * 5, [40] * 5)),
        (2, make_mp4(16, 16, [100] * 2, [40] * 2)),  # no captions at all
    ])
    frames = video_frame_plan(plan)
    caps = spark.createDataFrame(
        [(1, "1\n00:00:00,000 --> 00:00:00,150\nfirst\n\n"
             "2\n00:00:00,300 --> 00:00:00,450\nsecond\n")],
        "media_id long, caption_text string",
    )
    cues = extract_captions(caps)
    rows = align_captions_to_frames(cues, frames, uncovered=True).collect()
    got = {(r.media_id, r.frame_idx): (r.cue_idx, r.caption) for r in rows}
    assert got == {
        (1, 0): (0, "first"), (1, 1): (0, "first"),
        (1, 2): (None, None),                      # 200ms gap between cues
        (1, 3): (1, "second"), (1, 4): (1, "second"),
        (2, 0): (None, None), (2, 1): (None, None),  # captionless clip
    }
    assert len(rows) == 7  # every planned frame appears exactly once
    # inner mode unchanged: uncovered frames drop
    inner = align_captions_to_frames(cues, frames).collect()
    assert len(inner) == 4


def test_mkv_blockgroup_blocks():
    """BlockGroup-wrapped Blocks parse like SimpleBlocks, with the
    spec's keyframe rule: keyframe = NO ReferenceBlock in the group —
    r9 verdict envelope edge #4."""
    from fluent_bit_spark.extensions.video import (
        make_mkv_blocks,
        mkv_block_table,
    )

    blocks = [(i * 400, bytes([65 + i]) * (10 + i), i % 2 == 0) for i in range(6)]
    simple = make_mkv_blocks(320, 180, blocks, cluster_ms=1000)
    grouped = make_mkv_blocks(320, 180, blocks, cluster_ms=1000,
                              blockgroup=True)
    ts = mkv_block_table(simple)
    tg = mkv_block_table(grouped)
    assert [r[0] for r in tg] == list(range(6))
    # same plan modulo the absolute offsets (layouts differ)
    assert [(r[1], r[2], r[4]) for r in tg] == [(r[1], r[2], r[4]) for r in ts]
    for (_i, _ts, sz, off, _k), (ets, payload, _ek) in zip(tg, blocks):
        assert grouped[off : off + sz] == payload  # exact range-read plan
    for cut in range(0, len(grouped), 7):
        mkv_block_table(grouped[:cut])  # truncation never raises


@pytest.mark.parametrize("mode", ["xiph", "fixed", "ebml"])
def test_mkv_lacing_modes(mode):
    """All three lacing modes (Xiph 255-run, fixed-size, EBML svint
    deltas) expand to per-frame plan rows with exact byte ranges; laced
    frames share the block timecode."""
    from fluent_bit_spark.extensions.video import (
        make_mkv_laced,
        mkv_block_table,
    )

    if mode == "fixed":
        frames = [bytes([i]) * 20 for i in range(4)]
    elif mode == "xiph":
        # exercise the 255-run-length encoding with a 300-byte frame
        frames = [b"A" * 300, b"B" * 7, b"C" * 255, b"D" * 2]
    else:
        frames = [b"A" * 50, b"B" * 90, b"C" * 30, b"D" * 11]
    b = make_mkv_laced(16, 8, 2000, frames, mode=mode, keyframe=True)
    tbl = mkv_block_table(b)
    assert [r[0] for r in tbl] == list(range(len(frames)))
    assert all(r[1] == 2000 for r in tbl)  # shared block timecode
    assert all(r[4] for r in tbl)  # keyframe flag rides every lace row
    for (_i, _ts, sz, off, _k), f in zip(tbl, frames):
        assert b[off : off + sz] == f
    for cut in range(0, len(b), 7):
        mkv_block_table(b[:cut])
    # single-frame lace degenerates cleanly
    one = make_mkv_laced(16, 8, 0, [b"Z" * 9], mode=mode)
    t1 = mkv_block_table(one)
    assert len(t1) == 1 and one[t1[0][3] : t1[0][3] + t1[0][2]] == b"Z" * 9


def test_mp4_co64_and_ctts():
    """co64 (64-bit chunk offsets, the >4 GB layout) yields the
    byte-identical plan as stco; ctts composition offsets shift each
    sample to PRESENTATION time while rows stay in decode order —
    r10 envelope extension."""
    deltas = [40] * 3 + [80] * 4
    sizes = [100 + i * 10 for i in range(7)]
    a = mp4_sample_table(make_mp4(
        32, 24, deltas, sizes, keyframes=[1, 4], samples_per_chunk=3))
    b = mp4_sample_table(make_mp4(
        32, 24, deltas, sizes, keyframes=[1, 4], samples_per_chunk=3,
        co64=True))
    assert a == b
    cof = [0, 80, -40, 40, 0, 80, -40]
    c = mp4_sample_table(make_mp4(
        32, 24, deltas, sizes, keyframes=[1, 4], samples_per_chunk=3,
        ctts_offsets=cof))
    dts = [0, 40, 80, 120, 200, 280, 360]
    assert [r[1] for r in c] == [d + o for d, o in zip(dts, cof)]
    assert [r[2] for r in c] == sizes
    assert [r[3] for r in c] == [r[3] for r in a]  # decode-order ranges
    x = make_mp4(16, 16, [40] * 5, [50] * 5, co64=True,
                 ctts_offsets=[0, 40, -40, 0, 40])
    for cut in range(0, len(x), 3):
        mp4_sample_table(x[:cut])  # truncation never raises


def test_fmp4_fragment_plan(spark):
    """Fragmented MP4 (DASH/HLS segments): the frame plan derives from
    moof/tfhd/tfdt/trun instead of stbl — exact byte ranges, tfdt base
    times + per-sample durations, sync flags from trun sample_flags —
    and the unified mp4_sample_table/video_frame_plan path dispatches
    to it transparently — r10 envelope extension."""
    from fluent_bit_spark.extensions.video import (
        make_fmp4,
        mp4_fragment_table,
    )

    frags = [
        (0, [(40, 10, True), (40, 12, False), (40, 11, False)]),
        (120, [(80, 9, True), (80, 14, False)]),
    ]
    b = make_fmp4(320, 180, frags)
    tbl = mp4_fragment_table(b)
    assert [r[1] for r in tbl] == [0, 40, 80, 120, 200]
    assert [r[2] for r in tbl] == [10, 12, 11, 9, 14]
    assert [r[4] for r in tbl] == [True, False, False, True, False]
    for g, (_i, _ts, sz, off, _k) in enumerate(tbl):
        assert b[off : off + sz] == bytes([65 + g]) * sz  # range-read exact
    # unified dispatch: mp4_sample_table and video_frame_plan handle it
    assert mp4_sample_table(b) == tbl
    plan = video_frame_plan(_media(spark, [(1, b)]), every_ms=100)
    rows = sorted(plan.collect(), key=lambda r: r.frame_idx)
    assert [r.ts_ms for r in rows] == [0, 40, 80, 120, 200]
    assert [r.keyframe for r in rows] == [True, False, False, True, False]
    for cut in range(0, len(b), 7):
        mp4_fragment_table(b[:cut])  # truncation never raises


def test_mp4_elst_shifts_presentation_times():
    """An edit list's first non-empty edit media_time shifts EVERY
    ts_ms (ISO BMFF 8.6.5-8.6.6) — real camera/editor output commonly
    starts presentation at a media offset, and a plan consumer aligning
    captions would otherwise see a constant-offset error. A leading
    EMPTY edit (media_time -1, a presentation delay) is skipped, not
    taken as offset 0; byte ranges never move — r11 envelope
    extension."""
    deltas = [40] * 5
    sizes = [10, 11, 12, 13, 14]
    base = mp4_sample_table(make_mp4(32, 24, deltas, sizes, keyframes=[1, 3]))
    # ctts lifts every composition time by 80; elst media_time 80 is the
    # matching initial offset a muxer writes — presentation returns to 0
    shifted = mp4_sample_table(make_mp4(
        32, 24, deltas, sizes, keyframes=[1, 3],
        ctts_offsets=[80] * 5, elst_media_time=80))
    assert [r[1] for r in shifted] == [r[1] for r in base]
    assert [r[2:] for r in shifted] == [r[2:] for r in base]  # ranges fixed
    # leading empty edit: skipped; the SECOND (non-empty) edit applies
    lead = mp4_sample_table(make_mp4(
        32, 24, deltas, sizes, elst_media_time=40, elst_lead_empty=500))
    assert [r[1] for r in lead] == [-40, 0, 40, 80, 120]
    # elst on a fragmented file: the moov-level edit shifts tfdt times
    from fluent_bit_spark.extensions.video import make_fmp4

    fe = make_fmp4(320, 180, [(100, [(40, 8, True), (40, 9, False)])],
                   elst_media_time=100)
    assert [r[1] for r in mp4_sample_table(fe)] == [0, 40]
    x = make_mp4(16, 16, [40] * 3, [50] * 3, elst_media_time=40,
                 elst_lead_empty=100)
    for cut in range(0, len(x), 3):
        mp4_sample_table(x[:cut])  # truncation never raises


def test_fmp4_multitrack_skips_audio_trafs():
    """Muxed audio+video DASH segments carry one traf per TRACK per
    moof (audio first in this fixture); the video frame plan keeps only
    the trafs whose tfhd track_ID matches the video trak and selects
    trex defaults by the same ID — timing, sizes, and byte ranges must
    equal the video-only file's plan CONTENT-wise, and every range-read
    must hit video filler bytes (audio filler differs, so absorbing an
    audio traf hash-fails) — r11 envelope extension."""
    from fluent_bit_spark.extensions.video import (
        make_fmp4,
        mp4_fragment_table,
    )

    frags = [
        (0, [(40, 10, True), (40, 12, False), (40, 11, False)]),
        (120, [(80, 9, True), (80, 14, False)]),
    ]
    audio = [
        (0, [(21, 5, True), (21, 6, True)]),
        (42, [(21, 7, True), (21, 8, True)]),
    ]
    solo = mp4_fragment_table(make_fmp4(320, 180, frags))
    b = make_fmp4(320, 180, frags, audio_fragments=audio)
    muxed = mp4_fragment_table(b)
    # identical plan rows except absolute offsets (mdat now holds audio)
    assert [(r[0], r[1], r[2], r[4]) for r in muxed] \
        == [(r[0], r[1], r[2], r[4]) for r in solo]
    for g, (_i, _ts, sz, off, _k) in enumerate(muxed):
        assert b[off : off + sz] == bytes([65 + g]) * sz  # video bytes only
    for cut in range(0, len(b), 11):
        mp4_fragment_table(b[:cut])  # truncation never raises


def test_fmp4_audio_track_plan():
    """mp4_sample_table(track='audio') plans the AUDIO track of a muxed
    segment: the soun trak's track_ID selects its trafs and trex
    defaults, ts accumulates the audio durations, and every range-read
    hits audio filler (lowercase in the fixture) — r12: the muxed
    container's audio story the r11 verdict asked for. No soun trak ->
    None (never a mislabeled video fallback), regardless of trak
    order."""
    from fluent_bit_spark.extensions.video import (
        make_fmp4,
        mp4_fragment_table,
        mp4_sample_table,
    )

    frags = [
        (0, [(40, 10, True), (40, 12, False), (40, 11, False)]),
        (120, [(80, 9, True), (80, 14, False)]),
    ]
    audio = [
        (0, [(21, 5, True), (21, 6, True)]),
        (42, [(21, 7, True), (21, 8, True)]),
    ]
    for trak_first in (False, True):
        b = make_fmp4(320, 180, frags, audio_fragments=audio,
                      audio_trak_first=trak_first)
        plan = mp4_sample_table(b, track="audio")
        assert [(r[0], r[1], r[2]) for r in plan] == [
            (0, 0, 5), (1, 21, 6), (2, 42, 7), (3, 63, 8)
        ]
        for g, (_i, _ts, sz, off, key) in enumerate(plan):
            assert b[off : off + sz] == bytes([97 + g]) * sz  # audio bytes
            assert key is True
        # the video plan over the same bytes is unchanged
        vids = mp4_sample_table(b)
        assert [r[2] for r in vids] == [10, 12, 11, 9, 14]
    # video-only file: audio plan refuses rather than mislabeling
    solo = make_fmp4(320, 180, frags)
    assert mp4_sample_table(solo, track="audio") is None
    assert mp4_fragment_table(solo, track="audio") is None
    for cut in range(0, len(b), 11):
        mp4_fragment_table(b[:cut], track="audio")  # never raises


def test_progressive_muxed_audio_stbl_plan():
    """The muxed PROGRESSIVE layout (both sample tables in one moov —
    every phone recording): make_mp4(audio_deltas/audio_sizes) mints a
    second soun trak whose stbl points at lowercase filler after the
    video bytes in mdat, and mp4_sample_table plans each track by hdlr
    regardless of trak order — the stbl sibling of the fragmented
    audio-track plan (r12)."""
    from fluent_bit_spark.extensions.video import (
        make_mp4,
        mp4_sample_table,
        parse_mp4,
    )

    for trak_first in (False, True):
        b = make_mp4(
            320, 180, [40] * 4, [10, 11, 12, 13], keyframes=[1, 3],
            audio_deltas=[21] * 3, audio_sizes=[5, 6, 7],
            audio_trak_first=trak_first,
        )
        aud = mp4_sample_table(b, track="audio")
        assert [(r[0], r[1], r[2]) for r in aud] == [
            (0, 0, 5), (1, 21, 6), (2, 42, 7)
        ]
        for i, (_idx, _ts, sz, off, _k) in enumerate(aud):
            assert b[off : off + sz] == bytes([97 + i]) * sz
        vid = mp4_sample_table(b)
        assert [r[2] for r in vid] == [10, 11, 12, 13]
        assert [r[4] for r in vid] == [True, False, True, False]
        # the header parse still describes the VIDEO track
        hdr = parse_mp4(b)
        assert (hdr["width"], hdr["n_samples"]) == (320, 4)
    # video-only progressive file: audio plan refuses
    solo = make_mp4(320, 180, [40] * 2, [5, 5])
    assert mp4_sample_table(solo, track="audio") is None


def test_adts_frame_table():
    """adts_frame_table (multimodal.py) walks ADTS headers: frame
    length read directly from the 13-bit field (header included, 9
    bytes when a CRC is present), ts from 1024 samples per raw data
    block over the sampling-frequency-index rate, ID3v2 skipped by its
    syncsafe size, garbage/truncation stop the walk — r12: the AAC
    sibling of mp3_frame_table."""
    from fluent_bit_spark.extensions.multimodal import (
        adts_frame_table,
        make_adts_frames,
    )

    sizes = [40 + g % 5 for g in range(6)]
    b = make_adts_frames(6, sample_rate=32000, payload_size=sizes,
                         crc_pattern=0b010101, id3_size=12)
    rows = adts_frame_table(b)
    assert len(rows) == 6
    off_expect = 22  # 10-byte ID3 header + 12 payload
    for g, (idx, ts, sz, off) in enumerate(rows):
        hdr = 9 if (0b010101 >> g) & 1 else 7
        assert idx == g and sz == hdr + sizes[g] and off == off_expect
        assert ts == g * 1024 * 1000 // 32000
        assert b[off + hdr : off + sz] == bytes([65 + g % 26]) * sizes[g]
        off_expect += sz
    # multi-raw-data-block frames advance ts by 1024*(rdb+1)
    raw = bytearray(make_adts_frames(2, payload_size=30))
    raw[6] = 0xFC | 1  # first frame: 2 raw data blocks
    t = adts_frame_table(bytes(raw))
    assert t[1][1] == 2048 * 1000 // 44100
    # stop-don't-crash: garbage, truncation, MP3 sync (layer != 00)
    assert adts_frame_table(b"\x00" * 16) is None
    assert adts_frame_table(b[:20]) is None  # ID3 only, no frame
    from fluent_bit_spark.extensions.multimodal import make_mp3_frames
    assert adts_frame_table(make_mp3_frames(2)) is None
    for cut in range(0, len(b), 7):
        adts_frame_table(b[:cut])


def test_fmp4_trun_without_data_offset_continues_after_previous_run():
    """A trun lacking the data-offset flag continues at the running end
    of the previous run's data (ISO BMFF 8.8.8) — NOT at base_data
    (the pre-r11 behavior, which pointed the run at the moof header
    and silently read garbage). First-run-without-offset starts at the
    traf's base."""
    import struct

    from fluent_bit_spark.extensions.video import (
        _box, _full, make_fmp4, mp4_fragment_table,
    )

    # two truns in one traf: first carries the offset, second does not;
    # reuse ftyp+moov from the writer (the fourcc sits at box start + 4)
    shell = make_fmp4(320, 180, [(0, [(40, 4, True)])])
    head = shell[: shell.find(b"moof") - 4]

    def mk(n, data_off, sizes, flags=0x000701):
        ent = b"".join(struct.pack(">III", 40, s, 0) for s in sizes)
        if flags & 0x1:
            body = struct.pack(">Ii", n, data_off) + ent
        else:
            body = struct.pack(">I", n) + ent
        return _full(b"trun", 0, flags, body)

    tfhd = _full(b"tfhd", 0, 0x020000, struct.pack(">I", 1))
    tfdt = _full(b"tfdt", 1, 0, struct.pack(">Q", 0))
    mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", 1))

    def build(moof_payload_fn):
        dry = _box(b"moof", moof_payload_fn(0))
        base = len(dry) + 8
        moof = _box(b"moof", moof_payload_fn(base))
        return head + moof, base

    sizes1, sizes2 = [10, 11], [12, 13]
    payload = b"A" * 10 + b"B" * 11 + b"C" * 12 + b"D" * 13
    f, base = build(lambda off: mfhd + _box(
        b"traf",
        tfhd + tfdt + mk(2, off, sizes1)
        + mk(2, 0, sizes2, flags=0x000700),  # no data-offset flag
    ))
    f += _box(b"mdat", payload)
    tbl = mp4_fragment_table(f)
    assert [r[2] for r in tbl] == [10, 11, 12, 13]
    offs = [r[3] for r in tbl]
    start = f.find(b"moof") - 4  # moof BOX start
    assert offs == [start + base, start + base + 10,
                    start + base + 21, start + base + 33]
    assert [f[o : o + s] for _i, _t, s, o, _k in tbl] \
        == [b"A" * 10, b"B" * 11, b"C" * 12, b"D" * 13]
    # first-and-only trun without the flag: starts at the traf base
    f2, base2 = build(lambda off: mfhd + _box(
        b"traf", tfhd + tfdt + mk(2, 0, sizes1, flags=0x000700)))
    f2 += _box(b"mdat", b"A" * 10 + b"B" * 11)
    tbl2 = mp4_fragment_table(f2)
    start2 = f2.find(b"moof") - 4
    # base_data = moof start (default-base-is-moof): the plan points at
    # the moof header — offsets are honest, not fabricated
    assert [r[3] for r in tbl2] == [start2, start2 + 10]
