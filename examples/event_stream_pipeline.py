"""Streaming twin of event_analytics.py — live product analytics over an
event drop directory, composing the engine's stateful streaming
operators:

  tail (json) -> exact event dedup under a watermark (at-least-once
       ingestion re-emits; the hash state evicts by event time)
    -> funnel_levels_stream   (per-user monotone view->click->purchase
                               fold; emits a row whenever a user's level
                               changes — the live conversion board)
    -> session_summaries_stream (built-in session_window + watermark:
                               one row per CLOSED session)

Scale shape: dedup state is one small row per distinct event hash
inside the horizon; funnel state is three scalars per user; session
state is Spark's own merged session windows — all bounded, all
RocksDB-ready, nothing accumulates with stream length. The two analytic
branches run as separate queries off the same deduped stream, the
standard fan-out deployment (each query owns its checkpoint).

Usage: python examples/event_stream_pipeline.py [in_dir]
(with no args, synthesizes a drop directory from the sf0.001 events
table and runs one availableNow pass; prints funnel-level counts and
the closed-session summary). ``run(spark, in_dir)`` returns the
summary dict the shipped test asserts on.
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

STEPS = ["view", "click", "purchase"]


def build(spark, in_dir: str):
    """(funnel_sdf, session_sdf): the two analytic branches off one
    deduped tail stream, un-started so callers pick sinks."""
    from fluent_bit_spark.streaming.stateful import (
        dedup_stream,
        funnel_levels_stream,
        session_summaries_stream,
    )

    sdf = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    # replayed files re-emit events; one (user, ts, type) hash row per
    # event inside the horizon makes the downstream folds idempotent
    deduped = dedup_stream(
        sdf.withColumn(
            "text",
            F.concat_ws("|", "user_id", F.col("ts").cast("string"), "event_type"),
        ),
        text_col="text",
        watermark="10 minutes",
        time_col="ts",
    ).drop("text")
    funnel = funnel_levels_stream(deduped, STEPS, window=3 * 86400.0, ts_col="ts")
    # watermark=None: the dedup stage upstream already set the event-time
    # watermark; Spark forbids redefining it across stateful operators
    sessions = session_summaries_stream(
        deduped, gap=1800.0, watermark=None, ts_col="ts"
    )
    return funnel, sessions


def run(spark, in_dir: str) -> dict:
    import uuid

    funnel, sessions = build(spark, in_dir)
    out: dict = {}
    # memory-sink query names are session-global temp views: suffix them
    # per invocation so repeat runs (tests, notebooks) read fresh tables
    tag = uuid.uuid4().hex[:8]
    fname, sname = f"funnel_live_{tag}", f"sessions_live_{tag}"
    for name, sdf in ((fname, funnel), (sname, sessions)):
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
    # last emitted level per user = current conversion state
    levels = spark.sql(
        f"SELECT user_id, funnel_level FROM {fname}"
    ).collect()
    last: dict = {}
    for r in levels:
        last[r.user_id] = r.funnel_level
    out["funnel"] = {}
    for lvl in last.values():
        out["funnel"][int(lvl)] = out["funnel"].get(int(lvl), 0) + 1
    sess = spark.sql(
        f"SELECT COUNT(*) AS n, SUM(n_events) AS ev FROM {sname}"
    ).collect()[0]
    out["closed_sessions"] = int(sess["n"] or 0)
    out["session_events"] = int(sess["ev"] or 0)
    return out


def build_single(spark, in_dir: str):
    """Single-query variant: tail -> dedup -> user_journey_stream (funnel
    fold + gap sessionization in ONE per-user state pass). The two-query
    fan-out in build() pays the chained-stateful per-trigger fixed cost
    once PER QUERY (~1.7 s/micro-batch each, BASELINE.md r7); this shape
    commits one state store per trigger and splits the discriminated
    output downstream — the deployment to pick when triggers are small
    relative to the fixed cost."""
    from fluent_bit_spark.streaming.stateful import (
        dedup_stream,
        user_journey_stream,
    )

    sdf = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    deduped = dedup_stream(
        sdf.withColumn(
            "text",
            F.concat_ws("|", "user_id", F.col("ts").cast("string"), "event_type"),
        ),
        text_col="text",
        watermark="10 minutes",
        time_col="ts",
    ).drop("text")
    return user_journey_stream(
        deduped, STEPS, window=3 * 86400.0, gap=1800.0, ts_col="ts"
    )


def run_single(spark, in_dir: str) -> dict:
    """run()'s summary dict computed by the single-query pipeline —
    same keys, so the shipped test asserts the two shapes agree."""
    import uuid

    journey = build_single(spark, in_dir)
    jname = f"journey_live_{uuid.uuid4().hex[:8]}"
    q = (
        journey.writeStream.format("memory")
        .queryName(jname)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    out: dict = {"funnel": {}}
    last: dict = {}
    for r in spark.sql(
        f"SELECT user_id, funnel_level FROM {jname} WHERE kind = 'funnel'"
    ).collect():
        last[r.user_id] = r.funnel_level
    for lvl in last.values():
        out["funnel"][int(lvl)] = out["funnel"].get(int(lvl), 0) + 1
    sess = spark.sql(
        f"SELECT COUNT(*) AS n, SUM(n_events) AS ev FROM {jname} "
        "WHERE kind = 'session'"
    ).collect()[0]
    out["closed_sessions"] = int(sess["n"] or 0)
    out["session_events"] = int(sess["ev"] or 0)
    return out


def synth_drop_dir(spark, sf_dir: str) -> str:
    """Spool the events table into per-day JSON files (time-ordered
    micro-batches), appending one far-future closer event per user so
    every real session closes inside the availableNow pass."""
    from fluent_bit_spark.model import load_table

    import os
    import time

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    pdf = ev.toPandas().sort_values("ts")
    d = Path(tempfile.mkdtemp(prefix="fbs_event_drop_")) / "in"
    d.mkdir()
    chunk = max(1, len(pdf) // 6)
    # the file source orders micro-batches by mtime: stamp strictly
    # increasing times, or same-ms writes tie and shuffle the batch
    # order — cross-batch disorder the in-order folds don't contract for
    base = time.time() - 1000
    seq = 0
    for i in range(0, len(pdf), chunk):
        fp = d / f"b{i:07d}.json"
        with open(fp, "w") as f:
            for r in pdf.iloc[i:i + chunk].itertuples(index=False):
                f.write(json.dumps({
                    "user_id": int(r.user_id),
                    "ts": r.ts.isoformat(),
                    "event_type": r.event_type,
                }) + "\n")
        os.utime(fp, (base + seq, base + seq))
        seq += 1
    closer_ts = (pdf["ts"].max() + __import__("pandas").Timedelta(days=30)).isoformat()
    closers = d / "zz_closers.json"
    with open(closers, "w") as f:
        for u in sorted(pdf["user_id"].unique()):
            f.write(json.dumps({
                "user_id": int(u), "ts": closer_ts, "event_type": "end",
            }) + "\n")
    os.utime(closers, (base + seq, base + seq))
    return str(d)


if __name__ == "__main__":
    from fluent_bit_spark import get_spark

    spark = get_spark("event-stream-pipeline")
    in_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else synth_drop_dir(spark, "/root/testdata/sf0.001")
    )
    summary = run(spark, in_dir)
    print(json.dumps(summary, indent=2, sort_keys=True))
