"""End-to-end product analytics over the events table.

The journey-analytics loop a product team runs, each stage one of the
engine's event operators:

  1. funnel            view -> click -> purchase within 3 days of the
                       first view (greedy-earliest chain, Catalyst fold)
  2. cohort retention  first-seen date x day offset distinct users
  3. rolling WAU       7-day active-user windows, explode form
  4. top paths         30-min gap sessions, top session-opening paths
  5. transitions       within-session Markov matrix (per-src prob)
  6. RFM               recency/frequency/monetary quintile scores
  7. attribution       purchase value credited to preceding touches
                       (last-touch, 3-day lookback)

Usage: python examples/event_analytics.py [sf_dir]
Prints the funnel conversion table, retention summary, WAU range, and
the top-5 paths. ``run(spark, sf_dir)`` returns the summary dict the
shipped test asserts on.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def run(spark, sf_dir: str) -> dict:
    from fluent_bit_spark.extensions.funnel import (
        active_users_window,
        attribution,
        cohort_retention,
        event_transitions,
        funnel_levels,
        rfm_segments,
        top_session_paths,
    )
    from fluent_bit_spark.model import load_table

    ev = load_table(spark, sf_dir, "events")
    out: dict = {}

    levels = funnel_levels(ev, ["view", "click", "purchase"], window=3 * 86400)
    out["funnel"] = {
        int(r["funnel_level"]): int(r["n"])
        for r in levels.groupBy("funnel_level")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    ret = cohort_retention(ev)
    out["cohorts"] = ret.select("cohort").distinct().count()
    out["day0_users"] = int(
        ret.where(F.col("day_offset") == 0)
        .agg(F.sum("users"))
        .collect()[0][0]
    )

    wau = active_users_window(ev, window_days=7)
    stats = wau.agg(
        F.min("active_users").alias("lo"), F.max("active_users").alias("hi")
    ).collect()[0]
    out["wau_min"], out["wau_max"] = int(stats["lo"]), int(stats["hi"])

    out["top_paths"] = [
        (r["path"], int(r["sessions"]))
        for r in top_session_paths(ev, gap=1800, max_steps=5, k=5).collect()
    ]

    tr = event_transitions(ev, gap=1800)
    out["prob_mass_ok"] = all(
        abs(p - 1.0) < 1e-9
        for p in (
            r["s"]
            for r in tr.groupBy("src").agg(F.sum("prob").alias("s")).collect()
        )
    )

    rfm = rfm_segments(ev)
    out["rfm_champions"] = rfm.where(
        (F.col("r") == 1) & (F.col("f") == 1) & (F.col("m") == 1)
    ).count()
    out["rfm_users"] = rfm.count()

    attr = attribution(
        ev, conversion="purchase", touch_types=["view", "click", "signup"],
        lookback=3 * 86400.0, model="last_touch",
    )
    out["attribution"] = {
        r["channel"]: round(float(r["attributed_value"]), 2)
        for r in attr.collect()
    }
    return out


def main() -> None:
    from fluent_bit_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("event-analytics-example")
    out = run(spark, sf_dir)
    total = sum(out["funnel"].values())
    print("funnel (3-day window):")
    reached = total
    for lvl in range(0, 4):
        reached_here = sum(n for k, n in out["funnel"].items() if k >= lvl)
        print(f"  step>={lvl}: {reached_here}/{total} users")
    print(f"cohorts: {out['cohorts']}, day-0 user-slots: {out['day0_users']}")
    print(f"rolling 7-day active users: {out['wau_min']}..{out['wau_max']}")
    print("top session paths:")
    for p, n in out["top_paths"]:
        print(f"  {n:6d}  {p}")
    print(f"transition rows normalize: {out['prob_mass_ok']}")
    print(f"RFM champions (1/1/1): {out['rfm_champions']}/{out['rfm_users']} users")
    print("last-touch attributed purchase value:")
    for ch, v in sorted(out["attribution"].items(), key=lambda kv: -kv[1]):
        print(f"  {v:12.2f}  {ch}")


if __name__ == "__main__":
    main()
