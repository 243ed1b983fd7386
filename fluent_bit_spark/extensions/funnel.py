"""Product-analytics operators over event streams: funnel levels and
cohort retention.

Funnel semantics (deterministic greedy-earliest chain, the replayable
core of ClickHouse's public ``windowFunnel``): per user, step 1 fires
at the earliest step-1 event; each later step fires at the earliest
matching event STRICTLY after the previous step; the chain truncates
at the first step whose fire time exceeds ``window`` seconds after
step 1. Greedy-earliest is exactly replayable by chained conditional
mins in SQL (monotone timestamps make the earliest candidate optimal
under a window anchored at step 1), which is what the oracle does.

Spark-first shape: ONE shuffle — groupBy(user) collects the user's
step events as a sorted struct array and folds it with ``aggregate``
(pure Catalyst, no Python). Per-user state is three scalars; per-task
memory is bounded by the busiest user's step-event count (per-user
activity, not corpus size — the usual event-analytics skew note).

Cohort retention: users bucketed by first-seen date; matrix of
distinct active users per (cohort, day offset). Two keyed
aggregations, both map-side combinable.

Reference context: extension surface — fluent-bit computes per-record
stream aggregates (window SQL), not cross-event user journeys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_levels(
    events: DataFrame,
    steps: list[str],
    window: float | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, funnel_level): how far each user progressed through
    ``steps`` in order, chains anchored within ``window`` seconds of
    step 1 (None = unbounded). Every user in ``events`` appears; users
    with no step-1 event get level 0.
    """
    if not steps:
        raise ValueError("funnel_levels: steps must be non-empty")
    k = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    win_us = None if window is None else int(window * 1_000_000)

    evs = (
        events.where(F.col(type_col).isin(list(steps)))
        .groupBy(user_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.unix_micros(F.col(ts_col)).alias("t"),
                        F.col(type_col).alias("e"),
                    )
                )
            ).alias("__evs")
        )
    )

    init = F.struct(
        F.lit(0).alias("lvl"),
        F.lit(None).cast("long").alias("t1"),
        F.lit(None).cast("long").alias("last"),
    )

    def fold(acc, e):
        want = F.get(steps_arr, acc["lvl"])  # 0-indexed; null past the end
        can = (
            (acc["lvl"] < F.lit(k))
            & (e["e"] == want)
            & ((acc["lvl"] == 0) | (e["t"] > acc["last"]))
        )
        if win_us is not None:
            can = can & (
                (acc["lvl"] == 0) | ((e["t"] - acc["t1"]) <= F.lit(win_us))
            )
        return F.when(
            can,
            F.struct(
                (acc["lvl"] + 1).alias("lvl"),
                F.coalesce(acc["t1"], e["t"]).alias("t1"),
                e["t"].alias("last"),
            ),
        ).otherwise(acc)

    levels = evs.select(
        user_col,
        F.aggregate(F.col("__evs"), init, fold)["lvl"].alias("funnel_level"),
    )
    users = events.select(user_col).distinct()
    return users.join(levels, user_col, "left").select(
        user_col, F.coalesce("funnel_level", F.lit(0)).alias("funnel_level")
    )


def cohort_retention(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """(cohort, day_offset, users): distinct active users per first-seen
    date x days-since-first-seen. ``cohort`` is a yyyy-MM-dd string so
    the cross-engine hash is type-stable."""
    d = F.to_date(F.col(ts_col))
    first = events.groupBy(user_col).agg(F.min(d).alias("__cohort"))
    act = events.select(user_col, d.alias("__d")).distinct()
    return (
        act.join(first, user_col)
        .groupBy(
            F.date_format("__cohort", "yyyy-MM-dd").alias("cohort"),
            F.datediff("__d", "__cohort").alias("day_offset"),
        )
        .agg(F.countDistinct(user_col).alias("users"))
    )
