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

from pyspark.sql import Column, DataFrame
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


def active_users_window(
    events: DataFrame,
    window_days: int = 7,
    ts_col: str = "ts",
    user_col: str = "user_id",
    mode: str = "exact",
    lg_k: int = 12,
) -> DataFrame:
    """(window_end, active_users): distinct users active in the
    ``window_days`` ending on each activity day (rolling WAU/MAU).
    Window ends are restricted to observed activity days so the output
    domain is data-defined.

    ``mode='exact'`` (default — WAU/MAU, window_days 7-30): dedup to
    (user, day) once, explode each activity day to the window ends it
    contributes to (x window_days fan-out on the USER-day table), then
    one distinct-count shuffle keyed by window end. No per-day
    self-join, no range join; at 100 TB the (user, day) dedup is the
    only corpus-sized shuffle.

    ``mode='sliding'`` (long windows, window_days >= ~60): the explode
    fan-out above is x``window_days`` on the user-day table — at
    window_days~365 that's ~365x corpus-sized shuffle rows.
    countDistinct can't slide (distinctness isn't subtractable), so
    this mode aggregates each DAY to one HLL sketch (datasketches
    hll_sketch_agg — the same corpus-sized shuffle the exact mode pays
    for its dedup, but output = one row per day) and unions
    ``window_days`` sketches per window end; the x-fan-out lands on the
    DAY table (365 rows/year), not the corpus. Estimates carry the
    sketch's published error (~1.6% at lg_k=12; exact below the sparse
    threshold), which is the trade that makes a year-long sliding
    distinct affordable. Identical output schema."""
    d = F.to_date(F.col(ts_col))
    if mode == "exact":
        act = events.select(F.col(user_col).alias("__u"), d.alias("__d")).distinct()
        days = act.select("__d").distinct()
        ends = act.select(
            "__u",
            F.explode(
                F.sequence(
                    F.col("__d"),
                    F.date_add(F.col("__d"), window_days - 1),
                )
            ).alias("__end"),
        )
        return (
            ends.join(days.withColumnRenamed("__d", "__end"), "__end")
            .groupBy(F.date_format("__end", "yyyy-MM-dd").alias("window_end"))
            .agg(F.countDistinct("__u").alias("active_users"))
        )
    if mode != "sliding":
        raise ValueError(f"mode must be 'exact' or 'sliding', got {mode!r}")
    daily = (
        events.select(F.col(user_col).alias("__u"), d.alias("__d"))
        .groupBy("__d")
        .agg(F.hll_sketch_agg(F.col("__u").cast("string"), F.lit(lg_k)).alias("__sk"))
    )
    days = daily.select("__d")
    ends = daily.select(
        "__sk",
        F.explode(
            F.sequence(F.col("__d"), F.date_add(F.col("__d"), window_days - 1))
        ).alias("__end"),
    )
    return (
        ends.join(days.withColumnRenamed("__d", "__end"), "__end")
        .groupBy(F.date_format("__end", "yyyy-MM-dd").alias("window_end"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg(F.col("__sk"), F.lit(True)))
            .alias("active_users")
        )
    )


def top_session_paths(
    events: DataFrame,
    gap: float = 1800.0,
    max_steps: int = 5,
    k: int = 20,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(path, sessions): the k most common session-opening event-type
    paths. Sessions split on gaps > ``gap`` seconds per user; a
    session's path is its first ``max_steps`` event types joined with
    '>'. Deterministic: events ordered by (ts, event_id)-free (ts,
    type) within a user — callers with same-ts different-type events
    get lexicographic tie-break; top-k ties break on path ascending.

    One user-keyed window pass for sessionization (lag + running sum),
    one session-keyed aggregation, one small top-k — the standard
    sessionized-path plan; no per-session Python."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, type_col)
    sess = (
        events.select(user_col, ts_col, type_col)
        .withColumn("__prev", F.lag(ts_col).over(w))
        .withColumn(
            "__new",
            (
                F.col("__prev").isNull()
                | (
                    F.unix_micros(F.col(ts_col))
                    - F.unix_micros(F.col("__prev"))
                    > int(gap * 1_000_000)
                )
            ).cast("long"),
        )
        .withColumn("__sess", F.sum("__new").over(w))
    )
    paths = (
        sess.groupBy(user_col, "__sess")
        .agg(
            F.concat_ws(
                ">",
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.unix_micros(F.col(ts_col)).alias("t"),
                                    F.col(type_col).alias("e"),
                                )
                            )
                        ),
                        lambda s: s["e"],
                    ),
                    1,
                    max_steps,
                ),
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("sessions"))
    )
    return paths.orderBy(F.desc("sessions"), F.asc("path")).limit(k)


def event_transitions(
    events: DataFrame,
    gap: float = 1800.0,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(src, dst, transitions, prob): first-order Markov transition
    counts between consecutive event types WITHIN a session (gap
    sessionization as in top_session_paths), with per-src probability.
    One user-keyed window pass + one (src, dst) count shuffle; the
    per-src normalizer is a window sum, not a second aggregation."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, type_col)
    sess = (
        events.select(user_col, ts_col, type_col)
        .withColumn("__prev_ts", F.lag(ts_col).over(w))
        .withColumn(
            "__new",
            (
                F.col("__prev_ts").isNull()
                | (
                    F.unix_micros(F.col(ts_col))
                    - F.unix_micros(F.col("__prev_ts"))
                    > int(gap * 1_000_000)
                )
            ).cast("long"),
        )
        .withColumn("__sess", F.sum("__new").over(w))
        .withColumn(
            "__src",
            F.lag(type_col).over(
                Window.partitionBy(user_col, "__sess").orderBy(ts_col, type_col)
            ),
        )
        .where(F.col("__src").isNotNull())
    )
    counts = sess.groupBy(
        F.col("__src").alias("src"), F.col(type_col).alias("dst")
    ).agg(F.count(F.lit(1)).alias("transitions"))
    total = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "transitions",
        (
            F.col("transitions").cast("double")
            / F.sum("transitions").over(total)
        ).alias("prob"),
    )


def rfm_segments(
    events: DataFrame,
    value_type: str = "purchase",
    n_tiles: int = 5,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
    exact_tiles: bool = True,
) -> DataFrame:
    """(user, recency_days, frequency, monetary, r, f, m): classic RFM
    segmentation. Recency = days since the user's last event relative
    to the corpus max date; frequency = event count; monetary = summed
    ``value_col`` over ``value_type`` events (0 if none). Scores are
    ntile(n) buckets — recency ascending (1 = most recent), frequency
    and monetary descending (1 = best) — with user id as the
    deterministic tie-break, so the DuckDB replay is exact. The corpus
    max date is the one driver scalar.

    Scale note: the three global ntile windows single-task-sort the
    PER-USER aggregate (one row per user), fine to ~10^8 users; beyond
    that pass ``exact_tiles=False`` to swap ntile for boundary
    assignment on distributed percentile cuts (the driver-scalar
    pattern perplexity_buckets uses): ONE aggregate ships 3 cut arrays
    to the driver, scoring becomes a stateless comparison — no global
    sort anywhere, at the cost of exact-equal tile sizes when values
    tie across a boundary (scores and bucket MEANING are unchanged;
    monetary is rounded to 6 decimals first so the cuts replay in
    portable SQL, the perplexity_buckets discipline)."""
    from pyspark.sql import Window

    d = F.to_date(F.col(ts_col))
    # pinned: per_user feeds the max-date collect, the percentile-cuts
    # collect, AND the returned plan — un-pinned, the corpus-sized
    # events aggregation re-runs once per consumer (the graph.py
    # multi-consumer materialization rule)
    per_user = events.groupBy(user_col).agg(
        F.max(d).alias("__last"),
        F.count(F.lit(1)).alias("frequency"),
        F.coalesce(
            F.sum(F.when(F.col(type_col) == value_type, F.col(value_col))),
            F.lit(0.0),
        ).alias("monetary"),
    ).localCheckpoint(eager=True)
    max_d = per_user.agg(F.max("__last")).collect()[0][0]
    per_user = per_user.withColumn(
        "recency_days", F.datediff(F.lit(max_d), F.col("__last"))
    )
    if exact_tiles:
        return per_user.select(
            user_col,
            "recency_days",
            "frequency",
            "monetary",
            F.ntile(n_tiles)
            .over(Window.orderBy(F.asc("recency_days"), F.asc(user_col)))
            .alias("r"),
            F.ntile(n_tiles)
            .over(Window.orderBy(F.desc("frequency"), F.asc(user_col)))
            .alias("f"),
            F.ntile(n_tiles)
            .over(Window.orderBy(F.desc("monetary"), F.asc(user_col)))
            .alias("m"),
        )
    # percentile-cut variant: 3 cut arrays in one distributed aggregate,
    # then stateless comparisons — no global window sort
    qs = F.array(*[F.lit(k / n_tiles) for k in range(1, n_tiles)])
    per_user = per_user.withColumn("__mon", F.round("monetary", 6))
    cuts = per_user.agg(
        F.percentile(F.col("recency_days").cast("double"), qs).alias("cr"),
        F.percentile(F.col("frequency").cast("double"), qs).alias("cf"),
        F.percentile("__mon", qs).alias("cm"),
    ).collect()[0]

    def _bucket(col: Column, bounds: list[float], ascending: bool) -> Column:
        # ascending: tile 1 = smallest -> 1 + #cuts strictly below value;
        # descending: tile 1 = largest -> 1 + #cuts strictly above value
        score = F.lit(1)
        for b in bounds:
            score = score + (
                (col > F.lit(b)) if ascending else (col < F.lit(b))
            ).cast("int")
        return score

    return per_user.select(
        user_col,
        "recency_days",
        "frequency",
        "monetary",
        _bucket(F.col("recency_days").cast("double"), list(cuts["cr"] or []), True).alias("r"),
        _bucket(F.col("frequency").cast("double"), list(cuts["cf"] or []), False).alias("f"),
        _bucket(F.col("__mon"), list(cuts["cm"] or []), False).alias("m"),
    )


def session_summaries(
    events: DataFrame,
    gap: float = 1800.0,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, session, session_start, duration_s, n_events,
    n_event_types): one row per gap-delimited session — the base table
    the other journey operators implicitly build. Same lag/running-sum
    sessionization, then one (user, session)-keyed aggregation."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, type_col)
    sess = (
        events.select(user_col, ts_col, type_col)
        .withColumn("__prev", F.lag(ts_col).over(w))
        .withColumn(
            "__new",
            (
                F.col("__prev").isNull()
                | (
                    F.unix_micros(F.col(ts_col))
                    - F.unix_micros(F.col("__prev"))
                    > int(gap * 1_000_000)
                )
            ).cast("long"),
        )
        .withColumn("__sess", F.sum("__new").over(w))
    )
    return sess.groupBy(
        F.col(user_col), F.col("__sess").alias("session")
    ).agg(
        F.min(ts_col).alias("session_start"),
        (
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
            / F.lit(1_000_000.0)
        ).alias("duration_s"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(type_col).alias("n_event_types"),
    )


def experiment_stats(
    events: DataFrame,
    target: str = "purchase",
    variant_col: str = "variant",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(variant, users, converters, conv_rate, z_vs_baseline): per-
    variant conversion to ``target`` plus the two-proportion pooled
    z-statistic against the LOWEST variant value (the control). The
    input must already carry ``variant_col`` (however the experiment
    assigns it). Two tiny aggregations + a broadcast of the one-row
    control stats — nothing corpus-sized past the first groupBy."""
    per_user = events.groupBy(variant_col, user_col).agg(
        F.max((F.col(type_col) == target).cast("int")).alias("__conv")
    )
    per_var = per_user.groupBy(variant_col).agg(
        F.count(F.lit(1)).alias("users"),
        F.sum("__conv").cast("long").alias("converters"),
    )
    ctrl = per_var.orderBy(variant_col).limit(1).select(
        F.col("users").alias("__cu"), F.col("converters").alias("__cc")
    )
    joined = per_var.crossJoin(F.broadcast(ctrl))
    p = F.col("converters") / F.col("users")
    p0 = F.col("__cc") / F.col("__cu")
    pool = (F.col("converters") + F.col("__cc")) / (
        F.col("users") + F.col("__cu")
    )
    se = F.sqrt(
        pool * (1 - pool) * (1 / F.col("users") + 1 / F.col("__cu"))
    )
    return joined.select(
        variant_col,
        "users",
        "converters",
        p.alias("conv_rate"),
        F.when(se > 0, (p - p0) / se).otherwise(F.lit(0.0)).alias(
            "z_vs_baseline"
        ),
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


def attribution(
    events: DataFrame,
    conversion: str = "purchase",
    touch_types: list[str] | None = None,
    lookback: float | None = None,
    model: str = "last_touch",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(channel, credit, attributed_value): marketing-attribution credit
    of each ``conversion`` event's value to the user's preceding touch
    events (strictly earlier ts, within ``lookback`` seconds when set).

    Models — ``last_touch`` (full credit to the latest qualifying touch;
    ties break on channel desc, the deterministic rule the SQL oracle
    replays), ``first_touch`` (earliest touch in the window, ties on
    channel asc), ``linear`` (each qualifying touch gets 1/n of the
    conversion and its value). Conversions with no qualifying touch
    credit the ``(direct)`` channel. ``credit`` sums fractional
    conversion counts (integral for first/last touch); both outputs
    round to 6 decimals for cross-engine replay.

    Duplicate conversions — two ``conversion`` events by the same user
    at the same timestamp — pre-aggregate to (sum value, count n) per
    (user, ts) and every model scales its credit by n, so each event
    earns a full credit and no value is dropped (the replay-window
    formulation alone would merge them into one).

    Shape: one user-keyed join of conversions to touches (per-user
    event counts bound the fan-out — the standard event-analytics skew
    note), one per-conversion window for the model rule, one
    channel-keyed aggregation. No Python anywhere."""
    from pyspark.sql import Window

    if model not in ("last_touch", "first_touch", "linear"):
        raise ValueError(f"unknown attribution model {model!r}")
    conv = (
        events.where(F.col(type_col) == conversion)
        .groupBy(
            F.col(user_col).alias("__u"),
            F.unix_micros(F.col(ts_col)).alias("__cts"),
        )
        .agg(
            F.sum(F.coalesce(F.col(value_col), F.lit(0.0))).alias("__cval"),
            F.count(F.lit(1)).cast("double").alias("__n"),
        )
    )
    touches = events.where(
        F.col(type_col).isin(list(touch_types))
        if touch_types is not None
        else (F.col(type_col) != conversion)
    ).select(
        F.col(user_col).alias("__u"),
        F.unix_micros(F.col(ts_col)).alias("__tts"),
        F.col(type_col).alias("channel"),
    )
    cond = F.col("__tts") < F.col("__cts")
    if lookback is not None:
        cond = cond & (
            (F.col("__cts") - F.col("__tts")) <= int(lookback * 1_000_000)
        )
    j = conv.join(touches, "__u").where(cond)
    w = Window.partitionBy("__u", "__cts")
    if model == "linear":
        credited = j.select(
            "channel",
            (F.col("__n") / F.count(F.lit(1)).over(w)).alias("__credit"),
            (F.col("__cval") / F.count(F.lit(1)).over(w)).alias("__val"),
        )
    else:
        order = (
            [F.col("__tts").desc(), F.col("channel").desc()]
            if model == "last_touch"
            else [F.col("__tts").asc(), F.col("channel").asc()]
        )
        credited = (
            j.withColumn("__rn", F.row_number().over(w.orderBy(*order)))
            .where(F.col("__rn") == 1)
            .select(
                "channel",
                F.col("__n").alias("__credit"),
                F.col("__cval").alias("__val"),
            )
        )
    direct = (
        conv.join(
            j.select("__u", "__cts").distinct(), ["__u", "__cts"], "left_anti"
        )
        .select(
            F.lit("(direct)").alias("channel"),
            F.col("__n").alias("__credit"),
            F.col("__cval").alias("__val"),
        )
    )
    return (
        credited.unionByName(direct)
        .groupBy("channel")
        .agg(
            F.round(F.sum("__credit"), 6).alias("credit"),
            F.round(F.sum("__val"), 6).alias("attributed_value"),
        )
    )
