"""Mergeable-sketch aggregates: distinct counts (HLL), rank/quantile
summaries (KLL), and sketch rollups.

The 100 TB answer to COUNT(DISTINCT) and exact percentiles: both need a
full shuffle of the distinct values (or a sort) and hold per-group state
proportional to group cardinality. Sketches cap per-group state at a few
KB, keep the aggregation fully map-side-combinable, and — the property
the rollup helper demonstrates — are MERGEABLE: a coarse-grained summary
(per-day distinct users) derives from the fine-grained sketches (per-hour)
without rescanning the raw data, fluent-bit's log_to_metrics → metrics
rollup pattern at data-warehouse scale.

Uses Spark 4's native Apache DataSketches expressions (hll_sketch_agg,
hll_union_agg, kll_sketch_agg_double) — JVM-side, codegen-friendly, no
UDFs. In the small-cardinality regime (sparse HLL; KLL below compaction)
the estimates are EXACT, which is what makes the DuckDB oracle gate able
to hash-check these queries at sf0.01; at production scale they degrade
gracefully to the published error bounds (HLL lgK=14 ≈ 0.8% RSE).

Reference parity: fluent-bit has no sketch layer (its log_to_metrics
keeps exact per-label counters, plugins/filter_log_to_metrics/); this is
extension surface, same tier as the dedup/ANN family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_counts(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col`` via HLL.

    One shuffle on the group keys; per-group state is the sketch (≤ 2^lg_k
    registers), not the distinct set. Output column: ``n_distinct``.
    """
    return df.groupBy(*keys).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(value_col, F.lit(lg_k))
        ).alias("n_distinct")
    )


def distinct_rollup(
    df: DataFrame,
    fine_keys: list[str],
    coarse_keys: list[str],
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """Two-level mergeable rollup: build one HLL sketch per fine group,
    then UNION the sketches up to the coarse grouping — the raw data is
    scanned once, and the coarse distinct count is derived from the fine
    sketches alone (what makes pre-aggregated sketch tables reusable for
    any coarser time/label slice).

    ``coarse_keys`` must be a subset of ``fine_keys``. Returns the coarse
    grouping with ``n_distinct``.
    """
    fine = df.groupBy(*fine_keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("_sk")
    )
    return fine.groupBy(*coarse_keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("n_distinct")
    )


def quantile_summary(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    k: int = 8192,
) -> DataFrame:
    """Per-group quantiles of a double column from one KLL sketch.

    One shuffle on the group keys; the sketch (bounded by ``k``) replaces
    the per-group sort an exact percentile needs. Each requested quantile
    becomes a ``p<percent>`` column holding an actual data value (KLL
    returns items, i.e. discrete-quantile semantics).
    """
    sk = F.kll_sketch_agg_double(value_col, F.lit(k))
    aggs = [sk.alias("_sk")]
    out = df.groupBy(*keys).agg(*aggs)
    names = []
    for q in quantiles:
        pct = q * 100
        # integer percents keep the classic p50/p95/p99 names;
        # fractional ones keep their precision with '_' for '.'
        # (p99_9) — rounding to an int mislabeled 0.995 as p100 and
        # silently overwrote neighboring quantile columns
        if abs(pct - round(pct)) < 1e-9:
            name = f"p{round(pct):02d}"
        else:
            name = "p" + f"{pct:g}".replace(".", "_")
        if name in names:
            raise ValueError(
                f"quantile_summary: duplicate column name {name!r} for "
                f"quantiles {quantiles}"
            )
        names.append(name)
        out = out.withColumn(
            name, F.kll_sketch_get_quantile_double(F.col("_sk"), F.lit(float(q)))
        )
    return out.drop("_sk")


def segment_overlap(
    df: DataFrame,
    segment_col: str,
    value_col: str,
) -> DataFrame:
    """Pairwise audience overlap between segments via theta sketches:
    for every segment pair (a < b), the estimated distinct-value count of
    their union, intersection, and a-minus-b difference — the set algebra
    HLL cannot do (HLL unions only; theta sketches support
    intersection/difference with bounded error).

    Scale shape: one pass builds a KB-sized sketch per segment; the
    pairwise stage joins the tiny per-segment sketch table with itself
    (segments x segments rows, model-sized — broadcast by AQE), so raw
    data is never self-joined. Exact in the sparse regime (all hashes
    retained below the sketch's nominal capacity).

    Returns (seg_a, seg_b, n_union, n_both, n_only_a).
    """
    sk = df.groupBy(segment_col).agg(F.theta_sketch_agg(value_col).alias("_sk"))
    a, b = sk.alias("a"), sk.alias("b")
    return a.join(
        b, F.col(f"a.{segment_col}") < F.col(f"b.{segment_col}")
    ).select(
        F.col(f"a.{segment_col}").alias("seg_a"),
        F.col(f"b.{segment_col}").alias("seg_b"),
        F.theta_sketch_estimate(
            F.theta_union(F.col("a._sk"), F.col("b._sk"))
        ).alias("n_union"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("a._sk"), F.col("b._sk"))
        ).alias("n_both"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("a._sk"), F.col("b._sk"))
        ).alias("n_only_a"),
    )


def rank_summary(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    at_values: tuple[float, ...],
    k: int = 8192,
) -> DataFrame:
    """Inverse quantiles: for each group, the fraction of observations
    <= each probe value (KLL rank — "what percentile is a 2-second
    latency?"). Same bounded-state sketch as quantile_summary; exact
    below the sketch's compaction threshold. Probe columns are named
    ``rank_at_<value>`` with dots mapped to underscores."""
    out = df.groupBy(*keys).agg(
        F.kll_sketch_agg_double(value_col, F.lit(k)).alias("_sk")
    )
    for v in at_values:
        name = f"rank_at_{str(v).replace('.', '_')}"
        out = out.withColumn(
            name,
            F.round(
                F.kll_sketch_get_rank_double(F.col("_sk"), F.lit(float(v))), 9
            ),
        )
    return out.drop("_sk")


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-column dataset profile — the validation pass a training
    pipeline runs before committing an ingest batch: row count, null
    count, HLL distinct estimate, type-native min and max (computed in
    the column's own ordering, then surfaced as strings so one
    long-format schema covers every type).

    Scale shape: ONE aggregation pass over the scan — all columns'
    metrics are computed in a single agg (map-side combinable: counts,
    conditional counts, HLL buffers, min/max), then unpivoted
    driver-free with an explode over a metrics array. No per-column jobs,
    no exact count_distinct expand. ``rsd`` is the HLL relative standard
    deviation (2% default ~= a few KB of state per column).

    Returns (column, n_rows, n_nulls, approx_distinct, min_value,
    max_value) — one row per profiled column."""
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nul{i}"),
            F.approx_count_distinct(c, rsd).alias(f"__dis{i}"),
            # type-native ordering FIRST, then surface as string: casting
            # before min/max would profile [9, 10] as min='10'/max='9'
            F.min(col).cast("string").alias(f"__min{i}"),
            F.max(col).cast("string").alias(f"__max{i}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nul{i}").alias("n_nulls"),
            F.col(f"__dis{i}").alias("approx_distinct"),
            F.col(f"__min{i}").alias("min_value"),
            F.col(f"__max{i}").alias("max_value"),
        )
        for i, c in enumerate(cols)
    ])
    return one.select(F.explode(rows).alias("p")).select("p.*")


def skew_profile(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Join/shuffle-skew diagnostic for a prospective key: the top-N
    hottest keys with their row counts and share of the table, plus
    summary rows for total rows, distinct keys, and the max/total skew
    ratio — the numbers that decide between a plain shuffle join, a
    broadcast, salting, or AQE skew handling before launching a 100 TB
    job against a bad key.

    Scale shape: one combinable groupBy count over the key, then a
    driver-size TakeOrderedAndProject for the top-N (no global sort) and
    a scalar aggregate for the summary — the profile costs one shuffle
    of (key, count) pairs regardless of table width. NULL keys profile
    as a regular (hot, in practice) key value.

    Returns (kind, key, rows, share, value) — kind 'key' for the top-N
    rows (hottest first by (rows desc, key)), 'total_rows' /
    'distinct_keys' / 'max_key_share' summary rows with key NULL. The
    hottest key's COUNT rides the ``value`` column of the
    max_key_share row (rows stays NULL there — a ratio's numerator is
    not a row count); 'key' and count-style summary rows carry NULL
    value."""
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    counts = df.groupBy(
        F.col(key_col).cast("string").alias("__k")
    ).agg(F.count(F.lit(1)).alias("__c"))
    counts = counts.localCheckpoint(eager=True)  # reused by 3 consumers
    stats = counts.agg(
        F.sum("__c").alias("total"),
        F.count(F.lit(1)).alias("nkeys"),
        F.max("__c").alias("maxc"),
    ).collect()[0]
    total = stats["total"] or 0
    top = (
        counts.orderBy(F.col("__c").desc(), F.col("__k"))
        .limit(top_n)
        .select(
            F.lit("key").alias("kind"),
            F.col("__k").alias("key"),
            F.col("__c").cast("long").alias("rows"),
            F.round(F.col("__c") / F.lit(float(total or 1)), 6).alias("share"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    spark = df.sparkSession
    maxc = int(stats["maxc"] or 0)
    summary = spark.createDataFrame(
        [
            ("total_rows", None, int(total), 1.0, None),
            ("distinct_keys", None, int(stats["nkeys"] or 0), None, None),
            ("max_key_share", None, None, None, float(maxc)),
        ],
        "kind string, key string, rows long, share double, value double",
    ).select(
        "kind", "key", "rows",
        # HALF_UP via F.round (python round() is banker's — it would
        # disagree with a SQL oracle's ROUND on exact half-way shares)
        F.when(
            F.col("kind") == "max_key_share",
            F.round(F.col("value") / F.lit(float(total)), 6) if total else F.lit(None),
        ).otherwise(F.col("share")).alias("share"),
        "value",
    )
    return top.unionByName(summary)


def winsorize(
    df: DataFrame,
    col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Percentile clipping (winsorization) of a numeric column — the
    outlier-taming step feature/quality pipelines apply before scoring
    or normalizing (a single crawl document with a pathological length
    must not drag a z-score or a mean).

    Cutoffs are exact distributed percentiles of the 6-decimal-rounded
    values shipped to the driver as two scalars (the perplexity_buckets
    pattern — no global sort, no window); clipping is then a stateless
    JVM comparison, streaming-legal and shuffle-free. Rounding applies
    to the CUT computation only — it makes the cut arithmetic
    replayable bit-for-bit by a quantile_cont oracle — while in-range
    values pass through at full precision (clipping the rounded value
    would silently mutate every row: 0.12345678 -> 0.123457, and any
    |x| < 5e-7 -> 0.0). NULLs pass through as NULL."""
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError("need 0 <= lower < upper <= 1")
    v = F.col(col).cast("double")
    r = F.round(v, 6)
    cuts = df.agg(
        F.percentile(r, F.lit(lower)).alias("lo"),
        F.percentile(r, F.lit(upper)).alias("hi"),
    ).collect()[0]
    if cuts["lo"] is None:
        raise ValueError(f"winsorize: column {col!r} has no non-null values")
    clipped = F.least(
        F.greatest(v, F.lit(float(cuts["lo"]))), F.lit(float(cuts["hi"]))
    )
    # Spark's greatest/least SKIP nulls (a NULL value would clip to the
    # lower cut); gate explicitly so NULL rows stay NULL
    return df.withColumn(
        out_col or col, F.when(v.isNotNull(), clipped)
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 100,
    exact: bool = True,
) -> DataFrame:
    """Keys occurring more than n/k times, with EXACT counts — the
    frequent-items query (hot domains, spam senders, runaway log keys)
    at a scale where "GROUP BY key" itself is the problem.

    Two phases (Misra-Gries, the classic frequent-items summary):

      1. candidate generation via mapInPandas: each partition keeps at
         most k-1 counters (decrement-all when full), so executor memory
         is O(k) REGARDLESS of key cardinality and nothing shuffles but
         the per-partition summaries (<= k-1 rows each). The MG
         guarantee composes under summation: any key with global count
         > n/k survives in the merged candidate set — no false
         negatives, ever.
      2. exact verification: one combinable count over rows matching the
         (broadcast) candidate set, then the > n/k threshold filter —
         so reported counts are exact and false positives are removed.

    Versus a plain groupBy: the full-key shuffle (cardinality-sized)
    becomes a candidate-sized one; the trade is a second scan, which is
    the standard trade at 100 TB (scans are cheap, wide shuffles are
    not). ``exact=False`` skips phase 2 and returns ALL merged
    candidates with their MG lower-bound counts (true - n/k <= count <=
    true) — no threshold filter, because filtering an underestimate
    against n/k would reintroduce false negatives; callers treat the
    candidate set as a superset to verify or accept the <= n/k slack.

    Returns (key string, count); output order is not guaranteed. NULL
    keys are counted on the side (equi-joins would silently drop them
    from the verify phase) and appear as a NULL-key row when hot.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    keyed = df.select(F.col(key_col).cast("string").alias("__k"))
    stats = keyed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__k").isNull().cast("long")).alias("nulls"),
    ).collect()[0]
    total, nulls = stats["n"], stats["nulls"] or 0
    thresh = total / k

    src = keyed.where(F.col("__k").isNotNull())

    def mg_partition(pdfs):
        # WEIGHTED Misra-Gries: each Arrow batch is collapsed to
        # (key, weight) via vectorized value_counts, then merged into
        # the k-1 counters per unique key — O(uniques) interpreter work
        # instead of O(rows), same <= W_p/k underestimate bound (every
        # decrement event removes >= k units of total mass, so total
        # decrements <= W_p/k).
        import pandas as pd_

        counters: dict = {}
        for pdf in pdfs:
            for key, w in pdf["__k"].value_counts().items():
                w = int(w)
                if key in counters:
                    counters[key] += w
                    continue
                if len(counters) < k - 1:
                    counters[key] = w
                    continue
                d = min(w, min(counters.values()))
                dead = []
                for c in counters:
                    counters[c] -= d
                    if counters[c] == 0:
                        dead.append(c)
                for c in dead:
                    del counters[c]
                if w - d > 0:
                    counters[key] = w - d
        if counters:
            yield pd_.DataFrame(
                {"__k": list(counters), "__c": list(counters.values())}
            )

    summaries = src.mapInPandas(mg_partition, "__k string, __c long")
    # summed MG estimates: lower bounds on true counts; any key with
    # true count > n/k is guaranteed present
    cand = summaries.groupBy("__k").agg(F.sum("__c").alias("__c"))
    if not exact:
        out = cand.select(F.col("__k").alias("key"), F.col("__c").alias("count"))
    else:
        cand_keys = cand.select("__k")
        out = (
            src.join(F.broadcast(cand_keys), "__k", "left_semi")
            .groupBy("__k")
            .agg(F.count(F.lit(1)).alias("count"))
            .where(F.col("count") > F.lit(thresh))
            .select(F.col("__k").alias("key"), "count")
        )
    if nulls > thresh:
        null_row = df.sparkSession.createDataFrame(
            [(None, int(nulls))], "key string, count long"
        )
        out = out.unionByName(null_row)
    return out
