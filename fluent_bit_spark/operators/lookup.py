"""Lookup/enrichment joins: checklist, kubernetes/geoip-style metadata.

Reference joins are all stream-to-static lookups (SURVEY §2.5):
- filter_checklist (plugins/filter_checklist/checklist.c): file of values
  loaded into a hash; when a record's key matches an entry, set record k-vs.
- filter_kubernetes (kube_meta.c:2642), filter_geoip2 (geoip2.c:50),
  filter_aws/ecs: enrich from a metadata table.

Spark: broadcast hash joins — the dimension side is tiny, so no shuffle of
the fact stream at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def checklist(
    df: DataFrame,
    watchlist: DataFrame,
    key: str,
    list_key: str,
    set_values: dict[str, object],
    case_insensitive: bool = False,
) -> DataFrame:
    """Set ``set_values`` columns on rows whose ``key`` appears in
    ``watchlist[list_key]`` (exact mode)."""
    lk = F.col(list_key).cast("string")
    rk = F.col(key).cast("string")
    if case_insensitive:
        lk, rk = F.lower(lk), F.lower(rk)
    marks = watchlist.select(lk.alias("__wl_key")).distinct().withColumn("__hit", F.lit(True))
    joined = df.join(F.broadcast(marks), rk == F.col("__wl_key"), "left")
    for k, v in set_values.items():
        old = F.col(k) if k in df.columns else F.lit(None)
        joined = joined.withColumn(k, F.when(F.col("__hit"), F.lit(v)).otherwise(old))
    return joined.drop("__wl_key", "__hit")


def ip_to_int(col) -> "F.Column":
    """Dotted-quad IPv4 -> unsigned 32-bit value in a long; malformed
    input -> NULL. Pure Catalyst fold over the octets."""
    parts = F.split(col.cast("string"), r"\.")
    valid = (F.size(parts) == 4) & F.forall(
        parts, lambda p: p.rlike(r"^\d{1,3}$") & (p.cast("int") <= 255)
    )
    packed = F.aggregate(
        parts, F.lit(0).cast("long"), lambda acc, p: acc * 256 + p.cast("long")
    )
    return F.when(valid, packed)


def geoip_ranges_bucketed(ranges: DataFrame, bucket_bits: int = 16) -> DataFrame:
    """Explode each [range_start, range_end] interval into the coarse
    (ip >> bucket_bits) buckets it spans, turning the interval join into a
    broadcast HASH join on the bucket + a residual BETWEEN filter.

    Why: a raw `ip BETWEEN start AND end` broadcast join is a nested-loop
    scan of the whole range table per record — fatal with GeoLite-sized
    tables (millions of ranges) at log scale. CIDR blocks are almost all
    /16 or smaller, so the bucket expansion is a small constant factor
    while the probe becomes O(ranges-in-bucket)."""
    width = 1 << bucket_bits
    seq = F.sequence(
        F.expr(f"CAST(range_start AS BIGINT) DIV {width}"),
        F.expr(f"CAST(range_end AS BIGINT) DIV {width}"),
    )
    return ranges.select("*", F.explode(seq).alias("__bkt"))


def geoip_enrich(
    df: DataFrame,
    ranges: DataFrame,
    ip_col: str,
    bucket_bits: int = 16,
) -> DataFrame:
    """filter_geoip2-shaped enrichment (plugins/filter_geoip2/geoip2.c:50-66:
    `lookup_key` IP -> mmdb attributes added as new record keys).

    ``ranges`` is the mmdb flattened to rows: range_start / range_end
    (inclusive u32 bounds) plus any attribute columns (city, country_iso,
    latitude, ...). The join is a broadcast hash join on the coarse IP
    bucket with a residual range check — never a nested-loop over the full
    table. A record whose IP matches no range (or fails to parse) keeps
    NULL attributes, mirroring the reference's lookup-miss path (record
    passes through unenriched). Assumes disjoint ranges (mmdb guarantee)."""
    width = 1 << bucket_bits
    attr_cols = [c for c in ranges.columns if c not in ("range_start", "range_end")]
    keyed = df.withColumn("__ipint", ip_to_int(F.col(ip_col))).withColumn(
        "__bkt", F.expr(f"__ipint DIV {width}")
    )
    rb = geoip_ranges_bucketed(ranges, bucket_bits)
    cond = (
        (keyed["__bkt"] == rb["__bkt"])
        & keyed["__ipint"].between(rb["range_start"], rb["range_end"])
    )
    return (
        keyed.join(F.broadcast(rb), cond, "left")
        .select(*df.columns, *[rb[c] for c in attr_cols])
    )


def enrich(
    df: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    select_map: dict[str, str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Generic metadata enrichment (kubernetes/geoip/aws-shaped): broadcast
    left join; ``select_map`` renames dim columns into the record."""
    if select_map:
        keys = [on] if isinstance(on, str) else list(on)
        cols = [F.col(k) for k in keys] + [
            F.col(src).alias(dst) for src, dst in select_map.items()
        ]
        dim = dim.select(*cols)
    return df.join(F.broadcast(dim), on, how)


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "left",
) -> DataFrame:
    """Skew-safe equi-join for when the dimension is too large to
    broadcast AND the fact side's key distribution is skewed: the dim side
    is replicated ``salt`` times with a salt id, the big side picks a
    deterministic salt from its row content, and the join key becomes
    (key, salt) — a hot key's rows spread over ``salt`` reducers instead of
    one straggler.

    AQE's skew-join split (spark.sql.adaptive.skewJoin) handles most cases
    at runtime and should be preferred; explicit salting is for the
    AQE-ineligible shapes (e.g. a skewed key under a windowed agg pipeline
    where the join and agg must share partitioning). Deterministic salt =
    pmod(xxhash64(all big-side columns), salt) — reproducible on retry,
    unlike rand()."""
    if salt < 1:
        raise ValueError("salt must be >= 1")
    salted_dim = dim.crossJoin(
        F.broadcast(
            dim.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)).cast("int")
    )
    out = big_salted.join(salted_dim, [key, "__salt"], how)
    return out.drop("__salt")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 16.0,
    closed: str = "both",
    how: str = "inner",
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Generic bucketed range join: match each point to the interval(s)
    containing it — the geoip2 technique (geoip_ranges_bucketed above,
    plugins/filter_geoip2/geoip2.c:50-66 semantics) generalized to any
    numeric domain (IP ranges, value bands, time windows).

    Each interval explodes to the fixed-width buckets it spans, turning
    the range predicate into an EQUALITY join on the bucket plus a
    residual bound check — a hash join (broadcast when the interval table
    is dim-sized, shuffle otherwise), never a nested-loop over points x
    intervals. Pick ``bucket_width`` near the typical interval length so
    the explode factor stays a small constant.

    ``closed``: "both" (lo <= p <= hi), "left" (lo <= p < hi), or
    "right" (lo < p <= hi). Overlapping intervals emit one row per match.
    """
    if closed not in ("both", "left", "right"):
        raise ValueError(f"unknown closed mode {closed!r}")
    # only point-preserving joins are meaningful here: the interval side is
    # bucket-EXPLODED, so a right/full outer would emit one null-extended
    # row per unmatched (interval, bucket) pair — nonsense multiplicity.
    if how not in ("inner", "left", "leftouter", "left_outer", "semi",
                   "left_semi", "leftsemi", "anti", "left_anti", "leftanti"):
        raise ValueError(
            f"interval_join supports inner/left/left_semi/left_anti, got {how!r}"
        )
    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    b = intervals.withColumn(
        "__ibkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    if broadcast_intervals:
        b = F.broadcast(b)
    p = points.withColumn("__pbkt", F.floor(F.col(point_col) / w).cast("long"))
    pc = F.col(point_col)
    lo, hi = F.col(lo_col), F.col(hi_col)
    bound = {
        "both": (pc >= lo) & (pc <= hi),
        "left": (pc >= lo) & (pc < hi),
        "right": (pc > lo) & (pc <= hi),
    }[closed]
    # the residual bound lives IN the join condition: a post-join filter
    # would silently turn left joins into inner (null lo/hi -> NULL bound
    # -> row dropped) and discard semi/anti semantics entirely. A (point,
    # interval) pair can match on at most one bucket (the point's), so no
    # per-pair duplicates arise.
    cond = (F.col("__pbkt") == F.col("__ibkt")) & bound
    out = p.join(b, cond, how)
    return out.drop("__pbkt", "__ibkt")
