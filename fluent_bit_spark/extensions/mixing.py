"""Domain mixing for training-data assembly: deterministic per-domain
sampling and temperature-based weight derivation.

A pretraining corpus is drawn from heterogeneous sources at configured
rates ("mixing weights"). Two pieces:

- ``domain_mix``: keep each row with a per-domain probability, decided by
  a portable multiplicative hash of the row id (Knuth 2654435761) — fully
  deterministic, reproducible across engines, and expressible in plain SQL
  for the oracle gate. No RNG state, no sampleBy nondeterminism.
- ``mix_weights_temperature``: the multilingual temperature rule
  (p_d proportional to n_d^tau, as published for mBERT/XLM-R/mT5):
  converts observed domain counts into keep-rates that flatten the domain
  distribution, normalized so the most-upweighted domain keeps rate 1.0.
  Rates > 1 for tiny domains mean "repeat" — reported, and clamped to 1
  by the sampling step (epoch repetition is a separate concern).

Scale shape: domain_mix is a stateless filter expression (scan-speed, no
shuffle); mix_weights_temperature is one groupBy over domains plus two
scalar aggregates broadcast back — domain cardinality is tiny by
definition, so the cross joins are single-row broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH_MULT = 2654435761
DEFAULT_MODULUS = 10000


def deterministic_keep(
    id_col: str | Column, rate: Column, modulus: int = DEFAULT_MODULUS
) -> Column:
    """True for ~rate of rows, decided by (id * 2654435761) mod modulus —
    the same portable multiplicative-hash thinning used by the sampling
    operator (operators/sampling.py)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    # exact modular arithmetic, not a raw product: ids past ~3.47e9
    # overflow id*KNUTH — an ANSI session ABORTS the job, a non-ANSI
    # one wraps negative and the signed % then kept the row at EVERY
    # rate (even 0.0). (a*b) mod m == ((a mod m)*(b mod m)) mod m, and
    # the reduced product tops out around 5.8e7 — same values as
    # before for every non-overflowing id, and identical to the
    # arbitrary-precision arithmetic other engines (the DuckDB oracle)
    # compute (r12 review)
    return F.pmod(
        F.pmod(c, F.lit(modulus)) * F.lit(KNUTH_MULT % modulus),
        F.lit(modulus),
    ) < F.round(rate * modulus).cast("long")


def domain_mix(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    modulus: int = DEFAULT_MODULUS,
) -> DataFrame:
    """Per-domain deterministic downsampling: row kept iff its id-hash
    falls under its domain's rate. Rates clamp to [0, 1]."""
    rate = F.lit(float(min(max(default_rate, 0.0), 1.0)))
    for dom, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == dom, float(min(max(r, 0.0), 1.0))).otherwise(rate)
    return df.filter(deterministic_keep(id_col, rate, modulus))


def mix_weights_temperature(
    df: DataFrame, strata_col: str, tau: float = 0.7
) -> DataFrame:
    """Observed domain counts -> temperature-flattened keep rates.

    q_d = n_d^tau / sum(n^tau) is the target mixture; the keep rate is
    (q_d / p_d) scaled so its maximum is 1 (sampling can only thin).
    Returns (strata, n, p_obs, p_target, keep_rate)."""
    counts = df.groupBy(F.col(strata_col).alias("strata")).agg(F.count("*").alias("n"))
    tots = counts.agg(
        F.sum("n").alias("__tot"),
        F.sum(F.pow(F.col("n").cast("double"), tau)).alias("__tot_pow"),
    )
    scored = counts.crossJoin(F.broadcast(tots)).select(
        "strata",
        "n",
        (F.col("n") / F.col("__tot")).alias("p_obs"),
        (F.pow(F.col("n").cast("double"), tau) / F.col("__tot_pow")).alias("p_target"),
    )
    max_ratio = scored.agg(F.max(F.col("p_target") / F.col("p_obs")).alias("__mx"))
    return scored.crossJoin(F.broadcast(max_ratio)).select(
        "strata",
        "n",
        "p_obs",
        "p_target",
        ((F.col("p_target") / F.col("p_obs")) / F.col("__mx")).alias("keep_rate"),
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    bucket_expr: Column | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in exactly
    one named split with probability proportional to its weight, decided
    by a hash of its id — shuffle-free, reproducible across runs and
    cluster sizes (no rand(), no sampling state), and stable under
    re-partitioning, which is what makes the split usable as a corpus
    CONTRACT (a doc never migrates between train and test when data is
    re-laid-out).

    ``bucket_expr`` overrides the default xxhash64 bucket with a custom
    [0, 1) double (e.g. the Knuth multiplicative hash used by the driver
    query so other engines can reproduce the assignment exactly).

    Rows with a NULL id are DROPPED (default bucket only): xxhash64 of
    NULL is a seed-derived CONSTANT, so they would otherwise all land
    deterministically in one split and skew its proportion — give rows
    a surrogate id first if that matters (stratified_sample documents
    the same policy).
    """
    if not weights:
        raise ValueError("weights must be a non-empty {name: weight} dict")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    if bucket_expr is None:
        df = df.filter(F.col(id_col).isNotNull())
        bucket_expr = (
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(1_000_000)) / 1_000_000.0
        )
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = bucket_expr < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn(out_col, expr)


def cap_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    n: int,
    salt: int = 1,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Keep at most ``n`` rows per key, chosen by ascending ``order_cols``
    — the Common-Crawl "cap documents per domain" stage (and any other
    per-entity quota: per-user samples, per-source docs).

    Scale shape: the naive form is one global window, which shuffles the
    ENTIRE corpus on the key and funnels each hot key through a single
    task. This form first finds the over-cap keys with a map-side
    combinable count (over-cap keys are FEW by definition — a cap exists
    because most keys are small), broadcasts that key set, passes
    under-cap rows through shuffle-free, and ranks ONLY the over-cap
    subset.

    Hot keys: even the over-cap-only ranking funnels each key through
    one task. ``salt`` > 1 runs a salted two-phase top-n — phase 1 keeps
    n rows per (key, hash-salt) slice, spreading a hot key across
    ``salt`` tasks and bounding phase 2's input at salt*n rows per key
    (global top-n is always contained in the union of slice top-ns).
    ``salt_cols`` names the columns the salt hashes (default: every
    hashable column — map-typed columns are skipped since xxhash64
    rejects them, and hashing huge payload columns is wasted work when a
    unique id column is available to name here).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    from pyspark.sql import Window

    over_keys = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") > n)
        .select(*key_cols)
    )
    under = df.join(F.broadcast(over_keys), key_cols, "left_anti")
    over = df.join(F.broadcast(over_keys), key_cols, "left_semi")
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    if salt > 1:
        pre = Window.partitionBy(
            *key_cols, "__salt"
        ).orderBy(*[F.col(c) for c in order_cols])
        # salt hashes beyond order_cols alone: a low-cardinality order
        # column (5 quality bands) would collapse a hot key into at most
        # 5 slices — exactly the skew case the salt exists for. Default
        # to every hashable column; xxhash64 rejects map types.
        if salt_cols is None:
            from pyspark.sql.types import ArrayType, MapType, StructType

            def map_free(dt) -> bool:
                # xxhash64 rejects maps ANYWHERE in the type, not just
                # top level (array<map<...>> fails at plan time)
                if isinstance(dt, MapType):
                    return False
                if isinstance(dt, ArrayType):
                    return map_free(dt.elementType)
                if isinstance(dt, StructType):
                    return all(map_free(f.dataType) for f in dt.fields)
                return True

            salt_cols = [
                f.name for f in over.schema.fields if map_free(f.dataType)
            ]
            if not salt_cols:
                raise ValueError(
                    "no hashable columns for salting; pass salt_cols"
                )
        over = (
            over.withColumn(
                "__salt",
                F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt)),
            )
            .withColumn("__prn", F.row_number().over(pre))
            .filter(F.col("__prn") <= n)
            .drop("__salt", "__prn")
        )
    capped = (
        over.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
    return under.unionByName(capped)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    seed: str = "strat",
) -> DataFrame:
    """Deterministic per-stratum sampling — the label-balancing /
    domain-rebalancing primitive (keep 10% of web, 100% of books, ...).
    Unlike DataFrame.sampleBy, membership is a PURE FUNCTION of
    (id, seed): re-runs, re-partitions, and other engines reproduce the
    same sample exactly (md5-prefix uniform, the dsir_select technique).
    Strata not named in ``fractions`` keep ``default_fraction``.

    Scale shape: one stateless projection + filter; the fractions map is
    a literal CASE expression. No shuffle, no sampling state. Rows with a
    NULL id hash to NULL and are dropped (same policy as hash_split's
    xxhash bucket; give rows a surrogate id first if that matters)."""
    for s, f in fractions.items():
        if not (0.0 <= f <= 1.0):
            raise ValueError(f"fraction for {s!r} must be in [0, 1]")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + seed))),
                1, 8,
            ), 16, 10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    frac = None
    for s, f in fractions.items():
        cond = F.col(strata_col) == s
        frac = F.when(cond, f) if frac is None else frac.when(cond, f)
    frac = (
        F.lit(float(default_fraction)) if frac is None
        else frac.otherwise(float(default_fraction))
    )
    return df.filter(u < frac)


def token_budget_select(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    budget: int,
    token_col: str = "n_tokens",
    budgets: dict[str, int] | None = None,
) -> DataFrame:
    """Greedy token-budget realization: per ``key_col`` value, walk rows
    in ascending ``order_cols`` (the priority — put "best first" there)
    and keep rows until the key's token budget is reached. This is the
    stage that turns mixture WEIGHTS (domain_mix / mix_weights_temperature
    emit target token shares) into an actual document selection.

    The row that crosses the budget is INCLUDED (selection is the minimal
    priority-prefix whose token sum reaches the budget), so every key
    with enough supply meets its budget exactly-or-just-over; keys with
    less supply keep everything. ``budgets`` overrides the scalar
    ``budget`` for named key values. ``order_cols`` must totally order
    rows within a key (include a unique id as the last column) or the
    selection is not reproducible.

    Scale shape (the cap_per_key discipline): a map-side-combinable
    per-key token sum finds the over-budget keys first — broadcast that
    (few by definition: budgets exist because most keys exceed nothing),
    pass under-budget keys through shuffle-free, and run the prefix-sum
    window ONLY over the over-budget subset. The window funnels each
    over-budget key through one task; its input is that key's full row
    set, so pre-cap pathological hot keys with cap_per_key (salted) when
    a per-row token floor gives you a safe count bound."""
    if budget < 0 or (budgets and any(b < 0 for b in budgets.values())):
        raise ValueError("budgets must be >= 0")
    from pyspark.sql import Window

    bexpr = None
    for k, b in (budgets or {}).items():
        cond = F.col(key_col) == k
        bexpr = F.when(cond, b) if bexpr is None else bexpr.when(cond, b)
    bexpr = (
        F.lit(int(budget)) if bexpr is None else bexpr.otherwise(int(budget))
    ).cast("long")

    over_keys = (
        df.groupBy(key_col)
        .agg(F.sum(F.col(token_col).cast("long")).alias("__tot"))
        .filter(F.col("__tot") > bexpr)
        .select(key_col)
    )
    under = df.join(F.broadcast(over_keys), key_col, "left_anti")
    over = df.join(F.broadcast(over_keys), key_col, "left_semi")
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.col(c) if isinstance(c, str) else c for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    kept = (
        over.withColumn(
            "__before", F.coalesce(F.sum(F.col(token_col).cast("long")).over(w), F.lit(0))
        )
        .filter(F.col("__before") < bexpr)
        .drop("__before")
    )
    return under.unionByName(kept)


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    seed: str = "shuffle",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic corpus reshuffle for training order: every row gets
    a (shard, pos) — shard from the md5-prefix of (id:seed) mod
    ``n_shards``, pos from the rank of the FULL md5 digest within the
    shard. The placement is a pure function of (id, seed): re-runs,
    re-partitions, and other engines (the DuckDB oracle replays it
    verbatim) produce the identical permutation, unlike
    ``df.orderBy(rand())``. A trainer reads shards in index order and
    rows in pos order to consume a reproducible global shuffle.

    Scale shape: one shuffle keyed on shard; pos is a keyed row_number,
    so each shard ranks in a single task — size ``n_shards`` so a shard
    fits a task (shards are normally file-sized: tens of thousands at
    100 TB, which also spreads the rank work wide). No global sort."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from pyspark.sql import Window

    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + seed)))
    out = df.withColumn("__h", h).withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring(F.col("__h"), 1, 8), 16, 10).cast("long"),
            F.lit(n_shards),
        ).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        out.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("__h")
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    out_col: str = "split",
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Leakage-safe train/val/test: near-dup PAIRS are resolved to
    transitive components first, and split membership hashes the
    COMPONENT id — so two near-duplicate docs can never land on opposite
    sides of a train/test boundary, the eval-leakage failure mode of
    id-hashed splits (Lee et al. 2022 measure exactly this: test-set
    near-dups of training docs inflate eval scores).

    ``pairs`` is any (id_a, id_b) near-dup edge list (MinHash banding +
    Jaccard verify, embedding threshold, URL-canonical match). Unpaired
    docs are their own singleton component and split exactly as
    `hash_split` would. Adds (component, split) to ``df``'s columns.

    Scale shape: connected_components' alternating star rounds over the
    EDGE LIST only (edge set star-ifies and shrinks per round; edges are
    few in a mostly-unique corpus), one join to attach components, then
    a pure projection. ``bucket_expr`` as in hash_split — pass the Knuth bucket
    over ``component`` for cross-engine replay."""
    from fluent_bit_spark.extensions.graph import dedup_clusters

    comp = dedup_clusters(df, pairs, id_col)
    return hash_split(
        comp.drop("is_representative"),
        weights,
        id_col="component",
        out_col=out_col,
        bucket_expr=bucket_expr,
    )
