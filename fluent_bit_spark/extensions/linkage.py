"""Record linkage: trigram-similarity fuzzy string join (pg_trgm-style).

Joins two tables on DIRTY string keys — misspelled names, re-ordered
words, punctuation drift — by character-trigram Jaccard similarity.
The classic entity-resolution primitive the exact-key joins elsewhere
in the engine can't express.

Spark-first shape (filter-verify):

- Gram extraction is pure Catalyst: normalize, pad, then
  ``transform(sequence(...), i -> substr(p, i, 3))`` — no Python in the
  scan.
- Candidate generation: explode grams on both sides and join on the
  gram — ONE shuffle keyed by gram. By default only each record's
  PREFIX (its globally-rarest ``m - ceil(t*m) + 1`` grams) joins: the
  AllPairs/PPJoin prefix filter, exact for Jaccard >= t, which stops
  hot grams from driving f² candidate fan-out. An optional
  ``max_gram_df`` additionally drops stop-grams outright (lossy skew
  cap for adversarial corpora, like the MinHash bucket cap in
  dedup.py).
- Verification is EXACT regardless of candidate pruning: surviving
  (left, right) pairs re-join to the full distinct-gram arrays and
  score ``|A ∩ B| / |A ∪ B|`` via ``array_intersect`` — a wrong
  similarity is never reported.

At 100 TB: the gram-keyed shuffle carries (gram, id) pairs — a few
dozen bytes per gram; the wide text never shuffles. Candidate count,
not corpus size, drives the verify join; the prefix filter keeps
candidates near-linear, and ``gram_n`` is the blocking-selectivity
knob — raise it (or block on word tokens) once the corpus outgrows
the q-gram space (see char_trigrams).

Reference context: fluent-bit has no fuzzy join (extension surface);
trigram semantics follow the PostgreSQL pg_trgm module's public
definition (lowercased, non-alphanumeric collapsed, padded, char
3-grams, set Jaccard), simplified to whole-string padding so the
DuckDB oracle replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def char_trigrams(col: Column, n: int = 3) -> Column:
    """Distinct character q-grams (default 3) of the normalized,
    padded string.

    Normalization: lowercase, collapse runs of non-alphanumerics to a
    single space, trim; pad with n-1 leading and one trailing space
    (pg_trgm-style whole-string padding). Empty-after-normalization
    strings yield the single all-space gram.

    The q-gram length is the blocking-feature knob at scale: gram
    blocking only stays selective while the gram space exceeds the
    corpus size (36^3 = 46k trigrams vs millions of rows means every
    gram is hot no matter how it is ordered), so corpora beyond ~10^4
    keys should raise n (n=5 spans 60M grams) or block on word tokens.
    """
    p = F.concat(F.lit(" " * (n - 1)), _norm(col), F.lit(" "))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.char_length(p) - F.lit(n - 1)),
            lambda i: F.substr(p, i, F.lit(n)),
        )
    )


def _gram_side(df: DataFrame, id_col: str, key_col: str, tag: str, n: int = 3):
    """(id, grams, n) keyed table + exploded (gram, id) table, with
    side-tagged column names so self-joins never hit Spark's ambiguous
    lineage resolution."""
    keyed = (
        df.where(F.char_length(_norm(F.col(key_col).cast("string"))) > 0)
        .select(
            F.col(id_col).alias(f"__{tag}id"),
            char_trigrams(F.col(key_col), n).alias(f"__{tag}grams"),
        )
        .withColumn(f"__{tag}n", F.size(f"__{tag}grams"))
    )
    grams = keyed.select(f"__{tag}id", F.explode(f"__{tag}grams").alias("__gram"))
    return keyed, grams


def _prefix_grams(grams: DataFrame, keyed: DataFrame, dfmap: DataFrame, tag: str, threshold: float) -> DataFrame:
    """Keep each record's ``m - ceil(t*m) + 1`` globally-rarest grams
    (prefix filter, Bayardo et al., "Scaling Up All Pairs Similarity
    Search", WWW'07): any pair with Jaccard >= t must share a gram
    inside both prefixes, so joining on prefixes alone is complete."""
    from pyspark.sql import Window

    w = Window.partitionBy(f"__{tag}id").orderBy("__df", "__gram")
    return (
        grams.join(dfmap, "__gram")
        .withColumn("__prefix_rank", F.row_number().over(w))
        .join(
            keyed.select(f"__{tag}id", f"__{tag}n"), f"__{tag}id"
        )
        .where(
            F.col("__prefix_rank")
            <= F.col(f"__{tag}n")
            - F.ceil(F.lit(float(threshold)) * F.col(f"__{tag}n"))
            + 1
        )
        .select(f"__{tag}id", "__gram")
    )


def fuzzy_join_trigram(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_key: str,
    right_id: str,
    right_key: str,
    threshold: float = 0.6,
    max_gram_df: int | None = None,
    prefix_filter: bool = True,
    gram_n: int = 3,
) -> DataFrame:
    """Trigram-Jaccard fuzzy join: rows whose keys share >= threshold.

    Returns (left_id, right_id, sim) for every pair with
    ``jaccard(trigrams(left_key), trigrams(right_key)) >= threshold``.
    Output id columns are prefixed ``l_``/``r_`` when the two id names
    collide. Rows whose key normalizes to the empty string are dropped.

    ``prefix_filter`` (default True): candidate generation joins only
    each record's ``m - ceil(t*m) + 1`` globally-RAREST grams (rarity =
    document frequency over both sides) — the AllPairs/PPJoin prefix
    filter, which is EXACT for Jaccard >= threshold: every qualifying
    pair is guaranteed to collide on some prefix gram, while hot grams
    (shared by thousands of rows) stop driving f² candidate fan-out
    unless a record has nothing rarer. This is what keeps candidates
    near-linear as the corpus grows; costs one extra df aggregation and
    a per-record rank shuffle.

    ``max_gram_df``: additionally drop grams whose COMBINED document
    frequency (left side + right side) exceeds this value from
    candidate generation — a LOSSY skew cap for adversarial corpora
    where even prefixes stay hot (e.g. near-identical keys everywhere).
    Verification stays exact, so reported similarities are always true
    Jaccard; pairs whose shared grams are all stop-grams are missed
    (recall knob). Default None.
    """
    lk, lg = _gram_side(left, left_id, left_key, "l", gram_n)
    rk, rg = _gram_side(right, right_id, right_key, "r", gram_n)
    if prefix_filter or max_gram_df is not None:
        dfmap = (
            lg.select(F.col("__gram"))
            .unionAll(rg.select("__gram"))
            .groupBy("__gram")
            .agg(F.count(F.lit(1)).alias("__df"))
        )
    if max_gram_df is not None:
        hot = dfmap.where(F.col("__df") > max_gram_df).select("__gram")
        # broadcast anti-join: the stop-gram list is tiny by definition
        lg = lg.join(F.broadcast(hot), "__gram", "left_anti")
        rg = rg.join(F.broadcast(hot), "__gram", "left_anti")
    if prefix_filter:
        lg = _prefix_grams(lg, lk, dfmap, "l", threshold)
        rg = _prefix_grams(rg, rk, dfmap, "r", threshold)
    cand = lg.join(rg, "__gram").select("__lid", "__rid").distinct()
    common = F.size(F.array_intersect(F.col("__lgrams"), F.col("__rgrams")))
    sim = common.cast("double") / (F.col("__ln") + F.col("__rn") - common)
    out_l = left_id if left_id != right_id else f"l_{left_id}"
    out_r = right_id if left_id != right_id else f"r_{right_id}"
    return (
        cand.join(lk, "__lid")
        .join(rk, "__rid")
        .select(
            F.col("__lid").alias(out_l),
            F.col("__rid").alias(out_r),
            sim.alias("sim"),
        )
        .where(F.col("sim") >= F.lit(float(threshold)))
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_key: str,
    right_id: str,
    right_key: str,
    max_dist: int = 1,
    gram_n: int = 3,
) -> DataFrame:
    """Edit-distance join: pairs whose NORMALIZED keys are within
    ``max_dist`` Levenshtein edits (EDJoin shape — Xiao, Wang & Lin,
    "Ed-Join: an efficient algorithm for similarity joins with edit
    distance constraints", VLDB'08).

    Candidates: one edit destroys at most ``gram_n`` q-grams, so two
    keys within k edits differ in at most ``k*gram_n`` set q-grams —
    any qualifying pair must collide inside both records' first
    ``k*gram_n + 1`` globally-rarest grams. That bound is vacuous for
    SHORT keys (fewer than ``k*gram_n`` grams), which a pairwise join
    of distinct short keys completes (see inline comment); together
    with the length filter (lengths within k) the candidate set is
    complete; verification is the
    built-in ``levenshtein`` on the normalized keys (JVM-side), so a
    wrong distance is never reported. Same scale shape as
    ``fuzzy_join_trigram``: gram-keyed candidate shuffle, nothing
    quadratic beyond true candidates.

    Normalization matches the trigram join (lowercase, collapse runs of
    non-alphanumerics to one space, trim); empty keys are dropped.
    Output: (left_id, right_id, dist), ids prefixed ``l_``/``r_`` when
    the names collide.
    """
    from pyspark.sql import Window

    prefix_len = max_dist * gram_n + 1

    def side(df: DataFrame, id_col: str, key_col: str, tag: str):
        keyed = (
            df.where(F.char_length(_norm(F.col(key_col).cast("string"))) > 0)
            .select(
                F.col(id_col).alias(f"__{tag}id"),
                _norm(F.col(key_col)).alias(f"__{tag}key"),
                char_trigrams(F.col(key_col), gram_n).alias(f"__{tag}grams"),
            )
        )
        grams = keyed.select(
            f"__{tag}id", F.explode(f"__{tag}grams").alias("__gram")
        )
        return keyed.drop(f"__{tag}grams"), grams

    lk, lg = side(left, left_id, left_key, "l")
    rk, rg = side(right, right_id, right_key, "r")
    dfmap = (
        lg.select(F.col("__gram"))
        .unionAll(rg.select("__gram"))
        .groupBy("__gram")
        .agg(F.count(F.lit(1)).alias("__df"))
    )

    def prefix(grams: DataFrame, tag: str) -> DataFrame:
        w = Window.partitionBy(f"__{tag}id").orderBy("__df", "__gram")
        return (
            grams.join(dfmap, "__gram")
            .withColumn("__prefix_rank", F.row_number().over(w))
            .where(F.col("__prefix_rank") <= prefix_len)
            .select(f"__{tag}id", "__gram")
        )

    cand = prefix(lg, "l").join(prefix(rg, "r"), "__gram").select(
        "__lid", "__rid"
    ).distinct()
    # SHORT keys escape the count-filter bound: with |G(x)| <= k*q the
    # "differ in at most k*q grams" guarantee is vacuous and a
    # qualifying pair can share ZERO grams ('ab' vs 'cb' at k=1, q=3 —
    # disjoint padded trigram sets, distance 1). Any such pair has both
    # keys within k*q + k characters, so complete the candidate set
    # with the pairwise join of DISTINCT short keys — the quadratic
    # piece runs on the value space (bounded by the tiny-string
    # alphabet), never on row counts; ids map back by key equality.
    short_len = max_dist * gram_n + max_dist
    ls = lk.where(F.char_length("__lkey") <= short_len)
    rs = rk.where(F.char_length("__rkey") <= short_len)
    skeys = ls.select("__lkey").distinct().join(
        F.broadcast(rs.select("__rkey").distinct()),
        (F.abs(F.char_length("__lkey") - F.char_length("__rkey"))
         <= F.lit(max_dist))
        & (F.levenshtein("__lkey", "__rkey") <= F.lit(max_dist)),
    )
    short_cand = (
        ls.join(skeys, "__lkey").join(rs, "__rkey")
        .select("__lid", "__rid")
    )
    cand = cand.unionByName(short_cand).distinct()
    out_l = left_id if left_id != right_id else f"l_{left_id}"
    out_r = right_id if left_id != right_id else f"r_{right_id}"
    return (
        cand.join(lk, "__lid")
        .join(rk, "__rid")
        .where(
            F.abs(F.char_length("__lkey") - F.char_length("__rkey"))
            <= F.lit(max_dist)
        )
        .select(
            F.col("__lid").alias(out_l),
            F.col("__rid").alias(out_r),
            F.levenshtein("__lkey", "__rkey").alias("dist"),
        )
        .where(F.col("dist") <= F.lit(max_dist))
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    key_col: str,
    threshold: float = 0.6,
    max_gram_df: int | None = None,
    max_iter: int = 20,
    gram_n: int = 3,
) -> DataFrame:
    """End-to-end entity resolution: rows whose keys are transitively
    trigram-similar share one canonical ``entity_id``.

    Composition of the engine's existing primitives — fuzzy self-join
    for the similarity edge list, then hash-min connected components
    (``graph.connected_components``: large-star/small-star, checkpointed
    lineage) so A~B and B~C land in one entity even when A and C are
    below threshold themselves. ``entity_id`` is the minimum member id;
    rows with no similar partner (or an empty normalized key) map to
    themselves. Same scale shape as its parts: gram-keyed candidate
    shuffle + per-round keyed label joins, nothing quadratic beyond the
    candidate pairs ``max_gram_df`` bounds.
    """
    from .graph import connected_components

    pairs = fuzzy_join_trigram(
        df, df, id_col, key_col, id_col, key_col,
        threshold=threshold, max_gram_df=max_gram_df, gram_n=gram_n,
    )
    lcol, rcol = f"l_{id_col}", f"r_{id_col}"
    pairs = pairs.where(F.col(lcol) < F.col(rcol))
    comp = connected_components(pairs, lcol, rcol, max_iter=max_iter)
    return (
        df.select(F.col(id_col))
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("entity_id"),
        )
    )
