"""Data Selection via Importance Resampling (DSIR).

Xie et al. 2023 (arXiv:2302.03169): select raw-corpus documents whose
hashed-n-gram distribution looks like a small trusted target corpus.
Both corpora are featurized as bags of hashed word n-grams (unigrams +
bigrams -> B buckets); a bag-of-buckets model is fit on each side and
every raw document gets an importance log-weight

    log w(x) = sum_{gram in x} [ log p_target(bucket(gram))
                               - log p_raw(bucket(gram)) ]

with add-one smoothing over the B buckets. Selection is Gumbel top-k —
sampling without replacement proportional to w — with the Gumbel noise
derived from a Knuth multiplicative hash of the document id, so the
"randomness" is a pure function of the data and every engine (and the
DuckDB oracle) reproduces the exact same sample.

Scale shape (100 TB): the model is B floats (a broadcast table, never
driver-collected beyond two scalar totals); featurization is a
scan-speed explode; there is ONE shuffle per model build (groupBy
bucket, map-side combinable) and one per-doc aggregation keyed on
doc_id. No UDFs anywhere — the md5 bucket hash, the n-gram transform,
and the Gumbel key are all Catalyst expressions inside whole-stage
codegen.

Everything here is deterministic and SQL-replicable by construction:
bucket(gram) = int(md5(gram)[:8], 16) % B has the same value in Spark
(`conv(substring(md5(g),1,8),16,10)`), DuckDB (`('0x' || ...)::BIGINT`),
and Python — reproducible data selection is a feature, not just a test
convenience.

Reference parity note: the reference engine (fluent-bit) has no data
selection surface; this module is part of the training-data-pipeline
extension family (like dedup/decontam), grounded in the public DSIR
paper rather than a reference operator.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text
from .text import ngrams_of_words

__all__ = [
    "hashed_gram_buckets",
    "dsir_bucket_logratio",
    "dsir_weights",
    "dsir_select",
]


def _bucket(gram: Column, buckets: int) -> Column:
    """md5-prefix bucket hash, identical across engines (see module doc)."""
    return F.pmod(
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long"),
        F.lit(int(buckets)),
    )


def hashed_gram_buckets(
    text: Column, buckets: int = 1024, ns: tuple[int, ...] = (1, 2)
) -> Column:
    """Array of feature-bucket ids (one per n-gram OCCURRENCE — counts
    matter to the model, so no dedup) for the normalized text."""
    words = F.split(normalize_text(text), " ")
    words = F.filter(words, lambda w: w != "")
    grams = None
    for n in ns:
        g = words if n == 1 else ngrams_of_words(words, n)
        grams = g if grams is None else F.concat(grams, g)
    return F.transform(grams, lambda g: _bucket(g, buckets))


def _total_grams(
    frame: DataFrame, text_col: str, ns: tuple[int, ...]
) -> int:
    """Total n-gram occurrences across the frame, computed from word
    counts alone: a document with w words holds max(w-n+1, 0) n-grams
    per order — exactly what summing the exploded bucket counts yields,
    without the explode or the per-gram md5."""
    words = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda w: w != ""
    )
    sz = F.size(words)
    total = None
    for n in ns:
        t = F.when(sz >= n, sz - n + 1).otherwise(0)
        total = t if total is None else total + t
    return int(frame.agg(F.sum(total)).collect()[0][0] or 0)


def _doc_buckets(
    df: DataFrame, text_col: str, id_col: str | None, buckets: int,
    ns: tuple[int, ...],
) -> DataFrame:
    # two-step projection: materialize the word array before the gram
    # transforms — composing hashed_gram_buckets as ONE expression makes
    # every per-element access inside the lambdas re-run the
    # normalize/split regex (measured ~15x slower at sf0.1)
    from .text import ngrams_of_words

    ids = [F.col(id_col)] if id_col else []
    words = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda w: w != ""
    )
    base = df.select(*ids, words.alias("__ws"))
    ws = F.col("__ws")
    grams = None
    for n in ns:
        g = ws if n == 1 else ngrams_of_words(ws, n)
        grams = g if grams is None else F.concat(grams, g)
    return base.select(
        *ids,
        F.explode(F.transform(grams, lambda g: _bucket(g, buckets))).alias("bucket"),
    )


def dsir_bucket_logratio(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    buckets: int = 1024,
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """(bucket, logratio) model table: log p_target(b) - log p_raw(b),
    add-one smoothed over the B buckets. B rows — broadcast-sized by
    construction. Two scalar totals are the only driver state."""
    tc = _doc_buckets(target, text_col, None, buckets, ns).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("ct")
    )
    rc = _doc_buckets(raw, text_col, None, buckets, ns).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr")
    )
    # the two scalar totals are pure word-count arithmetic
    # (sum over docs of max(words-n+1, 0) per gram order — identically
    # the sum of the bucket counts), so they cost a scan-side aggregate
    # each instead of a full gram-explode + md5 pass per corpus
    nt = _total_grams(target, text_col, ns)
    nr = _total_grams(raw, text_col, ns)
    if nr <= 0:
        raise ValueError("raw corpus has no n-grams to model")
    dt, dr = float(nt + buckets), float(nr + buckets)
    # full outer on the two count frames: a bucket unseen on one side
    # still carries its smoothed mass. Both frames are <= B rows.
    return (
        tc.join(rc, "bucket", "full")
        .select(
            "bucket",
            (
                F.log((F.coalesce("ct", F.lit(0)) + 1) / F.lit(dt))
                - F.log((F.coalesce("cr", F.lit(0)) + 1) / F.lit(dr))
            ).alias("logratio"),
        )
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """Per-document importance log-weight under the hashed-n-gram model:
    (id_col, logw, n_grams) for every raw doc with >= 1 gram.

    One broadcast join (model side is B rows) + one groupBy(id) — the
    same two-shuffle shape as unigram_logprob; survives 100 TB because
    nothing scales with corpus size except the scan itself."""
    model = dsir_bucket_logratio(raw, target, text_col, buckets, ns)
    per_gram = _doc_buckets(raw, text_col, id_col, buckets, ns)
    return (
        per_gram.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("logratio").alias("logw"),
            F.count(F.lit(1)).alias("n_grams"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    ns: tuple[int, ...] = (1, 2),
    temperature: float = 1.0,
    gumbel: bool = True,
    length_normalize: bool = True,
) -> DataFrame:
    """Gumbel top-k importance resampling: keep the k raw docs with the
    largest logw/temperature + Gumbel(doc) key — i.e. sample without
    replacement proportional to w^(1/temperature) (Vieira 2014 Gumbel
    top-k trick), with the Gumbel noise a deterministic function of the
    doc id's md5 prefix (sign-safe and type-agnostic — string doc ids
    and ids beyond 2^32 hash the same way as small ints, with no NULL
    or overflow path):
    u = (int(md5(str(id))[:8], 16) + 0.5) / 2^32,  g = -ln(-ln(u)).
    gumbel=False degrades to plain top-k by weight.

    ``length_normalize`` scores by mean (not summed) gram log-ratio so
    long documents don't dominate purely by token count — the summed
    form is the paper's, the normalized form is the practical default.

    The selection key is rounded to 6 decimals with the doc id as the
    tiebreak, making the chosen SET identical across engines and run
    orders (float summation order varies; the rounding absorbs it).

    Returns (id_col, score, rank), rank 1..k.
    """
    if k is None:
        # a rank over the full corpus would funnel everything through one
        # task — use dsir_weights directly for unranked scoring.
        raise ValueError(
            "k must be an int; for unranked per-doc scores use dsir_weights()"
        )
    w = dsir_weights(raw, target, text_col, id_col, buckets, ns)
    base = (F.col("logw") / F.col("n_grams")) if length_normalize else F.col("logw")
    score = base / F.lit(float(temperature))
    if gumbel:
        # md5-prefix uniform: same cross-engine trick as _bucket — works
        # for string ids, never NULL, never overflows (8 hex chars < 2^32).
        u = (
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
            ).cast("long")
            + F.lit(0.5)
        ) / F.lit(4294967296.0)
        score = score + -F.log(-F.log(u))
    from pyspark.sql import Window

    scored = w.select(id_col, F.round(score, 6).alias("score"))
    # sort+limit compiles to TakeOrderedAndProject — per-partition
    # partial top-k, no single-partition global sort; the rank window
    # then runs over only k rows.
    scored = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(int(k))
    return scored.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("score").desc(), F.col(id_col))),
    )
