"""Benchmark decontamination: remove or flag training documents that
overlap a held-out evaluation set.

The standard procedure (as published for GPT-3, PaLM, and Llama data
pipelines): build the set of word n-grams (n typically 8-13) occurring in
any benchmark document; a training doc is contaminated when it shares at
least ``min_hits`` distinct n-grams with that set.

Scale shape: the benchmark side is tiny relative to the corpus (thousands
of eval prompts vs billions of docs), so its distinct-gram set is
broadcast; the corpus side is one explode + semi-join-shaped aggregation —
no corpus-side self-shuffle beyond the per-doc hit count, keyed by doc id.
Everything is Catalyst expressions, fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.extensions.dedup import normalize_text
from fluent_bit_spark.extensions.text import ngrams_of_words


def _distinct_grams(df: DataFrame, text_col: str, n: int, keep: list[str]):
    """Per-row distinct n-grams, with the words array materialized in its
    own projection so the gram lambda does element access only (see
    ngrams_of_words)."""
    staged = df.select(
        *keep, F.split(normalize_text(F.col(text_col)), " ").alias("__words")
    )
    return staged.select(
        *keep,
        F.explode(F.array_distinct(ngrams_of_words(F.col("__words"), n))).alias("gram"),
    )


def contamination_grams(bench: DataFrame, text_col: str = "text", n: int = 8) -> DataFrame:
    """Distinct word n-grams across the benchmark set (the blocklist)."""
    return _distinct_grams(bench, text_col, n, keep=[]).distinct()


def fuzzy_decontaminate(
    df: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    num_hashes: int = 32,
    num_bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """NEAR-duplicate decontamination (the GPT-3-style fuzzy variant):
    drop training docs that are near-copies of any benchmark doc even
    when no long exact n-gram survives (paraphrase, reflowed whitespace,
    light edits). Exact-overlap decontamination (:func:`decontaminate`)
    misses these; this catches them via MinHash banding between the
    corpus and the benchmark side, then exact shingle-Jaccard
    verification of the candidates only.

    Scale shape: signatures are one map-side Arrow pass per side; the
    band join is corpus x bench on (band, band-hash) — the bench side is
    eval-set-sized and broadcast, so the corpus never self-shuffles; the
    exact-Jaccard verify touches candidates only. Returns the KEPT
    corpus rows.
    """
    from fluent_bit_spark.extensions.dedup import (
        band_buckets,
        minhash_signatures,
        with_shingle_hashes,
    )

    if num_bands > num_hashes:
        # bands past the signature end hash an EMPTY slice to one shared
        # constant, joining every corpus row to every bench row — the
        # candidate set collapses into an all-pairs Jaccard join
        raise ValueError(
            f"fuzzy_decontaminate: num_bands={num_bands} exceeds "
            f"num_hashes={num_hashes}"
        )

    def bands_of(sig_df, idc):
        # dedup.band_buckets IS this banding (same slice/xxhash64/
        # explode); sig_len passed so no probe job runs
        return band_buckets(
            sig_df, id_col=idc, num_bands=num_bands, sig_len=num_hashes
        )

    csig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    # bench id = content hash, NOT monotonically_increasing_id: the bench
    # frame is referenced by two plan subtrees (signatures + verify
    # shingles), and a nondeterministic id can differ between their
    # evaluations, silently unpairing candidates from their texts
    bench_ids = bench.select(
        F.xxhash64(F.col(text_col)).alias("__bid"), F.col(text_col)
    ).dropDuplicates(["__bid"])
    bsig = minhash_signatures(bench_ids, text_col, "__bid", num_hashes, shingle_n)
    cands = (
        bands_of(csig, id_col)
        .join(F.broadcast(bands_of(bsig, "__bid")), ["band", "bh"])
        .select(id_col, "__bid")
        .distinct()
    )
    # exact verify: shingle Jaccard between candidate (corpus, bench) pairs
    csh = with_shingle_hashes(
        df.join(F.broadcast(cands.select(id_col).distinct()), id_col, "left_semi"),
        text_col, "sh_c", shingle_n, keep=[id_col],
    )
    bsh = with_shingle_hashes(bench_ids, text_col, "sh_b", shingle_n, keep=["__bid"])
    inter = F.size(F.array_intersect("sh_c", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_c", "sh_b")).cast("double")
    contaminated = (
        cands.join(csh, id_col)
        .join(F.broadcast(bsh), "__bid")
        .filter(
            F.when(union > 0, inter / union).otherwise(F.lit(0.0))
            >= jaccard_threshold
        )
        .select(id_col)
        .distinct()
    )
    return df.join(contaminated, id_col, "left_anti")


def decontaminate(
    df: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Tag corpus docs by benchmark overlap: adds ``contam_hits`` (distinct
    shared n-grams) and ``contaminated``. Filter on ``~contaminated`` for
    the cleaning pass; keeping the flag makes audits and threshold sweeps
    cheap."""
    grams = contamination_grams(bench, text_col, n)
    corpus = _distinct_grams(df, text_col, n, keep=[id_col])
    hits = (
        corpus.join(F.broadcast(grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("contam_hits"))
    )
    return (
        df.join(hits, id_col, "left")
        .withColumn("contam_hits", F.coalesce("contam_hits", F.lit(0)))
        .withColumn("contaminated", F.col("contam_hits") >= min_hits)
    )
