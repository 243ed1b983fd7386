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
