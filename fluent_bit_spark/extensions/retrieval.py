"""Lexical retrieval: exact BM25 top-k over the corpus.

The search-engine side of similarity: embeddings cover semantic ANN
(extensions/similarity.py); BM25 (Robertson & Spärck Jones probabilistic
relevance framework, the Okapi BM25 formulation) covers the lexical
match a RAG or eval-harness pipeline needs. Everything is exact Catalyst
arithmetic — no sampling, no UDFs — so the DuckDB oracle replays scores
bit-for-bit (after the usual round()).

Scale shape (100 TB):
- the document-term frame is ONE explode + map-side-combinable
  groupBy(doc_id, term) — the same shape as unigram_counts;
- document frequencies reduce to a vocab-sized table; only QUERY terms
  are kept (semi-join against the broadcast query vocabulary) so the
  df/idf table is query-vocabulary-sized, then broadcast;
- scoring joins doc terms to the broadcast query-term/idf table (no
  corpus shuffle) and aggregates per (query, doc) — one shuffle keyed by
  (query_id, doc_id), uniform;
- top-k per query is a rank over each query's candidate set (docs
  sharing >= 1 term), partitioned by query_id — never a global sort.

Reference parity note: fluent-bit has no retrieval surface; this module
belongs to the training-data/eval extension family (like dedup/DSIR),
implementing the published BM25 formula (k1/b defaults from the Okapi
literature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalize_text

__all__ = ["doc_term_freqs", "bm25_topk"]


def doc_term_freqs(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(id, term, tf, dl): term frequencies and document length (token
    count) per document. One explode + one combinable shuffle."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    return tf.join(dl, id_col)


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents per query under BM25:

        score(q, d) = sum_{t in q∩d} idf(t) * tf * (k1+1)
                      / (tf + k1 * (1 - b + b * dl/avgdl))
        idf(t) = ln( (N - df + 0.5) / (df + 0.5) + 1 )   [Lucene form,
                 always positive]

    Repeated query terms count once (set semantics — the standard
    formulation). Returns (query_id, doc_id, score, rank), rank 1..<=k,
    ties broken by ascending doc id so results are deterministic.

    ``queries`` is expected to be eval/query-set-sized (thousands):
    its distinct term set broadcasts; the corpus never shuffles on text.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    # ONE setup job for both driver scalars (N and avgdl): dl is
    # computable per-row from the token split, so a single scan-only
    # aggregate replaces the former count() + distinct+avg pair of jobs
    toks = F.split(normalize_text(F.col(text_col)), " ")
    dl0 = F.size(F.filter(toks, lambda t: t != ""))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.when(dl0 > 0, dl0)).alias("avgdl"),
    ).collect()[0]
    n_docs, avgdl = stats["n"], stats["avgdl"]
    if n_docs == 0:
        raise ValueError("empty corpus")
    if avgdl is None:
        raise ValueError("corpus has no tokens")

    dtf = doc_term_freqs(docs, text_col, id_col)

    qterms = (
        queries.select(
            F.col(query_id_col),
            F.explode(
                F.array_distinct(
                    F.split(normalize_text(F.col(query_text_col)), " ")
                )
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    # df only for the query vocabulary: semi-join prunes the vocab-sized
    # count to query-vocab-sized before it broadcasts
    qvocab = qterms.select("term").distinct()
    dfreq = (
        dtf.join(F.broadcast(qvocab), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = dfreq.select(
        "term",
        F.log(
            (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ).alias("idf"),
    )
    qmodel = qterms.join(idf, "term")  # query-vocab-sized

    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(float(avgdl))
    )
    contrib = F.col("idf") * F.col("tf") * F.lit(k1 + 1.0) / norm
    scored = (
        dtf.join(F.broadcast(qmodel), "term")
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
