"""Document chunking for training-data pipelines.

Split each document into overlapping token-window chunks — the standard
pre-tokenization step before embedding / packing. Fully declarative:
split -> sequence of chunk starts -> transform(slice + join) ->
posexplode. No UDF, no shuffle beyond the explode's partition growth;
at 100 TB the chunk explosion is pure map-side work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: list[str] | None = None,
) -> DataFrame:
    """One row per chunk: (id, chunk_idx, chunk_text, n_chunk_tokens).

    Chunks start every (chunk_tokens - overlap) tokens; the last chunk is
    the remainder (>= 1 token). Whitespace tokenization — pair with
    extensions.text token counters for budget checks.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    keep = keep or []
    words = F.split(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), " ")
    n = F.size(words)
    # chunk starts: 0, step, 2*step, ... while start < n (always >= one)
    n_chunks = F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(step)), F.lit(1)).cast("int")
    starts = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("idx"),
            F.concat_ws(" ", F.slice(words, i * step + 1, chunk_tokens)).alias("txt"),
            F.least(n - i * step, F.lit(chunk_tokens)).alias("ntok"),
        ),
    )
    return df.select(F.col(id_col), *keep, F.explode(chunks).alias("__c")).select(
        id_col,
        *keep,
        F.col("__c.idx").alias("chunk_idx"),
        F.col("__c.txt").alias("chunk_text"),
        F.col("__c.ntok").alias("n_chunk_tokens"),
    )
