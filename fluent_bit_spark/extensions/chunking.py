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


def pack_chunks(
    df: DataFrame,
    token_budget: int = 2048,
    tokens_col: str = "n_chunk_tokens",
    seq_col: str = "seq",
    bucket_size: int = 65536,
) -> DataFrame:
    """Concat-and-cut sequence packing: lay all chunks end to end in
    ``seq_col`` order and cut the token stream every ``token_budget``
    tokens; each chunk's ``pack_id`` is the cut its FIRST token falls in
    (the GPT-pretraining packing discipline — a chunk may straddle a cut,
    the consumer splits it while tokenizing).

    pack_id = (running_total - own_tokens) div budget, where the running
    total is the bucketed distributed prefix sum (operators.multiline) —
    no single-partition window, scales like a scan. Exact greedy no-split
    bin packing is inherently sequential (boundary resets depend on every
    prior decision); concat-and-cut is the scalable standard instead.

    Adds ``pack_id`` and ``pack_offset`` (the chunk's first-token offset
    within its pack).
    """
    from fluent_bit_spark.operators.multiline import _with_running_sum

    out = _with_running_sum(
        df.withColumn("__t", F.col(tokens_col).cast("long")),
        "__t",
        seq_col,
        [],
        "__run",
        bucket_size,
    )
    start = F.col("__run") - F.col("__t")
    return (
        out.withColumn("pack_id", (start / token_budget).cast("long"))
        .withColumn("pack_offset", (start % token_budget).cast("long"))
        .drop("__t", "__run")
    )
