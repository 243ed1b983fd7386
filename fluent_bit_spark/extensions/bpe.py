"""Byte-pair-encoding tokenizer — trained and applied without any
tokenizer library (Sennrich et al. 2016, the published BPE algorithm).

Why it's here: token COUNTS drive every real training-data decision
(packing, pricing, mixture weights), and the regex proxy in text.py only
approximates them. This is the real algorithm: train merge ranks on a
bounded deterministic sample, apply them distributed.

Scale shape (same policy as pq_train / kmeans_centroids): training runs
driver-side on a word-FREQUENCY table built from a deterministic sample
(smallest xxhash64(id) rows) — model-sized state, the published BPE
training regime; encoding is one Arrow-batched pass with a per-batch
word cache (corpus word distributions are Zipfian, so the cache hit rate
is extreme), no shuffle.

Tokens are word-internal character merges with a word-end marker, so
decode(encode(x)) == x exactly for any normalized text — the lossless
roundtrip is the oracle gate's invariant (for any text free of the
ASCII record-separator marker character).
"""

from __future__ import annotations

import json
from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.extensions.dedup import normalize_text

# word-end marker: the ASCII record-separator control char — normalization
# never produces it and real text never contains it; a pathological doc
# that does would fail the roundtrip gate LOUDLY rather than silently
_END = "\x1e"

# training collects the sample to the driver (the published BPE regime —
# model-sized state); same refuse-threshold policy as pq_topk so a caller
# can't accidentally driver-collect a corpus
_MAX_TRAIN_SAMPLE = 100_000


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_merges: int = 200,
    sample: int = 1024,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules from a deterministic sample.

    Classic frequency-table BPE: words (with their corpus counts) start
    as character sequences + end marker; each step merges the most
    frequent adjacent pair (ties broken lexicographically so the model
    is run-order independent). Returns the ordered merge list — the
    entire model, a few KB."""
    if sample > _MAX_TRAIN_SAMPLE:
        raise ValueError(
            f"sample={sample} exceeds the driver-collect bound "
            f"{_MAX_TRAIN_SAMPLE}; BPE training state is meant to be "
            "model-sized — train on a bounded sample"
        )
    rows = (
        df.select(id_col, text_col, F.xxhash64(F.col(id_col)).alias("__h"))
        .orderBy("__h")
        .limit(sample)
        .collect()
    )
    freq: Counter = Counter()
    for r in rows:
        text = (r[text_col] or "").lower().split()
        freq.update(text)
    words = {w: list(w) + [_END] for w in freq}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            c = freq[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for w, syms in words.items():
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def bpe_save(merges: list[tuple[str, str]], path: str) -> None:
    """Persist the merge list as JSON (the whole model) so tokenization is
    reusable across jobs — the same checkpointing role as the .npz MLP
    weights in extensions/inference.py."""
    with open(path, "w", encoding="utf-8") as f:
        json.dump({"version": 1, "merges": [list(m) for m in merges]}, f)


def bpe_load(path: str) -> list[tuple[str, str]]:
    """Inverse of bpe_save; validates shape so a truncated or foreign file
    fails loudly instead of producing a silently different tokenization."""
    with open(path, encoding="utf-8") as f:
        model = json.load(f)
    merges = model.get("merges")
    if not isinstance(merges, list) or any(
        not (isinstance(m, list) and len(m) == 2) for m in merges
    ):
        raise ValueError(f"{path} is not a BPE merge model")
    return [tuple(m) for m in merges]


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [_END]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


# vocab collection guard: a BPE vocabulary is model-sized by construction
# (base charset + one symbol per merge); a million distinct tokens means
# the caller passed something that is not a BPE token stream
_MAX_VOCAB = 1_000_000


def bpe_vocab(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[str]:
    """Corpus-derived token vocabulary: the sorted distinct tokens
    bpe_encode emits for ``df`` under ``merges``. Token id = position in
    this list — deterministic (sorted), so the mapping is replayable by
    the SQL oracle and stable across runs.

    Scale shape: one distinct over the exploded token column — map-side
    combinable, shuffle volume = per-partition-distinct tokens (vocab-
    sized); the collect is model-sized state, same policy as the merge
    ranks themselves (guarded by _MAX_VOCAB)."""
    if not merges:
        # zero-merge (character) tokenizer fast path: every token is a
        # single codepoint of a word, plus the word-end marker — the
        # distinct set is computable as a pure-Catalyst scan (per-doc
        # array_distinct BEFORE the explode, so the shuffle carries at
        # most alphabet-sized rows per doc), with no Arrow encode pass.
        # strip the FULL Python-str.split() whitespace set, not just the
        # ASCII space normalize_text collapses to: bpe_encode's .split()
        # also treats Unicode space separators (\p{Z}: NBSP, thin space,
        # ideographic space, ...) and the Cc separators \x1c-\x1f + NEL
        # \x85 as word breaks, so those codepoints are never emitted as
        # tokens and must not enter the vocabulary either (Java \s is
        # ASCII-only, so normalize_text leaves them in the text).
        # Non-BMP safety is pinned by test_bpe_vocab_fastpath_non_bmp:
        # Catalyst split(x, "") yields whole codepoints, same as Python
        # list(word).
        norm = normalize_text(F.col(text_col))
        rows = (
            df.select(
                F.explode(
                    F.array_distinct(
                        F.split(
                            F.regexp_replace(
                                norm, r"[\s\p{Z}\x1c-\x1f\x85]", ""
                            ),
                            "",
                        )
                    )
                ).alias("tok")
            )
            .filter(F.col("tok") != "")
            .distinct()
            .limit(_MAX_VOCAB + 1)
            .collect()
        )
        toks = {r.tok for r in rows}
        if toks:  # >=1 char => >=1 word => the end marker was emitted
            toks.add(_END)
        if len(toks) > _MAX_VOCAB:
            raise ValueError(
                f"distinct token count exceeds {_MAX_VOCAB}; a BPE "
                "vocabulary is model-sized — is this really a BPE token "
                "stream?"
            )
        return sorted(toks)
    enc = bpe_encode(df, merges, text_col, id_col)
    rows = (
        enc.select(F.explode(F.array_distinct("tokens")).alias("tok"))
        .distinct()
        .limit(_MAX_VOCAB + 1)
        .collect()
    )
    if len(rows) > _MAX_VOCAB:
        raise ValueError(
            f"distinct token count exceeds {_MAX_VOCAB}; a BPE vocabulary "
            "is model-sized — is this really a BPE token stream?"
        )
    return sorted(r.tok for r in rows)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: list[str] | None = None,
    unk_id: int | None = None,
) -> DataFrame:
    """(id, tokens, n_tokens) — merges applied in rank order per word,
    one Arrow batch pass, per-batch word cache.

    With ``vocab`` (see bpe_vocab) tokens are emitted as INTEGER ids
    (array<int>) in the same single Arrow pass — the form a trainer
    consumes, and severalfold narrower through every downstream shuffle
    than the string tokens. Tokens outside the vocab raise unless
    ``unk_id`` supplies the conventional unknown-token id."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    ids = {t: i for i, t in enumerate(vocab)} if vocab is not None else None

    @F.pandas_udf("array<int>" if ids is not None else "array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list] = {}
        out = []
        for t in texts:
            toks: list = []
            for w in (t or "").lower().split():
                got = cache.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    if ids is not None:
                        try:
                            got = [ids[s] for s in got]
                        except KeyError:
                            if unk_id is None:
                                raise ValueError(
                                    f"token outside vocab in word {w!r}; "
                                    "pass unk_id or rebuild the vocab"
                                ) from None
                            got = [ids.get(s, unk_id) for s in got]
                    cache[w] = got
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    norm = normalize_text(F.col(text_col))
    return df.select(
        F.col(id_col), enc(norm).alias("tokens")
    ).withColumn("n_tokens", F.size("tokens"))


def bpe_decode(tokens: Column) -> Column:
    """Tokens -> normalized text: concatenate, turn end markers back into
    single spaces, trim the trailing one. Pure Catalyst — the lossless
    inverse of bpe_encode for any normalize_text output."""
    return F.rtrim(
        F.regexp_replace(F.array_join(tokens, ""), _END, " ")
    )


def bpe_decode_ids(tokens: Column, vocab: list[str]) -> Column:
    """Integer-id variant of bpe_decode: ids -> tokens via the vocab
    (element_at on an array literal — the vocab is model-sized), then the
    same pure-Catalyst string reassembly."""
    vlit = F.array(*[F.lit(t) for t in vocab])
    return bpe_decode(F.transform(tokens, lambda i: F.element_at(vlit, i + 1)))


def pack_token_sequences(
    df: DataFrame,
    merges: list[tuple[str, str]],
    seq_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_size: int = 65536,
    vocab: list[str] | None = None,
    unk_id: int | None = None,
) -> DataFrame:
    """The terminal training-prep stage: BPE-encode every document, lay
    the token stream end to end in ``id_col`` order, cut it into
    fixed-``seq_len`` sequences, and emit per sequence the ordered token
    array plus the slots where documents begin (the attention-mask /
    loss-boundary metadata a trainer consumes). The trailing partial
    sequence is dropped — the standard discipline.

    Pass ``vocab`` (bpe_vocab) to run the whole pipeline on INTEGER token
    ids: the ids are assigned inside the encode pass, so the per-token
    explode/regroup — the widest shuffle in the training-prep path —
    carries 4-byte ints instead of token strings, and the output is the
    array<int> form a trainer actually consumes.

    Scale shape: the encode is the Arrow batch pass (bpe_encode); global
    token offsets come from the BUCKETED distributed prefix sum
    (operators/multiline.py — no single-partition window); the
    explode/regroup shuffles ~one row per token keyed by sequence id,
    which is linear and uniform. Returns
    (seq_id, tokens array<string> — or array<int> with a vocab,
    n_tokens == seq_len, doc_starts array<int> of in-sequence slots where
    a document's first token sits).
    """
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    if not isinstance(
        id_type,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.DecimalType),
    ):
        # _with_running_sum buckets on cast(id AS long): a string id
        # casts to NULL, the bucket equi-join matches nothing, and the
        # operator would silently emit ZERO sequences. Fail loudly with
        # the remedy instead.
        raise ValueError(
            f"pack_token_sequences: {id_col!r} must be numeric (its "
            "global order drives the distributed prefix sum); got "
            f"{id_type.simpleString()} — derive a numeric order column "
            "first (cast a numeric-string id, or rank the docs once)"
        )
    from fluent_bit_spark.operators.multiline import _with_running_sum

    enc = bpe_encode(df, merges, text_col, id_col, vocab, unk_id)
    summed = _with_running_sum(
        enc.withColumn("__t", F.col("n_tokens").cast("long")),
        "__t", id_col, [], "__run", bucket_size,
    )
    offs = summed.select(
        F.col(id_col),
        "tokens",
        (F.col("__run") - F.col("__t")).alias("__doc_start"),
    )
    # Place whole ARRAY SLICES, not single tokens: each doc emits one row
    # per sequence it overlaps (the slice of its token array that lands
    # there, plus the in-sequence slot where the slice starts), so the
    # regroup shuffle carries ~docs + seqs compact array rows instead of
    # one row per token — severalfold fewer bytes and orders of magnitude
    # fewer rows/aggregation state through the widest exchange of the
    # training-prep path. The reassembly (slot-sorted concatenation of
    # disjoint slices) is exactly the former per-token slot sort.
    g0 = F.col("__doc_start")
    s_first = F.expr(f"__doc_start DIV {seq_len}")
    s_last = F.expr(f"(__doc_start + size(tokens) - 1) DIV {seq_len}")
    pieces = (
        offs.filter(F.size("tokens") > 0)
        .select(
            "tokens",
            "__doc_start",
            F.explode(
                F.transform(
                    F.sequence(s_first, s_last),
                    lambda s: F.struct(
                        s.alias("seq_id"),
                        F.greatest(
                            F.lit(0).cast("long"), s * seq_len - g0
                        ).alias("lo"),
                        F.least(
                            F.size("tokens").cast("long"),
                            (s + 1) * seq_len - g0,
                        ).alias("hi"),
                        (s == F.expr(f"__doc_start DIV {seq_len}")).alias(
                            "is_start"
                        ),
                    ),
                )
            ).alias("p"),
        )
        .select(
            F.col("p.seq_id").alias("seq_id"),
            F.greatest(g0 - F.col("p.seq_id") * seq_len, F.lit(0).cast("long"))
            .cast("int")
            .alias("slot"),
            F.slice(
                "tokens",
                (F.col("p.lo") + 1).cast("int"),
                (F.col("p.hi") - F.col("p.lo")).cast("int"),
            ).alias("piece"),
            F.col("p.is_start").alias("__is_doc_start"),
        )
    )
    seqs = pieces.groupBy("seq_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("slot", "piece"))),
                lambda s: s["piece"],
            )
        ).alias("tokens"),
        F.sum(F.size("piece")).cast("long").alias("n_tokens"),
        F.array_sort(
            F.collect_list(F.when(F.col("__is_doc_start"), F.col("slot")))
        ).alias("doc_starts"),
    )
    return seqs.filter(F.col("n_tokens") == seq_len)


def pack_sequences_ffd(
    df: DataFrame,
    merges: list[tuple[str, str]],
    seq_len: int = 2048,
    num_groups: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: list[str] | None = None,
    unk_id: int | None = None,
) -> DataFrame:
    """Document-AWARE sequence packing: whole documents bin-packed into
    <= ``seq_len``-token sequences by first-fit-decreasing, so no
    document is ever split across a sequence boundary (the "fewer
    truncations" packing real trainers prefer over concat-and-cut;
    pack_token_sequences is the concat-cut form). Documents longer than
    seq_len are pre-chunked into seq_len-sized pieces first (each piece
    then packs as its own unit; only the pieces of long docs cross
    "document" boundaries, which is unavoidable).

    Scale shape: documents hash into ``num_groups`` independent packing
    groups (uniform by id hash); each group runs classic FFD inside one
    applyInPandas task, so per-task state is corpus/num_groups tokens —
    pick num_groups to bound task memory (at 100 TB: thousands; the
    groups are embarrassingly parallel).
    Waste bound: FFD within each group uses at most 11/9 x that group's
    OPTIMAL bin count + 6/9 (the classic FFD guarantee) — but OPT is not
    checkable from the output, and the volume lower bound
    ceil(tokens/seq_len) under-estimates OPT whenever docs just over
    seq_len/2 dominate, so it must NOT be substituted in. The
    oracle-checkable invariant is the first-fit half-full property: no
    two bins in a group can both end <= seq_len/2 full (the later bin's
    items, all <= seq_len/2, would have fitted in the earlier), hence
    n_seqs <= 2 * total_tokens / seq_len + num_groups   (and trivially
    n_seqs <= n_pieces).

    Returns (seq_id string, doc_ids array, tokens array, n_tokens,
    n_docs), one row per packed sequence.
    """
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    if num_groups < 1:
        raise ValueError("num_groups must be >= 1")
    enc = bpe_encode(df, merges, text_col, id_col, vocab, unk_id)
    tok_t = "int" if vocab is not None else "string"
    out_schema = (
        f"seq_id string, doc_ids array<string>, tokens array<{tok_t}>, "
        "n_tokens int, n_docs int"
    )
    # long docs: pre-chunk into seq_len pieces (piece index suffixes the id)
    n_pieces_last = F.floor(
        F.greatest(F.col("n_tokens") - 1, F.lit(0)) / seq_len
    ).cast("int")
    pieces = enc.select(
        F.col(id_col).cast("string").alias("__id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_pieces_last),
                lambda i: F.slice(F.col("tokens"), i * seq_len + 1, seq_len),
            )
        ).alias("__piece", "tokens"),
    ).filter(F.size("tokens") > 0).select(
        F.concat_ws("#", "__id", F.col("__piece").cast("string")).alias("__id"),
        "tokens",
        F.pmod(F.xxhash64("__id"), F.lit(num_groups)).alias("__grp"),
    )

    def pack(key, pdf):
        import numpy as np
        import pandas as pd

        grp = int(key[0])
        docs = sorted(
            zip(pdf["__id"], pdf["tokens"]),
            key=lambda t: (-len(t[1]), t[0]),  # FFD: length desc, id tiebreak
        )
        # Vectorized first-fit: residual capacities live in one numpy
        # array (capacity-doubled), so the per-doc "first bin that fits"
        # scan is a C-speed argmax over a boolean mask instead of a
        # Python loop over bins — same lowest-index bin choice, same
        # output, ~O(docs x bins) moved out of the interpreter.
        rem = np.empty(64, dtype=np.int64)
        nbins = 0
        bin_ids: list[list] = []
        bin_chunks: list[list] = []
        for did, toks in docs:
            n = len(toks)
            j = -1
            if nbins:
                fits = rem[:nbins] >= n
                k = int(np.argmax(fits))
                if fits[k]:
                    j = k
            if j < 0:
                if nbins == len(rem):
                    rem = np.concatenate([rem, np.empty_like(rem)])
                j = nbins
                rem[j] = seq_len
                nbins += 1
                bin_ids.append([])
                bin_chunks.append([])
            rem[j] -= n
            bin_ids[j].append(did)
            bin_chunks[j].append(toks)
        rows = [
            {
                "seq_id": f"{grp}:{i}",
                "doc_ids": bin_ids[i],
                "tokens": [t for c in bin_chunks[i] for t in c],
                "n_tokens": int(seq_len - rem[i]),
                "n_docs": len(bin_ids[i]),
            }
            for i in range(nbins)
        ]
        return pd.DataFrame(
            rows, columns=["seq_id", "doc_ids", "tokens", "n_tokens", "n_docs"]
        )

    return pieces.groupBy("__grp").applyInPandas(pack, out_schema)
