"""Seed-labeled quality classification — the "train a tiny classifier on
labeled seed sets, score the whole corpus" stage every large-scale
training-data pipeline runs (fastText wiki-vs-CC in CCNet/LLaMA, the
DCLM fastText filter, GPT-3's LR quality filter).

The model here is multinomial Naive Bayes over unigrams: closed-form
(pure counting, no iterative optimization), which keeps training ONE
shuffle, makes the scores exactly replayable by the DuckDB oracle, and
is the standard strong baseline for this filtering task. The learned
model is vocabulary-sized — broadcastable — so corpus-wide scoring is a
single broadcast join plus a per-doc aggregate: the same plan shape at
100 TB as at sf0.01. Train/score are split (`nb_train` / `nb_score`,
the bm25_index build-once/query-many discipline): train on the batch
seed corpus once, then score any batch OR STREAM — scoring is a
stateless broadcast join + per-doc sum, streaming-legal as-is.

Reference context: fluent-bit has no classifier surface (extension
scope); the pipeline role mirrors its filter stage (fluent-bit
plugins/filter_grep/grep.c routes on regex match; this routes on a
learned token model).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.extensions.dedup import normalize_text


@dataclass
class NBModel:
    """Trained NB state: a vocabulary-sized (w, llr) DataFrame plus three
    scalars. `llr_df` is unresolved lineage over the training corpus —
    call `materialize()` (localCheckpoint) before reusing one model
    across many scoring jobs, or persist it with `llr_df.write.parquet`
    and reload for serving."""

    llr_df: DataFrame  # (w string, llr double)
    prior: float  # log P(pos) - log P(neg) from seed doc counts
    oov_llr: float  # smoothed unseen-token log ratio
    pos_label: str
    neg_label: str

    def materialize(self) -> "NBModel":
        self.llr_df = self.llr_df.localCheckpoint(eager=True)
        return self


def _tokens(df: DataFrame, text_col: str, keep: list[str]) -> DataFrame:
    return df.select(
        *keep,
        F.explode(
            F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda w: w != "")
        ).alias("w"),
    )


def nb_train(
    df: DataFrame,
    label_col: str,
    pos_label: str,
    neg_label: str,
    text_col: str = "text",
    alpha: float = 1.0,
) -> NBModel:
    """Train multinomial NB on the rows whose ``label_col`` is
    ``pos_label`` / ``neg_label`` (the seed sets). Closed-form: one
    map-side-combinable token-count shuffle plus two scalar collects
    (token totals + doc priors). The returned model is vocabulary-sized.
    """
    seed = df.filter(F.col(label_col).isin(pos_label, neg_label))
    toks = _tokens(seed, text_col, [label_col])
    # pinned: the vocab-sized count table feeds the scalar-totals
    # collect AND the returned model projection — un-pinned, the seed
    # token-count shuffle runs once per consumer
    model = toks.groupBy("w").agg(
        F.sum(F.when(F.col(label_col) == pos_label, 1).otherwise(0)).alias("cp"),
        F.sum(F.when(F.col(label_col) == neg_label, 1).otherwise(0)).alias("cn"),
    ).localCheckpoint(eager=True)
    tot = model.agg(
        F.sum("cp").alias("tp"), F.sum("cn").alias("tn"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    if not tot["v"]:
        raise ValueError("no training tokens for the given seed labels")
    prior_row = seed.agg(
        F.sum(F.when(F.col(label_col) == pos_label, 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col(label_col) == neg_label, 1).otherwise(0)).alias("nn"),
    ).collect()[0]
    if not prior_row["np"] or not prior_row["nn"]:
        raise ValueError("both seed classes must be non-empty")
    tp, tn, v = float(tot["tp"]), float(tot["tn"]), float(tot["v"])
    llr = (
        F.log((F.col("cp") + alpha) / F.lit(tp + alpha * v))
        - F.log((F.col("cn") + alpha) / F.lit(tn + alpha * v))
    ).alias("llr")
    return NBModel(
        llr_df=model.select("w", llr),
        prior=math.log(float(prior_row["np"])) - math.log(float(prior_row["nn"])),
        oov_llr=(
            math.log(alpha / (tp + alpha * v)) - math.log(alpha / (tn + alpha * v))
        ),
        pos_label=pos_label,
        neg_label=neg_label,
    )


def nb_score(
    df: DataFrame,
    model: NBModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    digits: int = 6,
) -> DataFrame:
    """Score every row with the model's log-likelihood ratio + prior.
    Returns (id, n_tokens, score, pred).

    PURE PROJECTION — no shuffle at all: tokenization stays the exact
    Catalyst expression training used (split + filter of the normalized
    text, so train/score can never tokenize differently), and the
    vocabulary-sized model becomes a broadcast dict an Arrow-batched UDF
    sums against. The corpus never moves for scoring, which also makes
    this streaming-legal unchanged (stateless per-batch; an explode +
    groupBy + join-back formulation would be a stream-stream join after
    aggregation — illegal in Structured Streaming). Rounding and the
    prior/pred arithmetic stay JVM-side so the DuckDB oracle replays
    scores to ``digits`` decimals."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    lut = {r["w"]: r["llr"] for r in model.llr_df.collect()}
    oov = model.oov_llr
    bc = df.sparkSession.sparkContext.broadcast(lut)

    # NOTE: no type hints — the module's postponed annotations would turn
    # them into strings pandas_udf can't inspect; returnType carries it
    @pandas_udf("struct<n:int,s:double>")
    def llr_sum(toks):
        m = bc.value
        ns, ss = [], []
        for ws in toks:
            ws = list(ws) if ws is not None else []
            ns.append(len(ws))
            ss.append(float(np.sum([m.get(w, oov) for w in ws])) if ws else 0.0)
        return pd.DataFrame({"n": pd.array(ns, dtype="int32"), "s": ss})

    tok_arr = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda w: w != ""
    )
    return (
        df.withColumn("__nb", llr_sum(tok_arr))
        .select(
            F.col(id_col),
            F.col("__nb.n").alias("n_tokens"),
            F.round(F.col("__nb.s") + model.prior, digits).alias("score"),
            F.when(F.col("__nb.s") + model.prior > 0, model.pos_label)
            .otherwise(model.neg_label)
            .alias("pred"),
        )
    )


def nb_train_score(
    df: DataFrame,
    label_col: str,
    pos_label: str,
    neg_label: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    digits: int = 6,
) -> DataFrame:
    """Train on the seed rows of ``df`` and score EVERY row of ``df``
    (the one-shot form; `nb_train` + `nb_score` for build-once/serve-many
    and streaming)."""
    model = nb_train(df, label_col, pos_label, neg_label, text_col, alpha)
    return nb_score(df, model, text_col, id_col, digits)
