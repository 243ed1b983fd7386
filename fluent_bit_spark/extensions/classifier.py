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
100 TB as at sf0.01.

Reference context: fluent-bit has no classifier surface (extension
scope); the pipeline role mirrors its filter stage (fluent-bit
plugins/filter_grep/grep.c routes on regex match; this routes on a
learned token model).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.extensions.dedup import normalize_text


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
    """Train multinomial NB on the rows whose ``label_col`` is
    ``pos_label`` / ``neg_label`` (the seed sets), then score EVERY row
    with the log-likelihood ratio

        score(d) = log P(pos) - log P(neg)
                 + sum_w  log P(w|pos) - log P(w|neg)

    with Laplace smoothing ``alpha`` over the training vocabulary V;
    out-of-vocabulary tokens contribute the smoothed unseen-token ratio.
    Returns (id, n_tokens, score, pred) — pred is ``pos_label`` when
    score > 0.

    Scale shape: one explode over the corpus feeds BOTH training counts
    (seed rows only; map-side-combinable groupBy on token) and scoring
    (broadcast join against the vocabulary-sized model, then a per-doc
    sum). Two scalar driver collects, both model-sized or smaller. No
    driver loop — training is closed-form.
    """
    import math

    toks = df.select(
        F.col(id_col),
        F.col(label_col).alias("__lbl"),
        F.explode(
            F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda w: w != "")
        ).alias("w"),
    )
    seed = toks.filter(F.col("__lbl").isin(pos_label, neg_label))
    model = seed.groupBy("w").agg(
        F.sum(F.when(F.col("__lbl") == pos_label, 1).otherwise(0)).alias("cp"),
        F.sum(F.when(F.col("__lbl") == neg_label, 1).otherwise(0)).alias("cn"),
    )
    tot = model.agg(
        F.sum("cp").alias("tp"), F.sum("cn").alias("tn"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    if not tot["v"]:
        raise ValueError("no training tokens for the given seed labels")
    prior_row = df.agg(
        F.sum(F.when(F.col(label_col) == pos_label, 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col(label_col) == neg_label, 1).otherwise(0)).alias("nn"),
    ).collect()[0]
    if not prior_row["np"] or not prior_row["nn"]:
        raise ValueError("both seed classes must be non-empty")
    tp, tn, v = float(tot["tp"]), float(tot["tn"]), float(tot["v"])
    prior = math.log(float(prior_row["np"])) - math.log(float(prior_row["nn"]))
    oov = math.log(alpha / (tp + alpha * v)) - math.log(alpha / (tn + alpha * v))
    llr = (
        F.log((F.col("cp") + alpha) / F.lit(tp + alpha * v))
        - F.log((F.col("cn") + alpha) / F.lit(tn + alpha * v))
    ).alias("llr")
    scored = (
        toks.join(F.broadcast(model.select("w", llr)), "w", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("llr"), F.lit(oov))).alias("__s"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.round(F.coalesce(F.col("__s"), F.lit(0.0)) + prior, digits).alias(
                "score"
            ),
            F.when(
                F.coalesce(F.col("__s"), F.lit(0.0)) + prior > 0, pos_label
            )
            .otherwise(neg_label)
            .alias("pred"),
        )
    )
