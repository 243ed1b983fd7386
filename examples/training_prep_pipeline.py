"""Terminal training-prep stages, end-to-end — what happens AFTER a
cleaned corpus (examples/corpus_pipeline.py ends at dedup/decontam/split)
to produce what a trainer actually consumes:

  1. seed-labeled quality gate   (nb_train/nb_score: train on labeled
                                  seed docs, score corpus-wide with a
                                  shuffle-free broadcast projection)
  2. span decontamination        (cut EVERY corpus occurrence of a
                                  benchmark >=window-token span)
  3. ExactSubstr trim            (corpus-wide duplicate-span removal,
                                  canonical copy kept)
  4. per-source token budget     (greedy priority-prefix realization of
                                  the mixture)
  5. deterministic reshuffle     (engine-portable (shard, pos) order)
  6. FFD sequence packing        (document-aware, no cross-boundary
                                  truncation)
  7. layout write

Every stage is the oracle-verified operator the driver queries check;
this example is the composition test — stages interact (a trim can
shrink a doc below the budget crossing point; the reshuffle feeds the
packer's grouping).

Usage: python examples/training_prep_pipeline.py [sf_dir] [out_dir]
Prints per-stage surviving counts.
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def run(spark, sf_dir: str, out_dir: str) -> dict[str, int]:
    from fluent_bit_spark.extensions.bpe import pack_sequences_ffd
    from fluent_bit_spark.extensions.classifier import nb_score, nb_train
    from fluent_bit_spark.extensions.mixing import shuffle_shards, token_budget_select
    from fluent_bit_spark.extensions.text import (
        exact_substr_trim,
        exact_substr_trim_against,
    )
    from fluent_bit_spark.model import load_table
    from fluent_bit_spark.storage import write_dataset

    counts: dict[str, int] = {}
    docs = load_table(spark, sf_dir, "documents")
    counts["input"] = docs.count()

    # 1. quality gate: the fastText-stage filter — here trained on the
    # corpus's own 'en' vs 'zh' labels as seed sets (a real pipeline
    # trains wiki-vs-CC); keep docs the model scores toward the seed
    # positive class
    model = nb_train(docs, "lang", "en", "zh").materialize()
    scored = nb_score(docs, model)
    docs = docs.join(
        scored.filter(F.col("pred") == "en").select("doc_id"), "doc_id", "left_semi"
    )
    counts["quality_gate"] = docs.count()

    # 2. span decontamination against a stand-in benchmark (fixed slice)
    bench = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 97 == 0
    ).select("text")
    decon = exact_substr_trim_against(docs, bench, window=10)
    docs = decon.filter(F.col("kept_tokens") > 0).select(
        "doc_id", F.col("trimmed_text").alias("text")
    )
    counts["span_decontam"] = docs.count()

    # 3. corpus-wide duplicate-span trim (ExactSubstr removal stage)
    trimmed = exact_substr_trim(docs, window=10)
    docs = trimmed.filter(F.col("kept_tokens") > 0).select(
        "doc_id", F.col("trimmed_text").alias("text")
    )
    counts["substr_trim"] = docs.count()

    # 4. per-source token budget: longest-first priority up to a fixed
    # per-source token (char) share — the mixture realization
    sized = docs.join(
        load_table(spark, sf_dir, "documents").select("doc_id", "source"),
        "doc_id",
    ).withColumn("n_chars", F.length("text"))
    docs = token_budget_select(
        sized,
        "source",
        [F.col("n_chars").desc(), F.col("doc_id")],
        budget=4000,
        token_col="n_chars",
    ).select("doc_id", "text")
    counts["token_budget"] = docs.count()

    # 5. deterministic training-order reshuffle
    ordered = shuffle_shards(docs, n_shards=4, seed="prep")
    counts["shards"] = ordered.select("shard").distinct().count()

    # 6. document-aware FFD packing (char tokenizer: merges=[])
    packed = pack_sequences_ffd(ordered, [], seq_len=512, num_groups=4)
    counts["sequences"] = packed.count()

    # 7. layout write (arrays excluded from sort keys; seq_id is unique)
    write_dataset(
        packed, out_dir, partition_by=[], sort_by=["seq_id"],
        target_rows_per_file=50_000,
    )
    counts["written"] = spark.read.parquet(out_dir).count()
    return counts


if __name__ == "__main__":
    from fluent_bit_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="fbs_prep_")
    for stage, n in run(get_spark("fbs-prep-example"), sf, out).items():
        print(f"{stage:14s} {n}")
