"""End-to-end training-corpus preparation over the documents table.

The published large-corpus recipe (C4 / Gopher / RefinedWeb order), each
stage a scan-speed or single-shuffle operator from the extensions
package:

  1. Gopher quality rules        (per-doc heuristics, pure projection)
  2. corpus-level line dedup     (global line-frequency boilerplate strip)
  3. exact dedup                 (one shuffle on content hash)
  4. MinHash near-dup removal    (banded LSH + exact-Jaccard verify)
  5. benchmark decontamination   (n-gram semi-join against an eval set)
  6. deterministic split         (hash contract train/val/test)
  7. dataset layout write        (partitioned, size-targeted parquet)

(C4 line cleanup belongs between 1 and 2 on a prose corpus; see the
inline note for why it is skipped on the driver's synthetic docs.)

Usage: python examples/corpus_pipeline.py [sf_dir] [out_dir]
Prints per-stage surviving document counts.
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def run(spark, sf_dir: str, out_dir: str) -> dict[str, int]:
    from fluent_bit_spark.extensions.decontam import decontaminate
    from fluent_bit_spark.extensions.dedup import exact_dedup, minhash_dedup
    from fluent_bit_spark.extensions.mixing import hash_split
    from fluent_bit_spark.extensions.text import corpus_line_dedup, gopher_quality
    from fluent_bit_spark.model import load_table
    from fluent_bit_spark.storage import write_dataset

    counts: dict[str, int] = {}
    docs = load_table(spark, sf_dir, "documents")
    counts["input"] = docs.count()

    # 1. Gopher rules. The driver's synthetic corpus is not English prose
    # (the 2-of-8 stopword rule correctly rejects all of it), so this
    # example gates on the STRUCTURAL rules; an English corpus would
    # filter on the composite `keep` instead.
    g = gopher_quality(docs)
    structural = (
        F.col("r_word_count") & F.col("r_mean_word_len") & F.col("r_symbol_ratio")
        & F.col("r_bullet_lines") & F.col("r_ellipsis_lines") & F.col("r_alpha_words")
    )
    docs = g.filter(structural).select(*docs.columns)
    counts["gopher"] = docs.count()

    # 2. C4 line cleanup is part of the published recipe but its
    # terminal-punctuation line rule assumes prose; the driver's synthetic
    # docs are punctuation-free token streams, so running it here would
    # empty the corpus (c4_clean itself is oracle-verified by the
    # c4_line_filter / c4_clean_docs queries). A real crawl corpus would
    # insert: c4_clean(docs) -> rename clean_text back to text.

    # 3. corpus-level duplicate-line strip (RefinedWeb boilerplate pass);
    # returns (doc_id, clean_text, ...) — rename back to text for the
    # downstream dedup stages
    deduped_lines = corpus_line_dedup(docs).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    counts["line_dedup"] = deduped_lines.count()

    # 4-5. exact then near-dup removal
    exact = exact_dedup(deduped_lines)
    counts["exact_dedup"] = exact.count()
    near = minhash_dedup(exact, num_hashes=32, num_bands=16, jaccard_threshold=0.9)
    counts["minhash_dedup"] = near.count()

    # 6. decontaminate against a small benchmark set (here: a fixed slice
    # standing in for the eval benchmark)
    bench = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 97 == 0
    ).select("text")
    clean = decontaminate(near, bench).filter(~F.col("contaminated")).drop(
        "contam_hits", "contaminated"
    )
    counts["decontaminated"] = clean.count()

    # 7. deterministic split + 8. layout write
    split = hash_split(clean, weights={"train": 0.9, "val": 0.05, "test": 0.05})
    counts["train"] = split.filter(F.col("split") == "train").count()
    write_dataset(
        split, out_dir, partition_by=["split"], sort_by=["doc_id"],
        target_rows_per_file=50_000,
    )
    counts["written"] = spark.read.parquet(out_dir).count()
    return counts


if __name__ == "__main__":
    from fluent_bit_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="fbs_corpus_")
    counts = run(get_spark("fbs-corpus-example"), sf, out)
    for stage, n in counts.items():
        print(f"{stage:14s} {n}")
