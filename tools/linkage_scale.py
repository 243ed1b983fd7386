"""Scaling measurement for the linkage family (fuzzy_join_trigram /
resolve_entities): sf0.1 vs a generated sf3 (30x rows), alpha =
log(t_hi/t_lo) / log(rows_hi/rows_lo).

The driver documents table's tiny word vocabulary is adversarial for
character-trigram linkage (every key shares most grams with every
other), so the probe derives a REALISTIC record-linkage corpus
deterministically from doc_id: ~n/3 distinct entity names (md5-hex
words — high gram cardinality, like real names) with ~3 dirty variants
each (suffix / doubled word / prefix). Candidate fan-out is then driven
by true near-matches, as in production linkage, while row count scales
with the table.

The probe uses gram_n=5: gram blocking is only selective while the
gram space exceeds the corpus (36^3 = 46k trigrams vs 1.5M keys makes
EVERY trigram hot — no ordering fixes that), mirroring the operator's
documented guidance to raise q or block on word tokens as corpora grow.

Usage: python tools/linkage_scale.py [lo_dir hi_dir]
(defaults /root/testdata/sf0.1 and /tmp/sf3 — generate the latter with
`python tools/gen_sf.py 3 /tmp/sf3` first).
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def dirty_keys(spark, sf_dir: str):
    # 10 rows per source doc so the lo side carries real load (the raw
    # sf0.1 documents table is 5k rows — pure job overhead)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .select("doc_id", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("j"))
        .select((F.col("doc_id") * 10 + F.col("j")).alias("doc_id"))
    )
    ent = (F.col("doc_id") / 3).cast("long")
    # base-36 words, not raw md5 hex: a 16-char alphabet yields only 4096
    # possible trigrams, so at >>4096 rows every gram is a stop-gram and
    # gram blocking degenerates; base-36 (46k trigrams) matches the gram
    # cardinality of real-world names
    def word(salt: str):
        return F.conv(
            F.substring(F.md5(F.concat(ent.cast("string"), F.lit(salt))), 1, 12),
            16,
            36,
        )

    base = F.concat_ws(" ", word("a"), word("b"), word("c"))
    variant = F.col("doc_id") % 3
    key = (
        F.when(variant == 0, base)
        .when(variant == 1, F.concat(base, F.lit(" inc")))
        .otherwise(F.concat(F.lit("the "), base))
    )
    return docs.select("doc_id", key.alias("name"))


def main() -> None:
    from fluent_bit_spark import get_spark
    from fluent_bit_spark.extensions.linkage import (
        edit_distance_join,
        fuzzy_join_trigram,
        resolve_entities,
    )

    lo = sys.argv[1] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    hi = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf3"
    spark = get_spark("linkage-scale")
    results: dict[str, dict[str, float]] = {}
    rows: dict[str, int] = {}
    for sf_dir in (lo, hi):
        keys = dirty_keys(spark, sf_dir).localCheckpoint(eager=True)
        rows[sf_dir] = keys.count()
        for name, fn in (
            (
                "fuzzy_join_trigram",
                lambda k: fuzzy_join_trigram(
                    k, k, "doc_id", "name", "doc_id", "name",
                    threshold=0.55, gram_n=5,
                ).where(F.col("l_doc_id") < F.col("r_doc_id")),
            ),
            (
                "resolve_entities",
                lambda k: resolve_entities(k, "doc_id", "name", threshold=0.55, gram_n=5),
            ),
            (
                # max_dist=4 so the ' inc' / 'the ' variants (4 edits)
                # qualify; gram_n=5 for the same gram-space reason
                "edit_distance_join",
                lambda k: edit_distance_join(
                    k, k, "doc_id", "name", "doc_id", "name",
                    max_dist=4, gram_n=5,
                ).where(F.col("l_doc_id") < F.col("r_doc_id")),
            ),
        ):
            best = float("inf")
            n_out = 0
            for _ in range(int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "1"))):
                t0 = time.perf_counter()
                n_out = fn(keys).count()
                best = min(best, time.perf_counter() - t0)
            results.setdefault(name, {})[sf_dir] = best
            print(f"{name} @ {sf_dir}: {best:.2f}s  ({n_out} rows out)")
    ratio = rows[hi] / rows[lo]
    for name, t in results.items():
        alpha = math.log(t[hi] / t[lo]) / math.log(ratio)
        print(f"{name}: {t[lo]:.2f}s -> {t[hi]:.2f}s over {ratio:.0f}x rows, alpha={alpha:.2f}")


if __name__ == "__main__":
    main()
