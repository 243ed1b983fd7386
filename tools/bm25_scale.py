"""bm25_topk scaling with a FIXED query set — the measurement the
linear-in-corpus contract (extensions/retrieval.py docstring) promises.

The per-round bench derives its query set from the corpus, so corpus and
queries grow together and the candidate-pair count grows ~quadratically —
that measures query-set growth, not the operator. Here the query set is
pinned (1k queries built once from the sf0.1 documents) and only the
corpus scales, so

    alpha = log(t_hi / t_lo) / log(docs_hi / docs_lo)

reads directly as the corpus-scaling exponent of the scoring pipeline.
With a prune (``prune_top_c``) the same protocol measures the pruned
path; the certificate counter reports how many queries needed the dense
fallback.

Usage: python tools/bm25_scale.py [corpus_dir ...]
(defaults: /root/testdata/sf0.1 /tmp/sf1 /tmp/sf3 — generate the latter
two with tools/gen_sf.py first). Set SPARK_GRAFT_BENCH_RUNS for
best-of-N (default 2). Pass --prune C to measure bm25_topk(prune_top_c=C).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

N_QUERIES = 1000
QUERY_WORDS = 8


def fixed_queries(spark, base_dir: str):
    """1k queries pinned to the sf0.1 corpus: first QUERY_WORDS
    normalized words of the 1000 smallest-xxhash64 docs (deterministic,
    corpus-independent once built)."""
    from fluent_bit_spark.extensions.dedup import normalize_text
    from fluent_bit_spark.model import load_table

    docs = load_table(spark, base_dir, "documents")
    q = (
        docs.select(
            F.col("doc_id").alias("query_id"),
            F.concat_ws(
                " ",
                F.slice(F.split(normalize_text(F.col("text")), " "), 1, QUERY_WORDS),
            ).alias("text"),
            F.xxhash64("doc_id").alias("__h"),
        )
        .orderBy("__h")
        .limit(N_QUERIES)
        .drop("__h")
    )
    # pin: the query set must be IDENTICAL at every scale
    return q.localCheckpoint(eager=True)


def main() -> None:
    from fluent_bit_spark import get_spark
    from fluent_bit_spark.extensions.retrieval import bm25_topk
    from fluent_bit_spark.model import load_table

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    prune = None
    if "--prune" in sys.argv:
        prune = int(sys.argv[sys.argv.index("--prune") + 1])
        args = [a for a in args if a != str(prune)]
    dirs = args or ["/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf3"]
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))

    spark = get_spark("fbs-bm25-scale")
    queries = fixed_queries(spark, dirs[0])
    results = []
    for d in dirs:
        docs = load_table(spark, d, "documents")
        n = docs.count()  # also warms the scan
        kwargs = {"prune_top_c": prune} if prune is not None else {}
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            bm25_topk(docs, queries, k=10, **kwargs).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        results.append({"dir": d, "docs": n, "sec": round(best, 3)})
    base = results[0]
    for r in results[1:]:
        r["alpha"] = round(
            math.log(r["sec"] / base["sec"]) / math.log(r["docs"] / base["docs"]), 2
        )
    print(json.dumps({
        "n_queries": N_QUERIES,
        "prune_top_c": prune,
        "runs": runs,
        "scales": results,
    }, indent=1))


if __name__ == "__main__":
    main()
