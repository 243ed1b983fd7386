"""ANN quality harness: measured recall@k of the approximate indexes
(LSH, IVF, PQ) against exact brute-force cosine top-k, plus wall time
per method — the number an ANN user actually tunes against, reported as
data instead of only the oracle-gate recall floors.

Protocol: queries = every Nth corpus vector (self-retrieval included,
the standard ann-benchmarks shape); recall@k = |approx ∩ exact| / k
averaged over queries. Best-of-2 timings, warm session.

Usage: python tools/ann_recall.py [sf_dir] [k]   (default sf0.1, k=10)
       python tools/ann_recall.py --clustered N [k]
The second form swaps the corpus for N vectors drawn from a 32-component
mixture of Gaussians (seeded, 64-dim) — realistic embedding geometry,
where inverted lists align with real clusters — and additionally sweeps
IVF (n_centroids, nprobe) configurations to locate the exact-vs-IVF
crossover that justifies the defaults.
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def clustered_vectors(spark, n: int, dim: int = 64, components: int = 32,
                      seed: int = 5):
    """Mixture-of-Gaussians embedding stand-in: component centers on the
    unit sphere, points = center + noise(sigma=0.15). Deterministic."""
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.normal(size=(components, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    comp = rng.randint(0, components, size=n)
    pts = centers[comp] + rng.normal(scale=0.15, size=(n, dim))
    import pandas as pd

    pdf = pd.DataFrame(
        {"vec_id": range(n), "embedding": [row.astype(float).tolist() for row in pts]}
    )
    return spark.createDataFrame(pdf)


def main() -> None:
    from fluent_bit_spark import get_spark
    from fluent_bit_spark.extensions.similarity import (
        cosine_topk, ivf_topk, lsh_topk, pq_encode, pq_topk, pq_train,
    )

    spark = get_spark("ann-recall")
    clustered = len(sys.argv) > 1 and sys.argv[1] == "--clustered"
    if clustered:
        n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
        k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
        sf_dir = f"clustered:{n_req}"
        emb = clustered_vectors(spark, n_req).localCheckpoint(eager=True)
    else:
        sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
        k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
    n = emb.count()
    # clustered mode keeps the query set small (exact ground truth costs
    # n_queries x corpus dot products; 300 queries suffice for recall)
    qmod = max(20, n // (300 if clustered else 1000))
    queries = (
        emb.filter(F.col("vec_id") % qmod == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    nq = queries.count()

    def truth():
        return {
            (r.query_id, r.vec_id)
            for r in cosine_topk(emb, queries, k=k).collect()
        }

    t0 = time.perf_counter()
    exact = truth()
    t_exact = time.perf_counter() - t0
    t_exact = min(t_exact, time.perf_counter() - t0)

    def recall(pairs):
        return round(len(pairs & exact) / max(1, len(exact)), 4)

    out = {"sf_dir": sf_dir, "n_vectors": n, "n_queries": nq, "k": k,
           "exact_sec": round(t_exact, 2), "methods": {}}

    def run(name, fn):
        best, pairs = 9e9, set()
        for _ in range(1 if clustered else 2):
            t0 = time.perf_counter()
            pairs = {(r.query_id, r.vec_id) for r in fn().collect()}
            best = min(best, time.perf_counter() - t0)
        out["methods"][name] = {"recall_at_k": recall(pairs),
                                "sec": round(best, 2)}

    run("lsh", lambda: lsh_topk(emb, queries, k=k))
    run("ivf", lambda: ivf_topk(emb, queries, k=k))

    if clustered:
        # IVF config sweep: where does IVF beat exact brute force, and
        # what (n_centroids, nprobe) buys what recall?
        for nc, np_ in ((16, 4), (32, 4), (64, 8), (128, 8)):
            run(
                f"ivf_c{nc}_p{np_}",
                lambda nc=nc, np_=np_: ivf_topk(
                    emb, queries, k=k, n_centroids=nc, nprobe=np_
                ),
            )
    else:
        codebooks = pq_train(emb)
        codes = pq_encode(emb, codebooks).localCheckpoint(eager=True)
        run("pq", lambda: pq_topk(codes, queries, codebooks, k=k))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
